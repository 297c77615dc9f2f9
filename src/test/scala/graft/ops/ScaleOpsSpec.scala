package graft.ops

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Specs for the scale-path helpers: salting, streaming dedup, approx
  * distinct accuracy.
  */
class ScaleOpsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}
  import spark.implicits._

  test("saltedJoin returns exactly the plain equi-join result") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
    val customer = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey", $"c_mktsegment")
    val plain = orders.join(customer, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_mktsegment").as[(Long, String)].collect().sorted.toSeq
    val salted = Analytics.saltedJoin(orders, customer, "o_custkey", "c_custkey", 8)
      .select($"o_orderkey", $"c_mktsegment").as[(Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("streaming dedup: first occurrence survives, later duplicates drop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val deduped = Dedup.streamingExactDedup(
      input.toDF().toDF("ts", "k"), "ts", "1 hour", Seq("k"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    input.addData(
      (t("2024-01-01 00:00:00"), "a"),
      (t("2024-01-01 00:05:00"), "a"), // dup within watermark
      (t("2024-01-01 00:10:00"), "b"))
    q.processAllAvailable()
    input.addData((t("2024-01-01 00:20:00"), "a")) // still within horizon: dup
    q.processAllAvailable()
    val ks = spark.table("dedup_out").select($"k").as[String].collect().toSeq.sorted
    assert(ks == Seq("a", "b"))
    q.stop()
  }

  test("approx_count_distinct lands within 5% of exact on real data") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val (approx, exact) = li.agg(
      approx_count_distinct($"l_partkey").as("a"),
      countDistinct($"l_partkey").as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }
}
