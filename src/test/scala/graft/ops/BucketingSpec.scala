package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BucketingSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}
  import spark.implicits._

  test("bucketed join plans with no shuffle exchange and matches plain join") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity")

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 8)
    // force the sort-merge path: at test scale the planner would otherwise
    // broadcast and never exercise bucket co-location
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey", "l_orderkey")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$physical")
      assert(physical.contains("SortMergeJoin"))
      assert(physical.linesIterator.count(_.contains("Bucketed: true")) == 2,
        s"scans not bucketed:\n$physical")

      val viaBuckets = joined.groupBy($"o_orderkey").count()
        .as[(Long, Long)].collect().toMap
      val plain = lineitem.join(orders, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderkey").count().as[(Long, Long)].collect().toMap
      assert(viaBuckets == plain)
      assert(plain.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
