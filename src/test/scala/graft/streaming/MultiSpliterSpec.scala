package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{BinaryType, StringType}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.config._

/** The reference's fleet topology (one pipeline per spliter,
  * main.go:333-336) driven with TWO concurrent streaming queries sharing a
  * session, supervised by awaitAnyFailure; plus the per-topic partitioned
  * file sink (the Kafka-less multiplex path).
  */
class MultiSpliterSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def spliter(tag: String, pattern: String) = PlanResolver.resolveSpliter(Spliter(
    s"in-$tag", Map("matched" -> s"$tag-match", "unmatched" -> s"$tag-unmatched"),
    Seq(Split(Extractor(pattern)))))

  test("two spliter queries run concurrently; supervision returns when all stop") {
    implicit val sqlCtx = spark.sqlContext
    val inA = MemoryStream[(String, String)]
    val inB = MemoryStream[(String, String)]
    val qA = StreamRouter.routeStream(inA.toDF().toDF("key", "value"), spliter("a", "alpha"))
      .writeStream.format("memory").queryName("fleet_a").start()
    val qB = StreamRouter.routeStream(inB.toDF().toDF("key", "value"), spliter("b", "beta"))
      .writeStream.format("memory").queryName("fleet_b").start()
    inA.addData(("k1", "has alpha"), ("k2", "nope"))
    inB.addData(("k3", "has beta"))
    qA.processAllAvailable(); qB.processAllAvailable()
    assert(spark.table("fleet_a").select($"topic").as[String].collect().sorted.toSeq
      == Seq("a-match", "a-unmatched"))
    assert(spark.table("fleet_b").select($"topic").as[String].collect().toSeq
      == Seq("b-match"))
    qA.stop(); qB.stop()
    Supervision.awaitAnyFailure(spark) // both stopped: returns
    spark.streams.resetTerminated()
  }

  test("partitioned-file multiplex sink lands per-topic directories") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    input.addData(("k1", "has alpha"), ("k2", "miss"), ("k3", "alpha too"))
    val out = Files.createTempDirectory("graft-fanout").toFile.getAbsolutePath
    val ck = Files.createTempDirectory("graft-fanout-ck").toFile.getAbsolutePath
    val routed = StreamRouter.routeStream(
        input.toDF().toDF("key", "value"), spliter("f", "alpha"))
      .select($"key".cast("string").as("key"), $"value".cast("string").as("value"), $"topic")
    val q = StreamRouter.toPartitionedFiles(routed, out, ck, Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
      .filterNot(_.startsWith("_")).sorted // _spark_metadata = the sink manifest
    assert(dirs.toSeq == Seq("topic=f-match", "topic=f-unmatched"))
    val matchRows = spark.read.parquet(s"$out/topic=f-match")
      .select($"key").as[String].collect().sorted
    assert(matchRows.toSeq == Seq("k1", "k3"))
  }

  test("routed output schema fits the Kafka sink contract") {
    val df = Seq((Array[Byte](1), Array[Byte](2))).toDF("key", "value")
    val routed = graft.router.Router.route(df, spliter("s", "x"))
    val fields = routed.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(fields("key") == BinaryType)    // pass-through binary
    assert(fields("value") == BinaryType)
    assert(fields("topic") == StringType)  // per-row routing column
  }
}
