package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The text-curation ops compose in Structured Streaming: normalization is
  * a stateless projection (streams unchanged), and exact dedup over the
  * NORMALIZED text is watermark-bounded state — together the canonical
  * "clean then dedup" ingest stage of a training-data pipeline, running
  * incrementally.
  */
class StreamTextPipelineSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("normalize → streaming exact dedup collapses formatting variants") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val df = in.toDF().toDF("ts", "text")
      .withColumn("norm", graft.ops.TextAnalysis.normalize($"text"))
    val deduped = graft.ops.Dedup.streamingExactDedup(df, "ts", "10 minutes", Seq("norm"))
    val q = deduped.writeStream.format("memory")
      .queryName("norm_dedup").outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      in.addData(
        (t0, "Hello  <b>World</b>"), // normalizes to "hello world"
        (t0, "hello world"),         // formatting variant of the same doc
        (t0, "other doc"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT norm FROM norm_dedup").as[String].collect().toSeq
      assert(rows.sorted == Seq("hello world", "other doc"),
        s"variants did not collapse: $rows")
    } finally q.stop()
  }
}
