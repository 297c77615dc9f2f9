package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The novelty seam under a streaming ingest: `gramNoveltyWith` is the
  * per-micro-batch form (foreachBatch — novelty needs a batch boundary to
  * define "first within batch", so it is a batch op driven incrementally,
  * like every Build/With probe in the repo). The pin is the seam's fold
  * law end-to-end through a real streaming query: two micro-batches
  * scored against a growing seen-gram artifact produce EXACTLY the
  * one-shot whole-corpus attribution.
  */
class StreamNoveltySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("foreachBatch novelty over a growing artifact equals the one-shot run") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var seen = Seq.empty[String].toDF("__g")
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          results.synchronized {
            results ++= graft.ops.TextAnalysis
              .gramNoveltyWith(batch, seen, "doc_id", "text")
              .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
            seen = seen.union(
              graft.ops.TextAnalysis.noveltyBuild(batch, "doc_id", "text"))
              .distinct().localCheckpoint()
          }
        }
      }
      .start()
    try {
      val corpus = Seq(
        (1L, "a b c d"), (2L, "a b c e"), (3L, "x y"),
        (4L, "a b c d"), (5L, "b c e f"), (6L, "x y"))
      in.addData(corpus.take(3): _*)
      q.processAllAvailable()
      in.addData(corpus.drop(3): _*)
      q.processAllAvailable()
      val oneShot = graft.ops.TextAnalysis
        .gramNovelty(corpus.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(results.toSet === oneShot)
    } finally q.stop()
  }
}
