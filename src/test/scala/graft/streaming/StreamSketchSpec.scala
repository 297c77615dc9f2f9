package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The two round-10 mergeable artifacts under a streaming ingest, driven
  * the way every mergeable Build seam in the repo is: per micro-batch,
  * build the batch's artifact and FOLD it into the running one (foreachBatch
  * — both folds are exact integer sums, so batching cannot change the
  * result). The pin is the fold law end-to-end through a real streaming
  * query: the folded artifact equals the one-shot whole-corpus build.
  */
class StreamSketchSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("foreachBatch CMS fold over micro-batches equals the one-shot sketch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    var running: Option[graft.ops.TextAnalysis.CmsSketch] = None
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) this.synchronized {
          val b = graft.ops.TextAnalysis.cmsBuild(batch, "text")
          val merged = running match {
            case Some(r) => graft.ops.TextAnalysis.cmsMerge(r, b)
            case None => b
          }
          // materialize the fold so lineage doesn't grow with batches
          running = Some(merged.copy(counters = merged.counters.localCheckpoint()))
        }
      }
      .start()
    try {
      val corpus = Seq(
        (1L, "a b c a"), (2L, "b c d"), (3L, "x y x"),
        (4L, "a b"), (5L, "d d d"), (6L, "y"))
      in.addData(corpus.take(3): _*)
      q.processAllAvailable()
      in.addData(corpus.drop(3): _*)
      q.processAllAvailable()
      val docs = corpus.toDF("doc_id", "text")
      val words = docs.select(explode(graft.ops.TextAnalysis.tokens($"text")).as("w")).distinct()
      def est(sk: graft.ops.TextAnalysis.CmsSketch) =
        graft.ops.TextAnalysis.cmsEstimateWith(words, "w", sk)
          .as[(String, Long)].collect().toMap
      val oneShot = est(graft.ops.TextAnalysis.cmsBuild(docs, "text"))
      assert(est(running.get) == oneShot)
      // and on this collision-free fixture the estimates are the exact counts
      val exact = docs.select(explode(graft.ops.TextAnalysis.tokens($"text")).as("w"))
        .groupBy($"w").count().as[(String, Long)].collect().toMap
      assert(est(running.get) == exact)
    } finally q.stop()
  }

  test("foreachBatch digest fold over micro-batches equals the one-shot digest") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    var running: Option[org.apache.spark.sql.DataFrame] = None
    val q = in.toDF().toDF("doc_id", "src", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) this.synchronized {
          val b = graft.ops.Analytics.contentDigest(batch, Seq("src"), Seq("doc_id", "text"))
          val merged = running match {
            case Some(r) => r.unionByName(b).groupBy($"src")
              .agg(sum($"n_rows").as("n_rows"),
                sum($"digest").cast("decimal(38,0)").as("digest"))
            case None => b
          }
          running = Some(merged.localCheckpoint())
        }
      }
      .start()
    try {
      val corpus = Seq(
        (1L, "s1", "alpha"), (2L, "s2", "beta"), (3L, "s1", "gamma"),
        (4L, "s2", "delta"), (5L, "s1", "epsilon"))
      in.addData(corpus.take(2): _*)
      q.processAllAvailable()
      in.addData(corpus.drop(2): _*)
      q.processAllAvailable()
      def toMap(df: org.apache.spark.sql.DataFrame) =
        df.select($"src", $"n_rows", $"digest".cast("string"))
          .as[(String, Long, String)].collect()
          .map { case (s, n, d) => (s, (n, d)) }.toMap
      val oneShot = toMap(graft.ops.Analytics.contentDigest(
        corpus.toDF("doc_id", "src", "text"), Seq("src"), Seq("doc_id", "text")))
      assert(toMap(running.get) == oneShot)
    } finally q.stop()
  }
}
