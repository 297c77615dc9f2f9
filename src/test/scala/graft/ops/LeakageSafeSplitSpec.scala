package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `TextAnalysis.leakageSafeSplit` — cluster-grain train/val/test
  * assignment. Pins:
  *  - the structural guarantee: every doc in a near-dup component gets the
  *    component's split (zero cross-split pairs), while the content-hash
  *    `splitAssignment` on the same planted twin corpus DOES leak pairs
  *    across the boundary — the exact failure mode the op exists to close;
  *  - singleton fallback (docs absent from the artifact keep their own id
  *    as rep — a stale artifact degrades to the status quo, not an error);
  *  - split proportions on singletons stay near the requested percentages
  *    (the hash is uniform, not degenerate);
  *  - the reserved-name and percentage guards.
  */
class LeakageSafeSplitSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  test("cluster members share one split; zero cross-split planted pairs") {
    // 60 twin pairs (i, i+1000) plus a 3-chain {1,2,3} — near-dup PAIRS
    // are the clustering input; detection ops are pinned elsewhere
    val ids = ((1L to 60L) ++ (1001L to 1060L) :+ 3L).distinct
    val docs = ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = ((1L to 60L).map(i => (i, i + 1000L)) ++ Seq((1L, 2L), (2L, 3L)))
      .toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(
      pairs, docs.select(col("doc_id").as("id")), "id")
    val out = TextAnalysis.leakageSafeSplit(docs, clusters, "doc_id")
      .select(col("doc_id"), col("cluster_rep"), col("split"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    graft.Cleanup.drain()
    (1L to 60L).foreach { i =>
      assert(out(i)._2 === out(i + 1000L)._2, s"pair ($i, ${i + 1000}) split apart")
    }
    assert(out(1L)._2 === out(2L)._2 && out(2L)._2 === out(3L)._2)
    assert(Set(1L, 2L, 3L, 1001L).map(out(_)._1).size === 1,
      "the chain and its twin share one representative")
  }

  test("content-hash split leaks planted twins; cluster split does not") {
    // twins differ by one appended token, so splitAssignment hashes them
    // independently — with 60 pairs at 90/5/5 the naive expectation is
    // ~11 crossings; the fixture is deterministic so the measured count
    // is stable
    val docs = (1L to 60L).flatMap { i =>
      Seq((i, s"twin doc body $i"), (i + 1000L, s"twin doc body $i extra"))
    }.toDF("doc_id", "text")
    val naive = docs
      .withColumn("split", TextAnalysis.splitAssignment(col("text")))
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val naiveCrossings = (1L to 60L).count(i => naive(i) != naive(i + 1000L))
    assert(naiveCrossings > 0,
      "fixture must exhibit the leakage class the op closes")
    val pairs = (1L to 60L).map(i => (i, i + 1000L)).toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(
      pairs, docs.select(col("doc_id").as("id")), "id")
    val safe = TextAnalysis.leakageSafeSplit(docs, clusters, "doc_id")
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.Cleanup.drain()
    assert((1L to 60L).count(i => safe(i) != safe(i + 1000L)) === 0)
  }

  test("streaming twin: the batch call runs unchanged on a stream, parity-exact") {
    // stateless shape (one stream-static left join + a hash projection),
    // so arriving crawl docs split against the FROZEN cluster artifact
    // with zero streaming state — the strongest streaming-twin form
    // (the streamingExactDedupWith rule: the batch call IS the streaming call)
    val docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = (1L to 10L).map(i => (i, i + 20L)).toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(
      pairs, docs.select(col("doc_id").as("id")), "id")
      .localCheckpoint(false) // freeze the artifact for both consumers
    val want = TextAnalysis.leakageSafeSplit(docs, clusters, "doc_id")
      .select(col("doc_id"), col("cluster_rep"), col("split"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    in.addData((1L to 40L).map(i => (i, s"doc $i")): _*)
    val q = TextAnalysis.leakageSafeSplit(
        in.toDF().toDF("doc_id", "text"), clusters, "doc_id")
      .select(col("doc_id"), col("cluster_rep"), col("split"))
      .writeStream.format("memory").queryName("lk_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("lk_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    graft.Cleanup.drain()
    assert(got === want)
  }

  test("singleton fallback, proportions, and guards") {
    val docs = (1L to 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val emptyClusters = Seq.empty[(Long, Long)].toDF("id", "rep")
    val out = TextAnalysis.leakageSafeSplit(docs, emptyClusters, "doc_id",
      trainPct = 80, valPct = 10)
    val rows = out.collect()
    assert(rows.forall(r => r.getAs[Long]("cluster_rep") == r.getAs[Long]("doc_id")),
      "absent artifact rows must fall back to their own id")
    val shares = rows.groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(math.abs(shares("train") - 1600) < 100, shares)
    assert(math.abs(shares.getOrElse("val", 0) - 200) < 60, shares)
    assert(math.abs(shares.getOrElse("test", 0) - 200) < 60, shares)
    intercept[IllegalArgumentException] {
      TextAnalysis.leakageSafeSplit(docs, emptyClusters, "doc_id",
        trainPct = 96, valPct = 10)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.leakageSafeSplit(docs.withColumn("split", lit("x")),
        emptyClusters, "doc_id")
    }
  }
}
