package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `TextAnalysis.gramNovelty` / `noveltyBuild` / `gramNoveltyWith`. Pins:
  *  - hand-computed attribution on a corpus with shared boilerplate
  *    (first occurrence awarded to the lowest id, each gram charged once);
  *  - hashGrams invariance (the production xxhash64 keying changes no
  *    counts);
  *  - totality: short and empty documents own their single truncated
  *    gram; null text behaves as empty;
  *  - the incremental seam: folding id-ordered batches through
  *    `gramNoveltyWith` + grown artifacts reproduces the one-shot
  *    whole-corpus attribution exactly;
  *  - plan shape: four hash exchanges total — the final doc-grain combine
  *    join reuses the aggregation partitioning instead of adding a fifth.
  */
class GramNoveltySpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b c d"),          // grams: abc, bcd — both novel
    (2L, "a b c e"),          // abc (seen), bce — 1 novel
    (3L, "x y"),              // single truncated gram "x y" — novel
    (4L, "a b c d"),          // exact dup of 1 — 0 novel
    (5L, ""),                 // truncated gram "" — novel (owns the empty gram)
    (6L, null.asInstanceOf[String]))  // null == empty, gram "" already owned by 5

  test("first-occurrence attribution on shared boilerplate, hand-computed") {
    val df = corpus.toDF("doc_id", "text")
    Seq(false, true).foreach { hg =>
      val got = TextAnalysis.gramNovelty(df, "doc_id", "text", n = 3, hashGrams = hg)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((1L, 2L, 2L), (2L, 2L, 1L), (3L, 1L, 1L),
        (4L, 2L, 0L), (5L, 1L, 1L), (6L, 1L, 0L)), s"hashGrams=$hg")
    }
  }

  test("incremental fold over id-ordered batches equals the one-shot run") {
    val df = corpus.toDF("doc_id", "text")
    val batch1 = df.filter(col("doc_id") <= 3)
    val batch2 = df.filter(col("doc_id") > 3)
    val oneShot = TextAnalysis.gramNovelty(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val empty = Seq.empty[String].toDF("__g")
    val r1 = TextAnalysis.gramNoveltyWith(batch1, empty, "doc_id", "text")
    val seen1 = TextAnalysis.noveltyBuild(batch1, "doc_id", "text")
    val r2 = TextAnalysis.gramNoveltyWith(batch2, seen1, "doc_id", "text")
    val folded = (r1.collect() ++ r2.collect())
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(folded === oneShot)
  }

  test("plan: the doc-grain combine join adds no fifth exchange") {
    val plan = TextAnalysis.gramNovelty(
      corpus.toDF("doc_id", "text"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n <= 4, s"expected <= 4 hash exchanges, got $n:\n$plan")
  }
}
