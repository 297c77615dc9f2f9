package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Randomized (fixed-seed, deterministic) equivalence sweeps for the
  * round-7 selection ops: the bounded histogram/LSH forms must equal
  * their brute-force specifications on ARBITRARY data, not just the
  * shipped fixtures — score distributions with heavy ties, sources of
  * wildly different sizes, k above/at/below source sizes, and planted
  * near-dup corpora with safe similarity margins.
  */
class CapCrossPropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val words = Vector("the", "a", "and", "of", "fast", "slow", "ship",
    "cargo", "query", "spark", "shuffle", "broadcast", "lattice", "corpus",
    "token", "vector", "window", "bucket", "band", "probe")

  private def randomDoc(r: scala.util.Random, nTokens: Int): String =
    Seq.fill(nTokens)(words(r.nextInt(words.length))).mkString(" ")

  test("sourceCap == window top-k on random corpora (sizes, ties, k sweeps)") {
    val r = new scala.util.Random(20260813L)
    for (round <- 1 to 6) {
      // skewed source sizes: source s_i gets ~2^i rows — one source can
      // dominate while others sit below any cap
      var nextId = 0L
      val rows = (0 until 5).flatMap { s =>
        val sz = 1 << (s + round % 3)
        (0 until sz).map { _ =>
          nextId += 1 + r.nextInt(5) // unique, gappy ids
          // token counts straddle the quality-score feature boundaries
          // (10..200 band) so the score lattice is well-populated
          (nextId, s"s$s", randomDoc(r, 2 + r.nextInt(20)))
        }
      }
      val df = rows.toDF("doc_id", "source", "text")
      val k = Seq(1, 2, 3, 7, 1000)(round % 5)
      val got = TextAnalysis.sourceCap(df, "text", k)
        .as[(Long, String, Double)].collect().toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"quality_score".desc, $"doc_id")
      val expect = TextAnalysis.qualityScore(df, "text")
        .withColumn("rn", row_number().over(w)).filter($"rn" <= k)
        .select($"doc_id", $"source", $"quality_score")
        .as[(Long, String, Double)].collect().toSet
      assert(got == expect, s"round $round (k=$k): histogram cap != window top-k")
      graft.Cleanup.drain()
    }
  }

  test("crossCorpusNearDups == brute cross jaccard on random planted corpora") {
    val r = new scala.util.Random(7070707L)
    for (round <- 1 to 4) {
      // reference docs + mutated copies (1 token swapped of ~30: jaccard
      // >> 0.5) + unrelated docs (independent draws: jaccard << 0.5) —
      // margins keep LSH recall exact by the S-curve, so equality with
      // brute force is a sound oracle on random data
      val nRef = 20 + round * 10
      val refDocs = (0 until nRef).map(i => (i.toLong * 2, randomDoc(r, 30)))
      val mutated = refDocs.take(nRef / 2).map { case (id, tx) =>
        val toks = tx.split(" ").toVector
        val j = r.nextInt(toks.length)
        (id + 1, toks.updated(j, "mutantword" + id).mkString(" "))
      }
      val unrelated = (0 until nRef / 2).map(i =>
        (1001L + i * 2, randomDoc(r, 30)))
      val all = (refDocs ++ mutated ++ unrelated).toDF("doc_id", "text")
      val corpus = all.filter($"doc_id" % 2 === 1)
      val ref = all.filter($"doc_id" % 2 === 0)
      val got = Dedup.crossCorpusNearDups(corpus, ref, "doc_id", "text",
          3, 16, 4, 0.5)
        .as[(Long, Long, Double)].collect().toSet
      val pairs = Dedup.jaccardPairs(all, "doc_id", "text", 3, 0.5)
        .as[(Long, Long, Double)].collect()
      val expect = pairs.flatMap { case (a, b, j) =>
        if (a % 2 != b % 2) {
          val (n, rf) = if (a % 2 == 1) (a, b) else (b, a)
          Some((n, rf, j))
        } else None
      }.groupBy(_._1).map { case (n, ms) =>
        val best = ms.minBy(m => (-m._3, m._2)); (n, best._2, best._3)
      }.toSet
      assert(got == expect, s"round $round: asymmetric LSH != brute cross force")
      assert(got.nonEmpty, s"round $round: planted mutated copies must flag")
    }
  }
}
