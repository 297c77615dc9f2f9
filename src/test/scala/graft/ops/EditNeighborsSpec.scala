package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `TextAnalysis.editNeighbors` — symmetric-deletion edit-distance join.
  * Pins:
  *  - exact equivalence with the brute-force all-pairs Levenshtein join on
  *    random vocabularies over a 3-letter alphabet (high collision odds),
  *    for both maxEdit = 1 and maxEdit = 2 — candidate COMPLETENESS is the
  *    load-bearing claim (a missed candidate is a silent false negative;
  *    extra candidates only cost verify time);
  *  - output canonicalization (w1 < w2, each pair exactly once);
  *  - the maxLen gate and empty-input totality;
  *  - the plan: candidate generation is an equi-join on the variant —
  *    no CartesianProduct / BroadcastNestedLoopJoin anywhere.
  */
class EditNeighborsSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(vocab: Seq[String], k: Int): Set[(String, String, Int)] =
    (for {
      a <- vocab; b <- vocab if a < b
      d = lev(a, b) if d <= k
    } yield (a, b, d)).toSet

  test("matches brute-force Levenshtein join on random vocabularies, k=1 and k=2") {
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { _ =>
      val vocab = (1 to 60).map(_ =>
        (1 to (1 + rnd.nextInt(6))).map(_ => "abc" (rnd.nextInt(3))).mkString)
        .distinct
      val df = vocab.toDF("w")
      Seq(1, 2).foreach { k =>
        val got = TextAnalysis.editNeighbors(df, "w", maxEdit = k)
          .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
        assert(got === brute(vocab, k), s"k=$k vocab=$vocab")
      }
    }
  }

  test("pairs are canonical and unique") {
    val df = Seq("ab", "ab", "b", "ba", "abc").toDF("w")
    val rows = TextAnalysis.editNeighbors(df, "w").collect()
    assert(rows.length === rows.map(r => (r.getString(0), r.getString(1))).distinct.length)
    rows.foreach(r => assert(r.getString(0) < r.getString(1)))
  }

  test("maxLen gates long values; empty input yields empty output") {
    val df = Seq("short", "shirt", "x" * 100, "x" * 100 + "y").toDF("w")
    val got = TextAnalysis.editNeighbors(df, "w", maxEdit = 1, maxLen = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("shirt", "short")))
    assert(TextAnalysis.editNeighbors(Seq.empty[String].toDF("w"), "w").count() === 0)
  }

  test("cross-corpus probe matches brute force, dist-0 rows mark known values") {
    val rnd = new scala.util.Random(31)
    (1 to 4).foreach { trial =>
      val ref = (1 to 40).map(_ =>
        (1 to (1 + rnd.nextInt(5))).map(_ => "abc" (rnd.nextInt(3))).mkString).distinct
      val batch = (1 to 40).map(_ =>
        (1 to (1 + rnd.nextInt(5))).map(_ => "abc" (rnd.nextInt(3))).mkString).distinct
      Seq(1, 2).foreach { k =>
        val idx = TextAnalysis.editIndexBuild(ref.toDF("w"), "w", maxEdit = k)
        val got = TextAnalysis.editNeighborsWith(batch.toDF("w"), idx, "w", maxEdit = k)
          .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
        val want = (for {
          b <- batch; a <- ref
          d = lev(b, a) if d <= k
        } yield (b, a, d)).toSet
        assert(got === want, s"trial=$trial k=$k")
        // identical values surface as dist-0 pairs
        batch.toSet.intersect(ref.toSet).foreach(w => assert(got((w, w, 0))))
      }
    }
  }

  test("probing per batch equals probing the union (stream-static shape)") {
    val ref = Seq("abc", "abd", "xyz").toDF("w")
    val idx = TextAnalysis.editIndexBuild(ref, "w")
    val all = Seq("abx", "ayz", "abc", "qqq")
    def probe(vs: Seq[String]) =
      TextAnalysis.editNeighborsWith(vs.toDF("w"), idx, "w")
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(probe(all.take(2)) ++ probe(all.drop(2)) === probe(all))
  }

  test("plan has no cartesian or nested-loop join") {
    val plan = TextAnalysis.editNeighbors(
      Seq("ab", "ba").toDF("w"), "w", maxEdit = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
