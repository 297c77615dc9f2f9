package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `TextAnalysis.mixAllocate` — closed-form token-budget waterfilling.
  * Pins:
  *  - equivalence with a λ-bisection reference solver on randomized
  *    source censuses across alphas and both budget regimes (the greedy
  *    prefix test marking EXACTLY the capped set is the load-bearing
  *    claim — a mis-marked source silently shifts every allocation);
  *  - the waterfill invariants on the output itself: capped sources sit
  *    exactly at maxEpochs, uncapped sources share one λ (a_i/w_i
  *    constant), and the total meets the budget (or saturates at the
  *    caps when the budget is unfillable);
  *  - zero-token sources are dropped; plan stays source-grain after one
  *    corpus aggregation (no second scan of the document relation).
  */
class MixAllocateSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  /** Reference: bisect λ until Σ min(c_i, λ·w_i) = min(B, Σc). */
  private def refAlloc(n: Seq[Long], alpha: Double, budgetEpochs: Double,
                       maxEpochs: Double): Seq[Double] = {
    val c = n.map(_ * maxEpochs)
    val w = n.map(x => math.pow(x.toDouble, alpha))
    val b = math.min(budgetEpochs * n.sum, c.sum)
    def tot(lam: Double) = c.zip(w).map { case (ci, wi) => math.min(ci, lam * wi) }.sum
    var (lo, hi) = (0.0, c.zip(w).map { case (ci, wi) => ci / wi }.max * 2 + 1)
    (1 to 200).foreach { _ =>
      val mid = (lo + hi) / 2
      if (tot(mid) < b) lo = mid else hi = mid
    }
    val lam = (lo + hi) / 2
    c.zip(w).map { case (ci, wi) => math.min(ci, lam * wi) }
  }

  test("matches the bisection solver on randomized censuses") {
    val rnd = new scala.util.Random(23)
    (1 to 20).foreach { trial =>
      val sizes = (1 to (2 + rnd.nextInt(8))).map(_ => 100L + rnd.nextInt(10000))
      val alpha = Seq(0.0, 0.3, 0.5, 1.0)(rnd.nextInt(4))
      val be = 0.5 + rnd.nextDouble() * 3     // spans fillable and unfillable
      val me = 1.0 + rnd.nextDouble() * 2
      // one doc per source with exactly n whitespace tokens
      val df = sizes.zipWithIndex.map { case (n, i) =>
        (s"s$i", Seq.fill(n.toInt)("x").mkString(" "))
      }.toDF("source", "text")
      val got = TextAnalysis.mixAllocate(df, "source", "text", be, alpha, me)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      val want = refAlloc(sizes, alpha, be, me)
      sizes.indices.foreach { i =>
        // 0.005 for the operator's 2-dp output rounding + bisection slack
        assert(math.abs(got(s"s$i") - want(i)) < 6e-3,
          s"trial=$trial alpha=$alpha be=$be me=$me src=$i got=${got(s"s$i")} want=${want(i)}")
      }
    }
  }

  test("output invariants: caps exact, shared lambda, budget met") {
    val df = Seq(("a", 1000), ("b", 4000), ("c", 9000), ("d", 400))
      .map { case (s, n) => (s, Seq.fill(n)("x").mkString(" ")) }.toDF("source", "text")
    val rows = TextAnalysis.mixAllocate(df, "source", "text",
        budgetEpochs = 1.45, alpha = 0.5, maxEpochs = 1.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getDouble(4)))
    val (capped, free) = rows.partition(_._3 == 1)
    assert(capped.nonEmpty && free.nonEmpty)
    capped.foreach(r => assert(r._5 === 1.5, r))
    val lams = free.map(r => r._4 / math.sqrt(r._2.toDouble))
    lams.foreach(l => assert(math.abs(l - lams.head) < 1e-2, free.toSeq))
    val total = rows.map(_._4).sum
    assert(math.abs(total - 1.45 * rows.map(_._2).sum) < 1.0, rows.toSeq)
  }

  test("unfillable budget saturates at the caps; zero-token sources drop") {
    val df = Seq(("a", "x y z"), ("b", "x y"), ("z", " ")).toDF("source", "text")
    val rows = TextAnalysis.mixAllocate(df, "source", "text",
        budgetEpochs = 10.0, alpha = 1.0, maxEpochs = 2.0)
      .collect().map(r => (r.getString(0), r.getInt(2), r.getDouble(4))).toSet
    // " " trims to "" -> one empty token of length... tokens("") = [""],
    // count 1 > 0: the zero-token drop applies to sources with NO rows
    // producing tokens; the blank doc still counts its empty token (the
    // corpus-wide truncated-gram convention). So z allocates 2 epochs too.
    assert(rows === Set(("a", 1, 2.0), ("b", 1, 2.0), ("z", 1, 2.0)))
  }

  test("linear plan: one corpus branch, no join — the λ scalar is a window sum") {
    val df = Seq(("a", "x y"), ("b", "y z")).toDF("source", "text")
    val plan = TextAnalysis.mixAllocate(df, "source", "text", 1.0)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"expected a linear single-branch plan:\n$plan")
    assert("LocalRelation".r.findAllIn(plan).length <= 1, plan)
  }
}
