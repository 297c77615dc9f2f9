package graft

import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funsuite.AnyFunSuite

/** The round-14 corpus-derived-broadcast rule, swept mechanically: in the
  * candidate-join query family (df-capped gram/fingerprint/term joins —
  * the relations that scale with the corpus), EVERY join must carry an
  * explicit strategy hint: `hint("merge")` on corpus-derived build sides,
  * `broadcast()` on artifact-grain ones. A hint-less join leaves the
  * build-side choice to size estimates and AQE — which the 1M
  * `containment_pairs` probe measured choosing a broadcast build of a
  * 78M-row capped-gram relation on a pressured 8 GB heap and dying
  * mid-build (DESIGN §16). At sf0.1 that broadcast happens to fit and at
  * true scale AQE merge-joins anyway; the awkward middle is exactly where
  * a pressured production job lands, so the strategy is pinned in the
  * plan, not left to runtime stats.
  *
  * The sweep walks the OPTIMIZED logical plan (where ResolvedHint nodes
  * have been folded into Join.hint), so both `broadcast()` and
  * `hint("merge")` register, and a newly-added hint-less join anywhere in
  * a flagged query's tree — including joins composed at the SparkEntry
  * layer — fails the build with the offending node printed.
  */
class CorpusJoinHintSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}

  /** The flagged family: every query whose plan contains a corpus-scale
    * candidate join (gram/fingerprint/term/bucket self- or cross-joins).
    */
  private val flagged = Seq(
    "dedup_containment", "dedup_containment_cross", "dedup_cross_corpus",
    "text_winnowing_matches", "text_winnowing_cross", "text_simjoin_tfidf",
    "docs_gram_novelty", "docs_novelty_incremental")

  test("every join in the corpus-candidate-join family carries an explicit " +
       "strategy hint (merge for corpus-derived, broadcast for artifacts)") {
    flagged.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.optimizedPlan
      val bare = plan.collect {
        case j: Join if j.hint.leftHint.isEmpty && j.hint.rightHint.isEmpty => j
      }
      assert(bare.isEmpty,
        s"$name: ${bare.size} hint-less join(s) — a corpus-derived build " +
          s"side is one AQE size estimate away from a broadcast OOM:\n" +
          bare.map(_.simpleString(3)).mkString("\n"))
      graft.Cleanup.drain()
    }
  }

  test("the merge hints survive to the physical plan: the containment " +
       "self-join sort-merges even at toy SF where broadcast would fit") {
    val p = SparkEntry.queries("dedup_containment")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"),
      s"capped-gram self-join must be a SortMergeJoin at ANY SF:\n$p")
    graft.Cleanup.drain()
  }
}
