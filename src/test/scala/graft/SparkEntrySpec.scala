package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows; every query name has
  * either oracle SQL or a documented rows-only rationale; oracle SQL only
  * references declared queries.
  */
class SparkEntrySpec extends AnyFunSuite {
  import TestSpark.spark

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("rows-only queries are exactly the approximate/oracle-inexpressible ops") {
    // dedup_minhash_lsh graduated to a full oracle in round 2 (recall is
    // exact at the test SFs, so it shares the exact-Jaccard SQL);
    // sim_topk_ivf graduated in round 8 on its planted-twin exact leg;
    // dedup_simhash + dedup_minhash_estimate graduated in round 9 via the
    // XXH64-in-SQL dialect (OracleHashSql); vocab_bpe_merges graduated
    // late in round 9 (the 20-round training loop replayed in one DuckDB
    // statement — OracleBpeSql.mergesSql). Round 10 closed the last
    // three: the genuinely-approximate sketches (HLL distinct, percentile
    // sketch, Bloom probe) now emit within-documented-bound verdict
    // booleans alongside the sketch values, which both engines produce
    // deterministically — so EVERY query is oracle-bearing.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set.empty[String])
  }

  test("bench headline subset names only real, production (non-oracle) queries") {
    val unknown = Bench.headline.filterNot(SparkEntry.queries.keySet)
    assert(unknown.isEmpty, s"headline entries with no query: $unknown")
    val oracleOnly = Bench.headline.filter(SparkEntry.oracleOnly)
    assert(oracleOnly.isEmpty, s"oracle-only queries in the headline: $oracleOnly")
    assert(Bench.headline.distinct.size == Bench.headline.size, "duplicate headline entries")
  }

  test("oracle-only queries are declared, oracle-bearing, and few") {
    // the deliberately-quadratic oracles must stay a recognized subset so
    // Bench can report them outside the production totals
    assert(SparkEntry.oracleOnly.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.oracleOnly.subsetOf(SparkEntry.oracleSql.keySet),
      "an oracle-only query without oracle SQL would be untestable")
    assert(SparkEntry.oracleOnly == Set("dedup_ngram_jaccard"))
  }

  test("every query runs and is non-empty on sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, TestSpark.sf0001).count()
      graft.Cleanup.drain() // free per-query checkpoint blocks (t90, tfidf…)
      if (n == 0) Some(name) else None
    }
    // the set-algebra queries are data-dependent and may legitimately go
    // empty at tiny SF (10 suppliers at sf0.001 → few high-balance overlaps)
    val dataDependent = Set("q_set_except", "q_set_intersect")
    assert(empties.forall(dataDependent), s"unexpected empty queries: $empties")
  }
}
