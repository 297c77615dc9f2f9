package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the physical-plan properties the 100 TB design depends on — a
  * refactor that silently loses a pushdown, a broadcast, or the shuffle-free
  * router shape should fail HERE, not in a cluster.
  */
class PlanRegressionSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf0001).queryExecution.executedPlan.toString

  test("q01: filter pushed to parquet scan, schema pruned, partial agg") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "scan reads columns the query never uses")
    assert(p.contains("partial_sum"), "map-side partial aggregation missing")
  }

  test("q03: dimension joins broadcast (no fact-table shuffle for dims)") {
    val p = plan("q03_shipping_priority")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), "segment filter not pushed")
  }

  test("router: single narrow projection, no shuffle before the sort") {
    val p = plan("route_topic_counts")
    // the route itself must not shuffle: below the LAST exchange (the
    // groupBy's) the plan must be partial-agg → CASE WHEN projection →
    // scan, with no further exchange
    val belowLastExchange = p.substring(p.lastIndexOf("Exchange"))
    assert(belowLastExchange.contains("CASE WHEN"), s"route not below the shuffle:\n$p")
    assert(belowLastExchange.contains("Scan parquet"), s"route not directly on the scan:\n$p")
    assert(belowLastExchange.contains("partial_count"), "map-side partial count missing")
  }

  test("sim_topk: partial top-k pushed below the shuffle (WindowGroupLimit)") {
    val p = plan("sim_topk_bruteforce")
    val idxLimit = p.indexOf("WindowGroupLimit")
    val idxExchange = p.lastIndexOf("Exchange hashpartitioning")
    assert(idxLimit >= 0, "WindowGroupLimit missing")
    assert(idxExchange >= 0 && p.indexOf("WindowGroupLimit", idxExchange) > 0,
      "no per-partition top-k below the shuffle")
  }

  test("minhash: native kernels present; signature computed once per side") {
    val p = plan("dedup_minhash_lsh")
    assert(p.contains("minhashsig(shinglengrams("))
    assert(p.contains("xxhash64"), "band bucket hashing missing")
  }
}
