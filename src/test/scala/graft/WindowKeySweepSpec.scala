package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical._

/** Mechanical closure of the round-7 sweep gap: the manual anti-pattern
  * audit judged every `Window.partitionBy` by key cardinality, caught
  * `packBins`, and then mis-graded `mixInterleave`'s per-source rank as
  * "key-local" — a config-scale key (|sources| ≈ a handful) that funnels
  * corpus/|sources| rows through one task at 100 TB. This spec applies
  * the cardinality test to EVERY window in EVERY wired query, so the next
  * config-scale window can't slip through on prose.
  *
  * Classification of each window's partition keys (optimized logical
  * plan, so what Catalyst will actually execute):
  *   - DATA-SCALE: a key whose cardinality grows with the corpus
  *     (doc ids, user ids, join-side ids, content fingerprints, …) —
  *     parallelism grows with the data; fine.
  *   - SUB-BUCKETED: a config-scale key paired with an id/fp-range
  *     sub-bucket term (`__b`, `__salt`, `bucket`) — the two-phase
  *     decomposition; parallelism = |keys| × buckets; fine.
  *   - BOUNDED GRAIN: the window's input grain is an Aggregate (score
  *     histograms, bucket censuses, per-key stats) or carries a
  *     WindowGroupLimit (per-partition top-k pushed below the exchange)
  *     — the window sees histogram rows or ≤k rows per key, not corpus
  *     rows; fine.
  *   - Anything else is a CONFIG-SCALE window over corpus rows — the
  *     scale defect this spec exists to catch. It must either be fixed
  *     (sub-bucket it) or appear in `auditedExceptions` with a written
  *     justification.
  */
class WindowKeySweepSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}

  /** Keys whose distinct-value count grows with corpus size. */
  private val dataScaleKeys: Set[String] = Set(
    "doc_id", "vec_id", "user_id", "query_id", "event_id", "session_id",
    "id", "id_a", "id_b", "id_new", "id_ref", "cluster_rep", "rep",
    "o_orderkey", "l_orderkey", "o_custkey", "c_custkey",
    "p_partkey", "ps_partkey", "l_partkey", "s_suppkey", "ps_suppkey",
    "l_suppkey", "fp", "term", "gram", "g", "w1", "w2", "shingle",
    "n_chars", "rank_key", "bucket",
    // internal doc-id aliases of the text ops (tfidf/simjoin/wordLift
    // select col(idCol).as("doc"/"__doc")): grouping on them makes every
    // buffer document-sized, i.e. corpus/|docs| — data-scale by
    // construction
    "doc", "__doc")

  /** Sub-bucket terms that restore parallelism under a config-scale key
    * (the two-phase window decomposition and the salted join).
    */
  private val subBucketKeys: Set[String] = Set("__b", "__salt")

  /** Windows audited by hand as bounded despite a config-scale key over a
    * non-aggregate input. Keyed by (query, sorted partition-key names);
    * value = the justification the audit rests on. Adding an entry here
    * requires the same written argument these carry.
    */
  private val auditedExceptions: Map[(String, Seq[String]), String] = Map(
    ("docs_source_cap", Seq("source")) ->
      ("boundary-bucket rank: the row_number runs ONLY over rows whose " +
        "score equals the per-source threshold — one histogram bucket per " +
        "source, not the source's corpus rows (sourceCap scaladoc; " +
        "boundary_audit.py proves the bucket is exercised)"),
    ("docs_shuffle_shards", Seq("shard")) ->
      ("probe-degraded one-window form: twoPhaseWorthIt measured ≤64k " +
        "total rows at test SF, where one task per shard is milliseconds; " +
        "the production two-phase shape is forced and plan-pinned in " +
        "PlanRegressionSpec (autoDegradeBelow = 0)"),
    ("text_pack_bins", Seq("lang")) ->
      ("probe-degraded one-window cumsum, same argument as " +
        "docs_shuffle_shards; two-phase shape plan-pinned separately"))

  /** Descend from a window's input through row-preserving nodes to decide
    * whether the grain is bounded: an Aggregate (histogram/census — its
    * output cardinality is the group-key lattice, not the corpus) or a
    * WindowGroupLimit (per-partition top-k: ≤k rows per key reach the
    * window). Project/Filter/Sort/aliasing don't change the argument;
    * another Window doesn't either (windows are row-preserving).
    */
  @annotation.tailrec
  private def boundedGrain(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case _: WindowGroupLimit => true
    case n @ (_: Project | _: Filter | _: Sort | _: SubqueryAlias |
              _: Window | _: RepartitionOperation) =>
      boundedGrain(n.children.head)
    case _ => false
  }

  /** Collect-aggregate buffers audited as bounded despite an unbounded
    * per-group row count on paper. Same contract as `auditedExceptions`.
    */
  private val auditedCollects: Map[(String, Seq[String]), String] = Map(
    ("emb_mean_pool", Seq("grp", "pos")) ->
      ("deterministic sorted-fold mean: collecting per (group, dimension) " +
        "is the price of a bit-exact oracle hash across partitionings — " +
        "`meanPoolAvg` is the implemented production variant (plain avg, " +
        "O(1) mergeable state, spec-pinned equal after rounding); the " +
        "8-bucket grp here is the wired test shape, not the op's contract"))

  test("every collect_list/collect_set buffer is segment-keyed, bounded-grain, or audited") {
    // the aggregation-state twin of the window rule (DESIGN §11): a
    // collect over group key K buffers rows-per-K in ONE aggregation
    // state — `postings`' whole-term list was the round-8 instance, fixed
    // by segmenting the key. A collect is fine when (a) its key set
    // includes a data-scale id — per-group size is then corpus/|ids|,
    // i.e. document/session-sized, not corpus-sized; (b) a segment/
    // sub-bucket term caps the group; or (c) the input grain is already
    // a bounded aggregate. Config-scale-keyed collects over corpus rows
    // must carry a written audit entry.
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    val seenAudited = scala.collection.mutable.Set.empty[(String, Seq[String])]
    val collectFns = Set("collect_list", "collect_set")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sf0001).queryExecution.optimizedPlan
      Cleanup.drain()
      plan.foreach {
        case a: Aggregate if a.aggregateExpressions.exists(_.collectFirst {
            case f: org.apache.spark.sql.catalyst.expressions.aggregate.CollectList => f
            case f: org.apache.spark.sql.catalyst.expressions.aggregate.CollectSet => f
          }.nonEmpty) =>
          val keys = a.groupingExpressions
            .flatMap(_.references.toSeq.collect { case at: Attribute => at.name })
            .distinct.sorted
          val ok = keys.exists(dataScaleKeys) ||
            keys.exists(k => subBucketKeys(k) || k == "seg") ||
            boundedGrain(a.child)
          if (!ok) {
            if (auditedCollects.contains((name, keys))) seenAudited += ((name, keys))
            else violations += s"$name: collect over groupBy(${keys.mkString(", ")}) " +
              s"— unbounded per-group buffer at scale"
          }
        case _ =>
      }
    }
    assert(violations.isEmpty,
      s"unbounded collect buffers:\n  ${violations.mkString("\n  ")}")
    val stale = auditedCollects.keySet -- seenAudited
    assert(stale.isEmpty, s"audited collects no longer present: $stale")
  }

  test("every wired window is data-scale, sub-bucketed, bounded-grain, or audited") {
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    val seenAudited = scala.collection.mutable.Set.empty[(String, Seq[String])]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sf0001).queryExecution.optimizedPlan
      Cleanup.drain()
      plan.foreach {
        case w: Window if w.partitionSpec.nonEmpty =>
          val keys = w.partitionSpec
            .flatMap(_.references.toSeq.collect { case a: Attribute => a.name })
            .distinct.sorted
          val ok = keys.exists(dataScaleKeys) ||
            keys.exists(subBucketKeys) ||
            boundedGrain(w.child)
          if (!ok) {
            val audited = auditedExceptions.contains((name, keys))
            if (audited) seenAudited += ((name, keys))
            else violations += s"$name: Window.partitionBy(${keys.mkString(", ")}) " +
              s"over a non-aggregate input — config-scale key, corpus rows " +
              s"through |keys| tasks at scale"
          }
        case w: Window =>
          // empty partitionSpec = a GLOBAL single-task window; only legal
          // above a bounded grain (census cumsum over histogram rows)
          if (!boundedGrain(w.child))
            violations += s"$name: UNPARTITIONED window over a non-aggregate " +
              s"input — whole-corpus single task"
        case _ =>
      }
    }
    assert(violations.isEmpty,
      s"config-scale windows over corpus rows:\n  ${violations.mkString("\n  ")}")
    // stale-allowlist guard: every audited exception must still exist —
    // an entry that stops matching is either fixed (delete it) or renamed
    // (re-audit it)
    val stale = auditedExceptions.keySet -- seenAudited
    assert(stale.isEmpty, s"audited exceptions no longer present: $stale")
  }
}
