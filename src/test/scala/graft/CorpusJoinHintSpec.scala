package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical._
import org.scalatest.funsuite.AnyFunSuite

/** The round-14 corpus-derived-broadcast rule, MECHANIZED in round 15 (the
  * round-14 verdict's item 3): the original sweep enforced "every join
  * carries an explicit strategy hint" over a hand-curated 8-name list, so
  * a new candidate join in a new query escaped it silently. This version
  * walks EVERY `SparkEntry.queries` optimized plan (the WindowKeySweepSpec
  * pattern) and classifies each join side mechanically:
  *
  *   - IN SCOPE: join sides whose subtree contains a `Generate` (explode)
  *     node — the df-capped gram/fingerprint/term/band relations. This is
  *     where the hazard mechanically lives: Catalyst's size estimate for
  *     generated output is a guess, and the 1M `containment_pairs` probe
  *     measured AQE acting on that guess — broadcasting a 78M-row
  *     capped-gram relation on a pressured 8 GB heap and dying mid-build
  *     (DESIGN §16-§17.2). Plain scan/filter sides keep reliable
  *     estimates (and at 100 TB they are huge → SMJ on their own), so
  *     ordinary equi-joins stay Catalyst's business, unhinted — the
  *     TPC-H family is deliberately out of scope.
  *   - CORPUS-DERIVED vs ARTIFACT-GRAIN is MEASURED, not name-trusted
  *     (the WindowKeySweep round-9 lesson): the side's row count at
  *     sf0.001 vs sf0.1 — growth ≥ 2× over the 10× corpus step ⇒
  *     corpus-derived; flat ⇒ artifact grain (rosters, merge tables,
  *     centroid relations — safe to broadcast at any corpus size).
  *   - FLAG a corpus-derived in-scope side iff its join leaves the build
  *     choice to runtime estimates: no merge/shuffle-hash pin on the
  *     join, no broadcast pin on a measured-FLAT other side — or worse,
  *     a broadcast pin on the GROWING side itself.
  *
  * A flag is fixed by `hint("merge")` on the corpus-derived side (the
  * round-14 A/B measured the forced SMJ at-or-faster than the broadcast
  * it replaced at both sf0.1 and 1M — DESIGN §17.3), `broadcast()` on a
  * genuinely artifact-grain side, or an audited exception carrying a
  * written argument.
  */
class CorpusJoinHintSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001, sf01}

  /** Growth separating corpus-derived from artifact-grain across the 10×
    * corpus step (docs 500→5000) — the WindowKeySweepSpec constant.
    */
  private val growMin = 2.0

  /** Round-14's hand-curated list, kept ONLY as a recall assertion on the
    * classifier: every one of these must be REDISCOVERED as a
    * candidate-join-family member by structure alone, or the mechanical
    * sweep has lost the coverage the enumerative one had.
    */
  private val knownFamily = Seq(
    "dedup_containment", "dedup_containment_cross", "dedup_cross_corpus",
    "text_winnowing_matches", "text_winnowing_cross", "text_simjoin_tfidf",
    "docs_gram_novelty", "docs_novelty_incremental")

  /** Audited exceptions: (query, stable side tag) → written argument.
    * The tag is side ("L"/"R") + join index among IN-SCOPE joins in
    * pre-order — stable under unrelated plan edits, loud (assert below)
    * when the query's join census changes.
    */
  private val auditedExceptions: Map[(String, String), String] = Map.empty

  /** In-scope side: contains a Generate (explode) — unreliable size
    * estimates by construction — OR a LogicalRDD leaf (a localCheckpoint
    * output: the optimizer sees NO stats at all for it, and round 13's
    * actual OOM broadcast was precisely a checkpointed capped-gram
    * relation). Both are measured before flagging, so checkpointed
    * artifact-grain relations (merge tables, rosters) pass as flat.
    */
  private def hasGenerate(p: LogicalPlan): Boolean =
    p.collectFirst {
      case g: Generate => g
      case r: org.apache.spark.sql.execution.LogicalRDD => r
    }.nonEmpty

  private def strat(h: Option[HintInfo]): Option[JoinStrategyHint] =
    h.flatMap(_.strategy)

  /** The join's strategy is pinned away from broadcast entirely. */
  private def mergePinned(j: Join): Boolean =
    Seq(strat(j.hint.leftHint), strat(j.hint.rightHint)).flatten.exists {
      case SHUFFLE_MERGE | SHUFFLE_HASH => true
      case _ => false
    }

  private def bcastPinned(h: Option[HintInfo]): Boolean =
    strat(h).contains(BROADCAST)

  private def rowsOf(child: LogicalPlan): Long = {
    val n = Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
      isDistinct = false), "__n")()
    spark.sessionState.executePlan(Aggregate(Nil, Seq(n), child))
      .executedPlan.executeCollect().head.getLong(0)
  }

  /** One side of one in-scope join: what the sweep must decide about. */
  private case class SideCase(joinIdx: Int, tag: String, j: Join,
                              side: LogicalPlan, otherSide: LogicalPlan,
                              sideBcast: Boolean, otherBcast: Boolean)

  /** All in-scope (Generate-bearing) join sides of a plan, pre-order. */
  private def sideCases(plan: LogicalPlan): Seq[SideCase] = {
    val joins = plan.collect { case j: Join => j }
    joins.zipWithIndex.flatMap { case (j, i) =>
      Seq(
        SideCase(i, s"L$i", j, j.left, j.right,
          bcastPinned(j.hint.leftHint), bcastPinned(j.hint.rightHint)),
        SideCase(i, s"R$i", j, j.right, j.left,
          bcastPinned(j.hint.rightHint), bcastPinned(j.hint.leftHint)))
        .filter(c => hasGenerate(c.side))
    }
  }

  /** Classify one query; returns (violations, isFamilyMember).
    * Measurement is lazy: sf0.1 is built only when an unpinned (or
    * broadcast-exposed) in-scope side exists, and each distinct side is
    * counted once per SF.
    */
  private def classify(name: String,
                       build: String => org.apache.spark.sql.DataFrame,
                       seenAudited: scala.collection.mutable.Set[(String, String)])
      : (Seq[String], Boolean) = {
    val p1 = build(sf0001).queryExecution.optimizedPlan
    val cases1 = sideCases(p1)
    if (cases1.isEmpty) { Cleanup.drain(); return (Nil, false) }
    // family membership: an in-scope side exists at all (for the recall
    // assertion; the 8 known members are all merge- or broadcast-pinned)
    val family = true
    // decide which sides need measurement:
    //  - merge/shuffle-hash pin on the join → side safe, no measurement
    //  - side itself broadcast-pinned → measure the SIDE (growing = flag)
    //  - other side broadcast-pinned → measure the OTHER side (it must be
    //    flat for the pin to be safe)
    //  - no pin anywhere → measure the SIDE (growing + unpinned = flag)
    case class Need(c: SideCase, target: String) // target: "side"|"other"
    val needs = cases1.flatMap { c =>
      val audited = auditedExceptions.contains((name, c.tag))
      if (audited) { seenAudited += ((name, c.tag)); None }
      else if (mergePinned(c.j)) None
      else if (c.sideBcast) Some(Need(c, "side"))
      else if (c.otherBcast) Some(Need(c, "other"))
      else Some(Need(c, "side"))
    }
    if (needs.isEmpty) { Cleanup.drain(); return (Nil, family) }
    val m1 = needs.map(nd =>
      rowsOf(if (nd.target == "side") nd.c.side else nd.c.otherSide))
    Cleanup.drain()
    val pL = build(sf01).queryExecution.optimizedPlan
    val casesL = sideCases(pL)
    assert(casesL.map(c => (c.tag, c.j.joinType.toString)) ==
      cases1.map(c => (c.tag, c.j.joinType.toString)),
      s"$name: in-scope join census differs between sf0.001 and sf0.1 — " +
        "align the branches or audit the SF-dependent form")
    val byTag = casesL.map(c => c.tag -> c).toMap
    val out = needs.zip(m1).flatMap { case (nd, n1) =>
      val cL = byTag(nd.c.tag)
      val nL = rowsOf(if (nd.target == "side") cL.side else cL.otherSide)
      val growing = nL >= 100 && nL >= growMin * math.max(n1, 1L)
      (nd.target, growing) match {
        case ("side", true) if nd.c.sideBcast => Some(
          s"$name join ${nd.c.tag}: BROADCAST-pinned side contains a " +
            s"Generate and measures corpus-derived ($n1→$nL rows) — a " +
            "growing relation is pinned onto every executor's heap")
        case ("side", true) => Some(
          s"$name join ${nd.c.tag}: hint-less candidate join — the " +
            s"Generate-bearing side measures corpus-derived ($n1→$nL " +
            "rows) and the build choice is one AQE size estimate away " +
            "from a broadcast OOM; pin hint(\"merge\") (or broadcast() " +
            "the artifact side)")
        case ("other", true) => Some(
          s"$name join ${nd.c.tag}: the broadcast-pinned side opposite " +
            s"a Generate-bearing side measures corpus-derived ($n1→$nL " +
            "rows) — the pin ships a growing relation to every executor")
        case _ => None
      }
    }
    Cleanup.drain()
    (out, family)
  }

  test("every Generate-bearing join side in every wired query is " +
       "merge-pinned, broadcast-safe (flat), measured artifact-grain, " +
       "or audited") {
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    val familyMembers = scala.collection.mutable.Set.empty[String]
    val seenAudited = scala.collection.mutable.Set.empty[(String, String)]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val (v, fam) = classify(name, dir => fn(spark, dir), seenAudited)
      violations ++= v
      if (fam) familyMembers += name
    }
    assert(violations.isEmpty,
      s"corpus-derived join sides exposed to AQE/broadcast:\n  " +
        violations.mkString("\n  "))
    // recall assertion: the mechanical classifier rediscovers every
    // member of round-14's hand-curated list by structure alone
    val missed = knownFamily.filterNot(familyMembers)
    assert(missed.isEmpty,
      s"mechanical sweep lost coverage of known candidate-join queries: $missed")
    val stale = auditedExceptions.keySet -- seenAudited
    assert(stale.isEmpty, s"audited exceptions no longer present: $stale")
  }

  test("planted hint-less candidate join IS flagged; merge-pinned and " +
       "flat-broadcast mirrors are NOT") {
    import org.apache.spark.sql.functions._
    val seen = scala.collection.mutable.Set.empty[(String, String)]
    def grams(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("g"))
    // hint-less: exploded gram self-join — the containment shape with the
    // round-14 pins removed; must flag red
    val (planted, fam) = classify("planted_bare_candidate", dir => {
      val g = grams(dir)
      g.as("a").join(g.as("b"), Seq("g")).select(col("a.doc_id"))
    }, seen)
    assert(fam && planted.exists(_.contains("hint-less candidate join")),
      s"a bare exploded-side join must be flagged: $planted")
    // merge-pinned mirror: the round-14 cure — must pass
    val (pinned, _) = classify("planted_merge_pinned", dir => {
      val g = grams(dir)
      g.as("a").join(g.as("b").hint("merge"), Seq("g")).select(col("a.doc_id"))
    }, seen)
    assert(pinned.isEmpty, s"a merge-pinned candidate join must pass: $pinned")
    // flat-broadcast mirror: exploded corpus side joined to a broadcast
    // ARTIFACT roster (corpus-independent) — must pass
    val (bcastFlat, _) = classify("planted_flat_broadcast", dir => {
      val g = grams(dir)
      val roster = spark.range(5).select(concat(lit("w"), col("id")).as("g"))
      g.join(broadcast(roster), Seq("g")).select(col("doc_id"))
    }, seen)
    assert(bcastFlat.isEmpty,
      s"a broadcast pin on a measured-flat artifact side must pass: $bcastFlat")
  }

  test("planted broadcast pin on a GROWING exploded side IS flagged") {
    import org.apache.spark.sql.functions._
    val seen = scala.collection.mutable.Set.empty[(String, String)]
    val (planted, _) = classify("planted_growing_broadcast", dir => {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val g = d.select(col("doc_id"), explode(split(col("text"), " ")).as("g"))
      d.select(col("doc_id"), col("n_chars"))
        .join(broadcast(g), Seq("doc_id")).select(col("g"))
    }, seen)
    assert(planted.exists(_.contains("BROADCAST-pinned side")),
      s"broadcasting a growing exploded relation must be flagged: $planted")
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
