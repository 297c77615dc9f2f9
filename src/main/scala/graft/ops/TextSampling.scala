package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TextAnalysis partition: deterministic sampling, sharding, packing, and
  * mixture scheduling — stratified/priority sampling, shuffle shards,
  * token-budget bins, weighted round-robin interleave, token-budget
  * allocation. Home of the two-phase window decomposition
  * ([[twoPhaseWorthIt]]). See [[TextAnalysis]].
  */
trait TextSampling { self: TextAnalysis.type =>

  /** Deterministic stratified sampling by content hash: keep a document iff
    * pmod(fingerprint(text), 1000) < ratePerMille(stratum) — per-stratum
    * per-mille keep rates (e.g. downsample the dominant language, keep all
    * of a rare one). Content-keyed like `splitAssignment`: the decision is
    * a pure function of the text, so the sample is identical across
    * re-partitions, re-runs, and incremental rebuilds — the property
    * `df.sample()` (seeded per-partition RNG, partition-layout-dependent)
    * cannot give at 100 TB. Scan-speed filter, no shuffle; at scale this is
    * the first stage of corpus mixing (rebalancing language/source
    * proportions before training).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, textCol: String,
                       ratesPerMille: Map[String, Int],
                       defaultPerMille: Int): DataFrame = {
    (ratesPerMille.values.toSeq :+ defaultPerMille).foreach(r =>
      require(r >= 0 && r <= 1000, s"per-mille rate out of [0,1000]: $r"))
    val bucket = pmod(fingerprint(col(textCol)), lit(1000L))
    // build the rate CASE in sorted-key order so the plan (and thus plan
    // regression baselines) is stable regardless of Map iteration order
    val rate = ratesPerMille.toSeq.sortBy(_._1).foldRight(lit(defaultPerMille).cast("long")) {
      case ((k, v), acc) => when(col(strataCol) === k, lit(v.toLong)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /** Deterministic weighted sampling without replacement, size exactly k:
    * priority sampling (Duffield–Lund–Thorup, JACM 2007). Each row gets a
    * priority q = w / u where u ∈ (0,1] is a uniform deterministically
    * derived from the content fingerprint; the k highest-priority rows are
    * the sample, and with τ = the (k+1)-th priority, est_w = max(w, τ) is
    * an unbiased estimator of any subset-sum over the original weights —
    * the property that lets a 100 TB pipeline audit a weighted sample
    * ("how many tokens does this sample represent?") without rescanning
    * the corpus.
    *
    * Determinism discipline (same as `stratifiedSample`): u comes from the
    * rolling-hash fingerprint, not an RNG, so the sample is identical
    * across re-partitions and re-runs, and — unlike the exponential-key
    * variant of weighted sampling (key = u^(1/w), a transcendental whose
    * last-ulp rounding is libm-dependent) — the priority w·M/u is one
    * integer-exact double multiply and one correctly-rounded IEEE divide,
    * so ANY engine ranks the rows identically (the DuckDB oracle
    * hash-matches on values, not just rows). Ties (identical text AND
    * weight) break by id.
    *
    * Scale shape: the top-(k+1) is orderBy+limit = TakeOrderedAndProject —
    * per-partition heap of k+1 rows, driver merges parts·(k+1); no
    * corpus shuffle, no window. τ is the minimum of that (k+1)-row set,
    * joined back as a broadcast 1-row aggregate (never collected). The
    * TakeOrdered shape holds while k+1 stays under
    * `spark.sql.execution.topKSortFallbackThreshold` (default 10⁴) —
    * past it Spark silently degrades orderBy+limit to a global
    * range-partitioned sort, so for larger samples raise the threshold
    * (per-partition heaps of 10⁵–10⁶ rows are still cheap) or switch to
    * the two-pass threshold form — approx-percentile τ₀, count, refine —
    * that corpus-scale k (billions) needs anyway.
    *
    * Weights must be nonnegative (a negative weight yields a negative
    * priority — the row sorts last and the τ estimator loses meaning);
    * zero-weight rows are sampled only when the corpus has ≤ k rows.
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
                     textCol: String, k: Int): DataFrame =
    prioritySampleFinalize(prioritySampleBuild(df, idCol, weightCol, textCol, k),
      idCol, weightCol, k)

  /** The MERGEABLE artifact behind `prioritySample`: the top-(k+1) rows by
    * priority, with the priority column attached. Because any member of
    * the global top-(k+1) is in its own shard's/batch's top-(k+1),
    * folding artifacts with `prioritySampleMerge` is EXACTLY the one-shot
    * computation — the property that lets a 100 TB pipeline keep a
    * running weighted sample over arriving crawl batches (fold each
    * batch's ≤(k+1)-row artifact into the stored one; finalize on read)
    * without ever resampling the corpus. Spec-pinned
    * (split-fold == one-shot, exact row equality).
    */
  def prioritySampleBuild(df: DataFrame, idCol: String, weightCol: String,
                          textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"sample size must be >= 1: $k")
    // the op appends these to the caller's columns (packBins lesson:
    // silently overwriting an input column corrupts downstream selects)
    Seq("priority", "est_w", "tau", "__k").foreach(c =>
      require(!df.columns.contains(c), s"prioritySample reserves column name '$c'"))
    // u in (0, M]/M: fingerprint mod M, shifted off zero so q is finite;
    // M prime keeps the residues equidistributed under the polynomial hash
    val M = 1000003L
    val u = pmod(fingerprint(col(textCol)), lit(M)) + lit(1L)
    // w·M exact in double (weights up to 2^53/M), then one IEEE divide —
    // bit-identical in every engine, so the top-k boundary cannot flip
    val pr = (col(weightCol).cast("double") * lit(M.toDouble)) / u.cast("double")
    df.withColumn("priority", pr)
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k + 1)
      // k rides IN the artifact: merging parts built at a different k
      // would silently break the split-fold == one-shot law (a global
      // top-(k+1) member can be absent from a smaller part artifact) and
      // corrupt the τ estimator — the merge guard needs the number the
      // artifact was actually built with, not the caller's word for it
      .withColumn("__k", lit(k))
  }

  /** Fold priority-sample artifacts (shards, crawl batches) into one:
    * union → top-(k+1). Exact, associative, commutative — each input is
    * ≤ k+1 rows, so the fold is driver-cheap at any corpus size. HARD
    * CONTRACT: every part must have been built with the same k as this
    * merge — enforced against the artifact's own `__k` column
    * (row-cheap: artifacts are ≤ k+1 rows), failing loudly instead of
    * silently violating the merge law (round-10 advice finding).
    */
  def prioritySampleMerge(parts: Seq[DataFrame], idCol: String, k: Int): DataFrame = {
    require(parts.nonEmpty, "prioritySampleMerge: nothing to merge")
    parts.reduce(_ unionByName _)
      .withColumn("priority", when(col("__k") === lit(k), col("priority"))
        .otherwise(raise_error(concat(
          lit(s"prioritySampleMerge(k = $k) got an artifact built with k = "),
          col("__k")))))
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k + 1)
  }

  /** Per-group priority sampling: exactly min(k, |group|) rows PER GROUP
    * (source, language, shard), weighted without replacement — the
    * stratified form of `prioritySample` for "sample k docs from every
    * source" quotas, where the global sampler would let one heavy source
    * starve the rest. Same Duffield–Lund–Thorup estimator per group:
    * priority = w·M/u from the content fingerprint, per-group τ = the
    * (k+1)-th priority (0 when the group had ≤ k rows), est_w = max(w, τ)
    * unbiased for within-group subset sums.
    *
    * Shape: the per-group top-(k+1) is `row_number ≤ k+1` — a
    * WindowGroupLimit (per-partition heaps of k+1 per key BEFORE the group
    * shuffle; never a whole group in one sort buffer); the retained
    * ≤(k+1)·|groups| grain is checkpointed once and feeds both the sample
    * and the τ aggregate; τ rejoins as a ≤|groups|-row broadcast. Same
    * merge law as the global sampler, now per group: any member of a
    * group's global top-(k+1) is in its shard's per-group top-(k+1), so
    * folding batch artifacts with [[prioritySampleByMerge]] equals the
    * one-shot computation (spec-pinned).
    */
  def prioritySampleBy(df: DataFrame, groupCol: String, idCol: String,
                       weightCol: String, textCol: String, k: Int): DataFrame =
    prioritySampleByFinalize(prioritySampleByBuild(df, groupCol, idCol, weightCol, textCol, k),
      groupCol, idCol, weightCol, k)

  /** The mergeable per-group artifact: each group's top-(k+1) rows by
    * priority, priority column attached.
    */
  def prioritySampleByBuild(df: DataFrame, groupCol: String, idCol: String,
                            weightCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"sample size must be >= 1: $k")
    Seq("priority", "est_w", "__tau", "__rk", "__k").foreach(c =>
      require(!df.columns.contains(c), s"prioritySampleBy reserves column name '$c'"))
    val M = 1000003L
    val u = pmod(fingerprint(col(textCol)), lit(M)) + lit(1L)
    val pr = (col(weightCol).cast("double") * lit(M.toDouble)) / u.cast("double")
    df.withColumn("priority", pr)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("priority").desc, col(idCol).asc)))
      .filter(col("__rk") <= k + 1)
      .drop("__rk")
      .withColumn("__k", lit(k)) // merge-guard: see prioritySampleBuild
  }

  /** Fold per-group artifacts: union → per-group top-(k+1). Exact,
    * associative, commutative; inputs are ≤(k+1)·|groups| rows each.
    * Same k-consistency contract as [[prioritySampleMerge]], enforced
    * against the artifact's `__k`.
    */
  def prioritySampleByMerge(parts: Seq[DataFrame], groupCol: String,
                            idCol: String, k: Int): DataFrame = {
    require(parts.nonEmpty, "prioritySampleByMerge: nothing to merge")
    parts.reduce(_ unionByName _)
      .withColumn("priority", when(col("__k") === lit(k), col("priority"))
        .otherwise(raise_error(concat(
          lit(s"prioritySampleByMerge(k = $k) got an artifact built with k = "),
          col("__k")))))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("priority").desc, col(idCol).asc)))
      .filter(col("__rk") <= k + 1)
      .drop("__rk")
  }

  /** Per-group artifact → final sample: per-group τ + top-k + est_w.
    * Same k-consistency contract as the merge paths (round-11 advice):
    * finalizing at a k the artifact wasn't built with would silently
    * collapse τ to 0 (`count === k+1` never fires) or mis-size the
    * sample, so the artifact's own `__k` is checked row-wise and fails
    * loudly (artifacts are ≤(k+1)·|groups| rows — the check is free).
    */
  def prioritySampleByFinalize(artifact: DataFrame, groupCol: String,
                               idCol: String, weightCol: String, k: Int): DataFrame = {
    val checked = artifact.withColumn("priority",
      when(col("__k") === lit(k), col("priority"))
        .otherwise(raise_error(concat(
          lit(s"prioritySampleByFinalize(k = $k) got an artifact built with k = "),
          col("__k")))))
    val top = graft.Cleanup.register(
      checked.withColumn("__rk", row_number().over(
          Window.partitionBy(col(groupCol)).orderBy(col("priority").desc, col(idCol).asc)))
        .localCheckpoint(false)) // ≤(k+1)·|groups| rows; feeds sample AND τ
    val tau = top.groupBy(col(groupCol)).agg(
      when(count(lit(1)) === k + 1, min(col("priority"))).otherwise(lit(0.0)).as("__tau"))
    top.filter(col("__rk") <= k)
      .join(broadcast(tau), Seq(groupCol))
      .withColumn("est_w", greatest(col(weightCol).cast("double"), col("__tau")))
      .drop("__rk", "__tau", "__k")
  }

  /** Artifact → final sample: τ = the (k+1)-th priority (0 when the corpus
    * had ≤ k rows — every row sampled, est_w degenerates to w), top-k rows
    * with est_w = max(w, τ), the unbiased subset-sum estimator. Same
    * `__k` consistency guard as [[prioritySampleByFinalize]].
    */
  def prioritySampleFinalize(artifact: DataFrame, idCol: String,
                             weightCol: String, k: Int): DataFrame = {
    val checked = artifact.withColumn("priority",
      when(col("__k") === lit(k), col("priority"))
        .otherwise(raise_error(concat(
          lit(s"prioritySampleFinalize(k = $k) got an artifact built with k = "),
          col("__k")))))
    val top = graft.Cleanup.register(
      checked.localCheckpoint(false)) // ≤ k+1 rows; feeds sample AND τ
    val tau = top.agg(
      when(count(lit(1)) === k + 1, min(col("priority"))).otherwise(lit(0.0)).as("tau"))
    top.orderBy(col("priority").desc, col(idCol).asc).limit(k)
      .crossJoin(broadcast(tau)) // 1-row scalar, verified pattern
      .withColumn("est_w", greatest(col(weightCol).cast("double"), col("tau")))
      .drop("tau", "__k")
  }
  /** Bounded rows-probe deciding whether the two-phase window
    * decomposition pays for itself: below `autoDegradeBelow` TOTAL rows,
    * every partition key trivially fits one task (a ≤64k-row sort is
    * milliseconds) and the two-phase census/join stages are pure overhead
    * — measured 2.2× on `text_pack_bins` at sf0.1 — so the op degrades to
    * the one-window form. The probe is a limit-capped count, run EAGERLY
    * at operator-construction time: on a scan-rooted input it reads at
    * most `autoDegradeBelow`+1 rows at any corpus size, then stops — at
    * 100 TB it reads one partition's worth and keeps the two-phase form.
    * CAVEAT for derived inputs: limit() cannot prune through a shuffle,
    * so probing a join/aggregate-rooted DataFrame executes its upstream
    * plan once before the real query runs it again — callers feeding an
    * expensive derived relation should pass `autoDegradeBelow` = 0
    * (always two-phase, no probe; also the setting the plan specs pin)
    * or materialize the input first. Degrading on TOTAL rows is the
    * conservative direction: per-key counts are only smaller, so the
    * scale form is never dropped when any key could be large.
    */
  private[ops] def twoPhaseWorthIt(df: DataFrame, posBuckets: Int,
                                   autoDegradeBelow: Long): Boolean = {
    require(autoDegradeBelow < Int.MaxValue,
      s"autoDegradeBelow must fit a limit(), got $autoDegradeBelow")
    // a streaming DataFrame cannot be probe-counted (limit+count throws);
    // take the two-phase scale form — the safe direction for unbounded
    // inputs, and the only one that returns instead of crashing
    posBuckets > 1 && (autoDegradeBelow <= 0 || df.isStreaming ||
      df.limit(autoDegradeBelow.toInt + 1).count() > autoDegradeBelow)
  }

  /** Deterministic global shuffle + sharding — the "randomize example
    * order for training" step, content-keyed so it is reproducible:
    * shard = fingerprint(text ‖ salt) mod nShards, position = rank of
    * (hash, id) within the shard. The salted hash is effectively a random
    * permutation key, but the same document always lands at the same
    * (shard, pos) across re-runs, repartitions, and incremental rebuilds —
    * and changing the salt is a fresh epoch-level reshuffle with zero
    * coordination.
    *
    * Scale shape: the intra-shard position is TWO-PHASE so parallelism
    * never degrades to nShards — a plain per-shard row_number window
    * funnels n/nShards rows through one task when shards are few. The
    * salted fingerprint lands in [0, 1e9+7), so each shard is cut into
    * `posBuckets` fp-range sub-buckets: positions within a (shard,
    * bucket) come from a window keyed on BOTH (parallelism = nShards ×
    * posBuckets), and each bucket's starting offset is a running count
    * over the nShards×posBuckets-row bucket-census — histogram rows, not
    * corpus rows. Buckets are fp-range-aligned, so offset + intra equals
    * the one-window (fp, id) rank exactly. Sub-bucketing composes with
    * any shard count; production still sizes nShards to the output
    * stream layout (thousands at 100 TB). Below `autoDegradeBelow` total
    * rows the op degrades to the one-window form (`twoPhaseWorthIt`
    * scaladoc — the census stages are pure overhead at toy scale);
    * pass 0 to force the two-phase shape.
    */
  def shuffleShards(df: DataFrame, idCol: String, textCol: String,
                    nShards: Int, salt: String = "shuffle-v1",
                    posBuckets: Int = 64,
                    autoDegradeBelow: Long = 65536L): DataFrame = {
    require(nShards >= 1, s"shuffleShards: nShards must be >= 1, got $nShards")
    require(posBuckets >= 1, s"shuffleShards: posBuckets must be >= 1, got $posBuckets")
    // the op keeps only idCol from the input, so the sole collision risk
    // is the id column itself shadowing a derived/output name
    require(!Seq("fp", "shard", "pos", "__b", "__cnt", "__off", "__i").contains(idCol),
      s"shuffleShards derives columns fp/shard/pos; idCol must not be named '$idCol'")
    val base0 = df.select(col(idCol),
        fingerprint(concat(col(textCol), lit(":" + salt))).as("fp"))
      .withColumn("shard", pmod(col("fp"), lit(nShards.toLong)))
    if (!twoPhaseWorthIt(df, posBuckets, autoDegradeBelow))
      return base0
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("fp"), col(idCol))))
        .select(col(idCol), col("shard"), col("pos"))
    // fingerprint's modulus (see VectorFunctions.fingerprint): fp range
    // is [0, 1e9+7), so ceil-width buckets cover it with no overflow
    val fpMod = 1000000007L
    val width = (fpMod + posBuckets - 1) / posBuckets
    val base = base0.withColumn("__b", expr(s"fp div $width"))
    val intra = row_number().over(
      Window.partitionBy(col("shard"), col("__b")).orderBy(col("fp"), col(idCol)))
    val offsets = base.groupBy(col("shard"), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(Window.partitionBy(col("shard")).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("__b"), col("__off"))
    base.withColumn("__i", intra)
      .join(broadcast(offsets), Seq("shard", "__b"))
      .select(col(idCol), col("shard"),
        (col("__off") + col("__i")).cast("int").as("pos"))
  }
  /** Greedy sequential token-budget packing — the "fill ~budget-token
    * training bins" step of a data pipeline. Within each partition key,
    * documents ordered by `idCol` get a running token total, and a doc's
    * bin is the one its FIRST token lands in:
    * bin = floor((cum_tokens − n_tokens) / budget).
    *
    * Scale shape: the cumulative sum is TWO-PHASE, the same decomposition
    * as `shuffleShards` positions — a plain per-key cumsum window funnels
    * an entire partition key (a whole language in the wired query)
    * through one task at 100 TB. Each key is cut into `posBuckets`
    * id-RANGE sub-buckets (bounds from a |keys|-row min/max aggregate,
    * broadcast back; the bucket map runs in decimal(20,0) so ids of ANY
    * span — full-range fingerprints included — can't overflow): the
    * running sum within a (key, bucket) comes from a
    * window keyed on BOTH — parallelism = |keys| × posBuckets — and each
    * bucket's starting offset is a running total over the bucket-census
    * rows, histogram not corpus. Buckets are id-range-aligned, so
    * offset + intra equals the one-window cumsum EXACTLY (spec-pinned).
    * Skewed id spaces degrade toward fewer effective buckets, never past
    * the one-window form. Below `autoDegradeBelow` total rows the op
    * takes the one-window form directly (`twoPhaseWorthIt` scaladoc);
    * pass 0 to force the two-phase shape.
    */
  def packBins(df: DataFrame, idCol: String, textCol: String, budget: Long,
               partitionCols: Seq[String], posBuckets: Int = 64,
               autoDegradeBelow: Long = 65536L): DataFrame = {
    require(budget > 0, s"packBins: budget must be positive, got $budget")
    require(posBuckets >= 1, s"packBins: posBuckets must be >= 1, got $posBuckets")
    // reserve the OUTPUT names too: an input column named n_tokens /
    // cum_tokens / bin would be silently overwritten (and the two-phase
    // branch's final select would then emit it twice)
    Seq("__b", "__mn", "__mx", "__i", "__off", "__cnt",
        "n_tokens", "cum_tokens", "bin").foreach(c =>
      require(!df.columns.contains(c),
        s"packBins uses '$c' as a temp/output column; input must not contain it"))
    val pcols = partitionCols.map(col)
    val base = df.withColumn("n_tokens", tokenCount(col(textCol)))
    if (!twoPhaseWorthIt(df, posBuckets, autoDegradeBelow)) {
      // ROWS frame + (id, n_tokens) tie key: same discipline as the
      // two-phase branch below (comments there)
      val w = Window.partitionBy(pcols: _*).orderBy(col(idCol), col("n_tokens"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return base.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .withColumn("bin",
          floor((col("cum_tokens") - col("n_tokens")).cast("double") / budget))
    }
    val bounds = base.groupBy(pcols: _*)
      .agg(min(col(idCol)).as("__mn"), max(col(idCol)).as("__mx"))
    val bucketed = base.join(broadcast(bounds), partitionCols)
      // bucket arithmetic in decimal(20,0): the monotone map
      // (id − mn)·posBuckets div (span + 1) lands ANY id span — including
      // full-range fingerprint ids — in [0, posBuckets) with no long
      // overflow (the earlier double-compare span guard collapsed such
      // keys to ONE bucket, i.e. the one-window form for exactly the
      // corpora that need the parallelism; same fix as mixInterleave).
      .withColumn("__b", expr(
        s"((cast($idCol as decimal(20,0)) - cast(__mn as decimal(20,0))) * $posBuckets)" +
          " div (cast(__mx as decimal(20,0)) - cast(__mn as decimal(20,0)) + 1)"))
      .drop("__mn", "__mx")
    val bcols = pcols :+ col("__b")
    // explicit ROWS frame: Spark's default frame with an orderBy is RANGE,
    // which merges peer rows (duplicate ids) into one cumulative value and
    // diverges from the oracle's ROWS UNBOUNDED PRECEDING on ties.
    // n_tokens as a SECOND sort key: with a ROWS frame, peer order among
    // duplicate ids is otherwise engine/partition-nondeterministic, so two
    // same-id docs with different token counts could swap bins between
    // runs; (id, n_tokens) pins every tie the cumsum can observe —
    // same-id same-count rows are interchangeable in cum_tokens and bin.
    // (Duplicate ids co-locate in one bucket — __b is a function of id —
    // so the tie argument is unchanged by the two-phase split.)
    val intra = sum(col("n_tokens")).over(
      Window.partitionBy(bcols: _*).orderBy(col(idCol), col("n_tokens"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val offsets = bucketed.groupBy(bcols: _*)
      .agg(sum(col("n_tokens")).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(Window.partitionBy(pcols: _*).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((bcols :+ col("__off")): _*)
    bucketed.withColumn("__i", intra)
      .join(broadcast(offsets), partitionCols :+ "__b")
      .withColumn("cum_tokens", col("__off") + col("__i"))
      .withColumn("bin",
        floor((col("cum_tokens") - col("n_tokens")).cast("double") / budget))
      // pin the output column ORDER to the degraded branch's (input
      // columns first): the using-column join above moved partitionCols
      // to the front, and a positional consumer must not see a different
      // schema the day the corpus crosses the degrade threshold
      .select((df.columns.toIndexedSeq.map(col) :+ col("n_tokens") :+
        col("cum_tokens") :+ col("bin")): _*)
  }
  /** Deterministic training-mixture interleaving: given per-source
    * sampling weights, emit the position of every document in the global
    * training order of a weighted round-robin over sources — source s
    * with weight w contributes one doc every lcm/w virtual ticks. Pure
    * integer construction: intra-source rank × the source's stride
    * (lcm(weights)/w) gives the virtual time; the GLOBAL position is then
    * computed ANALYTICALLY, not ranked: a row at virtual time v is
    * preceded by exactly min(⌊v_adj/stride_s'⌋, n_s') rows of each source
    * s' (v_adj = v for sources ordered before it, v−1 after — the
    * (vt, source) tie order), so mix_pos is a Σ-over-sources projection
    * built from the |sources|-row per-source stats table, collected once.
    * No corpus-cardinality rank (an earlier form fed globalRankAll a
    * ~corpus-distinct vt key, making its offsets window and broadcast
    * O(n) at scale). |sources| is a mixture schedule's handful (the
    * projection is |sources| terms); vt stays < 2⁵³ for any real corpus
    * so the floor-division is exact.
    *
    * Scale shape: the intra-source rank is TWO-PHASE, the packBins
    * decomposition — a plain `row_number() over partitionBy(source)`
    * funnels corpus/|sources| rows through ONE task, because the
    * partition key is the config-scale source set, not a data-scale id
    * (the round-7 sweep gap: "key-local" is only parallel across KEYS).
    * Each source is cut into `posBuckets` id-RANGE sub-buckets (bounds
    * from the same |sources|-row stats collect that feeds the position
    * projection; the bucket arithmetic runs in decimal(20,0) so ANY id
    * span — including full-range xxhash64 fingerprint ids — stays
    * two-phase, see the inline comment): the rank within a (source,
    * bucket) comes from a window
    * keyed on BOTH — parallelism |sources| × posBuckets — and each
    * bucket's starting offset is a running count over the bucket-census
    * rows, histogram not corpus. Buckets are id-range-aligned, so
    * offset + intra equals the one-window rank EXACTLY (spec-pinned).
    * Non-integral id types degrade to the one-window form (posBuckets is
    * ignored) — range-bucketing needs id arithmetic.
    *
    * Deterministic across reshuffles/rebuilds because the intra-source
    * rank orders by content-stable ids; changing a weight re-mixes with
    * zero coordination. This is the corpus-mixing schedule a multi-source
    * training run consumes (e.g. 3:2:1 web:books:code), as a relational
    * query.
    */
  def mixInterleave(df: DataFrame, sourceCol: String, idCol: String,
                    weights: Map[String, Int], defaultWeight: Int = 1,
                    posBuckets: Int = 64): DataFrame = {
    require(weights.values.forall(_ > 0) && defaultWeight > 0,
      "weights must be positive")
    require(posBuckets >= 1, s"mixInterleave: posBuckets must be >= 1, got $posBuckets")
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcm = (weights.values.toSeq :+ defaultWeight)
      .map(_.toLong).distinct.foldLeft(1L)((l, w) => l / gcd(l, w) * w)
    val stride = weights.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (s, w)) => acc.when(col(sourceCol) === s, lit(lcm / w))
    }.otherwise(lit(lcm / defaultWeight))
    val base = df.select(col(idCol), col(sourceCol))
    val idIntegral = base.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    // bounded build step (the ivfBuild precedent): per-source doc count
    // and id bounds — |sources| rows, collected once; feeds BOTH the
    // analytic position projection and the sub-bucket widths
    val statRows = base.groupBy(col(sourceCol)).agg(
        count(lit(1)).as("__n"),
        (if (idIntegral) min(col(idCol)).cast("long")
         else lit(null).cast("long")).as("__mn"),
        (if (idIntegral) max(col(idCol)).cast("long")
         else lit(null).cast("long")).as("__mx"))
      .collect().toIndexedSeq
    val srcStats: Seq[(String, Long, Long)] = statRows
      .map { r =>
        val src = r.get(0).toString
        (src, r.getLong(1), lcm / weights.getOrElse(src, defaultWeight).toLong)
      }
      .sortBy(_._1)
    // sub-bucketing computes (id − mn) div width; a fingerprint-keyed
    // corpus (xxhash64 doc ids — this repo's own text_fingerprint
    // convention) spans the FULL signed-64 range by construction, where
    // long arithmetic would wrap driver-side and throw in-plan under
    // ANSI. So the bucket arithmetic runs in decimal(20,0): the width is
    // BigInt-derived, mn/width ride the broadcast meta as decimals, and
    // the subtraction/div never overflow for ANY id span — full-range
    // hash ids keep the two-phase shape (spec-pinned; the round-8 span
    // guard silently degraded exactly those corpora to the one-window
    // scale-killer).
    val ranked = if (!idIntegral || posBuckets == 1) {
      base.withColumn("rk", row_number().over(
        Window.partitionBy(col(sourceCol)).orderBy(col(idCol))).cast("long"))
    } else {
      val dec20 = org.apache.spark.sql.types.DecimalType(20, 0)
      val metaSchema = org.apache.spark.sql.types.StructType(Seq(
        base.schema(sourceCol),
        org.apache.spark.sql.types.StructField("__mn", dec20),
        org.apache.spark.sql.types.StructField("__w", dec20)))
      val metaRows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(statRows.map { r =>
          val mn = BigInt(r.getLong(2)); val mx = BigInt(r.getLong(3))
          org.apache.spark.sql.Row(r.get(0),
            new java.math.BigDecimal(mn.bigInteger),
            new java.math.BigDecimal(((mx - mn) / posBuckets + 1).bigInteger))
        }: _*)
      val meta = df.sparkSession.createDataFrame(metaRows, metaSchema)
      val bucketed = base.join(broadcast(meta), Seq(sourceCol))
        .withColumn("__b", expr(s"(cast($idCol as decimal(20,0)) - __mn) div __w"))
        .drop("__mn", "__w")
      val intra = row_number().over(
        Window.partitionBy(col(sourceCol), col("__b")).orderBy(col(idCol)))
      val offsets = bucketed.groupBy(col(sourceCol), col("__b"))
        .agg(count(lit(1)).as("__cnt"))
        .withColumn("__off", coalesce(
          sum(col("__cnt")).over(Window.partitionBy(col(sourceCol)).orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col(sourceCol), col("__b"), col("__off"))
      bucketed.withColumn("__i", intra)
        .join(broadcast(offsets), Seq(sourceCol, "__b"))
        .withColumn("rk", col("__off") + col("__i"))
        .drop("__b", "__i", "__off")
    }
    val vted = ranked.withColumn("vt", col("rk") * stride)
    // Σ over sources of the preceded-row count; own source contributes
    // its intra rank exactly (vt/stride_s == rk, never capped)
    val pos = srcStats.map { case (s2, n2, str2) =>
      // ties at equal vt order by source ascending: sources sorting
      // BEFORE this row's count rows with vt' <= vt, those AFTER vt' < vt
      val vAdj = col("vt") - when(lit(s2) > col(sourceCol), 1L).otherwise(0L)
      when(col(sourceCol) === s2, col("rk"))
        .otherwise(least(lit(n2), floor(vAdj / lit(str2.toDouble)).cast("long")))
    }.reduce(_ + _)
    vted.select(col(idCol), col(sourceCol), col("vt"), pos.as("mix_pos"))
  }
  /** Token-budget allocation across sources — the data-mixing computation
    * that turns "train for `budgetEpochs` corpus epochs, temperature
    * alpha, no source repeated past `maxEpochs`" into per-source token
    * counts. Temperature weights w_i = n_i^alpha (alpha = 1 proportional,
    * 0.5 the multilingual-training upweighting of small sources, 0
    * uniform shares); the budget B = budgetEpochs·Σn_i waterfills:
    * a_i = min(maxEpochs·n_i, λ·w_i) with Σa_i = B.
    *
    * The waterfill is CLOSED-FORM, not iterative: sources sorted by
    * ratio r_i = cap_i/w_i cap in a prefix of that order, and the greedy
    * prefix test  r_i ≤ (B − Σ_{k<i} cap_k)/(Σ_{k≥i} w_k)  marks exactly
    * the capped set (if a source fails the test, every later one does
    * too — substitute r_k ≥ r_fail into the failed inequality), so one
    * ordered window pass + one scalar aggregate replaces the λ-bisection
    * loop. When B ≥ Σcap the test passes everywhere: allocation
    * saturates at the caps and Σa < B (the budget is unfillable under
    * the epoch cap — compare sums to detect).
    *
    * Scale shape: the corpus-scale work is ONE partial-aggregated token
    * census; everything after runs on the source-grain relation
    * (config-scale — the ordered windows see |sources| rows, never
    * corpus rows; the λ scalar broadcasts back). alpha ∈ {0, 0.5, 1}
    * use exact IEEE kernels (lit/sqrt/identity — engine-reproducible);
    * other alphas go through pow. Zero-token sources are dropped (no
    * epochs of nothing). Returns (sourceCol, n_tokens, capped 0/1,
    * alloc_tokens r2, epochs r4).
    */
  def mixAllocate(df: DataFrame, sourceCol: String, textCol: String,
                  budgetEpochs: Double, alpha: Double = 0.5,
                  maxEpochs: Double = 4.0): DataFrame = {
    require(budgetEpochs > 0 && maxEpochs > 0,
      "mixAllocate: budgetEpochs and maxEpochs must be positive")
    require(alpha >= 0.0 && alpha <= 1.0,
      s"mixAllocate: alpha must be in [0, 1], got $alpha")
    val t = df.groupBy(col(sourceCol))
      .agg(sum(tokenCount(col(textCol))).as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val nD = col("n_tokens").cast("double")
    val wExpr =
      if (alpha == 0.0) lit(1.0)
      else if (alpha == 0.5) sqrt(nD)
      else if (alpha == 1.0) nD
      else pow(nD, lit(alpha))
    val byR = Window.orderBy(col("__r"), col(sourceCol))
    val prev = byR.rowsBetween(Window.unboundedPreceding, -1)
    val full = byR.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val s = t.withColumn("__c", nD * maxEpochs)
      .withColumn("__w", wExpr)
      .withColumn("__r", col("__c") / col("__w"))
      .withColumn("__B", sum(nD).over(full) * budgetEpochs)
      .withColumn("__cumc", coalesce(sum(col("__c")).over(prev), lit(0.0)))
      .withColumn("__cumw", coalesce(sum(col("__w")).over(prev), lit(0.0)))
      .withColumn("__totw", sum(col("__w")).over(full))
      .withColumn("__capped", col("__r") <=
        (col("__B") - col("__cumc")) / (col("__totw") - col("__cumw")))
      // λ = (B − Σ_capped c)/(Σ_uncapped w) as full-frame conditional
      // sums over the SAME source-grain window — keeps the plan linear
      // (no second corpus branch to re-scan; the stacked window pass
      // re-sorts |sources| rows, not documents)
      .withColumn("__lam",
        (col("__B") - coalesce(sum(when(col("__capped"), col("__c"))).over(full),
          lit(0.0))) /
          coalesce(sum(when(!col("__capped"), col("__w"))).over(full),
            lit(Double.PositiveInfinity)))
    s.withColumn("__alloc",
        when(col("__capped"), col("__c")).otherwise(col("__lam") * col("__w")))
      .select(col(sourceCol), col("n_tokens"),
        col("__capped").cast("int").as("capped"),
        round(col("__alloc"), 2).as("alloc_tokens"),
        round(col("__alloc") / nD, 4).as("epochs"))
  }
}
