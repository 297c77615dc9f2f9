package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TextAnalysis partition: distribution-relative quality curation —
  * the bounded score histogram and everything derived from it (median
  * gate, source cap, ppm calibration build/apply, budget selection).
  * See [[TextAnalysis]].
  */
trait TextCuration { self: TextAnalysis.type =>

  /** Shared-prefix boilerplate detection: per document, how many documents
    * in the same `groupCol` (source/language) share its first
    * `prefixTokens` tokens, and the `is_boilerplate` flag at `minShare` —
    * the template-header signal (scraped nav bars, license banners, feed
    * preambles) that per-document quality scores can't see and pairwise
    * near-dup misses when the bodies differ. Docs shorter than
    * `prefixTokens` participate with their whole token list (a short
    * template page repeated verbatim is exactly boilerplate).
    *
    * 100 TB shape: the exchange key is the 128-bit content fingerprint of
    * the prefix (the `exactDupGroups` rule — never group corpus-scale
    * exchanges on raw strings), so the census aggregate and the join back
    * both move 16-byte keys; two hash aggregates + one equi-join, no
    * window, no driver state. The census grain is (group, distinct
    * prefix) — data-scale by construction. The DuckDB oracle groups on
    * the raw prefix string: any fingerprint collision shows up as a
    * count mismatch, loudly (the OracleHashSql convention).
    */
  def boilerplatePrefixes(df: DataFrame, idCol: String, textCol: String,
                          groupCol: String, prefixTokens: Int = 8,
                          minShare: Int = 5): DataFrame = {
    val prefix = array_join(slice(tokens(col(textCol)), 1, prefixTokens), " ")
    val fp = Dedup.contentFingerprint(prefix)
    val keyed = df.select(col(idCol), col(groupCol),
      fp(0).as("__hi"), fp(1).as("__lo"))
    val census = keyed.groupBy(col(groupCol), col("__hi"), col("__lo"))
      .agg(count(lit(1)).as("prefix_df"))
    keyed.join(census, Seq(groupCol, "__hi", "__lo"))
      .select(col(idCol), col(groupCol), col("prefix_df"),
        (col("prefix_df") >= minShare).as("is_boilerplate"))
  }

  /** Per-(language, score) count histogram with per-language cumulative
    * counts and totals — the bounded summary both distribution-relative
    * quality ops derive their statistics from. quality_score is rounded to
    * 2 dp BY CONSTRUCTION (qualityScore), so the histogram has at most
    * 101·|langs| rows no matter the corpus size: the aggregation state is
    * O(1) per group and the per-language running-count window runs over
    * histogram rows, never corpus rows. This is what replaces both exact
    * `percentile` (which buffers every group value in one task) and
    * whole-language rank windows (which sort a language through one task)
    * at 100 TB — same exact integers, bounded state.
    */
  private def scoreHistogram(qs: DataFrame, langCol: String): DataFrame = {
    val byLang = Window.partitionBy(col(langCol))
    qs.groupBy(col(langCol), col("quality_score"))
      .agg(count(lit(1)).as("cnt"))
      // scores are distinct within a language here, so the default RANGE
      // frame has no peers — cum is the inclusive running count
      .withColumn("cum", sum(col("cnt")).over(byLang.orderBy(col("quality_score"))))
      .withColumn("n", sum(col("cnt")).over(byLang))
  }

  /** The narrow (doc_id, lang, quality_score) relation both
    * distribution-relative quality ops consume TWICE (histogram side +
    * output join side), materialized once — tokenizing the corpus is the
    * dominant cost, and without this seam each consumer re-runs the full
    * text scan + tokenize (the DESIGN §8.1 two-consumer rule; measured
    * 3.4× on docs_quality_calibrated at sf0.1). Serialized persist of
    * three scalar columns: ~1% of corpus bytes, spills gracefully;
    * harness-drained via Cleanup.
    */
  private def scoredNarrow(df: DataFrame, textCol: String,
                           langCol: String): DataFrame =
    graft.Cleanup.register(
      qualityScore(df, textCol)
        .select(col("doc_id"), col(langCol), col("quality_score"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))

  /** Median-gated quality filter: keep documents whose composite quality
    * score is at or above their language's median. The per-language
    * medians come from the bounded `scoreHistogram` — NOT from exact
    * `percentile(0.5)`, whose aggregation state buffers every value of a
    * group in one task (the dominant language's group is O(corpus) at
    * 100 TB). From the histogram the exact interpolated median is the
    * value at 1-indexed position ⌈n/2⌉ averaged with the one at
    * ⌊n/2⌋+1 (equal when n is odd): value-at-position is a conditional
    * min over cumulative counts, so the whole computation is a ≤101-row-
    * per-language aggregate broadcast back over the scan — identical
    * doubles to percentile()'s lo+(hi−lo)/2 after the 2 dp rounding, and
    * the >= gate can never flip (a 2-dp score is ≥0.004 away from any
    * two-value midpoint). Spec-pinned equal to the percentile form.
    */
  def qualityGate(df: DataFrame, textCol: String, langCol: String = "lang"): DataFrame = {
    val qs = scoredNarrow(df, textCol, langCol)
    val med = scoreHistogram(qs, langCol)
      .groupBy(col(langCol))
      .agg(
        // floor(): Column `/` on longs is DOUBLE division — without it the
        // even-n lower position (n+1)/2 = x.5 would shift up to the higher
        min(when(col("cum") >= floor((col("n") + 1) / 2), col("quality_score"))).as("v_lo"),
        min(when(col("cum") >= floor(col("n") / 2) + 1, col("quality_score"))).as("v_hi"))
      .select(col(langCol), ((col("v_lo") + col("v_hi")) / 2).as("med"))
    qs.join(broadcast(med), langCol)
      .filter(col("quality_score") >= col("med"))
      .select(col("doc_id"), col(langCol), col("quality_score"),
        round(col("med"), 2).as("lang_median"))
  }

  /** Per-source contribution cap — keep at most k documents per source,
    * best-quality-first with doc-id ascending as the deterministic
    * tie-break: the curation guard against any single source/domain
    * dominating a training mix (the per-domain analogue of
    * `budgetSelect`'s global budget cut). Selection ≡ top-k per source
    * by (quality_score desc, doc_id asc), computed WITHOUT a
    * whole-source sort window: the per-(source, score) count histogram
    * (bounded — scores are 2 dp by construction, ≤101 rows per source)
    * yields each source's threshold score and the remaining room in the
    * threshold bucket; rows strictly above the threshold pass with no
    * per-row ranking at all, and only the threshold BUCKET's rows — one
    * histogram bucket per source — take an intra-bucket row_number on
    * doc_id. A plain `Window.partitionBy(source)` top-k re-sorts every
    * source's full row set; here the sorted work is one bucket, and the
    * partition key is `source`, whose production cardinality (domains)
    * is large — the per-task slice is min(bucket, source) rows. The
    * threshold relation is |sources| rows, broadcast. DESIGN §10's
    * order-statistic-on-the-lattice rule applied to top-k.
    */
  def sourceCap(df: DataFrame, textCol: String, k: Int,
                srcCol: String = "source"): DataFrame = {
    require(k > 0, s"per-source cap must be positive, got $k")
    val qs = scoredNarrow(df, textCol, srcCol)
    val hist = qs.groupBy(col(srcCol), col("quality_score"))
      .agg(count(lit(1)).as("cnt"))
      // scores are distinct within a source here, so the default RANGE
      // frame has no peers — cum_desc is the best-first running count
      .withColumn("cum_desc", sum(col("cnt")).over(
        Window.partitionBy(col(srcCol)).orderBy(col("quality_score").desc)))
    // threshold bucket = the HIGHEST score whose best-first running count
    // reaches k; a source with fewer than k docs has none (keep all, the
    // left join's null-threshold branch below)
    // |sources| rows, consumed by BOTH union branches below — persisted so
    // the corpus-scale histogram aggregation feeding it runs once, not
    // once per branch
    val thr = graft.Cleanup.register(
      hist.filter(col("cum_desc") >= k)
        .groupBy(col(srcCol))
        .agg(max(col("quality_score")).as("thr"),
          (lit(k) - expr("max_by(cum_desc - cnt, quality_score)")).as("room"))
        .persist())
    val withThr = qs.join(broadcast(thr), Seq(srcCol), "left")
    val above = withThr
      .filter(col("thr").isNull || col("quality_score") > col("thr"))
    val boundary = withThr
      .filter(col("quality_score") === col("thr"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(srcCol)).orderBy(col("doc_id"))))
      .filter(col("__rn") <= col("room"))
      .drop("__rn")
    above.unionByName(boundary)
      .select(col("doc_id"), col(srcCol), col("quality_score"))
  }
  /** Per-language percent-rank calibration of the quality score — the
    * distribution-relative normalization that makes one curation
    * threshold transfer across languages (an absolute score cut keeps
    * 80% of one language and 5% of another; the calibrated ppm rank cuts
    * the same fraction everywhere). Exact integers: ppm =
    * (rank−1)·1e6 div (n−1), with rank() DERIVED from the bounded
    * `scoreHistogram` instead of a whole-language window — rank = 1 +
    * count of strictly-smaller rows = (cum − cnt) + 1, so (rank−1) is the
    * histogram's exclusive running count. A Window.partitionBy(lang)
    * rank sorts an entire language through one task at 100 TB; the
    * histogram join is a broadcast of ≤101·|langs| rows over the scan,
    * same exact integers. Spec-pinned equal to the rank-window form.
    */
  def calibrateQuality(df: DataFrame, textCol: String,
                       langCol: String): DataFrame = {
    val scored = scoredNarrow(df, textCol, langCol)
    val ranks = scoreHistogram(scored, langCol)
      .select(col(langCol), col("quality_score"),
        (col("cum") - col("cnt")).as("__rk0"), col("n").as("__n"))
    scored.join(broadcast(ranks), Seq(langCol, "quality_score"))
      .withColumn("cal_ppm",
        when(col("__n") > 1, expr("(__rk0 * 1000000) div (__n - 1)"))
          .otherwise(lit(0L)))
      .select(col("doc_id"), col(langCol), col("quality_score"),
        col("cal_ppm"))
  }

  /** Build-once calibration MODEL from a reference corpus: one row per
    * (language, 2-dp score lattice point) carrying the reference
    * distribution's strict-below count and total — the score CDF,
    * densified over the whole 0.00–1.00 lattice so that applying it is
    * an exact integer equi-join for ANY incoming score, including
    * values the reference never produced. This is the train/apply split
    * for distribution-relative quality ops (the `ivfBuild`/
    * `clusterBuild` seam): build on the reference ONCE (the only
    * corpus-scale work — one histogram aggregation), persist/write the
    * ≤101·|langs|-row model, and apply it to any batch OR stream.
    * Join keys are integer cents — no double equality anywhere.
    */
  def qualityCalibrationBuild(reference: DataFrame, textCol: String,
                              langCol: String): DataFrame = {
    val hist = scoreHistogram(
        qualityScore(reference, textCol)
          .select(col("doc_id"), col(langCol), col("quality_score")),
        langCol)
      .select(col(langCol),
        round(col("quality_score") * 100).cast("long").as("cents"),
        col("cum"), col("n"))
    val lattice = hist.select(col(langCol), col("n")).distinct()
      .select(col(langCol), col("n"),
        explode(sequence(lit(0L), lit(100L))).as("cents"))
    // strict-below count at lattice point v = the inclusive running count
    // of the largest histogram score BELOW v (0 when none) — a ≤101×101
    // per-language triangle join over the tiny histogram, built once
    lattice.as("l").join(hist.as("h"),
        col(s"l.$langCol") === col(s"h.$langCol") &&
          col("h.cents") < col("l.cents"), "left")
      .groupBy(col(s"l.$langCol").as(langCol), col("l.cents").as("cents"),
        col("l.n").as("n"))
      .agg(coalesce(max(col("h.cum")), lit(0L)).as("below"))
  }

  /** Apply a `qualityCalibrationBuild` model to a corpus or STREAM: score
    * each document, look its (lang, score-cents) up in the broadcast
    * model, and emit the reference-distribution ppm rank — the "calibrate
    * new data against the trained distribution" step (CCNet-style apply).
    * Stateless: a projection plus a broadcast equi-join, so the same call
    * works unchanged on a streaming DataFrame (the model side is static;
    * re-read per micro-batch at worst). Documents in languages the model
    * has never seen emit a null `cal_ppm` — surfacing them beats silently
    * ranking against nothing. Self-application reproduces
    * `calibrateQuality` exactly (spec-pinned).
    */
  def calibrateQualityWith(df: DataFrame, model: DataFrame, textCol: String,
                           langCol: String): DataFrame =
    qualityScore(df, textCol)
      .select(col("doc_id"), col(langCol), col("quality_score"),
        round(col("quality_score") * 100).cast("long").as("cents"))
      .join(broadcast(model), Seq(langCol, "cents"), "left")
      .withColumn("cal_ppm",
        when(col("n") > 1, expr("(below * 1000000) div (n - 1)"))
          .otherwise(when(col("n").isNotNull, lit(0L))))
      .select(col("doc_id"), col(langCol), col("quality_score"),
        col("cal_ppm"))

  /** Greedy token/char-budget corpus selection: rank documents
    * best-quality-first on an integer sort key — (100 − score·100)·1000 +
    * length, ascending = quality desc then shorter-first — and keep the
    * maximal prefix whose cumulative cost stays within `budget`. The
    * prefix sum is `Analytics.globalCumsum` (two-phase — never a
    * single-partition corpus window), so the selection scales to corpora
    * where "sort everything on one node" is impossible. Cost here is
    * chars (`length(text)`); any integral cost column composes the same
    * way. This is the fixed-budget curation cut a training run makes
    * when compute, not data, is the binding constraint.
    */
  def budgetSelect(df: DataFrame, textCol: String, idCol: String,
                   budget: Long): DataFrame = {
    val scored = qualityScore(df, textCol)
      .withColumn("rank_key",
        (lit(100L) - round(col("quality_score") * 100).cast("long")) * 1000L
          + least(col("n_chars_m"), lit(999)).cast("long"))
      .select(col(idCol), col("rank_key"), col("n_chars_m").as("cost"))
    graft.ops.Analytics.globalCumsum(scored, "rank_key", idCol, "cost")
      .filter(col("cum") <= budget)
      .select(col(idCol), col("rank_key"), col("cost"), col("cum"))
  }
}
