package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dedup partition: substring-level duplication — positional dup-gram profile, span removal rewrite, the build-once dup-gram artifact, its Bloom-compressed form, and the stateless streaming-safe scrub.
  * See [[Dedup]].
  */
trait DedupSpans { self: Dedup.type =>

  /** Substring-level duplication profile — the positional primitive behind
    * "remove duplicated passages, not whole documents" dedup (the
    * suffix-array substring dedup of Lee et al., "Deduplicating Training
    * Data Makes Language Models Better", re-expressed relationally): a
    * word n-gram occurring in ≥2 DISTINCT documents marks every position
    * where it appears as duplicated text. Per document this reports how
    * many of its n-gram positions are cross-document duplicates, the
    * duplicated fraction, and the first duplicated offset (where a trimmer
    * would start cutting).
    *
    * Relational shape instead of a suffix array: positioned n-grams
    * (explode) → gram-keyed doc-frequency aggregate → semi join back →
    * per-doc aggregate. At 100 TB the gram relation is the big exchange;
    * `hashGrams = true` is the production keying — every exchange and
    * join carries xxhash64(gram) 8-byte keys instead of gram strings (a
    * collision can only merge two grams' doc counts, irrelevant at the
    * df ≥ 2 cut; spec-pinned output-identical on the test corpora). The
    * default keeps strings so the SQL oracle reproduces the relation
    * exactly. Every position of a duplicated gram counts, including
    * repeats inside one document: span coverage, not pair counting.
    */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String, n: Int,
                      hashGrams: Boolean = false): DataFrame = {
    require(n >= 1, s"duplicatedSpans: n-gram order must be >= 1, got $n")
    val base = df.select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
    // positioned grams: pos is the 0-based token offset of the gram start
    val worded = base.filter(size(col("w")) >= n)
      .select(col("id"),
        posexplode(transform(sequence(lit(0), size(col("w")) - n),
          i => array_join(slice(col("w"), i + lit(1), lit(n)), " "))))
      .withColumnRenamed("col", "gram")
    val positioned = if (hashGrams)
      worded.select(col("id"), col("pos"), xxhash64(col("gram")).as("gram"))
    else worded
    val dupGrams = positioned
      .groupBy(col("gram")).agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("gram"))
    val dupPerDoc = positioned.join(dupGrams.hint("merge"), Seq("gram"), "leftsemi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_dup"), min(col("pos")).as("first_dup_pos"))
    base
      .select(col("id"), greatest(size(col("w")) - (n - 1), lit(0)).as("n_grams"))
      .join(dupPerDoc.hint("merge"), Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        round(coalesce(col("n_dup"), lit(0L)).cast("double")
          / greatest(col("n_grams"), lit(1)), 4).as("dup_ratio"),
        coalesce(col("first_dup_pos"), lit(-1)).as("first_dup_pos"))
  }

  /** Substring-level duplication REMOVAL — the rewrite `duplicatedSpans`
    * only measures: every token covered by a cross-document duplicated
    * n-gram span is cut, and each document is reassembled from its
    * surviving tokens in position order (Lee et al.'s "deduplicate the
    * substring, keep the document", re-expressed relationally instead of
    * via a suffix array). A gram occurring in ≥ `minDf` DISTINCT
    * documents flags positions [pos, pos+n-1] at every occurrence —
    * repeats inside one document included (span coverage, exactly the
    * `duplicatedSpans` flagging rule, so measure and rewrite agree).
    *
    * Relational shape: positioned grams → df aggregate → flagged starts
    * (semi join) → covered token positions (span explode, ≤ n rows per
    * flagged start) → anti join tokens → per-document reassembly. All
    * linear in corpus tokens; the only per-key buffer is the per-document
    * token collect, whose grain is the document id (data-scale — the
    * measured sweep's growth test) and whose size is one document's
    * tokens, the same bound every tokenizer op carries. `hashGrams` is
    * the production keying (xxhash64 longs through the gram exchanges; a
    * collision can only merge two grams' doc counts at the df cut —
    * spec-pinned output-identical); the string default keeps the SQL
    * oracle byte-exact. Output text normalizes inter-token whitespace to
    * single spaces (the tokenizer's equivalence class, same as
    * `normalizeText`'s ws collapse).
    */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String, n: Int,
                     minDf: Int = 2, hashGrams: Boolean = false): DataFrame =
    removeDupSpansWith(df, dupGramBuild(df, idCol, textCol, n, minDf, hashGrams),
      idCol, textCol)

  /** The positioned word-n-gram relation (id, pos, gram) every span op
    * shares — `hashGrams` swaps gram strings for xxhash64 longs in place.
    */
  private def positionedGrams(df: DataFrame, idCol: String, textCol: String,
                              n: Int, hashGrams: Boolean): DataFrame = {
    val worded = df.select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= n)
      .select(col("id"),
        posexplode(transform(sequence(lit(0), size(col("w")) - n),
          i => array_join(slice(col("w"), i + lit(1), lit(n)), " "))))
      .withColumnRenamed("col", "gram")
    if (hashGrams)
      worded.select(col("id"), col("pos"), xxhash64(col("gram")).as("gram"))
    else worded
  }

  /** The build-once duplicated-gram artifact for the span rewrite: the
    * distinct relation of n-grams occurring in ≥ `minDf` documents of the
    * corpus it was built over, plus the parameters that define it (a
    * probe at a different n or keying would never match). Persist/write
    * once per corpus snapshot; every rewrite batch probes it — the
    * `crossCorpusBuild`/`phashBuild` seam convention applied to the
    * rewrite. `dupGramBloom` compresses it into a sketch for the
    * stateless streaming scrub.
    */
  case class DupGramIndex(dupGrams: DataFrame, n: Int, minDf: Int,
                          hashGrams: Boolean) {
    def persist(): this.type = { dupGrams.persist(); this }
    def unpersist(): this.type = { dupGrams.unpersist(); this }
  }

  /** Aggregate the reference corpus' duplicated grams once — the
    * expensive per-snapshot half of the span rewrite (the gram df
    * aggregate is the op's big exchange; re-running it per batch against
    * a slow-moving reference is the cost this seam avoids).
    */
  def dupGramBuild(reference: DataFrame, idCol: String, textCol: String,
                   n: Int, minDf: Int = 2,
                   hashGrams: Boolean = false): DupGramIndex = {
    require(n >= 1, s"dupGramBuild: n-gram order must be >= 1, got $n")
    require(minDf >= 2, s"dupGramBuild: minDf < 2 would flag every gram, got $minDf")
    DupGramIndex(
      positionedGrams(reference, idCol, textCol, n, hashGrams)
        .groupBy(col("gram")).agg(countDistinct(col("id")).as("nd"))
        .filter(col("nd") >= minDf)
        .select(col("gram")),
      n, minDf, hashGrams)
  }

  /** Span rewrite against a PREBUILT duplicated-gram index: every token of
    * `corpus` covered by a gram the INDEX flags is cut — "scrub new crawl
    * text of the boilerplate the training set already taught us" when the
    * index comes from a reference corpus, or exactly `removeDupSpans`
    * when it comes from `corpus` itself (the raw form delegates here —
    * one implementation). Work per batch: the batch's own gram explode, a
    * semi join against the artifact, span-covered anti join, per-document
    * reassembly (grain: the data-scale document id).
    */
  def removeDupSpansWith(corpus: DataFrame, index: DupGramIndex,
                         idCol: String, textCol: String): DataFrame = {
    val n = index.n
    val base = corpus.select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
    val positioned = positionedGrams(corpus, idCol, textCol, n, index.hashGrams)
    // token positions covered by any flagged gram's [pos, pos+n-1] span
    val covered = positioned.join(index.dupGrams.hint("merge"), Seq("gram"), "leftsemi")
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("t"))
      .distinct()
    val toksPos = base.select(col("id"), posexplode(col("w")).as(Seq("t", "tok")))
    val kept = toksPos.join(covered.hint("merge"), Seq("id", "t"), "leftanti")
      .groupBy(col("id"))
      // buffer-bound: kept tokens of ONE document (document length)
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("t"), col("tok")))),
            s => s.getField("tok")), " ").as("text_clean"))
    base.select(col("id"), size(col("w")).as("n_tokens"))
      .join(kept.hint("merge"), Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"),
        (col("n_tokens").cast("long") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Compress a duplicated-gram index into a Bloom sketch for
    * `removeDupSpansBloom`. String-keyed indexes only: the probe
    * expression hashes the gram's UTF-8 bytes (`BloomMightContain`), the
    * same bytes `stat.bloomFilter` puts on the build side.
    */
  def dupGramBloom(index: DupGramIndex, fpp: Double = 1e-8): Array[Byte] = {
    require(!index.hashGrams,
      "dupGramBloom probes gram STRINGS; build the index with hashGrams = false")
    val n = math.max(index.dupGrams.count(), 1L)
    val bloom = index.dupGrams.stat.bloomFilter("gram", n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** The STATELESS span scrub: the rewrite as a pure projection — per
    * row, flag gram starts against the Bloom sketch of the reference's
    * duplicated grams, cut every token inside a flagged span, reassemble.
    * No explode, no join, no aggregation, so it runs UNCHANGED on a
    * stream (parity spec) — this is the online ingest scrub ("strip the
    * boilerplate the training set taught us, while the crawl arrives"),
    * the `decontaminationScoreBloom` pattern applied to a rewrite.
    *
    * Bloom has no false negatives: every genuinely duplicated span is
    * cut; a false positive (rate set at build) cuts an extra clean span —
    * conservative in the right direction for a scrub, and spec-pinned
    * equal to the exact form on the test corpora at the default fpp.
    *
    * Cost note: the per-token coverage test scans the row's flagged-start
    * list (O(tokens × flagged) per document worst case — quadratic only
    * when MOST of a long document is duplicated text; such documents
    * belong to the exact batch rewrite / whole-doc dedup upstream). The
    * sketch ships per task as an expression literal under
    * `BloomBroadcastThreshold`, once per executor above it.
    */
  def removeDupSpansBloom(df: DataFrame, bloomBits: Array[Byte],
                          idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"removeDupSpansBloom: n-gram order must be >= 1, got $n")
    Seq("__w", "__starts", "__kept").foreach(c => require(!df.columns.contains(c),
      s"removeDupSpansBloom uses '$c' as a temp column; input must not contain it"))
    val hit: Column => Column =
      if (bloomBits.length <= graft.ops.TextAnalysis.BloomBroadcastThreshold) {
        g => graft.functions.VectorFunctions.bloomMightContain(g, bloomBits)
      } else {
        val bcast = df.sparkSession.sparkContext.broadcast(bloomBits)
        g => graft.functions.VectorFunctions.bloomMightContain(g, bcast)
      }
    // each intermediate materialized ONCE in its own projection: HOF
    // lambdas get no codegen CSE (the decontaminationScoreBloom rule), so
    // inlining __kept into both size() and array_join() would run the
    // coverage scan twice
    df.withColumn("__w", tokens(col(textCol)))
      .withColumn("__starts",
        when(size(col("__w")) >= n,
          filter(sequence(lit(0), size(col("__w")) - n),
            i => hit(array_join(slice(col("__w"), i + lit(1), lit(n)), " "))))
          .otherwise(array().cast("array<int>")))
      .withColumn("__kept", filter(col("__w"), (_, t) =>
        !exists(col("__starts"), p => t.between(p, p + lit(n - 1)))))
      .select(col(idCol), size(col("__w")).as("n_tokens"),
        (size(col("__w")).cast("long") - size(col("__kept")).cast("long"))
          .as("n_removed"),
        array_join(col("__kept"), " ").as("text_clean"))
  }

  /** Winnowing document fingerprints [Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm]: hash every word `n`-gram
    * (xxhash64 — the production gram keying), slide a `window`-gram
    * window, and keep each window's MINIMUM hash. The selection
    * guarantees of the paper hold by construction: (coverage) every run
    * of `window` consecutive grams contributes at least one selected
    * fingerprint, so any shared passage of ≥ window+n−1 words between
    * two documents shares at least one fingerprint; (density) expected
    * selections ≈ 2/(window+1) of positions — the index stays ~w/2×
    * sparser than the full gram relation `duplicatedSpans` carries,
    * which is the whole point: winnowing is the fingerprint index you
    * can AFFORD to self-join at corpus scale. Unlike a fixed-stride
    * subsample (0 mod k positions), the min-rule is position-free — two
    * copies of a passage select the SAME grams no matter how the copies
    * are offset in their documents.
    *
    * Selection depends on the hash VALUES, so the DuckDB oracle replays
    * xxhash64 in closed form (OracleHashSql.xxhChain — grams must stay
    * under its 32-byte ASCII bound, which the wired word TRIGRAMS of
    * this corpus honor: max measured 3-word shingle is 26 bytes, same as
    * the MinHash shingle oracles). The bound is NOT silently assumed:
    * xxhChain's `g1` CTE raises error('xxh64 oracle: token not
    * short-ASCII') inside the oracle itself whenever any gram is ≥ 32
    * bytes or non-ASCII, so a corpus that breaks the precondition fails
    * the oracle loudly instead of hash-mismatching. One row per
    * distinct (doc, fingerprint).
    *
    * Scale shape: a PURE PROJECTION — tokenize, gram-hash, window-min,
    * distinct, all per row, zero joins, zero shuffles — so the same
    * column works unchanged on an unbounded stream (the Bloom-scrub
    * class). The nested single-element-array lambda bindings are
    * load-bearing: HOF lambdas get no CSE and projection collapse
    * inlines prior withColumns, so a naive chain re-evaluated the whole
    * gram-hash transform PER WINDOW ELEMENT (measured 20 s for 500 docs,
    * ~50× the honest cost); binding each stage to a lambda VARIABLE
    * (`transform(array(expr), x => …)`) evaluates it exactly once per
    * row and every inner reference is a variable read.
    *
    * Defaults (n = 3, window = 4, and the match family's minShared = 2 /
    * maxDf = 20) MATCH the paired DuckDB oracle generators
    * (OracleHashSql.winnowingSql/winnowMatchesSql/winnowCrossSql) — a
    * default drift between the two sides is a guaranteed hash-mismatch
    * hunt; bigrams in particular are the measured ~10⁷-candidate-pair
    * blowup on low-vocabulary corpora (the wired-query comment).
    */
  private[ops] def winnowFpsCol(text: Column, n: Int, window: Int): Column =
    element_at(transform(array(tokens(text)), ws =>
      when(size(ws) >= n,
        element_at(transform(array(
          transform(sequence(lit(0), size(ws) - n),
            i => xxhash64(array_join(slice(ws, i + lit(1), lit(n)), " ")))),
          hs =>
            when(size(hs) <= window, array(array_min(hs)))
              .otherwise(array_distinct(
                transform(sequence(lit(0), size(hs) - window),
                  i => array_min(slice(hs, i + lit(1), lit(window))))))), 1))
        .otherwise(array().cast("array<bigint>"))), 1)

  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         n: Int = 3, window: Int = 4): DataFrame = {
    require(n >= 1, s"winnowFingerprints: n-gram order must be >= 1: $n")
    require(window >= 1, s"winnowFingerprints: window must be >= 1: $window")
    // reserved-output guard, same discipline as containmentPairs /
    // classifierPredictWith: an idCol of 'fp' (or a pre-existing
    // 'fp'/'__fps' column) would otherwise surface as ambiguous columns
    // deep in a downstream join instead of failing loudly here
    Seq("fp", "__fps").foreach(c => require(
      idCol != c && !df.columns.contains(c),
      s"winnowFingerprints reserves column name '$c'"))
    // explode_OUTER, then drop the null rows short docs produce: a plain
    // explode makes InferFiltersFromGenerate plant `size(fps) > 0` BELOW
    // the projection, re-evaluating the whole selection expression per
    // row (plan-audited 2× scan cost); the outer form skips that rule
    // and the post-generate null filter is an attribute comparison
    df.select(col(idCol), winnowFpsCol(col(textCol), n, window).as("__fps"))
      .select(col(idCol), explode_outer(col("__fps")).as("fp"))
      .filter(col("fp").isNotNull)
  }

  /** Winnowing-candidate pairs: documents sharing ≥ `minShared` selected
    * fingerprints — the plagiarism/quote-reuse detector MOSS runs, as a
    * self-join over the SPARSE fingerprint relation (expected
    * 2/(window+1) of the gram relation, so the Σ df² candidate cost is
    * ~(w+1)²/4× below the containment join's). Same df-cap discipline as
    * `containmentPairs`: fingerprints in more than `maxDf` documents are
    * dropped before the join (boilerplate passages every document
    * shares are not reuse evidence), bounding each surviving fingerprint
    * at maxDf² directed pairs. All exchange keys are 8-byte hashes.
    * Undirected pairs (id_a < id_b), count of shared fingerprints.
    */
  def winnowMatches(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 3, window: Int = 4, minShared: Int = 2,
                    maxDf: Int = 20): DataFrame = {
    require(minShared >= 1 && maxDf > 0,
      s"winnowMatches: need minShared >= 1, maxDf > 0: $minShared, $maxDf")
    // 'fp'/'__fps' are guarded inside winnowFingerprints, whose output is
    // EXACTLY (idCol, fp) — so the downstream renames to id/id_ref/id_new
    // and the pair aliases id_a/id_b can never collide with a caller
    // column (anything else in df is projected away before they exist)
    val fps = winnowFingerprints(df, idCol, textCol, n, window)
      .withColumnRenamed(idCol, "id")
    val cool = fps.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
    // one materialization feeds both join sides (the containmentPairs
    // checkpoint lesson)
    // corpus-derived build sides are merge-hinted (the containmentPairs
    // round-14 rule — never ride an AQE broadcast decision)
    val bounded = graft.Cleanup.register(
      fps.join(cool.select(col("fp")).hint("merge"), Seq("fp"), "leftsemi")
        .localCheckpoint(false))
    bounded.as("a").join(bounded.as("b").hint("merge"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared_fp"))
      .filter(col("shared_fp") >= minShared)
  }

  /** The build-once reference artifact for cross-corpus winnowing: the
    * reference's df-capped (fp, id_ref) fingerprint relation — expected
    * 2/(window+1) the size of the gram relation the containment seam
    * carries, 16 bytes/row. The cap counts REFERENCE docs only, so how a
    * crawl is micro-batched can never change which fingerprints survive
    * (the `crossCorpusNearDupsWith` batch-invariance rule), and every
    * surviving fingerprint bounds probe fan-out at `maxDf` reference
    * rows. Persist as parquet keyed by fp; `persist()` is in-session.
    */
  case class WinnowIndex(refFps: DataFrame, n: Int, window: Int, maxDf: Int) {
    def persist(): this.type = { refFps.persist(); this }
    def unpersist(): this.type = { refFps.unpersist(); this }
  }

  /** Winnow + df-cap the reference corpus once — the per-snapshot half of
    * the cross-corpus quote-reuse detector.
    */
  def winnowBuild(reference: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, window: Int = 4, maxDf: Int = 20): WinnowIndex = {
    require(maxDf > 0, s"winnowBuild requires a positive reference-side fp df cap: $maxDf")
    val fps = winnowFingerprints(reference, idCol, textCol, n, window)
      .withColumnRenamed(idCol, "id_ref")
    val cool = fps.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select(col("fp"))
    // merge-hinted: the df census is corpus-derived (containmentPairs rule)
    WinnowIndex(fps.join(cool.hint("merge"), Seq("fp"), "leftsemi"),
      n, window, maxDf)
  }

  /** Cross-corpus winnowing flags against a PREBUILT reference artifact:
    * new documents sharing ≥ `minShared` selected fingerprints with some
    * reference document — "this crawl page reuses a passage of training
    * data", the sparse-index sibling of `containmentFlagsWith` (winnowing
    * trades the containment RATIO for a shared-fingerprint COUNT at
    * ~2/(w+1) the index size and candidate cost; the coverage guarantee
    * makes a shared passage of ≥ window+n−1 words detectable by
    * construction). One row per flagged (new doc, reference doc) pair
    * with the shared count — work is linear in the batch: each new-doc
    * fingerprint meets ≤ maxDf reference rows.
    */
  def winnowFlagsWith(corpus: DataFrame, index: WinnowIndex,
                      idCol: String, textCol: String,
                      minShared: Int = 2): DataFrame = {
    require(minShared >= 1, s"winnowFlagsWith: minShared must be >= 1: $minShared")
    winnowFingerprints(corpus, idCol, textCol, index.n, index.window)
      .withColumnRenamed(idCol, "id_new")
      // the reference fingerprint relation scales with the reference
      // corpus — merge-hinted (containmentPairs rule)
      .join(index.refFps.hint("merge"), Seq("fp"))
      .groupBy(col("id_new"), col("id_ref"))
      .agg(count(lit(1)).as("shared_fp"))
      .filter(col("shared_fp") >= minShared)
  }

  /** STREAMING cross-corpus winnowing: the fingerprint selection is the
    * SAME pure projection the batch path runs (winnowFpsCol —
    * stream-safe by construction), the reference join is stream-static,
    * and the per-(new doc, ref doc) shared count is one
    * watermark-bounded windowed aggregation — the
    * `streamingContainmentFlagsWith` shape exactly.
    */
  def streamingWinnowFlagsWith(stream: DataFrame, index: WinnowIndex,
                               tsCol: String, idCol: String, textCol: String,
                               minShared: Int = 2, watermark: String = "10 minutes",
                               windowLen: String = "1 hour"): DataFrame = {
    stream
      .select(col(tsCol).cast("timestamp").as("ts"), col(idCol).as("id_new"),
        winnowFpsCol(col(textCol), index.n, index.window).as("__fps"))
      // explode_OUTER + null filter, same as the batch path: a plain
      // explode re-evaluates the whole selection per row via the
      // inferred size() guard (winnowFingerprints comment)
      .select(col("ts"), col("id_new"), explode_outer(col("__fps")).as("fp"))
      .filter(col("fp").isNotNull)
      .withWatermark("ts", watermark)
      .join(index.refFps, Seq("fp")) // stream-static: no state
      .groupBy(window(col("ts"), windowLen), col("id_new"), col("id_ref"))
      .agg(count(lit(1)).as("shared_fp"))
      .filter(col("shared_fp") >= minShared)
      .select(col("window.start").as("ts"), col("id_new"), col("id_ref"),
        col("shared_fp"))
  }
}
