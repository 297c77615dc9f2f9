package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (SURVEY §2.3):
  * language ID, quality scoring, token counting, document fingerprinting.
  * All pure Catalyst expressions — per-row, shuffle-free, codegen-friendly;
  * at 100 TB these run at scan speed.
  */
object TextAnalysis {

  /** Above this serialized size the decontamination Bloom filter ships as a
    * broadcast variable (once per executor) instead of an expression-tree
    * literal (once per task binary). 1 MB ≈ a few hundred-k grams at 1%
    * fpp; anything bigger is a real benchmark suite.
    */
  val BloomBroadcastThreshold: Int = 1 << 20

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword segmentation via regex: letter runs, digit runs,
    * single other glyphs — a deterministic stand-in for a learned BPE
    * vocabulary with the same column plumbing.
    */
  def subwordTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def subwordCount(text: Column): Column = size(subwordTokens(text))

  /** Tiny per-language marker lexicons for the n-gram/stopword heuristic
    * language ID. Deterministic, vocabulary-driven — production would swap
    * in real frequency profiles; the scoring plumbing is identical.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "fast", "slow"),
    "fr" -> Seq("le", "la", "et", "de", "vite"),
    "es" -> Seq("el", "la", "y", "de", "rapido"),
    "de" -> Seq("der", "die", "und", "von", "schnell"),
    "zh" -> Seq("de", "he", "shi", "kuai"),
  )

  /** Heuristic language ID: score = count of marker tokens per language;
    * argmax with deterministic alphabetical tie-break — native expression
    * (graft.functions.LangId), one pass over the tokens for all languages.
    */
  def langId(text: Column): Column =
    graft.functions.VectorFunctions.langId(tokens(lower(text)), langMarkers)

  /** Quality-scoring feature columns (length, token stats, punctuation and
    * stopword ratios) + a composite [0,1] score. All arithmetic kept in
    * integer/decimal-safe forms so a SQL oracle reproduces it exactly.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val en = langMarkers.head._2
    // tokenize and subword-split ONCE into temp columns: each expression
    // below referencing `toks`/`subw` reuses the materialized arrays
    // across projection levels — inlined splits re-run per feature where
    // codegen CSE can't reach (measured 0.74 s → 0.55 s at sf0.1).
    // withColumn REPLACES an existing same-named column, so a caller
    // column named __toks/__subw would be silently dropped — fail loudly.
    Seq("__toks", "__subw").foreach(c => require(!df.columns.contains(c),
      s"qualityFeatures uses '$c' as a temp column; input must not contain it"))
    df.withColumn("__toks", tokens(t))
      .withColumn("__subw", subwordTokens(t))
      .withColumn("n_chars_m", length(t))
      .withColumn("n_tokens", size(col("__toks")))
      .withColumn("avg_token_len",
        round(aggregate(col("__toks"), lit(0L), (s, x) => s + length(x)).cast("double") /
          greatest(size(col("__toks")), lit(1)), 4))
      .withColumn("punct_ratio",
        round(size(filter(col("__subw"), s => s.rlike("^[^A-Za-z0-9]$"))).cast("double") /
          greatest(size(col("__subw")), lit(1)), 4))
      .withColumn("stopword_ratio",
        round(size(filter(col("__toks"), x => lower(x).isInCollection(en))).cast("double") /
          greatest(size(col("__toks")), lit(1)), 4))
      .drop("__toks", "__subw")
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with sane
    * token lengths and some stopwords. Thresholds are arbitrary but fixed.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    qualityFeatures(df, textCol)
      .withColumn("quality_score",
        round(
          (when(col("n_tokens").between(10, 200), 0.4).otherwise(0.0)
            + when(col("avg_token_len").between(2.0, 10.0), 0.3).otherwise(0.0)
            + when(col("stopword_ratio") > 0.0, 0.3).otherwise(0.0)), 2))

  /** Polynomial rolling-hash fingerprint over the full text:
    * h = fold(h * 31 + char) mod 1e9+7 — native one-pass kernel
    * (graft.functions.Fingerprint), exactly reproducible in any SQL engine
    * with a per-character fold (the DuckDB oracle uses list_reduce). Used
    * for cheap content-addressing and exact-dup bucketing where the raw
    * text is too wide to shuffle.
    */
  def fingerprint(text: Column): Column =
    graft.functions.VectorFunctions.fingerprint(text)

  /** Corpus-curation normalization: lowercase, HTML tags stripped,
    * URLs/emails redacted to fixed placeholders (PII hygiene), control
    * chars dropped, whitespace collapsed and trimmed. A pure per-row
    * regexp_replace chain — scan-speed, shuffle-free, whole-stage
    * codegen'd; every pattern stays in the RE2∩Java common subset (same
    * discipline as the router, SURVEY §2.1 F1) so a DuckDB oracle
    * reproduces it byte-for-byte.
    */
  def normalize(text: Column): Column = {
    // placeholders are [url]/[email], NOT tag-shaped — a <url> placeholder
    // would be re-stripped as an HTML tag on a second pass, breaking the
    // idempotence a multi-stage pipeline relies on (pinned by spec)
    val lowered = lower(text)
    val noTags  = regexp_replace(lowered, "<[^>]*>", " ")
    // explicit whitespace class, not \s: Java's \s includes vertical tab
    // \x0b, RE2's does not — the explicit class is identical in both
    val noUrls  = regexp_replace(noTags, "https?://[^ \\t\\n\\x0b\\f\\r]+", "[url]")
    val noMail  = regexp_replace(noUrls, "[a-z0-9._%+-]+@[a-z0-9.-]+", "[email]")
    val noCtl   = regexp_replace(noMail, "[\\x00-\\x1f]", " ")
    trim(regexp_replace(noCtl, "\\s+", " "))
  }

  /** Deterministic content-hash train/val/test assignment: bucket =
    * fingerprint(text) mod 100, split by cumulative percentage. Content-
    * keyed (not random, not row-position): the same document lands in the
    * same split across reshuffles, re-partitions, and re-runs — the
    * property that keeps eval sets stable as a 100 TB corpus is
    * incrementally rebuilt. Pure per-row expressions; the rolling-hash
    * fingerprint is reproducible in any SQL engine (same kernel as
    * text_fingerprint).
    */
  def splitAssignment(text: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    val bucket = pmod(fingerprint(text), lit(100L))
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Fixed-size overlapping character chunking — the RAG / context-window
    * primitive: split every document into `size`-char windows starting
    * every `stride` chars (stride < size ⇒ overlap), keeping the source
    * offset so downstream spans map back into the original document. Pure
    * generator expressions (sequence → posexplode → substr): shuffle-free,
    * whole-stage codegen'd, runs at scan speed. Output volume is
    * ~size/stride × the input bytes — at 100 TB pick stride close to size
    * and let the sink repartition by hash(id) if chunk locality matters.
    * Start positions are 0, stride, 2·stride, … < min(len, len−size+stride):
    * a chunk is emitted only if it CONTRIBUTES NEW CHARACTERS — a start
    * whose window is fully inside the previous chunk (e.g. start 90 on a
    * 120-char doc at size 120) or past the end of the text is skipped.
    * Every document (even an empty one) yields at least one chunk, and the
    * last chunk may be shorter than `size`.
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, s"size/stride must be positive, got $size/$stride")
    val len = length(col(textCol))
    df.select(col(idCol), col(textCol),
        posexplode(sequence(lit(0),
          greatest(least(len, len - size + stride) - 1, lit(0)),
          lit(stride))).as(Seq("chunk_id", "chunk_start")))
      .select(col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        col("chunk_start").cast("long").as("chunk_start"),
        col(textCol).substr(col("chunk_start") + 1, lit(size)).as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
  }

  /** Train→held-out contamination metric: distinct-n-gram containment of
    * every val/test document against the TRAIN split's gram set, with the
    * splits derived from the same content-hash [[splitAssignment]] the
    * pipeline ships. This composition catches the leakage class per-corpus
    * decontamination can't see: NEAR-copies that landed on opposite sides
    * of the split boundary (exact copies can't leak here by construction —
    * identical text hashes to the same bucket). Same broadcast shape as
    * [[decontaminationScore]]; when the train side outgrows a broadcast at
    * 100 TB, swap in the Bloom variant unchanged.
    */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int): DataFrame = {
    require(!df.columns.contains("__split"),
      "splitLeakage uses '__split' as a temp column; input must not contain it")
    val withSplit = df.withColumn("__split", splitAssignment(col(textCol)))
    val train = withSplit.filter(col("__split") === "train")
    val heldOut = withSplit.filter(col("__split") =!= "train")
    decontaminationScore(heldOut, train, idCol, textCol, shingleN)
      .withColumnsRenamed(Map("bench_hits" -> "train_hits"))
  }

  /** Benchmark decontamination: per document, the n-gram CONTAINMENT
    * against a benchmark corpus — |shingles(doc) ∩ benchmarkShingles| /
    * |shingles(doc)| — the standard check that training data doesn't leak
    * eval sets. The benchmark's distinct shingle set is aggregated once
    * and the overlap is computed with a broadcast-friendly join:
    * doc-shingles explode → semi-join against benchmark shingles (small
    * side broadcast) → per-doc overlap count. At 100 TB the benchmark is
    * tiny next to the corpus, so the join never shuffles the corpus —
    * each partition counts its own docs' hits.
    */
  def decontaminationScore(docs: DataFrame, benchmark: DataFrame,
                           idCol: String, textCol: String, shingleN: Int): DataFrame = {
    val benchGrams = benchmark
      .select(explode(Dedup.shingles(col(textCol), shingleN)).as("g")).distinct()
      .withColumn("__hit", lit(1))
    // ONE pass over the corpus: explode the (already-distinct) doc
    // shingles once, mark benchmark hits via the broadcast left join, and
    // produce both the gram count and the hit count from a single groupBy
    // — no second shingle computation, no reunite join. explode_outer
    // keeps empty documents (0 grams) in the output.
    docs.select(col(idCol), explode_outer(Dedup.shingles(col(textCol), shingleN)).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(col("g")).as("n_grams"), count(col("__hit")).as("bench_hits"))
      .select(col(idCol), col("n_grams"), col("bench_hits"),
        round(col("bench_hits").cast("double") /
          greatest(col("n_grams"), lit(1)), 4).as("containment"))
  }

  /** Build a serialized Bloom filter over a benchmark corpus's distinct
    * n-gram shingles — the compact sketch `decontaminationScoreBloom`
    * probes. Built DISTRIBUTED via `DataFrameStatFunctions.bloomFilter`
    * (treeAggregate of per-partition filters — the gram set itself never
    * reaches the driver; only the final ~1.2·n·log2(1/fpp)-bit filter
    * does). At fpp 1e-4 that is ~2.4 bytes per gram: a 10M-gram benchmark
    * suite is a ~24 MB filter vs hundreds of MB for the broadcast hash
    * relation of the exact path's semi-join — the difference between a
    * benchmark set that broadcasts and one that doesn't.
    */
  def benchmarkBloom(benchmark: DataFrame, textCol: String, shingleN: Int,
                     fpp: Double = 1e-4): Array[Byte] = {
    val grams = benchmark
      .select(explode(Dedup.shingles(col(textCol), shingleN)).as("g")).distinct()
    val n = math.max(grams.count(), 1L)
    val bloom = grams.stat.bloomFilter("g", n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Benchmark decontamination via a Bloom filter — the 100 TB-scale shape
    * of `decontaminationScore`: instead of broadcast-semi-joining the
    * corpus's exploded shingles against the benchmark gram SET, every task
    * probes the compact filter inside a higher-order `filter` lambda —
    * NO explode, NO join, NO shuffle; one scan-speed projection per
    * document. Bloom guarantees no false negatives, so `bloom_hits` is an
    * upper bound on the exact `bench_hits` (flagged docs are a superset —
    * exactly what a contamination FILTER needs: nothing contaminated
    * escapes); false positives are bounded by the build-time fpp and the
    * output column is named `containment_ub` to say so. Spec-pinned
    * against the exact operator.
    */
  def decontaminationScoreBloom(docs: DataFrame, bloomBits: Array[Byte],
                                idCol: String, textCol: String, shingleN: Int): DataFrame = {
    require(!docs.columns.contains("__grams"),
      "decontaminationScoreBloom uses '__grams' as a temp column; input must not contain it")
    // small filters ride the expression tree as a (content-equal) literal;
    // a production-sized one (~24 MB for 10M grams) ships ONCE per executor
    // as a broadcast variable instead of per task binary
    val hit: Column => Column =
      if (bloomBits.length <= BloomBroadcastThreshold) {
        g => graft.functions.VectorFunctions.bloomMightContain(g, bloomBits)
      } else {
        val bcast = docs.sparkSession.sparkContext.broadcast(bloomBits)
        g => graft.functions.VectorFunctions.bloomMightContain(g, bcast)
      }
    // shingles materialized ONCE in a lower projection: HOF lambdas get no
    // codegen CSE, so inlining the shingle kernel into both size() and
    // filter() would tokenize every document twice
    docs.withColumn("__grams", Dedup.shingles(col(textCol), shingleN))
      .select(col(idCol), size(col("__grams")).as("n_grams"),
        size(filter(col("__grams"), hit)).as("bloom_hits"))
      .withColumn("containment_ub",
        round(col("bloom_hits").cast("double") / greatest(col("n_grams"), lit(1)), 4))
  }

  /** PII patterns for `redactPii` — deliberately in the regex dialect
    * intersection (no lookaround, no backrefs, character classes and
    * bounded quantifiers only) so the same pattern string means the same
    * thing to Java regex (Spark), RE2 (a Go/Rust engine), and DuckDB —
    * the identical portability rule `TextNormalize` follows.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}"

  /** PII redaction (the scrub pass every training-data pipeline runs before
    * anything else sees the text): replaces e-mail addresses and
    * international-format phone numbers with typed placeholder tags and
    * counts what was redacted. Pure per-row regexp expressions —
    * scan-speed, shuffle-free, trivially streamable; at 100 TB this is a
    * narrow projection fused into whatever scan feeds it. Order matters:
    * e-mails are replaced FIRST so a phone-pattern substring inside an
    * address can't split it.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  def piiEmailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))

  def piiPhoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0)))

  /** Repetition ratio (a Gopher-style quality signal): the fraction of a
    * document's word n-grams that are repeats of an earlier n-gram —
    * 1 − distinct/total. Pure per-row expressions, scan-speed.
    */
  def repetitionRatio(text: Column, n: Int): Column = {
    val total = greatest(size(tokens(text)) - (n - 1), lit(1))
    val distinctGrams = size(Dedup.shingles(text, n))
    round(lit(1.0) - distinctGrams.cast("double") / total, 4)
  }

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
    Seq("priority", "est_w", "tau").foreach(c =>
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
  }

  /** Fold priority-sample artifacts (shards, crawl batches) into one:
    * union → top-(k+1). Exact, associative, commutative — each input is
    * ≤ k+1 rows, so the fold is driver-cheap at any corpus size.
    */
  def prioritySampleMerge(parts: Seq[DataFrame], idCol: String, k: Int): DataFrame = {
    require(parts.nonEmpty, "prioritySampleMerge: nothing to merge")
    parts.reduce(_ unionByName _)
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k + 1)
  }

  /** Artifact → final sample: τ = the (k+1)-th priority (0 when the corpus
    * had ≤ k rows — every row sampled, est_w degenerates to w), top-k rows
    * with est_w = max(w, τ), the unbiased subset-sum estimator.
    */
  def prioritySampleFinalize(artifact: DataFrame, idCol: String,
                             weightCol: String, k: Int): DataFrame = {
    val top = graft.Cleanup.register(
      artifact.localCheckpoint(false)) // ≤ k+1 rows; feeds sample AND τ
    val tau = top.agg(
      when(count(lit(1)) === k + 1, min(col("priority"))).otherwise(lit(0.0)).as("tau"))
    top.orderBy(col("priority").desc, col(idCol).asc).limit(k)
      .crossJoin(broadcast(tau)) // 1-row scalar, verified pattern
      .withColumn("est_w", greatest(col(weightCol).cast("double"), col("tau")))
      .drop("tau")
  }

  /** Per-document top-k salient terms, ranked by tf/df — term frequency in
    * the document over document frequency in the corpus (the log-free
    * tf-idf variant: idf' = N/df instead of ln(N/df); the corpus size N is
    * constant within a document's ranking, so it cancels, and the score
    * stays a ratio of integers whose double division is IEEE-exact — a
    * transcendental ln() can differ by an ulp between engines/libms, which
    * is enough to flip a rank tie-break and break hash-exact oracle
    * comparison).
    *
    * Scale shape: tf = one (doc, term) aggregation; df = one (term)
    * aggregation DERIVED FROM tf (tf rows are distinct (doc, term) pairs,
    * so counting them per term IS document frequency — no second
    * tokenization pass); top-k via a per-doc row_number window —
    * partitioned by doc, never global. tf feeds TWO consumers (the join's
    * probe side and the df aggregate), and neither Catalyst's
    * ReuseExchange nor AQE's stage cache dedupes the two aggregate
    * subtrees (verified empirically: two separate shuffle stages), so tf
    * is materialized ONCE with a lazy localCheckpoint — at 100 TB the
    * term-frequency relation is the natural build artifact anyway. The
    * harness drains the checkpoint blocks after the query (Cleanup).
    */
  def topTermsPerDoc(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = graft.Cleanup.register(
      df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
        .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
        .localCheckpoint(false))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("term"), col("tf"), col("df"),
        round(col("score"), 4).as("score_r"))
  }

  /** BM25 relevance of every document against a fixed bag of query terms —
    * the retrieval-scoring surface a curation pipeline uses to mine
    * topic-relevant training data from a crawl. Classic Okapi shape with
    * one deliberate substitution: idf' = (N − df + 0.5)/(df + 0.5) WITHOUT
    * the ln() — the rational core of the Robertson–Sparck-Jones weight.
    * ln is monotone, so rankings are identical for any single-term query
    * and near-identical for short conjunctive ones; what the ln() costs is
    * hash-exact cross-engine comparability (libm ulps differ), which this
    * whole suite is built on. Production can wrap the ln back on top of
    * the same plan — it's one more projection.
    *
    * Determinism discipline: the per-term partial scores are summed in
    * FIXED term order via one conditional aggregate per query term (each
    * sums exactly one nonzero value, so float addition order is pinned),
    * never a data-ordered sum(); avgdl is an exact integer-sum divided
    * once. Scale shape: tf is one (doc, term) aggregation over tokens
    * FILTERED to the query terms before the shuffle — the exchange is
    * O(docs × |q|), not O(tokens); df and the corpus stats are tiny and
    * broadcast.
    */
  def bm25Score(df: DataFrame, idCol: String, textCol: String,
                terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Score: empty query")
    val base = df.select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(size(col("w"))).cast("double") / count(lit(1))).as("avgdl"))
    val tf = base
      .select(col("id"), size(col("w")).cast("double").as("dl"),
        explode(col("w")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    val perTerm = terms.zipWithIndex.map { case (tm, i) =>
      sum(when(col("term") === tm, col("s")).otherwise(lit(0.0))).as(s"__s$i")
    }
    val agged = scored.groupBy(col("id"))
      .agg(perTerm.head, perTerm.tail :+ count(lit(1)).as("n_hit_terms"): _*)
    val total = terms.indices.map(i => col(s"__s$i")).reduce(_ + _)
    agged.select(col("id").as(idCol), round(total, 4).as("bm25"), col("n_hit_terms"))
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

  /** Corpus-level heavy hitters: the k most document-frequent word n-grams.
    * Shingles are distinct per document (Dedup.shingles), so the count IS
    * document frequency. orderBy+limit compiles to TakeOrderedAndProject —
    * each partition keeps a local top-k after partial aggregation and the
    * driver merges k rows; no global sort, no full collect, at any corpus
    * size. Deterministic total order: (doc_freq desc, gram asc).
    */
  def topNGrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    df.select(explode(Dedup.shingles(col(textCol), n)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("g").asc)
      .limit(k)

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

  /** Vocabulary-bounded word-pair lift (co-occurrence mining): restrict to
    * the top-`vocabK` terms by document frequency, then for every term
    * pair co-occurring in ≥ `minCoDocs` documents emit
    * lift = N·c(a,b) / (df(a)·df(b)) — the PMI argument without the log
    * (a ratio of exact integers divides to one IEEE double, so it
    * hash-compares across engines; ln() implementations don't).
    *
    * Scale shape: the vocab cap is what makes this tractable — per-doc
    * pair fanout is ≤ C(vocabK,2) regardless of document length, and pairs
    * are generated with an index-lambda HOF over each doc's sorted term
    * array (no self-join of the token table). Two bounded shuffles:
    * doc-grouping and pair-counting (≤ C(vocabK,2) keys); vocab and
    * doc-frequency maps ride as broadcasts.
    */
  def wordLift(df: DataFrame, idCol: String, textCol: String,
               vocabK: Int = 40, minCoDocs: Long = 5): DataFrame = {
    val terms = df.select(col(idCol).as("__doc"),
      explode(array_distinct(tokens(col(textCol)))).as("term"))
    val dfreq = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val vocab = dfreq.orderBy(col("df").desc, col("term")).limit(vocabK)
    val perDoc = terms.join(broadcast(vocab.select(col("term"))), "term")
      .groupBy(col("__doc")).agg(sort_array(collect_set(col("term"))).as("ts"))
    val pairs = perDoc
      .select(explode(flatten(transform(col("ts"), (x, i) =>
        transform(slice(col("ts"), i + lit(2), size(col("ts"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("term_a"), col("p.b").as("term_b"))
      .agg(count(lit(1)).as("co_docs"))
      .filter(col("co_docs") >= minCoDocs)
    val n = df.agg(count(lit(1)).cast("double").as("n_docs"))
    pairs
      .join(broadcast(vocab.select(col("term").as("term_a"), col("df").as("df_a"))), "term_a")
      .join(broadcast(vocab.select(col("term").as("term_b"), col("df").as("df_b"))), "term_b")
      .crossJoin(broadcast(n))
      .select(col("term_a"), col("term_b"), col("co_docs"), col("df_a"), col("df_b"),
        round(col("n_docs") * col("co_docs").cast("double")
          / (col("df_a") * col("df_b")).cast("double"), 4).as("lift_r"))
  }

  /** Exact TF-IDF-weighted cosine similarity join over n-gram shingles,
    * bounded by a document-frequency cap: terms appearing in more than
    * `dfCap` documents are dropped BEFORE the term self-join (a hot gram
    * carries ~zero idf weight but quadratic join fanout — discarding it
    * changes scores negligibly and bounds the per-term pair volume at
    * C(dfCap, 2)). This is the standard sparse similarity-join shape: the
    * scalable EXACT alternative to both the all-pairs product (infeasible)
    * and MinHash (approximate). Weights are the same rational tf/df used
    * by topTermsPerDoc (no ln — cross-engine exact); dot products and
    * norms fold their term lists in SORTED order (the meanPool
    * discipline), so the rounded cosines hash-compare against a SQL
    * oracle.
    *
    * Scale shape: exchanges carry (doc, term, w) scalars keyed on term,
    * then (id_a, id_b) pairs — never payloads; the df-cap makes candidate
    * volume Σ_term C(df,2) ≤ |rare terms|·C(dfCap,2), linear in the corpus
    * for fixed cap.
    */
  def tfidfSimJoin(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, dfCap: Long = 20,
                   threshold: Double = 0.5): DataFrame = {
    // tokens materialized in a lower projection: the gram expression
    // references the array twice (sequence bound + slice) and HOF lambdas
    // get no codegen CSE
    val grams = df
      .select(col(idCol).as("doc"), tokens(col(textCol)).as("__w"))
      .select(col("doc"), explode(transform(
        sequence(lit(1), greatest(size(col("__w")) - (shingleN - 1), lit(1))),
        i => array_join(slice(col("__w"), i, lit(shingleN)), " "))).as("term"))
    val tf = grams.groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df0"))
      .filter(col("df0") <= dfCap)
    val w = tf.join(dfreq, "term")
      .select(col("doc"), col("term"), (col("tf") / col("df0").cast("double")).as("w"))
    val norms = w.groupBy(col("doc"))
      .agg(sqrt(aggregate(array_sort(collect_list(col("w") * col("w"))),
        lit(0.0), (a, x) => a + x)).as("nrm"))
    val dots = w.as("a").join(w.as("b"),
        col("a.term") === col("b.term") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(aggregate(array_sort(collect_list(col("a.w") * col("b.w"))),
        lit(0.0), (s, x) => s + x).as("dot"))
    val cos = col("dot") / (col("na") * col("nb"))
    dots
      .join(norms.select(col("doc").as("id_a"), col("nrm").as("na")), "id_a")
      .join(norms.select(col("doc").as("id_b"), col("nrm").as("nb")), "id_b")
      .filter(cos >= threshold)
      .select(col("id_a"), col("id_b"), round(cos, 4).as("cosine_r"))
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

  /** Inverted-index construction for the k highest-df terms: each term's
    * posting list as a sorted doc-id string (collect_list is
    * merge-order-nondeterministic, so sort_array pins it). Build shape:
    * ONE distinct (term, doc) aggregate feeds both the df census and the
    * posting assembly; the k selected terms come back as a broadcast semi
    * join, so the full term-doc relation shuffles once. At 100 TB a hot
    * term's posting list exceeds one row's practical size — production
    * shards the assembly key to (term, doc_id div B) posting SEGMENTS
    * (same plan shape, bounded rows); the query form here caps output by
    * top-k df instead so an oracle can check it end-to-end.
    */
  def postings(df: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    val td = df.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .distinct()
    val dfs = td.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val top = dfs.orderBy(col("df").desc, col("term")).limit(k)
    td.join(broadcast(top), Seq("term"))
      .groupBy(col("term"), col("df"))
      .agg(array_join(
        transform(sort_array(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("posting"))
  }

  /** Posting SEGMENTS — the production form the `postings` scaladoc
    * names: the assembly key is (term, doc_id div segSize), so one output
    * row carries at most `segSize` doc ids no matter how
    * document-frequent the term. At 100 TB a hot term's whole posting
    * list exceeds any practical row/buffer size — `postings`' per-term
    * collect_list buffers df ids in ONE aggregation state; here the
    * buffer is capped at segSize and hot terms spread across df/segSize
    * parallel states. Segments reassemble losslessly: ids are
    * range-aligned by the div, so concatenating segments in `seg` order
    * equals the whole sorted list EXACTLY (spec-pinned against the
    * capped form). k > 0 keeps the top-k-df roster (broadcast, the
    * oracle-checkable surface); k <= 0 indexes EVERY term — the true
    * production build, where the df census joins back on the data-scale
    * term key instead of broadcasting a roster. Output:
    * (term, df, seg, seg_df, posting).
    */
  def postingsSegments(df: DataFrame, idCol: String, textCol: String,
                       k: Int, segSize: Long = 1024L): DataFrame = {
    require(segSize > 0, s"postingsSegments: segSize must be positive, got $segSize")
    val td = df.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .distinct()
    val dfs = td.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val sel =
      if (k > 0) td.join(broadcast(dfs.orderBy(col("df").desc, col("term")).limit(k)), Seq("term"))
      else td.join(dfs, Seq("term"))
    sel
      // FLOOR division, not trunc: with mixed-sign doc ids a truncating
      // div would give segment 0 the double-width span (−segSize, segSize)
      // — up to 2·segSize−1 ids in one buffer, breaking the documented
      // per-segment bound. Floor keeps every segment exactly segSize wide.
      .withColumn("seg", expr(
        s"doc_id div $segSize - (CASE WHEN doc_id % $segSize < 0 THEN 1 ELSE 0 END)"))
      .groupBy(col("term"), col("df"), col("seg"))
      .agg(count(lit(1)).as("seg_df"),
        array_join(
          transform(sort_array(collect_list(col("doc_id"))),
            x => x.cast("string")), ",").as("posting"))
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

  /** Corpus-trained bigram language-model scoring — the relational shape
    * of a CCNet-style LM quality filter (Wenzek et al. 2020), with the
    * model trained on the corpus itself in the same query. Bigram counts
    * c(w1,w2) and leading-unigram totals c(w1) are exact-integer
    * aggregations over the exploded token stream; each bigram occurrence
    * scores add-one-smoothed P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V), clamped
    * to integer nano-units via floor(P·1e9) — IEEE division/multiply of
    * integer-valued doubles is deterministic on any engine, and the
    * per-doc SUM of longs commutes, so scores hash-compare exactly.
    * Scale shape: the corpus is scanned and tokenized ONCE into the
    * per-doc bigram-multiplicity relation, materialized for its two
    * consumers (the model aggregation and the scoring join — the DESIGN
    * §8.1 two-consumer rule; at 100 TB it is the natural build artifact,
    * the LM equivalent of text_tfidf's tf table). The materialization is
    * a SERIALIZED memory+disk persist, not a localCheckpoint: compact
    * columnar blocks (~40 B/token, ~3 GB at the 1M-doc/79M-token probe)
    * that spill instead of exploding into deserialized row objects —
    * 32-way concurrent deserialized caching OOMed a 32 GB heap at the
    * probe scale — and keep lineage, so an evicted block recomputes
    * instead of failing the job. V is the bigram-participating
    * vocabulary, derived from the model relation — no second corpus
    * pass; c(w1) joins the model (bigram types), it is never broadcast;
    * no driver-side model state.
    */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val bgc = graft.Cleanup.register(
      df.select(col(idCol),
          filter(zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
            (a, b) => struct(a.as("w1"), b.as("w2"))), p => p("w2").isNotNull)
            .as("bgs"))
        .select(col(idCol), explode(col("bgs")).as("bg"))
        .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("m"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
    val c12 = bgc.groupBy(col("w1"), col("w2")).agg(sum(col("m")).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = c12.select(col("w1").as("w"))
      .union(c12.select(col("w2").as("w")))
      .agg(countDistinct(col("w")).as("v"))
    val model = c12.join(c1, Seq("w1")).crossJoin(vocab)
      .withColumn("p_nano",
        floor((col("c12") + 1).cast("double")
          / (col("c1") + col("v")).cast("double") * 1e9).cast("long"))
      .select(col("w1"), col("w2"), col("p_nano"))
    bgc.join(model, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("m") * col("p_nano")).as("score_nano"),
        sum(col("m")).as("n_bigrams"))
      // integer division (not a double-cast — Spark truncates, other
      // engines round; `div` floors identically everywhere for positives)
      .withColumn("avg_p_nano", expr("score_nano div n_bigrams"))
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

  /** BPE merge-table induction — tokenizer TRAINING as a pipeline op
    * [Sennrich et al., "Neural Machine Translation of Rare Words with
    * Subword Units", ACL 2016 — the standard byte-pair-encoding trainer].
    * Spark-first cost split: the only corpus-scale work is ONE word-count
    * aggregation (the same shuffle shape as `topNGrams`); the merge loop
    * then runs over the WEIGHTED DISTINCT VOCAB — thousands of rows
    * regardless of corpus size, which is exactly how production BPE
    * trainers are structured. Each round counts adjacent symbol pairs
    * (weighted by word frequency), picks the most frequent (ties:
    * lexicographic (left, right) — fully deterministic), and rewrites the
    * vocab with a greedy left-to-right single-pass merge (an `aggregate`
    * HOF fold, no UDF). The driver holds one (l, r, freq) row per round
    * plus the ≤`nMerges`-row merge table — never the vocab.
    *
    * Returns (rank, left, right, pair_freq): the ordered merge table a
    * tokenizer applies at encode time. Stops early when no pair reaches
    * `minPairFreq`.
    */
  def bpeMerges(df: DataFrame, textCol: String, nMerges: Int,
                minPairFreq: Long = 2L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // corpus-scale phase: weighted distinct vocab, words split to chars
    var vocab = df
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(split(col("w"), "").as("syms"), col("cnt"))
      .localCheckpoint() // truncate: each round folds over the LAST vocab
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val best = vocab
        .select(explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      best.headOption.filter(_.getLong(2) >= minPairFreq) match {
        case None => done = true
        case Some(row) =>
          val (l, r, freq) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += ((rank, l, r, freq))
          // greedy left-to-right single-pass rewrite: a fresh merge result
          // does NOT immediately re-pair with the next symbol (standard
          // BPE semantics for one round); overlapping runs like "aaa"
          // therefore merge to [aa, a]
          vocab = vocab.select(
            aggregate(col("syms"), array().cast("array<string>"),
              (acc, s) =>
                // try_element_at: null (not an ANSI error) on the empty acc
                when(try_element_at(acc, lit(-1)) === lit(l) && s === lit(r),
                  concat(slice(acc, lit(1), size(acc) - 1),
                    array(lit(l + r))))
                  .otherwise(concat(acc, array(s)))).as("syms"),
            col("cnt"))
            .localCheckpoint()
          rank += 1
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_freq")
  }

  /** The per-word BPE encode kernel: apply an ORDERED merge table to one
    * word's code-point symbols, one greedy left-to-right single pass per
    * rank — EXACTLY the fold `bpeMerges` rewrites its vocab with, so
    * encoding a corpus with its own learned table reproduces the
    * trainer's final segmentation. This is Sennrich's original
    * apply-in-learned-order encode; the min-rank-present variant some
    * tokenizers use (repeatedly merge the lowest-rank pair PRESENT)
    * differs only when a merge creates a pair of strictly lower rank —
    * e.g. merges [(c,ab),(a,b)] on "cab": in-order yields [c, ab] (rank 0
    * runs before ab exists), min-rank-present yields [cab]. The in-order
    * form is the one a SQL oracle can replay as a finite fold chain
    * (spec-pinned divergence example in BpeEncodeSpec).
    *
    * Cost: a piece-count map lets a rank be skipped in O(1) when its left
    * or right piece is absent from the word, so a pass costs O(len) only
    * for ranks that can fire — O(M + fired·len) per word, not O(M·len).
    * Symbols are full code points (matches DuckDB's character split; on
    * the ASCII corpus these coincide with Java chars).
    */
  private[graft] def encodeWord(w: String,
                                merges: IndexedSeq[(String, String)]): Array[String] = {
    var syms = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      syms += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    if (syms.length <= 1) return syms.toArray
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    syms.foreach(s => counts.update(s, counts.getOrElse(s, 0) + 1))
    merges.foreach { case (l, r) =>
      val canFire =
        if (l == r) counts.getOrElse(l, 0) >= 2
        else counts.getOrElse(l, 0) >= 1 && counts.getOrElse(r, 0) >= 1
      if (canFire && syms.length >= 2) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        syms.foreach { s =>
          if (out.nonEmpty && out.last == l && s == r) {
            // merge: the fresh piece does NOT immediately re-pair with the
            // next symbol within this rank (out.last becomes l+r != l)
            out(out.length - 1) = l + r
            counts.update(l, counts(l) - 1)
            counts.update(r, counts(r) - 1)
            counts.update(l + r, counts.getOrElse(l + r, 0) + 1)
          } else out += s
        }
        syms = out
      }
    }
    syms.toArray
  }

  /** BPE encode — tokenizer APPLICATION as a pipeline op, the inverse
    * half of `bpeMerges` (tokenizer training): segment every document
    * with an ordered merge table and return the in-order piece array plus
    * the EXACT token count — what packing (`packBins`), budget selection
    * and context-length accounting need in place of the whitespace/regex
    * approximations.
    *
    * Spark-first cost split (the trainer's argument in reverse): the
    * merge loop runs over the DISTINCT WORD VOCAB — corpus-size-
    * independent — via one `mapPartitions` kernel with the merge table in
    * a broadcast (the word→pieces cache every production tokenizer keeps,
    * materialized as a relation); documents then re-acquire their words'
    * piece arrays through ONE equi-join on the word. AQE broadcasts the
    * encoded vocab while it is small; at web-corpus vocab sizes it is a
    * shuffle on the word, where a hot stopword skews only the join INPUT
    * (each word row matches exactly one vocab row — no bucket blow-up).
    * Reassembly is one collect_list keyed by the data-scale doc id (one
    * document's word list per buffer — the packBins grain).
    *
    * Returns (idCol, enc_tokens array<string>, n_tokens int); documents
    * with no words (empty/whitespace text) keep an empty array.
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    require(merges.forall(m => m._1.nonEmpty && m._2.nonEmpty),
      "bpeEncode: merge sides must be non-empty")
    Seq("enc_tokens", "n_tokens").foreach(c => require(!df.columns.contains(c),
      s"bpeEncode emits '$c'; input must not contain it"))
    val spark = df.sparkSession
    val words = df
      .select(col(idCol).as("__id"),
        posexplode(tokens(col(textCol))).as(Seq("__wpos", "__w")))
      .filter(length(col("__w")) > 0)
    val vocab = words.select(col("__w")).distinct()
    val mergesB = spark.sparkContext.broadcast(merges.toIndexedSeq)
    val encSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__w",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("__pieces",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))))
    val enc = org.apache.spark.sql.Encoders.row(encSchema)
    val encoded = vocab.mapPartitions { rows =>
      val m = mergesB.value
      rows.map { r =>
        val w = r.getString(0)
        org.apache.spark.sql.Row(w, encodeWord(w, m).toSeq)
      }
    }(enc)
    val perDoc = words.join(encoded, "__w")
      .groupBy(col("__id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__wpos"), col("__pieces")))),
        s => s.getField("__pieces"))).as("enc_tokens"))
      .withColumnRenamed("__id", idCol)
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("enc_tokens"), array().cast("array<string>")).as("enc_tokens"))
      .withColumn("n_tokens", size(col("enc_tokens")))
  }

  /** All single-deletion variants of `w` as an array column — pure HOF
    * (transform over sequence + substr), no UDF.
    */
  private def del1(w: Column): Column =
    transform(sequence(lit(1), length(w)),
      p => concat(w.substr(lit(1), p - 1), w.substr(p + 1, length(w))))

  /** The ≤`maxEdit`-deletion neighborhood of `w` (including `w` itself),
    * distinct — the symmetric-deletion candidate key set.
    */
  private def delNeighborhood(w: Column, maxEdit: Int): Column = {
    val d1 = array_distinct(concat(array(w), del1(w)))
    if (maxEdit == 1) d1
    else array_distinct(flatten(transform(d1, v =>
      concat(array(v), transform(sequence(lit(1), length(v)),
        p => concat(v.substr(lit(1), p - 1), v.substr(p + 1, length(v))))))))
  }

  /** Edit-distance similarity self-join: all distinct-value pairs of
    * `strCol` within Levenshtein distance `maxEdit` (1 or 2) — typo/
    * variant detection over a label or word vocabulary (near-identical
    * source tags, OCR/typo word forms, entity aliases), the verification
    * join edit-distance dedup needs at scale.
    *
    * Scale design — symmetric-deletion candidate generation (the SymSpell
    * scheme, rediscoverable from the alignment argument): if
    * ED(a,b) ≤ k then deleting each aligned substitution/insertion
    * position leaves a COMMON string reachable by ≤ k deletions from
    * both sides. So each distinct value emits its ≤-k-deletion
    * neighborhood (×(len+1) rows for k=1, ×O(len²) for k=2 — linear in
    * vocab size either way), candidates are pairs sharing a variant —
    * an equi-join on the variant, never an all-pairs product — and a
    * per-pair Levenshtein verifies. The variant join is naturally
    * skew-bounded: a variant string v can only be reached from the
    * ≤ (|v|+1)·|Σ| + |v| + 1 strings within k=1 insert/substitute
    * range of v (alphabet-bounded, corpus-independent), so no hot-bucket
    * cap is needed — unlike LSH band buckets, bucket membership is
    * capped by construction. The whole op runs on the DISTINCT value
    * relation: corpus-grain rows never enter the join.
    *
    * `maxLen` drops over-long values before variant generation (the
    * per-value cost is O(len²)–O(len⁴); edit distance on unbounded
    * documents is the wrong tool — chunk or fingerprint those instead).
    * ASCII/BMP note: `length`/`substr`/`levenshtein` all count chars.
    *
    * Returns (w1, w2, dist) with w1 < w2, each pair once.
    */
  def editNeighbors(df: DataFrame, strCol: String, maxEdit: Int = 1,
                    maxLen: Int = 64): DataFrame = {
    require(maxEdit == 1 || maxEdit == 2,
      s"editNeighbors: maxEdit must be 1 or 2, got $maxEdit")
    // the distinct-value relation feeds BOTH sides of the self-join:
    // materialize once (DESIGN §8.1 two-consumer rule) or the corpus
    // scan + distinct aggregation run twice. The variant Generate still
    // runs per side, but over the cached vocab — no corpus re-scan.
    val vals = graft.Cleanup.register(
      df.select(col(strCol).as("__w"))
        .filter(length(col("__w")) > 0 && length(col("__w")) <= maxLen)
        .distinct()
        .localCheckpoint(false))
    val cand = vals.select(col("__w"),
      explode(delNeighborhood(col("__w"), maxEdit)).as("__v"))
    cand.as("a").join(cand.as("b"),
        col("a.__v") === col("b.__v") && col("a.__w") < col("b.__w"))
      .select(col("a.__w").as("w1"), col("b.__w").as("w2"))
      .distinct()
      .withColumn("dist", levenshtein(col("w1"), col("w2")))
      .filter(col("dist") <= maxEdit)
      .select(col("w1"), col("w2"), col("dist").cast("int").as("dist"))
  }

  /** The deletion-variant index of a reference dictionary, built once per
    * snapshot (the crossCorpusBuild seam convention): (__v variant,
    * __w reference value) over the reference's distinct values. Persist
    * as a table in production; probe it with `editNeighborsWith`. The
    * probe MUST use the same `maxEdit` the index was built with — the
    * completeness guarantee needs ≤k deletions on BOTH sides.
    */
  def editIndexBuild(reference: DataFrame, strCol: String, maxEdit: Int = 1,
                     maxLen: Int = 64): DataFrame = {
    require(maxEdit == 1 || maxEdit == 2,
      s"editIndexBuild: maxEdit must be 1 or 2, got $maxEdit")
    reference.select(col(strCol).as("__w"))
      .filter(length(col("__w")) > 0 && length(col("__w")) <= maxLen)
      .distinct()
      .select(col("__w"), explode(delNeighborhood(col("__w"), maxEdit)).as("__v"))
  }

  /** Cross-corpus edit-distance probe: each of `df`'s distinct values
    * paired with every reference-dictionary value within Levenshtein
    * `maxEdit` — "which incoming labels/words are typo-variants of known
    * ones", the spell-correction/alias-resolution production shape. The
    * join is stream-static safe (the index is a fixed relation; the probe
    * side is a projection + explode + equi-join), and dist = 0 rows mean
    * the value is already in the dictionary — callers keep or drop them.
    * Returns (w_new, w_ref, dist), each pair once.
    */
  def editNeighborsWith(df: DataFrame, index: DataFrame, strCol: String,
                        maxEdit: Int = 1, maxLen: Int = 64): DataFrame = {
    require(maxEdit == 1 || maxEdit == 2,
      s"editNeighborsWith: maxEdit must be 1 or 2, got $maxEdit")
    val cand = df.select(col(strCol).as("__wn"))
      .filter(length(col("__wn")) > 0 && length(col("__wn")) <= maxLen)
      .distinct()
      .select(col("__wn"), explode(delNeighborhood(col("__wn"), maxEdit)).as("__v"))
    cand.join(index, "__v")
      .select(col("__wn").as("w_new"), col("__w").as("w_ref")).distinct()
      .withColumn("dist", levenshtein(col("w_new"), col("w_ref")))
      .filter(col("dist") <= maxEdit)
      .select(col("w_new"), col("w_ref"), col("dist").cast("int").as("dist"))
  }

  /** Distinct (id, gram) relation shared by the novelty ops: word
    * `n`-gram shingles (the tfidfSimJoin construction — short docs yield
    * their single truncated gram, so every document owns ≥ 1 gram and
    * the ops are total without a corpus re-join). `hashGrams` swaps gram
    * strings for xxhash64 longs before any exchange — the production
    * keying; distinct-counts and min-id attribution are unchanged absent
    * a 64-bit collision.
    */
  private def docGrams(df: DataFrame, idCol: String, textCol: String,
                       n: Int, hashGrams: Boolean): DataFrame = {
    val grams = df
      .select(col(idCol).as("__id"),
        tokens(coalesce(col(textCol), lit(""))).as("__w"))
      .select(col("__id"), explode(transform(
        sequence(lit(1), greatest(size(col("__w")) - (n - 1), lit(1))),
        i => array_join(slice(col("__w"), i, lit(n)), " "))).as("__g"))
    (if (hashGrams) grams.select(col("__id"), xxhash64(col("__g")).as("__g"))
     else grams).distinct()
  }

  /** Gram-novelty attribution: how much genuinely-new n-gram content each
    * document contributes to the corpus, with first occurrence awarded to
    * the LOWEST id (at 100 TB the id is the crawl-order key — ingestion
    * timestamps compose the same way). The per-doc novelty ratio
    * n_novel/n_grams is the dedup-aware selection signal: boilerplate-
    * heavy documents score near 0 even when no single document duplicates
    * them outright (pairwise near-dup misses M-way shared fragments;
    * novelty charges each repeated gram to exactly one owner).
    *
    * Scale shape — two independent aggregation trees, no gram-side join:
    * distinct (id, gram) → (a) groupBy id = n_grams, (b) groupBy gram →
    * min(id) → groupBy that id = n_novel. Both finish at id-grain hash-
    * partitioned on the id, so the final combine join is exchange-free;
    * a viral gram costs one partial-min cell, never a bucket fan-out.
    *
    * Returns (idCol, n_grams, n_novel) — distinct grams in the doc, and
    * how many of them first appear there.
    */
  def gramNovelty(df: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, hashGrams: Boolean = false): DataFrame = {
    // both aggregation trees consume the distinct (id, gram) relation:
    // materialize it once (DESIGN §8.1) — without this the corpus is
    // tokenized and distinct-aggregated twice
    val dg = graft.Cleanup.register(
      docGrams(df, idCol, textCol, n, hashGrams).localCheckpoint(false))
    val nGrams = dg.groupBy(col("__id")).agg(count(lit(1)).as("n_grams"))
    val nNovel = dg.groupBy(col("__g")).agg(min(col("__id")).as("__id"))
      .groupBy(col("__id")).agg(count(lit(1)).as("n_novel"))
    nGrams.join(nNovel, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
  }

  /** The seen-gram artifact for incremental novelty: the reference
    * corpus' distinct gram keys, written once per snapshot (the
    * crossCorpusBuild convention — Dedup.scala). Persist `hashGrams =
    * true` in production: the artifact is then 8 bytes per distinct gram.
    */
  def noveltyBuild(reference: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, hashGrams: Boolean = false): DataFrame =
    docGrams(reference, idCol, textCol, n, hashGrams)
      .select(col("__g")).distinct()

  /** Incremental gram novelty: novelty of a NEW batch against a prior
    * seen-gram artifact — a gram is novel only if it is absent from the
    * artifact AND first-within-batch. Folding ordered batches through
    * this (artifact grown by each batch's grams) reproduces the one-shot
    * `gramNovelty` of the union exactly (spec-pinned): min-id attribution
    * distributes over batches when ids are batch-monotone. The artifact
    * probe is a left-anti join on the gram key — stream-static safe, no
    * state beyond the artifact itself.
    */
  def gramNoveltyWith(batch: DataFrame, seen: DataFrame, idCol: String,
                      textCol: String, n: Int = 3,
                      hashGrams: Boolean = false): DataFrame = {
    val dgRaw = docGrams(batch, idCol, textCol, n, hashGrams)
    // two consumers (DESIGN §8.1); skip the checkpoint only for a
    // streaming micro-batch driver that materializes per batch anyway
    val dg = if (batch.isStreaming) dgRaw
      else graft.Cleanup.register(dgRaw.localCheckpoint(false))
    val nGrams = dg.groupBy(col("__id")).agg(count(lit(1)).as("n_grams"))
    val nNovel = dg.join(seen.select(col("__g")), Seq("__g"), "left_anti")
      .groupBy(col("__g")).agg(min(col("__id")).as("__id"))
      .groupBy(col("__id")).agg(count(lit(1)).as("n_novel"))
    nGrams.join(nNovel, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
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
