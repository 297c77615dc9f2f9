package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TextAnalysis partition: the per-row core — tokenization, language ID,
  * quality features, fingerprinting, normalization, chunking, PII, and
  * repetition. Pure Catalyst expressions (scan-speed, shuffle-free).
  * One of six cohesive partitions mixed into [[TextAnalysis]]; the
  * object is the single public surface.
  */
trait TextCore { self: TextAnalysis.type =>

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
}
