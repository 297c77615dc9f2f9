package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dedup partition: tokenization/shingling primitives, the 128-bit content fingerprint, and exact dedup (batch + streaming).
  * See [[Dedup]].
  */
trait DedupExact { self: Dedup.type =>

  /** Whitespace tokenization shared by the shingle-based ops. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram shingles (distinct), the unit of Jaccard similarity —
    * native expression (graft.functions.ShingleNGrams), semantics identical
    * to `array_distinct(transform(sequence(0, greatest(size-n, 0)),
    * i -> array_join(slice(w, i+1, n), " ")))`.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.VectorFunctions.shingleNGrams(tokens(text), n)

  /** 128-bit content fingerprint as TWO long columns: two 64-bit xxhash64
    * draws (the second salts the input with a constant, giving an
    * independent-in-practice second hash). Used as the dedup
    * shuffle/grouping key so wide payloads are never the exchange's
    * sort/compare key. Two flat longs rather than one struct because
    * struct grouping keys force SortAggregate; flat fixed-width keys keep
    * the codegen'd HashAggregate path. Collision probability for n
    * distinct values is ~n²/2¹²⁹ — at 10¹² documents that is <1e-14,
    * below the hardware-error floor; the standard trade for content-hash
    * dedup at scale.
    */
  def contentFingerprint(c: Column): Seq[Column] =
    Seq(xxhash64(c), xxhash64(lit(0x9E3779B97F4A7C15L), c))

  // withColumn REPLACES a same-named existing column — a caller column
  // named __h1/__h2 would be silently overwritten and dropped. Fail loudly.
  private def requireNoTempCols(df: DataFrame): Unit =
    Seq("__h1", "__h2").foreach(c => require(!df.columns.contains(c),
      s"exact dedup uses '$c' as a temp fingerprint column; input must not contain it"))

  /** Exact duplicate groups: one row per distinct `col`, with the keeper
    * (min id) and the duplicate count. The grouping/shuffle KEY is the
    * 128-bit contentFingerprint; the value itself travels only as an
    * aggregation payload (min(col), one copy per distinct value per
    * partition after map-side partial aggregation) because the output
    * includes it — exchanges compare/sort 16-byte keys, not wide text.
    * The string-typed min() buffer does force sort-based aggregation
    * (HashAggregate needs fixed-width buffers), but the sort key is the
    * two longs; `exactDedup` below, whose keeper selection drops the
    * payload entirely, keeps the codegen'd HashAggregate path — prefer it
    * when the representative value isn't needed.
    */
  def exactDupGroups(df: DataFrame, on: String, idCol: String): DataFrame = {
    requireNoTempCols(df)
    val Seq(h1, h2) = contentFingerprint(col(on))
    df.groupBy(h1.as("__h1"), h2.as("__h2"))
      .agg(min(col(on)).as(on), min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))
      .drop("__h1", "__h2")
  }

  /** Dedup survivorship census — the "what did dedup do to my
    * distribution" monitor: per quality-score decile bucket, how many
    * documents existed, survived the exact keep-min-id dedup, and were
    * dropped. Duplicates concentrate in specific quality regimes
    * (boilerplate is mid-quality, spam is low), so a dedup pass SHIFTS the
    * quality mix; this census is the before/after evidence a curation
    * pipeline reviews instead of trusting that the cut was neutral
    * (feed two snapshots to `Analytics.scoreDrift` for the formal test).
    *
    * Shape: one `qualityScore` scan, the `exactDedup` keeper plan
    * (fingerprint-keyed — payloads never shuffle), an id-only indicator
    * join, and a ≤11-key aggregate. The bucket is round(score·10) — both
    * engines derive it from the same 2-dp double, so the integer census
    * hash-compares; kept_share is one IEEE divide of exact counts.
    */
  def dedupSurvivorship(df: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val scored = TextAnalysis.qualityScore(df.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), round(col("quality_score") * 10).cast("int").as("bucket"))
    val keepers = exactDedup(df.select(col(idCol), col(textCol)), textCol, idCol)
      .select(col(idCol)).withColumn("__kept", lit(1L))
    scored.join(keepers, Seq(idCol), "left")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_total"),
        sum(coalesce(col("__kept"), lit(0L))).as("n_kept"))
      .withColumn("n_dropped", col("n_total") - col("n_kept"))
      .withColumn("kept_share_r",
        round(col("n_kept").cast("double") / col("n_total").cast("double"), 4))
  }

  /** Streaming exact dedup: first-seen-wins within the watermark horizon.
    * State is bounded by the watermark (old keys expire), so this runs
    * indefinitely at scale — the streaming counterpart of `exactDedup`.
    */
  def streamingExactDedup(df: DataFrame, tsCol: String, watermark: String,
                          cols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(cols)

  /** Exact dedup keeping the smallest id per duplicate group — the
    * deterministic flavor of `dropDuplicates` (whose survivor choice is
    * otherwise arbitrary). For streams, use
    * `streamingExactDedup` instead.
    */
  def exactDedup(df: DataFrame, on: String, idCol: String): DataFrame = {
    // keeper selection never touches the payload: both the groupBy and the
    // semi join key on (fingerprint, id) — the wide column rides along only
    // on the left (kept-rows) side, as it must.
    requireNoTempCols(df)
    val Seq(h1, h2) = contentFingerprint(col(on))
    val keepers = df.select(h1.as("__h1"), h2.as("__h2"), col(idCol))
      .groupBy(col("__h1"), col("__h2")).agg(min(col(idCol)).as(idCol))
    // merge-pinned (round 16): the keeper relation is corpus-derived
    // (one row per distinct value — grows with the corpus), so it must
    // never ride an AQE broadcast estimate (the containmentPairs
    // round-14 rule; CorpusJoinHintSpec flags it now that curation's
    // checkpointed input puts this join in the sweep's scope)
    df.withColumn("__h1", h1).withColumn("__h2", h2)
      .join(keepers.hint("merge"), Seq("__h1", "__h2", idCol), "leftsemi")
      .drop("__h1", "__h2")
  }

  /** The build-once reference artifact for cross-corpus EXACT dedup: the
    * reference snapshot's distinct 128-bit content fingerprints — the
    * smallest possible representation of "what the training set already
    * contains verbatim" (16 bytes per distinct value, no payloads).
    * Completes the seam convention for the exact family: near-dup,
    * containment, embedding, image and video all had Build/With forms;
    * exact cross-corpus was the missing (and simplest) one.
    */
  case class ExactIndex(refFps: DataFrame) {
    def persist(): this.type = { refFps.persist(); this }
    def unpersist(): this.type = { refFps.unpersist(); this }
  }

  /** Fingerprint the reference once — distinct (\_\_h1, \_\_h2) pairs. */
  def exactBuild(reference: DataFrame, on: String): ExactIndex = {
    requireNoTempCols(reference)
    val Seq(h1, h2) = contentFingerprint(col(on))
    ExactIndex(reference.select(h1.as("__h1"), h2.as("__h2")).distinct())
  }

  /** Cross-corpus exact dedup against a PREBUILT fingerprint artifact:
    * KEEP the new-batch rows whose `on` value is NOT verbatim-present in
    * the reference (one anti join on the 16-byte keys — the new batch's
    * payloads never shuffle; with the artifact under ~1 GB the join
    * broadcasts and the batch side doesn't move at all). Trivially
    * batch-invariant: each row's keep/drop depends only on its own
    * fingerprint vs the frozen artifact.
    */
  def exactDedupWith(corpus: DataFrame, index: ExactIndex, on: String): DataFrame = {
    requireNoTempCols(corpus)
    val Seq(h1, h2) = contentFingerprint(col(on))
    corpus.withColumn("__h1", h1).withColumn("__h2", h2)
      .join(index.refFps, Seq("__h1", "__h2"), "leftanti")
      .drop("__h1", "__h2")
  }

  /** The flag form: new-batch ids whose value IS verbatim-present in the
    * reference (one semi join) — what a decontamination report lists.
    */
  def exactFlagsWith(corpus: DataFrame, index: ExactIndex, on: String,
                     idCol: String): DataFrame = {
    requireNoTempCols(corpus)
    val Seq(h1, h2) = contentFingerprint(col(on))
    corpus.select(col(idCol), h1.as("__h1"), h2.as("__h2"))
      .join(index.refFps, Seq("__h1", "__h2"), "leftsemi")
      .select(col(idCol))
  }

  /** STREAMING cross-corpus exact dedup: the same anti join, stream-static
    * — completely STATELESS (no watermark, no state store, no output
    * dedup needed: each row's verdict is its own fingerprint lookup), so
    * it filters an unbounded ingest stream at scan speed. The strongest
    * form of the streaming-twin convention: the batch call IS the
    * streaming call.
    */
  def streamingExactDedupWith(stream: DataFrame, index: ExactIndex, on: String): DataFrame =
    exactDedupWith(stream, index, on)
}
