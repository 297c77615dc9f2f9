package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  * Extension surface beyond the reference (SURVEY §2.3) — the reference
  * routes messages and never compares them to each other.
  *
  * Scale notes (100 TB):
  *   - exact dedup groups on a 128-bit content fingerprint, NOT the full
  *     text, so exchange keys are 16 bytes and keeper selection never
  *     shuffles payloads;
  *   - MinHash/SimHash banding bounds the candidate-join fan-out: only rows
  *     sharing a band bucket meet, so the shuffle is O(rows × bands) small
  *     fixed-width keys and the join never goes quadratic unless the data
  *     is pathologically self-similar (mitigate with bucket-size caps);
  *   - all ops are pure DataFrame transforms — no driver-side state, no
  *     collect; AQE handles skewed buckets.
  */
object Dedup {

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
    df.withColumn("__h1", h1).withColumn("__h2", h2)
      .join(keepers, Seq("__h1", "__h2", idCol), "leftsemi")
      .drop("__h1", "__h2")
  }

  /** MinHash signature as an array<long> column: for shingle set S,
    * sig[j] = min over s∈S of ((a_j * xxhash64(s) + b_j) mod p).
    * Pure higher-order functions — the per-row cost is k×|S| multiplies,
    * no UDF, no shuffle.
    */
  def minHashSignature(shingleCol: Column, k: Int, p: Long = 2147483647L): Column =
    graft.functions.VectorFunctions.minHashSig(shingleCol, k, p)

  /** MinHash + LSH banding: emits (band, bucket, id) rows; ids sharing a
    * (band, bucket) are near-dup candidates. bands × rowsPerBand = k.
    */
  def lshBuckets(df: DataFrame, idCol: String, textCol: String,
                 shingleN: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = df.select(col(idCol).as("id"),
      minHashSignature(shingles(col(textCol), shingleN), k).as("sig"))
    sigBandBuckets(sigs, bands, rowsPerBand).withColumnRenamed("id", idCol)
  }

  /** Banding over an existing (id, sig) relation: one (band, bucket, id)
    * row per band, bucket = hash of that band's signature slice. Shared by
    * `lshBuckets` (signature inline) and `minHashEstimatedPairs`
    * (signature materialized once, reused for the estimate).
    */
  private[ops] def sigBandBuckets(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sigs
      .select(
        col("id"),
        explode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b => struct(b.as("band"), xxhash64(array_join(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), ",")).as("bucket")),
          )
        ).as("bb"),
      )
      .select(col("id"), col("bb.band"), col("bb.bucket"))

  /** Candidate near-dup pairs from MinHash LSH (distinct id pairs, a<b) —
    * banding via `lshBuckets`, pair generation via the shared
    * `bucketCandidatePairs` core below.
    */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                        maxBucketSize: Int = 0): DataFrame =
    bucketCandidatePairs(
      lshBuckets(df, idCol, textCol, shingleN, bands, rowsPerBand)
        .withColumnRenamed(idCol, "id"),
      maxBucketSize)

  /** Distinct candidate id pairs (id_a < id_b) from (band, bucket, id)
    * rows — the banding-join core shared by MinHash LSH and sign-bit
    * embedding LSH (Similarity.cosineNearDupLsh). The join is
    * band-bucket-local: shuffle key (band, bucket) keeps it linear in
    * bucket volume; `maxBucketSize` (0 = off) drops buckets larger than
    * the cap before pair generation — the guard against pathologically
    * self-similar corpora where one bucket would otherwise go quadratic
    * (members of a dropped bucket still meet through their other bands
    * unless they collide everywhere).
    */
  private[ops] def bucketCandidatePairs(bucketed: DataFrame, maxBucketSize: Int): DataFrame = {
    val bounded =
      if (maxBucketSize <= 0) bucketed
      else {
        val sizes = bucketed.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__bsz"))
          .filter(col("__bsz") <= maxBucketSize)
        bucketed.join(sizes.select(col("band"), col("bucket")), Seq("band", "bucket"), "leftsemi")
      }
    val l = bounded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = bounded.select(col("band"), col("bucket"), col("id").as("id_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Full MinHash near-dup pipeline: LSH candidates, then exact Jaccard
    * verification computed ONLY for candidate pairs (array_intersect on the
    * two shingle sets — O(candidates), never all-pairs). This is the
    * 100 TB-scale near-dup path; `jaccardPairs` below is the brute-force
    * oracle it is validated against in the spec suite.
    */
  def minHashNearDups(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    val cand = minHashCandidates(df, idCol, textCol, shingleN, bands, rowsPerBand)
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Cross-corpus near-duplicate detection: flag documents in `corpus`
    * (the fresh crawl) whose shingle Jaccard with ANY document in
    * `reference` (the existing training set) reaches `threshold` —
    * dedup-the-new-data-against-what-you-already-have, the asymmetric
    * sibling of `minHashNearDups`' full-corpus self-sweep. Both sides
    * band identically (same signature kernel, same band hashing), the
    * candidate join is (band, bucket)-local reference×corpus — no
    * self-pairs, no a<b halving — and exact Jaccard verifies candidates
    * only. Output is one row per flagged corpus doc with its best
    * reference match (ties: highest Jaccard, then smallest reference id
    * — a lexicographic struct max, one map-side-partial hash agg), so
    * the consumer anti-joins it to keep the clean remainder; the
    * reference side is never rewritten.
    *
    * 100 TB notes: the reference is usually the big side and changes
    * slowly — its (band, bucket, id) relation and shingle sets are
    * build-once artifacts persisted across crawl batches:
    * `crossCorpusBuild` + `crossCorpusNearDupsWith` below ARE that seam
    * (this raw-DataFrame form re-derives them per plan — correct, and
    * fine when the reference is small, but rebanding 100 TB per crawl
    * would dominate the whole job). Shuffle keys are (band, bucket) and
    * ids, never payloads; `maxBucketSize` (0 = off) drops degenerate
    * buckets by COMBINED membership before pair generation, same guard
    * as `bucketCandidatePairs` — wire it non-zero in production: one
    * boilerplate bucket of B members is B²·bands candidate pairs (the
    * sizing rule and the planted-hot-bucket probe live in DESIGN §11).
    */
  def crossCorpusNearDups(corpus: DataFrame, reference: DataFrame,
                          idCol: String, textCol: String,
                          shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                          threshold: Double = 0.5, maxBucketSize: Int = 0): DataFrame =
    crossCorpusNearDupsWith(corpus,
      crossCorpusBuild(reference, idCol, textCol, shingleN, bands, rowsPerBand),
      idCol, textCol, threshold, maxBucketSize)

  /** The build-once reference artifact for cross-corpus near-dedup: the
    * (band, bucket, id_ref) LSH relation and the (id_ref, shingles)
    * verification relation, plus the banding parameters they were built
    * with (a query banded differently would never collide). In production
    * both DataFrames are persisted/written ONCE per reference snapshot
    * (parquet keyed by (band, bucket) / id_ref) and every crawl batch
    * reads them — `persist()` below is the in-session form the ScaleProbe
    * exercises across two batches.
    */
  case class CrossCorpusIndex(refBuckets: DataFrame, refShingles: DataFrame,
                              shingleN: Int, bands: Int, rowsPerBand: Int) {
    def persist(): this.type = { refBuckets.persist(); refShingles.persist(); this }
    def unpersist(): this.type = { refBuckets.unpersist(); refShingles.unpersist(); this }
  }

  /** Band + shingle the reference corpus once — the expensive
    * per-reference-snapshot half of cross-corpus dedup (the
    * `ivfBuild`/`ivfQuery` seam; rebanding 100 TB of reference per crawl
    * batch is the cost this split exists to avoid).
    */
  def crossCorpusBuild(reference: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3, bands: Int = 16,
                       rowsPerBand: Int = 4): CrossCorpusIndex =
    CrossCorpusIndex(
      lshBuckets(reference, idCol, textCol, shingleN, bands, rowsPerBand)
        .select(col("band"), col("bucket"), col(idCol).as("id_ref")),
      reference.select(col(idCol).as("id_ref"),
        shingles(col(textCol), shingleN).as("sh_r")),
      shingleN, bands, rowsPerBand)

  /** Cross-corpus near-dedup against a PREBUILT reference index — the
    * per-batch half: band the (small) fresh batch, probe the artifact's
    * (band, bucket) relation, exact-verify candidates against the
    * artifact's shingle sets. Work is linear in the batch, not the
    * reference. Semantics identical to `crossCorpusNearDups`
    * (spec-pinned artifact-path == raw-path).
    *
    * `maxBucketSize` counts REFERENCE-side membership only, which makes
    * the keep/drop decision batch-invariant — splitting a crawl into
    * micro-batches can never flip a bucket that the one-shot run keeps
    * (a combined count would shrink with each split) — and bounds every
    * kept bucket's fan-out at `maxBucketSize` reference rows per new
    * row: candidates <= |batch| x bands x cap, linear in the batch even
    * against a degenerate self-similar reference.
    */
  def crossCorpusNearDupsWith(corpus: DataFrame, index: CrossCorpusIndex,
                              idCol: String, textCol: String,
                              threshold: Double = 0.5,
                              maxBucketSize: Int = 0): DataFrame = {
    val nb = lshBuckets(corpus, idCol, textCol,
        index.shingleN, index.bands, index.rowsPerBand)
      .select(col("band"), col("bucket"), col(idCol).as("id_new"))
    val rb = index.refBuckets
    val (nbB, rbB) =
      if (maxBucketSize <= 0) (nb, rb)
      else {
        // reference-side membership only: batch-invariant (see scaladoc)
        val hot = rb.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__bsz"))
          .filter(col("__bsz") > maxBucketSize)
          .select(col("band"), col("bucket"))
        (nb.join(hot, Seq("band", "bucket"), "leftanti"),
          rb.join(hot, Seq("band", "bucket"), "leftanti"))
      }
    val cand = nbB.join(rbB, Seq("band", "bucket"))
      .select(col("id_new"), col("id_ref")).distinct()
    val shN = corpus.select(col(idCol).as("id_new"),
      shingles(col(textCol), index.shingleN).as("sh_n"))
    cand.join(shN, "id_new").join(index.refShingles, "id_ref")
      .withColumn("__inter", size(array_intersect(col("sh_n"), col("sh_r"))))
      .withColumn("__jac", col("__inter").cast("double") /
        (size(col("sh_n")) + size(col("sh_r")) - col("__inter")))
      .filter(col("__jac") >= threshold)
      .groupBy(col("id_new"))
      .agg(max(struct(col("__jac").as("j"), (-col("id_ref")).as("ni"))).as("__best"))
      .select(col("id_new"), (-col("__best.ni")).as("matched_ref"),
        round(col("__best.j"), 4).as("best_jaccard"))
  }

  /** STREAMING near-duplicate candidate detection: MinHash-LSH banding as
    * a watermark-bounded stream-stream SELF-join — each arriving document
    * is banded into (band, bucket) keys and joined against other documents
    * whose buckets collided within ±`horizonSecs` of event time. The
    * watermark bounds both join state (Spark drops bucket rows older than
    * watermark − horizon) and the output-dedup state, so the query runs
    * indefinitely: this is online ingest dedup — catch the re-crawl/
    * re-post while it's arriving — versus the batch operator's full-corpus
    * sweep. Emits (ts, id_a, id_b) candidate pairs (id_a < id_b), deduped
    * across bands within the watermark; exact-verify downstream if LSH
    * precision isn't enough (same contract as `minHashCandidates`).
    *
    * 100 TB notes: state size is O(rows-in-horizon × bands) fixed-width
    * keys, partitioned by (band, bucket) — the same shuffle shape as the
    * batch join, just windowed; a hot bucket is a hot key (cap with
    * maxBucketSize upstream or shorten the horizon).
    */
  def streamingMinHashCandidates(docs: DataFrame, tsCol: String, idCol: String,
                                 textCol: String, watermark: String,
                                 horizonSecs: Long,
                                 shingleN: Int = 3, bands: Int = 16,
                                 rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    val sig = minHashSignature(shingles(col(textCol), shingleN), k)
    val bucketed = docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol).as("ts"), col(idCol).as("id"), sig.as("sig"))
      .select(col("ts"), col("id"),
        explode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b => struct(b.as("band"),
              xxhash64(array_join(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), ",")).as("bucket")),
          )
        ).as("bb"))
      .select(col("ts"), col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val l = bucketed.select(col("ts").as("ts_a"), col("id").as("id_a"),
      col("band").as("band_a"), col("bucket").as("bucket_a"))
    val r = bucketed.select(col("ts").as("ts_b"), col("id").as("id_b"),
      col("band").as("band_b"), col("bucket").as("bucket_b"))
    // the time-range condition is what lets Spark expire join state; the
    // id_a < id_b asymmetry emits each collision once per band
    val joined = l.join(r,
      col("band_a") === col("band_b") && col("bucket_a") === col("bucket_b") &&
        col("id_a") < col("id_b") &&
        col("ts_b").between(
          col("ts_a") - expr(s"INTERVAL $horizonSecs SECONDS"),
          col("ts_a") + expr(s"INTERVAL $horizonSecs SECONDS")))
    // band-level collisions collapse to one pair within the watermark —
    // ts_a keeps its event-time watermark through the join, so the dedup
    // state is bounded by the SAME watermark (re-declaring one downstream
    // of a stateful operator is disallowed)
    joined
      .select(col("ts_a").as("ts"), col("id_a"), col("id_b"))
      .dropDuplicatesWithinWatermark(Seq("id_a", "id_b"))
  }

  /** STREAMING cross-corpus near-dedup: each arriving document is banded
    * and joined against the STATIC reference corpus's (band, bucket)
    * relation, exact-Jaccard-verified against the reference shingle sets,
    * and emitted as a flagged (ts, id_new, id_ref, jaccard) row — online
    * ingest decontamination: drop the re-crawl against what you already
    * have WHILE it arrives, the streaming twin of `crossCorpusNearDups`
    * (which sweeps a finished batch). Every join here is stream-static —
    * the stream side never joins itself — so banding, candidate lookup
    * and verification are all STATELESS; the only state is the band-
    * collision dedup, bounded by the watermark. Emits pairs, not
    * best-per-doc: a best-match aggregate would hold per-doc state and
    * add nothing to the drop decision (any verified hit ≥ threshold
    * flags the doc); consumers needing one row per doc aggregate the
    * bounded per-watermark output downstream.
    *
    * 100 TB notes: the reference relations are the same build-once
    * artifacts the batch op uses — compute them ONCE per reference
    * snapshot with `crossCorpusBuild`, persist/write them, and hand the
    * index to `streamingCrossCorpusFlagsWith` for every micro-batch;
    * handing THIS function the raw reference DataFrame re-derives them
    * per plan (correct, but rebanding 100 TB per crawl stream is the
    * cost the artifact seam exists to avoid). Both are static DataFrames
    * re-read per micro-batch at worst, broadcast or shuffle-joined by
    * Catalyst on (band, bucket) / id_ref fixed-width keys.
    */
  def streamingCrossCorpusFlags(stream: DataFrame, reference: DataFrame,
                                tsCol: String, idCol: String, textCol: String,
                                watermark: String,
                                shingleN: Int = 3, bands: Int = 16,
                                rowsPerBand: Int = 4,
                                threshold: Double = 0.5): DataFrame =
    streamingCrossCorpusFlagsWith(stream,
      crossCorpusBuild(reference, idCol, textCol, shingleN, bands, rowsPerBand),
      tsCol, idCol, textCol, watermark, threshold)

  /** Streaming cross-corpus flags against a PREBUILT reference index —
    * the production form: the reference is banded/shingled once per
    * snapshot (`crossCorpusBuild`, persisted), and each micro-batch only
    * bands its own rows and probes the static relations. Semantics
    * identical to `streamingCrossCorpusFlags` (parity spec).
    */
  def streamingCrossCorpusFlagsWith(stream: DataFrame, index: CrossCorpusIndex,
                                    tsCol: String, idCol: String, textCol: String,
                                    watermark: String,
                                    threshold: Double = 0.5): DataFrame = {
    val k = index.bands * index.rowsPerBand
    val sig = minHashSignature(shingles(col(textCol), index.shingleN), k)
    val streamBucketed = stream
      .withWatermark(tsCol, watermark)
      .select(col(tsCol).as("ts"), col(idCol).as("id_new"),
        shingles(col(textCol), index.shingleN).as("sh_n"), sig.as("sig"))
      .select(col("ts"), col("id_new"), col("sh_n"),
        explode(
          transform(
            sequence(lit(0), lit(index.bands - 1)),
            b => struct(b.as("band"),
              xxhash64(array_join(slice(col("sig"), b * index.rowsPerBand + 1, lit(index.rowsPerBand)), ",")).as("bucket")),
          )
        ).as("bb"))
      .select(col("ts"), col("id_new"), col("sh_n"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    streamBucketed
      .join(index.refBuckets, Seq("band", "bucket")) // stream-static: no state
      .join(index.refShingles, "id_ref")             // stream-static: no state
      .withColumn("__inter", size(array_intersect(col("sh_n"), col("sh_r"))))
      .withColumn("jaccard", round(col("__inter").cast("double") /
        (size(col("sh_n")) + size(col("sh_r")) - col("__inter")), 4))
      .filter(col("jaccard") >= threshold)
      // band-level collisions collapse to one flagged pair; state bounded
      // by the stream's own watermark (ts flows through the static joins)
      .select(col("ts"), col("id_new"), col("id_ref"), col("jaccard"))
      .dropDuplicatesWithinWatermark(Seq("id_new", "id_ref"))
  }

  /** MinHash ESTIMATED Jaccard for every LSH candidate pair: the fraction
    * of agreeing signature lanes is an unbiased estimator of the true
    * Jaccard (stderr ≈ √(J(1−J)/k) ≈ 0.06 at k=64) — the
    * verification-FREE scale path. `minHashNearDups` verifies candidates
    * with an exact `array_intersect` over the full shingle sets, which at
    * 100 TB means joining wide shingle arrays back to every candidate; when
    * a ±0.1 similarity band is acceptable (corpus triage, cluster
    * pre-grouping, threshold sweeps), comparing two k-long signatures is
    * O(k) per pair with fixed-width rows — the shuffle carries k longs, not
    * documents. Output: every candidate pair with `jaccard_est` (rounded),
    * UNthresholded — thresholding an estimate is the caller's accuracy
    * trade to make. Deterministic (hash-seeded); accuracy is spec-pinned
    * against the exact Jaccard on the same pairs.
    */
  def minHashEstimatedPairs(df: DataFrame, idCol: String, textCol: String,
                            shingleN: Int = 3, bands: Int = 16,
                            rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    // ONE tokenize+sign pass over the corpus: Catalyst does not dedupe
    // canonically-identical projection subtrees across self-joins
    // (DESIGN.md §8), so the signature relation is materialized (lazy
    // localCheckpoint, drained by the harness via Cleanup) and feeds BOTH
    // the banding and the lane-agreement estimate — computing signatures
    // inside minHashCandidates AND again here would double the dominant
    // per-document cost, contrary to the operator's 100 TB motivation.
    val sigs = graft.Cleanup.register(
      df.select(col(idCol).as("id"),
        minHashSignature(shingles(col(textCol), shingleN), k).as("sig"))
        .localCheckpoint(false))
    val cand = bucketCandidatePairs(sigBandBuckets(sigs, bands, rowsPerBand), 0)
    cand
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("agree",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (s, x) => s + x))
      .select(col("id_a"), col("id_b"),
        round(col("agree").cast("double") / k, 4).as("jaccard_est"))
  }

  /** Exact n-gram Jaccard similarity for given id pairs (verification pass
    * after LSH, or standalone brute force on small inputs).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, shingleN: Int,
                   threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
    val ex = sh.select(col("id"), explode(col("sh")).as("g"))
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val inter = ex.as("a").join(ex.as("b"), col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "n" -> "na")), "id_a")
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "n" -> "nb")), "id_b")
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Duplicate clusters from near-dup PAIRS: connected components over the
    * pair graph, labeling every id with its component representative
    * (the minimum id reachable through any chain of near-dup links). Pair
    * detection alone can't drive "keep one copy" — near-dup is not
    * transitive, so A~B and B~C must collapse into ONE cluster {A,B,C}
    * even when A~C was never emitted.
    *
    * Algorithm: alternating large-star/small-star rounds [Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", 2014] — each round
    * rewrites the edge set with pure DataFrame joins/aggregations:
    *
    *   large-star: every node u links its LARGER neighbors to
    *     m(u) = min(Γ(u) ∪ {u});
    *   small-star: every node u links its smaller neighbors and itself to
    *     the min of its smaller neighborhood.
    *
    * Both steps preserve connectivity; the fixpoint is a disjoint union of
    * stars centered at component minima, reached in O(log n) rounds EVEN
    * FOR ONE GIANT COMPONENT (a diameter-d path halves its diameter per
    * round — plain min-label propagation needs O(d) rounds, which at 100 TB
    * turns one adversarial chain into thousands of shuffles; spec-pinned on
    * a 10k-node path). Per round the driver holds only a (count, hashsum)
    * convergence checksum; `localCheckpoint` truncates lineage and each
    * superseded round's blocks are freed eagerly.
    *
    * @param pairs (id_a, id_b) near-dup pairs (e.g. minHashNearDups)
    * @param ids   one row per document id — singletons label themselves
    * @return (id, cluster_rep); cluster_rep == id for non-duplicates
    */
  def duplicateClusters(pairs: DataFrame, ids: DataFrame, idCol: String): DataFrame =
    duplicateClustersWithRounds(pairs, ids, idCol)._1

  /** `duplicateClusters` + the number of star rounds it took to converge —
    * the spec suite pins the O(log n) bound on adversarial long chains.
    */
  def duplicateClustersWithRounds(pairs: DataFrame, ids: DataFrame,
                                  idCol: String): (DataFrame, Int) = {
    // canonical undirected edge set: (hi, lo) with hi > lo, deduped
    var edges = pairs
      .select(greatest(col("id_a"), col("id_b")).as("hi"),
        least(col("id_a"), col("id_b")).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct()
      .localCheckpoint(false)
    // one aggregation drives BOTH checkpoint materialization and the
    // convergence test: the canonical edge set is stable iff (count,
    // xor of per-edge hashes) is stable — a 64-bit content checksum
    // (bit_xor: order-insensitive, can't overflow under ANSI arithmetic,
    // and the edge set is distinct so nothing self-cancels). A checksum
    // match is then CONFIRMED with one exact set-difference join on the
    // final round only (equal counts + empty one-sided except ⇒ equal
    // sets, both sides distinct) — so a hash collision can cost an extra
    // round but can never declare a false fixpoint, and the exact join
    // runs ~once per clustering, not per round.
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(hi, lo))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = checksum(edges)
    var rounds = 0
    var stable = edges.isEmpty
    while (!stable) {
      rounds += 1
      require(rounds <= 100, s"duplicateClusters: no fixpoint after $rounds star rounds")
      // ---- large-star: for each u, link neighbors v > u to min(Γ(u) ∪ {u})
      val nbrs = edges.select(col("lo").as("u"), col("hi").as("v"))
        .union(edges.select(col("hi").as("u"), col("lo").as("v")))
      val mins = nbrs.groupBy(col("u")).agg(least(min(col("v")), first(col("u"))).as("m"))
      // m ≤ u < v, so emitted (v, m) is already canonical (hi > lo)
      val ls = nbrs.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
      // ---- small-star: for each hi, link itself and its smaller
      //      neighbors to the min of those neighbors
      val sMins = ls.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val withM = ls.join(sMins, Seq("hi"))
      val next = withM.select(col("hi"), col("m").as("lo"))
        .union(withM.filter(col("lo") =!= col("m"))
          .select(col("lo").as("hi"), col("m").as("lo")))
        .distinct()
        .localCheckpoint(false)
      val nextSig = checksum(next)
      stable = nextSig == sig && next.except(edges).isEmpty
      edges.unpersist() // superseded round's blocks freed NOW, not at GC
      edges = next
      sig = nextSig
    }
    // fixpoint = min-centered stars: every non-representative id appears in
    // exactly one (id, rep) edge; singletons and representatives label
    // themselves via the left join
    val reps = edges.select(col("hi").as("id"), col("lo").as("rep"))
    val labels = ids.select(col(idCol).as("id"))
      .join(reps, Seq("id"), "left")
      .select(col("id"), coalesce(col("rep"), col("id")).as("rep"))
    (labels, rounds)
  }

  /** Canonicalization — the step after clustering: pick ONE keeper per
    * duplicate cluster, the highest-scoring member with ties broken to the
    * smallest id (fully deterministic under any partitioning). A single
    * hash aggregation with `max_by` over the (score, −id) order key:
    * partial aggregation runs map-side, so the exchange carries at most
    * one candidate per (cluster × input partition) — never the raw
    * membership — which is why this beats a row_number window (full
    * per-cluster sort) at 100 TB.
    *
    * @param clusters (id, rep) labels from [[duplicateClusters]]
    * @param scored   idCol + scoreCol, one row per id (e.g. quality score)
    */
  def keepBest(clusters: DataFrame, scored: DataFrame,
               idCol: String, scoreCol: String): DataFrame =
    clusters
      .join(scored.select(col(idCol).as("id"), col(scoreCol)), "id")
      .groupBy(col("rep"))
      .agg(
        max_by(struct(col("id"), col(scoreCol)),
          struct(col(scoreCol), negate(col("id")))).as("__k"),
        count(lit(1)).as("cluster_size"))
      .select(col("rep").as("cluster_rep"),
        col("__k.id").as("keeper_id"),
        col(s"__k.$scoreCol").as("keeper_score"),
        col("cluster_size"))

  /** Build the duplicate-cluster assignment artifact — MinHash LSH
    * candidates verified by exact Jaccard, then connected components —
    * in ONE pass, as the dedup analogue of [[graft.ops.Similarity.ivfBuild]].
    * The (id, rep) assignment is the expensive once-per-corpus half of
    * dedup; every downstream consumer ([[clusterSizeHistogram]],
    * [[keepBest]], cluster listings, per-cluster sampling) is a cheap
    * aggregation over it. At 100 TB the build job writes this table to
    * parquet and consumers read it — nobody recomputes connected
    * components per report.
    */
  def clusterBuild(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                   threshold: Double = 0.5): DataFrame =
    duplicateClusters(
      minHashNearDups(docs, idCol, textCol, shingleN, bands, rowsPerBand, threshold),
      docs, idCol)

  /** Dedup impact report over a built cluster assignment: how much of the
    * corpus sits in singletons vs k-way duplicate clusters. Two hash
    * aggregations (assignment → per-rep size → size histogram), both with
    * map-side partials; output is ≤ max-cluster-size rows.
    */
  def clusterSizeHistogram(assign: DataFrame): DataFrame =
    assign.groupBy(col("rep")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))

  /** SimHash (64-bit) of the token multiset: per-bit vote of token hashes —
    * native expression (graft.functions.SimHash64), one pass over tokens.
    */
  def simHash(text: Column): Column =
    graft.functions.VectorFunctions.simHash64(tokens(text))

  /** SimHash near-dup pairs via the pigeonhole principle: split the 64-bit
    * hash into `maxHamming + 1` chunks — hamming ≤ maxHamming GUARANTEES at
    * least one chunk is equal, so recall is exact (not probabilistic). Join
    * per chunk (linear self-joins on small fixed-width keys), then exact
    * hamming filter with `bit_count`.
    */
  def simHashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val nChunks = maxHamming + 1
    val bitsPer = (64 + nChunks - 1) / nChunks
    val mask = (1L << bitsPer) - 1
    val withSim = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sim"))
    val chunks = withSim.select(
      col("id"), col("sim"),
      explode(
        transform(sequence(lit(0), lit(nChunks - 1)),
          c => struct(c.as("chunk"), call_function("shiftright", col("sim"), (c * bitsPer).cast("int")).bitwiseAND(lit(mask)).as("ck")))
      ).as("cc"),
    ).select(col("id"), col("sim"), col("cc.chunk"), col("cc.ck"))
    val l = chunks.select(col("chunk"), col("ck"), col("id").as("id_a"), col("sim").as("sim_a"))
    val r = chunks.select(col("chunk"), col("ck"), col("id").as("id_b"), col("sim").as("sim_b"))
    l.join(r, Seq("chunk", "ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

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
    val dupPerDoc = positioned.join(dupGrams, Seq("gram"), "leftsemi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_dup"), min(col("pos")).as("first_dup_pos"))
    base
      .select(col("id"), greatest(size(col("w")) - (n - 1), lit(0)).as("n_grams"))
      .join(dupPerDoc, Seq("id"), "left")
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
    val covered = positioned.join(index.dupGrams, Seq("gram"), "leftsemi")
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("t"))
      .distinct()
    val toksPos = base.select(col("id"), posexplode(col("w")).as(Seq("t", "tok")))
    val kept = toksPos.join(covered, Seq("id", "t"), "leftanti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("t"), col("tok")))),
            s => s.getField("tok")), " ").as("text_clean"))
    base.select(col("id"), size(col("w")).as("n_tokens"))
      .join(kept, Seq("id"), "left")
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
}
