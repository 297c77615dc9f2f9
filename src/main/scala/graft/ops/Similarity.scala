package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`). Extension surface (SURVEY §2.3).
  *
  * Scale notes (100 TB):
  *   - the query set is broadcast (small side); the corpus is never
  *     collected or shuffled for the brute-force path — each partition
  *     scores its rows locally, then a per-query top-k shuffles only
  *     k×queries candidate rows (local top-k before the window would cut
  *     even that; at 500-row test scale the window alone is optimal);
  *   - the IVF path prunes the corpus to nprobe partitions per query:
  *     corpus rows are bucketed once by nearest centroid (a narrow
  *     broadcast-join pass), and queries only scan their probed buckets —
  *     the classic inverted-file trade of recall for a ~nlist/nprobe scan
  *     reduction;
  *   - cosine arithmetic stays in Catalyst higher-order functions
  *     (`zip_with`/`aggregate`) — no UDF serialization in the hot path.
  */
object Similarity {

  /** dot(a, b) in double precision — native codegen'd expression
    * (graft.functions.VecDot); arithmetic order identical to the HOF
    * formulation `aggregate(zip_with(...))`, so oracle results are
    * unchanged, at ~100× less allocation.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force exact cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding self-matches by id). Output:
    * (query_id, rank, neighbor_id, cosine_r) with deterministic tie-break
    * on neighbor id.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
  ): DataFrame = {
    // norms precomputed once per vector (not per pair): same bits as
    // cosine() — sqrt(VecDot(v,v)) — at a third of the per-pair FLOPs
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cosine_r"))
  }

  /** Hard-negative mining for contrastive training: for each query vector,
    * the k most-similar corpus vectors whose label DIFFERS from the
    * query's — the "hard" negatives that sit just outside the class
    * boundary and carry most of the gradient signal in embedding-model
    * training [Robinson et al., ICLR 2021]. Exact (brute-force) scoring:
    * the label predicate lands INSIDE the join condition, so a mislabeled
    * near-twin can never leak in via post-filtering a top-k that was
    * computed label-blind (retrieve-then-filter under-fills k whenever
    * same-label vectors crowd the true top).
    *
    * Output: (query_id, rnk, neighbor_id, neg_label, cosine_r),
    * deterministic tie-break on neighbor id.
    *
    * Scale shape: identical to `bruteForceTopK` — queries broadcast,
    * corpus partition-local scoring, `filter(rank <= k)` compiles to
    * WindowGroupLimit (per-partition top-k heap BEFORE the per-query
    * shuffle, so only k·|queries| candidate rows ever move). For
    * corpus-scale query sets, compose the IVF path instead: probe
    * `ivfQuery` for top-(m·k) then apply the label filter — the standard
    * over-retrieve trade, with m bounding the same-label crowd-out risk.
    */
  def hardNegatives(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label",
  ): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"), col(labelCol).as("q_label")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"), col(labelCol).as("neg_label"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id") &&
        col("neg_label") =!= col("q_label"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("neg_label"),
        round(col("cos"), 4).as("cosine_r"))
  }

  /** k-NN weak labeling: predict each query vector's label by majority
    * vote among its k nearest labeled corpus vectors (cosine), with the
    * vote deterministically broken toward the smaller label id. The
    * cheap-and-cheerful classifier a curation pipeline uses to
    * pseudo-label fresh data from a labeled seed set before a real model
    * exists. Output: (query_id, pred_label, votes, top_cosine_r).
    *
    * Scale shape: the scored candidate set is the same broadcast-join
    * WindowGroupLimit shape as `bruteForceTopK`; the vote is then a
    * per-query aggregate over ≤ k rows. Ambiguity is resolved by
    * (votes DESC, best cosine within the label DESC, label ASC) — all
    * exact comparisons, so the prediction is engine-reproducible.
    */
  def knnClassify(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label",
  ): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"), col(labelCol).as("nb_label"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    val topk = scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
    // per-(query, label) vote census over ≤ k rows, then a bounded-grain
    // argmax window over the census (≤ |labels| rows per query)
    val votes = topk.groupBy(col("query_id"), col("nb_label"))
      .agg(count(lit(1)).as("votes"), max(col("cos")).as("best_cos"))
    val vw = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("best_cos").desc, col("nb_label").asc)
    votes.withColumn("vr", row_number().over(vw)).filter(col("vr") === 1)
      .select(col("query_id"), col("nb_label").as("pred_label"), col("votes"),
        round(col("best_cos"), 4).as("top_cosine_r"))
  }

  /** Deterministic fixed-size IVF seed selection: the `nlist` corpus
    * vectors with the smallest xxhash64(id) — a uniform deterministic
    * sample whose size is INDEPENDENT of corpus size. (The previous
    * stride rule yielded n/stride centroids, so the driver-collected
    * coarse-quantizer matrix grew with the corpus — a driver OOM at
    * scale.) orderBy+limit compiles to TakeOrderedAndProject: each
    * partition keeps a local top-nlist, the driver merges nlist rows —
    * O(nlist·dim) driver memory at any n. Used as the k-means INIT (see
    * kmeansCentroids); a raw hash sample alone is a uniform sample of the
    * corpus, not cluster centers — the 1M-vector probe measured recall
    * 0.49 at nprobe 32/nlist 1000 without Lloyd refinement.
    */
  def centroids(corpus: DataFrame, nlist: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("centroid_id"), col(vecCol).as("centroid"))
      .orderBy(xxhash64(col("centroid_id")).asc, col("centroid_id").asc)
      .limit(nlist)

  /** Collect the (small) centroid set to the driver for the coarse
    * quantizer kernel — nlist × dim doubles, the standard IVF shape.
    */
  def collectCentroids(cents: DataFrame): (Seq[Long], Seq[Seq[Double]]) = {
    val rows = cents.select(col("centroid_id"),
        transform(col("centroid"), x => x.cast("double")).as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1)
    (rows.map(_._1).toSeq, rows.map(_._2).toSeq)
  }

  /** Deterministic sampled k-means (Lloyd) IVF training: hash-sample
    * `nlist · sampleMult` vectors once (TakeOrderedAndProject — bounded at
    * any corpus size), init with the first `nlist` DISTINCT vector values
    * in hash order (duplicate seeds would permanently empty their twin
    * clusters), then `iters` Lloyd rounds over the sample. Per round, only the
    * centroid matrix (nlist × dim) crosses the driver boundary; the sample
    * stays distributed and is localCheckpoint'ed so rounds don't recompute
    * the scan.
    *
    * Determinism (the correctness harness re-runs this): the sample and
    * init are hash-ordered; per-(bucket, dimension) means fold the values
    * in SORTED order (array_sort(collect_list(x))) so floating-point
    * summation order can't vary between runs/partitionings — groups are
    * sample/nlist ≈ sampleMult values, so the sort is trivially cheap.
    * Empty clusters keep their previous centroid.
    *
    * Returned centroid ids are 0..nlist-1 (synthetic points, not corpus
    * rows).
    */
  def kmeansCentroids(corpus: DataFrame, nlist: Int, iters: Int = 4,
                      sampleMult: Int = 32,
                      idCol: String = "vec_id", vecCol: String = "embedding"
                     ): (Seq[Long], Seq[Seq[Double]]) = {
    val sample = corpus
      .select(col(idCol).as("id"), transform(col(vecCol), x => x.cast("double")).as("v"))
      .orderBy(xxhash64(col("id")).asc, col("id").asc)
      .limit(nlist * sampleMult)
      .localCheckpoint()
    try {
      // seed selection DEDUPLICATES on the vector value (groupBy v, min id):
      // identical seed vectors would tie-break every assignment to the lower
      // centroid id, leaving the higher one a permanently empty cluster that
      // keeps its stale centroid — silently shrinking effective nlist. With
      // distinct seeds every centroid can attract points from round one.
      var mat: Array[Array[Double]] = sample
        .groupBy(col("v")).agg(min(col("id")).as("id"))
        .orderBy(xxhash64(col("id")).asc, col("id").asc).limit(nlist)
        .collect().map(_.getSeq[Double](0).toArray)
      val ids: Seq[Long] = (0L until mat.length.toLong)
      var it = 0
      while (it < iters) {
        val assigned = sample.select(
          element_at(graft.functions.VectorFunctions.nearestCentroids(
            col("v"), ids, mat.map(_.toSeq).toSeq, 1), 1).as("bucket"),
          col("v"))
        val sums = assigned
          .select(col("bucket"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy(col("bucket"), col("pos"))
          .agg(
            aggregate(array_sort(collect_list(col("x"))), lit(0.0), (s, x) => s + x).as("sx"),
            count(lit(1)).as("n"))
          .collect()
        val next = mat.map(_.clone()) // empty cluster -> keep previous centroid
        sums.foreach { r =>
          val b = r.getLong(0).toInt
          next(b)(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
        }
        mat = next
        it += 1
      }
      (ids, mat.map(_.toSeq).toSeq)
    } finally sample.unpersist()
  }

  /** Assign each corpus vector to its nearest centroid from a
    * driver-collected (ids, matrix) pair — one narrow pass with the
    * NearestCentroids kernel. (A join+window formulation materializes
    * |corpus|×|centroids| array-carrying rows and OOMs at 1M vectors —
    * see DESIGN.md §4.)
    */
  def assignTo(corpus: DataFrame, ids: Seq[Long], mat: Seq[Seq[Double]],
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol), col(vecCol),
      element_at(graft.functions.VectorFunctions.nearestCentroids(col(vecCol), ids, mat, 1), 1)
        .as("bucket"))

  /** DataFrame-centroids convenience wrapper over `assignTo`. */
  def assign(corpus: DataFrame, cents: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (ids, mat) = collectCentroids(cents)
    assignTo(corpus, ids, mat, idCol, vecCol)
  }

  /** A built IVF index: the trained coarse quantizer plus the
    * bucket-assigned corpus. BUILD-ONCE ARTIFACT: in production, `bucketed`
    * is persisted (parquet partitioned by bucket, or cached) and the
    * centroid matrix stored alongside; every query batch then pays only
    * the probe join — neither training (one k-means) nor assignment (one
    * full-corpus scan) recurs. The spec suite proves build-once/
    * query-many equals the one-shot path.
    */
  case class IvfIndex(bucketed: DataFrame, ids: Seq[Long], mat: Seq[Seq[Double]],
                      idCol: String, vecCol: String)

  /** Train the quantizer (deterministic sampled k-means; `trainIters` 0
    * falls back to the raw hash-sample seeds) and assign every corpus
    * vector to its nearest centroid — the expensive, once-per-corpus half
    * of IVF.
    */
  def ivfBuild(corpus: DataFrame, nlist: Int = 64, trainIters: Int = 4,
               idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val (ids, mat) =
      if (trainIters <= 0) collectCentroids(centroids(corpus, nlist, idCol, vecCol))
      else kmeansCentroids(corpus, nlist, trainIters, sampleMult = 32, idCol, vecCol)
    IvfIndex(assignTo(corpus, ids, mat, idCol, vecCol), ids, mat, idCol, vecCol)
  }

  /** Incremental index growth: assign a fresh vector batch through the
    * FROZEN quantizer and append it to the bucketed relation — crawl
    * batches join the ANN index at O(batch) cost, no retraining, no
    * touch of existing rows (centroids never move, so neither do
    * existing assignments). Querying the appended index is IDENTICAL to
    * one-shot-assigning the unioned corpus through the same quantizer
    * (spec-pinned): same centroids → same buckets → same probe results.
    * In the parquet form of the artifact this is literally appending
    * bucket-partitioned files. Drift caveat: a quantizer trained on an
    * old snapshot loses recall as the embedding distribution moves —
    * monitor (e.g. `Analytics.scoreDrift` over assignment-distance
    * buckets per batch) and rebuild when it drifts; append-only is the
    * between-rebuilds regime.
    */
  def ivfAppend(index: IvfIndex, batch: DataFrame): IvfIndex =
    index.copy(bucketed = index.bucketed.unionByName(
      assignTo(batch, index.ids, index.mat, index.idCol, index.vecCol)))

  /** Probe a built index: the `nprobe` nearest buckets per query are
    * scanned, nothing else — the cheap, per-query-batch half of IVF.
    */
  def ivfQuery(index: IvfIndex, queries: DataFrame, k: Int, nprobe: Int = 8): DataFrame = {
    import index._
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(graft.functions.VectorFunctions.nearestCentroids(col("qv"), ids, mat, nprobe))
          .as("bucket"))
    val scored = bucketed.join(broadcast(probes), Seq("bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col(vecCol)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol).as("neighbor_id"),
        round(col("cos"), 4).as("cosine_r"))
  }

  /** One-shot IVF top-k (build + query). Approximate — recall measured
    * against bruteForceTopK in the spec suite and the 1M-vector scale
    * probe. `pretrained` supplies an existing quantizer (training is a
    * build artifact, not a per-query cost); for many query batches over
    * one corpus, use `ivfBuild` + `ivfQuery` and persist the index.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 64, nprobe: Int = 8, trainIters: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      pretrained: Option[(Seq[Long], Seq[Seq[Double]])] = None,
  ): DataFrame = {
    val index = pretrained match {
      case Some((ids, mat)) =>
        IvfIndex(assignTo(corpus, ids, mat, idCol, vecCol), ids, mat, idCol, vecCol)
      case None => ivfBuild(corpus, nlist, trainIters, idCol, vecCol)
    }
    ivfQuery(index, queries, k, nprobe)
  }

  /** Embedding-cosine near-duplicate pairs, BRUTE FORCE: all (a, b), a<b,
    * with cosine ≥ threshold. O(n²) with the whole corpus broadcast — this
    * is the ORACLE for `cosineNearDupLsh` (spec suite proves equality at
    * the test SFs), never the production path.
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"), norm(col(vecCol)).as("na"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"), norm(col(vecCol)).as("nb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cosine_r"))
  }

  /** SemDeDup-style semantic dedup [Abbas et al., "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication", arXiv 2023]:
    * k-means-cluster the embedding space, then look for near-duplicates
    * ONLY within a cluster — the O(n²) all-pairs cosine shrinks to
    * Σ|cluster|² ≈ n²/nlist for balanced clusters. This is the scale path
    * when the dup criterion is SEMANTIC (threshold well below the regime
    * where sign-bit banding prunes, cf. `cosineNearDupLsh`'s 0.45-floor
    * caveat): the quantizer concentrates comparisons where dups live.
    * Approximate BY DESIGN — cross-cluster pairs go unseen, the same miss
    * the paper accepts; recall on the test corpus is spec-pinned.
    *
    * Returns every corpus row as (id, bucket, keep): keep=false iff a
    * same-cluster neighbor with cosine ≥ threshold and a SMALLER id
    * exists — the deterministic keep-min rule (each pair's minimum
    * survives; a connected group's least id is always kept).
    *
    * Scale notes: centroids are O(nlist·dim) driver state; assignment is
    * one narrow kernel pass; the pair join shuffles (bucket, id, vec) once
    * on the bucket key. `probes` > 1 is the boundary-miss remedy IVF uses:
    * each vector also participates in its 2nd..k-th nearest clusters, so a
    * pair split by a Voronoi edge still meets in one of them — comparisons
    * grow ×probes², recall grows with it. Recall is THRESHOLD-dependent:
    * at a production semantic-dup threshold (≥0.9 — near-identical
    * vectors) duplicates share a primary cell and recovery is exact
    * (spec-pinned on planted int8-twin pairs); at an adversarially low
    * 0.45 (~63° apart, barely associated) pairs genuinely scatter across
    * cells and probes 2 lifts recovery 2/7 → 4/7 on the test corpus
    * (spec-pinned floor) — more probes buy more, at ×probes² cost. The
    * reported bucket is always the PRIMARY (nearest) cluster. Guard rail as in the paper:
    * pick nlist so the expected cluster fits comfortably in a task
    * (n/nlist ≈ 10⁴–10⁵), and dot ≥ t·|a|·|b| replaces division in the
    * hot filter.
    */
  def semanticDedup(df: DataFrame, threshold: Double, nlist: Int,
                    trainIters: Int = 2, probes: Int = 2,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(threshold > 0, s"keep-min semantics need a positive threshold, got $threshold")
    require(probes >= 1 && probes <= nlist, s"probes must be in [1, nlist], got $probes")
    val (ids, mat) = kmeansCentroids(df, nlist, trainIters, sampleMult = 32, idCol, vecCol)
    val assigned = assignTo(df, ids, mat, idCol, vecCol)
    // pair-search relation: one row per (vector, probed cluster)
    val probed = df.select(col(idCol), col(vecCol),
      explode(graft.functions.VectorFunctions.nearestCentroids(
        col(vecCol), ids, mat, probes)).as("bucket"))
    val a = probed.select(col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("va"), norm(col(vecCol)).as("na"))
    val b = probed.select(col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), norm(col(vecCol)).as("nb"))
    val dropped = a.join(b, "bucket")
      .filter(col("id_b") > col("id_a") &&
        dot(col("va"), col("vb")) >= lit(threshold) * col("na") * col("nb"))
      .select(col("id_b").as(idCol)).distinct()
    assigned.select(col(idCol), col("bucket"))
      .join(dropped.withColumn("__dup", lit(1)), Seq(idCol), "left")
      .select(col(idCol), col("bucket"), col("__dup").isNull.as("keep"))
  }

  /** Greedy k-center coreset (Gonzalez farthest-point traversal): select k
    * vectors such that every corpus vector is within max-min distance of a
    * selected one — the classic 2-approximation to the k-center cover, and
    * the standard diversity-maximizing subset selection for active
    * learning / "which documents should humans label first" [Sener &
    * Savarese, ICLR 2018]. Deterministic: seeded at the smallest id,
    * farthest-point ties break toward the smaller id.
    *
    * Output: (rnk, vec_id, mindist_r) — the selection order, and each
    * center's distance to the already-selected set at the moment it was
    * picked (the seed reports -1.0; the k-th value is the cover radius).
    *
    * Scale shape: k driver rounds (k is 10¹–10³ in practice — it bounds a
    * LABELING budget, not the corpus). Per round: ONE linear scan that
    * (a) folds the running min-distance column against the centers
    * selected since the last materialization — literal dim-vector
    * broadcasts in the task binary, so the state per row is one double —
    * and (b) takes the arg-max via orderBy+limit(1) =
    * TakeOrderedAndProject (per-partition 1-row heap, no shuffle).
    *
    * Materialization cadence: the running min-distance column is
    * localCheckpoint'ed every `checkpointEvery` rounds, NOT every round —
    * between checkpoints the ≤ checkpointEvery−1 newest center distances
    * are recomputed inline in the scan's least() chain. Total
    * materializations of the (id, v, d) relation: ⌈k/c⌉ instead of k;
    * extra FLOPs: ≤ (c−1) distance folds per row per round — the
    * scaladoc's O(n·k²) concern only bites when c grows with k, and c is
    * a small constant. Lineage never exceeds depth 1 off a checkpoint,
    * and only k (id, vector) pairs and k scalars ever reach the driver.
    * The incremental least() fold is exactly Gonzalez's O(n·k) algorithm
    * (min is associative).
    *
    * Determinism across engines (the DuckDB oracle replays all k rounds
    * as a materialized-CTE chain, the vocab_bpe_merges pattern): the
    * squared distance folds (x_i−c_i)² in index order with seed 0.0 —
    * bit-identical IEEE ops in any engine — and least() and the arg-max
    * comparison are exact, so the traversal cannot diverge. The
    * checkpoint cadence cannot change the result: least() is associative
    * and each per-center fold is bit-identical whether read back from a
    * checkpoint or recomputed inline (spec-pinned: c = 1 ≡ c = k).
    */
  def kCenterCoreset(df: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     checkpointEvery: Int = 4): DataFrame = {
    require(k >= 1, s"coreset size must be >= 1: $k")
    require(checkpointEvery >= 1, s"checkpoint cadence must be >= 1: $checkpointEvery")
    val spark = df.sparkSession
    val base = graft.Cleanup.register(
      df.select(col(idCol).as("id"),
          transform(col(vecCol), x => x.cast("double")).as("v"))
        .localCheckpoint(false))
    def sqDistTo(c: Seq[Double]): Column =
      aggregate(zip_with(col("v"), array(c.map(lit): _*), (a, b) => (a - b) * (a - b)),
        lit(0.0), (s, x) => s + x)
    val seed = base.orderBy(col("id").asc).limit(1)
      .collect().headOption.getOrElse(
        throw new IllegalArgumentException("k-center coreset of an empty corpus"))
    var picked = Vector((seed.getLong(0), seed.getSeq[Double](1).toSeq, -1.0))
    var cur = base       // last MATERIALIZED (id, v[, d]) relation
    var hasD = false     // whether cur already carries the d column
    var pending = Vector.empty[Seq[Double]] // centers not yet folded into cur's d
    for (r <- 2 to k) {
      pending :+= picked.last._2
      val dNew = pending.map(sqDistTo).reduce(least(_, _))
      val dCol = if (hasD) least(col("d"), dNew) else dNew
      // never materialize on the final round: the argmax ends the
      // traversal, so a k-th checkpoint would be a write nobody reads
      val checkpointNow = pending.size >= checkpointEvery && r < k
      var toFree: DataFrame = null
      val (scored, dName) =
        if (checkpointNow) {
          toFree = cur // also frees base at the 1st checkpoint (re-unpersist at drain is a no-op)
          cur = graft.Cleanup.register(
            cur.withColumn("d", dCol).localCheckpoint(false))
          hasD = true; pending = Vector.empty
          (cur, "d")
        } else (cur.withColumn("__d", dCol), "__d")
      val ids = picked.map(_._1)
      val next = scored.filter(!col("id").isInCollection(ids))
        .orderBy(col(dName).desc, col("id").asc).limit(1).collect()
      // the argmax materialized the new checkpoint, so the previous one
      // has no remaining consumer — free it NOW instead of at harness
      // drain, or the op holds ⌈k/c⌉ copies of the corpus simultaneously
      // (the later Cleanup.drain re-unpersist is a no-op)
      if (toFree != null) toFree.unpersist()
      if (next.nonEmpty) {
        val row = next.head
        picked :+= ((row.getLong(0), row.getSeq[Double](1).toSeq,
          math.sqrt(row.getDouble(row.fieldIndex(dName)))))
      }
    }
    import spark.implicits._
    // rounding via the same Catalyst round() every other query uses, so
    // the oracle-side round() semantics match exactly
    picked.zipWithIndex
      .map { case ((id, _, d), i) => (i + 1, id, d) }
      .toDF("rnk", "vec_id", "mindist")
      .select(col("rnk"), col("vec_id"), round(col("mindist"), 4).as("mindist_r"))
  }

  /** Maximal-marginal-relevance selection [Carbonell & Goldstein, SIGIR
    * 1998]: greedily pick k vectors maximizing λ·rel − (1−λ)·maxSimToSel —
    * the relevance-aware sibling of `kCenterCoreset` (λ = 1 is pure
    * relevance ranking, λ → 0 approaches pure diversity). The standard
    * diversified-retrieval / exemplar-selection op: "the k most relevant
    * AND mutually distinct documents for this query".
    *
    * Same driver-round shape as `kCenterCoreset` (k rounds, one linear
    * scan each, incremental greatest() fold of the max-similarity column,
    * TakeOrdered argmax, O(k·dim) driver traffic) and the same
    * engine-reproducibility discipline: every cosine is the explicit
    * index-order fold (dot and both norms), the score is two multiplies
    * and a subtract, comparisons are exact — so the DuckDB oracle replays
    * the full traversal as a materialized-CTE chain and hash-matches.
    * The relevance query vector stays RELATIONAL (a broadcast 1-row
    * cross join), never a driver literal.
    *
    * POOL-THEN-RERANK (the production shape): the corpus is cut to the
    * top-`poolM` rows by relevance FIRST — one TakeOrderedAndProject over
    * the scored scan — and the k greedy rounds run over the pool. The
    * contract is therefore MMR OVER THE RELEVANCE POOL: identical to
    * full-corpus MMR whenever every vector full-corpus MMR would select
    * sits inside the top-`poolM` by relevance (guaranteed for λ = 1;
    * empirically the case for any λ with the default poolM ≈ 64·k — and
    * spec-pinned equal to the poolM = ∞ form on the test corpora). The
    * payoff at corpus scale: k corpus scans become ONE (scoring + cut),
    * and each round's materialization shrinks from |corpus| to poolM
    * rows. poolM ≤ 0 disables the cut (the exact full-corpus form the
    * DuckDB oracle replays when the test corpus exceeds the pool).
    *
    * Output: (rnk, vec_id, score_r) in selection order; ms starts at 0,
    * so round 1 is the pure-relevance argmax.
    */
  def mmrSelect(corpus: DataFrame, queries: DataFrame, k: Int, lambda: Double,
                idCol: String = "vec_id", vecCol: String = "embedding",
                poolM: Int = -1): DataFrame = {
    require(k >= 1, s"selection size must be >= 1: $k")
    require(lambda > 0 && lambda <= 1, s"lambda must be in (0, 1]: $lambda")
    val spark = corpus.sparkSession
    val m = if (poolM > 0) poolM else 64 * k
    require(m >= k, s"relevance pool ($m) must be at least k ($k)")
    def fold(pairs: Column): Column = aggregate(pairs, lit(0.0), (s, x) => s + x)
    def dotF(a: Column, b: Column): Column = fold(zip_with(a, b, (x, y) => x * y))
    // the smallest-id query row anchors relevance (deterministic even if
    // the caller passes a multi-row relation)
    val qv = queries
      .select(col(idCol).as("qid"), transform(col(vecCol), x => x.cast("double")).as("qv"))
      .orderBy(col("qid").asc).limit(1).select(col("qv"))
    val base0 = corpus
      .select(col(idCol).as("id"), transform(col(vecCol), x => x.cast("double")).as("v"))
      .crossJoin(broadcast(qv))
      .select(col("id"), col("v"),
        (dotF(col("v"), col("qv")) / (sqrt(dotF(col("v"), col("v"))) *
          sqrt(dotF(col("qv"), col("qv"))))).as("rel"),
        sqrt(dotF(col("v"), col("v"))).as("vn"))
      .withColumn("ms", lit(0.0))
      // the pool cut: TakeOrderedAndProject (per-partition m-row heaps,
      // no corpus shuffle) — the ONE scan that touches the full corpus
      .orderBy(col("rel").desc, col("id").asc).limit(m)
    var cur = graft.Cleanup.register(base0.localCheckpoint(false))
    var prevToFree: org.apache.spark.sql.DataFrame = null
    var picked = Vector.empty[(Long, Seq[Double], Double)]
    for (r <- 1 to k) {
      val scoreC = lit(lambda) * col("rel") - lit(1.0 - lambda) * col("ms")
      val ids = picked.map(_._1)
      val sel = cur.withColumn("score", scoreC)
        .filter(if (ids.isEmpty) lit(true) else !col("id").isInCollection(ids))
        .orderBy(col("score").desc, col("id").asc).limit(1).collect()
      // this argmax materialized the checkpoint registered LAST round, so
      // the round before it has no remaining consumer — free it eagerly
      // rather than holding k pool copies until harness drain (the
      // later Cleanup re-unpersist is a no-op)
      if (prevToFree != null) { prevToFree.unpersist(); prevToFree = null }
      if (sel.nonEmpty && r < k) {
        // the k-th round's argmax ends the traversal — building (and
        // checkpointing) an ms-update nobody reads would cost one full
        // extra pool scan per call
        val row = sel.head
        val cVec = row.getSeq[Double](1).toSeq
        picked :+= ((row.getLong(0), cVec, row.getDouble(row.fieldIndex("score"))))
        val cn = math.sqrt(cVec.foldLeft(0.0)((a, x) => a + x * x))
        val cl = array(cVec.map(lit).toIndexedSeq: _*)
        prevToFree = cur
        cur = graft.Cleanup.register(
          cur.withColumn("ms",
            greatest(col("ms"), dotF(col("v"), cl) / (col("vn") * lit(cn))))
            .localCheckpoint(false))
      } else if (sel.nonEmpty) {
        val row = sel.head
        picked :+= ((row.getLong(0), row.getSeq[Double](1).toSeq,
          row.getDouble(row.fieldIndex("score"))))
      }
    }
    import spark.implicits._
    picked.zipWithIndex.map { case ((id, _, s), i) => (i + 1, id, s) }
      .toDF("rnk", "vec_id", "score")
      .select(col("rnk"), col("vec_id"), round(col("score"), 4).as("score_r"))
  }

  /** Dominant principal component of the (uncentered) embedding Gram
    * matrix by power iteration — the anisotropy diagnostic for embedding
    * corpora (trained-encoder spaces concentrate mass in a few directions;
    * the leading component is what whitening/ABTT-style post-processing
    * removes [Mu & Viswanath, ICLR 2018]). `iters` rounds of v ← XᵀXv,
    * normalized each round; deterministic start v₀ = 1/√dim · 𝟙.
    *
    * The scale problem this op actually solves is ORDER-INDEPENDENT float
    * reduction: Σₓ x·(x·v) is a corpus-scale float sum, and float addition
    * is not associative — a plain sum(double) changes value (and can flip
    * the converged sign of borderline loadings) under every partitioning,
    * while the repo's sorted-fold trick (meanPool) buffers O(group) values
    * — unusable over the whole corpus. Here each per-row per-dimension
    * addend is QUANTIZED to 2⁻²⁰ fixed point — round(xᵢ·(x·v)·2²⁰) as an
    * exact integer — and summed in decimal: integer addition IS
    * associative, so the reduction is bit-identical under any partitioning
    * and any engine, with O(1) mergeable state per dimension (the DuckDB
    * oracle replays all rounds as a materialized-CTE chain and
    * hash-matches). Decimal(27,0) sums: a quantized addend is
    * |xᵢ|·|x·v|·2²⁰ ≈ 10⁶ for unit-norm vectors (up to ~10⁹ for
    * magnitude-10 raw embeddings), so a LONG sum only overflows past
    * ~10⁹–10¹² rows — real headroom at probe scale, none at the 10¹³-row
    * corpus this op is written for; decimal(27,0) is safe at any scale
    * and costs little once the addend cast goes through long (below).
    * The 2⁻²⁰ quantization error per round is ~10⁻⁶ relative — far below
    * the 5-dp output rounding — and the iteration re-normalizes every
    * round, so error does not compound.
    *
    * Shape per round: ONE whole-stage-codegen scan computing the dot
    * against the literal v (broadcast in the task binary) and 64 partial
    * sums — no shuffle (final aggregation merges #partitions rows), one
    * 64-cell row to the driver. The base relation is localCheckpoint'ed
    * once; `iters` is a constant (6–10 suffices for a spectral gap), so
    * total cost is iters linear scans.
    */
  def powerIteration(df: DataFrame, iters: Int = 6, dim: Int = 64,
                     vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    val vcur = powerIterationVector(df, iters, dim, vecCol)
    import spark.implicits._
    vcur.toIndexedSeq.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("pos", "loading")
      .select(col("pos"), round(col("loading"), 5).as("loading_r"))
  }

  /** The unrounded component vector behind `powerIteration` — the form
    * downstream ops consume (`removeDominantComponent`). Same rounds,
    * same fixed-point reduction; see powerIteration for the design.
    */
  def powerIterationVector(df: DataFrame, iters: Int = 6, dim: Int = 64,
                           vecCol: String = "embedding"): Array[Double] = {
    require(iters >= 1 && dim >= 1, s"need iters >= 1 and dim >= 1: $iters, $dim")
    val base = graft.Cleanup.register(
      df.select(transform(col(vecCol), x => x.cast("double")).as("v"))
        .localCheckpoint(false))
    val Q = 1048576.0 // 2^20: exact power-of-two fixed-point scale
    var vcur: Array[Double] = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val vl = array(vcur.map(lit).toIndexedSeq: _*)
      val dotC = aggregate(zip_with(col("v"), vl, (x, b) => x * b),
        lit(0.0), (s, x) => s + x)
      // round → long → decimal: the addend is an integral double ≤ ~2³¹
      // (|x|·|x·v|·2²⁰ with unit v), so the long hop is exact — and
      // Decimal(long) skips the per-element BigDecimal conversion a
      // direct double→decimal cast pays (measured 8.8× on the whole
      // 6-round run at 1M×64: 267 s → 30.5 s)
      val aggs = (0 until dim).map(i =>
        sum(round(element_at(col("v"), i + 1) * col("dot") * lit(Q))
          .cast("long").cast("decimal(27,0)")).as(s"s$i"))
      val row = base.withColumn("dot", dotC)
        .agg(aggs.head, aggs.tail: _*).collect().head
      require(!row.isNullAt(0), "power iteration over an empty corpus")
      val s = (0 until dim).map(i => row.getDecimal(i).doubleValue() / Q).toArray
      val norm = math.sqrt(s.foldLeft(0.0)((a, x) => a + x * x))
      require(norm > 0, "degenerate corpus: X^T X v vanished")
      vcur = s.map(_ / norm)
    }
    vcur
  }

  /** All-but-the-top whitening [Mu & Viswanath, ICLR 2018]: remove the
    * dominant component from every embedding — x′ = x − (x·v)v — and
    * report before/after L2 norms, the anisotropy-correction pass that
    * follows `powerIteration` in an embedding-health pipeline (a large
    * before→after norm drop marks vectors dominated by the common
    * direction — exactly the rows whose cosine similarities were
    * inflated). Pure per-row projection against the literal component
    * (broadcast in the task binary): scan-speed, shuffle-free,
    * whole-stage codegen. Exact index-order folds for the dot and both
    * norms keep the DuckDB oracle (the pca CTE chain + one projection)
    * hash-exact.
    */
  def removeDominantComponent(df: DataFrame, component: Array[Double],
                              idCol: String = "vec_id",
                              vecCol: String = "embedding"): DataFrame = {
    val vl = array(component.map(lit).toIndexedSeq: _*)
    val vd = transform(col(vecCol), x => x.cast("double"))
    def fold(pairs: Column): Column = aggregate(pairs, lit(0.0), (s, x) => s + x)
    val d = fold(zip_with(vd, vl, (x, b) => x * b))
    df.select(col(idCol), vd.as("v"), d.as("d"))
      .select(col(idCol),
        round(sqrt(fold(zip_with(col("v"), col("v"), (x, y) => x * y))), 4).as("l2_before_r"),
        round(sqrt(fold(zip_with(
          zip_with(col("v"), vl, (x, b) => x - col("d") * b),
          zip_with(col("v"), vl, (x, b) => x - col("d") * b),
          (x, y) => x * y))), 4).as("l2_after_r"))
  }

  /** Group-wise embedding mean pooling (per-cluster / per-shard centroids):
    * one output row per (group, dimension) with the component mean — the
    * building block for corpus-level centroid computation, cluster
    * summarization, and domain-mixture diagnostics. Shape: posexplode to
    * (group, pos, x) rows, one hash aggregation keyed (group, pos) — the
    * shuffle carries scalars, never whole vectors, and partial (map-side)
    * aggregation compresses each partition to n_groups×dim rows before the
    * exchange.
    *
    * Determinism: the per-(group, pos) mean folds its values in SORTED
    * order (array_sort(collect_list)) so floating-point summation order
    * can't vary between runs/partitionings — the same discipline as
    * kmeansCentroids, and what makes the DuckDB oracle hash-exact. The
    * production variant that doesn't need bit-exact reproducibility is
    * `meanPoolAvg` below — plain avg(), O(1) mergeable state, no
    * per-group list.
    */
  def meanPool(df: DataFrame, groupExpr: Column,
               vecCol: String = "embedding"): DataFrame =
    df.select(groupExpr.as("grp"),
        posexplode(transform(col(vecCol), x => x.cast("double"))).as(Seq("pos", "x")))
      .groupBy(col("grp"), col("pos"))
      .agg(
        aggregate(array_sort(collect_list(col("x"))), lit(0.0), (s, x) => s + x).as("sx"),
        count(lit(1)).as("n"))
      .select(col("grp"), col("pos").cast("long").as("pos"),
        round(col("sx") / col("n"), 4).as("mean_r"))

  /** PRODUCTION mean pooling: plain avg() per (group, dimension) —
    * O(1) mergeable aggregation state (sum + count), map-side partials,
    * no per-group list ever materializes, so a group can be the whole
    * corpus. Same output schema as `meanPool`; values can differ from
    * the sorted-fold only by floating-point summation order (ulp-scale
    * — spec-pinned equal after the 4-dp rounding on the test corpora).
    * Use this at scale; `meanPool` exists for the bit-exact oracle hash.
    */
  def meanPoolAvg(df: DataFrame, groupExpr: Column,
                  vecCol: String = "embedding"): DataFrame =
    df.select(groupExpr.as("grp"),
        posexplode(transform(col(vecCol), x => x.cast("double"))).as(Seq("pos", "x")))
      .groupBy(col("grp"), col("pos"))
      .agg(avg(col("x")).as("m"))
      .select(col("grp"), col("pos").cast("long").as("pos"),
        round(col("m"), 4).as("mean_r"))

  /** Per-dimension corpus statistics (count, mean, min, max) — the
    * embedding-health profile run before quantization/normalization
    * decisions (is a dimension dead? saturated? off-center?).
    *
    * Unlike meanPool's sorted-fold (which collects per-group lists), the
    * mean here comes from an EXACT integer sum of micro-units
    * (round(x·1e6) as long): order-proof, one-pass, mergeable, and O(1)
    * state per (dim) group — the right trade at full corpus width, where
    * collecting a corpus-length list per dimension is not an option. The
    * quantization to micro-units loses < 5e-7 per element, far below the
    * 4-dp rounding the result reports. Σmicros stays within long for
    * |x| ≤ ~1e3 up to ~1e10 rows; beyond that lift to DECIMAL(38,0).
    * min/max are exact doubles (float widening is value-preserving).
    */
  def dimStats(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df.select(posexplode(transform(col(vecCol), x => x.cast("double"))).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("x") * 1000000).cast("long")).as("sum_micro"),
        min(col("x")).as("mn"),
        max(col("x")).as("mx"))
      .select(col("pos"), col("n"),
        round(col("sum_micro").cast("double") / lit(1000000.0) / col("n").cast("double"), 4)
          .as("mean_r"),
        round(col("mn"), 4).as("min_r"),
        round(col("mx"), 4).as("max_r"))

  /** Per-vector symmetric int8 quantization for embedding storage — at
    * 100 TB the embedding column is usually the widest thing in the lake,
    * and 4× smaller vectors mean 4× less scan/shuffle IO for every ANN and
    * near-dup pass. scale = max|x|/127 (one scale per vector, stored
    * alongside); q[i] = round(x[i]/scale) ∈ [-127, 127]. Pure higher-order
    * functions — no UDF. Reconstruction error per component is ≤ scale/2,
    * so cosine distortion is bounded by ~1/254 per unit norm (spec-pinned
    * against the exact cosine).
    */
  def quantizeInt8(vec: Column): Column = {
    val scale = greatest(
      array_max(transform(vec, x => abs(x.cast("double")))) / 127.0,
      lit(java.lang.Double.MIN_NORMAL)) // all-zero vector: avoid 0/0
    // let-bind scale through a 1-element transform: referencing `scale`
    // directly inside the per-element lambda would re-evaluate the whole
    // array_max subtree for EVERY element (O(d²) per row — HOF lambdas get
    // no codegen CSE); the outer lambda evaluates it exactly once
    element_at(
      transform(array(scale), s =>
        struct(
          s.as("scale"),
          transform(vec, x => round(x.cast("double") / s).cast("tinyint")).as("q"))),
      1)
  }

  /** Inverse of quantizeInt8: x̂[i] = q[i]·scale (array<double>). */
  def dequantizeInt8(quant: Column): Column =
    transform(quant.getField("q"), x => x.cast("double") * quant.getField("scale"))

  /** Deterministic random-hyperplane matrix: `planes` rows of `dim`
    * components in [-1, 1), from mix64(plane·4096 + dim-index) — the same
    * matrix the SignBandBuckets kernel derives internally
    * (graft.functions.Hyperplanes); exposed here for specs and external
    * reproduction.
    */
  def hyperplanes(planes: Int, dim: Int): Array[Array[Double]] =
    graft.functions.Hyperplanes.matrix(planes, dim)

  /** Random-hyperplane sign bits: an nbits-bit bucket key whose collisions
    * approximate angular similarity — the single-band case of
    * `signBandBuckets` (same planes, same kernel).
    */
  def signBits(vec: Column, nbits: Int, dim: Int): Column =
    element_at(signBandBuckets(vec, nbits, bands = 1, dim), 1)

  /** Banded sign-bit bucket keys: `bands` buckets of `bitsPerBand` sign
    * bits each (plane p = band·bitsPerBand + j). Two vectors collide in a
    * band iff all its bits agree, so for angle θ the per-band collision
    * rate is (1−θ/π)^bitsPerBand and the miss probability over all bands
    * is (1−(1−θ/π)^b)^B — the standard LSH S-curve. One native kernel
    * pass (graft.functions.SignBandBuckets): the equivalent Column tree is
    * b·B separate VecDots, which blows codegen limits at scale configs
    * like (20, 96).
    */
  def signBandBuckets(vec: Column, bitsPerBand: Int, bands: Int, dim: Int): Column =
    graft.functions.VectorFunctions.signBandBuckets(vec, bitsPerBand, bands, dim)

  /** Embedding-cosine near-duplicate pairs via random-hyperplane LSH — the
    * production-shape replacement for the brute-force all-pairs broadcast:
    * bucket each vector into `bands` sign-bit buckets, generate candidate
    * pairs only within (band, bucket) — the join shuffles fixed-width
    * (band, bucket, id) keys, never vectors — then verify candidates with
    * the exact cosine and threshold. Output is identical to
    * `cosineNearDupPairs` whenever every true pair collides in ≥1 band.
    *
    * Parameter honesty (100 TB): recall and cost both ride on
    * (bitsPerBand, bands) vs the threshold. Near-dup thresholds of
    * 0.85–0.95 (θ≤31°, per-bit agreement ≥0.83) support 12–16 bits/band,
    * giving ~n/4096 bucket sizes and a genuinely sublinear candidate set.
    * The test corpus's threshold of 0.45 (θ≈63°, agreement 0.65) is near
    * the LSH floor — no (b, B) both prunes hard and keeps recall there
    * (candidate volume ∝ B·n²/2^(b+1); at b=5, B=48 it is ~1.5× the brute
    * pair count, and raising b past 5 measurably drops pairs). The
    * defaults (5, 48) are the fastest configuration that is still exact on
    * every test corpus (proven against the brute oracle in the spec
    * suite, empirically: (5, 32) misses a 0.4827 pair at sf0.01).
    * `maxBucketSize` (0 = off) drops degenerate buckets, same guard as
    * minHashCandidates.
    *
    * FIXTURE-REGENERATION WARNING: at near-floor thresholds these defaults
    * sit just above the recall cliff — a regenerated test corpus (new SF,
    * new seed) can move a pair to just-above-threshold at an angle the
    * (5, 48) bands happen to miss, silently breaking the shared brute
    * oracle. If fixtures change, re-run SimilaritySpec's LSH==brute
    * equality cases at every SF before trusting the wired query; prefer
    * raising `bands` over debugging a hash mismatch. At production
    * thresholds (≥0.85, e.g. the t90 quantized-twin query) the S-curve
    * margin is orders of magnitude and this fragility disappears.
    */
  /** Cross-corpus embedding near-dup flags: mark vectors in `corpus` (the
    * fresh batch) whose cosine with ANY vector in `reference` (the
    * existing training set / eval suite) reaches `threshold` — the
    * embedding-space sibling of `Dedup.crossCorpusNearDups`, e.g. "drop
    * new embeddings that near-duplicate the eval set before they enter
    * training". Asymmetric sign-bit LSH: both sides band through the
    * same hyperplane kernel (identical planes ⇒ near vectors collide
    * cross-side exactly as they would in the self-join), the candidate
    * join is (band, bucket)-local reference×corpus — no self-pairs —
    * and the exact cosine verifies candidates only. One row per flagged
    * corpus vector with its best reference match (highest cosine, then
    * smallest reference id; lexicographic struct max = one
    * map-side-partial aggregation).
    *
    * 100 TB notes: the reference's (band, bucket, id) relation is a
    * build-once artifact across batches — `cosineBandBuild` +
    * `crossCorpusCosineFlagsWith` below are that seam (this raw form
    * re-derives it per plan; rebanding the reference per batch is the
    * cost to avoid); shuffles carry fixed-width keys, vectors join back
    * to candidate ids only. Same (bitsPerBand, bands) honesty as
    * `cosineNearDupLsh`: production thresholds ≥0.85 support 12–16-bit
    * bands with sublinear candidates; near-floor thresholds don't.
    */
  def crossCorpusCosineFlags(corpus: DataFrame, reference: DataFrame,
                             threshold: Double, dim: Int,
                             bitsPerBand: Int = 16, bands: Int = 8,
                             maxBucketSize: Int = 0,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding"): DataFrame =
    crossCorpusCosineFlagsWith(corpus,
      cosineBandBuild(reference, dim, bitsPerBand, bands, idCol, vecCol),
      threshold, maxBucketSize, idCol, vecCol)

  /** The build-once reference artifact for embedding cross-corpus flags:
    * the (band, bucket, id_ref) sign-bit relation and the
    * (id_ref, vector, norm) verification relation, plus the banding
    * parameters (the hyperplane matrix is derived deterministically from
    * (bitsPerBand, bands, dim), so parameter equality IS plane equality).
    * Persist both per reference snapshot; every batch probes them.
    */
  case class CosineBandIndex(refBands: DataFrame, refVecs: DataFrame,
                             bitsPerBand: Int, bands: Int, dim: Int) {
    def persist(): this.type = { refBands.persist(); refVecs.persist(); this }
    def unpersist(): this.type = { refBands.unpersist(); refVecs.unpersist(); this }
  }

  /** Band + norm the reference embeddings once — the per-reference-
    * snapshot half of `crossCorpusCosineFlags` (the `ivfBuild` seam).
    */
  def cosineBandBuild(reference: DataFrame, dim: Int,
                      bitsPerBand: Int = 16, bands: Int = 8,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): CosineBandIndex =
    CosineBandIndex(
      reference.select(col(idCol).as("id_ref"),
        posexplode(signBandBuckets(col(vecCol), bitsPerBand, bands, dim))
          .as(Seq("band", "bucket")))
        .select(col("band"), col("bucket"), col("id_ref")),
      reference.select(col(idCol).as("id_ref"), col(vecCol).as("__vr"),
        norm(col(vecCol)).as("__nr")),
      bitsPerBand, bands, dim)

  /** Embedding cross-corpus flags against a PREBUILT reference index —
    * the per-batch half: band the fresh vectors through the SAME
    * hyperplane kernel, probe the artifact's (band, bucket) relation,
    * exact-cosine-verify candidates against the artifact's vectors.
    * Spec-pinned identical to the raw-DataFrame form.
    */
  def crossCorpusCosineFlagsWith(corpus: DataFrame, index: CosineBandIndex,
                                 threshold: Double,
                                 maxBucketSize: Int = 0,
                                 idCol: String = "vec_id",
                                 vecCol: String = "embedding"): DataFrame = {
    val nb = corpus.select(
      col(idCol).as("id_new"),
      posexplode(signBandBuckets(col(vecCol), index.bitsPerBand, index.bands, index.dim))
        .as(Seq("band", "bucket")))
    val rb = index.refBands
    val (nbB, rbB) =
      if (maxBucketSize <= 0) (nb, rb)
      else {
        val ok = nb.select(col("band"), col("bucket"))
          .unionByName(rb.select(col("band"), col("bucket")))
          .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("__bsz"))
          .filter(col("__bsz") <= maxBucketSize)
          .select(col("band"), col("bucket"))
        (nb.join(ok, Seq("band", "bucket"), "leftsemi"),
          rb.join(ok, Seq("band", "bucket"), "leftsemi"))
      }
    val cand = nbB.join(rbB, Seq("band", "bucket"))
      .select(col("id_new"), col("id_ref")).distinct()
    val vn = corpus.select(col(idCol).as("id_new"), col(vecCol).as("__vn"),
      norm(col(vecCol)).as("__nn"))
    cand.join(vn, "id_new").join(index.refVecs, "id_ref")
      .withColumn("__cos", dot(col("__vn"), col("__vr")) / (col("__nn") * col("__nr")))
      .filter(col("__cos") >= threshold)
      .groupBy(col("id_new"))
      .agg(max(struct(col("__cos").as("c"), (-col("id_ref")).as("ni"))).as("__best"))
      .select(col("id_new"), (-col("__best.ni")).as("matched_ref"),
        round(col("__best.c"), 4).as("best_cosine"))
  }

  /** STREAMING embedding cross-corpus flags: each arriving vector bands
    * through the SAME hyperplane kernel as the prebuilt reference index
    * and joins the static (band, bucket) and vector relations — online
    * "drop new embeddings that near-duplicate the eval/training set"
    * while they arrive, the embedding sibling of
    * `Dedup.streamingCrossCorpusFlagsWith`. Every join is stream-static,
    * so banding, candidate lookup and cosine verification are all
    * STATELESS; the only state is the band-collision output dedup,
    * bounded by the watermark. Emits (ts, id_new, id_ref, cosine) pairs,
    * not best-per-vector — any verified hit ≥ threshold decides the
    * drop, and a best-match aggregate would hold per-vector state
    * (same argument as the text twin's scaladoc).
    */
  def streamingCrossCorpusCosineFlagsWith(stream: DataFrame, index: CosineBandIndex,
                                          tsCol: String, threshold: Double,
                                          watermark: String,
                                          idCol: String = "vec_id",
                                          vecCol: String = "embedding"): DataFrame = {
    val banded = stream
      .withWatermark(tsCol, watermark)
      .select(col(tsCol).as("ts"), col(idCol).as("id_new"),
        col(vecCol).as("__vn"), norm(col(vecCol)).as("__nn"),
        posexplode(signBandBuckets(col(vecCol), index.bitsPerBand, index.bands, index.dim))
          .as(Seq("band", "bucket")))
    banded
      .join(index.refBands, Seq("band", "bucket")) // stream-static: no state
      .join(index.refVecs, "id_ref")               // stream-static: no state
      .withColumn("cosine",
        round(dot(col("__vn"), col("__vr")) / (col("__nn") * col("__nr")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("ts"), col("id_new"), col("id_ref"), col("cosine"))
      .dropDuplicatesWithinWatermark(Seq("id_new", "id_ref"))
  }

  def cosineNearDupLsh(df: DataFrame, threshold: Double, dim: Int,
                       bitsPerBand: Int = 5, bands: Int = 48,
                       maxBucketSize: Int = 0,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = df.select(
      col(idCol).as("id"),
      posexplode(signBandBuckets(col(vecCol), bitsPerBand, bands, dim)).as(Seq("band", "bucket")))
    val cand = Dedup.bucketCandidatePairs(bucketed, maxBucketSize)
    // exact verification, candidates only — same arithmetic (and thus the
    // same rounded doubles) as the brute-force oracle
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
    cand
      .join(v.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
      .join(v.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cosine_r"))
  }
}
