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

  /** Deterministic IVF centroid selection: every `stride`-th corpus vector
    * is a centroid ("training" must be deterministic for the correctness
    * harness; in production swap in k-means centroids — the assignment and
    * probe machinery below is unchanged).
    */
  def centroids(corpus: DataFrame, stride: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.filter(pmod(col(idCol), lit(stride)) === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid"))

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

  /** Assign each corpus vector to its nearest centroid — one narrow pass
    * with the NearestCentroids kernel. (A join+window formulation
    * materializes |corpus|×|centroids| array-carrying rows and OOMs at
    * 1M vectors — see DESIGN.md §4.)
    */
  def assign(corpus: DataFrame, cents: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (ids, mat) = collectCentroids(cents)
    corpus.select(col(idCol), col(vecCol),
      element_at(graft.functions.VectorFunctions.nearestCentroids(col(vecCol), ids, mat, 1), 1)
        .as("bucket"))
  }

  /** IVF top-k: probe the `nprobe` nearest centroids per query, scan only
    * those buckets. Approximate — recall measured against bruteForceTopK
    * in the spec suite.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      stride: Int = 10, nprobe: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
  ): DataFrame = {
    val cents = centroids(corpus, stride, idCol, vecCol)
    val (ids, mat) = collectCentroids(cents)
    val bucketed = assign(corpus, cents, idCol, vecCol)
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

  /** Embedding-cosine near-duplicate pairs: all (a, b), a<b, with
    * cosine ≥ threshold. Brute force at test scale; the scale path for a
    * full self-join is sign-bit LSH bucketing (random-hyperplane) — see
    * signBits — which turns the O(n²) pair space into per-bucket joins.
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

  /** Random-hyperplane sign bits (deterministic planes derived from an
    * integer hash of (plane, dim) — no RNG at plan time): an nbits-bit
    * bucket key whose collisions approximate angular similarity.
    */
  def signBits(vec: Column, nbits: Int, dim: Int): Column = {
    val planeDot = (p: Int) =>
      aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, i) => x.cast("double") *
            (pmod(xxhash64(concat_ws("_", lit(p), i)), lit(2001L)).cast("double") - 1000.0) / 1000.0),
        lit(0.0), (s, x) => s + x)
    (0 until nbits).map(p => when(planeDot(p) > 0, shiftleft(lit(1L), p)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
  }
}
