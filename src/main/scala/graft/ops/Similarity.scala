package graft.ops

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
  *
  * The object is the single public surface; the implementation lives in
  * six cohesive self-typed partitions (one file each — [[SimilarityCore]],
  * [[SimilarityIvf]], [[SimilarityPq]], [[SimilarityNearDup]],
  * [[SimilaritySelect]], [[SimilaritySpectral]]). Call sites are unchanged:
  * every member is
  * `Similarity.<op>`. Serializable for the same reason as [[TextAnalysis]]:
  * lambdas in TRAIT bodies capture the module instance through the
  * self-type (object-body lambdas compile to static MODULE$ access and
  * capture nothing).
  */
object Similarity
  extends Serializable
  with SimilarityCore
  with SimilarityIvf
  with SimilarityPq
  with SimilarityNearDup
  with SimilaritySelect
  with SimilaritySpectral
