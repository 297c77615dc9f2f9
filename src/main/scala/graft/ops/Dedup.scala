package graft.ops

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
  *
  * The object is the single public surface; the implementation lives in
  * four cohesive self-typed partitions (one file each — [[DedupExact]],
  * [[DedupMinHash]], [[DedupCluster]], [[DedupSpans]]). Call sites are
  * unchanged: every member is `Dedup.<op>`. Serializable for the same
  * reason as [[TextAnalysis]]: lambdas in TRAIT bodies capture the module
  * instance through the self-type (object-body lambdas compile to static
  * MODULE$ access and capture nothing).
  */
object Dedup
  extends Serializable
  with DedupExact
  with DedupMinHash
  with DedupCluster
  with DedupSpans
