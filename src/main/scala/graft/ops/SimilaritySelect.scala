package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity partition: diversity-aware subset selection — greedy k-center coreset (Gonzalez) and maximal-marginal-relevance selection with the top-M relevance pool.
  * See [[Similarity]].
  */
trait SimilaritySelect { self: Similarity.type =>

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
    // squared distance to a literal center — native kernel (round 15,
    // DESIGN §18: the HOF fold is CodegenFallback and runs once per row
    // per pending center per round); identical index-order (a−b)² fold
    def sqDistTo(c: Seq[Double]): Column =
      graft.functions.VectorFunctions.vecL2Sq(col("v"), array(c.map(lit): _*))
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
    * rows. poolM ≤ 0 means the default 64·k pool; pass poolM ≥ |corpus|
    * for the exact full-corpus form. The DuckDB oracle replays the SAME
    * pool cut before its greedy-round CTE chain (the cut is
    * engine-reproducible: rel is a bit-identical index-order IEEE fold
    * and the (rel DESC, id ASC) tie-break is exact), so the wired query
    * validates pooled MMR by construction — not merely while the
    * full-corpus traversal happens to stay inside the pool.
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
    // index-order Σx·y as the native VecDot kernel (round 15, DESIGN §18)
    // — bit-identical to the HOF fold this op used through round 14
    def dotF(a: Column, b: Column): Column =
      graft.functions.VectorFunctions.vecDot(a, b)
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
}
