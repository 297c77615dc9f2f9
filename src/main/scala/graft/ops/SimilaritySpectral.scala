package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity partition: spectral / statistical embedding ops — power-iteration principal component, all-but-the-top whitening, mean pooling, per-dimension stats, int8 quantization.
  * See [[Similarity]].
  */
trait SimilaritySpectral { self: Similarity.type =>

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
    * exact integer — and summed in exact integer arithmetic: integer
    * addition IS associative, so the reduction is bit-identical under any
    * partitioning and any engine, with O(1) mergeable state per dimension
    * (the DuckDB oracle replays all rounds as a materialized-CTE chain
    * and hash-matches). Partial sums are per-partition longs merged in
    * BigInt on the driver (round 16 — previously decimal(27,0) SQL sums;
    * same values): a quantized addend is |xᵢ|·|x·v|·2²⁰ ≈ 10⁶ for
    * unit-norm vectors (up to ~10⁹ for magnitude-10 raw embeddings), so
    * a per-PARTITION long sum overflows only past ~10⁹–10¹² rows in one
    * partition — and Math.addExact makes that a loud task error, never a
    * silent wrap; the BigInt merge itself is unbounded.
    * The 2⁻²⁰ quantization error per round is ~10⁻⁶ relative — far below
    * the 5-dp output rounding — and the iteration re-normalizes every
    * round, so error does not compound.
    *
    * Shape per round: ONE linear kernel scan over the checkpointed cast
    * projection computing the dot against the broadcast v and `dim`
    * partial sums per partition — no shuffle, one dim-cell array per
    * partition to the driver. The base relation is localCheckpoint'ed
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
    // ROUND SHAPE (round 16 — the lmsRoundsMulti fixed-cost redesign
    // applied here): the cast projection compiles ONCE into an
    // InternalRow RDD; each round is one `mapPartitions` kernel job over
    // it — the dot, the 2⁻²⁰ quantization and the per-dimension partial
    // Long sums in plain `while` loops — merged exactly on the driver in
    // BigInt. The previous declarative round built a 64-expression
    // `sum(round(..).cast(long).cast(decimal(27,0)))` aggregate whose JFR
    // profile put ~31% of the whole query in the decimal machinery
    // (FloatingDecimal.developLongDigits 16.7% + BigDecimal.<init> 9.2% +
    // Decimal.changePrecision 4.7%) on top of per-round analysis/codegen.
    // ARITHMETIC IS BIT-IDENTICAL: the dot is the same left-to-right
    // IEEE fold VecDot computes; the quantization is the same
    // round→cast(long) chain ([[graft.ops.TextAnalysis.roundHalfUpToLong]]
    // — Spark Round's BigDecimal.valueOf(v).setScale(0, HALF_UP) exactly);
    // partial sums are exact integers (Math.addExact — a >2⁶³ partition
    // is a loud task error where decimal kept absorbing, far past any
    // real partition's mass) merged order-independently in BigInt; and
    // the BigInt → BigDecimal → double hop is the identical value path
    // Decimal(27,0).doubleValue took (exact below 2⁵³, same IEEE rounding
    // above). Spec-pinned trajectory-equal to the declarative form in
    // SimilaritySpec.
    val rdd = base.queryExecution.toRdd
    var vcur: Array[Double] = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val vB = vcur.clone()
      val (dimB, qB) = (dim, Q)
      // buffer-bound: dim longs per partition (model grain,
      // corpus-independent — the lmsRoundsMulti bound)
      val partials = rdd.mapPartitions { it =>
        val sums = new Array[Long](dimB)
        it.foreach { row =>
          val varr = row.getArray(0).toDoubleArray()
          require(varr.length == dimB,
            s"powerIterationVector: vector of dim ${varr.length}, expected $dimB")
          var s = 0.0
          var i = 0
          while (i < dimB) { s += varr(i) * vB(i); i += 1 }
          i = 0
          while (i < dimB) {
            sums(i) = Math.addExact(sums(i),
              graft.ops.TextAnalysis.roundHalfUpToLong(varr(i) * s * qB))
            i += 1
          }
        }
        Iterator.single(sums)
      }.collect()
      val s = (0 until dim).map { i =>
        var tot = BigInt(0)
        partials.foreach(p => tot += p(i))
        new java.math.BigDecimal(tot.bigInteger).doubleValue() / Q
      }.toArray
      val norm = math.sqrt(s.foldLeft(0.0)((a, x) => a + x * x))
      // an empty corpus lands here too (all-zero sums), loudly
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
    // all three per-row folds as native kernels (round 15, DESIGN §18:
    // the nested residual-norm HOF measured 2.7 → 0.3 s at 1M) — VecDot
    // for the loading and before-norm, VecResidL2Sq for the after-norm;
    // identical element-order IEEE ops, oracle hash unchanged
    import graft.functions.VectorFunctions.{vecDot, vecResidL2Sq}
    val d = vecDot(vd, vl)
    df.select(col(idCol), vd.as("v"), d.as("d"))
      .select(col(idCol),
        round(sqrt(vecDot(col("v"), col("v"))), 4).as("l2_before_r"),
        round(sqrt(vecResidL2Sq(col("v"), col("d"), component.toSeq)), 4)
          .as("l2_after_r"))
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
      // buffer-bound: group size per (grp, dim) — the bit-exact ORACLE
      // surface (audited in WindowKeySweepSpec); production is
      // meanPoolAvg below, plain avg() with O(1) mergeable state.
      // VecSortedSum = the same ascending fold, kernel'd (round-16 §18)
      .agg(
        graft.functions.VectorFunctions.vecSortedSum(collect_list(col("x"))).as("sx"),
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
}
