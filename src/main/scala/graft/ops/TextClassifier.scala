package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TextAnalysis partition: model-based curation — the fasttext-shaped
  * linear quality classifier (hashed bag-of-words features, batch
  * Widrow–Hoff LMS training) and DSIR-shaped importance reweighting
  * [Xie et al., NeurIPS 2023: Data Selection for Language Models via
  * Importance Resampling]. These are the two classifier-adjacent ops every
  * production curation stack runs (CCNet/LLaMA-style quality filtering; a
  * target-domain importance ranking for domain-targeted selection), here
  * re-expressed under the repo's engine-reproducibility discipline so a
  * DuckDB oracle replays training round-for-round. See [[TextAnalysis]].
  *
  * Determinism design (shared with `powerIteration`): every corpus-scale
  * float reduction is quantized to 2⁻²⁰ fixed point per addend and summed
  * in decimal — integer addition is associative, so the training
  * trajectory is bit-identical under any partitioning and any engine. All
  * per-row float work (feature normalization, margins, importance
  * weights) is built from correctly-rounded IEEE ops evaluated in a fixed
  * index order on both engines, so comparisons (margin > 0, weight
  * ordering) can never diverge. No transcendentals anywhere: squared loss
  * instead of logistic (no exp/sigmoid — libm last-ulp rounding is
  * engine-private), ratio-form importance weights instead of log-ratio
  * sums (no ln) — the same no-transcendental rule `scoreDrift` follows.
  *
  * Loss choice, measured not guessed: full-batch subgradient descent on
  * the HINGE loss was tried first and oscillates under a constant step —
  * by the time the weights are large enough to clear the margin target
  * the full-batch step overshoots, and the iterates bounce between
  * all-positive and all-negative predictors (iterate averaging just
  * collapses to the majority class under imbalance). The squared loss is
  * a quadratic bowl: batch gradient descent with any step below 2/λ_max
  * converges MONOTONICALLY — no schedule, no averaging, no randomness —
  * and on ±1 labels its minimizer is the Fisher/least-squares
  * discriminant, reaching the linear-probe accuracy ceiling of the
  * feature map (verified equal to the closed-form lstsq accuracy on the
  * test corpora at every SF).
  */
trait TextClassifier { self: TextAnalysis.type =>

  /** Per-token feature-hash bucket counts: array of `dim` integer counts,
    * bucket = pmod(xxhash64(gram), dim) over unigrams (and, at maxN = 2,
    * adjacent bigrams — the DSIR paper's actual hashed unigram+bigram
    * space, with the bigram string `w_i ⊔ w_{i+1}` so the oracle's
    * `w[i] || ' ' || w[i+1]` hashes identically). The feature map every
    * fasttext-shaped pipeline uses (hashing trick — no vocabulary build,
    * no OOV path, fixed width at any corpus size). Round 14: computed by
    * the native [[graft.functions.HashedBow]] kernel over Spark's own
    * token array — the HOF fold it replaces was CodegenFallback with a
    * boxed dim-slot accumulator rebuilt per token (O(dim·tokens) boxed
    * ops per row, the hot scan expression of every apply pass; DESIGN
    * §17.1), bit-identical arithmetic spec-pinned both directions.
    * Tokenization is the repo-wide whitespace rule (`tokens`), giving a
    * blank document the single empty token — total, never null.
    */
  def hashedTokenCounts(text: Column, dim: Int, maxN: Int = 1): Column = {
    require(dim >= 1, s"hashedTokenCounts: dim must be >= 1: $dim")
    graft.functions.VectorFunctions.hashedBow(
      tokens(text), dim, maxN, features = false)
  }

  /** Density-relative hashed bag-of-words features
    * x_b = dim · count_b / n — bucket density relative to uniform (mean
    * exactly 1 across buckets), the classifier/DSIR input representation.
    * The dim multiplier is a CONDITIONING choice, not cosmetics: with
    * plain count_b/n features (scale ~1/dim) the Gram spectrum splits
    * into the O(1) intercept direction and O(1/dim²)-eigenvalue feature
    * directions, and no single gradient step size serves both — measured
    * on the test corpora, plain-normalized LMS needs thousands of rounds
    * to move the feature weights. Density-relative features put every
    * direction at O(1)–O(dim) scale and the fixed default step converges
    * in tens of rounds. Each component is one exact integer-valued
    * multiply (count·dim) and one correctly-rounded IEEE divide, so any
    * engine computes the identical doubles — the kernel replicates the
    * exact (c·dim)/n evaluation order ([[graft.functions.HashedBow]]).
    */
  def hashedBowFeatures(text: Column, dim: Int, maxN: Int = 1): Column = {
    require(dim >= 1, s"hashedBowFeatures: dim must be >= 1: $dim")
    graft.functions.VectorFunctions.hashedBow(
      tokens(text), dim, maxN, features = true)
  }

  /** Margin score of a trained linear classifier: w·x + b with the
    * index-order accumulation (seed 0.0 — the same left-to-right
    * summation the DuckDB oracle's list_reduce uses, so the sign of the
    * margin is engine-exact). Weights ride as literals in the task
    * binary: scan-speed, shuffle-free. The dot product is the native
    * codegen'd [[graft.functions.VecDot]] (round 14 — the same
    * CodegenFallback-HOF finding that redesigned the trainer loop,
    * DESIGN §17.1, applied to the APPLY path: `aggregate(zip_with(...))`
    * is interpreted per row, which is exactly the hot scan expression a
    * 100 TB scoring pass runs; VecDot is bit-identical to the HOF fold
    * by its own contract and participates in whole-stage codegen).
    */
  def classifierScore(text: Column, weights: Array[Double], bias: Double,
                      dim: Int = 32): Column = {
    require(weights.length == dim,
      s"classifierScore: got ${weights.length} weights for dim $dim")
    val wl = array(weights.map(lit).toIndexedSeq: _*)
    graft.functions.VectorFunctions.vecDot(
      hashedBowFeatures(text, dim), wl) + lit(bias)
  }

  /** Train a linear classifier by `iters` full-batch gradient-descent
    * rounds on the squared loss L = (1/2n)·Σ (y − (w·x + b))² — batch
    * Widrow–Hoff LMS / the delta rule, the deterministic batch form of
    * the fasttext-shaped linear curation model (no sampling, no
    * learning-rate schedule: η is a fixed dyadic constant so every weight
    * update is reproducible arithmetic, and on a quadratic loss a
    * constant step below 2/λ_max converges monotonically — see the trait
    * scaladoc for why hinge subgradient was rejected). `positive` marks
    * the y = +1 class (e.g. a stopword-density teacher rule — distilling
    * an expensive gate into a scan-speed linear scorer); everything else
    * trains as y = −1.
    *
    * Round shape: the featurized corpus is localCheckpoint'ed ONCE and
    * its labeled projection compiled ONCE; each round is one shuffle-free
    * `mapPartitions` kernel job over it returning dim+1 partial Long sums
    * per partition, merged exactly on the driver (the [[lmsRoundsMulti]]
    * scaladoc has the measured round-14 redesign rationale — the
    * declarative round paid ~0.28 s/round of data-independent
    * interpreted-HOF floor). Total cost: iters linear scans, O(dim)
    * driver state — corpus-size-independent per-round work beyond the
    * scan itself.
    *
    * Engine-reproducibility: each row's gradient contribution
    * (y − s)·x_b — with the residual an exact double because s is the
    * index-order fold — is quantized per (row, dimension) to 2⁻²⁰ fixed
    * point ([[roundHalfUpToLong]], the exact `round(..)·cast(long)`
    * chain) and summed in exact integer arithmetic — order-independent,
    * so the learned trajectory is identical under any partitioning, and
    * the DuckDB oracle replays all rounds as a chained-CTE loop
    * (OracleClassifierSql) and hash-matches the weights to 6 dp. The
    * integer→double hop on the driver is exact while |Σ| < 2⁵³ and LOUD
    * past it; past ~2³³ rows·dim of addend mass per round (a 10¹⁰-doc
    * corpus) keep the update in BigDecimal on the driver, same contract.
    * The 2⁻²⁰ per-addend quantization (~10⁻⁶ relative) is far below the
    * 6-dp output rounding and does not compound: it IS the training
    * arithmetic, not an approximation of some other run.
    *
    * Step-size contract: η must be a power of two (exact double
    * arithmetic) and below 2/λ_max of the (1/n)·XᵀX Gram — divergence is
    * loud (weights blow up within a few rounds; the spec pins the
    * converged regime). The default 1/64 holds a ~1.5× margin on the
    * test corpora's measured λ_max ≈ 88 under the density-relative
    * feature scaling; a corpus with radically hotter buckets needs a
    * smaller dyadic step.
    */
  def classifierTrainVector(df: DataFrame, textCol: String, positive: Column,
                            dim: Int = 32, iters: Int = 64,
                            eta: Double = 1.0 / 64): (Array[Double], Double) = {
    requireTrainParams("classifierTrainVector", iters, eta)
    // null-text rows carry no features (every sum skips them) but would
    // still inflate the 1/n divisor — and the oracle's unnest drops them
    // entirely. Exclude them up front so both engines train on the same n.
    val base = graft.Cleanup.register(
      df.where(col(textCol).isNotNull)
        .select(hashedBowFeatures(col(textCol), dim).as("x"),
          when(positive, 1.0).otherwise(-1.0).as("y"))
        .localCheckpoint(false))
    val n = base.count()
    require(n > 0, "classifierTrainVector: empty corpus (no non-null text)")
    lmsRounds(base, col("y"), n, dim, iters, eta)
  }

  /** Sampled-shard training — the 100 TB retrain-cost escape hatch.
    *
    * COST CONTRACT (the reason this exists): [[classifierTrainVector]] is
    * `iters` full-corpus scans per (re)train — 64 scans of 100 TB for the
    * default configuration, ~6.4 PB of scan per retrain. Training on a
    * deterministic 1/k shard cuts that to iters/k corpus-scan-equivalents
    * while the learned weights still apply corpus-wide through the same
    * artifact seam ([[classifierWeightsFrom]] → [[classifierScoreWith]]);
    * the featurize+checkpoint base is also 1/k the footprint.
    *
    * WHEN THE SHARD IS SOUND: the LMS minimizer estimates a population
    * least-squares discriminant, so a shard train converges to the same
    * model up to O(1/√(n/k)) estimation noise PROVIDED the shard is
    * exchangeable with the corpus — i.e. selected independently of
    * content, labels, and features. An id-hash/modulus shard (the
    * `lshQualityCensus` quarantine pattern) satisfies that whenever ids
    * are assignment-order opaque. It is NOT sound when the shard key
    * correlates with content — time-ordered ids under distribution drift,
    * source-prefixed ids, or any key the teacher rule can see — and a
    * rare positive class needs k small enough that the shard keeps
    * hundreds of positives (class balance is preserved only in
    * expectation). Validate like any sampled estimator: compare the
    * shard-trained apply census against the full-trained one on a fixed
    * holdout (the docs_classifier_train_sampled query's census IS that
    * surface).
    *
    * DETERMINISM: identical to the full trainer — the shard predicate is
    * a pure column expression both engines evaluate identically, and the
    * trajectory over the shard is the same fixed-point chained-CTE replay
    * (OracleClassifierSql.sampledApplySql), so the sampled weights are
    * engine-exact, not "approximately reproducible".
    */
  def classifierTrainSampled(df: DataFrame, textCol: String, positive: Column,
                             shard: Column, dim: Int = 32, iters: Int = 64,
                             eta: Double = 1.0 / 64): (Array[Double], Double) =
    classifierTrainVector(df.where(shard), textCol, positive, dim, iters, eta)

  private def requireTrainParams(op: String, iters: Int, eta: Double): Unit = {
    require(iters >= 1, s"$op: iters must be >= 1: $iters")
    require(eta > 0 && java.lang.Double.isFinite(eta) &&
      math.abs(math.getExponent(eta)) <= 30 &&
      eta == math.pow(2, math.getExponent(eta)),
      s"$op: eta must be a dyadic power of two (exact double arithmetic): $eta")
  }

  /** Spark's `round(double)` → `cast(long)` chain, replicated exactly for
    * the round-loop kernel: Spark's Round on DoubleType evaluates
    * `java.math.BigDecimal.valueOf(v).setScale(0, HALF_UP)` (codegen and
    * interpreted paths both), and the long cast truncates the integral
    * double. Pinned equal to the SQL chain by the round-parity grid in
    * TextClassifierSpec ("kernel loop is bit-identical") over a
    * sign/tie/magnitude grid — the one place the kernel's arithmetic
    * could silently diverge from the DuckDB oracle's replay.
    *
    * FAST PATH (round 16): the BigDecimal chain string-formats every
    * double (BigDecimal.valueOf = new BigDecimal(Double.toString(v))),
    * and the JFR profile put ~68% of classifier_train in exactly that
    * (developLongDigits 32.5% + BigDecimal.<init> 25.4% + valueOf 5.2% +
    * the FloatingDecimal ThreadLocal 3.6%). For finite |v| < 2⁵² the
    * chain is computable in three FP ops, BIT-IDENTICAL by this
    * argument: (a) truncation t = v.toLong is exact (|v| < 2⁵² < 2⁶³);
    * (b) the fractional part |v| − |t| is EXACT by Sterbenz (t ≤ |v| <
    * t+1 ≤ 2t for t ≥ 1; trivial for t = 0), so comparing it to 0.5
    * decides "≥ half" on the TRUE binary value — never the
    * floor(x+0.5) double-rounding trap (0.49999999999999994 + 0.5 sums
    * to 1.0; no addition happens here); (c) the decimal the BigDecimal
    * chain rounds is the SHORTEST repr r of v, and r can sit on the
    * other side of (or exactly on) the k+0.5 boundary from v only if
    * parsing a decimal ≥/=/≤ k+0.5 yields v — impossible for |v| < 2⁵²,
    * where k+0.5 is itself exactly representable and parses to itself,
    * not to v. For finite |v| ≥ 2⁵² every double is integral: the chain
    * is the identity followed by the same saturating toLong. Non-finite
    * input delegates to the BigDecimal chain so NaN/±Inf keep throwing
    * the identical NumberFormatException. Parity: the spec grid plus a
    * round-16 adversarial + 2M-point seeded random sweep against the
    * BigDecimal chain (TextClassifierSpec).
    */
  private[graft] def roundHalfUpToLong(v: Double): Long =
    if (java.lang.Double.isFinite(v)) {
      if (v < 4503599627370496.0 && v > -4503599627370496.0) { // |v| < 2^52
        val t = v.toLong // exact truncation toward zero
        if (v >= 0) { if (v - t >= 0.5) t + 1 else t }
        else { if (t - v >= 0.5) t - 1 else t }
      } else v.toLong
    } else
      java.math.BigDecimal.valueOf(v)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** The shared LMS round loop over an already-featurized checkpoint
    * (`base` must carry the feature array `x`; each element of `ys` is a
    * ±1 label expression over base's columns — ONE entry for the binary
    * trainer, |classes| for one-vs-rest, all trained concurrently in the
    * SAME scan). Returns per-y (weights, bias) in `ys` order.
    *
    * ROUND SHAPE (round 14 — the fixed-cost redesign): the labeled
    * projection compiles ONCE into an InternalRow RDD; each round is one
    * `mapPartitions` kernel job over it — margin, residual and the
    * quantized gradient sums in plain `while` loops — returning
    * |ys|·(dim+1) partial Long sums per partition, merged exactly on the
    * driver in BigInt. NO per-round SQL machinery at all: the previous
    * declarative form paid ~0.28 s/round of data-independent floor at
    * sf0.1 (measured round 14) because the margin fold
    * (`aggregate(zip_with(...))`) is a CodegenFallback higher-order
    * function — interpreted, per-row, per-element boxing — and the
    * obvious fix (expanding the dot product to a codegen'd `element_at`
    * chain) was WORSE (~0.35-0.5 s/round: the optimizer inlines the
    * 64-op chain into each of the dim+1 aggregate expressions and every
    * round recompiles the blown-up tree). The kernel removes analysis,
    * optimization, codegen and AQE from the loop entirely; per-round
    * cost is one task wave over the checkpoint's partitions plus a
    * P·|ys|·(dim+1)-long collect. 64 rounds: 18.8 s → measured ~1 s at
    * sf0.1. At 100 TB each round is still exactly one linear scan of the
    * featurized checkpoint — now without a per-round driver stall
    * between scans, and one-vs-rest shares the scan across classes
    * (|iters| corpus scans, not |classes|·|iters|).
    *
    * ARITHMETIC IS BIT-IDENTICAL to the declarative form it replaces
    * (probe-verified weights-equal at sf0.1, oracle-replayed at every
    * SF): the margin is the same seed-0.0 left-to-right IEEE fold, the
    * residual quantization replicates Spark's round→cast chain exactly
    * ([[roundHalfUpToLong]]), partial sums are exact integers merged
    * order-independently, and the weight update applies the identical
    * long→double→divide chain. The 2⁵³ driver guard is LOUD where the
    * old decimal path silently truncated: a corpus past ~2³³ rows·dim of
    * addend mass per round must keep the update in BigDecimal (see
    * [[classifierTrainVector]]).
    */
  private def lmsRoundsMulti(base: DataFrame, ys: Seq[Column], n: Long,
                             dim: Int, iters: Int,
                             eta: Double): Seq[(Array[Double], Double)] = {
    val Q = 1048576.0 // 2^20: exact power-of-two fixed-point scale
    val nD = n.toDouble
    val nC = ys.size
    // the one compiled plan the whole loop scans: x plus every class's ±1
    // label materialized as doubles (WholeStageCodegen, compiled once —
    // the RDD lineage is fixed across rounds)
    val proj = base.select(
      (col("x") +: ys.zipWithIndex.map { case (y, c) => y.as(s"__y$c") }): _*)
    val rdd = proj.queryExecution.toRdd
    val ws = Array.fill(nC)(Array.fill(dim)(0.0))
    val bs = new Array[Double](nC)
    for (_ <- 1 to iters) {
      val wB = ws.map(_.clone())
      val bB = bs.clone()
      val (dimB, cB, qB) = (dim, nC, Q)
      // buffer-bound: |classes|·(dim+1) partial gradient sums per
      // partition (model grain, corpus-independent); Math.addExact makes
      // a partition overflowing 2^63 a loud task error, never a silent
      // wrap
      val partials = rdd.mapPartitions { it =>
        val sums = Array.fill(cB)(new Array[Long](dimB + 1))
        it.foreach { row =>
          val x = row.getArray(0).toDoubleArray()
          var c = 0
          while (c < cB) {
            val w = wB(c)
            var s = 0.0
            var i = 0
            while (i < dimB) { s += x(i) * w(i); i += 1 }
            val r = row.getDouble(1 + c) - (s + bB(c))
            val sc = sums(c)
            i = 0
            while (i < dimB) {
              sc(i) = Math.addExact(sc(i), roundHalfUpToLong(r * x(i) * qB))
              i += 1
            }
            sc(dimB) = Math.addExact(sc(dimB), roundHalfUpToLong(r * qB))
            c += 1
          }
        }
        Iterator.single(sums)
      }.collect()
      var c = 0
      while (c < nC) {
        var i = 0
        while (i <= dim) {
          // integer addition is associative: the BigInt merge is exact and
          // order-independent regardless of partitioning
          var tot = BigInt(0)
          partials.foreach(p => tot += p(c)(i))
          require(tot.abs < (BigInt(1) << 53),
            s"lmsRounds: per-round gradient sum $tot exceeds the exact " +
              "double range — keep the driver update in BigDecimal " +
              "(classifierTrainVector scaladoc)")
          val upd = eta * ((tot.toDouble / Q) / nD)
          if (i < dim) ws(c)(i) += upd else bs(c) += upd
          i += 1
        }
        c += 1
      }
    }
    ws.toIndexedSeq.zip(bs.toIndexedSeq).map { case (w, b) => (w, b) }
  }

  /** Binary form of [[lmsRoundsMulti]] — one label expression. */
  private def lmsRounds(base: DataFrame, y: Column, n: Long, dim: Int,
                        iters: Int, eta: Double): (Array[Double], Double) =
    lmsRoundsMulti(base, Seq(y), n, dim, iters, eta).head

  /** One-vs-rest multiclass training: one binary LMS probe per class over
    * ONE shared featurized checkpoint — the corpus featurizes and
    * materializes once, then each class runs its `iters` shuffle-free
    * round scans against it (|classes|·iters scans total; at 100 TB this
    * is the featurize-once discipline that makes multiclass affordable).
    * The canonical use is distilling a rule-based multiclass teacher
    * (e.g. the marker-count [[langId]]) into scan-speed linear probes.
    * Same determinism contract as [[classifierTrainVector]] per class.
    * Returns (class, weights, bias) in the caller's class order — the
    * order [[classifierPredict]] uses for tie-breaking.
    */
  def classifierTrainOneVsRest(df: DataFrame, textCol: String, label: Column,
                               classes: Seq[String], dim: Int = 32,
                               iters: Int = 16, eta: Double = 1.0 / 64)
      : Seq[(String, Array[Double], Double)] = {
    requireTrainParams("classifierTrainOneVsRest", iters, eta)
    require(classes.nonEmpty && classes.distinct == classes,
      s"classifierTrainOneVsRest: classes must be non-empty and distinct: $classes")
    val base = graft.Cleanup.register(
      df.where(col(textCol).isNotNull)
        .select(hashedBowFeatures(col(textCol), dim).as("x"), label.as("__lbl"))
        .localCheckpoint(false))
    val n = base.count()
    require(n > 0, "classifierTrainOneVsRest: empty corpus (no non-null text)")
    // ONE fused kernel scan per round for ALL classes (round 14): the
    // per-class trajectories are independent given the shared features,
    // so computing every class's residual and gradient sums in the same
    // pass changes no arithmetic — it cuts |classes|·iters corpus scans
    // to iters (at 100 TB: 24 scans instead of 72 for the default)
    val ys = classes.map(c => when(col("__lbl") === lit(c), 1.0).otherwise(-1.0))
    classes.zip(lmsRoundsMulti(base, ys, n, dim, iters, eta))
      .map { case (c, (w, b)) => (c, w, b) }
  }

  /** Multiclass prediction: argmax of the per-class margins, ties broken
    * to the EARLIEST class in `models` order (struct max over
    * (margin, -index) — margins are bit-identical index-order folds in
    * both engines, so the winner can never diverge). |models| feature
    * folds per row, all scan-speed literals. A null document predicts
    * NULL, matching [[classifierScore]]'s null propagation — without the
    * guard, every struct's margin field is null and the array_max tie
    * falls through to index 0, a plausible-looking wrong label
    * (round-10 advice finding).
    */
  def classifierPredict(text: Column, models: Seq[(String, Array[Double], Double)],
                        dim: Int = 32): Column = {
    require(models.nonEmpty, "classifierPredict: no models")
    val scored = models.zipWithIndex.map { case ((c, w, b), i) =>
      struct(classifierScore(text, w, b, dim).as("m"),
        lit(-i).as("ni"), lit(c).as("c"))
    }
    when(text.isNotNull, array_max(array(scored: _*)).getField("c"))
  }

  /** The trained weight vector as a relation: (pos, w) with pos ∈
    * [0, dim) the feature buckets and pos = dim the bias — the persistable
    * model artifact (at 100 TB: train once, write the (dim+1)-row table,
    * score every later batch through [[classifierScoreWith]]). Weights are
    * UNROUNDED exact doubles — parquet round-trips them bit-for-bit, so
    * the relational scorer reproduces the in-memory [[classifierScore]]
    * exactly (spec-pinned); query surfaces round for display.
    */
  def classifierWeights(df: DataFrame, textCol: String, positive: Column,
                        dim: Int = 32, iters: Int = 64,
                        eta: Double = 1.0 / 64): DataFrame = {
    val (w, b) = classifierTrainVector(df, textCol, positive, dim, iters, eta)
    classifierWeightsFrom(w, b, df.sparkSession)
  }

  /** The (pos, w) artifact layout from an already-trained vector — the
    * ONE place the pos-ordering/bias-at-dim convention is written, shared
    * by [[classifierWeights]] and callers holding a memoized train result.
    */
  def classifierWeightsFrom(w: Array[Double], bias: Double,
                            spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (w :+ bias).toIndexedSeq.zipWithIndex
      .map { case (x, i) => (i.toLong, x) }
      .toDF("pos", "w")
  }

  /** Score a corpus or STREAM against a persisted [[classifierWeights]]
    * relation — the apply half of the train-once/score-everywhere seam.
    * The (dim+1)-row model folds into one broadcast array (ordered by
    * pos, so the fold order — and therefore every scored double — is
    * bit-identical to [[classifierScore]] under the same weights;
    * spec-pinned). Stateless: a projection plus a broadcast 1-row cross
    * join, so the same call works unchanged on a streaming DataFrame
    * (static model side, zero state — the `calibrateQualityWith` rule;
    * batch/stream parity spec-pinned). A model relation of the wrong
    * width surfaces as a null `clf_score` — the size gate covers BOTH
    * directions (a too-narrow model would null-pad the zip anyway, but a
    * too-WIDE one would otherwise slice to a plausible-looking partial
    * dot product with a feature weight standing in for the bias;
    * spec-pinned).
    */
  def classifierScoreWith(df: DataFrame, textCol: String, model: DataFrame,
                          dim: Int = 32): DataFrame = {
    Seq("clf_score", "__wv").foreach(c =>
      require(!df.columns.contains(c), s"classifierScoreWith reserves column name '$c'"))
    // buffer-bound: dim+1 model weights (artifact grain, corpus-independent)
    val wv = model.agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("s"))
      .select(transform(col("s"), s => s("w")).as("__wv"))
    df.crossJoin(broadcast(wv))
      .withColumn("clf_score",
        when(size(col("__wv")) === dim + 1,
          // native codegen'd dot (classifierScore round-14 note) —
          // bit-identical to the HOF fold, scan-speed under codegen
          graft.functions.VectorFunctions.vecDot(
            hashedBowFeatures(col(textCol), dim), slice(col("__wv"), 1, dim))
            + element_at(col("__wv"), dim + 1)))
      .drop("__wv")
  }

  /** The one-vs-rest model as a relation: (cls, cls_idx, pos, w) with the
    * per-class layout of [[classifierWeightsFrom]] (pos ∈ [0, dim)
    * feature buckets, pos = dim the bias) plus `cls_idx` carrying the
    * tie-break order [[classifierPredict]] uses — the multiclass half of
    * the train-once/score-everywhere seam (the binary half is
    * [[classifierWeights]]; round-10's "seam-asymmetry" lesson: the
    * in-memory `Seq[(String, Array[Double], Double)]` could never leave
    * the driver that trained it, so every later crawl or stream had to
    * retrain). |classes|·(dim+1) rows; weights UNROUNDED exact doubles so
    * parquet round-trips them bit-for-bit and [[classifierPredictWith]]
    * reproduces [[classifierPredict]] exactly (spec-pinned).
    */
  def classifierWeightsMultiFrom(models: Seq[(String, Array[Double], Double)],
                                 spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    require(models.nonEmpty, "classifierWeightsMultiFrom: no models")
    models.zipWithIndex.flatMap { case ((c, w, b), ci) =>
      (w :+ b).toIndexedSeq.zipWithIndex.map { case (x, i) =>
        (c, ci.toLong, i.toLong, x) }
    }.toDF("cls", "cls_idx", "pos", "w")
  }

  /** Train one-vs-rest and return the persistable model relation — the
    * multiclass twin of [[classifierWeights]].
    */
  def classifierWeightsMulti(df: DataFrame, textCol: String, label: Column,
                             classes: Seq[String], dim: Int = 32,
                             iters: Int = 16, eta: Double = 1.0 / 64): DataFrame =
    classifierWeightsMultiFrom(
      classifierTrainOneVsRest(df, textCol, label, classes, dim, iters, eta),
      df.sparkSession)

  /** Predict classes for a corpus or STREAM against a persisted
    * [[classifierWeightsMulti]] relation — the apply half of the
    * multiclass seam. The |classes|·(dim+1)-row model folds into ONE
    * broadcast array of (cls_idx, cls, wv) structs ordered by cls_idx;
    * each row featurizes once (`__x` is a materialized column, so the
    * per-class lambda reads an attribute instead of re-running the
    * feature fold — the hashedBowFeatures HOF-hoisting rule) and takes
    * the same (margin, -idx) struct argmax as [[classifierPredict]], so
    * predictions are bit-identical under the same weights (spec-pinned).
    * Stateless — a projection plus a broadcast 1-row cross join — so the
    * same call scores a streaming DataFrame unchanged (static model
    * side, zero state; parity spec-pinned).
    *
    * Artifact-integrity guard: `clf_pred` is NULL (never a
    * plausible-looking label) when any class's weight vector has the
    * wrong width OR the cls_idx sequence is not contiguous from 0 — a
    * model relation missing a class's rows (a partial write, a bad
    * filter) or carrying duplicate positions must fail loudly, the
    * [[classifierScoreWith]] wrong-width rule extended to the dimension
    * relational multiclass artifacts add. Null text predicts null,
    * matching [[classifierPredict]].
    */
  def classifierPredictWith(df: DataFrame, textCol: String, model: DataFrame,
                            dim: Int = 32): DataFrame = {
    Seq("clf_pred", "__x", "__models").foreach(c =>
      require(!df.columns.contains(c), s"classifierPredictWith reserves column name '$c'"))
    val packed = model
      .groupBy(col("cls"), col("cls_idx"))
      // buffer-bound: dim+1 weights per class (artifact grain)
      .agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("s"))
      .select(struct(col("cls_idx"), col("cls"),
        transform(col("s"), x => x("w")).as("wv"),
        transform(col("s"), x => x("pos")).as("pv")).as("m"))
      // buffer-bound: |classes| packed models (artifact grain)
      .agg(sort_array(collect_list(col("m"))).as("__models"))
    // pv === [0..dim] is the full position-integrity check: it implies
    // the dim+1 width AND rejects duplicate-pos/missing-pos corruption a
    // bare width test passes (a pos=5 duplicate with pos=7 absent still
    // has dim+1 rows but misaligns every weight above it — round-11
    // review finding)
    val ok = size(col("__models")) >= 1 &&
      forall(col("__models"),
        m => m("pv") === sequence(lit(0L), lit(dim.toLong))) &&
      forall(zip_with(col("__models"),
          sequence(lit(0L), size(col("__models")).cast("long") - 1L),
          (m, i) => m("cls_idx") === i), x => x)
    val scored = transform(col("__models"), m =>
      struct(
        // VecDot inside the per-class lambda: the transform itself is
        // interpreted (|classes| elements — bounded), but each margin is
        // one tight primitive loop instead of a boxed per-element fold
        (graft.functions.VectorFunctions.vecDot(col("__x"), slice(m("wv"), 1, dim))
          + element_at(m("wv"), dim + 1)).as("m"),
        (-m("cls_idx")).as("ni"), m("cls").as("c")))
    df.crossJoin(broadcast(packed))
      .withColumn("__x", hashedBowFeatures(col(textCol), dim))
      .withColumn("clf_pred",
        when(col(textCol).isNotNull && ok, array_max(scored).getField("c")))
      .drop("__x", "__models")
  }

  /** Reliability census of a trained classifier — the calibration
    * diagram a model-gated curation stage ships next to its accuracy
    * number: margin buckets (0.25-wide, clamped to [-2, 2)) × how many
    * docs land there × how many are actually teacher-positive. Every
    * boundary is engine-exact: the margin is the index-order IEEE fold,
    * ×4 is a power-of-two multiply, floor of an exact double is exact,
    * and the clamp is integer — so the bucket assignment (and the whole
    * census) hash-oracles. One scan, one ≤17-key hash aggregate.
    */
  def classifierCalibration(df: DataFrame, textCol: String, positive: Column,
                            weights: Array[Double], bias: Double,
                            dim: Int = 32): DataFrame = {
    val sc = classifierScore(col(textCol), weights, bias, dim)
    val bkt = greatest(least(floor(sc * lit(4.0)).cast("long"), lit(7L)), lit(-8L))
    // null text ⇒ null margin ⇒ a null bucket row the oracle (whose
    // unnest drops tokenless docs) never sees — exclude it like training
    df.where(col(textCol).isNotNull)
      .select(bkt.as("bucket"), positive.as("__p"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__p"), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("pos_share_r",
        round(col("n_pos").cast("double") / col("n_docs").cast("double"), 4))
  }

  /** Per-bucket DSIR importance statistics: for each feature-hash bucket,
    * the target-subset token count, the whole-corpus token count, and the
    * smoothed importance ratio
    * lift_b = ((ct_b+1)/(Nt+dim)) / ((c_b+1)/(N+dim)) — the hashed-n-gram
    * importance model of Xie et al., in RATIO form rather than log form
    * (see [[dsirSelect]]). One corpus-scale integer census (posexplode of
    * the per-doc count array → one hash aggregate on the dim-bounded
    * bucket grain), localCheckpoint'ed at ≤dim rows so the scalar totals
    * (a 1-row aggregate OF the census, cross-joined back as a broadcast —
    * the repo's audited scalar idiom) never rescan the corpus. Buckets no
    * token hashed into still appear (left join against the full bucket
    * range) with the smoothing-only ratio, so the output is always exactly
    * `dim` rows. Returns (bucket, n_target, n_all, lift) with lift
    * UNROUNDED — query surfaces round it; [[dsirSelect]] consumes it
    * exactly.
    */
  def dsirBucketLift(df: DataFrame, textCol: String, target: Column,
                     dim: Int = 32, maxN: Int = 1): DataFrame = {
    require(dim >= 1, s"dsirBucketLift: dim must be >= 1: $dim")
    val hb = df.select(posexplode(hashedTokenCounts(col(textCol), dim, maxN))
        .as(Seq("bucket", "cnt")), target.as("__tgt"))
    // the ONE corpus-scale pass, materialized at ≤dim rows: census feeds
    // two plan branches (the roster join and the totals aggregate) and a
    // checkpoint keeps that from becoming two corpus scans
    val census = graft.Cleanup.register(
      hb.groupBy(col("bucket")).agg(
          sum(when(col("__tgt"), col("cnt")).otherwise(lit(0))).as("n_target"),
          sum(col("cnt")).as("n_all"))
        .localCheckpoint(false))
    val tots = census.agg(
      coalesce(sum(col("n_target")), lit(0L)).as("__nt"),
      coalesce(sum(col("n_all")), lit(0L)).as("__na"))
    val buckets = df.sparkSession.range(0, dim.toLong)
      .select(col("id").cast("int").as("bucket"))
    buckets.join(census, Seq("bucket"), "left")
      .select(col("bucket").cast("long").as("bucket"),
        coalesce(col("n_target"), lit(0L)).as("n_target"),
        coalesce(col("n_all"), lit(0L)).as("n_all"))
      .crossJoin(broadcast(tots))
      .withColumn("lift",
        ((col("n_target") + lit(1L)).cast("double") /
          (col("__nt") + lit(dim.toLong)).cast("double")) /
          ((col("n_all") + lit(1L)).cast("double") /
            (col("__na") + lit(dim.toLong)).cast("double")))
      .drop("__nt", "__na")
  }

  /** DSIR-shaped domain-targeted selection: rank every document by its
    * mean per-token importance ratio under the hashed bucket model —
    * weight(d) = Σ_b x_b · lift_b with x the length-normalized features —
    * and keep the top k (ties broken by id). This is the selection stage
    * of Data Selection via Importance Resampling [Xie et al. 2023] with
    * one deliberate, documented substitution: the canonical per-token
    * LOG-likelihood-ratio sum is a transcendental (ln's last-ulp rounding
    * is libm-private — the engine-reproducibility hazard `scoreDrift`
    * documents for its TVD choice), so the weight is the arithmetic-mean
    * ratio instead of the geometric-mean one. Both rank "looks like the
    * target distribution" upward; the ratio form is exact rational
    * arithmetic end-to-end, so the DuckDB oracle hash-matches the
    * selected set instead of wobbling on the boundary.
    *
    * Scale shape: one census pass (dim-bounded grain), the lift vector
    * rejoins as a broadcast 1-row array (never collected to the driver),
    * the weight is a scan-speed fold, and the top-k is
    * TakeOrderedAndProject — per-partition heaps, no corpus shuffle, no
    * window (the prioritySample posture; same topK-threshold caveat for
    * corpus-scale k). For actual importance RESAMPLING (sample ∝ weight
    * rather than take the argmax set) feed the weight column to
    * [[prioritySample]] — the two ops compose exactly.
    */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
                 target: Column, dim: Int = 32, k: Int = 50,
                 maxN: Int = 1): DataFrame = {
    require(k >= 1, s"dsirSelect: k must be >= 1: $k")
    dsirWeightWith(df, textCol,
        dsirBucketLift(df, textCol, target, dim, maxN), dim, maxN)
      .orderBy(col("dsir_w").desc, col(idCol).asc)
      .limit(k)
  }

  /** Weigh a corpus or STREAM against a persisted [[dsirBucketLift]]
    * artifact — the apply half of the DSIR seam (the bucket census is the
    * expensive corpus pass; new crawl batches re-acquire importance
    * weights against the FROZEN target model without rescanning the
    * reference corpus). The dim-row lift relation folds into one
    * broadcast array ordered by bucket, so every weight is the same
    * index-order IEEE fold [[dsirSelect]] computes (self-application
    * parity spec-pinned). Stateless — a projection plus a broadcast 1-row
    * cross join — so the same call works unchanged on a streaming
    * DataFrame (batch/stream parity spec-pinned).
    */
  def dsirWeightWith(df: DataFrame, textCol: String, lift: DataFrame,
                     dim: Int = 32, maxN: Int = 1): DataFrame = {
    Seq("dsir_w", "__lv").foreach(c =>
      require(!df.columns.contains(c), s"dsirWeightWith reserves column name '$c'"))
    val lv = lift
      // buffer-bound: dim lift buckets (artifact grain, corpus-independent)
      .agg(transform(sort_array(collect_list(struct(col("bucket"), col("lift")))),
        s => s("lift")).as("__lv"))
    df.crossJoin(broadcast(lv))
      .withColumn("dsir_w",
        // divide the density-relative features back by dim so the weight
        // is the plain per-token mean importance ratio — as a native
        // kernel (round 15, DESIGN §18: 1M probe 0.8 → 0.3 s) that keeps
        // the HOF's exact (x/dim)·l operation ORDER (folding the divide
        // into either side first is not bit-identical for non-power-of-
        // two dims)
        graft.functions.VectorFunctions.vecDotScaled(
          hashedBowFeatures(col(textCol), dim, maxN), col("__lv"),
          dim.toDouble))
      .drop("__lv")
  }
}
