package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `TextAnalysis` classifier partition (TextClassifier) — the
  * fasttext-shaped linear quality classifier and DSIR importance
  * reweighting. Pins:
  *  - the feature map's exact invariants (bucket counts partition the
  *    token count; density-relative features sum to exactly dim);
  *  - trained-classifier quality: 64 LMS rounds separate a
  *    token-expressible teacher rule to high accuracy, and the margin
  *    fold agrees with a driver-side dot product;
  *  - the load-bearing determinism claim: the training trajectory is
  *    BIT-IDENTICAL under repartitioning (the 2^-20 fixed-point decimal
  *    sums are order-independent — same contract powerIteration pins);
  *  - the dyadic-step and reserved-name guards;
  *  - DSIR censuses foot to the corpus token totals, the smoothed lift
  *    recomputes exactly from the emitted integer counts, and selection
  *    ranks target-distribution lookalikes above off-distribution docs,
  *    invariant under repartitioning.
  */
class TextClassifierSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  // 30 positive docs dominated by one marker token, 30 negatives drawn
  // from a disjoint vocabulary — a rule the hashed bag-of-words map can
  // express, so the linear probe ceiling is ~1.0
  private lazy val corpus = {
    val rnd = new scala.util.Random(7)
    val negVocab = Vector("red", "blue", "green", "iron", "stone", "wool")
    val pos = (0 until 30).map { i =>
      (i.toLong, ("ppp " * (3 + rnd.nextInt(4))) + negVocab(rnd.nextInt(6)))
    }
    val neg = (0 until 30).map { i =>
      ((100 + i).toLong,
        Seq.fill(4 + rnd.nextInt(4))(negVocab(rnd.nextInt(6))).mkString(" "))
    }
    (pos ++ neg).toDF("id", "text")
  }
  private val isPos = col("text").contains("ppp")

  test("hashedTokenCounts partitions the token count; features sum to dim") {
    val dim = 8
    val rows = corpus.select(
        size(TextAnalysis.tokens(col("text"))).as("n"),
        TextAnalysis.hashedTokenCounts(col("text"), dim).as("c"),
        TextAnalysis.hashedBowFeatures(col("text"), dim).as("x"))
      .select(col("n"),
        aggregate(col("c"), lit(0), (a, v) => a + v).as("csum"),
        aggregate(col("x"), lit(0.0), (a, v) => a + v).as("xsum"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) === r.getInt(0), "bucket counts must partition tokens")
      // sum_b dim*c_b/n: each addend is one IEEE divide of an integer
      // product; the sum is dim up to last-ulp accumulation only
      assert(math.abs(r.getDouble(2) - dim) < 1e-9, r)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.hashedTokenCounts(col("text"), 0)
    }
  }

  test("bigram feature map: gram counts partition 2t-1; features sum to dim") {
    val dim = 8
    val rows = corpus.select(
        size(TextAnalysis.tokens(col("text"))).as("t"),
        TextAnalysis.hashedTokenCounts(col("text"), dim, maxN = 2).as("c"),
        TextAnalysis.hashedBowFeatures(col("text"), dim, maxN = 2).as("x"))
      .select(col("t"),
        aggregate(col("c"), lit(0), (a, v) => a + v).as("csum"),
        aggregate(col("x"), lit(0.0), (a, v) => a + v).as("xsum"))
      .collect()
    rows.foreach { r =>
      // t unigrams + (t-1) bigrams; a 1-token doc has unigrams only
      assert(r.getInt(1) === 2 * r.getInt(0) - 1, r)
      assert(math.abs(r.getDouble(2) - dim) < 1e-9, r)
    }
    // bigram buckets must differ from the unigram-only map (word order
    // now matters): two docs with the same words in different orders get
    // identical unigram counts but different bigram counts
    val pair = Seq((1L, "red blue green"), (2L, "green blue red")).toDF("id", "text")
    val m = pair.select(col("id"),
        TextAnalysis.hashedTokenCounts(col("text"), 64, maxN = 1).as("u"),
        TextAnalysis.hashedTokenCounts(col("text"), 64, maxN = 2).as("g"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getSeq[Int](2))).toMap
    assert(m(1L)._1 === m(2L)._1, "unigram maps must agree on permuted docs")
    assert(m(1L)._2 !== m(2L)._2, "bigram maps must distinguish word order")
    intercept[IllegalArgumentException] {
      TextAnalysis.hashedTokenCounts(col("text"), 8, maxN = 3)
    }
  }

  test("HashedBow kernel is bit-identical to the round-13 HOF formulation " +
       "(counts and features, maxN 1 and 2, degenerate docs included)") {
    // the declarative formulation the kernel replaced, verbatim
    def gramBuckets(text: org.apache.spark.sql.Column, dim: Int, maxN: Int) = {
      val uni = transform(TextAnalysis.tokens(text),
        tk => pmod(xxhash64(tk), lit(dim.toLong)).cast("int"))
      if (maxN == 1) uni
      else {
        val ws = TextAnalysis.tokens(text)
        val bi = filter(
          zip_with(ws, slice(ws, 2, 1073741823), (a, b) =>
            when(b.isNotNull,
              pmod(xxhash64(concat(a, lit(" "), b)), lit(dim.toLong)).cast("int"))),
          h => h.isNotNull)
        concat(uni, bi)
      }
    }
    def bucketIncr(acc: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      transform(acc, (c, i) => when(i === b, c + 1).otherwise(c))
    def hofCounts(text: org.apache.spark.sql.Column, dim: Int, maxN: Int) =
      aggregate(gramBuckets(text, dim, maxN), array_repeat(lit(0), dim), bucketIncr)
    def hofFeatures(text: org.apache.spark.sql.Column, dim: Int, maxN: Int) =
      aggregate(gramBuckets(text, dim, maxN),
        struct(array_repeat(lit(0), dim).as("a"), lit(0).as("n")),
        (acc, b) => struct(bucketIncr(acc("a"), b).as("a"),
          (acc("n") + lit(1)).as("n")),
        acc => transform(acc("a"),
          c => (c.cast("double") * lit(dim.toDouble)) / acc("n").cast("double")))
    import spark.implicits._
    val tricky = corpus.select(col("text")).unionByName(Seq(
      "", "   ", "one", "a  b   c", null.asInstanceOf[String],
      "x " + ("y " * 40) + "z").toDF("text"))
    for (dim <- Seq(8, 32); maxN <- Seq(1, 2)) {
      val rows = tricky.select(
        TextAnalysis.hashedTokenCounts(col("text"), dim, maxN).as("kc"),
        hofCounts(col("text"), dim, maxN).as("hc"),
        TextAnalysis.hashedBowFeatures(col("text"), dim, maxN).as("kf"),
        hofFeatures(col("text"), dim, maxN).as("hf")).collect()
      rows.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1) &&
          (r.isNullAt(0) || r.getSeq[Int](0) == r.getSeq[Int](1)),
          s"counts diverge at dim=$dim maxN=$maxN: $r")
        assert(r.isNullAt(2) == r.isNullAt(3) &&
          (r.isNullAt(2) || r.getSeq[Double](2) == r.getSeq[Double](3)),
          s"features diverge at dim=$dim maxN=$maxN: $r")
      }
    }
  }

  test("training separates the teacher rule; score matches a driver fold") {
    val (w, b) = TextAnalysis.classifierTrainVector(
      corpus, "text", isPos, dim = 16, iters = 64, eta = 1.0 / 64)
    graft.Cleanup.drain()
    assert(w.forall(java.lang.Double.isFinite) && java.lang.Double.isFinite(b))
    val scored = corpus.select(isPos.as("y"),
        TextAnalysis.classifierScore(col("text"), w, b, dim = 16).as("s"),
        TextAnalysis.hashedBowFeatures(col("text"), 16).as("x"))
      .collect()
    val acc = scored.count(r => (r.getDouble(1) > 0) == r.getBoolean(0)) /
      scored.length.toDouble
    assert(acc >= 0.95, s"linear probe should separate the marker rule: $acc")
    // the margin column IS the index-order fold: replay one row on the
    // driver in the same order and demand bit equality
    val r0 = scored.head
    val x0 = r0.getSeq[Double](2)
    val manual = x0.indices.foldLeft(0.0)((a, i) => a + x0(i) * w(i)) + b
    assert(r0.getDouble(1) === manual)
  }

  test("training trajectory is bit-identical under repartitioning") {
    val (w1, b1) = TextAnalysis.classifierTrainVector(
      corpus, "text", isPos, dim = 8, iters = 12)
    val (w2, b2) = TextAnalysis.classifierTrainVector(
      corpus.repartition(7), "text", isPos, dim = 8, iters = 12)
    graft.Cleanup.drain()
    assert(w1.toSeq === w2.toSeq, "decimal fixed-point sums must be order-independent")
    assert(b1 === b2)
  }

  test("round-14 kernel loop is bit-identical to the round-13 declarative " +
       "form; roundHalfUpToLong replicates round().cast(long) exactly") {
    // the one place the kernel could silently diverge from the DuckDB
    // oracle replay: Spark's Round(double) evaluates
    // BigDecimal.valueOf(v).setScale(0, HALF_UP) — NOT math.round, whose
    // floor(x+0.5) rounds -2.5 to -2 where HALF_UP gives -3. Grid over
    // signs, exact ties, near-ties and large magnitudes.
    val grid = Seq(0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 0.49999999999,
      -0.49999999999, 1e15 + 0.5, -(1e15 + 0.5), 123456.789, -123456.789,
      3.0000000000000004, -3.0000000000000004, 7.499999999999999,
      -7.499999999999999, 1e-12, -1e-12)
    val sparkVals = spark.range(1).select(
      grid.zipWithIndex.map { case (v, i) =>
        round(lit(v)).cast("long").as(s"v$i") }: _*).collect().head
    grid.zipWithIndex.foreach { case (v, i) =>
      assert(sparkVals.getLong(i) === TextAnalysis.roundHalfUpToLong(v),
        s"round parity broken at $v")
    }
    // round-16 fast-path pin: the kernel's 3-FP-op path must equal the
    // reference BigDecimal chain on every finite double — adversarial
    // boundary set (exact ties, ties ± 1 ulp, shortest-repr traps, the
    // 2^52 integrality frontier, subnormals, ± long range) plus a seeded
    // 2M-point random sweep over the magnitudes the trainers emit
    def ref(v: Double): Long = java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
    val ulps = Seq(-2, -1, 0, 1, 2)
    val bases = (0 to 60).map(k => math.pow(2, k) + 0.5) ++
      Seq(0.5, 1.5, 2.5, 0.49999999999999994, 1.4999999999999998,
        4503599627370495.5, 4503599627370496.0, 9007199254740991.0,
        9.223372036854776E18, 1e19, java.lang.Double.MIN_VALUE,
        java.lang.Double.MIN_NORMAL, 0.0, -0.0)
    def ulpShift(x: Double, u: Int): Double =
      if (u == 0) x
      else if (u > 0) (1 to u).foldLeft(x)((a, _) => Math.nextUp(a))
      else (1 to -u).foldLeft(x)((a, _) => Math.nextDown(a))
    val adversarial = for {
      b <- bases; u <- ulps; s <- Seq(1.0, -1.0)
    } yield s * ulpShift(b, u)
    adversarial.foreach { v =>
      assert(TextAnalysis.roundHalfUpToLong(v) === ref(v),
        s"fast-path parity broken at $v (bits ${java.lang.Double.doubleToRawLongBits(v)})")
    }
    val rnd = new java.util.Random(20260819L)
    var i = 0
    while (i < 2000000) {
      // magnitudes spanning the trainers' addends: r·x·2^20 lands in
      // ~[1e-6, 1e12]; also sweep raw uniform bits for full coverage
      val v =
        if (i % 3 == 0) (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(14) - 1)
        else if (i % 3 == 1) rnd.nextLong().toDouble / (1L << rnd.nextInt(40))
        else java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (java.lang.Double.isFinite(v))
        assert(TextAnalysis.roundHalfUpToLong(v) === ref(v),
          s"fast-path parity broken at $v (bits ${java.lang.Double.doubleToRawLongBits(v)})")
      i += 1
    }
    // the full declarative round-13 loop, replayed verbatim over the
    // same featurized checkpoint — the kernel must reproduce every bit
    val dim = 8; val iters = 12; val eta = 1.0 / 64
    val base = graft.Cleanup.register(
      corpus.where(col("text").isNotNull)
        .select(TextAnalysis.hashedBowFeatures(col("text"), dim).as("x"),
          when(isPos, 1.0).otherwise(-1.0).as("y"))
        .localCheckpoint(false))
    val n = base.count()
    val Q = 1048576.0
    var w = Array.fill(dim)(0.0)
    var bias = 0.0
    for (_ <- 1 to iters) {
      val wl = array(w.map(lit).toIndexedSeq: _*)
      val sc = aggregate(zip_with(col("x"), wl, (x, wc) => x * wc),
        lit(0.0), (a, v) => a + v) + lit(bias)
      val scored = base.select(col("x"), (col("y") - sc).as("__r"))
      val aggs = (0 until dim).map(i =>
        sum(round(col("__r") * element_at(col("x"), i + 1) * lit(Q))
          .cast("long").cast("decimal(27,0)")).as(s"s$i")) :+
        sum(round(col("__r") * lit(Q)).cast("long").cast("decimal(27,0)")).as("sb")
      val row = scored.agg(aggs.head, aggs.tail: _*).collect().head
      w = Array.tabulate(dim)(i =>
        w(i) + eta * ((row.getDecimal(i).longValue().toDouble / Q) / n.toDouble))
      bias = bias + eta * ((row.getDecimal(dim).longValue().toDouble / Q) / n.toDouble)
    }
    val (wk, bk) = TextAnalysis.classifierTrainVector(
      corpus, "text", isPos, dim = dim, iters = iters, eta = eta)
    graft.Cleanup.drain()
    assert(wk.toSeq === w.toSeq,
      "kernel trajectory must equal the declarative trajectory bit-for-bit")
    assert(bk === bias)
  }

  test("guards: dyadic step, positive iters, empty corpus") {
    intercept[IllegalArgumentException] {   // 0.01 is not a power of two
      TextAnalysis.classifierTrainVector(corpus, "text", isPos, eta = 0.01)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.classifierTrainVector(corpus, "text", isPos, iters = 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.classifierTrainVector(
        corpus.filter(lit(false)), "text", isPos)
    }
    graft.Cleanup.drain()
  }

  test("dsirBucketLift: dim rows, censuses foot, lift recomputes exactly") {
    val dim = 8
    val out = TextAnalysis.dsirBucketLift(corpus, "text", isPos, dim).collect()
    assert(out.length === dim)
    assert(out.map(_.getLong(0)).sorted.toSeq === (0L until dim))
    val totalTokens = corpus
      .agg(sum(size(TextAnalysis.tokens(col("text"))))).head.getLong(0)
    val targetTokens = corpus.filter(isPos)
      .agg(sum(size(TextAnalysis.tokens(col("text"))))).head.getLong(0)
    assert(out.map(_.getLong(2)).sum === totalTokens)
    assert(out.map(_.getLong(1)).sum === targetTokens)
    out.foreach { r =>
      val want = ((r.getLong(1) + 1).toDouble / (targetTokens + dim).toDouble) /
        ((r.getLong(2) + 1).toDouble / (totalTokens + dim).toDouble)
      assert(r.getDouble(3) === want, "lift must be the exact smoothed ratio")
    }
  }

  test("classifierScoreWith reproduces the literal scorer bit-for-bit " +
       "through a parquet round-trip, batch and stream") {
    val (w, b) = TextAnalysis.classifierTrainVector(
      corpus, "text", isPos, dim = 8, iters = 8)
    graft.Cleanup.drain()
    val want = corpus.select(col("id"),
        TextAnalysis.classifierScore(col("text"), w, b, dim = 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the persisted-artifact contract: write the weight RELATION, read it
    // back, and demand the relational scorer's doubles are bit-identical
    val dir = java.nio.file.Files.createTempDirectory("clfw").toString
    TextAnalysis.classifierWeights(corpus, "text", isPos, dim = 8, iters = 8)
      .write.mode("overwrite").parquet(dir)
    graft.Cleanup.drain()
    val model = spark.read.parquet(dir)
    val got = TextAnalysis.classifierScoreWith(corpus, "text", model, dim = 8)
      .select(col("id"), col("clf_score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === want)
    // stateless ⇒ the same call runs unchanged on a stream with parity
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    in.addData(corpus.collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq: _*)
    val q = TextAnalysis.classifierScoreWith(
        in.toDF().toDF("id", "text"), "text", model, dim = 8)
      .writeStream.format("memory").queryName("clf_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("clf_stream").select(col("id"), col("clf_score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed === want)
    intercept[IllegalArgumentException] {
      TextAnalysis.classifierScoreWith(
        corpus.withColumn("clf_score", lit(0.0)), "text", model, dim = 8)
    }
    // a wrong-WIDTH model must surface as null scores, never a partial
    // dot product with a feature weight standing in for the bias
    val wide = TextAnalysis.classifierWeightsFrom(
      Array.fill(16)(0.5), 0.25, spark) // 17 rows against dim = 8
    val wideScores = TextAnalysis.classifierScoreWith(corpus, "text", wide, dim = 8)
      .select(col("clf_score")).collect()
    assert(wideScores.forall(_.isNullAt(0)))
  }

  test("null-text rows are excluded from training (oracle population parity)") {
    val withNull = corpus.unionByName(
      Seq((999L, null.asInstanceOf[String])).toDF("id", "text"))
    val (w1, b1) = TextAnalysis.classifierTrainVector(
      corpus, "text", isPos, dim = 8, iters = 4)
    val (w2, b2) = TextAnalysis.classifierTrainVector(
      withNull, "text", isPos, dim = 8, iters = 4)
    graft.Cleanup.drain()
    assert(w1.toSeq === w2.toSeq && b1 === b2,
      "a featureless null-text row must not inflate the 1/n divisor")
    intercept[IllegalArgumentException] {   // all-null corpus is loud
      TextAnalysis.classifierTrainVector(
        Seq((1L, null.asInstanceOf[String])).toDF("id", "text"), "text", isPos)
    }
  }

  test("one-vs-rest: separable 3-class teacher learned; per-class chain " +
       "equals the binary trainer; argmax ties break to earliest class") {
    val rnd = new scala.util.Random(11)
    val mk = Vector("alpha", "bravo", "carol")
    val tri = (0 until 90).map { i =>
      val c = i % 3
      (i.toLong, (s"${mk(c)} " * (3 + rnd.nextInt(3))) + s"w${rnd.nextInt(9)}", mk(c))
    }.toDF("id", "text", "cls")
    val models = TextAnalysis.classifierTrainOneVsRest(
      tri, "text", col("cls"), mk, dim = 16, iters = 16)
    val pred = tri.select(col("cls"),
        TextAnalysis.classifierPredict(col("text"), models, dim = 16).as("p"))
      .collect()
    val acc = pred.count(r => r.getString(0) == r.getString(1)) / pred.length.toDouble
    assert(acc >= 0.95, s"separable marker classes must be learned: $acc")
    // each class's probe is EXACTLY the binary trainer under the same
    // one-vs-rest label (the shared-checkpoint refactor changes nothing)
    val (wb, bb) = TextAnalysis.classifierTrainVector(
      tri, "text", col("cls") === "bravo", dim = 16, iters = 16)
    graft.Cleanup.drain()
    val mb = models.find(_._1 == "bravo").get
    assert(mb._2.toSeq === wb.toSeq && mb._3 === bb)
    // exact-margin ties go to the EARLIEST model in order
    val tied = Seq(("z", Array.fill(4)(0.0), 1.0), ("a", Array.fill(4)(0.0), 1.0))
    val winner = tri.limit(1).select(
      TextAnalysis.classifierPredict(col("text"), tied, dim = 4)).head.getString(0)
    assert(winner === "z", "tie must break to the first model, not alphabetically")
    intercept[IllegalArgumentException] {
      TextAnalysis.classifierTrainOneVsRest(tri, "text", col("cls"),
        Seq("a", "a"), dim = 4)
    }
  }

  test("classifierCalibration: census foots, buckets clamped, share exact") {
    val (w, b) = TextAnalysis.classifierTrainVector(
      corpus, "text", isPos, dim = 8, iters = 8)
    graft.Cleanup.drain()
    val rows = TextAnalysis.classifierCalibration(
      corpus, "text", isPos, w, b, dim = 8).collect()
    assert(rows.map(_.getLong(1)).sum === corpus.count())
    assert(rows.map(_.getLong(2)).sum === corpus.filter(isPos).count())
    rows.foreach { r =>
      assert(r.getLong(0) >= -8 && r.getLong(0) <= 7, r)
      val want = BigDecimal(r.getLong(2).toDouble / r.getLong(1).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === want, r)
    }
  }

  test("dsirWeightWith self-application equals dsirSelect's weights; " +
       "streaming parity") {
    val lift = TextAnalysis.dsirBucketLift(corpus, "text", isPos, dim = 8)
    val viaWith = TextAnalysis.dsirWeightWith(corpus, "text", lift, dim = 8)
      .select(col("id"), col("dsir_w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaSelect = TextAnalysis.dsirSelect(corpus, "id", "text", isPos,
        dim = 8, k = corpus.count().toInt)
      .select(col("id"), col("dsir_w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.Cleanup.drain()
    assert(viaWith === viaSelect)
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("dsirl").toString
    lift.write.mode("overwrite").parquet(dir)
    graft.Cleanup.drain()
    val frozen = spark.read.parquet(dir)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    in.addData(corpus.collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq: _*)
    val q = TextAnalysis.dsirWeightWith(
        in.toDF().toDF("id", "text"), "text", frozen, dim = 8)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dsir_stream").select(col("id"), col("dsir_w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed === viaWith)
  }

  test("dsirSelect ranks target lookalikes first, repartition-invariant") {
    // 3 labeled target docs of pure marker text; 3 unlabeled lookalikes;
    // 6 off-distribution docs — selection must prefer the lookalikes
    val df = (
      (0 until 3).map(i => (i.toLong, "tgt tgt tgt", true)) ++
      (10 until 13).map(i => (i.toLong, "tgt tgt misc", false)) ++
      (20 until 26).map(i => (i.toLong, "red blue green iron", false))
    ).toDF("id", "text", "is_t")
    val top = TextAnalysis.dsirSelect(df, "id", "text", col("is_t"),
      dim = 8, k = 6).select("id").as[Long].collect().toSet
    assert(top === Set(0L, 1L, 2L, 10L, 11L, 12L),
      s"top-6 must be the target docs plus the lookalikes: $top")
    val top2 = TextAnalysis.dsirSelect(df.repartition(5), "id", "text",
      col("is_t"), dim = 8, k = 6).select("id").as[Long].collect().toSet
    assert(top2 === top)
    intercept[IllegalArgumentException] {
      TextAnalysis.dsirSelect(df.withColumn("dsir_w", lit(1)),
        "id", "text", col("is_t"))
    }
  }

  test("classifierPredictWith reproduces classifierPredict bit-for-bit " +
       "through a parquet round-trip, batch and stream; guards fire") {
    val rnd = new scala.util.Random(13)
    val mk = Vector("alpha", "bravo", "carol")
    val tri = (0 until 90).map { i =>
      val c = i % 3
      (i.toLong, (s"${mk(c)} " * (3 + rnd.nextInt(3))) + s"w${rnd.nextInt(9)}", mk(c))
    }.toDF("id", "text", "cls")
    val models = TextAnalysis.classifierTrainOneVsRest(
      tri, "text", col("cls"), mk, dim = 16, iters = 16)
    graft.Cleanup.drain()
    val want = tri.select(col("id"),
        TextAnalysis.classifierPredict(col("text"), models, dim = 16).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the persisted-artifact contract: write the (cls, cls_idx, pos, w)
    // RELATION, read it back, and demand identical labels
    val dir = java.nio.file.Files.createTempDirectory("clfm").toString
    TextAnalysis.classifierWeightsMultiFrom(models, spark)
      .write.mode("overwrite").parquet(dir)
    val model = spark.read.parquet(dir)
    def predictions(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.classifierPredictWith(df, "text", model, dim = 16)
        .select(col("id"), col("clf_pred"))
    val got = predictions(tri).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === want)
    // null text predicts NULL — matching classifierPredict's round-11
    // null propagation (both paths, pinned here side by side)
    val withNull = Seq((999L, null.asInstanceOf[String], "x")).toDF("id", "text", "cls")
    assert(predictions(withNull).collect().forall(_.isNullAt(1)))
    assert(withNull.select(TextAnalysis.classifierPredict(
        col("text"), models, dim = 16)).collect().forall(_.isNullAt(0)))
    // stateless ⇒ the same call runs unchanged on a stream with parity
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    in.addData(tri.select(col("id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq: _*)
    val q = TextAnalysis.classifierPredictWith(
        in.toDF().toDF("id", "text"), "text", model, dim = 16)
      .select(col("id"), col("clf_pred"))
      .writeStream.format("memory").queryName("clfm_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("clfm_stream")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed === want)
    // reserved-name guard
    intercept[IllegalArgumentException] {
      TextAnalysis.classifierPredictWith(
        tri.withColumn("clf_pred", lit("x")), "text", model, dim = 16)
    }
    // wrong-WIDTH artifact (a class with dim+1 ≠ expected rows) must
    // surface as null labels, never a partial-dot-product argmax
    val wide = TextAnalysis.classifierWeightsMultiFrom(
      mk.map(c => (c, Array.fill(16)(0.5), 0.25)), spark) // 17-wide vs dim=8
    assert(TextAnalysis.classifierPredictWith(tri, "text", wide, dim = 8)
      .select(col("clf_pred")).collect().forall(_.isNullAt(0)))
    // MISSING-CLASS artifact (one class's rows filtered away leaves a
    // cls_idx gap) must also null out — a partial write or bad filter
    // may never silently re-label a corpus with the surviving classes
    val gap = model.filter(col("cls") =!= "bravo")
    assert(TextAnalysis.classifierPredictWith(tri, "text", gap, dim = 16)
      .select(col("clf_pred")).collect().forall(_.isNullAt(0)))
    // DUPLICATE-POS artifact: same dim+1 row count per class (a bare
    // width check passes), but a pos appears twice and another is
    // missing — sort_array misaligns every weight above the duplicate,
    // so the position-integrity guard must null out, never mis-score
    // (round-11 review finding)
    val dup = model.withColumn("pos",
      when(col("cls") === "bravo" && col("pos") === 7L, lit(5L))
        .otherwise(col("pos")))
    assert(TextAnalysis.classifierPredictWith(tri, "text", dup, dim = 16)
      .select(col("clf_pred")).collect().forall(_.isNullAt(0)))
  }
}
