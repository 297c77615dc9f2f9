package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}
  import spark.implicits._

  test("fingerprint matches an independent Scala implementation") {
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)
    val samples = Seq("hello world", "a", "the quick brown fox", "x y z")
    val got = samples.toDF("text")
      .select(TextAnalysis.fingerprint($"text")).as[Long].collect()
    assert(got.toSeq == samples.map(ref))
  }

  test("token and subword counts") {
    val df = Seq("one two  three", "a-b c3d!").toDF("text")
    val got = df.select(
      TextAnalysis.tokenCount($"text"),
      TextAnalysis.subwordCount($"text")).as[(Int, Int)].collect()
    assert(got(0) == ((3, 3)))
    // "a-b c3d!" -> subwords: a, -, b, c, 3, d, !
    assert(got(1) == ((2, 7)))
  }

  test("langId: argmax with deterministic alphabetical tie-break") {
    val got = Seq(
      "the fast thing and the slow thing", // en markers dominate
      "le la et de vite",                  // fr markers dominate
      "nomatchtokens whatsoever",          // all-zero tie -> 'de' (alphabetical)
    ).toDF("text").select(TextAnalysis.langId($"text")).as[String].collect()
    assert(got(0) == "en")
    assert(got(1) == "fr")
    assert(got(2) == "de")
  }

  test("quality score components are bounded and composite is in [0,1]") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val q = TextAnalysis.qualityScore(docs, "text")
      .select("n_tokens", "punct_ratio", "stopword_ratio", "quality_score")
      .as[(Int, Double, Double, Double)].collect()
    q.foreach { case (n, p, s, score) =>
      assert(n > 0)
      assert(p >= 0 && p <= 1); assert(s >= 0 && s <= 1)
      assert(score >= 0 && score <= 1)
    }
    assert(q.exists(_._4 > 0)) // corpus isn't uniformly zero-quality
  }

  test("normalize: tags stripped, URLs/emails redacted, ws collapsed, idempotent") {
    val cases = Seq(
      "<p>Hello <b>World</b></p>" -> "hello world",
      "see https://example.com/a?b=1 now" -> "see [url] now",
      "mail Bob.Smith+x@corp.example please" -> "mail [email] please",
      "tabs\tand\u0001ctl  chars" -> "tabs and ctl chars",
      "  already clean  " -> "already clean",
    )
    val got = cases.map(_._1).toDF("text")
      .select(TextAnalysis.normalize($"text")).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
    // idempotence: normalizing normalized text is a no-op
    val again = got.toSeq.toDF("text")
      .select(TextAnalysis.normalize($"text")).as[String].collect()
    assert(again.toSeq == got.toSeq)
  }

  test("packBins: doc straddling the budget starts in its first token's bin; partitions restart") {
    // budget 10; partition A: docs of 4,4,4 tokens -> cum 4,8,12 ->
    // bins floor(0/10)=0, floor(4/10)=0, floor(8/10)=0 (third STARTS at
    // token 8, inside bin 0, despite ending at 12); then 9 tokens ->
    // starts at 12 -> bin 1. Partition B restarts at bin 0.
    val df = Seq(
      ("A", 1L, "w w w w"), ("A", 2L, "w w w w"), ("A", 3L, "w w w w"),
      ("A", 4L, "w w w w w w w w w"),
      ("B", 5L, "w w"),
    ).toDF("part", "doc_id", "text")
    val got = TextAnalysis.packBins(df, "doc_id", "text", 10L, Seq("part"))
      .select($"doc_id", $"bin").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
  }

  test("splitAssignment: content-keyed, order-stable, roughly proportional") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val splits = docs.select($"text", TextAnalysis.splitAssignment($"text").as("s"))
    val byText = splits.as[(String, String)].collect().toMap
    // same content -> same split even through a reshuffle
    val reshuffled = docs.repartition(7)
      .select($"text", TextAnalysis.splitAssignment($"text").as("s"))
      .as[(String, String)].collect().toMap
    assert(reshuffled == byText)
    // proportions near 90/5/5 (content-hash, so only approximately)
    val counts = splits.groupBy($"s").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.8, s"train share off: $counts")
    assert(counts.keySet == Set("train", "val", "test"), s"missing split: $counts")
  }

  test("decontaminationScore: full, partial, and zero containment") {
    val docs = Seq(
      (1L, "a b c d e"),      // benchmark doc
      (2L, "a b c d e"),      // exact leak: containment 1.0
      (3L, "a b c x y z w"),  // shares only gram "a b c" (1 of 5)
      (4L, "q r s t u"),      // disjoint: 0.0
    ).toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" === 1L)
    val got = TextAnalysis.decontaminationScore(docs, bench, "doc_id", "text", 3)
      .select($"doc_id", $"containment").as[(Long, Double)].collect().toMap
    assert(got(2L) == 1.0)
    assert(got(3L) == 0.2) // 1 shared gram of 5 distinct grams
    assert(got(4L) == 0.0)
  }

  test("repetitionRatio: repeated bigrams raise the ratio, unique text stays 0") {
    val got = Seq(
      "a b a b a b",   // bigrams: ab ba ab ba ab -> 2 distinct of 5 -> 0.6
      "a b c d e f",   // all distinct -> 0.0
      "w",             // single token -> degenerate 0.0
    ).toDF("text")
      .select(TextAnalysis.repetitionRatio($"text", 2)).as[Double].collect()
    assert(got.toSeq == Seq(0.6, 0.0, 0.0))
  }

  test("stratifiedSample: content-keyed, rate-bounded, edge rates are all-or-nothing") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = docs.count()
    // rate 1000 keeps everything, rate 0 drops everything
    assert(TextAnalysis.stratifiedSample(docs, "lang", "text", Map.empty, 1000).count() == n)
    assert(TextAnalysis.stratifiedSample(docs, "lang", "text", Map.empty, 0).count() == 0)
    // partition-layout independence: identical sample through a reshuffle
    val rates = Map("en" -> 200, "fr" -> 700)
    val a = TextAnalysis.stratifiedSample(docs, "lang", "text", rates, 300)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val b = TextAnalysis.stratifiedSample(docs.repartition(7), "lang", "text", rates, 300)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // a stratum's sample at a lower rate is a SUBSET of its higher-rate
    // sample (bucket < r is monotone in r) — the property that lets a
    // pipeline re-mix proportions without resampling from scratch
    val small = TextAnalysis.stratifiedSample(docs, "lang", "text", Map("en" -> 100), 300)
      .filter($"lang" === "en").select($"doc_id").as[Long].collect().toSet
    val large = TextAnalysis.stratifiedSample(docs, "lang", "text", Map("en" -> 500), 300)
      .filter($"lang" === "en").select($"doc_id").as[Long].collect().toSet
    assert(small.subsetOf(large))
    assert(small.size < large.size)
    // out-of-range rate fails fast
    intercept[IllegalArgumentException] {
      TextAnalysis.stratifiedSample(docs, "lang", "text", Map("en" -> 1001), 300)
    }
  }

  test("topTermsPerDoc: tf/df ranking with term tie-break") {
    val df = Seq(
      (1L, "x x x common rare"),  // tf(x)=3 df(x)=2; rare: tf=1 df=1
      (2L, "x common common zz"), // common df=3
      (3L, "common zz"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topTermsPerDoc(df, "doc_id", "text", 2)
      .select($"doc_id", $"rnk", $"term").as[(Long, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // doc 1: x 3/2=1.5 > rare 1/1=1.0 > common 1/3
    assert(got(1L) == Seq("x", "rare"))
    // doc 2: zz 1/2=0.5 < common 2/3=0.667 ; x 1/2=0.5 — tie zz/x broken by
    // term asc -> x before zz
    assert(got(2L) == Seq("common", "x"))
    // doc 3: zz 0.5 vs common 1/3 -> zz first
    assert(got(3L) == Seq("zz", "common"))
  }

  test("topNGrams: document frequency (repeats inside one doc count once)") {
    val df = Seq(
      (1L, "a b a b"),   // bigrams {a b, b a} — "a b" appears twice, counted once
      (2L, "a b c"),     // {a b, b c}
      (3L, "b c d"),     // {b c, c d}
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topNGrams(df, "text", 2, 3)
      .as[(String, Long)].collect().toSeq
    // a b: docs 1,2 -> 2; b c: docs 2,3 -> 2; b a / c d: 1. Tie at 2 broken
    // by gram asc; third row is the lexicographically-first singleton.
    assert(got == Seq(("a b", 2L), ("b c", 2L), ("b a", 1L)))
  }

  test("decontaminationScoreBloom: no false negatives; matches exact at low fpp") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val bench = docs.filter($"doc_id" < 10)
    val bloom = TextAnalysis.benchmarkBloom(bench, "text", 3, fpp = 1e-6)
    val approx = TextAnalysis.decontaminationScoreBloom(docs, bloom, "doc_id", "text", 3)
      .select($"doc_id", $"n_grams", $"bloom_hits")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = TextAnalysis.decontaminationScore(docs, bench, "doc_id", "text", 3)
      .select($"doc_id", $"n_grams", $"bench_hits")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (id, (nGrams, exactHits)) =>
      val (nb, bloomHits) = approx(id)
      assert(nb == nGrams, s"doc $id gram count differs")
      // Bloom guarantee: no false negatives -> hits is an upper bound
      assert(bloomHits >= exactHits, s"doc $id lost hits: $bloomHits < $exactHits")
    }
    // at fpp 1e-6 on this corpus the filter is exact (deterministic: the
    // filter build is content-keyed, so this is a fixed property of the
    // fixture, not a flaky sample)
    val fps = exact.map { case (id, (_, e)) => approx(id)._2 - e }.sum
    assert(fps == 0L, s"unexpected false positives at fpp 1e-6: $fps")
  }

  test("packBins: duplicate ids accumulate row-by-row (ROWS frame, not RANGE)") {
    // two docs with the SAME id, 12 tokens each, budget 10: RANGE peers
    // would both see cum=24 -> both bin 1; ROWS gives the first cum=12
    // (starts at 0 -> bin 0) and the second cum=24 (starts at 12 -> bin 1)
    val twelve = Seq.fill(12)("w").mkString(" ")
    val df = Seq(("A", 1L, twelve), ("A", 1L, twelve)).toDF("part", "doc_id", "text")
    val bins = TextAnalysis.packBins(df, "doc_id", "text", 10L, Seq("part"))
      .select($"bin").as[Long].collect().sorted
    assert(bins.toSeq == Seq(0L, 1L))
  }

  test("bm25Score matches the closed form and sums terms in fixed order") {
    val df = Seq((1L, "a b a"), (2L, "a c"), (3L, "d e f")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25Score(df, "doc_id", "text", Seq("a", "e"))
      .orderBy($"doc_id").as[(Long, Double, Long)].collect()
    val (k1, b, n, avgdl) = (1.2, 0.75, 3.0, 8.0 / 3)
    def s(tf: Double, dfq: Double, dl: Double): Double =
      ((n - dfq + 0.5) / (dfq + 0.5)) * (tf * (k1 + 1.0)) /
        (tf + k1 * (1.0 - b + b * dl / avgdl))
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // df: a in docs {1,2}, e in {3}; dl: 3, 2, 3
    assert(got(0) == ((1L, r4(s(2, 2, 3)), 1L)))
    assert(got(1) == ((2L, r4(s(1, 2, 2)), 1L)))
    assert(got(2) == ((3L, r4(s(1, 1, 3)), 1L)))
    // rarer term outweighs: doc3's single 'e' (df 1) beats doc2's single
    // 'a' (df 2) at equal-or-longer dl
    assert(got(2)._2 > got(1)._2)
  }

  test("wordLift: vocab-capped pair lift with exact integer ratio") {
    // df: a=6, b=5, c=1; vocabK=3 keeps all; only (a,b) survives minCo=5;
    // lift = 6·5 / (6·5) = 1.0 exactly
    val docs = (1L to 5L).map(i => (i, "a b")) :+ ((6L, "a c"))
    val got = TextAnalysis.wordLift(docs.toDF("doc_id", "text"), "doc_id", "text",
        vocabK = 3, minCoDocs = 5)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("a", "b", 5L, 6L, 5L, 1.0)))
  }

  test("wordLift: vocab cap excludes pairs outside the top-K terms") {
    // x,y dominate; z co-occurs with both but is cut by vocabK=2
    val docs = (1L to 6L).map(i => (i, "x y z")).toDF("doc_id", "text")
    val got = TextAnalysis.wordLift(docs, "doc_id", "text", vocabK = 2, minCoDocs = 5)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("x", "y", 6L, 6L, 6L, 1.0)))
  }

  test("tfidfSimJoin: identical docs score 1.0; df cap prunes the join") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact twin → cosine 1.0
      (3L, "one two three four five six"),         // disjoint: no shared gram
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfSimJoin(docs, "doc_id", "text", 3, dfCap = 20, 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1.0)))
    // every shared gram has df=2 — a cap of 1 removes them all, so the
    // join (and the result) must be empty
    val capped = TextAnalysis.tfidfSimJoin(docs, "doc_id", "text", 3, dfCap = 1, 0.5)
    assert(capped.count() == 0)
  }

  test("qualityGate: keeps docs at/above their language's median score") {
    val good = "the quick brown fox jumps over the lazy dog again today" // 11 toks, score 1.0
    val docs = Seq(
      (1L, "en", good), (2L, "en", good),
      (3L, "en", "x y"), // score 0.0: too short, 1-char tokens, no stopwords
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.qualityGate(docs, "text")
      .as[(Long, String, Double, Double)].collect().toSet
    // median of {1.0, 1.0, 0.0} = 1.0 → doc 3 gated out
    assert(got == Set((1L, "en", 1.0, 1.0), (2L, "en", 1.0, 1.0)))
  }

  test("shuffleShards: stable content-keyed permutation, dense per-shard ranks") {
    val docs = (1L to 40L).map(i => (i, s"document number $i body " * 3)).toDF("doc_id", "text")
    val a = TextAnalysis.shuffleShards(docs, "doc_id", "text", 4)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    val b = TextAnalysis.shuffleShards(docs.repartition(13), "doc_id", "text", 4)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq, "layout changed the permutation")
    // ranks within each shard are exactly 1..count — a lossless shuffle
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq)
    }
    // a different salt is a different epoch: at least one doc moves
    val c = TextAnalysis.shuffleShards(docs, "doc_id", "text", 4, salt = "shuffle-v2")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(c.toSeq != a.toSeq, "salt change did not reshuffle")
  }

  test("budgetSelect keeps exactly the maximal in-budget quality-first prefix") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val budget = 50000L
    val got = TextAnalysis.budgetSelect(docs, "text", "doc_id", budget)
      .as[(Long, Long, Int, Long)].collect().sortBy(_._4)
    assert(got.nonEmpty && got.last._4 <= budget)
    // driver-side greedy over the same rank order must pick the same set
    val ranked = TextAnalysis.qualityScore(docs, "text")
      .select($"doc_id",
        ((lit(100L) - round($"quality_score" * 100).cast("long")) * 1000L
          + least($"n_chars_m", lit(999)).cast("long")).as("rk"),
        $"n_chars_m".cast("long").as("cost"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._1))
    var cum = 0L
    val expect = ranked.takeWhile { r => cum += r._3; cum <= budget }.map(_._1).toSet
    assert(got.map(_._1).toSet == expect,
      "selection diverges from the driver-side greedy prefix")
    // strictly maximal: the next-ranked doc would break the budget
    if (expect.size < ranked.length)
      assert(got.map(_._4).max + ranked(expect.size)._3 > budget)
  }

  test("postings: sorted lists for the top-df terms, layout-independent") {
    val docs = Seq(
      (3L, "apple banana"), (1L, "apple cherry"), (2L, "apple apple banana"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.postings(docs, "doc_id", "text", 2)
      .as[(String, Long, String)].collect().toSet
    // df: apple=3 banana=2 cherry=1 → top-2 = apple, banana; doc 2's
    // repeated "apple" counts once (distinct term-doc)
    assert(got == Set(("apple", 3L, "1,2,3"), ("banana", 2L, "2,3")))
    val re = TextAnalysis.postings(docs.repartition(5), "doc_id", "text", 2)
      .as[(String, Long, String)].collect().toSet
    assert(re == got, "posting order depends on physical layout")
  }

  test("qualityGate histogram median == exact percentile(0.5) on the corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = TextAnalysis.qualityGate(docs, "text")
      .as[(Long, String, Double, Double)].collect().toSet
    // the replaced form: buffering exact percentile — equal output proves
    // the histogram interpolation is the same statistic
    val qs = TextAnalysis.qualityScore(docs, "text")
    val med = qs.groupBy($"lang").agg(expr("percentile(quality_score, 0.5)").as("med"))
    val expect = qs.join(broadcast(med), "lang")
      .filter($"quality_score" >= $"med")
      .select($"doc_id", $"lang", $"quality_score", round($"med", 2).as("lang_median"))
      .as[(Long, String, Double, Double)].collect().toSet
    assert(got == expect, "histogram median diverges from exact percentile")
  }

  test("calibrateQuality histogram ppm == rank()-window ppm on the corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = TextAnalysis.calibrateQuality(docs, "text", "lang")
      .as[(Long, String, Double, Long)].collect().toSet
    val byLang = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
    val expect = TextAnalysis.qualityScore(docs, "text")
      .withColumn("rk", rank().over(byLang.orderBy($"quality_score")).cast("long"))
      .withColumn("n", count(lit(1)).over(byLang))
      .withColumn("cal_ppm",
        when($"n" > 1, expr("((rk - 1) * 1000000L) div (n - 1)")).otherwise(lit(0L)))
      .select($"doc_id", $"lang", $"quality_score", $"cal_ppm")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(got == expect, "histogram ppm diverges from the rank-window form")
  }

  test("packBins two-phase cumsum == single per-key window (incl. 1 bucket, many buckets)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def windowForm = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"doc_id", $"n_tokens")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      docs.withColumn("n_tokens", TextAnalysis.tokenCount($"text"))
        .withColumn("cum_tokens", sum($"n_tokens").over(w))
        .withColumn("bin",
          floor(($"cum_tokens" - $"n_tokens").cast("double") / 4096L))
        .select($"doc_id", $"lang", $"n_tokens", $"cum_tokens", $"bin")
        .as[(Long, String, Int, Long, Long)].collect().toSet
    }
    val expect = windowForm
    // autoDegradeBelow = 0 forces the two-phase path (500 test rows would
    // otherwise probe-degrade to the window form and test nothing)
    for (buckets <- Seq(1, 7, 64)) {
      val got = TextAnalysis.packBins(docs, "doc_id", "text", 4096L,
          Seq("lang"), posBuckets = buckets, autoDegradeBelow = 0)
        .select($"doc_id", $"lang", $"n_tokens", $"cum_tokens", $"bin")
        .as[(Long, String, Int, Long, Long)].collect().toSet
      assert(got == expect, s"two-phase packBins (posBuckets=$buckets) != window cumsum")
    }
    // the probe-degraded form (default threshold ≫ 500 rows) is the same
    val degraded = TextAnalysis.packBins(docs, "doc_id", "text", 4096L, Seq("lang"))
      .select($"doc_id", $"lang", $"n_tokens", $"cum_tokens", $"bin")
      .as[(Long, String, Int, Long, Long)].collect().toSet
    assert(degraded == expect, "auto-degraded packBins != window cumsum")
    // layout invariance
    val re = TextAnalysis.packBins(docs.repartition(5), "doc_id", "text", 4096L,
        Seq("lang"), autoDegradeBelow = 0)
      .select($"doc_id", $"lang", $"cum_tokens", $"bin")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(re == expect.map(t => (t._1, t._2, t._4, t._5)),
      "packBins depends on physical layout")
  }

  test("calibration model self-application == calibrateQuality; unseen lang is null") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val model = TextAnalysis.qualityCalibrationBuild(docs, "text", "lang")
    val applied = TextAnalysis.calibrateQualityWith(docs, model, "text", "lang")
      .as[(Long, String, Double, Long)].collect().toSet
    val inline = TextAnalysis.calibrateQuality(docs, "text", "lang")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(applied == inline,
      "applying the built model to its own reference diverges from the inline op")
    // a language the model never saw must surface as null, not rank 0
    val alien = Seq((900001L, "xx", "the fast thing and the slow thing again"))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.calibrateQualityWith(alien, model, "text", "lang")
      .select($"cal_ppm").collect()
    assert(got.length == 1 && got(0).isNullAt(0), "unseen language must emit null")
  }

  test("sourceCap histogram top-k == whole-source window top-k") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"quality_score".desc, $"doc_id")
    def windowForm(k: Int) = TextAnalysis.qualityScore(docs, "text")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"doc_id", $"source", $"quality_score")
      .as[(Long, String, Double)].collect().toSet
    // k below the source sizes exercises the threshold + boundary path
    // (the coarse 6-value score lattice makes the boundary bucket the
    // common case); k above them exercises the null-threshold keep-all leg
    for (k <- Seq(1, 2, 5)) {
      val got = TextAnalysis.sourceCap(docs, "text", k)
        .as[(Long, String, Double)].collect().toSet
      assert(got == windowForm(k), s"sourceCap(k=$k) diverges from the window form")
    }
    val kAll = 1000000
    val all = TextAnalysis.sourceCap(docs, "text", kAll)
      .as[(Long, String, Double)].collect().toSet
    assert(all == windowForm(kAll), "keep-all leg (cap above every source size)")
    assert(all.size == docs.count(), "cap above every source size keeps the corpus")
    // selection must not depend on physical layout
    val re = TextAnalysis.sourceCap(docs.repartition(7), "text", 2)
      .as[(Long, String, Double)].collect().toSet
    assert(re == windowForm(2), "sourceCap depends on physical layout")
  }

  test("postingsSegments concat in seg order == capped postings; segments bounded") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val segSize = 64L
    val segs = TextAnalysis.postingsSegments(docs, "doc_id", "text", 20, segSize)
      .select($"term", $"df", $"seg", $"seg_df", $"posting")
      .as[(String, Long, Long, Long, String)].collect()
    val whole = TextAnalysis.postings(docs, "doc_id", "text", 20)
      .as[(String, Long, String)].collect()
      .map(t => (t._1, (t._2, t._3))).toMap
    // ids are range-aligned by the div, so concat of sorted segments in
    // seg order must equal the whole sorted list EXACTLY
    val rebuilt = segs.groupBy(_._1).map { case (term, rows) =>
      (term, (rows.head._2, rows.sortBy(_._3).map(_._5).mkString(",")))
    }
    assert(rebuilt == whole, "segment concat diverges from the whole posting list")
    // every segment honors the row/buffer bound and its own census
    segs.foreach { case (term, _, _, segDf, posting) =>
      assert(segDf <= segSize, s"$term: segment exceeds segSize")
      assert(posting.split(",").length == segDf, s"$term: seg_df != posting length")
    }
    assert(segs.groupBy(_._1).values.exists(_.size > 1),
      "segSize must actually split at least one term at test scale")
    // k <= 0 = index EVERY term: the top-k rows are a subset with equal df
    val all = TextAnalysis.postingsSegments(docs, "doc_id", "text", 0, segSize)
      .select($"term", $"df", $"seg", $"seg_df", $"posting")
      .as[(String, Long, Long, Long, String)].collect()
    val allKeyed = all.map(r => ((r._1, r._3), r)).toMap
    segs.foreach { r =>
      assert(allKeyed.get((r._1, r._3)).contains(r),
        s"full-index row for (${r._1}, ${r._3}) diverges from the capped form")
    }
  }

  test("shuffleShards two-phase position == single-window (fp, id) rank") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // autoDegradeBelow = 0 forces the two-phase path at 500 test rows
    val got = TextAnalysis.shuffleShards(docs, "doc_id", "text", 8,
        autoDegradeBelow = 0)
      .as[(Long, Long, Int)].collect().toSet
    // posBuckets=1 degenerates to the one-window-per-shard form (offset
    // join is a no-op: every offset is 0) — the two-phase split must be
    // invisible in the output
    val one = TextAnalysis.shuffleShards(docs, "doc_id", "text", 8, posBuckets = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == one, "sub-bucketed positions diverge from the one-window rank")
    // and the probe-degraded default (500 rows ≪ threshold) matches both
    val degraded = TextAnalysis.shuffleShards(docs, "doc_id", "text", 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(degraded == one, "auto-degraded positions diverge from the one-window rank")
  }

  test("mixInterleave analytic position == rank over (vt, source)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val weights = Map("en" -> 3, "fr" -> 2)
    // the replaced form: a global row_number over (vt, source) — correct
    // but single-partition; the analytic Σ-over-sources must equal it
    val stride = when($"lang" === "en", 2L).when($"lang" === "fr", 3L).otherwise(6L)
    val w = org.apache.spark.sql.expressions.Window
    val expect = docs.select($"doc_id", $"lang")
      .withColumn("rk", row_number().over(
        w.partitionBy($"lang").orderBy($"doc_id")))
      .withColumn("vt", $"rk" * stride)
      .withColumn("mix_pos", row_number().over(
        w.orderBy($"vt", $"lang")).cast("long"))
      .select($"doc_id", $"lang", $"vt", $"mix_pos")
      .as[(Long, String, Long, Long)].collect().toSet
    // posBuckets 1 = the one-window intra-source rank; >1 = the two-phase
    // id-range sub-bucket decomposition — both must equal the global rank
    for (buckets <- Seq(1, 7, 64)) {
      val got = TextAnalysis.mixInterleave(docs, "lang", "doc_id", weights,
          posBuckets = buckets)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == expect,
        s"analytic mix position (posBuckets=$buckets) diverges from the global rank")
    }
    // layout invariance of the two-phase rank
    val re = TextAnalysis.mixInterleave(docs.repartition(7), "lang", "doc_id", weights)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(re == expect, "mixInterleave depends on physical layout")
    val got = TextAnalysis.mixInterleave(docs, "lang", "doc_id", weights)
      .as[(Long, String, Long, Long)].collect().toSet
    // schedule sanity: within the first full cycle (vt ≤ lcm = 6), en
    // (weight 3) contributes 3 docs, fr (weight 2) contributes 2, every
    // other source exactly 1 — position-prefix counts would depend on the
    // alphabetical tie order at vt = 6, the cycle boundary
    val cycle1 = got.toSeq.filter(_._3 <= 6).map(_._2)
    assert(cycle1.count(_ == "en") == 3 && cycle1.count(_ == "fr") == 2,
      s"first-cycle mixture off: $cycle1")
    val others = cycle1.filterNot(l => l == "en" || l == "fr")
    assert(others.distinct.size == others.size, s"a default-weight source repeated in cycle 1: $others")
  }

  test("packBins: two-phase and degraded branches emit the SAME column order") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val forced = TextAnalysis.packBins(docs, "doc_id", "text", 4096L,
      Seq("lang"), autoDegradeBelow = 0)
    val degraded = TextAnalysis.packBins(docs, "doc_id", "text", 4096L, Seq("lang"))
    assert(forced.columns.toSeq == degraded.columns.toSeq,
      s"positional consumers would mis-bind when the corpus crosses the " +
        s"degrade threshold: ${forced.columns.toSeq} vs ${degraded.columns.toSeq}")
  }

  test("mixInterleave: full-range hash ids STAY two-phase, schedule still exact") {
    // fingerprint-keyed corpora (xxhash64 doc ids — the repo's own
    // text_fingerprint convention) span the full signed-64 range by
    // construction. The decimal(20,0) bucket arithmetic must keep the
    // two-phase (source, __b) rank window — the round-8 span guard
    // silently degraded exactly these ids to the one-window scale-killer
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(xxhash64($"doc_id").as("doc_id"), $"lang")
    val weights = Map("en" -> 3, "fr" -> 2)
    val two = TextAnalysis.mixInterleave(docs, "lang", "doc_id", weights)
    val plan = two.queryExecution.optimizedPlan.toString
    val i = plan.indexOf("windowspecdefinition(lang")
    assert(i >= 0 && plan.substring(i, i + 60).contains("__b"),
      s"full-range ids lost the (source, __b) sub-bucketed rank window:\n$plan")
    val got = two.as[(Long, String, Long, Long)].collect().toSet
    val one = TextAnalysis.mixInterleave(docs, "lang", "doc_id", weights,
        posBuckets = 1)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == one, "two-phase positions diverge from the one-window rank")
    // extremal spans too: mn = MinValue+1, mx = MaxValue-1 in one source
    val extreme = Seq(
      (Long.MinValue + 1, "en"), (-1L, "en"), (7L, "en"), (Long.MaxValue - 1, "en"),
      (Long.MinValue + 2, "fr"), (0L, "fr"), (Long.MaxValue - 2, "fr"),
    ).toDF("doc_id", "lang")
    val g2 = TextAnalysis.mixInterleave(extreme, "lang", "doc_id", weights)
      .as[(Long, String, Long, Long)].collect().toSet
    val o2 = TextAnalysis.mixInterleave(extreme, "lang", "doc_id", weights,
        posBuckets = 1)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(g2 == o2, "extremal-span positions diverge from the one-window rank")
    assert(g2.map(_._4) == (1L to 7L).toSet, "mix positions must be 1..n")
  }

  test("mixInterleave: non-integral ids degrade to the one-window rank, same schedule") {
    // string ids can't be range-bucketed; the op must fall back to the
    // single per-source window and still produce the exact schedule
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(format_string("doc_%05d", $"doc_id").as("doc_id"), $"lang")
    val weights = Map("en" -> 3, "fr" -> 2)
    val got = TextAnalysis.mixInterleave(docs, "lang", "doc_id", weights)
      .as[(String, String, Long, Long)].collect().toSet
    val stride = when($"lang" === "en", 2L).when($"lang" === "fr", 3L).otherwise(6L)
    val w = org.apache.spark.sql.expressions.Window
    val expect = docs
      .withColumn("rk", row_number().over(w.partitionBy($"lang").orderBy($"doc_id")))
      .withColumn("vt", $"rk" * stride)
      .withColumn("mix_pos", row_number().over(w.orderBy($"vt", $"lang")).cast("long"))
      .select($"doc_id", $"lang", $"vt", $"mix_pos")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == expect, "string-id fallback diverges from the global rank")
  }

  test("calibrateQuality: ppm ranks are lang-local, tie-stable, and bounded") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = TextAnalysis.calibrateQuality(docs, "text", "lang")
      .as[(Long, String, Double, Long)].collect()
    assert(got.length == docs.count())
    got.foreach { case (_, _, _, ppm) => assert(ppm >= 0L && ppm <= 1000000L) }
    // within a language: equal scores → equal ppm; higher score → higher ppm
    got.groupBy(_._2).foreach { case (_, rows) =>
      val byScore = rows.groupBy(_._3).view.mapValues(_.map(_._4).toSet)
      byScore.foreach { case (_, ppms) =>
        assert(ppms.size == 1, "tied scores got different ppm ranks")
      }
      val ordered = byScore.toSeq.sortBy(_._1).map(_._2.head)
      assert(ordered == ordered.sorted, "ppm not monotone in score")
      // the bottom rank is always 0 — a fixed calibrated cut has docs to
      // drop in EVERY language
      assert(ordered.head == 0L)
    }
  }

  test("chunkDocs: coverage, overlap, offsets, and edge lengths") {
    // len 250 → starts 0,90,180 (chunks 120/120/70); len 120 → ONE full
    // chunk (a start at 90 would add no new chars — skipped); len 121 →
    // second 31-char chunk at 90; empty → one empty chunk
    val docs = Seq(
      (1L, "x" * 250), (2L, "y" * 120), (3L, "z" * 121), (4L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocs(docs, "doc_id", "text", size = 120, stride = 90)
      .as[(Long, Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(got(1L).map(c => (c._2, c._3, c._5)).toSeq ==
      Seq((0L, 0L, 120L), (1L, 90L, 120L), (2L, 180L, 70L)))
    assert(got(2L).map(c => (c._3, c._5)).toSeq == Seq((0L, 120L)))
    assert(got(3L).map(c => (c._3, c._5)).toSeq == Seq((0L, 120L), (90L, 31L)))
    assert(got(4L).map(c => (c._3, c._4)).toSeq == Seq((0L, "")))
    // reconstruction: dropping the overlap, concatenated chunks == source
    val doc1 = got(1L).sortBy(_._2)
    val rebuilt = doc1.head._4 + doc1.tail.map(_._4.drop(120 - 90)).mkString
    assert(rebuilt == "x" * 250)
  }

  test("splitLeakage: planted near-copy across the split boundary is caught") {
    def bucket(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L) % 100L
    // deterministic search: a base text landing in train, and a one-word
    // extension of it landing in val/test — a NEAR-copy the content-hash
    // split cannot co-locate, i.e. exactly the leak this metric exists for
    val vocab = (0 until 400).map(i => s"w$i")
    val train = vocab.map(w => s"alpha beta gamma delta epsilon zeta $w")
      .find(t => bucket(t) < 90L).get
    val leaked = vocab.map(w => s"alpha beta gamma delta epsilon zeta $w extra")
      .find(t => bucket(t) >= 90L).get
    val clean = vocab.map(w => s"nine ten eleven twelve thirteen $w")
      .find(t => bucket(t) >= 90L).get
    val docs = Seq((1L, train), (2L, leaked), (3L, clean)).toDF("doc_id", "text")
    val got = TextAnalysis.splitLeakage(docs, "doc_id", "text", 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(2L, 3L), "only held-out docs are scored")
    // leaked doc: 6 of its distinct 3-grams (8 tokens → 6 grams) appear in
    // the train doc's gram set → containment 4/6 at minimum; exact value:
    // grams not containing the two novel tail tokens = 4 → 4/6 = 0.6667
    assert(got(2L)._3 >= 4L && got(2L)._4 >= 0.6666)
    assert(got(3L)._3 == 0L && got(3L)._4 == 0.0)
  }

  test("bpeMerges: hand-computed merge trace on the classic low/lower corpus") {
    // vocab with counts: low×5, lower×2, newest×6, widest×3
    // round 0: (e,s) 6+3=9 ties (s,t) 9 → lexicographic → (e,s)
    // round 1: (es,t) 9      round 2: (l,o) 5+2=7
    // round 3: (lo,w) 7      round 4: (e,w) 6 ties (n,e), (w,est) → (e,w)
    val docs = Seq(
      Seq.fill(5)("low"), Seq.fill(2)("lower"),
      Seq.fill(6)("newest"), Seq.fill(3)("widest")
    ).flatten.mkString(" ")
    val got = TextAnalysis.bpeMerges(Seq(docs).toDF("text"), "text", 5)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (0, "e", "s", 9L),
      (1, "es", "t", 9L),
      (2, "l", "o", 7L),
      (3, "lo", "w", 7L),
      (4, "e", "w", 6L)))
  }

  test("bpeMerges: overlapping runs merge left-to-right; early stop below minPairFreq") {
    // "aaa" ×3: round 0 counts (a,a) twice per word = 6 → merge to [aa, a]
    // round 1: (aa,a) 3 → [aaa]; then no pairs remain → early stop at 2
    val got = TextAnalysis.bpeMerges(Seq("aaa aaa aaa").toDF("text"), "text", 10)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((0, "a", "a", 6L), (1, "aa", "a", 3L)))
    // determinism under ties: (a,b) and (c,d) both freq 2 → lexicographic
    val tied = TextAnalysis.bpeMerges(Seq("ab ab cd cd").toDF("text"), "text", 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(tied == Seq((0, "a", "b", 2L)))
  }

  test("prioritySample: top-k by w/u exactly, estimator = max(w, tau), repartition-stable") {
    val docs = spark.read.parquet(s"${graft.TestSpark.sf0001}/documents.parquet")
    val M = 1000003L
    // independent recomputation of every priority, ranked on the driver
    val pr = (col("n_chars").cast("double") * lit(M.toDouble)) /
      (pmod(TextAnalysis.fingerprint(col("text")), lit(M)) + lit(1L)).cast("double")
    val all = docs.select(col("doc_id"), col("n_chars"), pr.as("p"))
      .as[(Long, Long, Double)].collect().sortBy { case (id, _, p) => (-p, id) }
    val expectIds = all.take(50).map(_._1).toList
    val tau = all(50)._3
    val got = TextAnalysis.prioritySample(docs, "doc_id", "n_chars", "text", 50)
      .select(col("doc_id"), col("n_chars"), col("priority"), col("est_w"))
      .as[(Long, Long, Double, Double)].collect().sortBy(r => (-r._3, r._1)).toList
    assert(got.map(_._1) == expectIds, "the sample must be exactly the top-k by priority")
    got.foreach { case (_, w, _, estW) =>
      assert(estW == math.max(w.toDouble, tau), "est_w must be max(w, tau) with tau the (k+1)-th priority")
    }
    // content-keyed: identical through a reshuffle
    val again = TextAnalysis.prioritySample(docs.repartition(7), "doc_id", "n_chars", "text", 50)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(again == expectIds.toSet)
    graft.Cleanup.drain()
    // degenerate corpus ≤ k: everything sampled, tau = 0 → est_w = w
    val five = docs.limit(5)
    val small = TextAnalysis.prioritySample(five, "doc_id", "n_chars", "text", 50)
      .select(col("n_chars"), col("est_w")).as[(Long, Double)].collect()
    assert(small.length == 5)
    small.foreach { case (w, e) => assert(e == w.toDouble) }
    graft.Cleanup.drain()
  }

  test("prioritySample artifact fold: per-shard builds merged == one-shot, exactly") {
    val docs = spark.read.parquet(s"${graft.TestSpark.sf0001}/documents.parquet")
    val oneShot = TextAnalysis.prioritySample(docs, "doc_id", "n_chars", "text", 40)
      .select(col("doc_id"), col("priority"), col("est_w"))
      .as[(Long, Double, Double)].collect().sortBy(_._1).toList
    graft.Cleanup.drain()
    // three disjoint "crawl batches" built independently, folded pairwise
    // (associativity: ((a ⊕ b) ⊕ c))
    val parts = Seq(0, 1, 2).map(r =>
      TextAnalysis.prioritySampleBuild(
        docs.filter(pmod(col("doc_id"), lit(3)) === r), "doc_id", "n_chars", "text", 40))
    val folded = TextAnalysis.prioritySampleMerge(
      Seq(TextAnalysis.prioritySampleMerge(parts.take(2), "doc_id", 40), parts(2)),
      "doc_id", 40)
    val merged = TextAnalysis.prioritySampleFinalize(folded, "doc_id", "n_chars", 40)
      .select(col("doc_id"), col("priority"), col("est_w"))
      .as[(Long, Double, Double)].collect().sortBy(_._1).toList
    graft.Cleanup.drain()
    assert(merged == oneShot,
      "folding per-batch top-(k+1) artifacts must equal the one-shot sample bit-for-bit")
    // k-consistency is a HARD contract (round-10 advice): an artifact
    // built at a smaller k may be missing a global top-(k+1) member, so
    // folding it must fail loudly, not corrupt the τ estimator
    val small = TextAnalysis.prioritySampleBuild(
      docs.filter(pmod(col("doc_id"), lit(3)) === 0), "doc_id", "n_chars", "text", 10)
    val bad = TextAnalysis.prioritySampleMerge(Seq(parts(1), small), "doc_id", 40)
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage.contains("built with k"), s"wrong error: ${e.getMessage}")
    graft.Cleanup.drain()
    // grouped form: same guard
    val gSmall = TextAnalysis.prioritySampleByBuild(
      docs, "lang", "doc_id", "n_chars", "text", 5)
    val gOk = TextAnalysis.prioritySampleByBuild(
      docs, "lang", "doc_id", "n_chars", "text", 15)
    val gBad = TextAnalysis.prioritySampleByMerge(Seq(gOk, gSmall), "lang", "doc_id", 15)
    val ge = intercept[Exception] { gBad.collect() }
    assert(ge.getMessage.contains("built with k"), s"wrong error: ${ge.getMessage}")
    graft.Cleanup.drain()
  }

  test("prioritySampleBy: per-group top-k, per-group tau, grouped fold == one-shot") {
    val docs = spark.read.parquet(s"${graft.TestSpark.sf0001}/documents.parquet")
    val M = 1000003L
    val pr = (col("n_chars").cast("double") * lit(M.toDouble)) /
      (pmod(TextAnalysis.fingerprint(col("text")), lit(M)) + lit(1L)).cast("double")
    val all = docs.select(col("lang"), col("doc_id"), col("n_chars"), pr.as("p"))
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy { case (_, id, _, p) => (-p, id) }).toMap
    val got = TextAnalysis.prioritySampleBy(docs, "lang", "doc_id", "n_chars", "text", 20)
      .select(col("lang"), col("doc_id"), col("n_chars"), col("est_w"))
      .as[(String, Long, Long, Double)].collect().groupBy(_._1)
    graft.Cleanup.drain()
    assert(got.keySet == all.keySet, "every group must be represented")
    got.foreach { case (g, rows) =>
      val ranked = all(g)
      assert(rows.length == math.min(20, ranked.length))
      assert(rows.map(_._2).toSet == ranked.take(20).map(_._2).toSet,
        s"group $g: sample is not its top-20 by priority")
      val tau = if (ranked.length >= 21) ranked(20)._4 else 0.0
      rows.foreach { case (_, _, w, e) => assert(e == math.max(w.toDouble, tau)) }
    }
    // grouped merge law: disjoint batches folded == one-shot, exactly
    val oneShot = TextAnalysis.prioritySampleBy(docs, "lang", "doc_id", "n_chars", "text", 15)
      .select(col("doc_id"), col("priority"), col("est_w"))
      .as[(Long, Double, Double)].collect().sortBy(_._1).toList
    graft.Cleanup.drain()
    val parts = Seq(0, 1).map(r =>
      TextAnalysis.prioritySampleByBuild(
        docs.filter(pmod(col("doc_id"), lit(2)) === r), "lang", "doc_id", "n_chars", "text", 15))
    val merged = TextAnalysis.prioritySampleByFinalize(
        TextAnalysis.prioritySampleByMerge(parts, "lang", "doc_id", 15),
        "lang", "doc_id", "n_chars", 15)
      .select(col("doc_id"), col("priority"), col("est_w"))
      .as[(Long, Double, Double)].collect().sortBy(_._1).toList
    graft.Cleanup.drain()
    assert(merged == oneShot)
  }

  test("lmScore: hand-computed bigram model on a 2-doc corpus") {
    val docs = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    // c12: (a,b)=1 (b,a)=2; c1: a=1 b=2; V=2
    // P(a,b)=(1+1)/(1+2)=2/3 → 666666666   P(b,a)=(2+1)/(2+2)=3/4 → 750000000
    val got = TextAnalysis.lmScore(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 666666666L + 750000000L, 2L, (666666666L + 750000000L) / 2),
      (2L, 750000000L, 1L, 750000000L)))
  }
  test("boilerplatePrefixes: per-group prefix census; short docs; planted template flags") {
    val df = Seq(
      (1L, "en", "header one two three body alpha"),
      (2L, "en", "header one two three body beta"),
      (3L, "en", "header one two three body gamma"),
      (4L, "en", "different opening words entirely here"),
      (5L, "fr", "header one two three body delta"), // same prefix, OTHER group
      (6L, "en", "tiny"),                            // shorter than prefixTokens
      (7L, "en", "tiny"),
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.boilerplatePrefixes(df, "doc_id", "text", "lang",
        prefixTokens = 4, minShare = 3)
      .as[(Long, String, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // the three en template docs share the 4-token prefix -> flagged
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id) == ((id, "en", 3L, true)), s"doc $id: ${got(id)}")
    }
    // same prefix in ANOTHER group does not pool: fr count is its own 1
    assert(got(5L) == ((5L, "fr", 1L, false)))
    assert(got(4L) == ((4L, "en", 1L, false)))
    // docs shorter than prefixTokens participate with their whole token
    // list -- the two "tiny" docs form their own 2-doc prefix group
    assert(got(6L)._3 == 2L && !got(6L)._4)
    assert(got.size == 7)
  }

  test("cms: no-undercount law for EVERY token; merge == one-shot; bounded counters") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val exact = docs.select(explode(TextAnalysis.tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("n_exact"))
    // the structural law, on the WHOLE vocabulary (not just heavy
    // hitters), for both the production-width and a colliding sketch
    for (width <- Seq(1024, 16)) {
      val sk = TextAnalysis.cmsBuild(docs, "text", depth = 4, width = width)
      val rows = TextAnalysis.cmsEstimateWith(exact, "w", sk)
        .join(exact, "w").select($"w", $"n_cms", $"n_exact")
        .as[(String, Long, Long)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (w, est, ex) =>
        assert(est >= ex, s"CMS undercounted '$w' at width $width: $est < $ex") }
      // the counter relation is bounded by depth*width however large the corpus
      assert(sk.counters.count() <= 4L * width)
      // total mass conservation per lane: each lane holds every token once
      val laneTotals = sk.counters.groupBy($"j").agg(sum($"n").as("t"))
        .select($"t").as[Long].collect().toSet
      val nTokens = docs.select(explode(TextAnalysis.tokens($"text"))).count()
      assert(laneTotals == Set(nTokens), s"each lane must sum to $nTokens")
    }
    // mergeability: the union sketch's estimates equal the one-shot build's
    val one = TextAnalysis.cmsBuild(docs, "text")
    val merged = TextAnalysis.cmsMerge(
      TextAnalysis.cmsBuild(docs.filter($"doc_id" % 2 === 0), "text"),
      TextAnalysis.cmsBuild(docs.filter($"doc_id" % 2 === 1), "text"))
    def estMap(sk: TextAnalysis.CmsSketch) =
      TextAnalysis.cmsEstimateWith(exact, "w", sk)
        .as[(String, Long)].collect().toMap
    assert(estMap(merged) == estMap(one))
    // incompatible-geometry merges fail fast
    intercept[IllegalArgumentException] {
      TextAnalysis.cmsMerge(one, TextAnalysis.cmsBuild(docs, "text", width = 16))
    }
  }

  test("cmsGeometry derives (depth, width) from the (eps, delta) contract; bound holds at the derived geometry") {
    // the textbook derivation: width = ceil(e/eps), depth = ceil(ln(1/delta))
    assert(TextAnalysis.cmsGeometry(0.01, 0.05) === (3, 272))
    assert(TextAnalysis.cmsGeometry(0.001, 0.01) === (5, 2719))
    // degenerate corners clamp instead of emitting a zero-lane sketch
    assert(TextAnalysis.cmsGeometry(0.9, 0.9)._1 === 1)
    assert(TextAnalysis.cmsGeometry(0.9, 0.9)._2 >= 2)
    intercept[IllegalArgumentException] { TextAnalysis.cmsGeometry(0.0, 0.5) }
    intercept[IllegalArgumentException] { TextAnalysis.cmsGeometry(0.5, 1.0) }
    // the contract on the fixed test corpus: every estimate is within
    // eps*N of truth (no-undercount is structural; the eps*N overcount
    // tail has probability <= delta per token — on this deterministic
    // corpus the realized max is a fixed fact, asserted as the contract
    // the geometry was derived to meet)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val eps = 0.01
    val sk = TextAnalysis.cmsBuildEps(docs, "text", eps, 0.05)
    assert(sk.depth === 3 && sk.width === 272)
    val exact = docs.select(explode(TextAnalysis.tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("n_exact"))
    val n = exact.agg(sum($"n_exact")).as[Long].head()
    val over = TextAnalysis.cmsEstimateWith(exact, "w", sk)
      .join(exact, "w")
      .select(($"n_cms" - $"n_exact").as[Long]).collect()
    assert(over.forall(_ >= 0), "CMS must never undercount")
    val failures = over.count(_ > (eps * n).toLong)
    assert(failures <= math.ceil(0.05 * over.length).toLong,
      s"more than a delta fraction of tokens exceeded eps*N: $failures/${over.length}")
  }

  test("textRank: star center dominates, symmetric leaves tie exactly, isolated node holds the floor") {
    // star around 'a' (edges a-b, a-c, a-d, equal weight) + an isolated
    // token 'z' with no edges at all
    val fix = Seq("a b", "a c", "a d", "z").toDF("text")
    val got = TextAnalysis.textRank(fix, "text")
      .as[(String, Long)].collect().toMap
    assert(got.keySet == Set("a", "b", "c", "d", "z"))
    assert(got("a") > got("b"), s"star center must outrank a leaf: $got")
    // exact long arithmetic → symmetric leaves agree to the last unit
    assert(got("b") == got("c") && got("c") == got("d"))
    // no incoming edges → exactly the damping floor, every round
    assert(got("z") == 150000000000L)
    // every rank carries at least the floor
    got.values.foreach(r => assert(r >= 150000000000L))
    // partitioning invariance: exact fixed-point arithmetic cannot drift
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val one = TextAnalysis.textRank(docs, "text")
      .as[(String, Long)].collect().toMap
    val repart = TextAnalysis.textRank(docs.repartition(13), "text")
      .as[(String, Long)].collect().toMap
    assert(one == repart)
    // centrality is not raw frequency: both orders exist but may differ —
    // at minimum the relation is total over the full vocabulary
    assert(one.size == docs.select(explode(TextAnalysis.tokens($"text"))).distinct().count())
  }

  test("textRank plan: rounds ride the pinned partitioning — ~1 exchange per round, not ~5") {
    // the checkpointed edge relation is HashPartitioning(a) and nodes
    // HashPartitioning(w), so the per-round rank join, strength
    // aggregate, and node left-join are all exchange-free; the ONE
    // per-round exchange is the destination-keyed contribution aggregate
    // (rank mass genuinely moves). Pin the marginal cost: extra rounds
    // may add at most ~1 exchange each, and the absolute count stays far
    // below the old ~5/round shape (54 nodes at iters=10 before round 11)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // tree-walk count, not a string count: InMemoryTableScan leaves embed
    // their (already-executed) cached build plans in toString, which
    // would bill the one-time pin exchanges once per round they're
    // REFERENCED; collect() does not descend into cached relations. AQE
    // off for the planning window so executedPlan is a plain tree
    // (AdaptiveSparkPlanExec is a leaf and would hide everything).
    def exchanges(iters: Int): Int = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val n = TextAnalysis.textRank(docs, "text", iters)
          .queryExecution.executedPlan.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
          }.size
        graft.Cleanup.drain()
        n
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    val e4 = exchanges(4)
    val e8 = exchanges(8)
    assert(e8 - e4 <= 5, s"marginal exchanges per 4 extra rounds: ${e8 - e4} (e4=$e4, e8=$e8)")
    assert(e8 <= 8 + 6, s"absolute exchange count regressed: $e8 at iters=8")
  }
}
