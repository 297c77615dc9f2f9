package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The text-curation ops compose in Structured Streaming: normalization is
  * a stateless projection (streams unchanged), and exact dedup over the
  * NORMALIZED text is watermark-bounded state — together the canonical
  * "clean then dedup" ingest stage of a training-data pipeline, running
  * incrementally.
  */
class StreamTextPipelineSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("normalize → streaming exact dedup collapses formatting variants") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val df = in.toDF().toDF("ts", "text")
      .withColumn("norm", graft.ops.TextAnalysis.normalize($"text"))
    val deduped = graft.ops.Dedup.streamingExactDedup(df, "ts", "10 minutes", Seq("norm"))
    val q = deduped.writeStream.format("memory")
      .queryName("norm_dedup").outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      in.addData(
        (t0, "Hello  <b>World</b>"), // normalizes to "hello world"
        (t0, "hello world"),         // formatting variant of the same doc
        (t0, "other doc"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT norm FROM norm_dedup").as[String].collect().toSeq
      assert(rows.sorted == Seq("hello world", "other doc"),
        s"variants did not collapse: $rows")
    } finally q.stop()
  }

  test("full curation pipeline streams: normalize → quality gate → stratified sample → dedup → route") {
    // five ops in ONE incremental pipeline — the round-4 curation stages
    // compose in Structured Streaming because all of them except dedup are
    // stateless projections/filters, and dedup is watermark-bounded state.
    // Expected output is derived by running the SAME stage primitives in
    // batch over the same rows (streaming/batch parity).
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, String)]
    // the stateless stages — shared verbatim between the streaming pipeline
    // and the batch-parity expectation
    def stages(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val cleaned = df
        .withColumn("value", graft.ops.TextAnalysis.normalize($"raw"))
        // quality gate: statelessly drop ultra-short docs
        .filter(graft.ops.TextAnalysis.tokenCount($"value") >= 3)
      // content-hash stratified sampling: keep 70% of lang=en, all others
      graft.ops.TextAnalysis.stratifiedSample(
        cleaned, "lang", "value", Map("en" -> 700), defaultPerMille = 1000)
    }
    val routed = graft.router.Router.route(
      graft.ops.Dedup.streamingExactDedup(
          in.toDF().toDF("ts", "lang", "raw").transform(stages),
          "ts", "10 minutes", Seq("value"))
        .withColumn("key", $"lang"),
      graft.fixtures.DocRoutePlan.resolved)
    val q = routed.writeStream.format("memory")
      .queryName("curation_pipeline").outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val rows = Seq(
        (t0, "en", "Spark <b>query</b> basics today"),
        (t0, "en", "spark query basics   today"),      // dup after normalize
        (t0, "fr", "une autre note simple ici"),
        (t0, "en", "tiny doc"),                        // 2 tokens: quality-gated
        (t0, "en", "some other english text entirely"),
        (t0, "fr", "troisieme document francais complet"))
      in.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT value FROM curation_pipeline")
        .as[String].collect().toSeq.sorted
      // batch parity: the identical stateless stages over the same static
      // rows, with batch distinct standing in for the watermark dedup
      // (survivor identity is irrelevant — we compare the deduped values)
      val expect = stages(rows.toDF("ts", "lang", "raw"))
        .select($"value").distinct().as[String].collect().toSeq.sorted
      assert(got == expect, s"stream $got != batch $expect")
      assert(expect.nonEmpty && !expect.exists(_ == "tiny doc"))
    } finally q.stop()
  }

  test("streaming MinHash LSH: near-dups within the horizon pair up; distant re-posts don't") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val cands = graft.ops.Dedup.streamingMinHashCandidates(
      in.toDF().toDF("ts", "doc_id", "text"),
      "ts", "doc_id", "text", watermark = "2 hours", horizonSecs = 3600L)
    val q = cands.writeStream.format("memory")
      .queryName("stream_neardups").outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      val base = "the quick brown fox jumps over the lazy dog again and again today"
      in.addData(
        (t("2024-01-01 10:00:00"), 1L, base),
        (t("2024-01-01 10:10:00"), 2L, base + " extra"),       // near-dup, in horizon
        (t("2024-01-01 10:20:00"), 3L, "completely different words about spark executors and shuffles"),
        (t("2024-01-01 13:30:00"), 4L, base))                  // same text, 3.5h later: outside horizon of 1/2
      q.processAllAvailable()
      // advance the watermark past everything so all append results emit
      in.addData((t("2024-01-01 20:00:00"), 99L, "watermark advancer row zzz"))
      q.processAllAvailable()
      val pairs = spark.sql("SELECT id_a, id_b FROM stream_neardups")
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)), s"in-horizon near-dup not detected: $pairs")
      assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L),
        s"doc 4 is outside every other doc's horizon: $pairs")
      assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
        s"unrelated doc paired: $pairs")
    } finally q.stop()
  }

  test("streaming cross-corpus flags == batch crossCorpusNearDups pairs") {
    // the stream-static twin must flag exactly the (new, ref) pairs the
    // batch sweep verifies — parity on the sf0.001 corpus's parity split:
    // even ids are the static reference, odd ids arrive as a stream
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val ref = docs.filter($"doc_id" % 2 === 0)
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val flags = graft.ops.Dedup.streamingCrossCorpusFlags(
      in.toDF().toDF("ts", "doc_id", "text"), ref,
      "ts", "doc_id", "text", watermark = "1 hour")
    val q = flags.writeStream.format("memory")
      .queryName("stream_cross_flags").outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val newDocs = docs.filter($"doc_id" % 2 === 1)
        .select($"doc_id", $"text").as[(Long, String)].collect()
      in.addData(newDocs.map { case (id, tx) => (t0, id, tx) }.toIndexedSeq)
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 999999L,
        "watermark advancer row zzz"))
      q.processAllAvailable()
      val got = spark.sql("SELECT id_new, id_ref FROM stream_cross_flags")
        .as[(Long, Long)].collect().toSet
      // batch op aggregates to best-match; its pre-aggregate pair set is
      // what the stream emits — recompute it from the brute-force spec
      val expect = graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .as[(Long, Long, Double)].collect()
        .flatMap { case (a, b, _) =>
          if (a % 2 != b % 2) Some(if (a % 2 == 1) (a, b) else (b, a)) else None
        }.toSet
      assert(got == expect, "stream-static flags diverge from the batch pair set")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming cross-corpus flags against a PREBUILT index == raw-reference form") {
    // the production seam: the reference is banded/shingled once
    // (crossCorpusBuild, persisted) and every micro-batch probes the
    // static artifact — output must be identical to handing the raw
    // reference DataFrame to the streaming op
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val idx = graft.ops.Dedup.crossCorpusBuild(
      docs.filter($"doc_id" % 2 === 0), "doc_id", "text").persist()
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val flags = graft.ops.Dedup.streamingCrossCorpusFlagsWith(
      in.toDF().toDF("ts", "doc_id", "text"), idx,
      "ts", "doc_id", "text", watermark = "1 hour")
    val q = flags.writeStream.format("memory")
      .queryName("stream_cross_flags_idx").outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val newDocs = docs.filter($"doc_id" % 2 === 1)
        .select($"doc_id", $"text").as[(Long, String)].collect()
      in.addData(newDocs.map { case (id, tx) => (t0, id, tx) }.toIndexedSeq)
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 999999L,
        "watermark advancer row zzz"))
      q.processAllAvailable()
      val got = spark.sql("SELECT id_new, id_ref FROM stream_cross_flags_idx")
        .as[(Long, Long)].collect().toSet
      val expect = graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .as[(Long, Long, Double)].collect()
        .flatMap { case (a, b, _) =>
          if (a % 2 != b % 2) Some(if (a % 2 == 1) (a, b) else (b, a)) else None
        }.toSet
      assert(got == expect, "indexed stream flags diverge from the batch pair set")
      assert(got.nonEmpty)
    } finally { q.stop(); idx.unpersist() }
  }

  test("streaming embedding cross-corpus flags == batch pairs against the same index") {
    // the embedding sibling of the indexed text twin: originals are the
    // static banded reference, their int8-dequantized twins arrive as a
    // stream — every twin must flag exactly its own original (cosine
    // ≈ 0.9999 vs < 0.62 for every cross pair)
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Similarity
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val orig = emb.select($"vec_id",
      org.apache.spark.sql.functions.transform($"embedding", x => x.cast("double"))
        .as("embedding"))
    val idx = Similarity.cosineBandBuild(orig, dim = 64,
      bitsPerBand = 16, bands = 8).persist()
    val in = MemoryStream[(java.sql.Timestamp, Long, Seq[Double])]
    val flags = Similarity.streamingCrossCorpusCosineFlagsWith(
      in.toDF().toDF("ts", "vec_id", "embedding"), idx,
      "ts", threshold = 0.9, watermark = "1 hour")
    val q = flags.writeStream.format("memory")
      .queryName("stream_cosine_flags").outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val twins = emb.select(($"vec_id" + 10000000L).as("vec_id"),
          Similarity.dequantizeInt8(Similarity.quantizeInt8($"embedding")).as("embedding"))
        .as[(Long, Seq[Double])].collect()
      in.addData(twins.map { case (id, v) => (t0, id, v) }.toIndexedSeq)
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 999999L,
        Seq.fill(64)(0.0)))
      q.processAllAvailable()
      val got = spark.sql("SELECT id_new, id_ref FROM stream_cosine_flags")
        .as[(Long, Long)].collect().toSet
      val expect = twins.map(_._1).map(id => (id, id - 10000000L)).toSet
      assert(got == expect,
        s"stream flags != planted twin pairs (missing ${(expect -- got).size}, " +
          s"extra ${(got -- expect).size})")
      assert(got.nonEmpty)
    } finally { q.stop(); idx.unpersist() }
  }

  test("streaming phash flags against a PREBUILT index == brute-force hamming pairs") {
    // the image sibling of the indexed text/embedding twins: originals
    // (even ids) are the static chunked-hash reference, their
    // byte-identical twins + the odd half arrive as a stream — every join
    // is stream-static, and the emitted pair set must equal the
    // brute-force ≤maxHamming cross product computed by the BATCH hash op
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Multimodal
    val media = Multimodal.fromDocuments(
      spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet"))
    val ref = media.filter($"media_id" % 2 === 0)
    val idx = Multimodal.phashBuild(ref).persist()
    val in = MemoryStream[(java.sql.Timestamp, Long, Array[Byte])]
    val flags = Multimodal.streamingPhashFlagsWith(
      in.toDF().toDF("ts", "media_id", "payload"), idx,
      "ts", watermark = "1 hour", maxHamming = 3)
    val q = flags.writeStream.format("memory")
      .queryName("stream_phash_flags").outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val arriving = media.filter($"media_id" % 2 === 1)
        .unionByName(ref.withColumn("media_id", $"media_id" + 10000000L))
        .select($"media_id", $"payload").as[(Long, Array[Byte])].collect()
      in.addData(arriving.map { case (id, p) => (t0, id, p) }.toIndexedSeq)
      q.processAllAvailable()
      val advancer = (java.sql.Timestamp.valueOf("2024-01-01 12:00:00"),
        999999999L, "watermark advancer payload zzz".getBytes("UTF-8"))
      in.addData(advancer)
      q.processAllAvailable()
      val got = spark.sql("SELECT id_new, id_ref, hamming FROM stream_phash_flags")
        .as[(Long, Long, Int)].collect().toSet
      // brute force over EVERYTHING streamed (advancer included, in case
      // its hash happens to land near a reference hash)
      val streamedDf = (arriving :+ (advancer._2, advancer._3)).toSeq
        .toDF("media_id", "payload")
      val newH = Multimodal.perceptualHash(streamedDf).as[(Long, Long)].collect()
      val refH = Multimodal.perceptualHash(ref).as[(Long, Long)].collect()
      val expect = (for {
        (inew, hn) <- newH; (iref, hr) <- refH
        d = java.lang.Long.bitCount(hn ^ hr) if d <= 3
      } yield (inew, iref, d)).toSet
      assert(got == expect, s"stream flags != brute-force pair set " +
        s"(missing ${(expect -- got).size}, extra ${(got -- expect).size})")
      // every planted twin flags its own original at hamming 0
      val planted = refH.map { case (ir, _) => (ir + 10000000L, ir, 0) }.toSet
      assert(planted.subsetOf(got), "a byte-identical twin flag is missing")
    } finally { q.stop(); idx.unpersist() }
  }

  test("streaming Bloom span scrub == batch rewrite against the same sketch") {
    // the rewrite's streaming form: dupGramBloom compresses the reference
    // corpus' duplicated grams once, and removeDupSpansBloom is a pure
    // projection (no join/agg/generator — spec-pinned), so the SAME call
    // scrubs an unbounded stream with zero state
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Dedup
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val bloom = Dedup.dupGramBloom(Dedup.dupGramBuild(docs, "doc_id", "text", 5))
    val in = MemoryStream[(Long, String)]
    val scrubbed = Dedup.removeDupSpansBloom(
      in.toDF().toDF("doc_id", "text"), bloom, "doc_id", "text", 5)
    val q = scrubbed.writeStream.format("memory")
      .queryName("stream_span_scrub").outputMode("append").start()
    try {
      val rows = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      in.addData(rows.toIndexedSeq)
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT doc_id, n_tokens, n_removed, text_clean FROM stream_span_scrub")
        .as[(Long, Int, Long, String)].collect().toSet
      val batch = Dedup.removeDupSpansBloom(docs, bloom, "doc_id", "text", 5)
        .as[(Long, Int, Long, String)].collect().toSet
      assert(got == batch, "streaming scrub diverges from the batch projection")
      assert(got.exists(_._3 > 0L), "corpus must contain scrubbed spans")
    } finally q.stop()
  }

  test("streaming audio flags against a PREBUILT landmark index == brute-force capped-set Jaccard pairs") {
    // the audio modality's streaming twin (round 15): landmarks compute
    // per row through the same decoder-seam kernel with the background
    // set filtered INSIDE the kernel (capped-set sizes match the batch
    // contract), candidate lookup is stream-static, the shared-landmark
    // count is the one watermark-bounded windowed aggregation
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Multimodal
    val media = Multimodal.fromDocuments(
        spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet"))
      .select($"media_id", $"payload")
    val ref = media.filter($"media_id" % 2 === 0)
    val idx = Multimodal.audioIndexBuild(ref, windowBytes = 32, hop = 16,
      maxLandmarkDf = 20).persist()
    val in = MemoryStream[(java.sql.Timestamp, Long, Array[Byte])]
    val flags = Multimodal.streamingAudioFlagsWith(
      in.toDF().toDF("ts", "media_id", "payload"), idx,
      "ts", watermark = "1 hour", threshold = 0.5)
    val q = flags.writeStream.format("memory")
      .queryName("stream_audio_flags").outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:30")
      val arriving = media.filter($"media_id" % 2 === 1)
        .unionByName(spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
          .filter($"doc_id" % 2 === 0).select(
            ($"doc_id" + 10000000L).as("media_id"),
            org.apache.spark.sql.functions.encode(
              org.apache.spark.sql.functions.concat(
                org.apache.spark.sql.functions.lpad($"doc_id".cast("string"), 14, "0"),
                org.apache.spark.sql.functions.lit(": "), $"text"),
              "UTF-8").as("payload")))
        .select($"media_id", $"payload").as[(Long, Array[Byte])].collect()
      in.addData(arriving.map { case (id, p) => (t0, id, p) }.toIndexedSeq)
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2024-01-02 00:00:00"),
        999999999L, "watermark advancer padded to some length!!!!!!!!!!!!!"
          .getBytes("UTF-8")))
      q.processAllAvailable()
      val got = spark.sql("SELECT id_new, id_ref, jaccard_r FROM stream_audio_flags")
        .as[(Long, Long, Double)].collect().toSet
      // brute force over the arriving rows (advancer included) under the
      // SAME reference-side background cap
      val viral = idx.viral.as[Long].collect().toSet
      def lmSets(df: org.apache.spark.sql.DataFrame) =
        Multimodal.audioLandmarks(df, 32, 16).as[(Long, Long)].collect()
          .groupBy(_._1).map { case (k, v) => k -> (v.map(_._2).toSet -- viral) }
      val rs = lmSets(ref)
      val bs = lmSets((arriving :+ (999999999L,
        "watermark advancer padded to some length!!!!!!!!!!!!!".getBytes("UTF-8")))
        .toSeq.toDF("media_id", "payload"))
      val expect = (for {
        (in_, ln) <- bs.toSeq; (ir, lr) <- rs.toSeq
        sh = (ln & lr).size if sh > 0
        j = BigDecimal(sh.toDouble / (ln.size + lr.size - sh))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble if j >= 0.5
      } yield (in_, ir, j)).toSet
      assert(got == expect, s"stream audio flags != brute force " +
        s"(missing ${(expect -- got).size}, extra ${(got -- expect).size})")
      assert(got.nonEmpty)
    } finally { q.stop(); idx.unpersist() }
  }

  test("streaming video flags against a PREBUILT frame index == brute-force Jaccard pairs") {
    // the video modality's streaming twin: distinct frame hashes compute
    // PER ROW (array HOF), candidate lookup is stream-static against the
    // inverted reference relation, and the shared-frame count is the one
    // watermark-bounded windowed aggregation
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Multimodal
    val media = Multimodal.fromDocuments(
        spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet"))
      .select($"media_id", $"payload")
    val ref = media.filter($"media_id" % 2 === 0)
    val idx = Multimodal.frameIndexBuild(ref).persist()
    val in = MemoryStream[(java.sql.Timestamp, Long, Array[Byte])]
    val flags = Multimodal.streamingVideoFlagsWith(
      in.toDF().toDF("ts", "media_id", "payload"), idx,
      "ts", watermark = "1 hour", threshold = 0.5)
    val q = flags.writeStream.format("memory")
      .queryName("stream_video_flags").outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:30")
      val arriving = media.filter($"media_id" % 2 === 1)
        .unionByName(ref.withColumn("media_id", $"media_id" + 10000000L))
        .select($"media_id", $"payload").as[(Long, Array[Byte])].collect()
      in.addData(arriving.map { case (id, p) => (t0, id, p) }.toIndexedSeq)
      q.processAllAvailable()
      // advance the watermark far past the 1-hour window so the windowed
      // aggregate closes and emits
      in.addData((java.sql.Timestamp.valueOf("2024-01-02 00:00:00"),
        999999999L, "watermark advancer".getBytes("UTF-8")))
      q.processAllAvailable()
      val got = spark.sql("SELECT id_new, id_ref, jaccard_r FROM stream_video_flags")
        .as[(Long, Long, Double)].collect().toSet
      // brute force over the arriving rows (advancer included)
      def sets(df: org.apache.spark.sql.DataFrame) =
        Multimodal.frameSignatures(df).select($"media_id", $"frame_fp")
          .as[(Long, Long)].collect().groupBy(_._1)
          .map { case (k, v) => k -> v.map(_._2).toSet }
      val rs = sets(ref)
      val bs = sets((arriving :+ (999999999L, "watermark advancer".getBytes("UTF-8")))
        .toSeq.toDF("media_id", "payload"))
      val expect = (for {
        (in_, fn) <- bs.toSeq; (ir, fr) <- rs.toSeq
        sh = (fn & fr).size if sh > 0
        j = BigDecimal(sh.toDouble / (fn.size + fr.size - sh))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble if j >= 0.5
      } yield (in_, ir, j)).toSet
      assert(got == expect, s"stream video flags != brute force " +
        s"(missing ${(expect -- got).size}, extra ${(got -- expect).size})")
      assert(got.nonEmpty)
    } finally { q.stop(); idx.unpersist() }
  }

  test("streaming calibration apply == batch apply against the same static model") {
    // the apply is a stateless projection + broadcast join, so the same
    // call runs on a stream: arriving docs rank against the TRAINED
    // reference distribution, no state anywhere
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val model = graft.ops.TextAnalysis.qualityCalibrationBuild(
      docs.filter($"doc_id" % 2 === 0), "text", "lang")
    val in = MemoryStream[(Long, String, String)]
    val applied = graft.ops.TextAnalysis.calibrateQualityWith(
      in.toDF().toDF("doc_id", "lang", "text"), model, "text", "lang")
    val q = applied.writeStream.format("memory")
      .queryName("stream_calibrated").outputMode("append").start()
    try {
      val newDocs = docs.filter($"doc_id" % 2 === 1)
        .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
      in.addData(newDocs.toIndexedSeq)
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, lang, quality_score, cal_ppm FROM stream_calibrated")
        .as[(Long, String, Double, Long)].collect().toSet
      val batch = graft.ops.TextAnalysis.calibrateQualityWith(
          docs.filter($"doc_id" % 2 === 1), model, "text", "lang")
        .as[(Long, String, Double, Long)].collect().toSet
      assert(got == batch, "streaming apply diverges from the batch apply")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("normalize → streaming dedup → route: three ops chained end-to-end under a watermark") {
    // the full ingest stage (DESIGN.md §5) as ONE incremental pipeline:
    // clean the payload, drop exact re-deliveries within the watermark
    // horizon, then first-match-route the survivors — the router consumes
    // the same micro-batches the dedup state emits, no intermediate sink.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, String)]
    val cleaned = in.toDF().toDF("ts", "key", "raw")
      .withColumn("value", graft.ops.TextAnalysis.normalize($"raw"))
    val deduped = graft.ops.Dedup.streamingExactDedup(
      cleaned, "ts", "10 minutes", Seq("value"))
    val routed = graft.router.Router.route(
      deduped, graft.fixtures.DocRoutePlan.resolved)
    val q = routed.writeStream.format("memory")
      .queryName("clean_dedup_route").outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      in.addData(
        // two formatting variants of one doc -> ONE routed row (t-spark:
        // the regex split matches the normalized "spark query" text)
        (t0, "k1", "Spark   <b>query</b> basics"),
        (t0, "k2", "spark query basics"),
        // distinct doc matching no plan predicate -> unmatched route
        (t0, "k3", "just a plain note"),
        // exact re-delivery inside the watermark -> dropped by dedup
        (t0, "k4", "spark query basics"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT value, topic FROM clean_dedup_route")
        .as[(String, String)].collect().toSeq.sorted
      assert(rows == Seq(
        ("just a plain note", "t-unmatched"),
        ("spark query basics", "t-spark")),
        s"pipeline emitted: $rows")
    } finally q.stop()
  }

  test("chunking streams: stateless generators emit batch-identical chunks") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq((1L, "a" * 250), (2L, "b" * 40))
    val in = MemoryStream[(Long, String)]
    val chunked = graft.ops.TextAnalysis.chunkDocs(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", size = 120, stride = 90)
    val q = chunked.writeStream.format("memory")
      .queryName("chunk_stream").outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("chunk_stream")
        .as[(Long, Long, Long, String, Long)].collect().toSet
      val batch = graft.ops.TextAnalysis.chunkDocs(
        docs.toDF("doc_id", "text"), "doc_id", "text", size = 120, stride = 90)
        .as[(Long, Long, Long, String, Long)].collect().toSet
      assert(streamed == batch && batch.size == 4, s"stream/batch diverged")
    } finally q.stop()
  }

  test("streaming cross-corpus containment flags == batch pair set against the same artifact") {
    // containment joins the Build/With/streaming seam convention: the
    // reference gram artifact is static, every stream join is
    // stream-static (zero join state), the shared-gram count is one
    // watermark-bounded windowed aggregation
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val idx = graft.ops.Dedup.containmentBuild(
      docs.filter($"doc_id" % 2 === 0), "doc_id", "text", 3, maxDf = 100).persist()
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val flags = graft.ops.Dedup.streamingContainmentFlagsWith(
      in.toDF().toDF("ts", "doc_id", "text"), idx,
      "ts", "doc_id", "text", threshold = 0.6, watermark = "1 hour")
    val q = flags.writeStream.format("memory")
      .queryName("stream_containment").outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val newDocs = docs.filter($"doc_id" % 2 === 1)
        .select($"doc_id", $"text").as[(Long, String)].collect()
      in.addData(newDocs.map { case (id, tx) => (t0, id, tx) }.toIndexedSeq)
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2024-01-02 12:00:00"), 999999L,
        "watermark advancer row zzz"))
      q.processAllAvailable()
      val got = spark.table("stream_containment")
        .select($"id_new", $"id_ref").as[(Long, Long)].collect().toSet
      // the batch op aggregates to best-match; the stream emits the full
      // pair set — recompute it with the same artifact relations in batch
      import org.apache.spark.sql.functions._
      val fresh = docs.filter($"doc_id" % 2 === 1)
      val sh = fresh.select($"doc_id".as("id_new"),
        graft.ops.Dedup.shingles($"text", 3).as("sh"))
      val expect = sh.select($"id_new", size($"sh").as("n"), explode($"sh").as("g"))
        .select($"id_new", $"n", xxhash64($"g").as("gh"))
        .join(idx.refGrams, Seq("gh"))
        .groupBy($"id_new", $"id_ref", $"n").agg(count(lit(1)).as("c"))
        .filter(round($"c".cast("double") / $"n", 4) >= 0.6)
        .select($"id_new", $"id_ref").as[(Long, Long)].collect().toSet
      assert(got == expect, "stream containment flags diverge from the batch pair set")
      assert(got.nonEmpty)
    } finally { q.stop(); idx.unpersist() }
  }

  test("streaming cross-corpus winnowing flags == batch flags against the same artifact") {
    // the winnowing seam joins the Build/With/streaming convention: the
    // fingerprint selection is the SAME pure projection in both paths,
    // the reference join is stream-static, shared counts come from one
    // watermark-bounded windowed aggregation
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val idx = graft.ops.Dedup.winnowBuild(
      docs.filter($"doc_id" % 2 === 0), "doc_id", "text",
      n = 3, window = 4, maxDf = 20).persist()
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val flags = graft.ops.Dedup.streamingWinnowFlagsWith(
      in.toDF().toDF("ts", "doc_id", "text"), idx,
      "ts", "doc_id", "text", minShared = 2, watermark = "1 hour")
    val q = flags.writeStream.format("memory")
      .queryName("stream_winnow").outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val fresh = docs.filter($"doc_id" % 2 === 1)
      val newDocs = fresh.select($"doc_id", $"text").as[(Long, String)].collect()
      in.addData(newDocs.map { case (id, tx) => (t0, id, tx) }.toIndexedSeq)
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2024-01-02 12:00:00"), 999999L,
        "watermark advancer row zzz qq ww"))
      q.processAllAvailable()
      val got = spark.table("stream_winnow")
        .select($"id_new", $"id_ref", $"shared_fp")
        .as[(Long, Long, Long)].collect().toSet
      val expect = graft.ops.Dedup.winnowFlagsWith(fresh, idx, "doc_id", "text",
          minShared = 2)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expect, "stream winnowing flags diverge from the batch pair set")
      assert(got.nonEmpty)
    } finally { q.stop(); idx.unpersist() }
  }

  test("streaming exact cross dedup: stateless stream-static anti join == batch survivors") {
    // the strongest streaming twin: the batch call IS the streaming call —
    // no watermark, no state store; each row's verdict is its own
    // fingerprint lookup against the frozen artifact
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val d = docs.withColumn("prefix80", org.apache.spark.sql.functions.substring($"text", 1, 80))
    val idx = graft.ops.Dedup.exactBuild(
      d.filter($"doc_id" % 2 === 0), "prefix80").persist()
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
      .withColumn("prefix80", org.apache.spark.sql.functions.substring($"text", 1, 80))
    val kept = graft.ops.Dedup.streamingExactDedupWith(stream, idx, "prefix80")
    val q = kept.writeStream.format("memory")
      .queryName("stream_exact_cross").outputMode("append").start()
    try {
      val fresh = docs.filter($"doc_id" % 2 === 1)
        .select($"doc_id", $"text").as[(Long, String)].collect()
      in.addData(fresh.toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("stream_exact_cross")
        .select($"doc_id").as[Long].collect().toSet
      val batch = graft.ops.Dedup.exactDedupWith(
          d.filter($"doc_id" % 2 === 1), idx, "prefix80")
        .select($"doc_id").as[Long].collect().toSet
      assert(got == batch, "streaming survivors diverge from the batch anti join")
      assert(got.nonEmpty && got.size < fresh.length,
        "fixture should both keep and drop rows")
      // and the query held NO state across the batch
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0),
        "stream-static anti join must be stateless")
    } finally { q.stop(); idx.unpersist() }
  }

  test("drift monitor in foreachBatch: per-micro-batch scoreDriftWith == batch scoreDrift") {
    // the streaming form of the drift monitor: the reference histogram is
    // a frozen artifact, each micro-batch recomputes its own census —
    // zero streaming state, and every per-batch report must equal the
    // batch op run on exactly that batch's rows
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val scored = graft.ops.TextAnalysis.qualityScore(docs, "text")
      .select($"doc_id", $"quality_score")
    val idx = graft.ops.Analytics.driftBuild(
      scored.filter($"doc_id" % 2 === 0), "quality_score").persist()
    val in = MemoryStream[(Long, Double)]
    val reports = scala.collection.mutable.ArrayBuffer[Set[(Int, Long, Long, Double)]]()
    val q = in.toDF().toDF("doc_id", "quality_score").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          reports.synchronized {
            reports += graft.ops.Analytics
              .scoreDriftWith(batch, idx, "quality_score")
              .as[(Int, Long, Long, Double)].collect().toSet
          }
        }
        ()
      }
      .start()
    try {
      val odd = scored.filter($"doc_id" % 2 === 1)
        .as[(Long, Double)].collect()
      val (batchA, batchB) = odd.partition(_._1 % 4 == 1)
      in.addData(batchA.toIndexedSeq); q.processAllAvailable()
      in.addData(batchB.toIndexedSeq); q.processAllAvailable()
      val ref = scored.filter($"doc_id" % 2 === 0)
      def expectFor(rows: Array[(Long, Double)]) =
        graft.ops.Analytics.scoreDrift(ref,
            rows.toSeq.toDF("doc_id", "quality_score"), "quality_score")
          .as[(Int, Long, Long, Double)].collect().toSet
      assert(reports.toList == List(expectFor(batchA), expectFor(batchB)),
        "per-batch streaming drift reports diverge from the batch op")
    } finally { q.stop(); idx.unpersist() }
  }
}
