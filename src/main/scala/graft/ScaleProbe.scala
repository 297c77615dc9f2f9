package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Analytics, Events}
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    // optional probe-tag filter (substring match): re-measure individual
    // probes without the 45-min full sweep — shared-box contention makes
    // single-run figures swing up to ~10×, so the committed numbers are
    // min-of-runs per probe
    val only = args.drop(1).toSet
    def want(tag: String): Boolean = only.isEmpty || only.exists(tag.contains)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","64").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // word-salad docs from a 5k vocab; every 100th doc is a near-dup of its
    // neighbor (same words, 2 swapped) — planted pairs like the testdata's
    val vocab = 5000
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 80).map(i =>
        concat(lit("w"), pmod(xxhash64(col("id") - pmod(col("id"), lit(2)), lit(i)), lit(vocab)))): _*).as("text"))
      .withColumn("text", when(pmod(col("doc_id"), lit(2)) === 1,
        concat(col("text"), lit(" extraword"), col("doc_id"))).otherwise(col("text")))
    docs.cache(); val cnt = docs.count()
    def time(tag: String)(f: => Long): Unit = if (want(tag)) {
      // one family's failure must not abort the rest of the suite (the
      // round-13 containment broadcast OOM killed every probe after it;
      // a guard like UnigramMaxLen firing at a larger n would too) —
      // print the failure AS a probe line and keep sweeping. NonFatal
      // only (round-13 advice): after a driver-side OOM or other fatal
      // JVM error the session state is undefined and every later probe
      // line would be silently unreliable — print the line, then
      // RETHROW so the sweep aborts loudly instead of reporting garbage
      val t0 = System.nanoTime()
      try {
        val r = f
        println(f"SCALE $tag: n=$cnt rows=$r secs=${(System.nanoTime()-t0)/1e9}%.1f")
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"SCALE $tag: FAILED ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(200)}")
        case e: Throwable =>
          println(s"SCALE $tag: FATAL ${e.getClass.getSimpleName} — aborting the sweep " +
            "(driver state undefined; later lines would be unreliable)")
          throw e
      }
    }
    time("minhash_lsh_neardups")(
      graft.ops.Dedup.minHashNearDups(docs, "doc_id", "text", 3, 16, 4, 0.5).count())
    time("simhash_neardups")(
      graft.ops.Dedup.simHashNearDups(docs, "doc_id", "text", 3).count())
    time("exact_dedup")(
      graft.ops.Dedup.exactDedup(docs, "text", "doc_id").count())
    // round-4 text ops at 1M docs (same corpus): all scan-speed or
    // single-aggregation shapes — the claim under test is that none of
    // them goes super-linear
    time("top_bigrams")(
      graft.ops.TextAnalysis.topNGrams(docs, "text", 2, 20).count())
    time("tfidf_top3")(
      graft.ops.TextAnalysis.topTermsPerDoc(docs, "doc_id", "text", 3).count())
    time("bloom_decontaminate")( {
      val bloom = graft.ops.TextAnalysis.benchmarkBloom(
        docs.filter(col("doc_id") < 10), "text", 3, fpp = 1e-4)
      graft.ops.TextAnalysis.decontaminationScoreBloom(docs, bloom, "doc_id", "text", 3).count()
    })
    time("curation_pipeline")( {
      val docsL = docs.withColumn("lang",
        element_at(array(lit("en"), lit("fr"), lit("es")),
          (pmod(xxhash64(col("doc_id")), lit(3)) + 1).cast("int")))
      val cleaned = docsL.select(col("doc_id"), col("lang"),
          graft.ops.TextAnalysis.normalize(col("text")).as("norm"))
        .filter(graft.ops.TextAnalysis.tokenCount(col("norm")) >= 5)
      val sampled = graft.ops.TextAnalysis.stratifiedSample(
        cleaned, "lang", "norm", Map("en" -> 600), defaultPerMille = 800)
      graft.ops.Dedup.exactDedup(sampled, "norm", "doc_id")
        .select(col("doc_id"), graft.ops.TextAnalysis.splitAssignment(col("norm")))
        .count()
    })
    // chunking at scale: pure generators — the claim is scan-speed with
    // output ~size/stride × input
    time("docs_chunk_400x300")(
      graft.ops.TextAnalysis.chunkDocs(docs, "doc_id", "text", 400, 300).count())
    // split leakage at scale uses the BLOOM path (the exact broadcast of a
    // 90%-of-corpus gram set cannot broadcast at 1M docs — exactly the
    // swap the splitLeakage scaladoc prescribes): train-split grams into a
    // distributed-built sketch, held-out docs probe it in a HOF filter
    time("split_leakage_bloom")( {
      val withSplit = docs.withColumn("__split",
        graft.ops.TextAnalysis.splitAssignment(col("text")))
      val bloom = graft.ops.TextAnalysis.benchmarkBloom(
        withSplit.filter(col("__split") === "train"), "text", 3, fpp = 1e-4)
      graft.ops.TextAnalysis.decontaminationScoreBloom(
        withSplit.filter(col("__split") =!= "train"), bloom, "doc_id", "text", 3).count()
    })
    // keeper selection on top of the full pair→cluster pipeline: the
    // incremental cost over duplicateClusters alone is ONE max_by exchange
    time("keep_best_canonical")( {
      val pairs = graft.ops.Dedup.minHashNearDups(docs, "doc_id", "text", 3, 16, 4, 0.5)
      val clusters = graft.ops.Dedup.duplicateClusters(pairs, docs, "doc_id")
      val scored = docs.select(col("doc_id"),
        (pmod(xxhash64(col("doc_id")), lit(1000L)).cast("double") / 1000.0).as("score"))
      graft.ops.Dedup.keepBest(clusters, scored, "doc_id", "score").count()
    })
    // BPE trainer at 1M docs: the corpus-scale phase is ONE word-count
    // aggregation; the 5 merge rounds then run over the ~505k-word
    // weighted vocab (the planted per-doc "extraword<id>" tokens make the
    // vocab corpus-sized here — the adversarial case for the vocab loop)
    time("bpe_merges_5")(
      graft.ops.TextAnalysis.bpeMerges(docs, "text", 5).count())
    // round-6 text ops at 1M docs: the df-capped similarity join's
    // candidate volume is Σ_term C(df,2) — with the planted twins every
    // non-dup gram is unique (df≈1) and twin grams have df 2, so the join
    // stays linear; word lift is bounded by C(vocabK,2) pairs per doc
    time("tfidf_simjoin_dfcap")(
      graft.ops.TextAnalysis.tfidfSimJoin(docs, "doc_id", "text", 3,
        dfCap = 20, threshold = 0.5).count())
    time("word_lift_top40")(
      graft.ops.TextAnalysis.wordLift(docs, "doc_id", "text", 40, 5).count())
    // bigram-LM scoring at 1M docs (~79M-bigram stream): the model is an
    // aggregation of that stream and joins back on the same (w1,w2) key —
    // the probe pins that nothing here is super-linear in the stream
    time("lm_score_bigram")(
      graft.ops.TextAnalysis.lmScore(docs, "doc_id", "text").count())
    // round-9 substring-removal REWRITE at 1M docs. This corpus is the
    // worst case: every even/odd twin pair shares ~all its grams, so
    // nearly every token position is covered (span explode ≈ 5× the gram
    // stream) and most documents reassemble to near-empty — the probe
    // pins that coverage explode, anti join and per-doc collect all stay
    // linear. Forcing sum(length(text_clean)) keeps the reassembly
    // expression alive (a bare count would let Catalyst prune the
    // collect_list assembly out of the aggregate).
    time("remove_dup_spans")(
      graft.ops.Dedup.removeDupSpans(docs, "doc_id", "text", 5, hashGrams = true)
        .select(sum(length(col("text_clean"))).cast("long").as("b"))
        .first().getLong(0))
    // round-9 video near-dup at 1M: every odd doc is its even neighbor's
    // text + " extraword<id>" — a shared prefix, so the pair shares every
    // full 64-char frame except the tail (a planted re-encode). The
    // inverted frame-hash index must pull ~500k twin pairs without an
    // all-pairs join.
    time("video_neardups_1M")(
      graft.ops.Multimodal.videoNearDups(
        docs.select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("payload")),
        frameBytes = 64, threshold = 0.5).count())
    // round-15 audio near-dup at n recordings: every odd doc is its even
    // neighbor's text behind a 16-byte (one-hop) prefix — the hop-aligned
    // time shift preserves every interior constellation landmark, so the
    // inverted landmark index must pull ~n/2 twin pairs; the df cap keeps
    // the background landmarks of the 31-word vocabulary from going
    // quadratic (capped-set Jaccard, op scaladoc)
    time("audio_neardups_1M")(
      graft.ops.Multimodal.audioNearDups(
        docs.select(col("doc_id").as("media_id"),
          encode(when(pmod(col("doc_id"), lit(2)) === 1,
              concat(lpad(col("doc_id").cast("string"), 14, "0"), lit(": "),
                col("text")))
            .otherwise(col("text")), "UTF-8").as("payload")),
        windowBytes = 32, hop = 16, threshold = 0.5, maxLandmarkDf = 20)
        .count())
    // inverted-index build: one distinct term-doc exchange + broadcast
    // top-k roster + sorted posting assembly
    time("postings_top20")(
      graft.ops.TextAnalysis.postings(docs, "doc_id", "text", 20).count())
    // round-8 production posting form at 1M docs: EVERY term (k=0, no
    // roster cap — the planted per-doc "extraword<id>" tokens make the
    // vocab corpus-sized), assembly keyed (term, seg) so no aggregation
    // buffer ever holds more than segSize ids regardless of term df
    time("postings_segments_all")(
      graft.ops.TextAnalysis.postingsSegments(docs, "doc_id", "text",
        0, segSize = 4096L).count())
    // round-7 scale fixes at 1M docs: the four ops whose round-6 forms hid
    // single-task or O(group)-state bottlenecks (VERDICT r6 "What's
    // wrong") — the probe pins the bounded replacements at corpus scale,
    // where the old forms would funnel ~n/|langs| rows through one task
    // or buffer them in one aggregation state
    val docsL7 = docs.withColumn("lang",
      element_at(array(lit("en"), lit("fr"), lit("es")),
        (pmod(xxhash64(col("doc_id")), lit(3)) + 1).cast("int")))
    // histogram median: agg state is ≤101 buckets per language, never
    // O(corpus); the dominant language here is ~n/3 rows
    time("quality_gate_hist")(
      graft.ops.TextAnalysis.qualityGate(docsL7, "text").count())
    // histogram percent-rank: no whole-language rank window anywhere
    time("quality_calibrated_hist")(
      graft.ops.TextAnalysis.calibrateQuality(docsL7, "text", "lang").count())
    // analytic mix position: one key-local rank + a |sources|-term
    // projection — no global rank, no broadcast of a corpus-sized relation
    time("mix_interleave_3src")(
      graft.ops.TextAnalysis.mixInterleave(docsL7, "lang", "doc_id",
        Map("en" -> 3, "fr" -> 2)).count())
    // two-phase shard positions at the adversarial SMALL shard count —
    // parallelism is nShards × posBuckets, not nShards
    time("shuffle_shards_8")(
      graft.ops.TextAnalysis.shuffleShards(docs, "doc_id", "text", 8).count())
    // two-phase token packing over FEW keys (3 langs ≈ 333k docs each):
    // the claim is that no language funnels through one cumsum task —
    // parallelism is |langs| × posBuckets
    time("pack_bins_3lang")(
      graft.ops.TextAnalysis.packBins(docsL7, "doc_id", "text", 4096L,
        Seq("lang")).count())
    // per-source top-k at 1M docs over an adversarial FEW-source domain
    // (20 sources ≈ 50k docs each, coarse 6-value score lattice → the
    // boundary bucket is large): the claim is that above-threshold rows
    // take no ranking work and the only sorted slice is one bucket
    time("source_cap_10k")( {
      val docsS = docs.withColumn("source",
        concat(lit("src"), pmod(xxhash64(col("doc_id"), lit(7)), lit(20))))
      graft.ops.TextAnalysis.sourceCap(docsS, "text", 10000, "source").count()
    })
    // cross-corpus near-dedup at 500k vs 500k (the parity split of the
    // planted-pair corpus): asymmetric band join + verify-candidates-only
    // — every planted (even, odd) twin pair crosses the split
    time("cross_corpus_neardups")(
      graft.ops.Dedup.crossCorpusNearDups(
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        "doc_id", "text", 3, 16, 4, 0.5).count())
    // round-8 artifact seam: the 500k reference is banded+shingled ONCE
    // (timed as _build, persisted), then TWO disjoint 250k crawl batches
    // pay only their own banding + the probe join — per-batch cost must
    // sit well under the raw op's (which rebands the reference per call)
    val ccIdx = graft.ops.Dedup.crossCorpusBuild(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text",
      3, 16, 4).persist()
    time("cross_corpus_build_once")(
      ccIdx.refBuckets.count() + ccIdx.refShingles.count())
    time("cross_corpus_batch1_vs_artifact")(
      graft.ops.Dedup.crossCorpusNearDupsWith(
        docs.filter(pmod(col("doc_id"), lit(4)) === 1), ccIdx,
        "doc_id", "text", 0.5, maxBucketSize = 1000).count())
    time("cross_corpus_batch2_vs_artifact")(
      graft.ops.Dedup.crossCorpusNearDupsWith(
        docs.filter(pmod(col("doc_id"), lit(4)) === 3), ccIdx,
        "doc_id", "text", 0.5, maxBucketSize = 1000).count())
    ccIdx.unpersist()
    // planted hot bucket (the maxBucketSize guard): 10k byte-identical
    // boilerplate docs split across the halves collide in ONE bucket per
    // band — uncapped that bucket alone is 5k×5k×16 ≈ 4×10⁸ candidate
    // pairs (infeasible); with the wired cap the run must stay at the
    // clean-corpus cost, dropping exactly the boilerplate flags
    time("cross_corpus_hot_bucket_capped")( {
      val boiler = spark.range(10000).select(
        (col("id") + 50000000L).as("doc_id"),
        lit("identical boilerplate navigation header and footer page block").as("text"))
      val withB = docs.select(col("doc_id"), col("text")).unionByName(boiler)
      graft.ops.Dedup.crossCorpusNearDups(
        withB.filter(pmod(col("doc_id"), lit(2)) === 1),
        withB.filter(pmod(col("doc_id"), lit(2)) === 0),
        "doc_id", "text", 3, 16, 4, 0.5, maxBucketSize = 1000).count()
    })
    // round-10 containment seam at 1M docs: the reference gram index is
    // built ONCE (df-capped reference-side), two disjoint crawl batches
    // pay only their own gram explode + the bounded probe join — the
    // claim is per-batch cost linear in the batch with each new-doc gram
    // meeting ≤ maxDf reference rows
    val cIdx = graft.ops.Dedup.containmentBuild(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text",
      3, maxDf = 100).persist()
    time("containment_build_once")(cIdx.refGrams.count())
    time("containment_batch1_vs_artifact")(
      graft.ops.Dedup.containmentFlagsWith(
        docs.filter(pmod(col("doc_id"), lit(4)) === 1), cIdx,
        "doc_id", "text", 0.6).count())
    time("containment_batch2_vs_artifact")(
      graft.ops.Dedup.containmentFlagsWith(
        docs.filter(pmod(col("doc_id"), lit(4)) === 3), cIdx,
        "doc_id", "text", 0.6).count())
    cIdx.unpersist()
    // planted hot gram (the df-cap guard): 10k boilerplate docs share
    // every gram — uncapped, each such gram alone is 5k×5k directed
    // candidate pairs (quadratic, infeasible at corpus scale); with the
    // reference-side cap the shared grams exceed maxDf and drop, so the
    // run must stay at the clean-corpus cost
    time("containment_hot_gram_capped")( {
      val boiler = spark.range(10000).select(
        (col("id") + 60000000L).as("doc_id"),
        lit("identical boilerplate navigation header and footer page block").as("text"))
      val withB = docs.select(col("doc_id"), col("text")).unionByName(boiler)
      graft.ops.Dedup.crossCorpusContainment(
        withB.filter(pmod(col("doc_id"), lit(2)) === 1),
        withB.filter(pmod(col("doc_id"), lit(2)) === 0),
        "doc_id", "text", 3, 0.6, maxDf = 100).count()
    })
    // perceptual-hash near-dup at 1M media rows (500k originals + 500k
    // planted byte-identical twins — hamming 0 guaranteed). This corpus
    // is ADVERSARIAL for aHash: word-salad byte planes are statistically
    // homogeneous, so hash entropy is low and distances concentrate near
    // 0 — the exact-match leg (nChunks=1: bucket = whole hash) groups
    // ~3.1M pairs and the hamming≤2 leg (3 × 16-bit chunks) verifies
    // ~36M — and what the probe pins is that the banding join and exact
    // verification SURVIVE that collision regime at bounded memory
    // (~22 s / ~110 s). Real image planes separate far better; hash
    // CORRECTNESS (banding == brute force) is spec-pinned at test scale,
    // where the wired query's pair set is selective.
    val mediaP = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("doc_id").as("media_id"), encode(col("text"), "UTF-8").as("payload"))
    val mediaTw = mediaP.withColumn("media_id", col("media_id") + lit(60000000L))
      .unionByName(mediaP)
    time("phash_exact_match_1M")(
      graft.ops.Multimodal.phashNearDups(mediaTw,
        maxHamming = 0, nChunks = 1).count())
    time("phash_neardups_1M")(
      graft.ops.Multimodal.phashNearDups(mediaTw,
        maxHamming = 2, nChunks = 3).count())
    // round-9 artifact seam: the 500k-reference plane scan + hash runs
    // ONCE (timed as _build, persisted); two disjoint 250k crawl batches
    // then pay only their own hashing + the (chunk, ck) probe join.
    // Exact-match leg (nChunks=1): the regime where this adversarial
    // text-plane corpus keeps bounded buckets (see the phash_exact probe
    // note above); per-batch cost must sit well under build + batch.
    val phIdx = graft.ops.Multimodal.phashBuild(mediaP, nChunks = 1).persist()
    time("phash_build_once_500k")(phIdx.refChunks.count())
    time("phash_batch1_vs_artifact")(
      graft.ops.Multimodal.phashNearDupsWith(
        mediaTw.filter(pmod(col("media_id"), lit(4)) === 0), phIdx,
        maxHamming = 0).count())
    time("phash_batch2_vs_artifact")(
      graft.ops.Multimodal.phashNearDupsWith(
        mediaTw.filter(pmod(col("media_id"), lit(4)) === 2), phIdx,
        maxHamming = 0).count())
    phIdx.unpersist()
    graft.Cleanup.drain() // materialized tf and bigram relations
    docs.unpersist()

    // ANN at scale: CLUSTERED corpus (what real embedding spaces look like
    // — a mixture of ~1000 tight clusters: center + 15% noise), 50 queries;
    // IVF vs brute. A uniform-random cloud is the adversarial worst case
    // for ANY space-partitioning ANN index — no structure for k-means to
    // learn, true neighbors spread across many Voronoi cells (recall 0.42
    // measured on uniform data at this n/nlist/nprobe) — and is NOT what
    // trained-model embeddings look like. Training is timed separately:
    // the coarse quantizer is a build-once artifact amortized over every
    // query batch, not a per-query cost.
    val dim = 64
    val nClusters = 1000L
    val cid = pmod(xxhash64(col("id")), lit(nClusters))
    val emb = spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), i => {
        val center = (pmod(xxhash64(cid, i), lit(2001L)).cast("double") - 1000.0) / 1000.0
        val noise = (pmod(xxhash64(col("id"), i, lit(11)), lit(2001L)).cast("double") - 1000.0) / 1000.0
        center + noise * 0.15
      }).as("embedding"))
      .cache()
    emb.count()
    val queries = emb.filter(col("vec_id") < 50)
    var brute: Set[(Long, Long)] = null
    time("ann_bruteforce_topk")( {
      brute = graft.ops.Similarity.bruteForceTopK(emb, queries, 10)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      brute.size.toLong
    })
    var trained: (Seq[Long], Seq[Seq[Double]]) = null
    time("ann_ivf_train_kmeans")( {
      trained = graft.ops.Similarity.kmeansCentroids(emb, nlist = 1000, iters = 4)
      trained._1.length.toLong
    })
    var ivf: Set[(Long, Long)] = null
    time("ann_ivf_topk")( {
      // a tag filter can run this leg without the train leg — train here
      // rather than pass Some(null) into ivfTopK
      if (trained == null)
        trained = graft.ops.Similarity.kmeansCentroids(emb, nlist = 1000, iters = 4)
      ivf = graft.ops.Similarity.ivfTopK(emb, queries, 10, nlist = 1000, nprobe = 32,
          pretrained = Some(trained))
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      ivf.size.toLong
    })
    if (brute != null && ivf != null)
      println(f"SCALE ann_recall: ${(brute intersect ivf).size.toDouble / brute.size}%.3f")
    // round-10 PQ on the same clustered corpus: training Lloyd-iterates on
    // the driver over a bounded 8k sample, encoding is one kernel pass over
    // the corpus, ADC scans the compressed codes, IVF-PQ prunes the scan to
    // nprobe buckets — the claims under test are that encode is scan-speed,
    // ADC recall holds at production ksub, and pruning composes
    var pqBooks: graft.ops.Similarity.PqBooks = null
    time("pq_train_m8_k256")( {
      pqBooks = graft.ops.Similarity.pqTrain(emb, m = 8, ksub = 256, iters = 4)
      pqBooks.ksub.toLong
    })
    var pqEnc: org.apache.spark.sql.DataFrame = null
    time("pq_encode")( {
      if (pqBooks == null)
        pqBooks = graft.ops.Similarity.pqTrain(emb, m = 8, ksub = 256, iters = 4)
      pqEnc = graft.ops.Similarity.pqEncode(emb, pqBooks).cache()
      pqEnc.count()
    })
    var pq: Set[(Long, Long)] = null
    time("pq_adc_topk")( {
      pq = graft.ops.Similarity.pqTopK(pqEnc, queries, 10, pqBooks)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pq.size.toLong
    })
    // ADC recall is judged against the exact DOT ranking (what ADC
    // approximates), not the cosine ranking
    var bruteDot: Set[(Long, Long)] = null
    time("pq_exact_dot_topk")( {
      bruteDot = graft.ops.Similarity.dotTopK(emb, queries, 10)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      bruteDot.size.toLong
    })
    if (bruteDot != null && pq != null)
      println(f"SCALE pq_adc_recall: ${(bruteDot intersect pq).size.toDouble / bruteDot.size}%.3f")
    var ivfpq: graft.ops.Similarity.IvfPqIndex = null
    time("ivfpq_build")( {
      ivfpq = graft.ops.Similarity.ivfPqBuild(emb, nlist = 1000, m = 16, ksub = 256,
        trainIters = 4, pqIters = 4)
      ivfpq.encoded.cache().count()
    })
    var ivfpqHits: Set[(Long, Long)] = null
    time("ann_ivfpq_topk")( {
      ivfpqHits = graft.ops.Similarity.ivfPqQuery(ivfpq, queries, 10, nprobe = 32)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      ivfpqHits.size.toLong
    })
    if (bruteDot != null && ivfpqHits != null)
      println(f"SCALE ivfpq_recall: ${(bruteDot intersect ivfpqHits).size.toDouble / bruteDot.size}%.3f")
    var refined: Set[(Long, Long)] = null
    time("ann_ivfpq_refined_topk")( {
      refined = graft.ops.Similarity.ivfPqQueryRefined(ivfpq, emb, queries, 10,
          nprobe = 32, refineMult = 8)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      refined.size.toLong
    })
    if (bruteDot != null && refined != null)
      println(f"SCALE ivfpq_refined_recall: ${(bruteDot intersect refined).size.toDouble / bruteDot.size}%.3f")
    // round-9 label-aware retrieval on the same clustered corpus: the
    // label predicate rides inside the broadcast join, so the probe's
    // claim is simply "same cost as label-blind brute top-k"
    val embL = emb.withColumn("label", pmod(xxhash64(col("vec_id"), lit(13)), lit(20L)).cast("int"))
    time("hard_negatives_50q")(
      graft.ops.Similarity.hardNegatives(embL, embL.filter(col("vec_id") < 50), 10).count())
    time("knn_classify_50q")(
      graft.ops.Similarity.knnClassify(embL, embL.filter(col("vec_id") < 50), 10).count())
    // greedy k-center at n vectors: 16 driver rounds, each one linear
    // min-fold scan + a TakeOrdered argmax — the probe pins O(n·k) total
    // and that the per-round cost stays flat as the selected set grows
    // (the incremental least() fold never re-scans earlier centers)
    time("kcenter_coreset_16")(
      graft.ops.Similarity.kCenterCoreset(emb, 16).count())
    graft.Cleanup.drain() // per-round coreset checkpoints
    // MMR with the same round shape, plus the per-row relevance column
    time("mmr_select_8")(
      graft.ops.Similarity.mmrSelect(emb, emb.filter(col("vec_id") === 0), 8, 0.7).count())
    graft.Cleanup.drain()
    // power iteration at n vectors: 6 shuffle-free scans, one 64-cell
    // row to the driver per round. On THIS corpus (|x_i| ≤ ~1.15) the
    // quantized addends are ~10^6, so a long sum would still have
    // headroom here — the decimal sums are for the 10^10+-row regime
    // where it would not (powerIteration scaladoc)
    time("pca_power_6")(
      graft.ops.Similarity.powerIteration(emb, iters = 6).count())
    graft.Cleanup.drain()
    emb.unpersist()

    // Embedding near-dup at the PRODUCTION threshold (0.9, per-bit
    // agreement 0.856): every even id has a planted near-dup at cos≈0.96
    // (neighbor + 0.3×noise); random 64-dim pairs concentrate near cos 0.
    // Brute force is n²/2 vector pairs (5×10¹¹ at n=1M — infeasible);
    // banded sign-bit LSH with ~log2(n)-bit bands keeps buckets O(1) so
    // candidates stay ~B·n. Recall measured against the planted ground
    // truth. This is the regime the wired test query (threshold 0.45, the
    // LSH floor) cannot show — see Similarity.cosineNearDupLsh scaladoc.
    val bitsPB = math.max(8, (math.log(n.toDouble) / math.log(2)).ceil.toInt)
    val emb2 = spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), i => {
        val base = (pmod(xxhash64(col("id") - pmod(col("id"), lit(2)), i), lit(2001L))
          .cast("double") - 1000.0) / 1000.0
        val noise = (pmod(xxhash64(col("id"), i, lit(7)), lit(2001L))
          .cast("double") - 1000.0) / 1000.0
        base + when(pmod(col("id"), lit(2)) === 1, noise * 0.3).otherwise(lit(0.0))
      }).as("embedding")).cache()
    emb2.count()
    var planted = -1L
    time(s"embedding_lsh_neardups_t0.9_b${bitsPB}x96")( {
      val pairs = graft.ops.Similarity.cosineNearDupLsh(emb2, 0.9, dim,
          bitsPerBand = bitsPB, bands = 96)
        .select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      planted = pairs.count { case (a, b) => b == a + 1 && a % 2 == 0 }
      pairs.length.toLong
    })
    if (planted >= 0) // printed iff the timed block actually ran
      println(f"SCALE embedding_lsh_recall: ${planted.toDouble / (n / 2)}%.3f")
    emb2.unpersist()

    // SemDeDup at the production threshold on planted twins. Pair volume
    // is Σ|cell|²·probes² ≈ n²/nlist·probes² — the probe size and nlist
    // are chosen to keep the expected cell ≈100 rows (the same guard rail
    // the operator's scaladoc prescribes: nlist scales WITH n, so the
    // per-cell work is constant and total work linear in n·cellSize).
    // Recall vs the planted ground truth (odd twin dropped, even kept).
    val nSem = n.min(200000L)
    val embS = spark.range(nSem).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), i => {
        val base = (pmod(xxhash64(col("id") - pmod(col("id"), lit(2)), i), lit(2001L))
          .cast("double") - 1000.0) / 1000.0
        val noise = (pmod(xxhash64(col("id"), i, lit(7)), lit(2001L))
          .cast("double") - 1000.0) / 1000.0
        base + when(pmod(col("id"), lit(2)) === 1, noise * 0.3).otherwise(lit(0.0))
      }).as("embedding")).cache()
    embS.count()
    var semDropsOdd = -1L
    time(s"semantic_dedup_t0.9_n$nSem")( {
      val drops = graft.ops.Similarity.semanticDedup(embS, 0.9,
          nlist = (nSem / 100).toInt, trainIters = 2, probes = 2)
        .filter(!col("keep")).select(col("vec_id")).collect().map(_.getLong(0))
      semDropsOdd = drops.count(_ % 2 == 1)
      drops.length.toLong
    })
    if (semDropsOdd >= 0)
      println(f"SCALE semantic_dedup_recall: ${semDropsOdd.toDouble / (nSem / 2)}%.3f")
    embS.unpersist()

    // Event-time ops at scale: ne synthetic events over 30 days, 10k users
    val ne = (n * 20).min(50000000L)
    val events = spark.range(ne).select(
      col("id").as("event_id"),
      timestamp_seconds(lit(1704067200L) + pmod(xxhash64(col("id")), lit(2592000L))).as("ts"),
      pmod(xxhash64(col("id"), lit(1)), lit(10000L)).as("user_id"),
      element_at(array(lit("click"), lit("view"), lit("purchase"), lit("error")),
        (pmod(xxhash64(col("id"), lit(2)), lit(4)) + 1).cast("int")).as("event_type"),
      (pmod(xxhash64(col("id"), lit(3)), lit(10000L)).cast("double") / 100.0).as("value"))
      .cache()
    events.count()
    time("events_tumbling_hourly")(Events.tumbling(events).count())
    time("events_sessions_30m")(Events.sessions(events).count())
    time("events_funnel")(Events.sessionFunnel(events).count())
    time("events_retention_7d")(Events.cohortRetention(events).count())
    time("events_anomaly_z2.5")(Events.anomalyZScores(events).count())
    time("events_asof_last_purchase")( {
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value").as("p_value"))
      Analytics.asOfJoin(events, purchases, "user_id", "p_user", "ts", "p_ts", "p_value")
        .agg(count(col("asof_val"))).collect()(0).getLong(0)
    })
    // OHLC bars over ne events: one aggregate, O(bars) output — the
    // probe pins that downsampling stays scan-bound at 20× doc volume
    time("events_ohlc_15m")(Events.ohlcBars(events).count())
    // Markov matrix at ne events: the lag window is user-partitioned
    // (10k keys → ~ne/10k rows per task), matrix aggs are |types|²
    time("events_transitions")(Events.transitionMatrix(events).count())
    // SCD2 compaction at ne events: raw-event windows and the run
    // aggregate all share the user_id partitioning (one exchange); the
    // interval-closing lead sees only the aggregated runs relation
    time("events_scd2_compact")(Events.scd2Compact(events).count())
    events.unpersist()

    // global ranking at n docs: the claim under test is that the two-phase
    // form ranks the full corpus with the heavy window key-partitioned
    // (text lengths collide heavily — ~hundreds of docs per key at n=1M)
    val ranked = spark.range(n).select(col("id").as("doc_id"),
      (pmod(xxhash64(col("id")), lit(4000L)) + 100L).as("n_chars"))
    time("docs_global_rank")(
      Analytics.globalRank(ranked, "n_chars", "doc_id").count())
    // two-phase prefix sum over the same corpus-scale total order — the
    // budget-selection primitive
    time("docs_global_cumsum")(
      Analytics.globalCumsum(ranked, "n_chars", "doc_id", "n_chars").count())
    // priority sampling at n docs, k=1000: the claim is TakeOrdered —
    // per-partition (k+1)-row heaps, a parts·(k+1)-row driver merge, no
    // corpus shuffle and no window anywhere in the plan
    time("priority_sample_1k")(
      graft.ops.TextAnalysis.prioritySample(
        ranked.withColumn("text", concat(lit("doc "), col("doc_id"))),
        "doc_id", "n_chars", "text", 1000).count())
    graft.Cleanup.drain() // the k+1-row sample checkpoint
    // z-order key: flat 28-term bit expression, scan-speed by design
    time("orders_zorder_key")(
      ranked.select(Analytics.zorderKey(
        pmod(col("doc_id"), lit(16384L)), col("n_chars"), 14).as("z"))
        .agg(count(col("z"))).collect()(0).getLong(0))

    // snapshot diff at n docs: sides reduce to (id, 8-byte hash) before
    // the full-outer join — the exchanges never carry text
    val snapA = spark.range(n).filter(pmod(col("id"), lit(19L)) =!= 3)
      .select(col("id"), xxhash64(col("id")).as("fp"))
    val snapB = spark.range(n).filter(pmod(col("id"), lit(23L)) =!= 5)
      .select(col("id"), xxhash64(col("id"),
        when(pmod(col("id"), lit(17L)) === 2, lit(1)).otherwise(lit(0))).as("fp"))
    time("docs_snapshot_diff")(
      Analytics.snapshotDiff(snapA, snapB, "id", "fp").count())

    // BPE encode at n docs: corpus-scale work is one word aggregation
    // (the distinct-vocab cache build), one word equi-join and one
    // doc-grain collect_list reassembly; the merge kernel runs once per
    // DISTINCT word. This corpus is the adversarial vocab shape: the
    // "extraword<id>" suffix tokens make the vocab O(n) — the encoded
    // vocab cannot broadcast, the word join must shuffle — while the
    // 80-token bodies draw from a 5k vocab, so the cache still amortizes
    // ~80:1. Digit-chain merges fire on every word (wNNNN), so the
    // kernel does real merge work, not skip-map exits.
    val probeMerges =
      "0123456789".sliding(2).map(p => (p(0).toString, p(1).toString)).toSeq ++
        Seq(("w", "01"), ("e", "x"), ("ex", "t"))
    time("bpe_encode")(
      graft.ops.TextAnalysis.bpeEncode(docs, "doc_id", "text", probeMerges)
        .agg(sum(col("n_tokens"))).collect()(0).getLong(0))

    // unigram-LM tokenizer at n docs (round 13): train = ONE corpus
    // word census + 3 hard-EM rounds over the distinct vocab (Viterbi
    // kernel per distinct word, inventory-grain driver state) — the
    // same adversarial O(n)-vocab regime as bpe_encode ("extraword<id>"
    // keeps every round's kernel input ~505k words); encode = one more
    // kernel pass + the doc-grain word join
    var uniM: graft.ops.TextAnalysis.UnigramModel = null
    var uniTrainAttempted = false
    time("unigram_train_3r")( {
      uniTrainAttempted = true
      uniM = graft.ops.TextAnalysis.unigramTrain(docs, "text",
        vocabK = 200, pieceLen = 4, rounds = 3)
      Cleanup.drain(); uniM.pieces.length.toLong
    })
    // tag-filtered runs that skip the train probe still need the model —
    // train OUTSIDE the encode timing window or the reported encode
    // seconds silently include the ~13 s train (round-13 review finding).
    // Skip the rebuild when the train probe already ATTEMPTED and failed
    // (round-13 advice): retraining the identical model would most
    // likely re-fail, doubling the time spent on a broken family before
    // the encode probe reports FAILED
    if (uniM == null && !uniTrainAttempted && want("unigram_encode")) {
      try {
        uniM = graft.ops.TextAnalysis.unigramTrain(docs, "text",
          vocabK = 200, pieceLen = 4, rounds = 3)
        Cleanup.drain()
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"SCALE unigram_encode: model build FAILED ${e.getMessage}")
      }
    }
    time("unigram_encode")( {
      require(uniM != null, "unigram model unavailable (train failed above)")
      val r = graft.ops.TextAnalysis.unigramEncode(docs, "doc_id", "text", uniM)
        .agg(sum(col("n_tokens"))).first().getLong(0)
      Cleanup.drain(); r
    })
    // edit-distance join over an n-value vocabulary ("v" + id): dense
    // numeric suffixes are the adversarial shape — every value has ~50
    // single-digit-substitution neighbors, so the verified pair count is
    // O(50·n) REAL output, not an empty pass. Variant generation is
    // ×(len+1) = ~9n rows; every variant bucket stays alphabet-bounded.
    time("edit_neighbors_k1")(
      graft.ops.TextAnalysis.editNeighbors(
        spark.range(n).select(concat(lit("v"), col("id")).as("w")), "w", 1).count())
    // gram novelty at n docs: even/odd twins make half the corpus owe
    // its grams to the other half — n_novel sums ~half the gram mass;
    // four hash exchanges, the combine join exchange-free
    time("gram_novelty")(
      graft.ops.TextAnalysis.gramNovelty(docs, "doc_id", "text", 3, hashGrams = true)
        .agg(sum(col("n_novel"))).collect()(0).getLong(0))
    // mix allocation at n docs over 40 synthetic sources: corpus-scale
    // work is the one-token census; the waterfill windows see 40 rows
    time("mix_allocate")(
      graft.ops.TextAnalysis.mixAllocate(
        docs.withColumn("source",
          concat(lit("s"), pmod(xxhash64(col("doc_id")), lit(40L)))),
        "source", "text", budgetEpochs = 1.45, alpha = 0.5, maxEpochs = 1.6)
        .count())
    // model-based curation at n docs. Training: featurize+checkpoint once,
    // then iters shuffle-free codegen scans (dim+1 decimal sums each) — the
    // probe runs 8 rounds; the wired 64-round default is linear in iters
    // (per-round slope = this figure / 8). Teacher = the planted odd-doc
    // marker, a content rule the hashed features can express.
    time("classifier_train_8r")( {
      val (w, _) = graft.ops.TextAnalysis.classifierTrainVector(
        docs, "text", col("text").contains("extraword"), dim = 32, iters = 8)
      Cleanup.drain(); w.length.toLong
    })
    // apply path: the margin is a scan-speed literal fold — no join, no
    // shuffle beyond the count's own aggregate
    time("classifier_score")( {
      val w = Array.tabulate(32)(i => (i + 1) / 64.0)
      docs.select(graft.ops.TextAnalysis.classifierScore(
          col("text"), w, -0.5, 32).as("s"))
        .filter(col("s") > 0).count()
    })
    // DSIR: one bucket census (checkpointed at 32 rows) + a broadcast
    // lift fold + TakeOrderedAndProject top-1k — no corpus shuffle
    time("dsir_lift_select_1k")( {
      val r = graft.ops.TextAnalysis.dsirSelect(docs, "doc_id", "text",
        col("text").contains("extraword"), dim = 32, k = 1000).count()
      Cleanup.drain(); r
    })
    // leakage-safe split end-to-end: LSH pairs → star-contraction
    // clusters → one id-grain join + hash projection (the split stage
    // itself is the cheap tail; the figure is dominated by the pair/
    // cluster build it composes with)
    time("leakage_safe_split")( {
      val pairs = graft.ops.Dedup.minHashNearDups(docs, "doc_id", "text", 3, 16, 4, 0.5)
        .select(col("id_a"), col("id_b"))
      val clusters = graft.ops.Dedup.duplicateClusters(
        pairs, docs.select(col("doc_id").as("id")), "id")
      val r = graft.ops.TextAnalysis.leakageSafeSplit(docs, clusters, "doc_id")
        .groupBy(col("split")).count().count()
      Cleanup.drain(); r
    })

    // ---- round-11 ops at n docs/vectors ----
    // winnowing: the selection is one shuffle-free projection (the claim:
    // scan speed), the match join's candidate budget is Σ df² over the
    // df-capped SPARSE index (~2/(w+1) of the gram relation)
    time("winnow_fingerprints")(
      graft.ops.Dedup.winnowFingerprints(docs, "doc_id", "text", 3, 4).count())
    time("winnow_matches")( {
      val r = graft.ops.Dedup.winnowMatches(docs, "doc_id", "text", 3, 4,
        minShared = 2, maxDf = 20).count()
      Cleanup.drain(); r
    })
    // quantile normalization: one per-source window + the two-phase pooled
    // rank + one index equi-join — the claim is rank-pipeline cost, no
    // corpus-squared anything
    time("qnorm_50src")( {
      val src = docs.select(col("doc_id"),
        pmod(xxhash64(col("doc_id"), lit(7)), lit(50L)).as("source"),
        length(col("text")).as("v"))
      graft.ops.Analytics.quantileNormalize(src, "source", "doc_id", "v").count()
    })
    // histogram sketch: the census key domain is 64 bins, so the build is
    // one map-side-collapsed aggregate; quantile reads are artifact-sized
    time("hist_build_quantiles")( {
      val sk = graft.ops.Analytics.histBuild(
        docs.select(length(col("text")).as("v")), "v", 0L, 4096L, 64)
      graft.ops.Analytics.histQuantiles(sk, Seq(500, 900, 990)).count()
    })
    // SQ8 at n vectors: training-free encode is one projection; the
    // 20-query search scans int8 codes at 1/4 the float footprint
    val embQ = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        ((pmod(xxhash64(col("id"), i), lit(2000L)).cast("double") / 1000.0)
          - 1.0).cast("float")).as("embedding")).cache()
    embQ.count()
    time("sq8_encode")(graft.ops.Similarity.sq8Encode(embQ).count())
    time("sq8_topk_20q")(
      graft.ops.Similarity.sq8TopK(embQ, embQ.filter(col("vec_id") < 20), 10).count())
    // binary-quantization search at n vectors (round 15 — the one flagged
    // per-pair fold site with no op-level 1M line): 20-query exhaustive
    // Hamming over 1/32-footprint sign chunks, then the +refine rerank
    time("hamming_topk_20q")(
      graft.ops.Similarity.hammingTopK(embQ, embQ.filter(col("vec_id") < 20),
        10, dim = 64).count())
    time("hamming_refined_20q")(
      graft.ops.Similarity.hammingTopKRefined(embQ,
        embQ.filter(col("vec_id") < 20), 10, dim = 64).count())
    // round-16 op-grain probe (VERDICT item 2): cosineNearDupLsh END TO
    // END at n originals + n/2 quantize-roundtrip twins, production
    // threshold 0.9 (the dedup_embedding_cosine_t90 shape — the committed
    // 0.45-floor query's candidate volume is structurally ~all-pairs and
    // CANNOT run at 1M). Plan read (§18.2 trap class): norm/banding at
    // row grain; the one pair-grain re-evaluation is the pushed-down
    // threshold filter's vecdot in the SMJ condition + the survivor
    // projection's — SURVIVOR-bounded, not candidate-bounded.
    //
    // THE PROBE'S REAL FIND: bitsPerBand is a log₂(corpus) parameter, not
    // a constant. The sf-scale queries' 16-bit bands give 2^16 buckets —
    // at 1.5M vectors pigeonhole forces ≥23 collisions per (band,
    // bucket), ≈130M candidate pairs each carrying two 64-double payloads
    // through the verify join: the first probe run OOM'd exactly there.
    // 24-bit bands (2^24 ≫ 1.5M) cut expected random collisions to
    // ~2^-24·pairs·bands ≈ 0.5M while twin recall stays ~1 (twin angle
    // ≈0.8° ⇒ P(all 8 bands miss) ≈ 1e-8). The 100 TB rule recorded in
    // DESIGN §18: pick bitsPerBand ≥ log₂(n) + margin, or set
    // maxBucketSize as the backstop.
    time("cosine_lsh_t90_op")( {
      val orig = embQ.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val twins = embQ.filter(col("vec_id") < n / 2)
        .select(col("vec_id"), graft.ops.Similarity.quantizeInt8(col("embedding")).as("qz"))
        .select((col("vec_id") + lit(10000000L)).as("vec_id"),
          graft.ops.Similarity.dequantizeInt8(col("qz")).as("embedding"))
      val corpus = orig.union(twins).localCheckpoint(false)
      try {
        val got = graft.ops.Similarity.cosineNearDupLsh(corpus, 0.9, dim = 64,
          bitsPerBand = 24, bands = 8).count()
        require(got >= n / 2, s"planted twins missed: $got < ${n / 2}")
        got
      } finally corpus.unpersist()
    })
    embQ.unpersist()
    // EWMA over the ne-event stream (events relation above): one
    // user-keyed aggregate, per-user fold ~ne/10k elements
    time("events_ewma")(Events.ewmaByUser(events).count())
    // exact grouped percentiles at n rows / 5 groups — the n/5-values-
    // per-group case where the built-in percentile()'s aggregation
    // buffer is the structural problem (round-12); the claim is
    // census cost: one lattice census scan + one answering-bucket
    // per-value census, no buffer anywhere growing with group size
    time("percentile_exact_5grp")( {
      val vals = docs.select(
        pmod(col("doc_id"), lit(5L)).cast("string").as("grp"),
        (length(col("text")) + pmod(xxhash64(col("doc_id"), lit(11)), lit(1000L)))
          .cast("double").as("v"))
      Analytics.percentileExact(vals, "grp", "v",
        Seq(0.5, 0.9, 0.99), lo = 0L, hi = 4096L, bins = 1024, scale = 1L).count()
    })
    // ---- round-13 probes: the sweep-dominant text queries at corpus
    // scale (round-12 verdict task 4 — the round-12 design flaws were
    // invisible at sf0.1 and obvious at 1M, and these queries dominate
    // the bench sweep without 1M coverage; word lift already has
    // word_lift_top40 above) ----
    // normalize isolated: a 5-regex codegen projection — the claim is
    // pure scan speed with zero exchanges (the round-12 driver capture
    // read 15× committed on a byte-identical plan; this pins the
    // data-scale slope so such swings are attributable to the box, not
    // the op). sum(length) forces the regex chain — count() would let
    // Catalyst prune the projection entirely.
    time("text_normalize")(
      docs.select(graft.ops.TextAnalysis.normalize(col("text")).as("norm"))
        .agg(sum(length(col("norm")))).first().getLong(0))
    // fertility census at n docs / 3 langs under the probe merge table:
    // the corpus-scale cost is bpeEncode (one word-vocab aggregation +
    // kernel per DISTINCT word + doc reassembly — the bpe_encode probe's
    // own shape, adversarial here because extraword<id> makes the vocab
    // O(n)); the census on top is |langs| grain, so the claim is
    // "fertility ≈ encode + one scan"
    time("vocab_fertility_3lang")( {
      val enc = graft.ops.TextAnalysis.bpeEncode(docs, "doc_id", "text", probeMerges)
        .select(col("doc_id"), col("n_tokens"),
          aggregate(col("enc_tokens"), lit(0L),
            (acc, p) => acc + length(p).cast("long")).as("nc"))
      val words = docsL7.select(col("doc_id"), col("lang"),
        size(graft.ops.TextAnalysis.tokens(col("text"))).as("nw"))
      words.join(enc, "doc_id")
        .groupBy(col("lang"))
        .agg(sum(col("n_tokens").cast("long")).as("n_pieces"),
          sum(col("nw").cast("long")).as("n_words"), sum(col("nc")).as("n_chars"))
        // force the piece-length census: count() of the 3-group aggregate
        // lets Catalyst prune the sums and with them the whole encode leg
        // (measured 1.8 s for a "1M-doc encode" — a pruning artifact)
        .agg(sum(col("n_pieces") + col("n_chars"))).first().getLong(0)
    })
    // winnowing Build/With seam at 500k reference vs 500k crawl (the
    // text_winnowing_cross shape): the reference index is the sparse
    // ~2/(w+1) fingerprint selection, df-capped reference-side — the
    // claim is the probe join's candidate volume is bounded by
    // Σ df·(batch hits) with every twin pair crossing the split
    time("winnow_cross_500k")( {
      val idx = graft.ops.Dedup.winnowBuild(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text",
        n = 3, window = 4, maxDf = 20)
      val r = graft.ops.Dedup.winnowFlagsWith(
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), idx,
        "doc_id", "text", minShared = 2).count()
      Cleanup.drain(); r
    })
    // single-corpus containment pairs at n docs (the dedup_containment
    // shape; the cross seam and hot-gram cap are probed above): planted
    // twins share ~all grams and every non-twin gram is unique, so the
    // df-capped gram join must stay linear with candidates ≈ twin pairs
    time("containment_pairs")( {
      val r = graft.ops.Dedup.containmentPairs(docs, "doc_id", "text", 3,
        threshold = 0.6, maxDf = 100).count()
      // the op registers its capped-gram localCheckpoint (~78M rows at
      // 1M docs) — drain it here like every sibling probe, or it stays
      // resident through the format-matrix probes below
      Cleanup.drain(); r
    })

    // source-format matrix at n docs: mirror write is the one-time
    // conversion cost (4 full rewrites of the corpus — ORC, Avro,
    // JSON-lines, CSV), the re-read census is the recurring cost —
    // timed separately so neither masquerades as the other; all four
    // mirror readers split by file offset, so the census scans run at
    // full parallelism
    val fmtDocs = docs.select(col("doc_id"), col("text"),
      element_at(array(lit("en"), lit("fr"), lit("es")),
        (pmod(xxhash64(col("doc_id"), lit(3)), lit(3L)) + 1).cast("int")).as("lang"),
      concat(lit("s"), pmod(col("doc_id"), lit(20L))).as("source"),
      length(col("text")).cast("long").as("n_chars"))
    val fmtRoot = java.nio.file.Files
      .createTempDirectory("graft-probe-fmt").toFile.getAbsolutePath
    time("format_mirror_write_4x")( {
      fmtDocs.write.mode("overwrite").orc(s"$fmtRoot/orc")
      fmtDocs.write.mode("overwrite")
        .format(graft.sources.FormatMatrix.AvroSource).save(s"$fmtRoot/avro")
      fmtDocs.write.mode("overwrite").json(s"$fmtRoot/json")
      fmtDocs.write.mode("overwrite")
        .option("header", "true").option("quoteAll", "true").option("escape", "\"")
        .csv(s"$fmtRoot/csv")
      4L * n
    })
    time("format_census_read_4x")( {
      import graft.sources.FormatMatrix.{docsSchema, AvroSource}
      Seq(
        spark.read.schema(docsSchema).orc(s"$fmtRoot/orc"),
        spark.read.schema(docsSchema).format(AvroSource).load(s"$fmtRoot/avro"),
        spark.read.schema(docsSchema).option("mode", "FAILFAST").json(s"$fmtRoot/json"),
        spark.read.schema(docsSchema).option("header", "true")
          .option("escape", "\"").option("mode", "FAILFAST").csv(s"$fmtRoot/csv"))
        .map(_.agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))
          .head().getLong(0)).sum
    })
    // the probe's format mirrors are 4 full corpus rewrites — delete them
    // eagerly (FormatMatrix's own mirrors get a shutdown hook; this path
    // is linear, so repeated probe runs must not accrete GBs in /tmp)
    locally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(fmtRoot))
    }

    // ---- round-15 fold A/B probes: CodegenFallback HOF vs native kernel,
    // per DESIGN §17.1 site, on MATERIALIZED inputs (the HOFs that
    // synthesize the arrays are localCheckpoint'ed away so the timed
    // projection isolates the fold). Per-PAIR sites run the production
    // shape — 20 broadcast queries × n corpus rows = 20n fold rows through
    // the same join both ways, so the delta attributes to the fold alone;
    // per-ROW sites scan n rows. Receipts land in DESIGN §18.
    locally {
      import graft.functions.VectorFunctions._
      val dim = 64
      val matBase = spark.range(n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          ((pmod(xxhash64(col("id"), i), lit(2001L)).cast("double") - 1000.0) / 997.0)
            .cast("float")).as("embedding"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          (pmod(xxhash64(col("id"), i, lit(5)), lit(255L)) - 127L)).as("codes"),
        transform(sequence(lit(0), lit(1)), i =>
          xxhash64(col("id"), i, lit(11))).as("chunks"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          (pmod(xxhash64(col("id"), i, lit(7)), lit(2001L)).cast("double") - 1000.0) / 991.0)
          .as("recon")).localCheckpoint() // EAGER: the first timed probe must
      // not pay array synthesis + checkpoint write (round-15 review)
      val qs = broadcast(matBase.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("codes").as("qc"), col("chunks").as("qh")))
      val pairs = matBase.join(qs, col("vec_id") =!= col("qid"))
      def forceSum(c: org.apache.spark.sql.Column): Long = {
        pairs.agg(sum(c)).head(); 20L * n - 20L // minus the 20 self-pairs
      }
      def forceRowSum(df: org.apache.spark.sql.DataFrame,
                      c: org.apache.spark.sql.Column): Long = {
        df.agg(sum(c)).head(); n
      }
      // per-pair: Hamming popcount fold (hammingTopK's hot expression)
      time("fold_hamming_hof")(forceSum(
        aggregate(zip_with(col("chunks"), col("qh"),
          (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
          lit(0L), (s, x) => s + x)))
      time("fold_hamming_kernel")(forceSum(vecXorPopcount(col("chunks"), col("qh"))))
      // per-pair: SQ8 integer dot (sq8TopK)
      time("fold_sq8dot_hof")(forceSum(
        aggregate(zip_with(col("qc"), col("codes"), (a, b) => a * b),
          lit(0L), (s, x) => s + x)))
      time("fold_sq8dot_kernel")(forceSum(vecDotLong(col("qc"), col("codes"))))
      // per-pair: MinHash lane agreement (minHashEstimatedPairs) — 64-lane
      // shape approximated by the codes arrays (same element count/type)
      time("fold_eqcount_hof")(forceSum(
        aggregate(zip_with(col("qc"), col("codes"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (s, x) => s + x)))
      time("fold_eqcount_kernel")(forceSum(vecEqCount(col("qc"), col("codes"))))
      // per-pair: fused ADC score (ivfPqQuery)
      time("fold_adc_hof")(forceSum(
        vecDot(col("qv"), zip_with(col("recon"), col("recon"), (a, b) => a + b))))
      time("fold_adc_kernel")(forceSum(vecDotPlus(col("qv"), col("recon"), col("recon"))))
      // per-row: PQ distortion L2 (pqDistortion / ivfPqDistortion / kCenter)
      time("fold_l2sq_hof")(forceRowSum(matBase,
        aggregate(zip_with(col("embedding"), col("recon"),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (s, x) => s + x)))
      time("fold_l2sq_kernel")(forceRowSum(matBase,
        vecL2Sq(col("embedding"), col("recon"))))
      // per-row: power-iteration literal dot (the per-round scan expression)
      val vl = array((0 until dim).map(i => lit(math.sin(i + 1) / 8.0)): _*)
      time("fold_dotlit_hof")(forceRowSum(matBase,
        aggregate(zip_with(col("recon"), vl, (x, b) => x * b),
          lit(0.0), (s, x) => s + x)))
      time("fold_dotlit_kernel")(forceRowSum(matBase, vecDot(col("recon"), vl)))
      // per-row: residual norm² (removeDominantComponent's after-norm)
      val comp = (0 until dim).map(i => math.cos(i + 1) / 8.0)
      val dcol = vecDot(col("recon"), array(comp.map(lit): _*))
      val wres = zip_with(col("recon"), array(comp.map(lit): _*),
        (x, b) => x - dcol * b)
      time("fold_residnorm_hof")(forceRowSum(matBase,
        aggregate(zip_with(wres, wres, (x, y) => x * y), lit(0.0), (s, x) => s + x)))
      time("fold_residnorm_kernel")(forceRowSum(matBase,
        vecResidL2Sq(col("recon"), dcol, comp)))
      // per-row: DSIR apply fold (dsirWeightWith, dim = 32 features)
      val feats = transform(sequence(lit(0), lit(31)), i =>
        (pmod(xxhash64(col("vec_id"), i, lit(19)), lit(64L)).cast("double")) / 2.0)
      val lv = array((0 until 32).map(i => lit(1.0 + i / 32.0)): _*)
      val matF = matBase.select(col("vec_id"), feats.as("f")).localCheckpoint() // eager
      time("fold_dotscaled_hof")(forceRowSum(matF,
        aggregate(zip_with(col("f"), lv, (x, l) => (x / lit(32.0)) * l),
          lit(0.0), (s, x) => s + x)))
      time("fold_dotscaled_kernel")(forceRowSum(matF,
        vecDotScaled(col("f"), lv, 32.0)))
      matF.unpersist(); matBase.unpersist()
    }

    // ---- round-16 sorted-fold A/B: the agg-grain family §18.1 didn't
    // cover — aggregate(array_sort(collect_list(x)), 0.0, +) evaluated
    // once per GROUP after the aggregation (simjoin per-pair dot/norms at
    // candidate-pair grain; meanPool / kmeans cell means). Inputs are the
    // ALREADY-COLLECTED arrays, materialized once, so the timed projection
    // isolates the sort+fold exactly like the §18.1 probes (the
    // groupBy+collect_list cost is common to both forms and excluded).
    // n array rows × 24 elements ≈ the simjoin pair-grain shape.
    locally {
      import graft.functions.VectorFunctions._
      val arrs = spark.range(n).select(
        col("id"),
        transform(sequence(lit(0), lit(23)), i =>
          (pmod(xxhash64(col("id"), i, lit(23)), lit(4001L)).cast("double") - 2000.0) / 997.0)
          .as("arr")).localCheckpoint() // eager
      def forceRowSum(c: org.apache.spark.sql.Column): Long = {
        arrs.agg(sum(c)).head(); n
      }
      time("fold_sortedsum_hof")(forceRowSum(
        aggregate(array_sort(col("arr")), lit(0.0), (s, x) => s + x)))
      time("fold_sortedsum_kernel")(forceRowSum(vecSortedSum(col("arr"))))
      // end-to-end agg shape (groupBy + collect_list INCLUDED both ways):
      // how much of the full simjoin-style aggregation the fold is
      val kv = spark.range(20L * n).select(
        (col("id") % n).as("grp"),
        ((pmod(xxhash64(col("id"), lit(29)), lit(4001L)).cast("double") - 2000.0) / 997.0)
          .as("x")).localCheckpoint() // eager
      time("aggfold_sortedsum_hof")( {
        kv.groupBy(col("grp"))
          // buffer-bound: 20 synthetic values per probe group (id % n)
          .agg(aggregate(array_sort(collect_list(col("x"))), lit(0.0),
            (s, x) => s + x).as("s"))
          .agg(sum(col("s"))).head(); n
      })
      time("aggfold_sortedsum_kernel")( {
        kv.groupBy(col("grp"))
          // buffer-bound: 20 synthetic values per probe group (id % n)
          .agg(vecSortedSum(collect_list(col("x"))).as("s"))
          .agg(sum(col("s"))).head(); n
      })
      kv.unpersist(); arrs.unpersist()
    }
    spark.stop()
  }
}
