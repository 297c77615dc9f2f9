package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("native VecDot equals the HOF formulation bit-for-bit") {
    val hof = aggregate(
      zip_with($"embedding", $"embedding", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, x) => s + x)
    val rows = emb.limit(50)
      .select(Similarity.dot($"embedding", $"embedding").as("native"), hof.as("hof"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, h) => assert(n == h) } // exact, not approx
  }

  test("meanPool: per-group per-dimension means, partition-order independent") {
    val df = Seq(
      (0L, Array(1.0f, 2.0f)),
      (0L, Array(3.0f, 6.0f)),
      (1L, Array(10.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val got = Similarity.meanPool(df, col("vec_id"), "embedding")
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(got == Seq((0L, 0L, 2.0), (0L, 1L, 4.0), (1L, 0L, 10.0), (1L, 1L, 0.0)))
    // sorted-fold determinism: identical output through a reshuffle
    val a = Similarity.meanPool(emb, pmod($"vec_id", lit(8L)))
      .as[(Long, Long, Double)].collect().sorted.toSeq
    val b = Similarity.meanPool(emb.repartition(13), pmod($"vec_id", lit(8L)))
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(a == b)
    assert(a.size == 8 * 64) // 8 buckets × 64 dims
  }

  test("IVF build-once/query-many equals the one-shot path per batch") {
    val index = Similarity.ivfBuild(emb, nlist = 20)
    val batch1 = emb.filter($"vec_id" < 10)
    val batch2 = emb.filter($"vec_id" >= 10 && $"vec_id" < 20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cosine_r")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(rows(Similarity.ivfQuery(index, batch1, 5, nprobe = 4)) ==
      rows(Similarity.ivfTopK(emb, batch1, 5, nlist = 20, nprobe = 4)))
    assert(rows(Similarity.ivfQuery(index, batch2, 5, nprobe = 4)) ==
      rows(Similarity.ivfTopK(emb, batch2, 5, nlist = 20, nprobe = 4)))
  }

  test("ivfAppend: two appended crawl batches == one-shot assignment of the union") {
    // the between-rebuilds regime: the quantizer is FROZEN (trained on
    // the old half), fresh batches join via assignment only — queries
    // over the appended index must be identical to assigning the whole
    // union through the same centroids in one shot
    val old = emb.filter($"vec_id" % 2 === 0)
    val base = Similarity.ivfBuild(old, nlist = 20)
    val appended = Similarity.ivfAppend(
      Similarity.ivfAppend(base, emb.filter($"vec_id" % 2 === 1 && $"vec_id" < 30)),
      emb.filter($"vec_id" % 2 === 1 && $"vec_id" >= 30))
    val oneShot = base.copy(bucketed =
      Similarity.assignTo(emb, base.ids, base.mat))
    val queries = emb.filter($"vec_id" < 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cosine_r")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(rows(Similarity.ivfQuery(appended, queries, 5, nprobe = 4)) ==
      rows(Similarity.ivfQuery(oneShot, queries, 5, nprobe = 4)),
      "appended index diverges from one-shot assignment")
    // existing rows' buckets are untouched by an append
    val before = base.bucketed.as[(Long, Seq[Double], Long)].collect()
      .map(r => r._1 -> r._3).toMap
    val after = appended.bucketed.filter($"vec_id" % 2 === 0)
      .as[(Long, Seq[Double], Long)].collect().map(r => r._1 -> r._3).toMap
    assert(before == after, "append must not move existing assignments")
  }

  test("IVF index persists to bucket-partitioned parquet and reloads intact") {
    // the artifact claim made concrete: bucketed corpus → parquet
    // partitioned by bucket (so a probe of nprobe buckets prunes to
    // nprobe directories at scan time), centroids alongside; the reloaded
    // index answers identically to the in-memory one
    val index = Similarity.ivfBuild(emb, nlist = 20)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toFile.getAbsolutePath
    index.bucketed.write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/corpus")
    index.mat.zip(index.ids).map { case (v, id) => (id, v) }
      .toDF("centroid_id", "centroid")
      .write.mode("overwrite").parquet(s"$dir/centroids")
    val centsBack = spark.read.parquet(s"$dir/centroids")
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val reloaded = Similarity.IvfIndex(
      spark.read.parquet(s"$dir/corpus"),
      centsBack.map(_._1).toSeq, centsBack.map(_._2).toSeq,
      "vec_id", "embedding")
    val queries = emb.filter($"vec_id" < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(rows(Similarity.ivfQuery(reloaded, queries, 5, nprobe = 4)) ==
      rows(Similarity.ivfQuery(index, queries, 5, nprobe = 4)))
    // partition pruning: probing must not scan every bucket directory
    val p = Similarity.ivfQuery(reloaded, queries, 5, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(bucket"),
      s"bucket probe did not reach the partitioned scan:\n$p")
  }

  test("cosine of a vector with itself is 1") {
    val c = emb.limit(10)
      .select(round(Similarity.cosine($"embedding", $"embedding"), 9))
      .as[Double].collect()
    c.foreach(v => assert(v == 1.0))
  }

  test("brute-force top-k: ranks are 1..k, neighbors exclude self, ordered") {
    val topk = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 3), 5)
    val rows = topk.select("query_id", "rank", "neighbor_id", "cosine_r")
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.length == 15)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      assert(!rs.exists(_._3 == q)) // no self-match
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF top-k recall vs brute force is usable (nprobe trades recall)") {
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, 10, nlist = 20, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall $recall collapsed — bucketing broken")
    assert(ivf.size == brute.size) // still returns full k per query
  }

  test("ivfRecallCensus: counts the deployed probe's hits against the exact leg") {
    val queries = emb.filter($"vec_id" < 10)
    // n_hit agrees with an independently-computed intersection of the two
    // legs the census claims to compare (same params, both deterministic)
    val census = Similarity.ivfRecallCensus(emb, queries, 10,
        nlist = 20, nprobe = 4)
      .as[(Long, Long)].collect().toMap
    val brute = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, 10, nlist = 20, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val expected = (brute intersect ivf).groupBy(_._1).map { case (q, s) => q -> s.size.toLong }
    assert(census.keySet == queries.select("vec_id").as[Long].collect().toSet,
      "census must emit one row per query, including zero-hit ones")
    census.foreach { case (q, n) =>
      assert(n >= 0L && n <= 10L)
      assert(n == expected.getOrElse(q, 0L), s"query $q: census $n != recount")
    }
    // probing every bucket IS brute force: recall must be exactly k
    val full = Similarity.ivfRecallCensus(emb, queries, 10,
        nlist = 20, nprobe = 20)
      .as[(Long, Long)].collect()
    full.foreach { case (q, n) => assert(n == 10L, s"full probe missed hits at $q") }
  }

  test("hammingTopK: exact twins at distance 0 rank first; distances are monotone ints") {
    // corpus = originals ∪ byte-identical twins (id + 10M): each query's
    // top-1 must be its own twin at hamming 0 — sign bits of identical
    // floats are identical, and no other vector is bit-equal here
    val twins = emb.select(($"vec_id" + 10000000L).as("vec_id"), $"embedding")
    val corpus = emb.select($"vec_id", $"embedding").unionByName(twins)
    val got = Similarity.hammingTopK(corpus, emb.filter($"vec_id" < 10), 5, dim = 64)
      .as[(Long, Int, Long, Long)].collect()
    got.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.head._3 == q + 10000000L && byRank.head._4 == 0L,
        s"query $q top-1 is not its twin: ${byRank.head}")
      val ds = byRank.map(_._4)
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
      ds.foreach(d => assert(d >= 0L && d <= 64L))
    }
    // chunk values stay within 32 unsigned bits (no sign-bit hazard)
    val chunks = emb.select(explode(Similarity.binarizeSign($"embedding", 64)))
      .as[Long].collect()
    chunks.foreach(c => assert(c >= 0L && c < (1L << 32)))
    // sign-bit hamming tracks angular distance: recall vs cosine top-10 is
    // far above random (10/500)
    val queries = emb.filter($"vec_id" < 10)
    val cosTop = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val hamTop = Similarity.hammingTopK(emb, queries, 10, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (cosTop intersect hamTop).size.toDouble / cosTop.size
    assert(recall >= 0.2, s"hamming recall $recall vs cosine collapsed (random ≈ 0.02)")
  }

  test("hammingTopKRefined: exact rerank — a full candidate pool reproduces dotTopK exactly") {
    val queries = emb.filter($"vec_id" < 10)
    // refineMult large enough that the Hamming cut retains the whole
    // corpus: the refine stage must then BE the exact MIPS ranking
    val refined = Similarity.hammingTopKRefined(emb, queries, 10, dim = 64, refineMult = 50)
      .select($"query_id", $"rnk", $"neighbor_id", $"dot_r")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val exact = Similarity.dotTopK(emb, queries, 10)
      .select($"query_id", $"rank", $"neighbor_id", $"dot_r")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(refined == exact)
    // a production-sized pool: still k rows per query, recall >= the
    // unrefined hamming ordering's (the refine never loses candidates)
    val narrow = Similarity.hammingTopKRefined(emb, queries, 10, dim = 64, refineMult = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(narrow.length == 100)
    val exactSet = exact.map(r => (r._1, r._3)).toSet
    val hamSet = Similarity.hammingTopK(emb, queries, 10, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val refSet = narrow.toSet
    val rHam = (hamSet intersect exactSet).size.toDouble / exactSet.size
    val rRef = (refSet intersect exactSet).size.toDouble / exactSet.size
    assert(rRef >= rHam, s"refine lost recall: hamming=$rHam refined=$rRef")
  }

  test("cosineNearDupPairs is symmetric-free (a<b) and thresholded") {
    val pairs = Similarity.cosineNearDupPairs(emb, 0.4)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, c) => assert(a < b); assert(c >= 0.4) }
  }

  test("signBits buckets angularly-close vectors together more than random") {
    val withBits = emb.select($"vec_id", Similarity.signBits($"embedding", 8, 64).as("bits"))
    val n = withBits.select("bits").distinct().count()
    assert(n > 1 && n <= 256) // 8 bits → ≤256 buckets, actually splits data
  }

  test("centroid set size is capped at nlist regardless of corpus size") {
    val slim = emb.select($"vec_id", $"embedding")
    assert(Similarity.centroids(slim, 20).count() == 20)
    assert(Similarity.centroids(
      slim.union(slim.select(($"vec_id" + 10000).as("vec_id"), $"embedding")), 20)
      .count() == 20) // 2× the corpus, same nlist
  }

  test("int8 quantization: error bounded by scale/2, cosine fidelity, top-k recall") {
    val q = emb
      .withColumn("qz", Similarity.quantizeInt8($"embedding"))
      .withColumn("deq", Similarity.dequantizeInt8($"qz"))
    val rows = q.select(
      $"qz.scale".cast("double"),
      array_max(zip_with($"deq", $"embedding", (a, b) => abs(a - b.cast("double")))),
      Similarity.cosine($"deq", $"embedding"))
      .as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (scale, err, cos) =>
      assert(err <= scale / 2 + 1e-12, s"per-component error $err exceeds scale/2 ($scale)")
      assert(cos > 0.9995, s"cosine fidelity lost after int8 round-trip: $cos")
    }
    // ANN top-k on dequantized vectors reproduces the exact neighbours
    val deqEmb = emb.select($"vec_id",
      Similarity.dequantizeInt8(Similarity.quantizeInt8($"embedding")).as("embedding"))
    val exact = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 10), 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val viaInt8 = Similarity.bruteForceTopK(deqEmb, deqEmb.filter($"vec_id" < 10), 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect viaInt8).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 top-k recall degraded to $recall")
  }

  test("signBandBuckets fails loudly on a dim mismatch instead of truncating") {
    // buckets from a truncated subspace would silently miss true pairs;
    // the kernel must reject vectors whose length differs from the planes
    val e = intercept[org.apache.spark.SparkException] {
      emb.select(Similarity.signBandBuckets($"embedding", 4, 8, dim = 32)).collect()
    }
    assert(e.getMessage.contains("sign_band_buckets") ||
      Option(e.getCause).exists(_.getMessage.contains("sign_band_buckets")))
  }

  test("kmeansCentroids: deterministic across runs, centroids capped, recall not worse than raw seeds") {
    val (ids1, m1) = Similarity.kmeansCentroids(emb, 20, iters = 4)
    val (ids2, m2) = Similarity.kmeansCentroids(emb, 20, iters = 4)
    assert(ids1 == ids2)
    assert(m1 == m2, "Lloyd rounds must be bit-identical across runs (sorted-fold means)")
    assert(ids1.size == 20 && m1.forall(_.size == 64))
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(trainIters: Int): Double = {
      val ivf = Similarity.ivfTopK(emb, queries, 10, nlist = 20, nprobe = 4,
        trainIters = trainIters)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (brute intersect ivf).size.toDouble / brute.size
    }
    val (kmeans, rawSeeds) = (recall(4), recall(0))
    assert(kmeans >= 0.3, s"k-means IVF recall collapsed: $kmeans")
    assert(kmeans >= rawSeeds - 0.05,
      s"Lloyd refinement degraded recall: kmeans=$kmeans rawSeeds=$rawSeeds")
  }

  test("production-threshold (0.9) LSH over int8-quantized twins equals brute force at every SF") {
    // the raw corpus has no pairs above cosine 0.61 at any SF, so the 0.9
    // path is exercised on originals ∪ dequantized twins — the
    // dedup_embedding_cosine_t90 query shape. 16-bit bands must find every
    // planted twin (cosine ≈ 0.9999) and nothing else.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val orig = e.select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("embedding"))
      val twins = e.select(($"vec_id" + 10000000L).as("vec_id"),
        Similarity.dequantizeInt8(Similarity.quantizeInt8($"embedding")).as("embedding"))
      val corpus = orig.union(twins)
      val brute = Similarity.cosineNearDupPairs(corpus, 0.9)
        .as[(Long, Long, Double)].collect().toSet
      val lsh = Similarity.cosineNearDupLsh(corpus, 0.9, dim = 64,
        bitsPerBand = 16, bands = 8)
        .as[(Long, Long, Double)].collect().toSet
      assert(brute.size == e.count(),
        s"$dir: expected exactly one twin pair per vector, got ${brute.size}")
      assert(lsh == brute, s"$dir: t90 LSH != brute (missing ${(brute -- lsh).size}, " +
        s"extra ${(lsh -- brute).size})")
    }
  }

  test("crossCorpusCosineFlags == brute cross-force best-match on planted twins") {
    // reference = originals, corpus = int8-dequantized twins: every twin
    // must flag with exactly its own original as the best match
    val orig = emb.select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("embedding"))
    val twins = emb.select(($"vec_id" + 10000000L).as("vec_id"),
      Similarity.dequantizeInt8(Similarity.quantizeInt8($"embedding")).as("embedding"))
    val got = Similarity.crossCorpusCosineFlags(twins, orig, 0.9, dim = 64,
        bitsPerBand = 16, bands = 8)
      .as[(Long, Long, Double)].collect().toSet
    // brute-force spec: all cross cosines >= 0.9, best per twin by
    // (cosine desc, ref id asc)
    val o = orig.as[(Long, Seq[Double])].collect()
    val t = twins.as[(Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expect = t.flatMap { case (tid, tv) =>
      val hits = o.map { case (oid, ov) => (oid, cos(tv, ov)) }.filter(_._2 >= 0.9)
      if (hits.isEmpty) None
      else {
        val best = hits.minBy { case (oid, c) => (-c, oid) }
        Some((tid, best._1, math.rint(best._2 * 10000) / 10000))
      }
    }.toSet
    assert(got == expect, s"LSH flags != brute (missing ${(expect -- got).size}, " +
      s"extra ${(got -- expect).size})")
    assert(got.size == emb.count(), "every twin must flag against its original")
    assert(got.forall { case (tid, ref, _) => tid == ref + 10000000L },
      "each twin's best match must be its own original")
  }

  test("cosine cross-corpus artifact path == raw path across two batches") {
    val orig = emb.select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("embedding"))
    val twins = emb.select(($"vec_id" + 10000000L).as("vec_id"),
      Similarity.dequantizeInt8(Similarity.quantizeInt8($"embedding")).as("embedding"))
    val raw = Similarity.crossCorpusCosineFlags(twins, orig, 0.9, dim = 64,
        bitsPerBand = 16, bands = 8)
      .as[(Long, Long, Double)].collect().toSet
    // band the reference ONCE, probe it with two disjoint batches — the
    // union of batch outputs must equal the one-shot raw path
    val idx = Similarity.cosineBandBuild(orig, dim = 64,
      bitsPerBand = 16, bands = 8).persist()
    try {
      val b1 = Similarity.crossCorpusCosineFlagsWith(
          twins.filter($"vec_id" % 2 === 0), idx, 0.9)
        .as[(Long, Long, Double)].collect().toSet
      val b2 = Similarity.crossCorpusCosineFlagsWith(
          twins.filter($"vec_id" % 2 === 1), idx, 0.9)
        .as[(Long, Long, Double)].collect().toSet
      assert((b1 ++ b2) == raw,
        "two batches against the prebuilt band index diverge from the raw path")
      // the wired cap must be invisible at test scale
      val capped = Similarity.crossCorpusCosineFlagsWith(twins, idx, 0.9,
          maxBucketSize = 1000)
        .as[(Long, Long, Double)].collect().toSet
      assert(capped == raw, "the wired cap (1000) changed test-scale output")
    } finally idx.unpersist()
  }

  test("meanPoolAvg (production O(1)-state) == sorted-fold meanPool after rounding") {
    // fp summation order differs; at 4-dp rounding the outputs must agree
    // on the test corpus (fold-vs-avg divergence is ulp-scale)
    val grp = org.apache.spark.sql.functions.pmod($"vec_id",
      org.apache.spark.sql.functions.lit(8L))
    val exact = Similarity.meanPool(emb, grp)
      .as[(Long, Long, Double)].collect().toSet
    val fast = Similarity.meanPoolAvg(emb, grp)
      .as[(Long, Long, Double)].collect().toSet
    assert(fast == exact, "avg-based pooling diverges from the sorted fold")
    // and the production plan must carry NO collect_list buffer
    val p = Similarity.meanPoolAvg(emb, grp).queryExecution.executedPlan.toString
    assert(!p.contains("collect_list"), s"production pooling buffers a list:\n$p")
    assert(p.contains("partial_avg") || p.contains("partial_sum"),
      s"map-side partial aggregation missing:\n$p")
  }

  test("dimStats: exact micro-unit means with true min/max per dimension") {
    val df = Seq(
      (1L, Seq(1.0f, -2.0f)),
      (2L, Seq(3.0f, 4.0f)),
    ).toDF("vec_id", "embedding")
    val got = Similarity.dimStats(df)
      .as[(Int, Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0, 2L, 2.0, 1.0, 3.0),
      (1, 2L, 1.0, -2.0, 4.0)))
  }

  test("semanticDedup: drops match co-clustered brute pairs exactly; recall pinned") {
    val sem = Similarity.semanticDedup(emb, 0.45, nlist = 8, trainIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(sem.length == emb.count(), "every corpus row must appear with a flag")
    val brute = Similarity.cosineNearDupPairs(emb, 0.45)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    // the drops an exhaustive SemDeDup (nlist=1) would make: every pair's
    // larger id — the keep-min ground truth
    val bruteDrops = brute.map(_._2).toSet
    val gotDrops = sem.collect { case (id, _, false) => id }.toSet
    // PRECISION is exact by construction: a drop requires an exact-cosine
    // pair inside a probed cluster, so no id outside the ground-truth drop
    // set can ever be flagged
    assert((gotDrops -- bruteDrops).isEmpty,
      s"false drops (no similar smaller partner exists): ${gotDrops -- bruteDrops}")
    // RECALL at the adversarially low 0.45 threshold: these "dups" are
    // ~63° apart and genuinely scatter across cells — probes 2 recovers
    // 4/7 on the fixed corpus (primary-only finds 2/7); deterministic
    // seeded k-means keeps the number stable. Production-threshold recall
    // is pinned EXACT in the twin test below.
    val recall = gotDrops.size.toDouble / bruteDrops.size
    assert(recall >= 0.5,
      s"low-threshold recall floor broken: ${gotDrops.size}/${bruteDrops.size}")
  }

  test("semanticDedup at production threshold: planted twins recovered exactly") {
    // originals ∪ int8-dequantized twins (id + 10M): every twin sits at
    // cosine ≈ 0.9999 of its original, every cross pair below 0.62 — at
    // threshold 0.9 the ONLY correct outcome is: all twins dropped (their
    // original has the smaller id), all originals kept
    val orig = emb.select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("embedding"))
    val twins = emb.select($"vec_id", Similarity.quantizeInt8($"embedding").as("qz"))
      .select(($"vec_id" + 10000000L).as("vec_id"),
        Similarity.dequantizeInt8($"qz").as("embedding"))
    val sem = Similarity.semanticDedup(orig.unionByName(twins), 0.9,
      nlist = 8, trainIters = 2)
    val drops = sem.filter(!$"keep").select($"vec_id").as[Long].collect().toSet
    val twinIds = emb.select($"vec_id" + 10000000L).as[Long].collect().toSet
    assert(drops == twinIds,
      s"missing=${(twinIds -- drops).size} false=${(drops -- twinIds).size}")
  }

  test("hardNegatives: label predicate is inside the join — same-label crowd-out cannot under-fill k") {
    // planted crowd-out: three same-label near-twins of the query sit at
    // the top of the label-blind ranking; retrieve-then-filter over a
    // label-blind top-2 would return ZERO negatives, the in-join predicate
    // must return both different-label vectors
    val corpus = Seq(
      (1L, Array(1f, 0.001f), 0), (2L, Array(1f, 0.002f), 0), (3L, Array(1f, 0.003f), 0),
      (10L, Array(0.8f, 0.6f), 1), (11L, Array(0.6f, 0.8f), 2),
    ).toDF("vec_id", "embedding", "label")
    val q = Seq((50L, Array(1f, 0f), 0)).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(corpus, q, 2)
      .select($"rnk", $"neighbor_id", $"neg_label").as[(Int, Long, Int)].collect().toList
    assert(got == List((1, 10L, 1), (2, 11L, 2)))
    // corpus sanity: never a same-label neighbor, exactly k rows per query
    val qs = emb.filter($"vec_id" < 5)
    val labels = emb.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val rows = Similarity.hardNegatives(emb, qs, 3)
      .select($"query_id", $"neighbor_id", $"neg_label").as[(Long, Long, Int)].collect()
    assert(rows.length == 5 * 3)
    rows.foreach { case (qid, nb, nl) =>
      assert(labels(nb) == nl, "neg_label must be the neighbor's own label")
      assert(labels(qid) != nl, "a hard negative must differ from the query's label")
    }
  }

  test("knnClassify: majority vote; ties break by best cosine then smaller label") {
    val corpus = Seq(
      (1L, Array(1f, 0.01f), 0), (2L, Array(1f, 0.02f), 1), (3L, Array(1f, 0.03f), 1),
      (4L, Array(0.9f, 0.5f), 0),
    ).toDF("vec_id", "embedding", "label")
    val q = Seq((100L, Array(1f, 0f), -1)).toDF("vec_id", "embedding", "label")
    // k=3: top-3 are ids 1,2,3 → votes {0:1, 1:2} → label 1
    val p3 = Similarity.knnClassify(corpus, q, 3)
      .select($"pred_label", $"votes").as[(Int, Long)].collect().head
    assert(p3 == ((1, 2L)))
    // k=4: votes tie 2–2 → the label holding the single best cosine (id 1,
    // label 0) wins
    val p4 = Similarity.knnClassify(corpus, q, 4)
      .select($"pred_label", $"votes").as[(Int, Long)].collect().head
    assert(p4 == ((0, 2L)))
  }

  test("kCenterCoreset: exact traversal on a line; corpus run is deterministic and diversity-ordered") {
    // 1-d corpus at x = 0, 10, 6, 1: seed is min id (x=0); farthest is
    // x=10 (dist 10); then x=6 (min(6, 4) = 4 to the selected set)
    val line = Seq(
      (0L, Array(0f)), (1L, Array(10f)), (2L, Array(6f)), (3L, Array(1f)),
    ).toDF("vec_id", "embedding")
    val got = Similarity.kCenterCoreset(line, 3)
      .as[(Int, Long, Double)].collect().sortBy(_._1).toList
    assert(got == List((1, 0L, -1.0), (2, 1L, 10.0), (3, 2L, 4.0)))
    // corpus: deterministic under repartition; selection distances
    // non-increasing (each pick covers the space no worse than the last)
    val a = Similarity.kCenterCoreset(emb, 6).as[(Int, Long, Double)].collect().sortBy(_._1).toList
    val b = Similarity.kCenterCoreset(emb.repartition(13), 6)
      .as[(Int, Long, Double)].collect().sortBy(_._1).toList
    assert(a == b, "farthest-point traversal must not depend on partitioning")
    assert(a.map(_._2).distinct.size == 6, "centers must be distinct")
    val ds = a.drop(1).map(_._3)
    assert(ds == ds.sorted.reverse, s"selection distances must be non-increasing: $ds")
  }

  test("mmrSelect: diversity beats a higher-relevance near-dup; deterministic under repartition") {
    // q = e1; B is top relevance, A a near-dup of B, C the mirror of A
    // (rel tied with A, diverse from B) — pure ranking (λ = 1) orders
    // B, A, C (tie toward the smaller id); MMR at λ = 0.7 must swap in
    // the diverse C ahead of the near-dup A: B, C, A
    val corpus = Seq(
      (1L, Array(0.9f, 0.3f, 0f)), (2L, Array(0.95f, 0.25f, 0f)),
      (3L, Array(0.9f, -0.3f, 0f)),
    ).toDF("vec_id", "embedding")
    val qdf = Seq((0L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(corpus, qdf, 3, 0.7)
      .as[(Int, Long, Double)].collect().sortBy(_._1).map(_._2).toList
    assert(got == List(2L, 3L, 1L), s"MMR order must be B, C(diverse), A(near-dup): $got")
    graft.Cleanup.drain()
    val rel = Similarity.mmrSelect(corpus, qdf, 3, 1.0)
      .as[(Int, Long, Double)].collect().sortBy(_._1).map(_._2).toList
    assert(rel == List(2L, 1L, 3L), s"λ=1 must reduce to pure relevance ranking: $rel")
    graft.Cleanup.drain()
    // corpus determinism under repartition
    val a = Similarity.mmrSelect(emb, emb.filter($"vec_id" === 0), 6, 0.7)
      .as[(Int, Long, Double)].collect().sortBy(_._1).toList
    graft.Cleanup.drain()
    val b = Similarity.mmrSelect(emb.repartition(13), emb.filter($"vec_id" === 0), 6, 0.7)
      .as[(Int, Long, Double)].collect().sortBy(_._1).toList
    graft.Cleanup.drain()
    assert(a == b, "greedy MMR traversal must not depend on partitioning")
    assert(a.map(_._2).head == 0L, "round 1 is pure relevance — the query's own vector wins")
  }

  test("mmrSelect: pool-then-rerank equals the full-corpus form at test scale") {
    // k = 6 → default pool 64·k = 384 < 500 corpus rows, so the cut is
    // ACTIVE here — this pins the pool contract: the top-384-by-relevance
    // pool contains everything full-corpus MMR selects, so both forms
    // produce identical output (the driver's oracle replays the full form)
    val q = emb.filter($"vec_id" === 0)
    val pooled = Similarity.mmrSelect(emb, q, 6, 0.7)
      .as[(Int, Long, Double)].collect().sortBy(_._1).toList
    graft.Cleanup.drain()
    val full = Similarity.mmrSelect(emb, q, 6, 0.7, poolM = Int.MaxValue)
      .as[(Int, Long, Double)].collect().sortBy(_._1).toList
    graft.Cleanup.drain()
    assert(pooled == full, "pool cut must not change the selection at test SFs")
    // degenerate pool = k: MMR reorders exactly the top-k-by-relevance set
    val tight = Similarity.mmrSelect(emb, q, 3, 0.7, poolM = 3)
      .as[(Int, Long, Double)].collect().sortBy(_._1).map(_._2).toSet
    graft.Cleanup.drain()
    val rel3 = Similarity.mmrSelect(emb, q, 3, 1.0, poolM = 3)
      .as[(Int, Long, Double)].collect().sortBy(_._1).map(_._2).toSet
    graft.Cleanup.drain()
    assert(tight == rel3, "poolM = k must select exactly the top-k relevance set")
  }

  test("kCenterCoreset: checkpoint cadence cannot change the traversal (c = 1 ≡ default ≡ c ≥ k)") {
    // least() is associative and each distance fold is bit-identical
    // whether read from a checkpoint or recomputed inline — so every
    // cadence must give the byte-identical selection
    val every = Similarity.kCenterCoreset(emb, 7, checkpointEvery = 1)
      .as[(Int, Long, Double)].collect().sortBy(_._1).toList
    graft.Cleanup.drain()
    val deflt = Similarity.kCenterCoreset(emb, 7)
      .as[(Int, Long, Double)].collect().sortBy(_._1).toList
    graft.Cleanup.drain()
    val never = Similarity.kCenterCoreset(emb, 7, checkpointEvery = 100)
      .as[(Int, Long, Double)].collect().sortBy(_._1).toList
    graft.Cleanup.drain()
    assert(every == deflt, "c = 1 (the round-9 shape) must equal the default cadence")
    assert(deflt == never, "no-checkpoint (pure inline least chain) must equal the default")
  }

  test("powerIteration: planted dominant axis recovered; partition-order bit-identical; matches dense eigensolve") {
    // planted: mass concentrated on dim 0 — the component must be ±e0
    val planted = Seq(
      Array(10f, 0f, 0.1f), Array(-10f, 0.1f, 0f), Array(9f, 0.2f, 0.1f),
      Array(0f, 1f, 0f), Array(0.1f, 0f, 1f),
    ).toDF("embedding")
    val v = Similarity.powerIteration(planted, iters = 8, dim = 3)
      .as[(Long, Double)].collect().sortBy(_._1).map(_._2)
    assert(math.abs(v(0)) > 0.999 && math.abs(v(1)) < 0.04 && math.abs(v(2)) < 0.04, v.toList.toString)
    graft.Cleanup.drain()
    // corpus: the quantized-integer reduction must be BIT-identical under
    // any partitioning (the property a plain double sum cannot give)
    val a = Similarity.powerIteration(emb, iters = 6).as[(Long, Double)].collect().sorted.toList
    graft.Cleanup.drain()
    val b = Similarity.powerIteration(emb.repartition(17), iters = 6)
      .as[(Long, Double)].collect().sorted.toList
    graft.Cleanup.drain()
    assert(a == b, "fixed-point reduction must not depend on partition order")
    // and it must agree with an exact driver-side dense power iteration
    // (no quantization) — the 2^-20 quantization is far below 5-dp output
    val rows = emb.select(transform($"embedding", x => x.cast("double")))
      .as[Seq[Double]].collect()
    val dim = rows.head.length
    var w = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to 6) {
      val s = Array.fill(dim)(0.0)
      rows.foreach { x =>
        val d = (0 until dim).foldLeft(0.0)((acc, i) => acc + x(i) * w(i))
        (0 until dim).foreach(i => s(i) += x(i) * d)
      }
      val nrm = math.sqrt(s.foldLeft(0.0)((acc, x) => acc + x * x))
      w = s.map(_ / nrm)
    }
    val maxDiff = a.map(_._2).zip(w).map { case (x, y) => math.abs(x - y) }.max
    assert(maxDiff < 1e-4, s"quantized vs dense power iteration diverged: $maxDiff")
  }

  test("powerIterationVector kernel rounds are bit-identical to the declarative decimal-sum rounds") {
    // round-16 parity pin: the mapPartitions round kernel replaced the
    // sum(round(x_i·dot·Q).cast(long).cast(decimal(27,0))) declarative
    // aggregate — replay that EXACT chain here and compare the whole
    // trajectory by raw double bits (the VecFoldKernelsSpec discipline).
    import org.apache.spark.sql.functions.{element_at, round => sqlRound, sum => sqlSum}
    val Q = 1048576.0
    val dim = emb.select(org.apache.spark.sql.functions.size($"embedding"))
      .as[Int].head()
    val base = emb.select(transform($"embedding", x => x.cast("double")).as("v"))
      .localCheckpoint()
    var vcur: Array[Double] = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to 6) {
      val vl = array(vcur.toIndexedSeq.map(lit): _*)
      val dotC = graft.functions.VectorFunctions.vecDot($"v", vl)
      val aggs = (0 until dim).map(i =>
        sqlSum(sqlRound(element_at($"v", i + 1) * $"dot" * lit(Q))
          .cast("long").cast("decimal(27,0)")).as(s"s$i"))
      val row = base.withColumn("dot", dotC)
        .agg(aggs.head, aggs.tail: _*).collect().head
      val s = (0 until dim).map(i => row.getDecimal(i).doubleValue() / Q).toArray
      val norm = math.sqrt(s.foldLeft(0.0)((a, x) => a + x * x))
      vcur = s.map(_ / norm)
    }
    val kernel = Similarity.powerIterationVector(emb, iters = 6, dim = dim)
    graft.Cleanup.drain()
    assert(kernel.length == vcur.length)
    kernel.toIndexedSeq.zip(vcur.toIndexedSeq).zipWithIndex.foreach { case ((k, d), i) =>
      assert(java.lang.Double.doubleToRawLongBits(k) ==
        java.lang.Double.doubleToRawLongBits(d),
        s"component $i: kernel $k != declarative $d")
    }
  }

  test("removeDominantComponent: planted axis fully removed; projection never grows a norm") {
    // exact eigenbasis (off-diagonal Gram = 0): dominant = e0 — whitening
    // must null the e0 mass and keep the e1 mass
    val planted = Seq(
      (1L, Array(10f, 0f)), (2L, Array(-10f, 0f)), (3L, Array(0f, 4f)),
    ).toDF("vec_id", "embedding")
    val v = Similarity.powerIterationVector(planted, iters = 8, dim = 2)
    graft.Cleanup.drain()
    val got = Similarity.removeDominantComponent(planted, v)
      .as[(Long, Double, Double)].collect().sortBy(_._1).toList
    assert(got.map(_._2) == List(10.0, 10.0, 4.0))
    assert(got(0)._3 < 1e-3 && got(1)._3 < 1e-3, s"e0 mass must vanish: $got")
    assert(math.abs(got(2)._3 - 4.0) < 1e-3, s"e1 mass must survive: $got")
    // corpus invariant: ||x - (x·v)v|| <= ||x|| always (rounding slack)
    val comp = Similarity.powerIterationVector(emb, iters = 6)
    graft.Cleanup.drain()
    val rows = Similarity.removeDominantComponent(emb, comp)
      .as[(Long, Double, Double)].collect()
    assert(rows.length > 0)
    rows.foreach { case (id, before, after) =>
      assert(after <= before + 1e-4, s"vec $id: projection grew the norm ($before -> $after)")
    }
  }

  test("ivfMaybeRebuild: planted drifted batch fires a retrain; in-distribution batch is identity") {
    val index = Similarity.ivfBuild(emb, nlist = 20)
    val refScores = Similarity.ivfAssignScores(index, emb)

    // in-distribution: monitoring the training snapshot against itself
    // gives TVD = 0 — the append-only regime continues with the SAME
    // artifact (object identity, not just equal contents)
    val calmReport = Analytics.scoreDrift(refScores, refScores, "acos")
    assert(Similarity.ivfMaybeRebuild(index, calmReport).eq(index),
      "zero drift must return the identical index object")

    // planted shift: compress each vector to 5% and shift every
    // component to ~+5 — the batch collapses onto the all-ones direction,
    // so assignment cosines concentrate in a few buckets the reference
    // distribution spreads across; TVD crosses any reasonable threshold
    val drifted = emb.select(
      ($"vec_id" + 100000L).as("vec_id"),
      transform($"embedding", x => (x * 0.05 + 5.0).cast("float")).as("embedding"))
    val appended = Similarity.ivfAppend(index, drifted)
    val batchScores = Similarity.ivfAssignScores(index, drifted)
    val driftReport = Analytics.scoreDrift(refScores, batchScores, "acos")
    val tvd = driftReport.agg(sum($"d_ppm")).as[Double].head() / 2e6
    assert(tvd > 0.1, s"planted shift should move >10% of mass, got TVD=$tvd")

    val rebuilt = Similarity.ivfMaybeRebuild(appended, driftReport)
    assert(!rebuilt.eq(appended), "above-threshold drift must retrain")
    assert(rebuilt.mat != appended.mat,
      "rebuild must produce a retrained quantizer, not the frozen one")
    assert(rebuilt.ids.size == appended.ids.size, "nlist preserved across rebuild")
    // the retrained artifact covers the full appended corpus, reassigned
    assert(rebuilt.bucketed.count() == appended.bucketed.count())
    // and is still a queryable index: full k results per query
    val queries = emb.filter($"vec_id" < 5)
    assert(Similarity.ivfQuery(rebuilt, queries, 5, nprobe = 4).count() == 5 * 5)
  }

  test("sq8: per-component error <= scale/2; near-exact recall vs brute force; zero vector safe") {
    // quantization law: |x - c*s| <= s/2 for every component (round to
    // nearest multiple of the scale), and codes stay in [-127, 127]
    val enc = Similarity.sq8Encode(emb).join(
      emb.select($"vec_id", $"embedding"), "vec_id")
    val bad = enc.select($"vec_id", $"sq_scale",
        expr("""filter(zip_with(embedding, sq_codes,
          (x, c) -> struct(CAST(x AS DOUBLE) AS x, c AS c)),
          p -> abs(p.x - p.c * sq_scale) > sq_scale / 2 + 1e-12
            OR p.c > 127 OR p.c < -127)""").as("viol"))
      .filter(size($"viol") > 0).count()
    assert(bad === 0, "SQ8 must round every component to within scale/2")
    // ~7 significant bits keep the top-10 nearly intact at dim 64: the
    // quantized ranking recovers >=8 of the exact top-10 per query on the
    // fixed corpus (deterministic fact once green)
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.dotTopK(emb, queries, 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sq = Similarity.sq8TopK(emb, queries, 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, ex) => (ex & sq(q)).size }
    assert(recalls.forall(_ >= 8), s"SQ8 recall@10 degraded: $recalls")
    // the all-zero vector encodes to all-zero codes (scale clamps to
    // MIN_NORMAL via the shared quantizeInt8 convention) and scores 0
    val withZero = emb.select($"vec_id", $"embedding").unionByName(
      Seq((999999L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val z = Similarity.sq8Encode(withZero).filter($"vec_id" === 999999L)
      .select($"sq_scale", expr("aggregate(sq_codes, 0L, (a, c) -> a + abs(c))"))
      .as[(Double, Long)].head()
    assert(z == ((java.lang.Double.MIN_NORMAL, 0L)))
    assert(Similarity.sq8TopK(withZero, withZero.filter($"vec_id" === 999999L), 5)
      .count() === 5)
  }

  test("ivfPqMaybeRebuild: distortion drift fires a composite retrain; self-comparison is identity") {
    // the round-10 coarse-quantizer gate extended to the composite: the
    // frozen-codebook append regime is monitored on the RESIDUAL
    // distortion lattice (ivfPqDistortion), and the rebuild retrains
    // both quantizers from the raw corpus (the encoded artifact
    // deliberately has no full-precision vectors to rebuild from)
    val index = Similarity.ivfPqBuild(emb, nlist = 16, m = 8, ksub = 16)
    val refDist = Similarity.ivfPqDistortion(index, emb)

    val calmReport = Analytics.scoreDrift(refDist, refDist, "pq_err_r")
    assert(Similarity.ivfPqMaybeRebuild(index, emb, calmReport).eq(index),
      "zero distortion drift must return the identical index object")

    // planted drift: collapse toward a far constant direction — residuals
    // leave the codebooks' coverage, distortion mass shifts wholesale
    val drifted = emb.select(
      ($"vec_id" + 100000L).as("vec_id"),
      transform($"embedding", x => (x * 0.05 + 5.0).cast("float")).as("embedding"))
    val appended = Similarity.ivfPqAppend(index, drifted)
    val driftReport = Analytics.scoreDrift(
      refDist, Similarity.ivfPqDistortion(index, drifted), "pq_err_r")
    val tvd = driftReport.agg(sum($"d_ppm")).as[Double].head() / 2e6
    assert(tvd > 0.1, s"planted drift should move >10% of distortion mass, got TVD=$tvd")

    val corpus = emb.select($"vec_id", $"embedding").unionByName(drifted)
    val rebuilt = Similarity.ivfPqMaybeRebuild(appended, corpus, driftReport)
    assert(!rebuilt.eq(appended), "above-threshold drift must retrain")
    assert(rebuilt.mat != appended.mat,
      "rebuild must produce a retrained coarse quantizer, not the frozen one")
    assert(rebuilt.books != appended.books,
      "rebuild must produce retrained codebooks, not the frozen ones")
    assert(rebuilt.ids.size == appended.ids.size
      && rebuilt.books.m == appended.books.m
      && rebuilt.books.ksub == appended.books.ksub,
      "index geometry carries over a rebuild")
    // the retrained artifact covers the full corpus, re-encoded
    assert(rebuilt.encoded.count() == appended.encoded.count())
    // and is still a queryable index: full k results per query
    val queries = emb.filter($"vec_id" < 5)
    assert(Similarity.ivfPqQuery(rebuilt, queries, 5, nprobe = 4).count() == 5 * 5)
  }

  test("cosineNearDupLsh equals the brute-force oracle at every test SF") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val brute = Similarity.cosineNearDupPairs(e, 0.45)
        .as[(Long, Long, Double)].collect().toSet
      val lsh = Similarity.cosineNearDupLsh(e, 0.45, dim = 64)
        .as[(Long, Long, Double)].collect().toSet
      assert(brute.nonEmpty, s"$dir: brute-force oracle found no pairs — bad fixture")
      val missed = brute -- lsh
      assert(missed.isEmpty, s"$dir: LSH missed ${missed.size}/${brute.size} pairs: " +
        missed.take(5).mkString(", "))
      assert((lsh -- brute).isEmpty, s"$dir: LSH emitted pairs brute force did not")
    }
  }
}
