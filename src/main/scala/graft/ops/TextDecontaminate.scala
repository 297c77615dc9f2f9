package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TextAnalysis partition: benchmark decontamination and split-leakage —
  * the exact broadcast-join form and the Bloom-sketch scale form.
  * See [[TextAnalysis]].
  */
trait TextDecontaminate { self: TextAnalysis.type =>

  /** Train→held-out contamination metric: distinct-n-gram containment of
    * every val/test document against the TRAIN split's gram set, with the
    * splits derived from the same content-hash [[splitAssignment]] the
    * pipeline ships. This composition catches the leakage class per-corpus
    * decontamination can't see: NEAR-copies that landed on opposite sides
    * of the split boundary (exact copies can't leak here by construction —
    * identical text hashes to the same bucket). Same broadcast shape as
    * [[decontaminationScore]]; when the train side outgrows a broadcast at
    * 100 TB, swap in the Bloom variant unchanged.
    */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int): DataFrame = {
    require(!df.columns.contains("__split"),
      "splitLeakage uses '__split' as a temp column; input must not contain it")
    val withSplit = df.withColumn("__split", splitAssignment(col(textCol)))
    val train = withSplit.filter(col("__split") === "train")
    val heldOut = withSplit.filter(col("__split") =!= "train")
    decontaminationScore(heldOut, train, idCol, textCol, shingleN)
      .withColumnsRenamed(Map("bench_hits" -> "train_hits"))
  }

  /** Leakage-safe train/val/test split: assign every document the split of
    * its near-dup CLUSTER REPRESENTATIVE, so a connected component of
    * near-duplicates lands on ONE side of every split boundary by
    * construction. This closes the leakage class [[splitLeakage]] exists to
    * measure: content-hash assignment ([[splitAssignment]]) sends byte-
    * identical copies to the same split, but NEAR-copies hash to unrelated
    * buckets and straddle the boundary — the train/eval contamination that
    * silently inflates held-out metrics. Bucketing the component
    * representative (`pmod(xxhash64(rep), 100)`) makes the split a pure
    * function of the cluster, so leakage across splits is structurally
    * zero for every detected near-dup pair (spec-pinned: the composed
    * cross-split pair count is empty where the naive split's is not).
    *
    * Scale shape: `clusters` is the build-once assignment artifact
    * ([[Dedup.duplicateClusters]] — id → component min); the only work
    * here is ONE equi-join of the corpus against that id-grain relation
    * (bucketed storage on the id key makes it exchange-free) plus a
    * scan-speed hash projection. Docs absent from the artifact (new
    * singletons) fall back to their own id — identical semantics to a
    * singleton cluster, so a stale artifact degrades to the content-hash
    * status quo, never to an error.
    *
    * @param clusters (id, rep) rows from [[Dedup.duplicateClusters]]
    * @return docs plus `cluster_rep` and `split` ∈ train/val/test
    */
  def leakageSafeSplit(docs: DataFrame, clusters: DataFrame, idCol: String,
                       trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct >= 1 && valPct >= 0 && trainPct + valPct <= 100,
      s"leakageSafeSplit: bad split percentages ($trainPct, $valPct)")
    Seq("cluster_rep", "split", "__rep").foreach(c =>
      require(!docs.columns.contains(c), s"leakageSafeSplit reserves column name '$c'"))
    val reps = clusters.select(col("id").as(idCol), col("rep").as("__rep"))
    val bucket = pmod(xxhash64(col("cluster_rep")), lit(100L))
    docs.join(reps, Seq(idCol), "left")
      .withColumn("cluster_rep", coalesce(col("__rep"), col(idCol)))
      .drop("__rep")
      .withColumn("split",
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Benchmark decontamination: per document, the n-gram CONTAINMENT
    * against a benchmark corpus — |shingles(doc) ∩ benchmarkShingles| /
    * |shingles(doc)| — the standard check that training data doesn't leak
    * eval sets. The benchmark's distinct shingle set is aggregated once
    * and the overlap is computed with a broadcast-friendly join:
    * doc-shingles explode → semi-join against benchmark shingles (small
    * side broadcast) → per-doc overlap count. At 100 TB the benchmark is
    * tiny next to the corpus, so the join never shuffles the corpus —
    * each partition counts its own docs' hits.
    */
  def decontaminationScore(docs: DataFrame, benchmark: DataFrame,
                           idCol: String, textCol: String, shingleN: Int): DataFrame = {
    val benchGrams = benchmark
      .select(explode(Dedup.shingles(col(textCol), shingleN)).as("g")).distinct()
      .withColumn("__hit", lit(1))
    // ONE pass over the corpus: explode the (already-distinct) doc
    // shingles once, mark benchmark hits via the broadcast left join, and
    // produce both the gram count and the hit count from a single groupBy
    // — no second shingle computation, no reunite join. explode_outer
    // keeps empty documents (0 grams) in the output.
    docs.select(col(idCol), explode_outer(Dedup.shingles(col(textCol), shingleN)).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(col("g")).as("n_grams"), count(col("__hit")).as("bench_hits"))
      .select(col(idCol), col("n_grams"), col("bench_hits"),
        round(col("bench_hits").cast("double") /
          greatest(col("n_grams"), lit(1)), 4).as("containment"))
  }

  /** Build a serialized Bloom filter over a benchmark corpus's distinct
    * n-gram shingles — the compact sketch `decontaminationScoreBloom`
    * probes. Built DISTRIBUTED via `DataFrameStatFunctions.bloomFilter`
    * (treeAggregate of per-partition filters — the gram set itself never
    * reaches the driver; only the final ~1.2·n·log2(1/fpp)-bit filter
    * does). At fpp 1e-4 that is ~2.4 bytes per gram: a 10M-gram benchmark
    * suite is a ~24 MB filter vs hundreds of MB for the broadcast hash
    * relation of the exact path's semi-join — the difference between a
    * benchmark set that broadcasts and one that doesn't.
    */
  def benchmarkBloom(benchmark: DataFrame, textCol: String, shingleN: Int,
                     fpp: Double = 1e-4): Array[Byte] = {
    val grams = benchmark
      .select(explode(Dedup.shingles(col(textCol), shingleN)).as("g")).distinct()
    val n = math.max(grams.count(), 1L)
    val bloom = grams.stat.bloomFilter("g", n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Benchmark decontamination via a Bloom filter — the 100 TB-scale shape
    * of `decontaminationScore`: instead of broadcast-semi-joining the
    * corpus's exploded shingles against the benchmark gram SET, every task
    * probes the compact filter inside a higher-order `filter` lambda —
    * NO explode, NO join, NO shuffle; one scan-speed projection per
    * document. Bloom guarantees no false negatives, so `bloom_hits` is an
    * upper bound on the exact `bench_hits` (flagged docs are a superset —
    * exactly what a contamination FILTER needs: nothing contaminated
    * escapes); false positives are bounded by the build-time fpp and the
    * output column is named `containment_ub` to say so. Spec-pinned
    * against the exact operator.
    */
  def decontaminationScoreBloom(docs: DataFrame, bloomBits: Array[Byte],
                                idCol: String, textCol: String, shingleN: Int): DataFrame = {
    require(!docs.columns.contains("__grams"),
      "decontaminationScoreBloom uses '__grams' as a temp column; input must not contain it")
    // small filters ride the expression tree as a (content-equal) literal;
    // a production-sized one (~24 MB for 10M grams) ships ONCE per executor
    // as a broadcast variable instead of per task binary
    val hit: Column => Column =
      if (bloomBits.length <= BloomBroadcastThreshold) {
        g => graft.functions.VectorFunctions.bloomMightContain(g, bloomBits)
      } else {
        val bcast = docs.sparkSession.sparkContext.broadcast(bloomBits)
        g => graft.functions.VectorFunctions.bloomMightContain(g, bcast)
      }
    // shingles materialized ONCE in a lower projection: HOF lambdas get no
    // codegen CSE, so inlining the shingle kernel into both size() and
    // filter() would tokenize every document twice
    docs.withColumn("__grams", Dedup.shingles(col(textCol), shingleN))
      .select(col(idCol), size(col("__grams")).as("n_grams"),
        size(filter(col("__grams"), hit)).as("bloom_hits"))
      .withColumn("containment_ub",
        round(col("bloom_hits").cast("double") / greatest(col("n_grams"), lit(1)), 4))
  }
}
