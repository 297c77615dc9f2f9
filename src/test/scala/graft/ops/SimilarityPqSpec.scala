package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SimilarityPqSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("pqEncode: m codes in [0, ksub), identical through a reshuffle") {
    val books = Similarity.pqTrain(emb, m = 8, ksub = 16, iters = 2)
    val codes = Similarity.pqEncode(emb, books)
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(codes.nonEmpty)
    codes.foreach { case (_, cs) =>
      assert(cs.length == 8)
      cs.foreach(c => assert(c >= 0 && c < 16))
    }
    val again = Similarity.pqEncode(emb.repartition(13), books)
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(codes.toSeq == again.toSeq, "encoding must be partition-order independent")
  }

  test("pqTrain iters=0: codebooks are exact slices of the hash-smallest vectors by id") {
    val books = Similarity.pqTrain(emb, m = 8, ksub = 16, iters = 0)
    val seeds = emb
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .orderBy(xxhash64($"vec_id").asc, $"vec_id".asc).limit(16)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(books.m == 8 && books.ksub == 16 && books.dsub == 8)
    for (s <- 0 until 8; c <- 0 until 16)
      assert(books.books(s)(c) == seeds(c)._2.slice(s * 8, s * 8 + 8),
        s"codebook ($s, $c) is not the seed slice")
  }

  test("Lloyd refinement does not increase training-set distortion (iters 4 <= iters 1)") {
    // at sf0.001 the 16·32 sample covers the whole 500-vector corpus, so
    // corpus distortion IS the Lloyd objective and must be non-increasing
    // across iterations of the same init path
    def total(iters: Int): Double = {
      val books = Similarity.pqTrain(emb, m = 8, ksub = 16, iters = iters)
      Similarity.pqDistortion(emb, books).agg(sum($"pq_err_r")).as[Double].head()
    }
    val d1 = total(1); val d4 = total(4)
    assert(d4 <= d1 + 1e-6, s"Lloyd objective rose: iters=1 $d1 -> iters=4 $d4")
    assert(d1 > 0.0) // 16 codewords cannot represent 500 distinct vectors exactly
  }

  test("pqTopK: ADC ranking recalls the exact dot-product top-k usably") {
    val queries = emb.filter($"vec_id" < 10)
    val adc = Similarity.pqTopKTrained(emb, queries, 10, m = 8, ksub = 16, iters = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // exact dot-product (MIPS) top-k, same tie-breaks
    val q = broadcast(queries.select($"vec_id".as("query_id"), $"embedding".as("qv")))
    val scored = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("cv"))
      .join(q, $"neighbor_id" =!= $"query_id")
      .withColumn("d", Similarity.dot($"qv", $"cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"d".desc, $"neighbor_id".asc)
    val exact = scored.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(adc.size == exact.size) // full k per query either way
    val recall = (adc intersect exact).size.toDouble / exact.size
    assert(recall >= 0.15, s"ADC recall $recall collapsed (random would be ~0.02)")
  }

  test("ivfPqQuery with nprobe = nlist degenerates to the unpruned ADC search") {
    val index = Similarity.ivfPqBuild(emb, nlist = 20, m = 8, ksub = 16,
      trainIters = 2, pqIters = 2)
    val queries = emb.filter($"vec_id" < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rnk", "neighbor_id", "adc_r")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val full = rows(Similarity.ivfPqQuery(index, queries, 5, nprobe = 20))
    val unpruned = rows(Similarity.pqTopK(
      index.encoded.select($"vec_id", $"codes"), queries, 5, index.books))
    assert(full == unpruned, "full probe must equal the unpruned ADC ranking")
    // partial probe: still k rows per query, a subset of the scanned slice
    val pruned = Similarity.ivfPqQuery(index, queries, 5, nprobe = 4)
      .groupBy($"query_id").count().as[(Long, Long)].collect()
    pruned.foreach { case (_, n) => assert(n == 5L) }
  }

  test("ivfPqAppend: frozen quantizers, appended == one-shot encode of the union") {
    val old = emb.filter($"vec_id" % 2 === 0)
    val base = Similarity.ivfPqBuild(old, nlist = 20, m = 8, ksub = 16,
      trainIters = 2, pqIters = 2)
    val appended = Similarity.ivfPqAppend(base, emb.filter($"vec_id" % 2 === 1))
    val queries = emb.filter($"vec_id" < 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    // one-shot: same quantizers applied to the whole union in one pass
    val oneShot = Similarity.ivfPqAppend(
      base.copy(encoded = base.encoded.limit(0)), emb)
    assert(rows(Similarity.ivfPqQuery(appended, queries, 5, nprobe = 4)) ==
      rows(Similarity.ivfPqQuery(oneShot, queries, 5, nprobe = 4)))
  }

  test("encoded corpus persists to parquet and answers identically to in-memory") {
    val books = Similarity.pqTrain(emb, m = 8, ksub = 16, iters = 2)
    val enc = Similarity.pqEncode(emb, books)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toFile.getAbsolutePath
    enc.write.mode("overwrite").parquet(s"$dir/codes")
    val reloaded = spark.read.parquet(s"$dir/codes")
    val queries = emb.filter($"vec_id" < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(rows(Similarity.pqTopK(reloaded, queries, 5, books)) ==
      rows(Similarity.pqTopK(enc, queries, 5, books)))
  }
}
