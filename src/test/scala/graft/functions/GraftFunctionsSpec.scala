package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class GraftFunctionsSpec extends AnyFunSuite {
  import TestSpark.spark

  test("native expressions are callable from pure SQL after registration") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |  shingle_ngrams(array('a','b','c','d'), 3) AS sh,
        |  size(minhash_sig(array('x','y'), 16)) AS k,
        |  simhash64(array('tok1','tok2')) AS s
        |""".stripMargin).head()
    assert(row.getAs[Double]("d") == 32.0)
    assert(row.getAs[scala.collection.Seq[String]]("sh").toSeq == Seq("a b c", "b c d"))
    assert(row.getAs[Int]("k") == 16)
    // simhash of a fixed token set is a stable value
    assert(row.getAs[Long]("s") == spark.sql("SELECT simhash64(array('tok1','tok2')) s").head().getLong(0))
  }

  test("text_fingerprint and sign_band_buckets are SQL-callable") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  text_fingerprint('ab') AS fp,
        |  sign_band_buckets(array(1.0D, -2.0D, 0.5D), 4, 8, 3) AS bb
        |""".stripMargin).head()
    assert(row.getAs[Long]("fp") == ('a'.toLong * 31 + 'b'.toLong)) // h*31+c fold
    val bb = row.getAs[scala.collection.Seq[Long]]("bb")
    assert(bb.length == 8 && bb.forall(b => b >= 0 && b < 16)) // 8 bands of 4 bits
  }

  test("hashed_bow is SQL-callable: counts partition grams, features " +
       "are density-relative") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  hashed_bow(array('a','b','a'), 8, 1, 0) AS c,
        |  hashed_bow(array('a','b','a'), 8, 2, 1) AS x
        |""".stripMargin).head()
    val c = row.getAs[scala.collection.Seq[Int]]("c")
    assert(c.length == 8 && c.sum == 3, s"3 unigrams into 8 buckets: $c")
    val x = row.getAs[scala.collection.Seq[Double]]("x")
    // 3 unigrams + 2 bigrams; density-relative features sum to dim
    assert(x.length == 8 && math.abs(x.sum - 8.0) < 1e-9, s"$x")
  }

  test("SignBandBuckets kernel matches a per-plane scalar recomputation") {
    // pin the kernel's arithmetic: same planes, same element-order double
    // accumulation, same strict > 0 sign rule
    val vecs = Seq(Seq(0.3, -1.2, 0.7, 0.05), Seq(-0.9, 0.0, 2.2, -0.4))
    val (bits, bands, dim) = (5, 6, 4)
    val planes = graft.ops.Similarity.hyperplanes(bits * bands, dim)
    import spark.implicits._
    val got = vecs.toDF("v")
      .select(VectorFunctions.signBandBuckets(
        org.apache.spark.sql.functions.col("v"), bits, bands, dim).as("bb"))
      .as[Seq[Long]].collect()
    val expect = vecs.map { v =>
      (0 until bands).map { b =>
        (0 until bits).foldLeft(0L) { (acc, j) =>
          var s = 0.0
          for (i <- 0 until dim) s += v(i) * planes(b * bits + j)(i)
          if (s > 0) acc | (1L << j) else acc
        }
      }
    }
    assert(got.map(_.toSeq).toSeq == expect.map(_.toSeq))
  }

  test("registration is idempotent and arity errors are clear") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark) // no throw
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_ngrams(array('a'), 'not-an-int')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getMessage.toLowerCase.contains("integer"))
  }

  test("bloom_might_contain is SQL-callable with a base64-literal filter") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val docs = Seq("alpha", "beta", "gamma").toDF("g")
    val bits = graft.ops.TextAnalysis.benchmarkBloom(
      Seq("alpha beta gamma").toDF("text"), "text", 1, fpp = 1e-6)
    val b64 = java.util.Base64.getEncoder.encodeToString(bits)
    docs.createOrReplaceTempView("bloom_probe_docs")
    val hits = spark.sql(
      s"SELECT g FROM bloom_probe_docs WHERE bloom_might_contain(g, '$b64')")
      .as[String].collect().toSet
    assert(hits == Set("alpha", "beta", "gamma")) // no false negatives
    val misses = spark.sql(
      s"SELECT g FROM (SELECT 'zzz-not-present' AS g) WHERE bloom_might_contain(g, '$b64')")
      .count()
    assert(misses == 0L)
  }

  test("bloom probes with equal bytes are semantically equal (CSE-dedupable) " +
       "and the broadcast variant probes identically") {
    import spark.implicits._
    val bits = graft.ops.TextAnalysis.benchmarkBloom(
      Seq("alpha beta gamma").toDF("text"), "text", 1, fpp = 1e-6)
    // content equality: two expressions over COPIES of the same bytes
    // dedupe under semanticEquals — a bare Array[Byte] arg compares by
    // reference and never would
    val c = org.apache.spark.sql.functions.col("g")
    val e1 = org.apache.spark.sql.graftshim.ColumnShim.expression(
      VectorFunctions.bloomMightContain(c, bits.clone()))
    val e2 = org.apache.spark.sql.graftshim.ColumnShim.expression(
      VectorFunctions.bloomMightContain(c, bits.clone()))
    assert(e1.semanticEquals(e2), "equal filter bytes must be one subexpression")
    // broadcast path: same verdicts as the literal path
    val docs = Seq("alpha", "beta", "zzz-not-present").toDF("g")
    val bcast = spark.sparkContext.broadcast(bits)
    val lit = docs.filter(VectorFunctions.bloomMightContain(c, bits)).as[String].collect().toSet
    val bc = docs.filter(VectorFunctions.bloomMightContain(c, bcast)).as[String].collect().toSet
    assert(bc == lit && bc == Set("alpha", "beta"))
  }

  test("xxhash64(bigint) follows XXH64's single-8-byte-block closed form (the xxh64LongChain contract)") {
    // OracleHashSql.xxh64LongChain replays Spark's xxhash64 over a BIGINT
    // in DuckDB SQL. Its DuckDB side is value-checked per round by the
    // emb_ivf_drift oracle; THIS pin holds the Spark-side assumption the
    // chain was derived from — hash = fmix(rotl(seed+P5+8 ^ rotl(x·P2,31)·P1,
    // 27)·P1 + P4) — on boundary and ordinary values, so a Spark upgrade
    // that changed the long-hash path would fail HERE, not as a cryptic
    // oracle hash mismatch.
    import spark.implicits._
    val P1 = 0x9E3779B185EBCA87L; val P2 = 0xC2B2AE3D27D4EB4FL
    val P3 = 0x165667B19E3779F9L; val P4 = 0x85EBCA77C2B2AE63L
    val P5 = 0x27D4EB2F165667C5L
    def ref(x: Long, seed: Long = 42L): Long = {
      var h = seed + P5 + 8L
      h ^= java.lang.Long.rotateLeft(x * P2, 31) * P1
      h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
      h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
      h
    }
    val vals = Seq(0L, 1L, -1L, 42L, 123456789L, -987654321L,
      Long.MaxValue, Long.MinValue, 55L, 999L)
    val got = vals.toDF("v")
      .select(org.apache.spark.sql.functions.xxhash64($"v"))
      .as[Long].collect().toSeq
    assert(got == vals.map(ref(_)), "Spark's long-hash path diverged from the XXH64 closed form")
  }

  test("SparkSessionExtensions injection path builds") {
    // exercised structurally (a new session with extensions would need its
    // own JVM-level session; the injected builders are identical objects)
    val ext = new GraftExtensions
    assert(GraftFunctions.descriptors.map(_._1).toSet ==
      Set("vec_dot", "shingle_ngrams", "minhash_sig", "simhash64",
        "text_fingerprint", "sign_band_buckets", "bloom_might_contain",
        "hashed_bow",
        // round-15 ANN fold kernels (DESIGN §18)
        "vec_xor_popcount", "vec_dot_long", "vec_eq_count", "vec_l2sq",
        "vec_dot_plus", "vec_sub", "binarize_sign",
        // round-16 agg-grain sorted fold (DESIGN §19.1)
        "vec_sorted_sum"))
    assert(ext != null)
  }
}
