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
}
