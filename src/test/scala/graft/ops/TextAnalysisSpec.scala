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
}
