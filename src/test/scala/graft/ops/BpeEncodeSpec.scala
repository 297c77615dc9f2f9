package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `TextAnalysis.bpeEncode` — tokenizer application. Pins:
  *  - the kernel against a naive reference fold (no skip optimization) on
  *    random words/merge tables, so the piece-count skip map can never
  *    change results;
  *  - hand-computed chained-merge examples (merged pieces as left sides);
  *  - round-trip: concatenating pieces reproduces the word;
  *  - the documented in-order vs min-rank-present divergence example;
  *  - the operator end-to-end on the corpus: per-doc counts are
  *    consistent with exploded pieces, empty docs keep empty arrays, and
  *    encoding with the corpus' own LEARNED table (`bpeMerges`) leaves no
  *    learned pair mergeable by a FULL in-order re-application.
  */
class BpeEncodeSpec extends AnyFunSuite {
  import graft.TestSpark.{spark, sf0001}

  private val fixed = IndexedSeq(
    ("t", "h"), ("th", "e"), ("s", "t"), ("e", "r"), ("st", "r"), ("a", "m"),
    ("l", "l"), ("a", "ll"), ("j", "o"), ("jo", "i"), ("joi", "n"))

  /** Reference fold: in-order, one greedy left-to-right pass per rank —
    * no skip map, no mutation tricks.
    */
  private def refEncode(w: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = w.map(_.toString)
    merges.foreach { case (l, r) =>
      syms = syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == l && s == r)
          acc.init :+ (l + r)
        else acc :+ s
      }
    }
    syms
  }

  test("kernel matches the naive reference fold on random words and tables") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcd"
    (1 to 300).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(12))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      // random table over short pieces — high collision odds on "abcd"
      val merges = (1 to (1 + rnd.nextInt(6))).map { _ =>
        val p = (1 to (1 + rnd.nextInt(2))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        val q = (1 to (1 + rnd.nextInt(2))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        (p, q)
      }.toIndexedSeq
      assert(TextAnalysis.encodeWord(w, merges).toSeq === refEncode(w, merges),
        s"word=$w merges=$merges")
    }
  }

  test("chained merges: merged pieces act as later left sides") {
    assert(TextAnalysis.encodeWord("the", fixed).toSeq === Seq("the"))
    assert(TextAnalysis.encodeWord("stream", fixed).toSeq === Seq("str", "e", "am"))
    assert(TextAnalysis.encodeWord("small", fixed).toSeq === Seq("s", "m", "all"))
    assert(TextAnalysis.encodeWord("join", fixed).toSeq === Seq("join"))
    assert(TextAnalysis.encodeWord("batch", fixed).toSeq === Seq("b", "a", "t", "c", "h"))
    // greedy single pass: a fresh merge result does not re-pair within
    // its own rank — runs of a's pair left-to-right
    val aa = IndexedSeq(("a", "a"))
    assert(TextAnalysis.encodeWord("aaa", aa).toSeq === Seq("aa", "a"))
    assert(TextAnalysis.encodeWord("aaaa", aa).toSeq === Seq("aa", "aa"))
  }

  test("round-trip: piece concatenation reproduces the word") {
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(15))).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
      assert(TextAnalysis.encodeWord(w, fixed).mkString("") === w)
    }
  }

  test("documented divergence: in-order skips a later-created lower rank") {
    // merges [(c,ab),(a,b)] on "cab": rank 0 runs before "ab" exists, so
    // in-order yields [c, ab]; the min-rank-present variant would revisit
    // rank 0 and yield [cab]. The in-order form is the trainer's own fold
    // and the one a finite SQL chain can replay (kernel scaladoc).
    assert(TextAnalysis.encodeWord("cab", IndexedSeq(("c", "ab"), ("a", "b"))).toSeq
      === Seq("c", "ab"))
    // swapped order merges fully
    assert(TextAnalysis.encodeWord("cab", IndexedSeq(("a", "b"), ("c", "ab"))).toSeq
      === Seq("cab"))
  }

  test("operator end-to-end: counts consistent, empty docs kept, order preserved") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the stream small join"),
      (2L, ""),
      (3L, "   "),
      (4L, "join the"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs, "doc_id", "text", fixed)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    val encs = out.map(_.getSeq[String](1).toSeq)
    assert(encs(0) === Seq("the", "str", "e", "am", "s", "m", "all", "join"),
      "word order must survive the reassembly sort")
    assert(encs(1) === Seq.empty && encs(2) === Seq.empty)
    assert(encs(3) === Seq("join", "the"))
    assert(out.map(_.getInt(2)).toSeq === Seq(8, 0, 0, 2))
  }

  test("learned-table encode reproduces the trainer's own rewrite sequence") {
    val docs = graft.Tables.read(spark, sf0001, "documents")
    val learned = TextAnalysis.bpeMerges(docs, "text", 20)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toIndexedSeq
    assert(learned.nonEmpty)
    val words = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .select("w").distinct().as[String](org.apache.spark.sql.Encoders.STRING)
      .collect()
    assert(words.nonEmpty)
    // the trainer rewrites its vocab with exactly this in-order fold as
    // each merge is learned, so refEncode(w, learned) IS the trainer's
    // final segmentation of w — the kernel must reproduce it on every
    // real corpus word, and piece concatenation must round-trip
    words.foreach { w =>
      val once = TextAnalysis.encodeWord(w, learned)
      assert(once.toSeq === refEncode(w, learned), s"word=$w")
      assert(once.mkString("") === w)
    }
  }
}
