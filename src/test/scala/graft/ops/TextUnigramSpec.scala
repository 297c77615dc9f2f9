package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer (TextAnalysis.unigramTrain/unigramEncode): the
  * integer log algorithm's exactness, the Viterbi kernel's semantics
  * (argmax, tie rule, OOV totality, reconstruction), and the trained
  * artifact's determinism under repartitioning. Engine parity of the
  * whole trajectory is the DuckDB oracle's job (vocab_unigram_train /
  * vocab_unigram_encode hash compare); these pin the pieces a hash
  * can't localize.
  */
class TextUnigramSpec extends AnyFunSuite {
  import graft.TestSpark.{spark, sf0001}
  private val T = TextAnalysis

  test("ilog2fp: exact anchors, monotonicity, and the 2^-16 error bound") {
    assert(T.ilog2fp(1, 1) == 0L)
    assert(T.ilog2fp(1, 2) == -65536L)
    assert(T.ilog2fp(1, 4) == -131072L)
    assert(T.ilog2fp(3, 4) == -27200L) // floor-ish of 65536*log2(0.75) = -27199.9
    // within 3 fixed-point units of exact log2 across a sweep (one
    // truncation per squaring step), and non-decreasing in a
    for (b <- Seq(7L, 100L, 12345L, 1L << 40)) {
      var prev = Long.MinValue
      for (a <- Seq(1L, 2L, 3L, b / 3 max 1, b / 2 max 1, b - 1 max 1, b)
             .distinct.sorted) {
        val fp = T.ilog2fp(a, b)
        val exact = math.log(a.toDouble / b) / math.log(2.0) * 65536.0
        assert(math.abs(fp - exact) <= 3.0, s"ilog2fp($a,$b)=$fp vs $exact")
        assert(fp >= prev, s"monotonicity broke at ($a,$b)")
        prev = fp
      }
    }
    intercept[IllegalArgumentException](T.ilog2fp(0, 1))
    intercept[IllegalArgumentException](T.ilog2fp(2, 1))
    intercept[IllegalArgumentException](T.ilog2fp(1, 1L << 46))
  }

  test("viterbiWord: argmax segmentation, longer-piece tie rule, OOV totality, exact reconstruction") {
    val sc = Map[String, Long]("a" -> -10L, "b" -> -20L, "t" -> -30L,
      "c" -> -40L, "h" -> -50L, "ba" -> -15L, "at" -> -18L, "ch" -> -22L,
      "batc" -> -5L)
    // dp by hand: batc(4) at -5 then h at -50 beats ba+at+ch (-55 vs -15-18-22)
    assert(T.viterbiWord("batch", sc, 4).toSeq == Seq("batc", "h"))
    // tie rule: "aa" with a=-10, aa=-20 ties single-chars vs the bigram
    // (-20 both ways) — the LONGER piece wins
    assert(T.viterbiWord("aa", sc ++ Map("aa" -> -20L), 4).toSeq == Seq("aa"))
    // OOV chars segment as single floor-scored pieces — total, never null
    assert(T.viterbiWord("zzq", sc, 4).toSeq == Seq("z", "z", "q"))
    // reconstruction: pieces always concatenate back to the word
    for (w <- Seq("batch", "a", "zz", "chchch", "batcbatc"))
      assert(T.viterbiWord(w, sc, 4).mkString == w)
    assert(T.viterbiWord("", sc, 4).isEmpty)
  }

  test("unigramTrain: deterministic artifact, repartition-invariant, counts conserve piece mass") {
    val docs = graft.Tables.read(spark, sf0001, "documents")
    val m1 = T.unigramTrain(docs, "text", vocabK = 50, pieceLen = 3, rounds = 2)
    val m2 = T.unigramTrain(docs.repartition(7), "text", vocabK = 50, pieceLen = 3, rounds = 2)
    assert(m1.pieces == m2.pieces, "trained artifact must not depend on partitioning")
    // inventory contains every observed single char, so encode is total
    val chars = docs.select(explode(split(col("text"), "")).as("c"))
      .filter(col("c") =!= " " && length(col("c")) === 1)
    // usage mass: sum over pieces of n_uses * piece length == total
    // non-whitespace word chars (Viterbi covers every word exactly once)
    val pieceChars = m1.pieces.map { case (p, n, _) => p.length.toLong * n }.sum
    val wordChars = docs
      .select(explode(T.tokens(col("text"))).as("w")).filter(length(col("w")) > 0)
      .agg(sum(length(col("w")))).head().getLong(0)
    assert(pieceChars == wordChars,
      s"piece mass $pieceChars must equal word-char mass $wordChars")
    graft.Cleanup.drain()
  }

  test("unigramEncode: totality on empty docs; n_tokens bounded by chars and words") {
    val docs = graft.Tables.read(spark, sf0001, "documents")
    val m = T.unigramTrain(docs, "text", vocabK = 50, pieceLen = 3, rounds = 1)
    val enc = T.unigramEncode(docs, "doc_id", "text", m)
    val rows = enc.collect()
    assert(rows.length == docs.count())
    val byId = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val words = docs.select(col("doc_id"),
        size(filter(T.tokens(col("text")), w => length(w) > 0)).as("nw"),
        length(regexp_replace(col("text"), "\\s+", "")).as("nc"))
      .collect()
    words.foreach { r =>
      val (id, nw, nc) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val nt = byId(id)
      assert(nt >= nw && nt <= nc,
        s"doc $id: n_tokens $nt outside [words=$nw, chars=$nc]")
    }
    graft.Cleanup.drain()
  }

  test("unigramEncodeByRow == unigramEncode on a static frame (the twin parity pin)") {
    val docs = graft.Tables.read(spark, sf0001, "documents")
    val m = T.unigramTrain(docs, "text", vocabK = 50, pieceLen = 3, rounds = 1)
    val batch = T.unigramEncode(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byRow = T.unigramEncodeByRow(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch == byRow,
      "the stateless per-row twin must reproduce the vocab-amortized batch encode exactly")
    graft.Cleanup.drain()
  }

  test("unigramEncodeByRow runs on a streaming frame and matches the batch counts") {
    import spark.implicits._
    val docs = graft.Tables.read(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).limit(50).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    val m = T.unigramTrain(graft.Tables.read(spark, sf0001, "documents"),
      "text", vocabK = 50, pieceLen = 3, rounds = 1)
    val expected = docs.map { case (id, t) =>
      val n =
        if (t == null) 0L
        else t.trim.split("\\s+").filter(_.nonEmpty)
          .map(w => T.viterbiWord(w, m.scores, m.pieceLen).length.toLong).sum
      id -> n
    }.toMap
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    mem.addData(docs.toSeq: _*)
    val streamed = T.unigramEncodeByRow(
      mem.toDF.toDF("doc_id", "text"), "doc_id", "text", m)
    val q = streamed.writeStream.format("memory").queryName("uni_stream")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("uni_stream").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "streaming per-row encode must match the kernel counts")
    graft.Cleanup.drain()
  }

  test("UnigramMaxLen guard fires loudly on an over-long word") {
    import spark.implicits._
    val df = Seq((1L, "ok " + "x" * (T.UnigramMaxLen + 1))).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      T.unigramTrain(df, "text", vocabK = 5, pieceLen = 3, rounds = 1))
    assert(e.getMessage.contains("UnigramMaxLen"))
    graft.Cleanup.drain()
  }
}
