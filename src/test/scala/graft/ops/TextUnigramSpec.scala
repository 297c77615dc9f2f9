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

  test("over-long tokens pre-chunk at UnigramMaxLen boundaries: train and " +
       "both encodes succeed and the twins stay in parity") {
    import spark.implicits._
    // one pathological 37-char token (a URL-ish identifier) next to
    // natural words — round 13 aborted here; round 14 chunks [16][16][5]
    val long = "httpzexamplezorgzpathzsegmentz123456z"
    assert(long.length == 37 && long.length > T.UnigramMaxLen)
    val df = Seq((1L, s"ok $long ok"), (2L, "plain words only"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val m = T.unigramTrain(df, "text", vocabK = 8, pieceLen = 3, rounds = 2)
    // chunking is invisible to the inventory contract: piece mass still
    // equals the total word-char mass (chunks partition each word)
    val pieceChars = m.pieces.map { case (p, n, _) => p.length.toLong * n }.sum
    assert(pieceChars == ("ok" + long + "ok" + "plain" + "words" + "only").length)
    val batch = T.unigramEncode(df, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byRow = T.unigramEncodeByRow(df, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch == byRow,
      "twin parity must hold exactly where chunking fires, not just on natural words")
    assert(batch(3L) == 0L && batch(1L) >= 3L + 2L,
      s"doc 1 has >= 3 chunks + 2 'ok' words: $batch")
    graft.Cleanup.drain()
  }

  test("per-round prune keeps all singles plus exactly vocabK multi pieces " +
       "by (count desc, piece asc); pruned pieces never re-enter") {
    import spark.implicits._
    // 6 distinct bigram-rich words — the multi-substring pool is far
    // above vocabK = 3, so the prune does real work every round
    val df = Seq((1L, "abcd abce abcf xyzq xyzr wvut abcd abcd xyzq"))
      .toDF("doc_id", "text")
    val m = T.unigramTrain(df, "text", vocabK = 3, pieceLen = 3, rounds = 2,
      seedK = 12)
    val multi = m.pieces.filter(_._1.length > 1)
    val singles = m.pieces.filter(_._1.length == 1).map(_._1).toSet
    assert(multi.size == 3, s"multi inventory must prune to vocabK=3: $multi")
    // every observed char survives (totality)
    assert("abcdefxyzqrwvut".forall(c => singles.contains(c.toString)))
    // survivors are the top-3 by final usage, ties by piece asc — recompute
    // the order from the emitted counts and demand the set matches
    val ordered = multi.sortBy { case (p, c, _) => (-c, p) }
    assert(ordered == multi.sortBy(p => (-p._2, p._1)))
    graft.Cleanup.drain()
  }

  test("unigramScore: bits_fp foots to the piece scores; a garbage doc " +
       "scores more bits per token than modal text") {
    import spark.implicits._
    // train on repetitive modal text; score a modal doc against a
    // character-salad doc of the SAME alphabet (no OOV involved)
    val train = (0 until 20).map(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val m = T.unigramTrain(train, "text", vocabK = 20, pieceLen = 3, rounds = 2)
    val probe = Seq((100L, "the cat sat"), (101L, "tac eht tas"),
      (102L, "")).toDF("doc_id", "text")
    val rows = T.unigramScore(probe, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val byId = rows.map(r => r._1 -> r).toMap
    // driver replay: bits = -sum of the kernel's own piece scores
    def bits(text: String): Long =
      -text.split(" ").filter(_.nonEmpty).flatMap(w =>
        T.viterbiWord(w, m.scores, m.pieceLen)).map(p =>
        m.scores.getOrElse(p, T.UnigramOovScore)).sum
    assert(byId(100L)._3 == bits("the cat sat"))
    assert(byId(101L)._3 == bits("tac eht tas"))
    assert(byId(102L) == ((102L, 0L, 0L)), "tokenless doc: zero tokens, zero bits")
    // the ordering pin: same characters, scrambled words — the model must
    // find the salad more surprising PER TOKEN than its own modal text
    val bpt100 = byId(100L)._3.toDouble / byId(100L)._2
    val bpt101 = byId(101L)._3.toDouble / byId(101L)._2
    assert(bpt101 > bpt100,
      s"garbage must cost more bits/token: modal $bpt100 vs salad $bpt101")
    graft.Cleanup.drain()
  }

  test("docs_tokenizer_compare is discriminative: BPE and unigram disagree " +
       "on fertility somewhere on the planted corpus") {
    val rows = graft.SparkEntry.queries("docs_tokenizer_compare")(
      graft.TestSpark.spark, graft.TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    def d(r: org.apache.spark.sql.Row, c: String): Double =
      r.getDouble(r.fieldIndex(c))
    assert(rows.exists(r => d(r, "bpe_fertility") != d(r, "uni_fertility")),
      s"the report must separate the tokenizers, got: ${rows.mkString("; ")}")
    // and the unigram side carries a real surprisal signal
    assert(rows.forall(r => r.getLong(r.fieldIndex("uni_bits_fp")) > 0L))
    graft.Cleanup.drain()
  }

  test("non-ASCII guard: batch chunker AND byRow kernel raise loudly on " +
       "the first non-ASCII token (the ASCII note is enforced, not assumed)") {
    import spark.implicits._
    val ascii = Seq((1L, "plain ascii words only")).toDF("doc_id", "text")
    val m = T.unigramTrain(ascii, "text", vocabK = 10, pieceLen = 3, rounds = 1)
    val dirty = Seq((1L, "fine"), (2L, "café token")).toDF("doc_id", "text")
    // batch path: the in-plan assert_true surfaces wrapped in SparkException
    val eBatch = intercept[Exception] {
      T.unigramScore(dirty, "doc_id", "text", m).collect()
    }
    def rootMsg(e: Throwable): String = {
      var t = e; while (t.getCause != null) t = t.getCause
      Option(t.getMessage).getOrElse("") + Option(e.getMessage).getOrElse("")
    }
    assert(rootMsg(eBatch).contains("non-ASCII"),
      s"batch guard must name the violation: ${rootMsg(eBatch)}")
    // byRow twin: same guard, kernel form
    val eRow = intercept[Exception] {
      T.unigramEncodeByRow(dirty, "doc_id", "text", m).collect()
    }
    assert(rootMsg(eRow).contains("non-ASCII"),
      s"byRow guard must name the violation: ${rootMsg(eRow)}")
    // and clean ASCII still flows through both paths unchanged
    val clean = Seq((1L, "fine words")).toDF("doc_id", "text")
    assert(T.unigramScore(clean, "doc_id", "text", m).count() == 1)
    assert(T.unigramEncodeByRow(clean, "doc_id", "text", m).count() == 1)
    graft.Cleanup.drain()
  }
}
