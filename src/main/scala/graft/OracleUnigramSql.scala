package graft

/** DuckDB-SQL replay of `TextAnalysis.unigramTrain` / `unigramEncode` —
  * the oracles for the `vocab_unigram_train` / `vocab_unigram_encode`
  * queries. One statement replays the WHOLE hard-EM trainer: substring
  * seeding, every round's fixed-point scores → per-word Viterbi → usage
  * census, and the final encode.
  *
  * Three engine-exactness mechanisms, all integer:
  *
  *  - [[ilog2fp]] replay: the piece score floor(2¹⁶·log₂((c+1)/T)) is an
  *    integer algorithm — k from a power-of-two comparison census
  *    (`list_filter` against a literal 2⁰..2⁴⁷ table: no floating log,
  *    no shift operator portability concerns), mantissa from one HUGEINT
  *    multiply/divide, 16 fraction bits from a squaring fold whose only
  *    operations are multiply, integer divide and compare. Identical to
  *    the Scala trainer's BigInt/Long arithmetic bit for bit.
  *
  *  - RELATIONAL Viterbi, not lambda-state Viterbi: the per-word DP is
  *    one chained CTE per END POSITION (d{r}x0..d{r}xMAXLEN — the
  *    `OracleBpeSql.mergesSql` chain pattern), each position an
  *    edge-join against the ≤`pieceLen` predecessor positions and a
  *    `max(struct(b, l, pth))` argmax whose lexicographic struct order
  *    IS the kernel's (score, longer-piece) tie rule; the piece path
  *    rides as a chr(31)-joined string. This shape is deliberate:
  *    DuckDB v1.0.0's `list_reduce` mis-correlates outer-column
  *    references inside lambdas across vectorized rows (measured:
  *    row A's fold reading row B's string), so the DP uses only joins,
  *    group-bys and struct max — the well-trodden relational core. The
  *    path string's third position in the struct never decides a tie:
  *    equal (b, l) at one position implies the identical predecessor
  *    path by induction (each position stores exactly one winner).
  *
  *  - Loud preconditions IN the SQL (the OracleHashSql convention):
  *    words longer than MAXLEN or containing the chr(31) separator, and
  *    totals at the 2⁴⁶ ilog2p domain bound, fail with error() instead
  *    of hash-mismatching.
  */
object OracleUnigramSql {

  /** DP chain length AND the pre-chunk boundary (round 14): tokens
    * longer than this are split at MaxLen-char boundaries before the
    * census — `substr(w, i, MaxLen)` for i = 1, 1+MaxLen, … on both
    * engines, the identical arithmetic `chunkedWords` applies. Rendered
    * from the OPERATOR'S constant (the enMarkers single-source rule) so
    * the two sides can only move together.
    */
  val MaxLen: Int = graft.ops.TextAnalysis.UnigramMaxLen

  private def pw2: String =
    (0 to 47).map(x => (BigInt(1) << x).toString).mkString("[", ", ", "]")

  /** sc{r}(p, s) from inv{r-1}(p, c): the exact fixed-point log2 chain.
    * The k census is RELATIONAL (a join against the unnested
    * power-of-two table, not a list_filter lambda) for the same reason
    * the DP is: the v1.0.0 lambda mis-correlation applies to lambdas
    * referencing PER-ROW outer columns, and `c` varies per row. The one
    * lambda that remains — the 16-step mantissa-squaring fold below —
    * is exempt by the documented rule: it reads only its accumulator
    * and literals, never a per-row column.
    */
  private def scoreCtes(r: Int): String =
    s"""t$r AS (SELECT CASE WHEN sum(c) + count(*) >= 70368744177664
       |    THEN error('unigram oracle: total exceeds the 2^46 ilog2 bound')
       |    ELSE sum(c) + count(*) END AS tt FROM inv${r - 1}),
       |k$r AS (SELECT i.p, i.c + 1 AS a, t.tt AS b,
       |  sum(CASE WHEN CAST(i.c + 1 AS HUGEINT) * w.v < CAST(t.tt AS HUGEINT) THEN 1 ELSE 0 END) AS k
       |  FROM inv${r - 1} i, t$r t, pwx w GROUP BY 1, 2, 3),
       |m$r AS (SELECT p, k, (CAST(a AS HUGEINT) * pw.p2[CAST(k AS INT) + 1] * 1073741824) // CAST(b AS HUGEINT) AS m0 FROM k$r, pw),
       |sc$r AS MATERIALIZED (SELECT p, -65536 * k + list_reduce(
       |    list_prepend({'m': m0, 'f': CAST(0 AS BIGINT)},
       |      list_transform(range(16), x -> {'m': CAST(0 AS HUGEINT), 'f': CAST(0 AS BIGINT)})),
       |    (acc, e) -> CASE WHEN (acc.m * acc.m) // 1073741824 >= 2147483648
       |      THEN {'m': (acc.m * acc.m) // 2147483648, 'f': acc.f * 2 + 1}
       |      ELSE {'m': (acc.m * acc.m) // 1073741824, 'f': acc.f * 2} END).f AS s
       |  FROM m$r)""".stripMargin

  /** sg{r}(w, cnt, ps) from sc{r} + words: edge relation, the
    * position-chained DP, and the path split.
    */
  private def dpCtes(r: Int, pieceLen: Int, floor: Long): String = {
    val ed =
      s"""ed$r AS MATERIALIZED (SELECT c.w, c.i, c.l,
         |    CASE WHEN c.l = 1 THEN coalesce(s.s, $floor) ELSE s.s END AS es
         |  FROM (SELECT w, CAST(i AS INT) AS i, CAST(l AS INT) AS l,
         |          substr(w, CAST(i - l + 1 AS INT), CAST(l AS INT)) AS p
         |        FROM words, unnest(generate_series(1, length(w))) u(i),
         |             unnest(generate_series(1, least($pieceLen, i))) v(l)) c
         |  LEFT JOIN sc$r s USING (p)
         |  WHERE c.l = 1 OR s.s IS NOT NULL)""".stripMargin
    val d0 = s"d${r}x0 AS (SELECT w, CAST(0 AS BIGINT) AS b, '' AS pth FROM words)"
    val chain = (1 to MaxLen).map { i =>
      val prevs = (math.max(0, i - pieceLen) until i)
        .map(j => s"SELECT w, b, pth, $j AS j FROM d${r}x$j")
        .mkString(" UNION ALL ")
      s"""d${r}x$i AS MATERIALIZED (SELECT w, (mx).b AS b, (mx).pth AS pth FROM (
         |  SELECT e.w, max({'b': pv.b + e.es, 'l': e.l,
         |      'pth': pv.pth || chr(31) || substr(e.w, CAST(e.i - e.l + 1 AS INT), CAST(e.l AS INT))}) AS mx
         |  FROM ed$r e JOIN ($prevs) pv ON pv.w = e.w AND e.l = e.i - pv.j
         |  WHERE e.i = $i
         |  GROUP BY e.w))""".stripMargin
    }
    val fins = (1 to MaxLen)
      .map(i => s"SELECT w, pth, $i AS i FROM d${r}x$i").mkString(" UNION ALL ")
    val sg =
      s"""sg$r AS MATERIALIZED (SELECT wo.w, wo.cnt,
         |    string_split(substr(pv.pth, 2), chr(31)) AS ps
         |  FROM ($fins) pv JOIN words wo ON wo.w = pv.w AND length(wo.w) = pv.i)""".stripMargin
    (Seq(ed, d0) ++ chain :+ sg).mkString(",\n")
  }

  /** inv{r}(p, c) from sg{r}: the weighted usage census, hard-EM
    * re-estimation over inv{r-1}'s piece set (unused pieces drop to 0),
    * then the round-14 PRUNE — singles always survive, multi-char pieces
    * keep the top `vocabK` by (count desc, piece asc): the exact
    * deterministic order `unigramTrain`'s prune applies (count order IS
    * smoothed-score order under the shared total).
    */
  private def usageCtes(r: Int, vocabK: Int): String =
    s"""us$r AS (SELECT piece AS p, sum(cnt) AS c FROM (SELECT unnest(ps) AS piece, cnt FROM sg$r) GROUP BY 1),
       |re$r AS (SELECT i.p, coalesce(u.c, 0) AS c FROM inv${r - 1} i LEFT JOIN us$r u USING (p)),
       |inv$r AS MATERIALIZED (
       |  SELECT p, c FROM re$r WHERE length(p) = 1
       |  UNION ALL
       |  SELECT p, c FROM (SELECT p, c FROM re$r WHERE length(p) > 1 ORDER BY c DESC, p ASC LIMIT $vocabK))""".stripMargin

  /** Shared head: the augmented corpus (`augText` is a SQL expression
    * over `documents` columns — the planted-long-token rule, rendered by
    * the caller from the same constants the Spark query plants with),
    * token pre-chunking at MaxLen boundaries (round 14 — replaces the
    * over-long-word abort; the chr(31) separator guard stays), the
    * chunk census, the substring seed census, and the inventory seeded
    * at `seedK` multi-char pieces (pruned to vocabK per round).
    */
  private def headCtes(seedK: Int, pieceLen: Int,
                       augText: String): String =
    raw"""WITH pw AS (SELECT $pw2 AS p2),
         |pwx AS (SELECT p2[CAST(x AS INT) + 1] AS v FROM pw, unnest(range(48)) t(x)),
         |aug AS (SELECT doc_id, $augText AS text FROM documents),
         |tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM aug),
         |allw0 AS (SELECT doc_id, unnest(ts) AS w FROM tk),
         |allw AS (SELECT a.doc_id, substr(a.w, CAST(u.i AS INT), $MaxLen) AS w
         |  FROM allw0 a, unnest(generate_series(1, length(a.w), $MaxLen)) u(i)
         |  WHERE length(a.w) > 0),
         |words AS MATERIALIZED (SELECT CASE
         |    WHEN contains(w, chr(31)) THEN error('unigram oracle: token contains the chr(31) separator')
         |    ELSE w END AS w, count(*) AS cnt
         |  FROM allw GROUP BY w),
         |sub AS (SELECT substr(w, CAST(i AS INT), CAST(l AS INT)) AS p, sum(cnt) AS c FROM words,
         |  unnest(generate_series(1, length(w))) u(i),
         |  unnest(generate_series(1, least($pieceLen, length(w) - i + 1))) v(l)
         |  GROUP BY 1),
         |inv0 AS MATERIALIZED (
         |  SELECT p, c FROM sub WHERE length(p) = 1
         |  UNION ALL
         |  SELECT p, c FROM (SELECT p, c FROM sub WHERE length(p) > 1 ORDER BY c DESC, p ASC LIMIT $seedK))""".stripMargin

  private def roundCtes(rounds: Int, vocabK: Int, pieceLen: Int,
                        floor: Long): String =
    (1 to rounds).map(r =>
      scoreCtes(r) + ",\n" + dpCtes(r, pieceLen, floor) + ",\n" +
        usageCtes(r, vocabK)
    ).mkString(",\n")

  /** Oracle for `vocab_unigram_train`: the full inventory after `rounds`
    * hard-EM+prune rounds — final usage counts and the add-one-smoothed
    * fixed-point scores an encoder would apply.
    */
  def trainSql(vocabK: Int, pieceLen: Int, rounds: Int, floor: Long,
               seedK: Int, augText: String = "text"): String =
    s"""${headCtes(seedK, pieceLen, augText)},
       |${roundCtes(rounds, vocabK, pieceLen, floor)},
       |${scoreCtes(rounds + 1)}
       |SELECT i.p AS piece, CAST(i.c AS BIGINT) AS n_uses, CAST(s.s AS BIGINT) AS score_fp
       |FROM inv$rounds i JOIN sc${rounds + 1} s USING (p) ORDER BY piece""".stripMargin

  /** Oracle for `vocab_unigram_encode`: per-document exact piece count
    * under the final model — one more Viterbi pass (round `rounds`+1,
    * the encode) joined back to the doc-grain chunk stream; tokenless
    * documents keep n_tokens = 0.
    */
  def encodeSql(vocabK: Int, pieceLen: Int, rounds: Int, floor: Long,
                seedK: Int, augText: String = "text"): String =
    s"""${headCtes(seedK, pieceLen, augText)},
       |${roundCtes(rounds, vocabK, pieceLen, floor)},
       |${scoreCtes(rounds + 1)},
       |${dpCtes(rounds + 1, pieceLen, floor)},
       |wl AS (SELECT w, len(ps) AS np FROM sg${rounds + 1})
       |SELECT d.doc_id, CAST(coalesce(s.n, 0) AS BIGINT) AS n_tokens
       |FROM documents d LEFT JOIN (
       |  SELECT doc_id, sum(np) AS n FROM allw a JOIN wl USING (w)
       |  GROUP BY doc_id) s
       |USING (doc_id) ORDER BY d.doc_id""".stripMargin

  /** Oracle for `docs_unigram_bits` (round 14): the encode chain plus
    * the per-document surprisal — Σ piece score over the Viterbi pieces
    * (OOV single chars take the encode floor, matching the kernel's
    * getOrElse), negated into non-negative 2⁻¹⁶-bit units, and the
    * integer bits-per-token (positive//positive, so DuckDB's floor
    * division and Spark's truncating DIV agree).
    */
  def bitsSql(vocabK: Int, pieceLen: Int, rounds: Int, floor: Long,
              seedK: Int, augText: String = "text"): String =
    s"""${bitsCtes(vocabK, pieceLen, rounds, floor, seedK, augText)}
       |SELECT d.doc_id, CAST(coalesce(t.n, 0) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(-t.ss, 0) AS BIGINT) AS bits_fp,
       |  CAST(CASE WHEN t.n > 0 THEN (-t.ss) // t.n END AS BIGINT) AS bpt_fp
       |FROM documents d LEFT JOIN udoc t
       |USING (doc_id) ORDER BY d.doc_id""".stripMargin

  /** The bits chain as a composable prefix (round 15, for
    * docs_tokenizer_compare): everything bitsSql needs, WITH included,
    * ending in `udoc(doc_id, n, ss)` — per-document unigram piece count
    * and summed Viterbi piece score — plus the `aug`/`tk` head CTEs a
    * downstream composition can reuse.
    */
  private[graft] def bitsCtes(vocabK: Int, pieceLen: Int, rounds: Int,
                              floor: Long, seedK: Int,
                              augText: String = "text"): String =
    s"""${headCtes(seedK, pieceLen, augText)},
       |${roundCtes(rounds, vocabK, pieceLen, floor)},
       |${scoreCtes(rounds + 1)},
       |${dpCtes(rounds + 1, pieceLen, floor)},
       |wsc AS (SELECT q.w, count(*) AS np, sum(coalesce(s.s, $floor)) AS ss
       |  FROM (SELECT w, unnest(ps) AS piece FROM sg${rounds + 1}) q
       |  LEFT JOIN sc${rounds + 1} s ON s.p = q.piece GROUP BY q.w),
       |udoc AS (SELECT doc_id, sum(np) AS n, sum(ss) AS ss FROM allw a JOIN wsc USING (w)
       |  GROUP BY doc_id)""".stripMargin
}
