package graft

/** DuckDB-SQL replay of `TextAnalysis.bpeEncode` for a FIXED merge table —
  * the oracle for the `vocab_bpe_encode` / `docs_bpe_token_counts` queries.
  *
  * The encode's in-order semantics (one greedy left-to-right single pass
  * per merge rank — the trainer's own vocab-rewrite fold) is a finite fold
  * chain, so it unrolls into one CTE per rank: the word rides between
  * ranks as a chr(31)-joined piece string, and each rank's pass is one
  * `list_reduce` whose accumulator is that string — "merge" appends `r` to
  * the accumulator (the last piece was exactly `l`, checked via
  * `ends_with(acc, sep || l)` so a piece merely SUFFIXED by l cannot
  * false-match), "no merge" appends sep + x. `list_reduce` seeds the
  * accumulator with the first element, which is exactly the fold's initial
  * one-symbol state. Character split via `string_split(w, '')` — DuckDB
  * splits code points, matching the kernel's codePointAt loop.
  *
  * Precondition enforced IN the SQL via error() (the OracleHashSql
  * convention): no token may contain the chr(31) separator — a testdata
  * regeneration that introduces it fails loudly instead of
  * hash-mismatching. The learned-table form (`bpeMerges` output) stays
  * rows-only: its table is the product of an iterative driver loop no
  * single SQL statement can replay.
  */
object OracleBpeSql {

  private def sqlLit(s: String): String = s.replace("'", "''")

  /** The shared CTE chain as a composable FRAGMENT (no leading WITH):
    * `srcRel` → words → one fold CTE per merge → `<prefix>pieces(doc_id,
    * piece)`. `prefix` namespaces every CTE so the chain can sit beside
    * the unigram oracle's CTEs in one statement (docs_tokenizer_compare,
    * round 15); `srcRel` must expose (doc_id, text).
    */
  private[graft] def pieceCtesFragment(merges: Seq[(String, String)],
                                       srcRel: String = "documents",
                                       prefix: String = ""): String = {
    require(merges.nonEmpty, "bpe oracle: need at least one merge")
    val pf = prefix
    val folds = merges.zipWithIndex.map { case ((l, r), i) =>
      val (lq, rq) = (sqlLit(l), sqlLit(r))
      val src =
        if (i == 0) "string_split(w, '')"
        else "string_split(s, chr(31))"
      val from = if (i == 0) s"${pf}words" else s"${pf}wenc${i - 1}"
      s"""${pf}wenc$i AS (SELECT doc_id, list_reduce($src,
         |  (acc, x) -> CASE WHEN x = '$rq' AND (acc = '$lq' OR ends_with(acc, chr(31) || '$lq'))
         |              THEN acc || '$rq' ELSE acc || chr(31) || x END) AS s FROM $from)""".stripMargin
    }
    val last = s"${pf}wenc${merges.length - 1}"
    (Seq(
      raw"""${pf}tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM $srcRel)""",
      s"""${pf}words0 AS (SELECT doc_id, unnest(ts) AS w FROM ${pf}tk)""",
      s"""${pf}words AS (SELECT doc_id, CASE WHEN contains(w, chr(31))
        |  THEN error('bpe oracle: token contains the chr(31) separator') ELSE w END AS w
        |  FROM ${pf}words0 WHERE length(w) > 0)""".stripMargin,
    ) ++ folds :+
      s"${pf}pieces AS (SELECT doc_id, unnest(string_split(s, chr(31))) AS piece FROM $last)")
      .mkString(",\n")
  }

  /** The shared CTE chain: documents → words → one fold CTE per merge →
    * `pieces(doc_id, piece)`.
    */
  private def pieceCtes(merges: Seq[(String, String)]): String =
    "WITH " + pieceCtesFragment(merges)

  /** Corpus-wide piece census: (piece, freq) — the distinct piece set is
    * bounded by |alphabet| + |merges|, so the output is tiny at any SF.
    */
  def pieceCensusSql(merges: Seq[(String, String)]): String =
    s"""${pieceCtes(merges)}
       |SELECT piece, count(*) AS freq FROM pieces GROUP BY piece ORDER BY piece""".stripMargin

  /** Per-document EXACT token count under the fixed table; empty/
    * whitespace documents keep n_tokens = 0 (the operator's left-join
    * totality).
    */
  def tokenCountsSql(merges: Seq[(String, String)]): String =
    s"""${pieceCtes(merges)}
       |SELECT d.doc_id, CAST(COALESCE(c.n, 0) AS INT) AS n_tokens
       |FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS n FROM pieces GROUP BY doc_id) c
       |USING (doc_id) ORDER BY d.doc_id""".stripMargin

  /** Per-language fertility under the fixed table: pieces/word and
    * chars/piece over the same `pieces`/`words` relations the encode
    * oracle replays. Integer censuses + correctly-rounded IEEE double
    * divides, so the ratios are bit-identical to the Spark side.
    */
  def fertilitySql(merges: Seq[(String, String)]): String =
    s"""${pieceCtes(merges)},
       |pc AS (SELECT doc_id, count(*) AS np, sum(length(piece)) AS nc
       |       FROM pieces GROUP BY doc_id),
       |wc AS (SELECT doc_id, count(*) AS nw FROM words GROUP BY doc_id),
       |agg AS (SELECT d.lang,
       |  CAST(sum(COALESCE(pc.np, 0)) AS BIGINT) AS n_pieces,
       |  CAST(sum(COALESCE(wc.nw, 0)) AS BIGINT) AS n_words,
       |  CAST(sum(COALESCE(pc.nc, 0)) AS BIGINT) AS n_chars
       |  FROM documents d LEFT JOIN pc USING (doc_id) LEFT JOIN wc USING (doc_id)
       |  GROUP BY d.lang)
       |SELECT lang, n_pieces, n_words, n_chars,
       |  round(CAST(n_pieces AS DOUBLE) / greatest(n_words, 1), 4) AS fertility,
       |  round(CAST(n_chars AS DOUBLE) / greatest(n_pieces, 1), 4) AS chars_per_piece
       |FROM agg ORDER BY lang""".stripMargin

  /** Full replay of the TRAINING loop (`TextAnalysis.bpeMerges`) — the
    * query that sat rows-only for three rounds under the claim "an
    * iterative driver loop no single SQL statement can replay". The claim
    * was wrong: each round is census → argmax → refold, all relational,
    * and round k's learned pair enters round k+1 NOT as a literal but as
    * a one-row relation (`b{k}`) LEFT-JOINed in and referenced from
    * inside the fold lambda — so one statement chains `nMerges` rounds of
    * data-dependent rewrites. The two non-obvious requirements:
    *
    *  - every `v{k}`/`b{k}` is `AS MATERIALIZED`: DuckDB inlines plain
    *    CTEs, and each round references the previous one twice (census +
    *    refold), so inlining expands the chain 2^nMerges-fold — the
    *    20-round plain form exhausts the process fd limit before it ever
    *    runs;
    *  - `LEFT JOIN b{k} ON TRUE`, not CROSS JOIN: a round whose best
    *    pair misses `minPairFreq` yields an EMPTY b{k}, which must leave
    *    the vocab unchanged (and then every later round is empty too —
    *    the trainer's early-stop, reproduced relationally).
    *
    * Census semantics mirror the trainer exactly: weighted by distinct-
    * word count, overlapping adjacent pairs each counted, argmax ties
    * broken (freq DESC, left ASC, right ASC), refold = the same guarded
    * chr(31) string fold as the encode oracle. "left"/"right" are quoted
    * (reserved words in DuckDB).
    */
  def mergesSql(nMerges: Int, minPairFreq: Long = 2L): String = {
    require(nMerges >= 1, "bpe merges oracle: need at least one round")
    val head = Seq(
      raw"""tk AS (SELECT string_split_regex(trim(text), '\s+') AS ts FROM documents)""",
      """words0 AS (SELECT unnest(ts) AS w FROM tk)""",
      """wchk AS (SELECT CASE WHEN contains(w, chr(31))
        |  THEN error('bpe oracle: token contains the chr(31) separator') ELSE w END AS w
        |  FROM words0 WHERE length(w) > 0)""".stripMargin,
      """v0 AS MATERIALIZED (SELECT array_to_string(string_split(w, ''), chr(31)) AS s,
        |  count(*) AS cnt FROM wchk GROUP BY w)""".stripMargin)
    val rounds = (0 until nMerges).flatMap { k =>
      Seq(
        s"""p$k AS (SELECT l[i] AS lft, l[i+1] AS rgt, sum(cnt) AS freq
           |  FROM (SELECT string_split(s, chr(31)) AS l, cnt FROM v$k),
           |       unnest(generate_series(1, len(l)-1)) AS u(i)
           |  GROUP BY 1, 2)""".stripMargin,
        s"""b$k AS MATERIALIZED (SELECT lft, rgt, freq FROM p$k
           |  WHERE freq >= $minPairFreq
           |  ORDER BY freq DESC, lft ASC, rgt ASC LIMIT 1)""".stripMargin,
        s"""v${k + 1} AS MATERIALIZED (SELECT CASE WHEN b.lft IS NULL THEN v.s
           |  ELSE list_reduce(string_split(v.s, chr(31)),
           |    (acc, x) -> CASE WHEN x = b.rgt AND (acc = b.lft OR ends_with(acc, chr(31) || b.lft))
           |                THEN acc || b.rgt ELSE acc || chr(31) || x END) END AS s, v.cnt
           |  FROM v$k v LEFT JOIN b$k b ON TRUE)""".stripMargin)
    }
    val union = (0 until nMerges).map { k =>
      s"""SELECT CAST($k AS INT) AS rank, lft AS "left", rgt AS "right", CAST(freq AS BIGINT) AS pair_freq FROM b$k"""
    }.mkString("\nUNION ALL ")
    (head ++ rounds).mkString("WITH ", ",\n", "\n") + union + "\nORDER BY rank"
  }
}
