package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TextAnalysis partition: vocabulary induction and novelty — BPE
  * train/encode, symmetric-deletion edit-distance joins, and gram-novelty
  * attribution with its incremental seen-gram artifact.
  * See [[TextAnalysis]].
  */
trait TextVocab { self: TextAnalysis.type =>

  /** BPE merge-table induction — tokenizer TRAINING as a pipeline op
    * [Sennrich et al., "Neural Machine Translation of Rare Words with
    * Subword Units", ACL 2016 — the standard byte-pair-encoding trainer].
    * Spark-first cost split: the only corpus-scale work is ONE word-count
    * aggregation (the same shuffle shape as `topNGrams`); the merge loop
    * then runs over the WEIGHTED DISTINCT VOCAB — thousands of rows
    * regardless of corpus size, which is exactly how production BPE
    * trainers are structured. Each round counts adjacent symbol pairs
    * (weighted by word frequency), picks the most frequent (ties:
    * lexicographic (left, right) — fully deterministic), and rewrites the
    * vocab with a greedy left-to-right single-pass merge (an `aggregate`
    * HOF fold, no UDF). The driver holds one (l, r, freq) row per round
    * plus the ≤`nMerges`-row merge table — never the vocab.
    *
    * Returns (rank, left, right, pair_freq): the ordered merge table a
    * tokenizer applies at encode time. Stops early when no pair reaches
    * `minPairFreq`.
    */
  def bpeMerges(df: DataFrame, textCol: String, nMerges: Int,
                minPairFreq: Long = 2L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // corpus-scale phase: weighted distinct vocab, words split to chars
    // LAZY localCheckpoint (round 16): still truncates lineage so each
    // round folds over the LAST vocab, but materialization rides the
    // round's own best-pair job instead of paying a separate eager job —
    // one job per round instead of two (the round's collect() is always
    // the first action over the fresh checkpoint), and the FINAL round's
    // rewrite (whose vocab no consumer ever reads) is never computed at
    // all. Arithmetic unchanged: same vocab relation, same fold.
    var vocab = df
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(split(col("w"), "").as("syms"), col("cnt"))
      .localCheckpoint(false) // truncate: each round folds over the LAST vocab
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val best = vocab
        .select(explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      best.headOption.filter(_.getLong(2) >= minPairFreq) match {
        case None => done = true
        case Some(row) =>
          val (l, r, freq) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += ((rank, l, r, freq))
          // greedy left-to-right single-pass rewrite: a fresh merge result
          // does NOT immediately re-pair with the next symbol (standard
          // BPE semantics for one round); overlapping runs like "aaa"
          // therefore merge to [aa, a]
          vocab = vocab.select(
            aggregate(col("syms"), array().cast("array<string>"),
              (acc, s) =>
                // try_element_at: null (not an ANSI error) on the empty acc
                when(try_element_at(acc, lit(-1)) === lit(l) && s === lit(r),
                  concat(slice(acc, lit(1), size(acc) - 1),
                    array(lit(l + r))))
                  .otherwise(concat(acc, array(s)))).as("syms"),
            col("cnt"))
            .localCheckpoint(false)
          rank += 1
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_freq")
  }

  /** The per-word BPE encode kernel: apply an ORDERED merge table to one
    * word's code-point symbols, one greedy left-to-right single pass per
    * rank — EXACTLY the fold `bpeMerges` rewrites its vocab with, so
    * encoding a corpus with its own learned table reproduces the
    * trainer's final segmentation. This is Sennrich's original
    * apply-in-learned-order encode; the min-rank-present variant some
    * tokenizers use (repeatedly merge the lowest-rank pair PRESENT)
    * differs only when a merge creates a pair of strictly lower rank —
    * e.g. merges [(c,ab),(a,b)] on "cab": in-order yields [c, ab] (rank 0
    * runs before ab exists), min-rank-present yields [cab]. The in-order
    * form is the one a SQL oracle can replay as a finite fold chain
    * (spec-pinned divergence example in BpeEncodeSpec).
    *
    * Cost: a piece-count map lets a rank be skipped in O(1) when its left
    * or right piece is absent from the word, so a pass costs O(len) only
    * for ranks that can fire — O(M + fired·len) per word, not O(M·len).
    * Symbols are full code points (matches DuckDB's character split; on
    * the ASCII corpus these coincide with Java chars).
    */
  private[graft] def encodeWord(w: String,
                                merges: IndexedSeq[(String, String)]): Array[String] = {
    var syms = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      syms += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    if (syms.length <= 1) return syms.toArray
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    syms.foreach(s => counts.update(s, counts.getOrElse(s, 0) + 1))
    merges.foreach { case (l, r) =>
      val canFire =
        if (l == r) counts.getOrElse(l, 0) >= 2
        else counts.getOrElse(l, 0) >= 1 && counts.getOrElse(r, 0) >= 1
      if (canFire && syms.length >= 2) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        syms.foreach { s =>
          if (out.nonEmpty && out.last == l && s == r) {
            // merge: the fresh piece does NOT immediately re-pair with the
            // next symbol within this rank (out.last becomes l+r != l)
            out(out.length - 1) = l + r
            counts.update(l, counts(l) - 1)
            counts.update(r, counts(r) - 1)
            counts.update(l + r, counts.getOrElse(l + r, 0) + 1)
          } else out += s
        }
        syms = out
      }
    }
    syms.toArray
  }

  /** BPE encode — tokenizer APPLICATION as a pipeline op, the inverse
    * half of `bpeMerges` (tokenizer training): segment every document
    * with an ordered merge table and return the in-order piece array plus
    * the EXACT token count — what packing (`packBins`), budget selection
    * and context-length accounting need in place of the whitespace/regex
    * approximations.
    *
    * Spark-first cost split (the trainer's argument in reverse): the
    * merge loop runs over the DISTINCT WORD VOCAB — corpus-size-
    * independent — via one `mapPartitions` kernel with the merge table in
    * a broadcast (the word→pieces cache every production tokenizer keeps,
    * materialized as a relation); documents then re-acquire their words'
    * piece arrays through ONE equi-join on the word — merge-pinned since
    * round 15 (the vocab is corpus-derived and grows by Heaps' law, so
    * the build side never rides an AQE size estimate; CorpusJoinHintSpec
    * sweeps this mechanically). A hot stopword skews only the join INPUT
    * (each word row matches exactly one vocab row — no bucket blow-up).
    * Reassembly is one collect_list keyed by the data-scale doc id (one
    * document's word list per buffer — the packBins grain).
    *
    * Returns (idCol, enc_tokens array<string>, n_tokens int); documents
    * with no words (empty/whitespace text) keep an empty array.
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    require(merges.forall(m => m._1.nonEmpty && m._2.nonEmpty),
      "bpeEncode: merge sides must be non-empty")
    Seq("enc_tokens", "n_tokens").foreach(c => require(!df.columns.contains(c),
      s"bpeEncode emits '$c'; input must not contain it"))
    val spark = df.sparkSession
    val words = df
      .select(col(idCol).as("__id"),
        posexplode(tokens(col(textCol))).as(Seq("__wpos", "__w")))
      .filter(length(col("__w")) > 0)
    val vocab = words.select(col("__w")).distinct()
    val mergesB = spark.sparkContext.broadcast(merges.toIndexedSeq)
    val encSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__w",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("__pieces",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))))
    val enc = org.apache.spark.sql.Encoders.row(encSchema)
    // buffer-bound: O(1) — streaming row map over the word VOCAB (not the
    // corpus); the broadcast merge table is the only per-partition state
    val encoded = vocab.mapPartitions { rows =>
      val m = mergesB.value
      rows.map { r =>
        val w = r.getString(0)
        org.apache.spark.sql.Row(w, encodeWord(w, m).toSeq)
      }
    }(enc)
    // the encode's one corpus-scale exchange carries (id, pos, 8-byte
    // hash) — never the word string (the hashGrams rule, round-14: the
    // raw-string-grouped oracle makes a collision loud — a doc word
    // double-matching two colliding vocab rows inflates its piece list).
    // Round 15 (ADVICE): the collision is loud in PRODUCTION runs too —
    // the vocab side re-keys on the hash through a count-guarded
    // aggregate (vocab grain, the unigramScore pattern); assert_true
    // raises on any hash shared by two distinct words instead of
    // leaving detection to oracle-compared contexts only.
    val encByHash = encoded
      .groupBy(xxhash64(col("__w")).as("__wh"))
      .agg(count(lit(1)).as("__k"), first(col("__pieces")).as("__pieces"))
      .select(col("__wh"),
        when(assert_true(col("__k") === 1,
          lit("bpeEncode: xxhash64 collision across distinct words — the " +
            "8-byte exchange key is ambiguous for this vocab; widen the " +
            "key")).isNull, col("__pieces")).as("__pieces"))
    // merge-pinned (round-15 mechanical sweep, the unigramScore argument)
    val perDoc = words.select(col("__id"), col("__wpos"),
        xxhash64(col("__w")).as("__wh"))
      .join(encByHash.hint("merge"), "__wh")
      .groupBy(col("__id"))
      // buffer-bound: pieces of ONE document (document length)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__wpos"), col("__pieces")))),
        s => s.getField("__pieces"))).as("enc_tokens"))
      .withColumnRenamed("__id", idCol)
    df.select(col(idCol))
      .join(perDoc.hint("merge"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("enc_tokens"), array().cast("array<string>")).as("enc_tokens"))
      .withColumn("n_tokens", size(col("enc_tokens")))
  }

  /** All single-deletion variants of `w` as an array column — pure HOF
    * (transform over sequence + substr), no UDF.
    */
  private def del1(w: Column): Column =
    transform(sequence(lit(1), length(w)),
      p => concat(w.substr(lit(1), p - 1), w.substr(p + 1, length(w))))

  /** The ≤`maxEdit`-deletion neighborhood of `w` (including `w` itself),
    * distinct — the symmetric-deletion candidate key set.
    */
  private def delNeighborhood(w: Column, maxEdit: Int): Column = {
    val d1 = array_distinct(concat(array(w), del1(w)))
    if (maxEdit == 1) d1
    else array_distinct(flatten(transform(d1, v =>
      concat(array(v), transform(sequence(lit(1), length(v)),
        p => concat(v.substr(lit(1), p - 1), v.substr(p + 1, length(v))))))))
  }

  /** Edit-distance similarity self-join: all distinct-value pairs of
    * `strCol` within Levenshtein distance `maxEdit` (1 or 2) — typo/
    * variant detection over a label or word vocabulary (near-identical
    * source tags, OCR/typo word forms, entity aliases), the verification
    * join edit-distance dedup needs at scale.
    *
    * Scale design — symmetric-deletion candidate generation (the SymSpell
    * scheme, rediscoverable from the alignment argument): if
    * ED(a,b) ≤ k then deleting each aligned substitution/insertion
    * position leaves a COMMON string reachable by ≤ k deletions from
    * both sides. So each distinct value emits its ≤-k-deletion
    * neighborhood (×(len+1) rows for k=1, ×O(len²) for k=2 — linear in
    * vocab size either way), candidates are pairs sharing a variant —
    * an equi-join on the variant, never an all-pairs product — and a
    * per-pair Levenshtein verifies. The variant join is naturally
    * skew-bounded: a variant string v can only be reached from the
    * ≤ (|v|+1)·|Σ| + |v| + 1 strings within k=1 insert/substitute
    * range of v (alphabet-bounded, corpus-independent), so no hot-bucket
    * cap is needed — unlike LSH band buckets, bucket membership is
    * capped by construction. The whole op runs on the DISTINCT value
    * relation: corpus-grain rows never enter the join.
    *
    * `maxLen` drops over-long values before variant generation (the
    * per-value cost is O(len²)–O(len⁴); edit distance on unbounded
    * documents is the wrong tool — chunk or fingerprint those instead).
    * ASCII/BMP note: `length`/`substr`/`levenshtein` all count chars.
    *
    * Returns (w1, w2, dist) with w1 < w2, each pair once.
    */
  def editNeighbors(df: DataFrame, strCol: String, maxEdit: Int = 1,
                    maxLen: Int = 64): DataFrame = {
    require(maxEdit == 1 || maxEdit == 2,
      s"editNeighbors: maxEdit must be 1 or 2, got $maxEdit")
    // the distinct-value relation feeds BOTH sides of the self-join:
    // materialize once (DESIGN §8.1 two-consumer rule) or the corpus
    // scan + distinct aggregation run twice. The variant Generate still
    // runs per side, but over the cached vocab — no corpus re-scan.
    val vals = graft.Cleanup.register(
      df.select(col(strCol).as("__w"))
        .filter(length(col("__w")) > 0 && length(col("__w")) <= maxLen)
        .distinct()
        .localCheckpoint(false))
    val cand = vals.select(col("__w"),
      explode(delNeighborhood(col("__w"), maxEdit)).as("__v"))
    cand.as("a").join(cand.as("b"),
        col("a.__v") === col("b.__v") && col("a.__w") < col("b.__w"))
      .select(col("a.__w").as("w1"), col("b.__w").as("w2"))
      .distinct()
      .withColumn("dist", levenshtein(col("w1"), col("w2")))
      .filter(col("dist") <= maxEdit)
      .select(col("w1"), col("w2"), col("dist").cast("int").as("dist"))
  }

  /** The deletion-variant index of a reference dictionary, built once per
    * snapshot (the crossCorpusBuild seam convention): (__v variant,
    * __w reference value) over the reference's distinct values. Persist
    * as a table in production; probe it with `editNeighborsWith`. The
    * probe MUST use the same `maxEdit` the index was built with — the
    * completeness guarantee needs ≤k deletions on BOTH sides.
    */
  def editIndexBuild(reference: DataFrame, strCol: String, maxEdit: Int = 1,
                     maxLen: Int = 64): DataFrame = {
    require(maxEdit == 1 || maxEdit == 2,
      s"editIndexBuild: maxEdit must be 1 or 2, got $maxEdit")
    reference.select(col(strCol).as("__w"))
      .filter(length(col("__w")) > 0 && length(col("__w")) <= maxLen)
      .distinct()
      .select(col("__w"), explode(delNeighborhood(col("__w"), maxEdit)).as("__v"))
  }

  /** Cross-corpus edit-distance probe: each of `df`'s distinct values
    * paired with every reference-dictionary value within Levenshtein
    * `maxEdit` — "which incoming labels/words are typo-variants of known
    * ones", the spell-correction/alias-resolution production shape. The
    * join is stream-static safe (the index is a fixed relation; the probe
    * side is a projection + explode + equi-join), and dist = 0 rows mean
    * the value is already in the dictionary — callers keep or drop them.
    * Returns (w_new, w_ref, dist), each pair once.
    */
  def editNeighborsWith(df: DataFrame, index: DataFrame, strCol: String,
                        maxEdit: Int = 1, maxLen: Int = 64): DataFrame = {
    require(maxEdit == 1 || maxEdit == 2,
      s"editNeighborsWith: maxEdit must be 1 or 2, got $maxEdit")
    val cand = df.select(col(strCol).as("__wn"))
      .filter(length(col("__wn")) > 0 && length(col("__wn")) <= maxLen)
      .distinct()
      .select(col("__wn"), explode(delNeighborhood(col("__wn"), maxEdit)).as("__v"))
    cand.join(index, "__v")
      .select(col("__wn").as("w_new"), col("__w").as("w_ref")).distinct()
      .withColumn("dist", levenshtein(col("w_new"), col("w_ref")))
      .filter(col("dist") <= maxEdit)
      .select(col("w_new"), col("w_ref"), col("dist").cast("int").as("dist"))
  }

  /** Distinct (id, gram) relation shared by the novelty ops: word
    * `n`-gram shingles (the tfidfSimJoin construction — short docs yield
    * their single truncated gram, so every document owns ≥ 1 gram and
    * the ops are total without a corpus re-join). `hashGrams` swaps gram
    * strings for xxhash64 longs before any exchange — the production
    * keying; distinct-counts and min-id attribution are unchanged absent
    * a 64-bit collision.
    */
  private def docGrams(df: DataFrame, idCol: String, textCol: String,
                       n: Int, hashGrams: Boolean): DataFrame = {
    val grams = df
      .select(col(idCol).as("__id"),
        tokens(coalesce(col(textCol), lit(""))).as("__w"))
      .select(col("__id"), explode(transform(
        sequence(lit(1), greatest(size(col("__w")) - (n - 1), lit(1))),
        i => array_join(slice(col("__w"), i, lit(n)), " "))).as("__g"))
    (if (hashGrams) grams.select(col("__id"), xxhash64(col("__g")).as("__g"))
     else grams).distinct()
  }

  /** Gram-novelty attribution: how much genuinely-new n-gram content each
    * document contributes to the corpus, with first occurrence awarded to
    * the LOWEST id (at 100 TB the id is the crawl-order key — ingestion
    * timestamps compose the same way). The per-doc novelty ratio
    * n_novel/n_grams is the dedup-aware selection signal: boilerplate-
    * heavy documents score near 0 even when no single document duplicates
    * them outright (pairwise near-dup misses M-way shared fragments;
    * novelty charges each repeated gram to exactly one owner).
    *
    * Scale shape — two independent aggregation trees, no gram-side join:
    * distinct (id, gram) → (a) groupBy id = n_grams, (b) groupBy gram →
    * min(id) → groupBy that id = n_novel. Both finish at id-grain hash-
    * partitioned on the id, so the final combine join is exchange-free;
    * a viral gram costs one partial-min cell, never a bucket fan-out.
    *
    * Returns (idCol, n_grams, n_novel) — distinct grams in the doc, and
    * how many of them first appear there.
    */
  def gramNovelty(df: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, hashGrams: Boolean = false): DataFrame = {
    // both aggregation trees consume the distinct (id, gram) relation:
    // materialize it once (DESIGN §8.1) — without this the corpus is
    // tokenized and distinct-aggregated twice
    val dg = graft.Cleanup.register(
      docGrams(df, idCol, textCol, n, hashGrams).localCheckpoint(false))
    val nGrams = dg.groupBy(col("__id")).agg(count(lit(1)).as("n_grams"))
    val nNovel = dg.groupBy(col("__g")).agg(min(col("__id")).as("__id"))
      .groupBy(col("__id")).agg(count(lit(1)).as("n_novel"))
    // merge-hinted (containmentPairs round-14 rule): both sides are
    // doc-grain corpus relations; the hint also preserves the
    // exchange-free co-partitioned combine the scaladoc describes
    nGrams.join(nNovel.hint("merge"), Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
  }

  /** The seen-gram artifact for incremental novelty: the reference
    * corpus' distinct gram keys, written once per snapshot (the
    * crossCorpusBuild convention — Dedup.scala). Persist `hashGrams =
    * true` in production: the artifact is then 8 bytes per distinct gram.
    */
  def noveltyBuild(reference: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, hashGrams: Boolean = false): DataFrame =
    docGrams(reference, idCol, textCol, n, hashGrams)
      .select(col("__g")).distinct()

  /** Incremental gram novelty: novelty of a NEW batch against a prior
    * seen-gram artifact — a gram is novel only if it is absent from the
    * artifact AND first-within-batch. Folding ordered batches through
    * this (artifact grown by each batch's grams) reproduces the one-shot
    * `gramNovelty` of the union exactly (spec-pinned): min-id attribution
    * distributes over batches when ids are batch-monotone. The artifact
    * probe is a left-anti join on the gram key — stream-static safe, no
    * state beyond the artifact itself.
    */
  def gramNoveltyWith(batch: DataFrame, seen: DataFrame, idCol: String,
                      textCol: String, n: Int = 3,
                      hashGrams: Boolean = false): DataFrame = {
    val dgRaw = docGrams(batch, idCol, textCol, n, hashGrams)
    // two consumers (DESIGN §8.1); skip the checkpoint only for a
    // streaming micro-batch driver that materializes per batch anyway
    val dg = if (batch.isStreaming) dgRaw
      else graft.Cleanup.register(dgRaw.localCheckpoint(false))
    val nGrams = dg.groupBy(col("__id")).agg(count(lit(1)).as("n_grams"))
    // the seen-gram artifact scales with the whole prior corpus (8 bytes
    // x 10^10 grams at target scale) — the textbook broadcast-build OOM;
    // merge-hinted like every corpus-derived build side (round-14 rule)
    val nNovel = dg.join(seen.select(col("__g")).hint("merge"), Seq("__g"), "left_anti")
      .groupBy(col("__g")).agg(min(col("__id")).as("__id"))
      .groupBy(col("__id")).agg(count(lit(1)).as("n_novel"))
    nGrams.join(nNovel.hint("merge"), Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
  }
}
