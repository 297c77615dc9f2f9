package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dedup partition: duplicate clustering (star-contraction connected components), keeper canonicalization, the cluster-assignment artifact and impact report, and SimHash pigeonhole near-dups.
  * See [[Dedup]].
  */
trait DedupCluster { self: Dedup.type =>

  /** Duplicate clusters from near-dup PAIRS: connected components over the
    * pair graph, labeling every id with its component representative
    * (the minimum id reachable through any chain of near-dup links). Pair
    * detection alone can't drive "keep one copy" — near-dup is not
    * transitive, so A~B and B~C must collapse into ONE cluster {A,B,C}
    * even when A~C was never emitted.
    *
    * Algorithm: alternating large-star/small-star rounds [Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", 2014] — each round
    * rewrites the edge set with pure DataFrame joins/aggregations:
    *
    *   large-star: every node u links its LARGER neighbors to
    *     m(u) = min(Γ(u) ∪ {u});
    *   small-star: every node u links its smaller neighbors and itself to
    *     the min of its smaller neighborhood.
    *
    * Both steps preserve connectivity; the fixpoint is a disjoint union of
    * stars centered at component minima, reached in O(log n) rounds EVEN
    * FOR ONE GIANT COMPONENT (a diameter-d path halves its diameter per
    * round — plain min-label propagation needs O(d) rounds, which at 100 TB
    * turns one adversarial chain into thousands of shuffles; spec-pinned on
    * a 10k-node path). Per round the driver holds only a (count, hashsum)
    * convergence checksum; `localCheckpoint` truncates lineage and each
    * superseded round's blocks are freed eagerly.
    *
    * @param pairs (id_a, id_b) near-dup pairs (e.g. minHashNearDups)
    * @param ids   one row per document id — singletons label themselves
    * @return (id, cluster_rep); cluster_rep == id for non-duplicates
    */
  def duplicateClusters(pairs: DataFrame, ids: DataFrame, idCol: String): DataFrame =
    duplicateClustersWithRounds(pairs, ids, idCol)._1

  /** `duplicateClusters` + the number of star rounds it took to converge —
    * the spec suite pins the O(log n) bound on adversarial long chains.
    */
  def duplicateClustersWithRounds(pairs: DataFrame, ids: DataFrame,
                                  idCol: String): (DataFrame, Int) = {
    // canonical undirected edge set: (hi, lo) with hi > lo, deduped
    var edges = pairs
      .select(greatest(col("id_a"), col("id_b")).as("hi"),
        least(col("id_a"), col("id_b")).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct()
      .localCheckpoint(false)
    // one aggregation drives BOTH checkpoint materialization and the
    // convergence test: the canonical edge set is stable iff (count,
    // xor of per-edge hashes) is stable — a 64-bit content checksum
    // (bit_xor: order-insensitive, can't overflow under ANSI arithmetic,
    // and the edge set is distinct so nothing self-cancels). A checksum
    // match is then CONFIRMED with one exact set-difference join on the
    // final round only (equal counts + empty one-sided except ⇒ equal
    // sets, both sides distinct) — so a hash collision can cost an extra
    // round but can never declare a false fixpoint, and the exact join
    // runs ~once per clustering, not per round.
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(hi, lo))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = checksum(edges)
    var rounds = 0
    // count == 0 IS the emptiness test — the checksum job already
    // materialized the checkpoint, so a separate isEmpty job (which on a
    // lazy localCheckpoint forces full materialization anyway) is a pure
    // extra scheduling round-trip (round 17)
    var stable = sig._1 == 0L
    while (!stable) {
      rounds += 1
      require(rounds <= 100, s"duplicateClusters: no fixpoint after $rounds star rounds")
      // ---- large-star: for each u, link neighbors v > u to min(Γ(u) ∪ {u})
      val nbrs = edges.select(col("lo").as("u"), col("hi").as("v"))
        .union(edges.select(col("hi").as("u"), col("lo").as("v")))
      val mins = nbrs.groupBy(col("u")).agg(least(min(col("v")), first(col("u"))).as("m"))
      // m ≤ u < v, so emitted (v, m) is already canonical (hi > lo).
      // NOT distinct'd (round 17): nbrs is one row per edge direction and
      // the v > u filter keeps exactly one per edge, so ls is at most
      // |edges| rows; duplicates (two u's mapping one v to the same m)
      // change neither sMins' min nor the round's result set — `next`
      // ends in distinct() — and dropping the intermediate distinct
      // removes one full exchange + aggregate per star round.
      val ls = nbrs.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
      // ---- small-star: for each hi, link itself and its smaller
      //      neighbors to the min of those neighbors
      val sMins = ls.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val withM = ls.join(sMins, Seq("hi"))
      val next = withM.select(col("hi"), col("m").as("lo"))
        .union(withM.filter(col("lo") =!= col("m"))
          .select(col("lo").as("hi"), col("m").as("lo")))
        .distinct()
        .localCheckpoint(false)
      val nextSig = checksum(next)
      stable = nextSig == sig && next.except(edges).isEmpty
      edges.unpersist() // superseded round's blocks freed NOW, not at GC
      edges = next
      sig = nextSig
    }
    // fixpoint = min-centered stars: every non-representative id appears in
    // exactly one (id, rep) edge; singletons and representatives label
    // themselves via the left join
    val reps = edges.select(col("hi").as("id"), col("lo").as("rep"))
    // merge-pinned (round 17, the containmentPairs rule): reps is one row
    // per non-representative member of a duplicate cluster — corpus-scale
    // on a duplicate-heavy corpus — and must never ride an AQE broadcast
    // estimate; the labels join runs once per artifact build
    val labels = ids.select(col(idCol).as("id"))
      .join(reps.hint("merge"), Seq("id"), "left")
      .select(col("id"), coalesce(col("rep"), col("id")).as("rep"))
    (labels, rounds)
  }

  /** Canonicalization — the step after clustering: pick ONE keeper per
    * duplicate cluster, the highest-scoring member with ties broken to the
    * smallest id (fully deterministic under any partitioning). A single
    * hash aggregation with `max_by` over the (score, −id) order key:
    * partial aggregation runs map-side, so the exchange carries at most
    * one candidate per (cluster × input partition) — never the raw
    * membership — which is why this beats a row_number window (full
    * per-cluster sort) at 100 TB.
    *
    * @param clusters (id, rep) labels from [[duplicateClusters]]
    * @param scored   idCol + scoreCol, one row per id (e.g. quality score)
    */
  def keepBest(clusters: DataFrame, scored: DataFrame,
               idCol: String, scoreCol: String): DataFrame =
    clusters
      .join(scored.select(col(idCol).as("id"), col(scoreCol)), "id")
      .groupBy(col("rep"))
      .agg(
        max_by(struct(col("id"), col(scoreCol)),
          struct(col(scoreCol), negate(col("id")))).as("__k"),
        count(lit(1)).as("cluster_size"))
      .select(col("rep").as("cluster_rep"),
        col("__k.id").as("keeper_id"),
        col(s"__k.$scoreCol").as("keeper_score"),
        col("cluster_size"))

  /** Build the duplicate-cluster assignment artifact — MinHash LSH
    * candidates verified by exact Jaccard, then connected components —
    * in ONE pass, as the dedup analogue of [[graft.ops.Similarity.ivfBuild]].
    * The (id, rep) assignment is the expensive once-per-corpus half of
    * dedup; every downstream consumer ([[clusterSizeHistogram]],
    * [[keepBest]], cluster listings, per-cluster sampling) is a cheap
    * aggregation over it. At 100 TB the build job writes this table to
    * parquet and consumers read it — nobody recomputes connected
    * components per report.
    */
  def clusterBuild(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                   threshold: Double = 0.5): DataFrame =
    duplicateClusters(
      minHashNearDups(docs, idCol, textCol, shingleN, bands, rowsPerBand, threshold),
      docs, idCol)

  /** Dedup impact report over a built cluster assignment: how much of the
    * corpus sits in singletons vs k-way duplicate clusters. Two hash
    * aggregations (assignment → per-rep size → size histogram), both with
    * map-side partials; output is ≤ max-cluster-size rows.
    */
  def clusterSizeHistogram(assign: DataFrame): DataFrame =
    assign.groupBy(col("rep")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))

  /** SimHash (64-bit) of the token multiset: per-bit vote of token hashes —
    * native expression (graft.functions.SimHash64), one pass over tokens.
    */
  def simHash(text: Column): Column =
    graft.functions.VectorFunctions.simHash64(tokens(text))

  /** SimHash near-dup pairs via the pigeonhole principle: split the 64-bit
    * hash into `maxHamming + 1` chunks — hamming ≤ maxHamming GUARANTEES at
    * least one chunk is equal, so recall is exact (not probabilistic). Join
    * per chunk (linear self-joins on small fixed-width keys), then exact
    * hamming filter with `bit_count`.
    */
  def simHashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val nChunks = maxHamming + 1
    val bitsPer = (64 + nChunks - 1) / nChunks
    val mask = (1L << bitsPer) - 1
    val withSim = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sim"))
    val chunks = withSim.select(
      col("id"), col("sim"),
      explode(
        transform(sequence(lit(0), lit(nChunks - 1)),
          c => struct(c.as("chunk"), call_function("shiftright", col("sim"), (c * bitsPer).cast("int")).bitwiseAND(lit(mask)).as("ck")))
      ).as("cc"),
    ).select(col("id"), col("sim"), col("cc.chunk"), col("cc.ck"))
    val l = chunks.select(col("chunk"), col("ck"), col("id").as("id_a"), col("sim").as("sim_a"))
    val r = chunks.select(col("chunk"), col("ck"), col("id").as("id_b"), col("sim").as("sim_b"))
    l.join(r.hint("merge"), Seq("chunk", "ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
