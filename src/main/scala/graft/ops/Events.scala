package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the `events` table (SURVEY §2.3): tumbling
  * windows, sessionization, JSON extraction, watermarked streaming
  * variants. Batch forms are oracle-checkable; streaming forms reuse the
  * same expressions behind `withWatermark`.
  *
  * Scale notes: window aggregation shuffles once on (window, key) with
  * partial aggregation map-side; sessionization uses `session_window`
  * (streaming-capable) — the batch oracle reproduces it with the classic
  * gaps-and-islands construction (lag + cumulative sum), which shuffles
  * once on user_id.
  */
object Events {

  /** Row shapes for `ewmaByUser`'s O(1)-state ordered partition scan.
    * `value` is Option so a null measurement deserializes (and
    * propagates through the fold) instead of NPE-ing the task. The
    * timestamp is deliberately NOT in the row: the sort needs it, the
    * fold never reads it, and the Project that drops it between the
    * sort and the deserialize is order-preserving. (Measured neutral at
    * the 20M-event probe — the scan is exchange/sort-bound, not
    * deserialization-bound — so this is row hygiene, not a speedup.)
    */
  final case class EwmaScanRow(user_id: Long, event_id: Long, value: Option[Double])
  final case class EwmaScanOut(user_id: Long, n_events: Long, ewma: Option[Double])

  /** Tumbling-window aggregate; window start emitted as epoch seconds so
    * result comparison is timezone/format-proof.
    */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Session windows per user with a max gap: one row per (user, session)
    * with bounds and event count. Uses Spark's native session_window (the
    * same construct works under `withWatermark` in streaming).
    */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("session_start"),
        unix_timestamp(col("w.end")).as("session_end"),
        col("n_events"))

  /** JSON extraction from the `props` string column (the reference never
    * parses payloads — SURVEY §2.2 notes this gap explicitly; here JSON is
    * a first-class citizen via get_json_object/from_json).
    */
  def propsK(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))

  /** Streaming variant of `tumbling` with a watermark for late data. */
  def tumblingStream(events: DataFrame, width: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** Sessionized conversion funnel: one row per (user, session) with
    * whether a `view` STRICTLY preceded a `purchase` inside the session —
    * the behavioral-analytics pattern (did the sequence happen, in order,
    * within the engagement window) built from session_window + conditional
    * aggregates: no self-join, no per-event state, one shuffle on the
    * session key. Emitted as int 0/1 for byte-stable oracle comparison.
    */
  def sessionFunnel(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("fv"),
        max(when(col("event_type") === "purchase", col("ts"))).as("lp"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("session_start"),
        (col("fv").isNotNull && col("lp").isNotNull && col("fv") < col("lp"))
          .cast("int").as("converted"),
        col("n_events"))

  /** Per-user event context via lag/lead: previous and next event type and
    * the gap (seconds) since the previous event — the offset-window-function
    * surface (lag, lead) with deterministic (ts, event_id) ordering. One
    * shuffle on user_id; integer gap arithmetic so the oracle compare is
    * exact.
    */
  def neighborContext(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(
      col("user_id"), col("event_id"),
      lag(col("event_type"), 1).over(w).as("prev_type"),
      lead(col("event_type"), 1).over(w).as("next_type"),
      (unix_timestamp(col("ts")) - lag(unix_timestamp(col("ts")), 1).over(w))
        .as("gap_secs"))
  }

  /** SCD2 / change-data-capture compaction: collapse each key's event
    * stream into attribute-validity intervals — one row per maximal run of
    * consecutive equal attribute values, with half-open [valid_from,
    * valid_to) bounds in epoch seconds (valid_to = -1 marks the run that
    * is still current). The classic gaps-and-islands construction: a lag
    * marks change points, a running sum numbers the runs, one aggregate
    * collapses them, and a lead over the per-key RUN relation closes each
    * interval with its successor's start. Turning an append-only change
    * log into the dimension table a warehouse joins against is the
    * batch-compaction half of CDC ingestion.
    *
    * Scale shape: both raw-event windows (lag, running sum) and the
    * shuffle are keyed on the data-scale entity key; the lead that closes
    * intervals runs over the AGGREGATED runs relation (bounded per key by
    * the run count, plan-visible to the sweep via its Aggregate input).
    * One shuffle total — the change-flag, run-number, and aggregate
    * stages all share the (key) hash partitioning, so Catalyst plans a
    * single exchange. Ordering within a key is (ts, seqCol): the sequence
    * column breaks equal-timestamp ties deterministically, which is what
    * makes the compaction — and its oracle — reproducible.
    */
  def scd2Compact(events: DataFrame, keyCol: String = "user_id",
                  attrCol: String = "event_type", tsCol: String = "ts",
                  seqCol: String = "event_id"): DataFrame = {
    // same guard prioritySampleBuild/packBins apply, scoped to the names
    // that are actually clobbered. The internal working columns are
    // overwritten by withColumn regardless of role, so NO input column may
    // carry them (a tsCol named "__chg" would be silently replaced before
    // the window reads it). The output names only collide with columns
    // that SURVIVE the aggregation — keyCol/attrCol; tsCol and seqCol are
    // consumed before those aliases exist and may legitimately carry them
    // (e.g. re-compacting a table whose timestamp is already "valid_from").
    for (c <- Seq("__chg", "__run"))
      require(!events.columns.contains(c),
        s"scd2Compact reserves column name '$c'; rename it in the input")
    for (c <- Seq("seq", "valid_from", "valid_to", "n_events"))
      require(c != keyCol && c != attrCol,
        s"scd2Compact emits output column '$c'; keyCol/attrCol may not use that name")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    val chg = when(lag(col(attrCol), 1).over(w).isNull ||
      lag(col(attrCol), 1).over(w) =!= col(attrCol), 1).otherwise(0)
    val runs = events
      .withColumn("__chg", chg)
      .withColumn("__run", sum(col("__chg")).over(w))
      .groupBy(col(keyCol), col("__run"), col(attrCol))
      .agg(min(unix_timestamp(col(tsCol))).as("valid_from"),
        count(lit(1)).as("n_events"))
    val wr = Window.partitionBy(col(keyCol)).orderBy(col("__run"))
    runs
      .select(col(keyCol), col("__run").as("seq"), col(attrCol),
        col("valid_from"),
        coalesce(lead(col("valid_from"), 1).over(wr), lit(-1L)).as("valid_to"),
        col("n_events"))
  }

  /** Conversion attribution — first-touch and last-touch in one pass: for
    * every conversion event, the earliest and latest touch event by the
    * same user within the lookback window ending at the conversion
    * (touch at the conversion's own timestamp counts — "at or before").
    * The standard marketing-attribution models, and the general
    * "which upstream interaction explains this outcome" join that event
    * pipelines otherwise hand-roll badly as a per-conversion subquery.
    *
    * Shape: NO conversion×touch join — one RANGE-frame window over the
    * unified per-user event stream (the `slidingValueSum` surface) carries
    * a conditional running extremum of struct(ts, event_id); conversions
    * filter afterwards. One hashpartitioning(user_id) exchange total, and
    * the frame is time-bounded so state per row is the lookback's touches.
    * Struct extrema order lexicographically in BOTH engines, so ties at
    * one timestamp break deterministically (first → smaller event_id,
    * last → larger) and the whole output hash-compares. Conversions with
    * no touch in window emit -1s (the scd2 open-run convention).
    */
  def attribution(events: DataFrame, convType: String, touchTypes: Seq[String],
                  lookbackSecs: Long = 86400L): DataFrame = {
    for (c <- Seq("__first", "__last"))
      require(!events.columns.contains(c),
        s"attribution reserves column name '$c'; rename it in the input")
    val tsS = unix_timestamp(col("ts"))
    val isTouch = col("event_type").isin(touchTypes: _*)
    val w = Window.partitionBy(col("user_id")).orderBy(tsS)
      .rangeBetween(-lookbackSecs, 0)
    val touchKey = when(isTouch, struct(tsS.as("t"), col("event_id").as("id")))
    events
      // both extrema in ONE projection: separate withColumns analyze to
      // two Window nodes (fresh _w exprIds defeat CollapseWindow) and the
      // partition frames get walked twice — plan-checked to a single node
      .select(col("*"),
        min(touchKey).over(w).as("__first"),
        max(touchKey).over(w).as("__last"))
      .filter(col("event_type") === convType)
      .select(col("event_id").as("conv_id"), col("user_id"),
        tsS.as("conv_ts_s"),
        coalesce(col("__first.id"), lit(-1L)).as("first_touch_id"),
        coalesce(col("__first.t"), lit(-1L)).as("first_touch_ts_s"),
        coalesce(col("__last.id"), lit(-1L)).as("last_touch_id"),
        coalesce(col("__last.t"), lit(-1L)).as("last_touch_ts_s"))
  }

  /** Per-user sliding 1-hour value sum — the RANGE-frame window surface
    * (logical offsets over event time, NOT row counts: all peers at the
    * same timestamp join the frame, so the result is tie-order
    * independent). Values summed as integer cents — a sliding double sum
    * is evaluated in engine-specific order (segment trees vs running
    * accumulation) and can't be hash-compared; cents are exact.
    */
  def slidingValueSum(events: DataFrame, windowSecs: Long = 3600L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(unix_timestamp(col("ts")))
      .rangeBetween(-windowSecs, 0)
    events
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select(col("user_id"), col("event_id"),
        sum(col("cents")).over(w).as("cents_1h"))
  }

  /** Earliest ordered-sequence match per user — the MATCH_RECOGNIZE-style
    * pattern surface (PATTERN (A B C ...) with strictly-increasing event
    * time, earliest-completion semantics): for each user, the first chain
    * of events of the given types where each occurs strictly after the
    * previous stage's match. Greedy stage-wise minima are optimal for
    * existence — taking the earliest feasible event at every stage never
    * excludes a later completion — so the result equals full
    * MATCH_RECOGNIZE `AFTER MATCH SKIP` first-match semantics without
    * per-event NFA state.
    *
    * Execution shape: one filtered aggregation + equi-join per stage, all
    * keyed on the user — at 100 TB that is k small shuffles over the
    * (user, stage-min) relation (one row per user after stage 1), never a
    * self-join of the raw event log; the event scan is touched once per
    * stage with the type filter pushed down. Timestamps emitted as epoch
    * seconds (`t_0..t_{k-1}`) for exact oracle comparison.
    */
  def earliestSequence(events: DataFrame, types: Seq[String],
                       userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(types.nonEmpty, "earliestSequence: empty pattern")
    val first = events.filter(col("event_type") === types.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__m0"))
    val matched = types.zipWithIndex.drop(1).foldLeft(first) { case (prev, (tp, i)) =>
      events.filter(col("event_type") === tp)
        .select(col(userCol), col(tsCol))
        .join(prev, userCol)
        .filter(col(tsCol) > col(s"__m${i - 1}"))
        .groupBy(col(userCol) +: (0 until i).map(j => col(s"__m$j")): _*)
        .agg(min(col(tsCol)).as(s"__m$i"))
    }
    matched.select(
      col(userCol) +: types.indices.map(i =>
        unix_timestamp(col(s"__m$i")).as(s"t_$i")): _*)
  }

  /** Day-grain cohort retention: users are assigned to the cohort of their
    * first active day; for each (cohort day, day offset k ≤ maxDays) the
    * number of cohort users active k days later. The product-analytics
    * retention matrix as two aggregations:
    *
    *   distinct (user, day) → per-user window-min day (cohort) → count per (cohort, k)
    *
    * Scale shape: the cohort is a window MIN over the distinct day
    * relation, not a join back to a second aggregate — the event log is
    * scanned ONCE (the aggregate-then-join form re-scans it for the cohort
    * side; plan-audited), and the window operates on the already-tiny
    * (user, day) relation. The final aggregation's key space is bounded by
    * days² — tiny at any corpus size.
    */
  def cohortRetention(events: DataFrame, maxDays: Int = 7): DataFrame = {
    val days = events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val cohort = min(col("day")).over(Window.partitionBy(col("user_id")))
    days
      .select(unix_timestamp(cohort).as("cohort_day"),
        datediff(col("day"), cohort).as("k"))
      .filter(col("k") <= maxDays)
      .groupBy(col("cohort_day"), col("k"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-type value outliers by z-score, computed from EXACT integer
    * moments: values become cents (round(x·100) as long), and per type the
    * count, Σcents and Σcents² are all exact integer sums — order-proof,
    * one pass, mergeable (the textbook single-pass moments trick). Mean and
    * variance then derive from those three exact scalars in a pinned
    * expression order, so the resulting z-scores are bit-identical in any
    * engine that parses the same formula — a naive avg()/stddev() over
    * doubles would be summation-order noise and could never hash-compare.
    *
    * Scale shape: one partial+final aggregation over the fact scan (5
    * groups), stats broadcast back — the fact table is scanned twice but
    * never shuffled. Σcents² stays within long for |value| ≤ ~1e5 up to
    * ~1e8 rows per group; beyond that lift the moments to DECIMAL(38,0).
    */
  def anomalyZScores(events: DataFrame, zThreshold: Double = 2.5): DataFrame = {
    val cents = events.select(col("event_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    val stats = cents.groupBy(col("event_type")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("cents")).cast("double").as("s"),
      sum(col("cents") * col("cents")).cast("double").as("q"))
    val z = (col("cents").cast("double") - col("s") / col("n")) /
      sqrt(col("q") / col("n") - (col("s") / col("n")) * (col("s") / col("n")))
    cents.join(broadcast(stats), "event_type")
      .filter(abs(z) >= zThreshold)
      .select(col("event_id"), col("event_type"), round(z, 4).as("z_r"))
  }

  /** Per-user exponentially weighted moving average of `value` in event
    * time — the standard smoothing a metrics/reputation pipeline keeps
    * per entity (recent behavior dominates, old behavior decays
    * geometrically) with α restricted to DYADIC rationals
    * (num / 2^k, e.g. the default 1/4): the decay multiply is then an
    * exact IEEE operation, and because the fold is evaluated in ONE
    * pinned order (events sorted (ts, event_id), the repo's event total
    * order; update form s ← s + (x − s)·α, seed s = first value —
    * DuckDB's seedless `list_reduce` convention) every intermediate
    * double is bit-identical across engines and the 4-dp output
    * hash-oracles. The deliberate contrast with `anomalyZScores`'s
    * order-free integer-cent sums: a sequential recurrence cannot be
    * made order-independent, so determinism comes from PINNING the
    * order instead (the `docs_rrf_hybrid` index-order-fold rule).
    *
    * Scale shape: ONE hash exchange on user_id (every user's events land
    * wholly in one partition), a within-partition sort on (user_id, ts,
    * event_id), then a streaming per-partition scan that folds each
    * user's run with O(1) state — current user, running s, running n —
    * emitting at user boundaries. This replaced a round-11
    * `sort_array(collect_list(...))` form whose aggregation buffer held
    * a user's ENTIRE history (the repo's one unbounded order-dependent
    * buffer, round-11 verdict): a bot account with 10⁸ events would OOM
    * the task. A declarative aggregate cannot fix it — the fold is
    * associative-but-not-commutative (affine-map composition), and
    * Spark merges partial aggregation buffers in nondeterministic order
    * — so this is the mandate's genuine per-partition-imperative case.
    * The scan evaluates the IDENTICAL sequence of IEEE ops on the same
    * doubles in the same order as the old fold (JVM `a + (x - a) *
    * alpha` with no fma contraction == Catalyst's codegen of the same
    * expression), so the DuckDB list_reduce oracle is unchanged and the
    * 4-dp output hashes stay green. The streaming twin is
    * `StatefulOps.streamingEwma` (running state = one (ewma, n) pair
    * per user; batch-parity spec-pinned).
    */
  def ewmaByUser(events: DataFrame, alphaNum: Int = 1, alphaDen: Int = 4): DataFrame = {
    require(alphaDen >= 2 && (alphaDen & (alphaDen - 1)) == 0,
      s"ewmaByUser: alphaDen must be a power of two (exact IEEE decay): $alphaDen")
    require(alphaNum >= 1 && alphaNum < alphaDen,
      s"ewmaByUser: need 1 <= alphaNum < alphaDen: $alphaNum/$alphaDen")
    val alpha = alphaNum.toDouble / alphaDen
    val spark = events.sparkSession
    import spark.implicits._
    val scanned = events
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_id").cast("long").as("event_id"),
        col("value").cast("double").as("value"))
      // loud total-order precondition: the scan's case-class encoder
      // would otherwise NPE opaquely on a null key — name the rule
      // instead (the merge-guard raise_error discipline)
      .withColumn("user_id",
        when(col("user_id").isNotNull && col("ts").isNotNull &&
            col("event_id").isNotNull, col("user_id"))
          .otherwise(raise_error(lit("ewmaByUser: user_id/ts/event_id must " +
            "be non-null — they form the (ts, event_id) per-user total " +
            "order the recurrence folds in"))))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      // drop ts AFTER the sort: an order-preserving Project, so the scan
      // still sees each user's run in (ts, event_id) order without
      // deserializing a Timestamp object per row
      .select(col("user_id"), col("event_id"), col("value"))
      .as[EwmaScanRow]
      // buffer-bound: O(1) scan state per user run — the ewma recurrence
      // registers (s, n) plus one lookahead row; no history is held
      .mapPartitions { rows =>
        val it = rows.buffered
        new Iterator[EwmaScanOut] {
          def hasNext: Boolean = it.hasNext
          def next(): EwmaScanOut = {
            val first = it.next()
            val user = first.user_id
            var n = 1L
            // null propagates exactly as the old HOF fold's three-valued
            // arithmetic did: a null seed or element nulls the result
            var s: Option[Double] = first.value
            while (it.hasNext && it.head.user_id == user) {
              val e = it.next(); n += 1
              s = for (a <- s; x <- e.value) yield a + (x - a) * alpha
            }
            EwmaScanOut(user, n, s)
          }
        }
      }
    scanned.toDF()
      .select(col("user_id"), col("n_events"),
        round(col("ewma"), 4).as("ewma_r"))
  }

  /** Per-user running value (analytic window function surface). */
  def runningTotals(events: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(col("user_id"), col("event_id"),
      round(sum(col("value")).over(run), 2).as("running_value"),
      row_number().over(ord).as("seq"))
  }

  /** The OHLC aggregate expressions, shared verbatim by `ohlcBars` and
    * `ohlcBarsStream` so batch/stream parity holds by construction.
    */
  private def ohlcAggs: Seq[Column] = Seq(
    min_by(col("value"), col("ord")).as("open_v"),
    max(col("value")).as("high_v"),
    min(col("value")).as("low_v"),
    max_by(col("value"), col("ord")).as("close_v"),
    count(lit(1)).as("n"))

  /** The order-pinned path aggregate, shared verbatim by `sessionPaths`
    * and `sessionPathsStream` (same by-construction parity).
    */
  // buffer-bound: events of ONE session — gap-bounded by construction
  // (the session key closes after `gapSecs` of silence)
  private def pathAgg: Column = array_join(
    transform(
      array_sort(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))),
      x => x("event_type")), ">").as("path")

  /** Time-series downsampling to OHLC bars per (event_type, widthSecs
    * window). open/close are argmin/argmax of value over a UNIQUE
    * lexicographic order key — struct(second-floored epoch, event_id) —
    * so ties at second granularity break deterministically by id on any
    * engine and min_by/max_by can never tie-pick differently from an
    * oracle's arg_min/arg_max. A struct, NOT the arithmetic composite
    * sec·1e9 + id: that form silently aliases ids ≥ 1e9 into later
    * seconds (wrong open/close at production id ranges) and can overflow
    * under ANSI; the struct is exact for any id. (An engine whose argmin
    * takes only scalar keys mirrors this with a 128-bit composite — the
    * DuckDB oracle uses HUGEINT.) Values are selected, never
    * arithmetic'd: bit-identical doubles. One hash aggregate with
    * map-side partials — O(bars) state, no window function, no
    * self-join; the streaming twin (`ohlcBarsStream`) is the same
    * aggregate behind a watermark.
    */
  def ohlcBars(events: DataFrame, widthSecs: Long = 900L): DataFrame = {
    val es = unix_timestamp(col("ts"))
    events.select(col("event_type"), col("value"),
        (es - es % widthSecs).as("w_start"),
        struct(es.as("s"), col("event_id").as("i")).as("ord"))
      .groupBy(col("event_type"), col("w_start"))
      .agg(ohlcAggs.head, ohlcAggs.tail: _*)
  }

  /** Clickstream path mining: the top-k most frequent within-session
    * event-type sequences. Sessions are the same gap-based
    * `session_window` as `sessions`; each session's path is its events'
    * types joined in (ts, event_id) order — collect_list is UNORDERED in
    * Spark (partial-agg merge order is nondeterministic), so the path is
    * array_sort over (ts, event_id, type) structs BEFORE the join, which
    * pins it on any engine. Per-session state is bounded by session
    * length; the path census aggregates path strings (top-k via
    * TakeOrdered, no global sort).
    */
  def sessionPaths(events: DataFrame, gap: String = "30 minutes",
                   k: Int = 25): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(pathAgg)
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)

  /** Streaming twin of `sessionPaths`' session stage: each session's
    * order-pinned path emits EXACTLY ONCE, when the watermark closes its
    * session window (append mode). State is O(open sessions); the path
    * census over closed sessions is a downstream batch/streaming agg.
    * Same aggregate expressions as batch ⇒ parity is structural, and
    * pinned in `StreamSessionPathSpec`.
    */
  def sessionPathsStream(events: DataFrame, gap: String = "30 minutes",
                         watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(pathAgg)
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("session_start"), col("path"))

  /** First-order Markov transition matrix over per-user event sequences:
    * count of (prev_type → type) steps and the exact per-row transition
    * probability in parts-per-million — integer division of integer
    * counts, no doubles anywhere, so it hash-compares on any engine.
    * Scale shape: the lag window is PARTITIONED by user (key-local,
    * parallel — never a global sort); the pair/total aggregations are
    * |types|² rows. The matrix is what sessionized behavioral modeling
    * and next-event prediction features consume.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val seq = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = events
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(seq).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val totals = steps.groupBy(col("prev_type"))
      .agg(sum(col("cnt")).as("total"))
    steps.join(totals, Seq("prev_type"))
      .withColumn("p_ppm", expr("(cnt * 1000000L) div total"))
      .select(col("prev_type"), col("event_type"), col("cnt"), col("p_ppm"))
  }

  /** Streaming OHLC: identical aggregate expressions grouped on an
    * event-time `window()` (equal to the batch arithmetic floor for
    * epoch-aligned widths) so the watermark can evict completed bars —
    * state is O(open windows × types), append-mode emits each bar exactly
    * once when its window passes the watermark.
    */
  def ohlcBarsStream(events: DataFrame, width: String = "15 minutes",
                     watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .withColumn("ord",
        struct(unix_timestamp(col("ts")).as("s"), col("event_id").as("i")))
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(ohlcAggs.head, ohlcAggs.tail: _*)
      .select(col("event_type"),
        unix_timestamp(col("window.start")).as("w_start"),
        col("open_v"), col("high_v"), col("low_v"), col("close_v"), col("n"))
}
