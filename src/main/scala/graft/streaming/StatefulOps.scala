package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state (SURVEY §2.2 "streaming state" surface beyond
  * windows): arbitrary per-key state with
  * `KeyValueGroupedDataset.mapGroupsWithState`, and stream-stream joins
  * with watermark-bounded state.
  *
  * Scale notes: state lives in the state store, partitioned by key — no
  * driver-side state. State BOUNDS differ by op: the stream-stream join is
  * watermark-bounded (buffers expire); `runningUserStats` deliberately uses
  * NoTimeout because its state domain is the bounded user population —
  * lifetime aggregates are the point. For unbounded key domains, swap in
  * `GroupStateTimeout.ProcessingTimeTimeout`/`EventTimeTimeout` with
  * `state.setTimeoutDuration` + removal on `state.hasTimedOut`, or use the
  * watermark-bounded ops (`Dedup.streamingExactDedup`, windowed aggs).
  */
object StatefulOps {

  final case class UserEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class UserStats(user_id: Long, n_events: Long, sum_value: Double, max_value: Double)

  /** Running per-user aggregates maintained as explicit state: the shape of
    * custom sessionization/feature-accumulation logic that windowed aggs
    * can't express. Emits the updated stats for each key in each batch.
    */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      // buffer-bound: O(1) state per user (one UserStats quadruple);
      // the batch iterator folds without materializing
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(user, 0L, 0.0, Double.MinValue))
          val next = rows.foldLeft(prev) { (acc, e) =>
            UserStats(user, acc.n_events + 1, acc.sum_value + e.value,
              math.max(acc.max_value, e.value))
          }
          state.update(next)
          next
      }
  }

  final case class SeqValueEvent(user_id: Long, ts: Timestamp, event_id: Long, value: Double)
  final case class UserEwma(user_id: Long, n_events: Long, ewma_r: Double,
                            late_events: Long)

  /** STREAMING per-user EWMA — the incremental twin of the batch
    * `Events.ewmaByUser`: per-user state is ONE (ewma, n, maxTs, late)
    * quadruple, each micro-batch's arrivals fold in event-time order
    * ((ts, event_id) — sorted WITHIN the batch because
    * mapGroupsWithState hands the group iterator in arbitrary order),
    * and the same dyadic-α update form s ← s + (x − s)·α produces
    * bit-identical doubles to the batch fold when batches respect event
    * time (the parity precondition every sequential streaming twin in
    * this file carries — out-of-order arrival across batches is a
    * watermark/reordering concern upstream of the recurrence).
    *
    * That precondition is OBSERVABLE, not just documented (round-11
    * advice): state carries the user's max-seen order key — the
    * (event-time micros, event_id) pair the batch op sorts by — and
    * every arriving event whose key is STRICTLY BELOW max-seen is one
    * the recurrence has already folded past and can no longer place in
    * order; each increments `late_events` in the emitted row. Within
    * one batch the sort makes keys strictly increasing (event_id breaks
    * ts ties, so a same-ts pair in one batch is NOT a violation — its
    * order is recovered exactly as the batch op recovers it); a
    * violation can therefore only be a genuine cross-batch reordering.
    * A production monitor alerts on `late_events > 0` instead of
    * silently serving an EWMA whose fold order diverged from event
    * order. The late event is still folded (in its within-batch
    * position) so the twin degrades exactly like any at-least-once
    * consumer, never drops data. Emits the updated (user, n, ewma,
    * late) per key per batch; with late_events = 0 the final emission
    * equals the batch op's row (parity spec-pinned across a micro-batch
    * boundary, violation counting spec-pinned with a late batch).
    * `late_events` is LIFETIME-CUMULATIVE per user — it rides the state
    * store, so it survives restarts while `recentProgress` resets: a
    * monitor wanting per-window violation RATES diffs successive
    * emissions; absolute counts compared across a recovery would
    * double-attribute pre-restart violations to the new run.
    *
    * STATE-SCHEMA COMPATIBILITY: adding the order-key + late counter
    * widened the per-user state from (Double, Long) to a 5-tuple. A
    * deployment restarting this query from a checkpoint written by the
    * old 2-tuple shape will fail state deserialization — upgrading
    * requires a FRESH checkpoint directory (replay the source from the
    * desired offsets) or an offline state-store migration; there is no
    * in-place evolution for mapGroupsWithState tuple state.
    */
  def streamingEwma(events: Dataset[SeqValueEvent],
                    alphaNum: Int = 1, alphaDen: Int = 4): Dataset[UserEwma] = {
    require(alphaDen >= 2 && (alphaDen & (alphaDen - 1)) == 0 &&
      alphaNum >= 1 && alphaNum < alphaDen,
      s"streamingEwma: need a dyadic alpha in (0, 1): $alphaNum/$alphaDen")
    val alpha = alphaNum.toDouble / alphaDen
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      // buffer-bound: O(1) state per user (one 5-tuple); the in-batch
      // sort buffers one user's rows of ONE micro-batch
      // (maxOffsetsPerTrigger-bounded), never history
      .mapGroupsWithState[(Double, Long, Long, Long, Long), UserEwma](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[SeqValueEvent],
         state: GroupState[(Double, Long, Long, Long, Long)]) =>
          // full sub-millisecond order: getTime is millis, getNanos the
          // fraction — matching the batch op's (ts, event_id) µs order
          def micros(e: SeqValueEvent): Long =
            e.ts.getTime / 1000L * 1000000L + e.ts.getNanos / 1000L
          val ordered = rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          val next = ordered.foldLeft(
            state.getOption.getOrElse((0.0, 0L, Long.MinValue, Long.MinValue, 0L))) {
            case ((s, n, maxTs, maxId, late), e) =>
              val m = micros(e)
              val isLate = n > 0L && (m < maxTs || (m == maxTs && e.event_id < maxId))
              val (nextTs, nextId) =
                if (m > maxTs || (m == maxTs && e.event_id > maxId)) (m, e.event_id)
                else (maxTs, maxId)
              (if (n == 0L) e.value else s + (e.value - s) * alpha, n + 1,
                nextTs, nextId, if (isLate) late + 1 else late)
          }
          state.update(next)
          UserEwma(user, next._2,
            BigDecimal(next._1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
            next._5)
      }
  }

  final case class TypedEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class Conversion(user_id: Long, view_ts: Timestamp, purchase_ts: Timestamp)
  final case class FunnelState(firstView: Option[Timestamp], fired: Boolean)

  /** STREAMING ordered-sequence detection (the incremental twin of the
    * batch `events_funnel`): emit a Conversion the first time a user's
    * `purchase` arrives after an earlier `view`, tracked as explicit
    * per-user state via flatMapGroupsWithState — the pattern windowed aggs
    * can't express incrementally (the match spans an unbounded gap between
    * two specific event types). State per user is ONE timestamp (the
    * earliest view) plus a fired flag — O(users), not O(events); an
    * event-time timeout would bound it further for unbounded key domains.
    *
    * Determinism: events inside one micro-batch are processed in event-time
    * order (the iterator is sorted before folding), so a view and purchase
    * arriving in the same batch still match in order.
    */
  def streamingFunnel(events: Dataset[TypedEvent]): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      // buffer-bound: O(1) state per user (first-view ts + fired flag);
      // in-batch sort buffers one micro-batch's rows per user
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[TypedEvent], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(None, fired = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[Conversion]
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            if (!st.fired) {
              if (e.event_type == "view" && st.firstView.isEmpty)
                st = st.copy(firstView = Some(e.ts))
              else if (e.event_type == "purchase" && st.firstView.exists(_.getTime < e.ts.getTime)) {
                out += Conversion(user, st.firstView.get, e.ts)
                st = st.copy(fired = true)
              }
            }
          }
          state.update(st)
          out.iterator
      }
  }

  final case class SeqEvent(user_id: Long, ts: Timestamp, event_id: Long,
                            event_type: String)
  final case class Step(user_id: Long, prev_type: String, event_type: String)
  final case class LastEvent(ts: Timestamp, event_id: Long, event_type: String)

  /** STREAMING step extraction for the Markov transition matrix (the
    * incremental twin of the batch `events_transitions`): per-user state
    * is exactly the LAST event seen — O(users), one small tuple each —
    * and every arriving event emits its (prev_type → type) step,
    * including across micro-batch boundaries. Within a batch the iterator
    * is sorted by (ts, event_id) — the same order the batch lag window
    * pins; across batches the op assumes per-user in-order arrival (the
    * Kafka-partition-by-user deployment). Counting the emitted steps
    * downstream (update-mode agg, |types|² keys) reproduces the batch
    * matrix — pinned in `StreamTransitionSpec`.
    */
  def streamingTransitionSteps(events: Dataset[SeqEvent]): Dataset[Step] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      // buffer-bound: O(1) state per user (the last event only);
      // in-batch sort buffers one micro-batch's rows per user
      .flatMapGroupsWithState[LastEvent, Step](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[SeqEvent], state: GroupState[LastEvent]) =>
          var prev = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Step]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            prev.foreach(p => out += Step(user, p.event_type, e.event_type))
            prev = Some(LastEvent(e.ts, e.event_id, e.event_type))
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  final case class ClosedRun(user_id: Long, seq: Long, event_type: String,
                             valid_from: Long, valid_to: Long, n_events: Long)
  final case class OpenRun(seq: Long, attr: String, validFrom: Long, nEvents: Long)

  /** STREAMING SCD2 / CDC compaction (the incremental twin of the batch
    * `events_scd2`): per-user state is exactly the one OPEN run — seq,
    * attribute, start, count — O(users), one small tuple each. A closed
    * interval is emitted the moment an arriving event changes the
    * attribute, with the same half-open epoch-second bounds the batch op
    * computes, so appending these rows to a dimension table keeps it
    * current without replay. Within a batch the fold sorts by
    * (ts, event_id) — the batch windows' exact order; across batches the
    * op assumes per-user in-order arrival (the partition-by-key
    * deployment, same contract as `streamingTransitionSteps`); the batch
    * op is the repair path when that contract breaks. Streaming closed
    * rows == batch rows with valid_to ≠ -1 — pinned in StatefulOpsSpec;
    * the open runs live only in state, exactly the batch op's -1 rows.
    */
  def streamingScd2Runs(events: Dataset[SeqEvent]): Dataset[ClosedRun] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      // buffer-bound: O(1) state per user (one open run);
      // in-batch sort buffers one micro-batch's rows per user
      .flatMapGroupsWithState[OpenRun, ClosedRun](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[SeqEvent], state: GroupState[OpenRun]) =>
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[ClosedRun]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val es = Math.floorDiv(e.ts.getTime, 1000L) // epoch-seconds floor, as the batch op
            cur = cur match {
              case Some(r) if r.attr == e.event_type =>
                Some(r.copy(nEvents = r.nEvents + 1))
              case Some(r) =>
                out += ClosedRun(user, r.seq, r.attr, r.validFrom, es, r.nEvents)
                Some(OpenRun(r.seq + 1, e.event_type, es, 1L))
              case None =>
                Some(OpenRun(1L, e.event_type, es, 1L))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** Stream-stream inner join: for each purchase, error events of the same
    * user within the preceding hour — the streaming counterpart of the
    * batch `q_range_join`. Watermarks bound both join-state buffers.
    */
  final case class AttrEvent(event_id: Long, user_id: Long, ts: Timestamp,
                             event_type: String)
  final case class Attribution(conv_id: Long, user_id: Long, conv_ts_s: Long,
                               first_touch_id: Long, first_touch_ts_s: Long,
                               last_touch_id: Long, last_touch_ts_s: Long)
  final case class AttrState(touches: List[(Long, Long)]) // (ts_s, id) ascending

  /** STREAMING conversion attribution — the incremental twin of
    * `Events.attribution`: each conversion emits its first/last touch
    * within the lookback the moment it arrives, with per-user state = ONLY
    * the touches still inside the lookback horizon (pruned as event time
    * advances — state per user is bounded by touch-rate·lookback, not
    * history). Batch-parity contract (spec-pinned across a micro-batch
    * boundary): within a batch, rows process in (ts, event_id) order and
    * all touches AT a timestamp register before that timestamp's
    * conversions — exactly the batch RANGE frame's all-peers-included "at
    * or before" semantics, including the struct tie-breaks (ascending
    * (ts, id) state makes head the first-touch and last the last-touch).
    * Assumes per-user event-time-ordered arrival ACROSS batches (the
    * streamingScd2Runs contract); a same-timestamp touch landing in a
    * later batch than its conversion is missed, as in any online
    * attribution.
    */
  def streamingAttribution(events: Dataset[AttrEvent], convType: String,
                           touchTypes: Set[String],
                           lookbackSecs: Long = 86400L): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      // buffer-bound: touches inside ONE lookback window per user —
      // lookbackSecs-pruned on every batch; in-batch sort buffers one
      // micro-batch's rows per user
      .flatMapGroupsWithState[AttrState, Attribution](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[AttrEvent], state: GroupState[AttrState]) =>
          var touches = state.getOption.map(_.touches).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[Attribution]
          // sort on SECONDS, not millis: the batch op keys its frame on
          // unix_timestamp (second truncation), so two touches inside one
          // second are peers ordered by id — a millisecond sort would
          // order them by arrival instant and flip first/last vs batch
          val sorted = rows.toSeq
            .sortBy(e => (Math.floorDiv(e.ts.getTime, 1000L), e.event_id))
          var i = 0
          while (i < sorted.length) {
            val tsS = Math.floorDiv(sorted(i).ts.getTime, 1000L)
            var j = i
            while (j < sorted.length &&
              Math.floorDiv(sorted(j).ts.getTime, 1000L) == tsS) j += 1
            val cohort = sorted.slice(i, j)
            touches = touches.dropWhile(_._1 < tsS - lookbackSecs)
            // touches at this timestamp register before its conversions —
            // the RANGE frame's all-peers rule; cohort is id-sorted so the
            // appended run keeps the list (ts, id)-ascending
            touches = touches ++ cohort.filter(e => touchTypes(e.event_type))
              .map(e => (tsS, e.event_id))
            cohort.filter(_.event_type == convType).foreach { c =>
              if (touches.isEmpty)
                out += Attribution(c.event_id, user, tsS, -1L, -1L, -1L, -1L)
              else {
                val (ft, fi) = touches.head
                val (lt, li) = touches.last
                out += Attribution(c.event_id, user, tsS, fi, ft, li, lt)
              }
            }
            i = j
          }
          state.update(AttrState(touches))
          out.iterator
      }
  }

  def purchaseErrorJoin(purchases: DataFrame, errors: DataFrame): DataFrame = {
    val p = purchases.withWatermark("p_ts", "2 hours")
    val e = errors.withWatermark("h_ts", "2 hours")
    p.join(e,
      expr("""
        user_id = h_user AND
        h_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts
      """))
  }

  /** Stream-STATIC dimension enrichment — the third join shape Structured
    * Streaming supports (beside stream-stream and self-joins): a streaming
    * fact joined to a bounded dimension table. The static side is
    * broadcast, so the stream never shuffles and NO join state accrues in
    * the state store (unlike stream-stream joins there is nothing to
    * buffer — each micro-batch joins against the same relation). Left
    * join, so facts with no dimension row survive with nulls — an
    * enrichment must never drop stream rows. At 100 TB/day this is how
    * per-event lookups (user tier, geo, model route) attach at scan speed;
    * the static side is re-read per micro-batch, so a slowly-changing
    * dimension can be swapped on disk without restarting the query.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}
