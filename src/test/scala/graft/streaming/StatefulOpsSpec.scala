package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.streaming.StatefulOps._

class StatefulOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("mapGroupsWithState accumulates per-user stats across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = runningUserStats(input.toDS())
      .writeStream.format("memory").queryName("stats_out")
      .outputMode(OutputMode.Update())
      .start()
    input.addData(
      UserEvent(1L, t("2024-01-01 00:00:00"), 10.0),
      UserEvent(1L, t("2024-01-01 00:01:00"), 30.0),
      UserEvent(2L, t("2024-01-01 00:02:00"), 5.0))
    q.processAllAvailable()
    input.addData(UserEvent(1L, t("2024-01-01 01:00:00"), 2.0)) // state carries over
    q.processAllAvailable()
    val rows = spark.table("stats_out").as[UserStats].collect()
    assert(rows.exists(r => r.user_id == 1 && r.n_events == 3 && r.sum_value == 42.0 && r.max_value == 30.0))
    assert(rows.exists(r => r.user_id == 2 && r.n_events == 1 && r.sum_value == 5.0))
    q.stop()
  }

  test("streaming funnel fires once per user, on the first view→purchase sequence") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val q = streamingFunnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        TypedEvent(1L, t("2024-01-01 00:00:00"), "view"),
        TypedEvent(2L, t("2024-01-01 00:00:30"), "purchase"), // purchase BEFORE any view: no fire
        TypedEvent(3L, t("2024-01-01 00:01:00"), "click"))
      q.processAllAvailable()
      // user 1 converts in a LATER micro-batch (state carried over);
      // user 2's later view must not fire retroactively on the old purchase
      input.addData(
        TypedEvent(1L, t("2024-01-01 00:05:00"), "purchase"),
        TypedEvent(2L, t("2024-01-01 00:06:00"), "view"),
        TypedEvent(1L, t("2024-01-01 00:07:00"), "purchase")) // second purchase: no second fire
      q.processAllAvailable()
      // same-batch in-order match for user 4, delivered OUT of order in
      // the batch (sorted fold must reorder by event time)
      input.addData(
        TypedEvent(4L, t("2024-01-01 00:10:00"), "purchase"),
        TypedEvent(4L, t("2024-01-01 00:09:00"), "view"))
      q.processAllAvailable()
      val rows = spark.table("funnel_out").as[Conversion].collect()
        .map(c => (c.user_id, c.view_ts.toString, c.purchase_ts.toString)).sorted.toSeq
      assert(rows == Seq(
        (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:05:00.0"),
        (4L, "2024-01-01 00:09:00.0", "2024-01-01 00:10:00.0")),
        s"unexpected conversions: $rows")
    } finally q.stop()
  }

  test("streaming SCD2 closed runs == batch scd2Compact's closed intervals across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SeqEvent]
    val q = streamingScd2Runs(input.toDS())
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode(OutputMode.Append())
      .start()
    val ev = Seq(
      SeqEvent(1L, t("2024-01-01 00:00:10"), 1L, "A"),
      SeqEvent(1L, t("2024-01-01 00:00:20"), 2L, "A"),
      SeqEvent(1L, t("2024-01-01 00:00:30"), 3L, "B"), // closes u1 run 1
      SeqEvent(2L, t("2024-01-01 00:00:05"), 4L, "B"),
      // batch 2 — state carries the open (u1, B) run across the boundary
      SeqEvent(1L, t("2024-01-01 00:00:40"), 5L, "A"), // closes u1 run 2
      SeqEvent(2L, t("2024-01-01 00:00:50"), 6L, "B")) // extends u2 run 1, no close
    try {
      input.addData(ev.take(4): _*)
      q.processAllAvailable()
      input.addData(ev.drop(4): _*)
      q.processAllAvailable()
      val streamed = spark.table("scd2_out").as[ClosedRun].collect()
        .map(r => (r.user_id, r.seq, r.event_type, r.valid_from, r.valid_to, r.n_events))
        .sorted.toList
      // the batch op over the same events: closed intervals only
      val batch = graft.ops.Events.scd2Compact(
          ev.toDF("user_id", "ts", "event_id", "event_type")
            .select($"event_id", $"ts", $"user_id", $"event_type"))
        .filter($"valid_to" =!= -1L)
        .as[(Long, Long, String, Long, Long, Long)].collect().sorted.toList
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed.map(r => (r._1, r._2)).distinct.size == 2) // u1 runs 1 and 2
    } finally q.stop()
  }

  test("stream-stream range join matches the batch banded join semantics") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val errors = MemoryStream[(Long, Long, Timestamp)]
    val joined = purchaseErrorJoin(
      purchases.toDF().toDF("probe_id", "user_id", "p_ts"),
      errors.toDF().toDF("hit_id", "h_user", "h_ts"))
    val q = joined.writeStream.format("memory").queryName("ssjoin_out")
      .outputMode(OutputMode.Append()).start()
    purchases.addData((100L, 1L, t("2024-01-01 10:00:00")))
    errors.addData(
      (200L, 1L, t("2024-01-01 09:30:00")), // within the hour: hit
      (201L, 1L, t("2024-01-01 08:30:00")), // too early: no
      (202L, 2L, t("2024-01-01 09:45:00")), // other user: no
      (203L, 1L, t("2024-01-01 10:00:00"))) // exactly at purchase: hit
    q.processAllAvailable()
    val got = spark.table("ssjoin_out").select($"probe_id", $"hit_id")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 200L), (100L, 203L)))
    q.stop()
  }

  test("stream-static enrichment: dim attaches per batch, unmatched facts survive") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val facts = MemoryStream[(Long, Double)]
    val q = enrichWithDim(facts.toDF().toDF("user_id", "amount"), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append()).start()
    try {
      facts.addData((1L, 10.0), (3L, 7.0)) // user 3 has no dim row
      q.processAllAvailable()
      facts.addData((2L, 5.0)) // later batch joins the same static relation
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .as[(Long, Double, Option[String])].collect().toSet
      assert(got == Set((1L, 10.0, Some("gold")), (3L, 7.0, None),
        (2L, 5.0, Some("basic"))), s"got: $got")
    } finally q.stop()
    // no state store involvement: the static side re-joins per batch, so
    // there is nothing to buffer — and the batch plan shape is broadcast
    // (the stream side never shuffles for the join)
    val batchPlan = enrichWithDim(
      Seq((1L, 1.0)).toDF("user_id", "amount"), dim, "user_id")
      .queryExecution.executedPlan.toString
    assert(batchPlan.contains("BroadcastHashJoin"), batchPlan)
  }

  test("streamingEwma matches the batch fold across a micro-batch boundary, out-of-order within a batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SeqValueEvent]
    val q = streamingEwma(input.toDS())
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode(OutputMode.Update())
      .start()
    val ev = Seq(
      // user 1: three events, delivered OUT of order within the batch —
      // the in-batch sort must restore event-time order
      SeqValueEvent(1L, t("2024-01-01 00:02:00"), 3L, 7.0),
      SeqValueEvent(1L, t("2024-01-01 00:00:00"), 1L, 1.0),
      SeqValueEvent(1L, t("2024-01-01 00:01:00"), 2L, 100.0),
      // user 2: single event — EWMA is the seed itself
      SeqValueEvent(2L, t("2024-01-01 00:00:30"), 4L, 42.5),
      // batch 2: user 1 continues (state crosses the boundary)
      SeqValueEvent(1L, t("2024-01-01 00:09:00"), 5L, -4.25))
    try {
      input.addData(ev.take(4): _*)
      q.processAllAvailable()
      input.addData(ev.drop(4): _*)
      q.processAllAvailable()
      // Update mode re-emits per batch; keep the LAST emission per user
      val finals = spark.table("ewma_out").as[UserEwma].collect()
        .groupBy(_.user_id).view.mapValues(_.maxBy(_.n_events)).values.toList
      // batches respected event time (incl. the SAME-ts tie inside one
      // batch, which event_id resolves) — the late counter must be quiet
      assert(finals.forall(_.late_events == 0L),
        s"ordered stream must report zero late events: $finals")
      val streamed = finals
        .map(u => (u.user_id, u.n_events, u.ewma_r)).sorted
      val batch = graft.ops.Events.ewmaByUser(
          ev.toDF().select($"user_id", $"ts", $"event_id", $"value"))
        .as[(Long, Long, Double)].collect().toList.sorted
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // hand check: u1 = fold(1.0; 100.0, 7.0, -4.25) with s += (x-s)/4
      val s1 = Seq(100.0, 7.0, -4.25).foldLeft(1.0)((s, x) => s + (x - s) * 0.25)
      assert(batch.find(_._1 == 1L).get._3 ==
        BigDecimal(s1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(batch.find(_._1 == 2L).get._3 == 42.5)
    } finally q.stop()
    intercept[IllegalArgumentException] {
      graft.ops.Events.ewmaByUser(ev.toDF(), alphaNum = 1, alphaDen = 3)
    }
  }

  test("streamingEwma counts cross-batch event-time violations in late_events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SeqValueEvent]
    val q = streamingEwma(input.toDS())
      .writeStream.format("memory").queryName("ewma_late_out")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // batch 1 folds through 00:05; batch 2 delivers one event BEHIND
      // max-seen (00:02 < 00:05 — a genuine cross-batch reordering the
      // recurrence can no longer place) and one tied-ts event with a
      // LOWER event_id than max-seen's (also unplaceable), plus one
      // properly ordered event that must NOT count
      input.addData(
        SeqValueEvent(1L, t("2024-01-01 00:00:00"), 1L, 1.0),
        SeqValueEvent(1L, t("2024-01-01 00:05:00"), 5L, 2.0))
      q.processAllAvailable()
      input.addData(
        SeqValueEvent(1L, t("2024-01-01 00:02:00"), 2L, 3.0), // late: earlier ts
        SeqValueEvent(1L, t("2024-01-01 00:05:00"), 4L, 4.0), // late: tied ts, lower id
        SeqValueEvent(1L, t("2024-01-01 00:09:00"), 9L, 5.0)) // in order
      q.processAllAvailable()
      val last = spark.table("ewma_late_out").as[UserEwma].collect()
        .maxBy(_.n_events)
      assert(last.n_events == 5L, s"all five events must fold: $last")
      assert(last.late_events == 2L,
        s"exactly the two unplaceable events count as late: $last")
    } finally q.stop()
  }

  test("streamingAttribution matches the batch RANGE-frame op across a micro-batch boundary") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AttrEvent]
    val q = streamingAttribution(input.toDS(), "purchase", Set("view", "click"), 3600L)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append())
      .start()
    val ev = Seq(
      AttrEvent(1L, 1L, t("2024-01-01 00:00:00"), "view"),
      AttrEvent(2L, 1L, t("2024-01-01 00:02:00"), "click"),
      AttrEvent(3L, 1L, t("2024-01-01 00:02:00"), "view"),  // tie at :02
      AttrEvent(4L, 1L, t("2024-01-01 00:05:00"), "purchase"),
      AttrEvent(7L, 2L, t("2024-01-01 00:30:00"), "click"),
      // lower id but LATER millisecond in the same second: the batch op
      // truncates to seconds, so id 6 must still be the FIRST touch — a
      // millisecond-keyed stream sort would order id 7 ahead of it
      AttrEvent(6L, 2L, t("2024-01-01 00:30:00.9"), "click"),
      AttrEvent(8L, 2L, t("2024-01-01 00:30:00"), "purchase"), // same-ts touch counts
      // batch 2 — lookback state carries across the boundary: the :02
      // touches are still inside the 1h window of a :50 conversion, and a
      // 02:05 conversion finds everything expired
      AttrEvent(9L, 1L, t("2024-01-01 00:50:00"), "purchase"),
      AttrEvent(10L, 1L, t("2024-01-01 02:05:00"), "purchase"),
      AttrEvent(11L, 3L, t("2024-01-01 00:00:00"), "purchase")) // touchless user
    try {
      input.addData(ev.take(7): _*)
      q.processAllAvailable()
      input.addData(ev.drop(7): _*)
      q.processAllAvailable()
      val streamed = spark.table("attr_out").as[Attribution].collect()
        .map(a => (a.conv_id, a.user_id, a.conv_ts_s, a.first_touch_id,
          a.first_touch_ts_s, a.last_touch_id, a.last_touch_ts_s))
        .sorted.toList
      val batch = graft.ops.Events.attribution(
          ev.toDF().select($"event_id", $"ts", $"user_id", $"event_type"),
          "purchase", Seq("view", "click"), 3600L)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sorted.toList
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed.size == 5)
      // the tie conversion picked (first=1, last=3) — the lexicographic rule
      val tie = streamed.find(_._1 == 4L).get
      assert(tie._4 == 1L && tie._6 == 3L)
      // the sub-second case: id 6 (later millis, same second) is FIRST
      val sub = streamed.find(_._1 == 8L).get
      assert(sub._4 == 6L && sub._6 == 7L)
    } finally q.stop()
  }
}
