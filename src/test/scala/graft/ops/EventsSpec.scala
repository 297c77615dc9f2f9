package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class EventsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private lazy val tiny = Seq(
    (1L, t("2024-01-01 00:00:00"), 10L, "click", 1.0, """{"k": 1}"""),
    (2L, t("2024-01-01 00:10:00"), 10L, "click", 2.0, """{"k": 2}"""),
    (3L, t("2024-01-01 00:50:00"), 10L, "view", 4.0, """{"k": 3}"""), // 40min gap: new session
    (4L, t("2024-01-01 02:00:00"), 11L, "click", 8.0, """{"k": 4}"""),
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("ohlcBars: open/close correct for event_ids >= 1e9 (no second-aliasing)") {
    // the replaced sec*1e9 + id composite aliased id 2e9 two seconds
    // forward, flipping open/close against this true (sec, id) order:
    // A (s, 2e9) orders BEFORE B (s+1, 0) — old key said B first
    val ev = Seq(
      (2000000000L, t("2024-01-01 00:00:00"), 1L, "click", 1.0, "{}"), // A: open
      (0L, t("2024-01-01 00:00:01"), 1L, "click", 2.0, "{}"),          // B: close
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val bar = Events.ohlcBars(ev).select("open_v", "close_v", "n")
      .as[(Double, Double, Long)].collect().toSeq
    assert(bar == Seq((1.0, 2.0, 2L)),
      s"struct order key mis-picked open/close: $bar")
  }

  test("cohortRetention: users count toward their first-day cohort at each offset") {
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"), // u1 cohort d0
      (2L, t("2024-01-01 11:00:00"), 1L, "view", 1.0, "{}"),  // same day: one active-day row
      (3L, t("2024-01-02 09:00:00"), 1L, "click", 1.0, "{}"), // u1 k=1
      (4L, t("2024-01-04 09:00:00"), 1L, "click", 1.0, "{}"), // u1 k=3
      (5L, t("2024-01-01 23:59:59"), 2L, "click", 1.0, "{}"), // u2 cohort d0, k=0 only
      (6L, t("2024-01-02 00:00:01"), 3L, "click", 1.0, "{}"), // u3 cohort d1
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d0 = t("2024-01-01 00:00:00").getTime / 1000
    val d1 = t("2024-01-02 00:00:00").getTime / 1000
    val rows = Events.cohortRetention(ev).as[(Long, Int, Long)].collect().toSet
    assert(rows == Set((d0, 0, 2L), (d0, 1, 1L), (d0, 3, 1L), (d1, 0, 1L)))
  }

  test("anomalyZScores: exact integer moments flag only the |z|>=threshold outlier") {
    // nine zeros + one 100.0 in one group: mean=1000 cents, var=9e6,
    // std=3000 → z(outlier)=3.0 exactly, z(zeros)=-1/3
    val ev = (1L to 9L).map(i => (i, t("2024-01-01 00:00:00"), 1L, "x", 0.0, "{}")) :+
      ((10L, t("2024-01-01 00:00:00"), 1L, "x", 100.0, "{}"))
    val df = ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Events.anomalyZScores(df, 2.5).as[(Long, String, Double)].collect().toSet
    assert(rows == Set((10L, "x", 3.0)))
  }

  test("tumbling windows partition events by the hour with exact sums") {
    val rows = Events.tumbling(tiny).as[(Long, String, Long, Double)].collect().toSet
    val h0 = t("2024-01-01 00:00:00").getTime / 1000
    val h2 = t("2024-01-01 02:00:00").getTime / 1000
    assert(rows == Set((h0, "click", 2L, 3.0), (h0, "view", 1L, 4.0), (h2, "click", 1L, 8.0)))
  }

  test("sessionization: 30-min gap splits, session end = last + gap") {
    val rows = Events.sessions(tiny, "30 minutes")
      .as[(Long, Long, Long, Long)].collect().toSet
    val s = (x: String) => t(x).getTime / 1000
    assert(rows == Set(
      (10L, s("2024-01-01 00:00:00"), s("2024-01-01 00:40:00"), 2L),
      (10L, s("2024-01-01 00:50:00"), s("2024-01-01 01:20:00"), 1L),
      (11L, s("2024-01-01 02:00:00"), s("2024-01-01 02:30:00"), 1L),
    ))
  }

  test("sessionization: an exactly-gap-sized interval MERGES (session " +
       "merge test is start2 <= end1, inclusive) — oracle uses >") {
    // Two events exactly 30 minutes apart: the first event's window is
    // [00:00, 00:30) and the second's is [00:30, 01:00); Spark's session
    // merge compares start2 <= end1 INCLUSIVELY, so they collapse into one
    // session — despite each per-event range being half-open. The DuckDB
    // oracle therefore breaks sessions only on `gap > 30 minutes` (an
    // exact-gap event stays in the session), matching this pinned
    // behavior. Verified empirically; a `>=` oracle would diverge on any
    // fixture with an exact-gap pair.
    val boundary = Seq(
      (1L, t("2024-01-01 00:00:00"), 7L, "click", 1.0, "{}"),
      (2L, t("2024-01-01 00:30:00"), 7L, "click", 1.0, "{}"), // = gap: merges
      (3L, t("2024-01-01 01:00:01"), 7L, "click", 1.0, "{}"), // > gap: splits
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Events.sessions(boundary, "30 minutes")
      .as[(Long, Long, Long, Long)].collect().toSet
    val s = (x: String) => t(x).getTime / 1000
    assert(rows == Set(
      (7L, s("2024-01-01 00:00:00"), s("2024-01-01 01:00:00"), 2L),
      (7L, s("2024-01-01 01:00:01"), s("2024-01-01 01:30:01"), 1L),
    ))
  }

  test("json props extraction aggregates per event_type") {
    val rows = Events.propsK(tiny).as[(String, Long, Long, Long)].collect().toSet
    assert(rows == Set(("click", 3L, 7L, 4L), ("view", 1L, 3L, 3L)))
  }

  test("running totals accumulate in event-time order per user") {
    val rows = Events.runningTotals(tiny)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows == Set(
      (10L, 1L, 1.0, 1), (10L, 2L, 3.0, 2), (10L, 3L, 7.0, 3), (11L, 4L, 8.0, 1)))
  }

  test("sessionPaths: gap-split sessions yield order-pinned path strings") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1: two sessions (A>B, then C after a 2h gap); u2: one session B>A
    // — events 1 and 2 share a second, so the path order must fall back
    // to event_id
    val ev = Seq(
      (2L, ts("2024-01-01 00:00:01"), 1L, "B", 0.0),
      (1L, ts("2024-01-01 00:00:01"), 1L, "A", 0.0),
      (3L, ts("2024-01-01 02:30:00"), 1L, "C", 0.0),
      (4L, ts("2024-01-01 00:00:01"), 2L, "B", 0.0),
      (5L, ts("2024-01-01 00:10:00"), 2L, "A", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.sessionPaths(ev).as[(String, Long)].collect().toSet
    assert(got == Set(("A>B", 1L), ("C", 1L), ("B>A", 1L)))
    // layout-independent: a different partitioning yields the same paths
    val re = Events.sessionPaths(ev.repartition(7)).as[(String, Long)]
      .collect().toSet
    assert(re == got, "path strings depend on physical layout")
  }

  test("scd2Compact: runs collapse, intervals chain half-open, counts reconcile") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1: A A B A → 3 runs; u2: B → 1 run (still current)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:10"), 1L, "A", 0.0),
      (2L, ts("2024-01-01 00:00:20"), 1L, "A", 0.0),
      (3L, ts("2024-01-01 00:00:30"), 1L, "B", 0.0),
      (4L, ts("2024-01-01 00:00:40"), 1L, "A", 0.0),
      (5L, ts("2024-01-01 00:00:05"), 2L, "B", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val base = 1704067200L // 2024-01-01 00:00:00 UTC
    val got = Events.scd2Compact(ev)
      .as[(Long, Long, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toList
    assert(got == List(
      (1L, 1L, "A", base + 10, base + 30, 2L),
      (1L, 2L, "B", base + 30, base + 40, 1L),
      (1L, 3L, "A", base + 40, -1L, 1L),
      (2L, 1L, "B", base + 5, -1L, 1L)))
    // corpus invariants: per user — seq is 1..m, valid_to(i) == valid_from(i+1),
    // last run open (-1), adjacent runs change the attribute, counts reconcile
    val ev0 = spark.read.parquet(s"${graft.TestSpark.sf0001}/events.parquet")
    val runs = Events.scd2Compact(ev0)
      .as[(Long, Long, String, Long, Long, Long)].collect().groupBy(_._1)
    val perUser = ev0.groupBy($"user_id").count().as[(Long, Long)].collect().toMap
    runs.foreach { case (u, rs0) =>
      val rs = rs0.sortBy(_._2)
      assert(rs.map(_._2).toList == (1L to rs.length).toList)
      rs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 == b._4, s"user $u: interval chain broken at seq ${a._2}")
          assert(a._3 != b._3, s"user $u: adjacent runs must differ in event_type")
        case _ =>
      }
      assert(rs.last._5 == -1L, s"user $u: last run must be open")
      assert(rs.map(_._6).sum == perUser(u), s"user $u: run counts must reconcile")
    }
  }

  test("scd2Compact: reserved working/output column names fail fast instead of clobbering") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val base = Seq((1L, ts("2024-01-01 00:00:10"), 1L, "A", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // internal working columns are clobbered by withColumn whatever their
    // role — ANY input column carrying them must fail fast
    for (c <- Seq("__chg", "__run")) {
      val ex = intercept[IllegalArgumentException] {
        Events.scd2Compact(base.withColumn(c, lit(1)))
      }
      assert(ex.getMessage.contains(c), s"error must name the clashing column '$c'")
    }
    // output names collide only with columns that SURVIVE the aggregation:
    // keyCol/attrCol carrying one must fail...
    for (c <- Seq("seq", "valid_from", "valid_to", "n_events")) {
      val ex = intercept[IllegalArgumentException] {
        Events.scd2Compact(base.withColumnRenamed("event_type", c), attrCol = c)
      }
      assert(ex.getMessage.contains(c), s"error must name the clashing column '$c'")
    }
    // ...but tsCol/seqCol are consumed before the aliases exist — a
    // timestamp legitimately named valid_from (re-compacting an SCD2
    // table) must WORK, not throw (the round-10 guard-scope fix)
    val viaTs = Events.scd2Compact(
      base.withColumnRenamed("ts", "valid_from"), tsCol = "valid_from")
    assert(viaTs.columns.toSeq ==
      Seq("user_id", "seq", "event_type", "valid_from", "valid_to", "n_events"))
    assert(viaTs.count() == 1L)
    val viaSeq = Events.scd2Compact(
      base.withColumnRenamed("event_id", "seq"), seqCol = "seq")
    assert(viaSeq.count() == 1L)
    // and an extra NON-role column named an output name is dropped by the
    // aggregation like any other payload column — no clobber, no throw
    assert(Events.scd2Compact(base.withColumn("valid_to", lit(1))).count() == 1L)
  }

  test("transitionMatrix: per-user step counts and exact ppm probabilities") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1: A→B→A→C   u2: B→A   (first event of each user starts no step)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:01"), 1L, "A", 0.0),
      (2L, ts("2024-01-01 00:00:02"), 1L, "B", 0.0),
      (3L, ts("2024-01-01 00:00:03"), 1L, "A", 0.0),
      (4L, ts("2024-01-01 00:00:04"), 1L, "C", 0.0),
      (5L, ts("2024-01-01 00:00:01"), 2L, "B", 0.0),
      (6L, ts("2024-01-01 00:00:02"), 2L, "A", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.transitionMatrix(ev)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("A", "B", 1L, 500000L), ("A", "C", 1L, 500000L),
      ("B", "A", 2L, 1000000L)))
  }

  test("attribution: first/last touch in lookback, struct tie-breaks, -1 when empty") {
    val ev = Seq(
      // user 1: view@:00(1), click@:02(2) and view@:02(3) tie, purchase@:05(4)
      (1L, t("2024-01-01 00:00:00"), 1L, "view", 0.0, "{}"),
      (2L, t("2024-01-01 00:02:00"), 1L, "click", 0.0, "{}"),
      (3L, t("2024-01-01 00:02:00"), 1L, "view", 0.0, "{}"),
      (4L, t("2024-01-01 00:05:00"), 1L, "purchase", 1.0, "{}"),
      // same user: purchase 2h later — every touch is outside the 1h lookback
      (5L, t("2024-01-01 02:05:00"), 1L, "purchase", 1.0, "{}"),
      // a touch AFTER a conversion never attributes to it
      (6L, t("2024-01-01 02:10:00"), 1L, "view", 0.0, "{}"),
      // user 2: touch at the conversion's exact timestamp counts
      (7L, t("2024-01-01 00:30:00"), 2L, "click", 0.0, "{}"),
      (8L, t("2024-01-01 00:30:00"), 2L, "purchase", 1.0, "{}"),
      // user 3: no touches at all
      (9L, t("2024-01-01 00:00:00"), 3L, "purchase", 1.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.attribution(ev, "purchase", Seq("view", "click"), 3600L)
      .select("conv_id", "first_touch_id", "last_touch_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (4L, 1L, 3L),   // first = earliest; last tie at :02 -> larger id 3
      (5L, -1L, -1L), // lookback expired
      (8L, 7L, 7L),   // same-timestamp touch counts
      (9L, -1L, -1L), // no touches
    ))
    // reserved working names guarded
    intercept[IllegalArgumentException] {
      Events.attribution(ev.withColumn("__last", lit(1)), "purchase", Seq("view"))
    }
    // plan pin: both extrema ride ONE Window node over one user_id
    // exchange (separate withColumns would analyze to two Window passes)
    val plan = Events.attribution(ev, "purchase", Seq("view", "click"), 3600L)
      .queryExecution.executedPlan.toString
    assert("Window \\[".r.findAllIn(plan).size == 1, plan)
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 1, plan)
  }
}
