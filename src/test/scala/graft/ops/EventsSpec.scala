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
}
