package graft.ops

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins Spark's session_window semantics at the EXACT gap boundary:
  * measured behavior is that an event arriving precisely gap after the
  * previous one MERGES into the session (a new session starts only when
  * the gap is strictly exceeded). The DuckDB oracle for events_sessions
  * encodes the same rule (`diff > gap` → new session); this spec keeps
  * that assumption honest — it originally exposed an off-by-inclusive bug
  * in the oracle.
  */
class SessionBoundarySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("event at exactly previous+gap merges; strictly beyond starts anew") {
    val df = Seq(
      (1L, t("2024-01-01 00:00:00"), 5L, "click", 1.0, "{}"),
      (2L, t("2024-01-01 00:30:00"), 5L, "click", 1.0, "{}"), // exactly +gap: merges
      (3L, t("2024-01-01 01:00:01"), 5L, "click", 1.0, "{}"), // gap exceeded: new
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val sessions = Events.sessions(df, "30 minutes")
      .as[(Long, Long, Long, Long)].collect().toSet
    val s = (x: String) => t(x).getTime / 1000
    assert(sessions == Set(
      (5L, s("2024-01-01 00:00:00"), s("2024-01-01 01:00:00"), 2L),
      (5L, s("2024-01-01 01:00:01"), s("2024-01-01 01:30:01"), 1L),
    ))
  }
}
