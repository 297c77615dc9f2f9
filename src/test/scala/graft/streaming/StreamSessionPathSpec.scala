package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** Session path mining runs incrementally: the same order-pinned path
  * aggregate grouped on a session window behind a watermark. A session's
  * path emits exactly once, only after the watermark passes its close;
  * the emitted paths equal the batch construction over the same rows.
  */
class StreamSessionPathSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming session paths equal batch; sessions emit once, on close") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String, Long)]
    val df = in.toDF().toDF("event_id", "ts", "event_type", "user_id")
    val q = Events.sessionPathsStream(df, "30 minutes", "30 minutes")
      .writeStream.format("memory").queryName("spath_stream")
      .outputMode("append").start()
    try {
      // u1 session: B at :01 then A at the same second (path pinned by
      // event_id → A>B); u2 session: single C
      in.addData(
        (2L, ts("2024-01-01 00:00:01"), "B", 1L),
        (1L, ts("2024-01-01 00:00:01"), "A", 1L),
        (3L, ts("2024-01-01 00:05:00"), "C", 2L))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM spath_stream").count() == 0,
        "session emitted before the watermark closed it")

      // in-gap straggler extends u1's session, then a far-future event
      // pushes the watermark past both sessions' close
      in.addData((4L, ts("2024-01-01 00:20:00"), "D", 1L))
      q.processAllAvailable()
      in.addData((5L, ts("2024-01-01 06:00:00"), "A", 3L))
      q.processAllAvailable()

      val got = spark.sql("SELECT user_id, path FROM spath_stream")
        .as[(Long, String)].collect().toSet
      assert(got == Set((1L, "A>B>D"), (2L, "C")),
        s"streaming paths diverge: $got")
      // exactly-once: the next watermark advance closes u3's session and
      // emits it — but must NOT re-emit the two already-closed sessions
      in.addData((6L, ts("2024-01-01 07:00:00"), "A", 3L))
      q.processAllAvailable()
      val all = spark.sql("SELECT user_id, path FROM spath_stream")
        .as[(Long, String)].collect()
      assert(all.length == 3 && all.toSet == got + ((3L, "A")),
        s"closed sessions re-emitted or u3 missing: ${all.toSeq}")
    } finally q.stop()
  }
}
