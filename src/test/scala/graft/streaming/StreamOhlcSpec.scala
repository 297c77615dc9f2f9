package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** OHLC downsampling runs incrementally: the same aggregate expressions
  * grouped on an event-time window behind a watermark. Streaming/batch
  * parity over identical rows, plus append-mode bar finalization — a bar
  * is emitted exactly once, only after the watermark passes its window.
  */
class StreamOhlcSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming OHLC equals batch OHLC on the same rows; bars finalize on watermark") {
    implicit val sqlCtx = spark.sqlContext
    // (event_id, ts, event_type, value)
    val in = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = Events.ohlcBarsStream(df, "15 minutes", "30 minutes")
      .writeStream.format("memory").queryName("ohlc_stream")
      .outputMode("append").start()
    try {
      val batch1 = Seq(
        (1L, ts("2024-01-01 00:01:00"), "click", 5.0),
        (2L, ts("2024-01-01 00:05:00"), "click", 9.0),
        (3L, ts("2024-01-01 00:14:00"), "click", 2.0),
        (4L, ts("2024-01-01 00:03:00"), "view", 7.0),
        // same second as event 6 — the unique order key must break the tie
        (5L, ts("2024-01-01 00:10:00"), "view", 1.0),
        (6L, ts("2024-01-01 00:10:00"), "view", 8.0))
      in.addData(batch1: _*)
      q.processAllAvailable()
      // watermark still at batch1's max − 30 min → nothing finalized yet
      assert(spark.sql("SELECT * FROM ohlc_stream").count() == 0,
        "bars emitted before the watermark passed their window")

      // late-but-in-watermark straggler for the first window, then an
      // advancing event that pushes the watermark past 00:15
      in.addData((7L, ts("2024-01-01 00:02:00"), "click", 11.0))
      q.processAllAvailable()
      in.addData((8L, ts("2024-01-01 01:00:00"), "click", 3.0))
      q.processAllAvailable()

      val got = spark.sql(
        "SELECT event_type, w_start, open_v, high_v, low_v, close_v, n FROM ohlc_stream")
        .as[(String, Long, Double, Double, Double, Double, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      // batch parity: the SAME rows (batch1 + straggler) through ohlcBars
      val expect = Events.ohlcBars(
          (batch1 :+ (7L, ts("2024-01-01 00:02:00"), "click", 11.0))
            .toDF("event_id", "ts", "event_type", "value"))
        .select($"event_type", $"w_start", $"open_v", $"high_v", $"low_v", $"close_v", $"n")
        .as[(String, Long, Double, Double, Double, Double, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got == expect, s"streaming bars diverge from batch:\n$got\nvs\n$expect")
      // the straggler (11.0 at 00:02) updated the click bar BEFORE it
      // finalized: open stays 5.0 (00:01), high becomes 11.0
      val click = got.find(_._1 == "click").get
      assert(click._3 == 5.0 && click._4 == 11.0 && click._7 == 4)
      // same-second tie in the view bar broke by event_id: open=1.0 (id 5),
      // close=8.0 (id 6)
      val view = got.find(_._1 == "view").get
      assert(view._3 == 7.0 && view._6 == 8.0)
    } finally q.stop()
  }
}
