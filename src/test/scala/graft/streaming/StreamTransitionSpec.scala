package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events
import StatefulOps.SeqEvent

/** The streaming step extractor reproduces the batch transition matrix:
  * steps emitted across micro-batches (including the cross-batch
  * boundary step held in state) count up to exactly the lag-window
  * matrix over the same rows.
  */
class StreamTransitionSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming steps count to the batch matrix, across batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SeqEvent]
    val q = StatefulOps.streamingTransitionSteps(in.toDS())
      .writeStream.format("memory").queryName("steps_stream")
      .outputMode("append").start()
    try {
      // batch 1 — u1: A,B (same second: order pinned by event_id); u2: B
      in.addData(
        SeqEvent(1L, ts("2024-01-01 00:00:01"), 2L, "B"),
        SeqEvent(1L, ts("2024-01-01 00:00:01"), 1L, "A"),
        SeqEvent(2L, ts("2024-01-01 00:00:05"), 3L, "B"))
      q.processAllAvailable()
      // batch 2 — u1: C (boundary step B→C from state); u2: A
      in.addData(
        SeqEvent(1L, ts("2024-01-01 00:01:00"), 4L, "C"),
        SeqEvent(2L, ts("2024-01-01 00:01:00"), 5L, "A"))
      q.processAllAvailable()

      val stepCounts = spark.sql(
        "SELECT prev_type, event_type, count(*) AS cnt FROM steps_stream GROUP BY 1, 2")
        .as[(String, String, Long)].collect().toSet
      val batch = Events.transitionMatrix(Seq(
        (1L, ts("2024-01-01 00:00:01"), 1L, "A", 0.0),
        (2L, ts("2024-01-01 00:00:01"), 1L, "B", 0.0),
        (3L, ts("2024-01-01 00:00:05"), 2L, "B", 0.0),
        (4L, ts("2024-01-01 00:01:00"), 1L, "C", 0.0),
        (5L, ts("2024-01-01 00:01:00"), 2L, "A", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
        .select($"prev_type", $"event_type", $"cnt")
        .as[(String, String, Long)].collect().toSet
      assert(stepCounts == batch,
        s"streaming step counts $stepCounts != batch matrix $batch")
      assert(stepCounts == Set(("A", "B", 1L), ("B", "C", 1L), ("B", "A", 1L)))
    } finally q.stop()
  }
}
