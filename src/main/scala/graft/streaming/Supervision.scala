package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Observability + supervision for the routing fleet.
  *
  * Reference model (main.go:339-345): one shared error channel; any
  * consume/produce error → logger.Fatal → process exit → container restart.
  * Spark-first equivalent: a StreamingQueryListener logging progress
  * (structured, replacing zap — O1), and `awaitAnyFailure` that rethrows
  * the first query failure so the process exits non-zero and the
  * supervisor restarts it. Checkpoints make the restart resume from
  * committed offsets — strictly safer than the reference's
  * commit-ahead-of-flush window (SURVEY §4.3).
  *
  * We do NOT replicate the reference's error-path bug of forwarding a
  * zero-value message after a failed read (main.go:355-359): a failed Spark
  * task retries or fails the query; it never emits phantom rows.
  */
object Supervision {

  /** Structured per-batch progress logging (rows/sec per query), the O1
    * surface. Debug mode additionally logs query start/stop lifecycle.
    */
  final class ProgressLogger(debug: Boolean) extends StreamingQueryListener {
    private val log = org.slf4j.LoggerFactory.getLogger("graft.streaming")
    override def onQueryStarted(e: QueryStartedEvent): Unit =
      if (debug) log.info(s"""{"event":"query_started","name":"${e.name}","id":"${e.id}"}""")
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      log.info(s"""{"event":"progress","name":"${p.name}","batch":${p.batchId},""" +
        s""""numInputRows":${p.numInputRows},"inputRowsPerSecond":${p.inputRowsPerSecond},""" +
        s""""processedRowsPerSecond":${p.processedRowsPerSecond}}""")
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
      log.info(s"""{"event":"query_terminated","id":"${e.id}","exception":${e.exception.map("\"" + _ + "\"").getOrElse("null")}}""")
  }

  def install(spark: SparkSession, debug: Boolean = false): ProgressLogger = {
    val l = new ProgressLogger(debug)
    spark.streams.addListener(l)
    l
  }

  /** Block until any query fails (crash-and-restart model, E1) or all
    * queries terminate cleanly. Rethrows the failure.
    */
  def awaitAnyFailure(spark: SparkSession): Unit = {
    while (spark.streams.active.nonEmpty) {
      spark.streams.awaitAnyTermination()
      spark.streams.active.foreach(_ => ()) // loop: another query may still run
      spark.streams.resetTerminated()
    }
  }
}
