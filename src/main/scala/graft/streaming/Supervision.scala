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

    // hand-built JSON must stay VALID: escape strings (exception text holds
    // quotes/newlines) and never emit bare NaN (Spark reports NaN rates on
    // the first batch) — downstream log ingestion rejects both
    private def js(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    private def num(d: Double): String =
      if (d.isNaN || d.isInfinite) "null" else d.toString

    override def onQueryStarted(e: QueryStartedEvent): Unit =
      if (debug) log.info(s"""{"event":"query_started","name":${js(String.valueOf(e.name))},"id":${js(e.id.toString)}}""")
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      log.info(s"""{"event":"progress","name":${js(String.valueOf(p.name))},"batch":${p.batchId},""" +
        s""""numInputRows":${p.numInputRows},"inputRowsPerSecond":${num(p.inputRowsPerSecond)},""" +
        s""""processedRowsPerSecond":${num(p.processedRowsPerSecond)}}""")
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
      log.info(s"""{"event":"query_terminated","id":${js(e.id.toString)},"exception":${e.exception.map(js).getOrElse("null")}}""")
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
    // loop: after a clean termination other queries may still be running
    while (spark.streams.active.nonEmpty) {
      spark.streams.awaitAnyTermination()
      spark.streams.resetTerminated()
    }
  }
}
