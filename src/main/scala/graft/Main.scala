package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.config.EnvConfig
import graft.streaming.{StreamRouter, Supervision}

/** Production entry point: the reference's deployment contract on Spark.
  * Decodes SPLIT_CONF from the environment, launches one streaming query
  * per spliter against Kafka, supervises fail-fast (reference
  * main.go:127-346 lifecycle; SURVEY §3.4 mapping).
  *
  * Not exercisable in the offline build environment (no Kafka connector
  * jar, SURVEY §7.0) — the config decode, plan resolution, routing
  * expression, and supervision pieces it composes are all covered by the
  * spec suite via MemoryStream.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val cfg = EnvConfig.fromEnv()
    val builder = SparkSession.builder()
      .appName("graft-router")
      .config("spark.sql.session.timeZone", "UTC")
    // under spark-submit the master comes from the launcher; fall back to
    // local[*] so the entry point is runnable standalone in dev
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master(sys.env.getOrElse("SPARK_MASTER", "local[*]")))
      .getOrCreate()
    if (cfg.debug) spark.sparkContext.setLogLevel("DEBUG")
    Supervision.install(spark, cfg.debug)

    val spliters = cfg.resolvedSpliters
    require(spliters.nonEmpty, "SPLIT_CONF contains no spliters")

    spliters.foreach { s =>
      val src = StreamRouter.fromKafka(
        spark, cfg.brokerList, s, cfg.groupPrefix, cfg.groupSuffix,
        cfg.kafkaSourceOptions)
      StreamRouter.toKafka(
          StreamRouter.routeStream(src, s),
          cfg.brokerList,
          s"${cfg.checkpointRoot}/${s.inputTopic}",
          Trigger.ProcessingTime(cfg.writerBatchTimeout),
          cfg.kafkaSinkOptions)
        .queryName(s"route-${s.inputTopic}")
        .start()
    }
    // O1 parity: the reference logs every match at DEBUG (main.go:511-531);
    // here DEBUG adds a sampled per-message tap query per spliter (own
    // group/checkpoint) so the production plan stays untouched
    if (cfg.debug) spliters.foreach { s =>
      val tapSrc = StreamRouter.fromKafka(
        spark, cfg.brokerList, s, cfg.groupPrefix, s"${cfg.groupSuffix}-tap",
        cfg.kafkaSourceOptions)
      StreamRouter.debugTap(tapSrc, s, s"${cfg.checkpointRoot}/${s.inputTopic}-tap",
          trigger = Trigger.ProcessingTime(cfg.writerBatchTimeout))
        .queryName(s"debug-tap-${s.inputTopic}")
        .start()
    }
    Supervision.awaitAnyFailure(spark)
  }
}
