package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE's runtime skew-join split — the OTHER half of the skew story next
  * to the explicit salting of q05_salted: when a shuffle join's partition
  * sizes are only knowable at runtime, AQE re-plans the skewed partition
  * into multiple splits (OptimizeSkewedJoin). This spec pins that the
  * engine configuration actually triggers it on a skewed key, so the
  * 100 TB claim ("AQE re-plans skew at runtime") is a tested behavior,
  * not a doc sentence. Thresholds are lowered to make a test-sized
  * partition count as skewed; production uses the defaults.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  import TestSpark.spark

  test("runtime skew split appears in the adaptive plan (skew=true)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // force a sort-merge join and make "skewed" reachable at test size
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // one hot key carries ~99% of the probe side
      val probe = spark.range(200000).select(
        when(col("id") < 198000, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      val build = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = probe.join(build, "k")
      // only the hot key (7) exists on the build side (0..999); the
      // 2000 high ids (≥198000) have no match. collect() (not count())
      // so the adaptive plan we inspect is the one that executed.
      val n = joined.collect().length
      assert(n == 198000, s"join result wrong: $n")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$p")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
    }
  }
}
