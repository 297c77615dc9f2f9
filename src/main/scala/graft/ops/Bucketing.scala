package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables for shuffle-free co-located joins —
  * the standing answer to "this fact-fact join shuffles every run" at
  * 100 TB: pay the partitioning once at write time, then every subsequent
  * equi-join/aggregation on the bucket key skips its exchange.
  */
object Bucketing {

  /** Write a DataFrame as a bucketed, bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on their join keys; with matching bucket
    * counts Spark plans a SortMergeJoin with NO Exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
