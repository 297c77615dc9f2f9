package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table readers for the driver-provided parquet testdata.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark rejects
  * by default (PARQUET_TYPE_ILLEGAL). We read nanos as LONG via the legacy
  * conf and convert to a microsecond TIMESTAMP with integer division —
  * exactly the truncation DuckDB applies when it loads nanosecond
  * timestamps into its native microsecond TIMESTAMP, so oracle comparisons
  * stay bit-identical. (Float division would corrupt: epoch nanos ~1.7e18
  * exceeds the 2^53 double mantissa.)
  */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
}
