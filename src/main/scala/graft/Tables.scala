package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table readers for the driver-provided parquet testdata.
  *
  * `events.ts` has been written by the driver as parquet TIMESTAMP(NANOS)
  * in some rounds and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others,
  * so the reader dispatches on the type that actually arrives:
  *   - NANOS: Spark rejects it by default (PARQUET_TYPE_ILLEGAL); we read
  *     nanos as LONG via the legacy conf and convert to a microsecond
  *     TIMESTAMP with integer division — exactly the truncation DuckDB
  *     applies when it loads nanosecond timestamps into its native
  *     microsecond TIMESTAMP, so oracle comparisons stay bit-identical.
  *     (Float division would corrupt: epoch nanos ~1.7e18 exceeds the
  *     2^53 double mantissa.)
  *   - MICROS (not UTC-adjusted): arrives as TIMESTAMP_NTZ; cast to the
  *     session-local TIMESTAMP, which under the UTC session timezone every
  *     entry point sets is the same instant DuckDB's naive TIMESTAMP read
  *     yields.
  */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
