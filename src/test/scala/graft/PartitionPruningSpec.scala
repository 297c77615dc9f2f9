package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Date-partitioned fact-table layout — the canonical 100 TB storage
  * property. A cluster-scale lineitem is laid out as
  * `.../ship_month=YYYY-MM/part-*.parquet`; a query over one month must
  * prune to that month's directories AT PLANNING TIME (PartitionFilters on
  * the scan), never listing or reading the other ~84 months of a 7-year
  * corpus. The IVF persistence spec pins the same property for the
  * bucket-partitioned ANN index; this spec pins it for the time-series /
  * relational side, where it gates every date-bounded query (q01, q03,
  * q06, q15, …) on a partitioned warehouse.
  */
class PartitionPruningSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft-partitioned").toFile.getAbsolutePath
    Tables.read(spark, sf0001, "lineitem")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("ship_month")
      .parquet(s"$d/lineitem_by_month")
    d
  }

  test("one-month query prunes to that month's partitions at plan time") {
    val q = spark.read.parquet(s"$dir/lineitem_by_month")
      .filter(col("ship_month") === "1995-06")
      .groupBy(col("l_returnflag"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(ship_month"),
      s"partition predicate did not reach the scan:\n$p")
    assert(p.contains("(ship_month"), s"equality not in PartitionFilters:\n$p")
    // the month predicate must be handled by directory pruning, not row
    // filtering: no data-filter on ship_month should remain
    assert(!p.contains("PushedFilters: [IsNotNull(ship_month"),
      s"partition column leaked into the row-level pushdown:\n$p")

    // and the pruned read is correct: equals the unpartitioned filter
    val expect = Tables.read(spark, sf0001, "lineitem")
      .filter(date_format(col("l_shipdate"), "yyyy-MM") === "1995-06")
      .groupBy(col("l_returnflag"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val got = q.as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(got == expect)
    assert(got.nonEmpty, "fixture month is empty — pick a covered month")
  }

  test("range predicate over the partition column also prunes") {
    // string yyyy-MM compares lexicographically == chronologically, so a
    // BETWEEN over ship_month is a pure directory-level range prune
    val q = spark.read.parquet(s"$dir/lineitem_by_month")
      .filter(col("ship_month") >= "1995-01" && col("ship_month") < "1995-04")
      .agg(count(lit(1)).as("n"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(ship_month"),
      s"range predicate missing from PartitionFilters:\n$p")
    assert(p.contains("(ship_month") && p.contains(">= 1995-01"),
      s"range bounds not in PartitionFilters:\n$p")
    val n = q.as[Long].head()
    val expect = Tables.read(spark, sf0001, "lineitem")
      .filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1995-04-01")
      .count()
    assert(n == expect)
  }
}
