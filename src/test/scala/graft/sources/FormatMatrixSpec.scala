package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The wired source-format matrix (SURVEY §2.2 "scans beyond Kafka"):
  * census equality across all six readers (parquet/ORC/Avro/JSON/CSV/JDBC
  * — Avro through the bundled FQCN source, JDBC through an embedded
  * in-memory Derby database with the partitioned-read options, FormatMatrix
  * scaladoc), the ORC mirror's pushdown + pruning and the JDBC leg's
  * partitioned parallel read (the scan properties that make a non-parquet
  * source a first-class 100 TB citizen, claimed in the FormatMatrix
  * scaladoc), and the loud unknown-format contract.
  */
class FormatMatrixSpec extends AnyFunSuite {
  import graft.TestSpark.{spark, sf0001}

  test("all six format legs produce the identical census row") {
    val rows = FormatMatrix.formatCensus(spark, sf0001).collect()
    assert(rows.length == 6, s"expected 6 format rows, got ${rows.toSeq}")
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("avro", "csv", "jdbc", "json", "orc", "parquet"))
    // every non-format column identical across formats — the whole-row
    // md5 digest makes "identical" mean value-identical, not just counted
    val bodies = rows.map(r => r.toSeq.drop(1)).distinct
    assert(bodies.length == 1,
      s"format legs disagree: ${rows.map(_.toSeq).mkString("; ")}")
    // and the census is non-degenerate (rows counted, digest non-zero)
    assert(rows.head.getLong(1) > 0 && rows.head.getString(6) != "0")
  }

  test("the ORC mirror scan pushes filters and prunes columns") {
    val back = FormatMatrix.readBack(spark, sf0001, "orc")
      .filter(col("doc_id") < 100L)
      .select(col("doc_id"), col("n_chars"))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]"),
      s"ORC scan must push the doc_id filter:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"),
      s"ORC scan must prune to the 2 projected columns:\n$plan")
  }

  test("the JDBC leg reads through 8 stride partitions and pushes filters") {
    val back = FormatMatrix.readBack(spark, sf0001, "jdbc")
    assert(back.rdd.getNumPartitions == 8,
      "partitionColumn/numPartitions must fan the JDBC read out across 8 " +
        "concurrent cursors (the 100 TB parallel-read rule)")
    // a later filter reaches the database as a WHERE clause
    // (pushDownPredicate default-on) — visible as PushedFilters on the
    // JDBC relation node
    val plan = FormatMatrix.readBack(spark, sf0001, "jdbc")
      .filter(col("doc_id") < 100L).select(col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(doc_id,100)"),
      s"JDBC scan must push the doc_id filter:\n$plan")
  }

  test("unknown format fails loudly; mirror is written once per (session, sf dir)") {
    intercept[IllegalArgumentException] {
      FormatMatrix.readBack(spark, sf0001, "feather")
    }
    val r1 = FormatMatrix.mirrorRoot(spark, sf0001)
    val r2 = FormatMatrix.mirrorRoot(spark, sf0001)
    assert(r1 == r2, "mirrorRoot must memoize per (session, sf dir)")
  }
}
