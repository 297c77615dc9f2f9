package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The wired source-format matrix (SURVEY §2.2 "scans beyond Kafka"):
  * census equality across all five readers (parquet/ORC/Avro/JSON/CSV —
  * Avro through the bundled FQCN source, FormatMatrix scaladoc), the
  * ORC mirror's pushdown + pruning (the scan properties that make a
  * non-parquet source a first-class 100 TB citizen, claimed in the
  * FormatMatrix scaladoc), and the loud unknown-format contract.
  */
class FormatMatrixSpec extends AnyFunSuite {
  import graft.TestSpark.{spark, sf0001}

  test("all five format legs produce the identical census row") {
    val rows = FormatMatrix.formatCensus(spark, sf0001).collect()
    assert(rows.length == 5, s"expected 5 format rows, got ${rows.toSeq}")
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("avro", "csv", "json", "orc", "parquet"))
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

  test("unknown format fails loudly; mirror is written once per (session, sf dir)") {
    intercept[IllegalArgumentException] {
      FormatMatrix.readBack(spark, sf0001, "feather")
    }
    val r1 = FormatMatrix.mirrorRoot(spark, sf0001)
    val r2 = FormatMatrix.mirrorRoot(spark, sf0001)
    assert(r1 == r2, "mirrorRoot must memoize per (session, sf dir)")
  }
}
