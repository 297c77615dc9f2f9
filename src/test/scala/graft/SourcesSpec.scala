package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source-format surface beyond parquet (SURVEY §2.2 "scans beyond
  * Kafka"): the same table round-trips through CSV and JSON readers with
  * explicit schemas and lands row-identical. The readers are Spark
  * built-ins — the point pinned here is the engine-side discipline that
  * makes them safe at 100 TB: explicit schemas (schema inference reads the
  * data twice and can type-drift between samples), explicit nullValue/
  * escape options, and loss-free column types.
  */
class SourcesSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    .select($"doc_id", $"text", $"lang", $"n_chars")

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("n_chars", LongType)))

  private def collectSorted(df: org.apache.spark.sql.DataFrame) =
    df.select($"doc_id", $"text", $"lang", $"n_chars")
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq

  test("documents round-trip through CSV with explicit schema and quoting") {
    val dir = Files.createTempDirectory("graft-csv").toFile.getAbsolutePath
    docs.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .csv(dir)
    val back = spark.read.schema(docsSchema)
      .option("header", "true").csv(dir)
    assert(collectSorted(back) == collectSorted(docs))
  }

  test("documents round-trip through JSON lines with explicit schema") {
    val dir = Files.createTempDirectory("graft-json").toFile.getAbsolutePath
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docsSchema).json(dir)
    assert(collectSorted(back) == collectSorted(docs))
  }

  test("a query runs identically over a CSV-backed table") {
    val dir = Files.createTempDirectory("graft-csv-q").toFile.getAbsolutePath
    docs.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .csv(dir)
    val csvDocs = spark.read.schema(docsSchema)
      .option("header", "true").csv(dir)
    val fromCsv = csvDocs
      .select($"doc_id", graft.ops.TextAnalysis.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val fromParquet = docs
      .select($"doc_id", graft.ops.TextAnalysis.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(fromCsv == fromParquet)
  }
}
