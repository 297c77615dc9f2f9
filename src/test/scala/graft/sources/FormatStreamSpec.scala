package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** STREAMING leg of the source-format matrix: the JSON-lines mirror —
  * the splittable self-describing format the FormatMatrix scaladoc
  * prescribes for record streams — is consumed through `readStream`
  * (file-stream source, explicit schema, FAILFAST) and must produce the
  * SAME census as the batch parquet leg. This is the "a crawl lands as
  * JSON-lines files and the pipeline tails the directory" shape: the
  * census aggregate is the identical expression batch runs, behind a
  * complete-mode aggregation — no op changes between the two regimes
  * (the repo's batch/stream twin convention). maxFilesPerTrigger forces
  * MULTIPLE micro-batches, so the equality also witnesses that the
  * running aggregate converges to the batch answer across batch
  * boundaries, not just on a single-batch lucky read.
  */
class FormatStreamSpec extends AnyFunSuite {
  import graft.TestSpark.{spark, sf0001}

  test("file-streamed JSON-lines mirror census equals the batch parquet census across micro-batches") {
    // the sf0.001 mirror lands in ONE part file (single-partition read);
    // re-write a 4-file copy so maxFilesPerTrigger=1 genuinely produces
    // four micro-batches — the cross-batch convergence is the point
    val root = java.nio.file.Files
      .createTempDirectory("graft-fmt-stream").toFile.getAbsolutePath
    FormatMatrix.readBack(spark, sf0001, "json")
      .repartition(4).write.mode("overwrite").json(s"$root/json")
    // n_langs is dropped from BOTH sides: Structured Streaming rejects
    // exact DISTINCT aggregates (a genuine semantic limit — a streaming
    // deployment swaps in approx_count_distinct, the mergeable HLL);
    // the other five census fields, including the whole-row digest, are
    // the integrity contract and stream exactly
    val batch = FormatMatrix.formatCensus(spark, sf0001)
      .filter(col("format") === "parquet")
      .drop("format", "n_langs").collect().head.toSeq

    val stream = spark.readStream
      .schema(FormatMatrix.docsSchema)
      .option("mode", "FAILFAST")
      .option("maxFilesPerTrigger", "1") // force >1 micro-batch
      .json(s"$root/json")
      .select(col("n_chars"), col("lang"), col("doc_id"),
        conv(substring(md5(concat_ws("\u0001",
          FormatMatrix.docsSchema.fieldNames.map(c => col(c).cast("string")).toSeq: _*)),
          1, 15), 16, 10).cast("decimal(38,0)").as("__h"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("id_min"),
        max(col("doc_id")).as("id_max"),
        sum(col("__h")).cast("string").as("digest"))

    val q = stream.writeStream.format("memory").queryName("fmt_stream_census")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()

    // the number of json part files written at 32 shuffle partitions —
    // confirm the maxFilesPerTrigger=1 setting actually exercised
    // multiple micro-batches rather than one lucky read
    val nFiles = new java.io.File(s"$root/json").listFiles()
      .count(f => f.getName.endsWith(".json"))
    assert(nFiles > 1, s"need >1 part file to witness cross-batch convergence, got $nFiles")

    val streamed = spark.table("fmt_stream_census").collect().head.toSeq
    assert(streamed == batch,
      s"streamed census must equal the batch parquet census: $streamed vs $batch")
  }
}
