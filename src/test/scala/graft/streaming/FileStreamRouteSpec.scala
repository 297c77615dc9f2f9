package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.config._

/** End-to-end streaming routing over a FILE source into a FILE sink (the
  * second source/sink pair besides MemoryStream; the Kafka connector is
  * absent offline). Demonstrates that the router core is source-agnostic
  * and that checkpoint recovery is exactly-once on the file sink.
  */
class FileStreamRouteSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("text-file stream routes with first-match semantics; restart is exactly-once") {
    val inDir = Files.createTempDirectory("graft-fs-in").toFile
    val ckDir = Files.createTempDirectory("graft-fs-ck").toFile
    val outDir = Files.createTempDirectory("graft-fs-out").toFile
    val lines = Seq(
      "line with alpha marker",
      "line with beta marker",
      "nothing interesting",
      "alpha and beta both", // first-match: alpha split wins
    )
    Files.write(new java.io.File(inDir, "batch1.txt").toPath,
      lines.mkString("\n").getBytes("UTF-8"))

    val spliter = PlanResolver.resolveSpliter(Spliter(
      "files", Map("matched" -> "m", "unmatched" -> "u"),
      Seq(
        Split(Extractor("alpha"), outputTopic = Some("t-alpha")),
        Split(Extractor("beta")), // implicit matched -> m
      )))

    def runOnce(): Unit = {
      val src = spark.readStream.text(inDir.getAbsolutePath)
        .select(lit(null).cast("binary").as("key"), col("value"))
      val q = StreamRouter.routeStream(src, spliter)
        .select($"value".cast("string").as("value"), $"topic")
        .writeStream.format("parquet")
        .option("path", outDir.getAbsolutePath)
        .option("checkpointLocation", ckDir.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    runOnce()
    val out = spark.read.parquet(outDir.getAbsolutePath)
      .as[(String, String)].collect().toMap
    assert(out == Map(
      "line with alpha marker" -> "t-alpha",
      "line with beta marker" -> "m",
      "nothing interesting" -> "u",
      "alpha and beta both" -> "t-alpha",
    ))

    // restart with the same checkpoint: no new files => no new rows
    // (exactly-once on the file sink's manifest)
    runOnce()
    assert(spark.read.parquet(outDir.getAbsolutePath).count() == 4)

    // restart WITH new data: exactly the new rows are appended, old batch
    // is not re-emitted — exactly-once across the checkpoint boundary
    Files.write(new java.io.File(inDir, "batch2.txt").toPath,
      Seq("late alpha line", "late nothing").mkString("\n").getBytes("UTF-8"))
    runOnce()
    val all = spark.read.parquet(outDir.getAbsolutePath)
      .as[(String, String)].collect().toMap
    assert(all.size == 6)
    assert(all("late alpha line") == "t-alpha")
    assert(all("late nothing") == "u")
  }
}
