package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond parquet: the engine's tables round-
  * trip through ORC, CSV and JSON lines — all operators are format-agnostic
  * because every op consumes a DataFrame (scans beyond Kafka, SURVEY §2.2).
  */
class FormatsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"graft-fmt-$fmt").toFile.getAbsolutePath
    docs.write.mode("overwrite").format(fmt).option("header", "true").save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true").option("inferSchema", "true")
      .load(dir)
    assert(back.count() == docs.count())
    // run a real operator over the re-read frame: lang distribution matches
    val a = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val b = back.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(a == b, s"$fmt round-trip changed the data")
  }

  test("ORC round-trip")(roundTrip("orc"))
  test("JSON-lines round-trip")(roundTrip("json"))
  test("CSV round-trip")(roundTrip("csv"))
}
