package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}
  import spark.implicits._

  private lazy val media =
    Multimodal.fromDocuments(spark.read.parquet(s"$sf0001/documents.parquet"))

  test("media schema: binary payload + typed metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("format", "width", "height", "n_bytes"))
  }

  test("extractFeatures (mapPartitions batch path) matches direct computation") {
    val feats = Multimodal.extractFeatures(media)
      .select("media_id", "byte_sum").as[(Long, Long)].collect().toMap
    val direct = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", aggregate(
        transform(split($"text", ""), c => ascii(c).cast("long")),
        lit(0L), (a, c) => a + c).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(feats == direct)
  }

  test("sampleFrames: every stride-th frame, last frame may be short") {
    val payload = ("x" * 200).getBytes("UTF-8") // 200 bytes, 64-byte frames
    val df = Seq((1L, payload)).toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(df, frameBytes = 64, stride = 2)
      .as[(Long, Int, Int)].collect().toSet
    // indices 0..3 (200/64=3), stride 2 -> 0 and 2; frame 2 starts at 128, 64 bytes left? 200-128=72 -> 64
    assert(frames == Set((1L, 0, 64), (1L, 2, 64)))
  }

  test("fake decode is deterministic on repeated runs") {
    val a = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val b = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(a.sameElements(b))
  }
}
