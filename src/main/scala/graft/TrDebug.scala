import org.apache.spark.sql.SparkSession
object TrDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    for (sf <- Seq("0.001", "0.1"); rep <- 1 to 2) {
      val docs = spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
      var t0 = System.nanoTime()
      force(graft.ops.Dedup.winnowFingerprints(docs, "doc_id", "text", 3, 4))
      println(s"sf$sf rep$rep winnowFingerprints: ${(System.nanoTime()-t0)/1e9}")
      t0 = System.nanoTime()
      force(graft.ops.Dedup.winnowMatches(docs, "doc_id", "text", 3, 4, 2, 20))
      graft.Cleanup.drain()
      println(s"sf$sf rep$rep winnowMatches: ${(System.nanoTime()-t0)/1e9}")
    }
  }
}
