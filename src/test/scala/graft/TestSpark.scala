package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (Spark startup is ~5 s;
  * per-suite sessions would dominate test time).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    // keep catalog artifacts (derby metastore, warehouse) out of the repo
    System.setProperty("derby.system.home", "/tmp/graft-derby")
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  // the growth-measurement twin (WindowKeySweepSpec): 10× the corpus
  val sf01 = "/root/testdata/sf0.1"
}
