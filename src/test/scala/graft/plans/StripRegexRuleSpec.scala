package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class StripRegexRuleSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("optimizer rule strips .* wrappers from SQL rlike; results unchanged") {
    StripRedundantRegexWildcards.install(spark)
    spark.read.parquet(s"${graft.TestSpark.sf0001}/documents.parquet")
      .createOrReplaceTempView("strip_probe")
    val q = spark.sql("SELECT doc_id FROM strip_probe WHERE text RLIKE '.*join.*'")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains(".*join.*"), s"wrapper not stripped:\n$optimized")
    val unstripped = spark.sql("SELECT doc_id FROM strip_probe WHERE text RLIKE 'join'")
    assert(q.as[Long].collect().sorted.toSeq == unstripped.as[Long].collect().sorted.toSeq)
    assert(q.count() > 0)
  }

  test("rule leaves non-strippable patterns alone") {
    StripRedundantRegexWildcards.install(spark)
    spark.read.parquet(s"${graft.TestSpark.sf0001}/documents.parquet")
      .createOrReplaceTempView("strip_probe2")
    val q = spark.sql("SELECT doc_id FROM strip_probe2 WHERE text RLIKE '(?s).*join'")
    assert(q.queryExecution.optimizedPlan.toString.contains("(?s).*join"))
    assert(q.count() > 0)
  }
}
