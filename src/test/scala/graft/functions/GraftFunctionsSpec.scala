package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class GraftFunctionsSpec extends AnyFunSuite {
  import TestSpark.spark

  test("native expressions are callable from pure SQL after registration") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |  shingle_ngrams(array('a','b','c','d'), 3) AS sh,
        |  size(minhash_sig(array('x','y'), 16)) AS k,
        |  simhash64(array('tok1','tok2')) AS s
        |""".stripMargin).head()
    assert(row.getAs[Double]("d") == 32.0)
    assert(row.getAs[scala.collection.Seq[String]]("sh").toSeq == Seq("a b c", "b c d"))
    assert(row.getAs[Int]("k") == 16)
    // simhash of a fixed token set is a stable value
    assert(row.getAs[Long]("s") == spark.sql("SELECT simhash64(array('tok1','tok2')) s").head().getLong(0))
  }

  test("registration is idempotent and arity errors are clear") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark) // no throw
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_ngrams(array('a'), 'not-an-int')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getMessage.toLowerCase.contains("integer"))
  }

  test("SparkSessionExtensions injection path builds") {
    // exercised structurally (a new session with extensions would need its
    // own JVM-level session; the injected builders are identical objects)
    val ext = new GraftExtensions
    assert(GraftFunctions.descriptors.map(_._1).toSet ==
      Set("vec_dot", "shingle_ngrams", "minhash_sig", "simhash64"))
    assert(ext != null)
  }
}
