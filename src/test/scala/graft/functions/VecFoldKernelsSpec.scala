package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-15 ANN fold kernels (the HashedBow parity pattern): each native
  * kernel is pinned BIT-identical to the CodegenFallback HOF fold it
  * replaces — same element order, same per-element operations, same
  * widening — over deterministic pseudo-random data in both float and
  * double array element types. Doubles compare by raw bits, not by ≈.
  */
class VecFoldKernelsSpec extends AnyFunSuite {
  import TestSpark.spark

  private val n = 500
  private val dim = 64

  // deterministic pseudo-random test relation: double and float vectors,
  // long "code"/"chunk" arrays — the shapes the production sites feed
  private def base = spark.range(n).select(
    col("id"),
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(col("id"), i), lit(2001L)).cast("double") - 1000.0) / 997.0)
      .as("vd"),
    transform(sequence(lit(0), lit(dim - 1)), i =>
      ((pmod(xxhash64(col("id"), i, lit(3)), lit(2001L)).cast("double") - 1000.0) / 991.0)
        .cast("float")).as("vf"),
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(col("id"), i, lit(5)), lit(255L)) - 127L)).as("ca"),
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(col("id"), i, lit(7)), lit(255L)) - 127L)).as("cb"),
    transform(sequence(lit(0), lit(3)), i =>
      xxhash64(col("id"), i, lit(11))).as("ha"),
    transform(sequence(lit(0), lit(3)), i =>
      when(pmod(xxhash64(col("id"), i, lit(13)), lit(2)) === 0,
        xxhash64(col("id"), i, lit(11))) // half the chunks agree
        .otherwise(xxhash64(col("id"), i, lit(17)))).as("hb"))

  private def bitsEqual(dfGot: org.apache.spark.sql.DataFrame): Unit = {
    val rows = dfGot.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (r.get(0), r.get(1)) match {
        case (a: java.lang.Double, b: java.lang.Double) =>
          assert(java.lang.Double.doubleToRawLongBits(a) ==
            java.lang.Double.doubleToRawLongBits(b),
            s"raw double bits differ: $a vs $b")
        case (a, b) => assert(a == b, s"$a vs $b")
      }
    }
  }

  test("VecXorPopcount == aggregate(zip_with(bit_count(xor)))") {
    bitsEqual(base.select(
      VectorFunctions.vecXorPopcount(col("ha"), col("hb")),
      aggregate(zip_with(col("ha"), col("hb"),
        (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
        lit(0L), (s, x) => s + x)))
  }

  test("VecDotLong == aggregate(zip_with(a*b)) and overflows LOUDLY") {
    bitsEqual(base.select(
      VectorFunctions.vecDotLong(col("ca"), col("cb")),
      aggregate(zip_with(col("ca"), col("cb"), (a, b) => a * b),
        lit(0L), (s, x) => s + x)))
    // ANSI parity: a long overflow kills the query, never wraps
    val big = spark.range(1).select(
      array(lit(Long.MaxValue), lit(Long.MaxValue)).as("a"),
      array(lit(2L), lit(2L)).as("b"))
    val e = intercept[Exception](
      big.select(VectorFunctions.vecDotLong(col("a"), col("b"))).collect())
    def root(t: Throwable): Throwable =
      if (t.getCause == null) t else root(t.getCause)
    assert(root(e).isInstanceOf[ArithmeticException], s"must be loud: $e")
  }

  test("VecEqCount == aggregate(zip_with(when(===,1).otherwise(0)))") {
    bitsEqual(base.select(
      VectorFunctions.vecEqCount(col("ha"), col("hb")),
      aggregate(zip_with(col("ha"), col("hb"),
        (x, y) => when(x === y, 1).otherwise(0)), lit(0), (s, x) => s + x)))
    // and the planted agreement actually exercises both branches
    val tot = base.select(sum(VectorFunctions.vecEqCount(col("ha"), col("hb"))))
      .head().getLong(0)
    assert(tot > 0 && tot < n.toLong * 4, s"agreement census degenerate: $tot")
  }

  test("VecL2Sq == aggregate(zip_with((x-y)*(x-y))) — double×double and " +
       "float×double") {
    val scaled = transform(col("vd"), x => x * lit(0.5))
    bitsEqual(base.select(
      VectorFunctions.vecL2Sq(col("vd"), scaled),
      aggregate(zip_with(col("vd"), scaled,
        (x, y) => (x - y) * (x - y)), lit(0.0), (s, x) => s + x)))
    bitsEqual(base.select(
      VectorFunctions.vecL2Sq(col("vf"), col("vd")),
      aggregate(zip_with(col("vf"), col("vd"),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0), (s, x) => s + x)))
  }

  test("VecDotPlus == VecDot(q, zip_with(a, b, +)) — the fused ADC score") {
    val scaled = transform(col("vd"), x => x * lit(0.25))
    bitsEqual(base.select(
      VectorFunctions.vecDotPlus(col("vf"), col("vd"), scaled),
      VectorFunctions.vecDot(col("vf"),
        zip_with(col("vd"), scaled, (a, b) => a + b))))
  }

  test("VecResidL2Sq == nested-HOF residual norm² against a literal component") {
    val comp = (0 until dim).map(i => math.sin(i + 1) / 3.0)
    val vl = array(comp.map(lit): _*)
    val d = VectorFunctions.vecDot(col("vd"), vl)
    val w = zip_with(col("vd"), vl, (x, b) => x - d * b)
    bitsEqual(base.select(
      VectorFunctions.vecResidL2Sq(col("vd"), d, comp),
      aggregate(zip_with(w, w, (x, y) => x * y), lit(0.0), (s, x) => s + x)))
  }

  test("VecDotScaled == aggregate(zip_with((x/div)*l)) for a NON-power-of-two " +
       "divisor (operation order preserved, not algebraically folded)") {
    for (div <- Seq(32.0, 24.0)) {
      bitsEqual(base.select(
        VectorFunctions.vecDotScaled(col("vd"), col("vf"), div),
        aggregate(zip_with(col("vd"), col("vf"),
          (x, l) => (x / lit(div)) * l), lit(0.0), (s, x) => s + x)))
    }
  }

  test("VecSub == zip_with(a, b, double(x) - y), float widened per side") {
    val rows = base.select(
      VectorFunctions.vecSub(col("vf"), col("vd")),
      zip_with(col("vf"), col("vd"), (x, y) => x.cast("double") - y)).collect()
    rows.foreach { r =>
      val a = r.getSeq[Double](0); val b = r.getSeq[Double](1)
      assert(a.size == b.size)
      a.indices.foreach(i =>
        assert(java.lang.Double.doubleToRawLongBits(a(i)) ==
          java.lang.Double.doubleToRawLongBits(b(i))))
    }
  }

  test("BinarizeSign kernel == the round-14 Column-tree formulation " +
       "(sum of distinct powers per 32-bit chunk, strict > 0 rule)") {
    // the exact expression tree binarizeSign shipped through round 14
    def treeForm(vec: org.apache.spark.sql.Column, dim: Int) = {
      val chunks = (dim + 31) / 32
      array((0 until chunks).map { c =>
        val hi = math.min(32, dim - c * 32)
        (0 until hi).map(j =>
          when(element_at(vec, c * 32 + j + 1) > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _)
      }: _*)
    }
    for (d <- Seq(64, 33, 7)) { // full chunks, ragged tail, sub-chunk
      val rows = base.select(
        VectorFunctions.binarizeSign(col("vf"), d),
        treeForm(col("vf"), d)).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"dim $d: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
      }
      // double-element arrays too (the float/double widening seam)
      val rowsD = base.select(
        VectorFunctions.binarizeSign(col("vd"), d),
        treeForm(col("vd"), d)).collect()
      rowsD.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    }
  }

  test("wrong element types are rejected at ANALYSIS, not read as garbage " +
       "(the SQL surface's int-literal trap)") {
    GraftFunctions.register(TestSpark.spark)
    // array(1, 2) is array<int> — the natural pure-SQL literal; typed
    // getters would stride-misread it, so analysis must refuse
    for (q <- Seq(
      "SELECT vec_dot_long(array(1, 2), array(3, 4))",
      "SELECT vec_xor_popcount(array(1, 2), array(3, 4))",
      "SELECT vec_eq_count(array(1, 2), array(1, 2))",
      "SELECT vec_dot(array(1, 2), array(3, 4))",
      "SELECT vec_l2sq(array(1, 2), array(3, 4))",
      "SELECT vec_sub(array(1, 2), array(3, 4))",
      "SELECT binarize_sign(array(1, -1, 1), 3)",
      "SELECT simhash64(array(1, 2))")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](
        TestSpark.spark.sql(q).collect())
      assert(e.getMessage.contains("expects array"), s"$q: ${e.getMessage.take(120)}")
    }
  }

  test("BinarizeSign refuses a vector shorter than dim (loud, never " +
       "zero-filled) and reads only the first dim of a longer one") {
    import TestSpark.spark
    val df = spark.range(1).select(
      array(lit(1.0f), lit(-1.0f)).as("short2"),
      array(lit(1.0), lit(-1.0), lit(0.5), lit(-0.5)).as("long4"))
    val e = intercept[Exception](
      df.select(VectorFunctions.binarizeSign(col("short2"), 3)).collect())
    def root(t: Throwable): Throwable = if (t.getCause == null) t else root(t.getCause)
    assert(root(e).getMessage.contains("refusing to zero-fill"), s"$e")
    // longer vector: first dim components only — same bits as the tree form
    val got = df.select(VectorFunctions.binarizeSign(col("long4"), 3))
      .head().getSeq[Long](0)
    assert(got == Seq(5L), s"bits 0 and 2 set from (+,-,+): $got")
  }

  test("the fold kernels are SQL-callable after registration") {
    GraftFunctions.register(TestSpark.spark)
    val row = TestSpark.spark.sql(
      """SELECT
        |  vec_xor_popcount(array(1L, 255L), array(0L, 0L)) AS h,
        |  vec_dot_long(array(2L, 3L), array(5L, 7L)) AS d,
        |  vec_eq_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS e,
        |  vec_l2sq(array(1.0D, 2.0D), array(0.0D, 0.0D)) AS l,
        |  vec_dot_plus(array(2.0D, 2.0D), array(1.0D, 1.0D), array(2.0D, 3.0D)) AS p,
        |  vec_sub(array(5.0D, 1.0D), array(2.0D, 4.0D)) AS s,
        |  binarize_sign(array(1.0D, -1.0D, 0.5D), 3) AS b
        |""".stripMargin).head()
    assert(row.getAs[Long]("h") == 9L)   // popcount(1) + popcount(255)
    assert(row.getAs[Long]("d") == 31L)  // 10 + 21
    assert(row.getAs[Int]("e") == 2)
    assert(row.getAs[Double]("l") == 5.0)
    assert(row.getAs[Double]("p") == 14.0) // 2*(1+2) + 2*(1+3)
    assert(row.getAs[scala.collection.Seq[Double]]("s").toSeq == Seq(3.0, -3.0))
    assert(row.getAs[scala.collection.Seq[Long]]("b").toSeq == Seq(5L)) // bits 0,2
  }

  test("VecSortedSum == aggregate(array_sort(x), 0.0, +) — the agg-grain " +
       "sorted fold (round-16), raw bits, float and double, ±0.0 ties") {
    import TestSpark.spark
    // projection grain (the post-aggregation shape the sites run at)
    bitsEqual(base.select(
      VectorFunctions.vecSortedSum(col("vd")),
      aggregate(array_sort(col("vd")), lit(0.0), (s, x) => s + x)))
    bitsEqual(base.select(
      VectorFunctions.vecSortedSum(col("vf")),
      aggregate(array_sort(col("vf")), lit(0.0), (s, x) => s + x)))
    // full agg shape: collect_list feeding the fold, exactly the simjoin/
    // meanPool expression — collect_list order is nondeterministic, which
    // is WHY the sort exists; parity must hold through it
    val kv = spark.range(400).select((col("id") % 37).as("g"),
      ((col("id") * 7919L % 1001L).cast("double") - 500.0).as("x"))
    bitsEqual(kv.groupBy(col("g")).agg(
      VectorFunctions.vecSortedSum(collect_list(col("x"))).as("k"),
      aggregate(array_sort(collect_list(col("x"))), lit(0.0),
        (s, x) => s + x).as("h")).select(col("k"), col("h")))
    // the -0.0 / 0.0 tie class the scaladoc argues is sum-order-neutral
    val signedZeros = spark.range(1).select(
      array(lit(-0.0), lit(0.0), lit(-1.5), lit(1.5), lit(-0.0)).as("z"))
    bitsEqual(signedZeros.select(
      VectorFunctions.vecSortedSum(col("z")),
      aggregate(array_sort(col("z")), lit(0.0), (s, x) => s + x)))
    // NaN absorbs identically (canonical payload both ways)
    val withNaN = spark.range(1).select(
      array(lit(Double.NaN), lit(2.0), lit(-3.0)).as("z"))
    bitsEqual(withNaN.select(
      VectorFunctions.vecSortedSum(col("z")),
      aggregate(array_sort(col("z")), lit(0.0), (s, x) => s + x)))
    // SQL-callable
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT vec_sorted_sum(array(3.0D, 1.0D, 2.0D))")
      .head().getDouble(0) == 6.0)
  }

  test("unequal-length inputs raise LOUDLY (never clamp to the shorter) — " +
       "round-16 ADVICE: the HOF forms null-pad; silent clamping is garbage") {
    import TestSpark.spark
    val df = spark.range(1).select(
      array(lit(1.0), lit(2.0), lit(3.0)).as("d3"),
      array(lit(1.0), lit(2.0)).as("d2"),
      array(lit(1L), lit(2L), lit(3L)).as("l3"),
      array(lit(1L), lit(2L)).as("l2"))
    def root(t: Throwable): Throwable = if (t.getCause == null) t else root(t.getCause)
    val cases = Seq(
      df.select(VectorFunctions.vecDot(col("d3"), col("d2"))),
      df.select(VectorFunctions.vecL2Sq(col("d3"), col("d2"))),
      df.select(VectorFunctions.vecSub(col("d3"), col("d2"))),
      df.select(VectorFunctions.vecDotScaled(col("d3"), col("d2"), 2.0)),
      df.select(VectorFunctions.vecDotPlus(col("d3"), col("d3"), col("d2"))),
      df.select(VectorFunctions.vecDotPlus(col("d2"), col("d3"), col("d3"))),
      df.select(VectorFunctions.vecXorPopcount(col("l3"), col("l2"))),
      df.select(VectorFunctions.vecDotLong(col("l3"), col("l2"))),
      df.select(VectorFunctions.vecEqCount(col("l3"), col("l2"))))
    cases.foreach { q =>
      val e = intercept[Exception](q.collect())
      assert(root(e).getMessage.contains("refusing to clamp"),
        s"must refuse the clamp: ${root(e).getMessage.take(160)}")
    }
    // VecResidL2Sq: component/vector dim mismatch refuses the truncated fold
    val er = intercept[Exception](df.select(
      VectorFunctions.vecResidL2Sq(col("d3"), lit(0.5), Seq(1.0, 2.0))).collect())
    assert(root(er).getMessage.contains("refusing to truncate"), s"$er")
  }

  test("NULL array elements raise LOUDLY instead of reading as 0 — round-16 " +
       "ADVICE: the silent-garbage class on the SQL surface") {
    import TestSpark.spark
    // array(lit, nullLit) types as containsNull=true — the guarded path
    val df = spark.range(1).select(
      array(lit(1.0), lit(null).cast("double")).as("dn"),
      array(lit(1.0), lit(2.0)).as("d2"),
      array(lit(1L), lit(null).cast("long")).as("ln"),
      array(lit(1L), lit(2L)).as("l2"))
    def root(t: Throwable): Throwable = if (t.getCause == null) t else root(t.getCause)
    val cases = Seq(
      df.select(VectorFunctions.vecDot(col("dn"), col("d2"))),
      df.select(VectorFunctions.vecDot(col("d2"), col("dn"))),
      df.select(VectorFunctions.vecL2Sq(col("dn"), col("d2"))),
      df.select(VectorFunctions.vecSub(col("dn"), col("d2"))),
      df.select(VectorFunctions.vecDotScaled(col("dn"), col("d2"), 2.0)),
      df.select(VectorFunctions.vecDotPlus(col("d2"), col("dn"), col("d2"))),
      df.select(VectorFunctions.vecXorPopcount(col("ln"), col("l2"))),
      df.select(VectorFunctions.vecDotLong(col("ln"), col("l2"))),
      df.select(VectorFunctions.vecEqCount(col("ln"), col("l2"))),
      df.select(VectorFunctions.binarizeSign(col("dn"), 2)),
      df.select(VectorFunctions.vecResidL2Sq(col("dn"), lit(0.5), Seq(1.0, 2.0))))
    cases.foreach { q =>
      val e = intercept[Exception](q.collect())
      assert(root(e).getMessage.contains("NULL array element"),
        s"must be loud: ${root(e).getMessage.take(160)}")
    }
    // and a containsNull=true array WITHOUT actual nulls (the parquet-read
    // embedding shape) still computes — the guard gates on values, not schema
    val nullableNoNulls = array(when(lit(true), lit(3.0)), when(lit(true), lit(4.0)))
    val ok = df.select(VectorFunctions.vecDot(col("d2"), nullableNoNulls))
    assert(ok.head().getDouble(0) == 11.0)
  }

  test("wrong argument COUNT is a clean analysis error naming the function " +
       "and arity, not an IndexOutOfBoundsException — round-16 ADVICE") {
    GraftFunctions.register(TestSpark.spark)
    for ((q, fn) <- Seq(
      ("SELECT vec_dot_plus(array(1.0D), array(2.0D))", "vec_dot_plus"),
      ("SELECT binarize_sign(array(1.0D, -1.0D))", "binarize_sign"),
      ("SELECT vec_dot(array(1.0D))", "vec_dot"),
      ("SELECT simhash64(array('a'), 2)", "simhash64"),
      ("SELECT hashed_bow(array('a'), 16)", "hashed_bow"))) {
      val e = intercept[org.apache.spark.sql.AnalysisException](
        TestSpark.spark.sql(q).collect())
      assert(e.getMessage.contains(fn) && e.getMessage.contains("parameters"),
        s"$q: ${e.getMessage.take(160)}")
    }
  }

  test("fold kernels stay inside whole-stage codegen (no CodegenFallback " +
       "subtree in the plan)") {
    // materialize the synthesized arrays first: the transform() HOFs that
    // BUILD the test data are themselves CodegenFallback and would drag
    // the whole projection to interpreted eval — production sites read
    // plain array columns from parquet/cache
    val mat = base.localCheckpoint(false)
    val df = mat.select(
      VectorFunctions.vecXorPopcount(col("ha"), col("hb")).as("h"),
      VectorFunctions.vecDotLong(col("ca"), col("cb")).as("d"),
      VectorFunctions.vecL2Sq(col("vd"), col("vf")).as("l"))
    // the `*(n)` prefix in the plan string IS the WholeStageCodegen marker;
    // assert the projection node itself carries it (an interpreted fallback
    // would print an unstarred Project)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*("),
      s"kernel projection fell out of whole-stage codegen:\n$plan")
    mat.unpersist()
  }
}
