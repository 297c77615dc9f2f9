package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for graft's native expressions, so the library is usable
  * from pure `spark.sql(...)`:
  *
  *   SELECT vec_dot(a, b)                 -- double dot product
  *   SELECT shingle_ngrams(tokens, 3)     -- distinct word n-grams
  *   SELECT minhash_sig(shingles, 64)     -- minhash signature array
  *   SELECT simhash64(tokens)             -- 64-bit simhash
  *
  * Register either at runtime with `GraftFunctions.register(spark)`, or at
  * session build time via
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.StripRedundantRegexWildcards)
  }
}

object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def stringLit(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }

  val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))),
    ("shingle_ngrams",
      new ExpressionInfo(classOf[ShingleNGrams].getName, "shingle_ngrams"),
      (args: Seq[Expression]) => ShingleNGrams(args(0), intLit(args(1), "n"))),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args(0), intLit(args(1), "k"))),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    ("text_fingerprint",
      new ExpressionInfo(classOf[Fingerprint].getName, "text_fingerprint"),
      (args: Seq[Expression]) => Fingerprint(args(0))),
    ("bloom_might_contain",
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      // (str, bloomB64) — the serialized filter travels as a base64 string
      // literal, decoded once at plan time (a filter artifact in a config
      // store or table property is exactly a string)
      (args: Seq[Expression]) => BloomMightContain(args(0),
        new BloomBits(java.util.Base64.getDecoder.decode(stringLit(args(1), "bloomB64"))))),
    ("sign_band_buckets",
      new ExpressionInfo(classOf[SignBandBuckets].getName, "sign_band_buckets"),
      // (vec, bitsPerBand, bands, dim) — planes derived deterministically
      // inside the expression (Hyperplanes.matrix), never passed as literals
      (args: Seq[Expression]) =>
        SignBandBuckets(args(0), intLit(args(1), "bitsPerBand"),
          intLit(args(2), "bands"), intLit(args(3), "dim"))),
    ("hashed_bow",
      new ExpressionInfo(classOf[HashedBow].getName, "hashed_bow"),
      // (tokens, dim, maxN, features) — the classifier/DSIR hashing-trick
      // feature map (round 14): counts when features=0, density-relative
      // doubles when 1
      (args: Seq[Expression]) =>
        HashedBow(args(0), intLit(args(1), "dim"), intLit(args(2), "maxN"),
          intLit(args(3), "features") != 0)),
    // the round-15 ANN fold kernels (DESIGN §18) — the per-candidate
    // scoring primitives, SQL-callable so a pure-SQL user gets the same
    // codegen'd hot path the Column API wires
    ("vec_xor_popcount",
      new ExpressionInfo(classOf[VecXorPopcount].getName, "vec_xor_popcount"),
      (args: Seq[Expression]) => VecXorPopcount(args(0), args(1))),
    ("vec_dot_long",
      new ExpressionInfo(classOf[VecDotLong].getName, "vec_dot_long"),
      (args: Seq[Expression]) => VecDotLong(args(0), args(1))),
    ("vec_eq_count",
      new ExpressionInfo(classOf[VecEqCount].getName, "vec_eq_count"),
      (args: Seq[Expression]) => VecEqCount(args(0), args(1))),
    ("vec_l2sq",
      new ExpressionInfo(classOf[VecL2Sq].getName, "vec_l2sq"),
      (args: Seq[Expression]) => VecL2Sq(args(0), args(1))),
    ("vec_dot_plus",
      new ExpressionInfo(classOf[VecDotPlus].getName, "vec_dot_plus"),
      (args: Seq[Expression]) => VecDotPlus(args(0), args(1), args(2))),
    ("vec_sub",
      new ExpressionInfo(classOf[VecSub].getName, "vec_sub"),
      (args: Seq[Expression]) => VecSub(args(0), args(1))),
    ("binarize_sign",
      new ExpressionInfo(classOf[BinarizeSign].getName, "binarize_sign"),
      (args: Seq[Expression]) => BinarizeSign(args(0), intLit(args(1), "dim"))),
  )
  // LangId, NearestCentroids, VecResidL2Sq and VecDotScaled stay
  // Column-API-only: their lexicon / centroid-matrix / component-vector /
  // double-divisor parameters aren't expressible as SQL integer literals.

  /** Runtime registration on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
