package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as a typed, MERGEABLE `Aggregator` (the UDAF surface
  * — SURVEY §7.3 named this the one candidate for a custom Aggregator):
  * input is a pre-hashed shingle (xxhash64, seed 42 — the SQL default, so
  * `xxhash64(g)` in a projection feeds it), the buffer is the running
  * k-lane minimum, and `merge` is the element-wise min — associative and
  * commutative, so Spark computes partial signatures map-side and merges
  * them in the exchange like any built-in aggregate.
  *
  * Same lane arithmetic as the `MinHashSig` kernel (SplitMix-derived
  * (a_j, b_j), (a·h + b) mod p), proven equal in the spec suite. When to
  * use which: the kernel is one pass over a document's shingle ARRAY — the
  * fast per-row path; the Aggregator works over EXPLODED (doc, shingle)
  * ROWS — the shape you're in when shingles arrive as rows (a shingle
  * inverted index, a streamed tokenizer, a pre-shuffled corpus), where
  * re-collecting arrays per doc just to call the kernel would cost an
  * extra aggregation anyway.
  */
class MinHashAgg(k: Int, p: Long = 2147483647L)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private val as: Array[Long] =
    Array.tabulate(k)(j => Math.floorMod(SplitMix.mix64(j.toLong), p - 1) + 1L)
  private val bs: Array[Long] =
    Array.tabulate(k)(j => Math.floorMod(SplitMix.mix64(j.toLong + 0x51AF_E00DL), p))

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], h0: Long): Array[Long] = {
    val h = ((h0 % p) + p) % p
    var j = 0
    while (j < k) {
      val v = (as(j) * h + bs(j)) % p
      if (v < buf(j)) buf(j) = v
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Column-API handle: `df.groupBy(id).agg(MinHashAgg.udaf(64)(col("h")))`
    * where `h = xxhash64(shingle)` (seed 42, the SQL default — identical
    * to the kernel's internal hash).
    */
  def udaf(k: Int, p: Long = 2147483647L): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MinHashAgg(k, p), Encoders.scalaLong)
}
