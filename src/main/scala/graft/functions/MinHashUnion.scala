package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator: elementwise-min union of per-row MinHash signatures —
  * the sketch of the UNION of the underlying sets (Broder). A group's
  * signature is mergeable map-side, so aggregating a corpus down to one
  * 64-long sketch per group shuffles `nHashes` longs per group instead of
  * the group's n-gram sets — the 100 TB shape for group-level similarity
  * (per-source / per-domain overlap estimation).
  *
  * Spark surface: `Aggregator[IN, BUF, OUT]` registered through `udaf`
  * (SURVEY §2.B UDF/UDAF row). The buffer is a primitive long array;
  * reduce/merge are tight loops, no boxing in the hot path beyond the
  * row-array decode.
  */
class MinHashUnion(nHashes: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  override def zero: Array[Long] = Array.fill(nHashes)(Long.MaxValue)
  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig != null) {
      val n = math.min(nHashes, sig.length)
      var i = 0
      while (i < n) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    }
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }
  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashUnion {
  /** Column form: `minhash_union(sigCol)` aggregate over array<bigint>. */
  def apply(sigCol: Column, nHashes: Int = 64): Column =
    udaf(new MinHashUnion(nHashes)).apply(sigCol)
}
