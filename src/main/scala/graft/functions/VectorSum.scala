package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator: elementwise EXACT sum of `array<bigint>` vectors —
  * the mergeable building block for distributed centroid means (k-means /
  * IVF training): each partition folds its vectors locally and only
  * dim-sized partial sums shuffle, never the vectors.
  *
  * Components are pre-quantized fixed-point longs (the caller scales, e.g.
  * ×10⁶), so the sum is integer-exact and independent of partition and
  * merge order — a double accumulator would make trained centroids
  * nondeterministic across runs AND unreproducible by an external engine
  * (the x25 oracle replays these sums in SQL). Dimension is learned from
  * the first row (empty buffer = identity), so no dim parameter leaks into
  * the API. */
class VectorSum extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
    if (v == null) buf
    else if (buf.isEmpty) v.toArray
    else {
      var i = 0
      val n = math.min(buf.length, v.length)
      while (i < n) { buf(i) += v(i); i += 1 }
      buf
    }
  }
  // min-length like reduce: ragged inputs degrade consistently (shorter
  // vector zero-padded in effect) instead of merge alone throwing
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b else if (b.isEmpty) a
    else {
      val (dst, src) = if (a.length >= b.length) (a, b) else (b, a)
      var i = 0
      while (i < src.length) { dst(i) += src(i); i += 1 }
      dst
    }
  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object VectorSum {
  def apply(vecCol: Column): Column = udaf(new VectorSum).apply(vecCol)
}
