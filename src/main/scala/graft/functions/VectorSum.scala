package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator: elementwise sum of `array<double>` vectors — the
  * mergeable building block for distributed centroid means (k-means /
  * IVF training): each partition folds its vectors locally and only
  * dim-sized partial sums shuffle, never the vectors. Dimension is
  * learned from the first row (empty buffer = identity), so no dim
  * parameter leaks into the API. */
class VectorSum extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  override def zero: Array[Double] = Array.emptyDoubleArray
  override def reduce(buf: Array[Double], v: Seq[Double]): Array[Double] = {
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
  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b else if (b.isEmpty) a
    else {
      val (dst, src) = if (a.length >= b.length) (a, b) else (b, a)
      var i = 0
      while (i < src.length) { dst(i) += src(i); i += 1 }
      dst
    }
  override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object VectorSum {
  def apply(vecCol: Column): Column = udaf(new VectorSum).apply(vecCol)
}
