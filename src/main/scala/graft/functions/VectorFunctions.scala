package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns, built from
  * codegen'd higher-order functions (no UDFs → stays inside whole-stage
  * codegen; SURVEY.md §2.B [EXT] similarity surface).
  *
  * All ops promote to double first: float accumulation would diverge from
  * the DuckDB oracle's double math.
  */
object VectorFunctions {

  /** Elementwise dot product — a native codegen'd loop (see
    * [[VectorExpressions.DotProductExpr]]); same sequential accumulation
    * order as the lambda formulation and the oracle. */
  def dot(a: Column, b: Column): Column = VectorExpressions.dotNative(a, b)

  /** The higher-order-function formulation of [[dot]] (kept for cross-
    * checking the native expression in specs). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot/(|a||b|); null-safe on zero vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (cheaper than sqrt when only ranking matters). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane LSH signature: `nBits` sign bits packed into a long.
    * Hyperplane components are derived from xxhash64(bit, dim) — fully
    * deterministic, no driver-side RNG state to ship. */
  def rhpSignature(vec: Column, nBits: Int): Column = {
    val v = vec.cast("array<double>")
    // projection onto plane b: sum_d v[d] * h(b,d), h in [-1,1)
    def proj(b: Column): Column =
      aggregate(zip_with(v, sequence(lit(0), size(v) - 1),
        (x, d) => x * (pmod(xxhash64(b, d), lit(2000001L)).cast("double") / 1000000.0 - 1.0)),
        lit(0.0), (acc, x) => acc + x)
    // big-endian bit packing: acc*2 + bit (shiftleft's shift amount must be
    // a literal, so it can't consume the lambda variable)
    aggregate(sequence(lit(0), lit(nBits - 1)), lit(0L),
      (acc, b) => acc * 2 + when(proj(b) > 0, lit(1L)).otherwise(lit(0L)))
  }
}
