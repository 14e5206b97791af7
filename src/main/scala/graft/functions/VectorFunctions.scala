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

  /** Deterministic random-hyperplane matrix for [[rhpSignature]]: component
    * (b, d) = (hex64(md5("rhp:b:d")[0,8)) mod 2000001)/1e6 − 1 ∈ [−1, 1.0]
    * (max residue 2000000 → exactly 1.0; both endpoints inclusive).
    * md5 (unlike a Spark-internal hash) is computable bit-for-bit by any
    * engine, so an external oracle can rebuild the exact matrix and replay
    * the whole ANN computation (the x06 DuckDB oracle does). The planes are
    * plan LITERALS: signature evaluation does zero per-row hashing — at
    * corpus scale the matrix is the (tiny, constant) model artifact. */
  def rhpPlanes(nBits: Int, dims: Int): IndexedSeq[Array[Double]] =
    (0 until nBits).map { b =>
      Array.tabulate(dims) { d =>
        (PortableHash.md5u32(s"rhp:$b:$d") % 2000001L).toDouble / 1000000.0 - 1.0
      }
    }

  /** Random-hyperplane LSH signature: `nBits` sign bits packed big-endian
    * into a long. `dims` must equal the embedding dimensionality — the
    * hyperplanes are pre-materialized literals, not per-row hashes, so a
    * mismatched vector can't adapt; it fails the per-row guard loudly
    * instead of producing silently wrong signatures (which would
    * desynchronize from the probe side's query signature). */
  def rhpSignature(vec: Column, nBits: Int, dims: Int = 64): Column = {
    val v = vec.cast("array<double>")
    // one 1-band × nBits-bit call of the native band expression = the
    // packed signature (same planes, same 1L << (nBits-1-b) packing,
    // same sequential IEEE dots) — ONE codegen'd loop instead of nBits
    // composed dot expressions (2× on the index build; VectorExprSpec
    // pins native == composed bit parity)
    val sig = element_at(VectorExpressions.rhpBandsNative(v, 1, nBits, dims), 1)
    when(v.isNull, raise_error(lit("rhpSignature: null vector")))
      .when(size(v) === dims, sig)
      .otherwise(raise_error(concat(
        lit(s"rhpSignature: expected $dims-dim vector, got "), size(v).cast("string"))))
  }

  /** Driver-side twin of [[VectorExpressions.rhpBandsNative]] for a
    * constant query vector: band j packs the sign bits of planes
    * [j*bandBits, (j+1)*bandBits) big-endian — the identical plane order,
    * packing and sequential IEEE accumulation as the column expression,
    * so a query's band values land in exactly the buckets the index build
    * produced. Feeds [[graft.ops.Similarity.annProbeBanded]]'s literal
    * band keys. */
  def rhpBandsLocal(vec: Seq[Double], nBands: Int, bandBits: Int): IndexedSeq[Long] = {
    val planes = rhpPlanes(nBands * bandBits, vec.length)
    (0 until nBands).map { j =>
      var bv = 0L
      var b = 0
      while (b < bandBits) {
        val p = planes(j * bandBits + b)
        var s = 0.0
        var i = 0
        while (i < p.length) { s += vec(i) * p(i); i += 1 }
        if (s > 0) bv |= 1L << (bandBits - 1 - b)
        b += 1
      }
      bv
    }
  }

  /** Driver-side twin of [[rhpSignature]] for a constant query vector —
    * the same sequential IEEE accumulation as [[dot]], so the resulting
    * signature is bit-identical to what the column form would produce. */
  def rhpSignatureLocal(vec: Seq[Double], nBits: Int): Long =
    rhpPlanes(nBits, vec.length).zipWithIndex.map { case (p, b) =>
      var s = 0.0
      var i = 0
      while (i < p.length) { s += vec(i) * p(i); i += 1 }
      if (s > 0) 1L << (nBits - 1 - b) else 0L
    }.sum
}
