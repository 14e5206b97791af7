package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 63-bit SimHash over a token array — one pass per row instead of
  * the higher-order-function fold (63 zip_with lambda evaluations per
  * token, interpreted). Bit-for-bit the same fingerprint:
  *
  *  - token hash = md5 (the engine-portable choice the x04 oracle replays
  *    in SQL); hex chars 1–8 are the "hi" 32 bits, 9–16 the "lo" 32 bits,
  *    exactly as the composed form's `conv(substring(h, …), 16, 10)`;
  *  - vote index i holds bit b = 62 − i (big-endian packing via
  *    acc·2 + sign);
  *  - a NULL token element votes −1 on every bit (the composed form's
  *    `when(null === 1L).otherwise(-1)` arm) — preserved for parity.
  */
case class Simhash63Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash63 expects array<string>, got ${other.simpleString}")
    }

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](63)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var k = 0
        while (k < 63) { votes(k) -= 1; k += 1 }
      } else {
        val d = org.apache.commons.codec.digest.DigestUtils.md5(
          arr.getUTF8String(i).getBytes)
        val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
                 ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val lo = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
                 ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var b = 0
        while (b < 63) {
          val bit = if (b < 32) (lo >>> b) & 1L else (hi >>> (b - 32)) & 1L
          votes(62 - b) += (if (bit == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 63) { sig = sig * 2 + (if (votes(k) > 0) 1L else 0L); k += 1 }
    sig
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("simhash63", this,
        "graft.functions.Simhash63Expr")
      s"${ev.value} = $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native MinHash signature of a gram array — one pass per row instead of
  * the HOF fold (nHashes zip_with steps per gram, interpreted). Bit-for-bit
  * parity with the composed forms in [[graft.ops.Dedup]]:
  *
  *  - fast family (portable = false): gram hash = Spark's xxhash64
  *    (XXH64.hashUTF8String, seed 42); member i = xxhash64(h, i) =
  *    hashInt(i, hashLong(h, 42)) — the exact two-argument fold Spark's
  *    XxHash64 expression computes. A NULL gram hashes to the bare seed
  *    (42), matching xxhash64(NULL).
  *  - portable family (portable = true): gram → low-32 md5, member i =
  *    (aᵢ·m + bᵢ) mod 2³¹−1 with [[PortableHash.md5u32]]-derived affine
  *    constants (the x24 oracle's family). A NULL gram is SKIPPED,
  *    matching `least(acc, NULL)`'s null-ignoring semantics.
  */
case class MinhashSigExpr(child: Expression, nHashes: Int, portable: Boolean)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got ${other.simpleString}")
    }

  private val M = 2147483647L
  @transient private lazy val as: Array[Long] =
    Array.tabulate(nHashes)(i => PortableHash.md5u32(s"mh:a:$i") % 268435456L * 2 + 1)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(nHashes)(i => PortableHash.md5u32(s"mh:b:$i") % M)

  def compute(arr: ArrayData): Any = {
    val acc = Array.fill(nHashes)(Long.MaxValue)
    val n = arr.numElements()
    var g = 0
    while (g < n) {
      if (portable) {
        if (!arr.isNullAt(g)) { // null gram → least(acc, NULL) keeps acc
          val d = org.apache.commons.codec.digest.DigestUtils.md5(
            arr.getUTF8String(g).getBytes)
          val m = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
                  ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          var i = 0
          while (i < nHashes) {
            val h = (as(i) * m + bs(i)) % M
            if (h < acc(i)) acc(i) = h
            i += 1
          }
        }
      } else {
        // xxhash64(NULL) = the bare seed — the composed transform kept it
        val base =
          if (arr.isNullAt(g)) 42L
          else org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUTF8String(arr.getUTF8String(g), 42L)
        var i = 0
        while (i < nHashes) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i,
            org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(base, 42L))
          if (h < acc(i)) acc(i) = h
          i += 1
        }
      }
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(acc)
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("minhashSig", this,
        "graft.functions.MinhashSigExpr")
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native token count under the fixed BYTE-complete BPE merge table
  * ([[graft.ops.Bpe.merges]]) — real rank-ordered merge application per
  * word (Sennrich et al. 2016) over UTF-8 byte symbols, not x29's regex
  * proxy. One JVM method call per row from codegen (the RegExpReplace
  * pattern), so the surrounding stage stays whole-stage-compiled, and
  * the per-word merge loop rides [[graft.ops.Bpe]]'s bounded word memo —
  * ~10× cheaper than the replace-chain fold's O(merges × text) rescans.
  * The DuckDB oracle replays the application from the same merge table
  * as a generated replace-chain ([[graft.ops.Bpe.oracleSqlExpr]]). */
case class BpeTokenCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_token_count expects string, got ${other.simpleString}")
    }

  def compute(s: org.apache.spark.unsafe.types.UTF8String): Int =
    graft.ops.Bpe.tokenCount(s.toString)

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("bpeTokenCount", this,
        "graft.functions.BpeTokenCountExpr")
      s"${ev.value} = $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native BPE encode-to-ids under the fixed BYTE-complete merge table —
  * `array<int>` of token ids per row (the x134/p06 hot path). The
  * rank-ordered per-word merge loop ([[graft.ops.Bpe.encodeIdsArray]],
  * memoized per word) replaces the ~160-pass replace-chain fold that
  * made x134/x137/x140 the slowest round-14 queries: the chain rescans
  * the whole brace string once per merge, the loop touches each word
  * once. Bit-parity with the chain form ([[graft.ops.Bpe.encodeIdsChain]])
  * and the local reference is spec-pinned; the DuckDB oracle replays the
  * chain + a vocab CASE chain from the same table
  * ([[graft.ops.Bpe.oracleIdsFromMergedExpr]]). */
case class BpeEncodeIdsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode_ids expects string, got ${other.simpleString}")
    }

  def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.ops.Bpe.encodeIdsArray(s.toString))

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("bpeEncodeIds", this,
        "graft.functions.BpeEncodeIdsExpr")
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  private val fnName = "graft_simhash63"
  private val minhashFnName = "graft_minhash_sig"
  private val bpeFnName = "graft_bpe_token_count"
  private val bpeIdsFnName = "graft_bpe_encode_ids"

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(fnName)
    if (!registry.functionExists(ident))
      registry.createOrReplaceTempFunction(
        fnName, exprs => Simhash63Expr(exprs(0)), "scala_udf")
    val mhIdent = org.apache.spark.sql.catalyst.FunctionIdentifier(minhashFnName)
    if (!registry.functionExists(mhIdent))
      registry.createOrReplaceTempFunction(
        minhashFnName, exprs => MinhashSigExpr(exprs(0),
          litInt(exprs(1)), litBool(exprs(2))), "scala_udf")
    val bpeIdent = org.apache.spark.sql.catalyst.FunctionIdentifier(bpeFnName)
    if (!registry.functionExists(bpeIdent))
      registry.createOrReplaceTempFunction(
        bpeFnName, exprs => BpeTokenCountExpr(exprs(0)), "scala_udf")
    val bpeIdsIdent = org.apache.spark.sql.catalyst.FunctionIdentifier(bpeIdsFnName)
    if (!registry.functionExists(bpeIdsIdent))
      registry.createOrReplaceTempFunction(
        bpeIdsFnName, exprs => BpeEncodeIdsExpr(exprs(0)), "scala_udf")
  }

  private def litInt(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"minhash_sig nHashes must be an integer literal, got $other")
  }
  private def litBool(e: Expression): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"minhash_sig portable must be a boolean literal, got $other")
  }

  /** Native 63-bit SimHash of an array<string> column. */
  def simhash63Native(tokens: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(fnName, tokens)
  }

  /** Native MinHash signature (array<long>, length nHashes) of an
    * array<string> gram column — see [[MinhashSigExpr]]. */
  def minhashSigNative(grams: Column, nHashes: Int, portable: Boolean): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(minhashFnName, grams,
      org.apache.spark.sql.functions.lit(nHashes),
      org.apache.spark.sql.functions.lit(portable))
  }

  /** Real-BPE token count of a string column under the fixed merge table
    * — see [[BpeTokenCountExpr]]. */
  def bpeTokenCountNative(text: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(bpeFnName, text)
  }

  /** Real-BPE token-ID sequence (`array<int>`) of a string column under
    * the fixed byte-complete merge table — see [[BpeEncodeIdsExpr]]. */
  def bpeEncodeIdsNative(text: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(bpeIdsFnName, text)
  }
}
