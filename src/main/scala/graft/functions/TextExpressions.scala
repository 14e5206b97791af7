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

object TextExpressions {
  private val fnName = "graft_simhash63"

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(fnName)
    if (!registry.functionExists(ident))
      registry.createOrReplaceTempFunction(
        fnName, exprs => Simhash63Expr(exprs(0)), "scala_udf")
  }

  /** Native 63-bit SimHash of an array<string> column. */
  def simhash63Native(tokens: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(fnName, tokens)
  }
}
