package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * The higher-order-function formulation (zip_with + aggregate) is correct
  * but evaluates a lambda per element — on an O(n²) pair scan that
  * interpretive overhead dominates. These expressions generate a tight
  * primitive double loop (doGenCode), keeping the whole pair scan inside
  * whole-stage codegen. Accumulation order is the same sequential
  * left-to-right as the lambda version and the DuckDB oracle's list_sum,
  * so results are bit-identical.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<double> inputs, got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += x.getDouble(i) * y.getDouble(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, sum) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("sum"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  private val fnName = "graft_dot_product"

  /** Idempotently register the expression with a session's function
    * registry (the public extension point; Column(expr) constructors are
    * private[sql] in Spark 4). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(fnName)
    if (!registry.functionExists(ident))
      registry.createOrReplaceTempFunction(
        fnName, exprs => DotProductExpr(exprs(0), exprs(1)), "scala_udf")
  }

  /** Codegen'd dot product over two array<double> columns. Registers into
    * the active session on first use. */
  def dotNative(a: Column, b: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(fnName, a.cast("array<double>"), b.cast("array<double>"))
  }

  def normNative(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotNative(a, a))
}
