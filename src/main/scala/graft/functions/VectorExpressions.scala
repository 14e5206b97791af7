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

/** All `nBands` random-hyperplane LSH band values of one vector in a
  * SINGLE codegen'd pass: band j's value packs the sign bits of plane
  * dots j·bandBits .. j·bandBits+bandBits−1 ([[VectorFunctions.rhpPlanes]]
  * — md5-derived, deterministic from the shape parameters, baked into the
  * generated code as one flat double[]). The Column-composed version (128
  * separate dot expressions) spent seconds per small batch on expression
  * overhead alone; this is one tight triple loop with the identical
  * sequential IEEE accumulation, so band values — and the x42 oracle's
  * SQL replay — are bit-for-bit unchanged. */
case class RhpBandsExpr(child: Expression, nBands: Int, bandBits: Int, dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rhp_bands expects array<double>, got ${other.simpleString}")
    }

  /** Flat plane matrix: plane p component d at [p * dims + d]. */
  @transient private lazy val flatPlanes: Array[Double] = {
    val ps = VectorFunctions.rhpPlanes(nBands * bandBits, dims)
    val out = new Array[Double](nBands * bandBits * dims)
    var p = 0
    while (p < ps.length) {
      System.arraycopy(ps(p), 0, out, p * dims, dims)
      p += 1
    }
    out
  }

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    require(v.numElements() == dims,
      s"rhp_bands: expected $dims-dim vector, got ${v.numElements()}")
    // Null COMPONENTS fail loudly (ADVICE r6): without this prepass a null
    // element NPEs on GenericArrayData but silently reads 0.0 on
    // UnsafeArrayData — two execution paths, two answers. One O(dims)
    // check per row, outside the nBands*bandBits hot loops.
    var nd = 0
    while (nd < dims) {
      if (v.isNullAt(nd)) throw new IllegalArgumentException(
        s"rhp_bands: null vector component at index $nd")
      nd += 1
    }
    val out = new Array[Long](nBands)
    var j = 0
    while (j < nBands) {
      var bv = 0L
      var b = 0
      while (b < bandBits) {
        val base = (j * bandBits + b) * dims
        var s = 0.0
        var d = 0
        while (d < dims) { s += v.getDouble(d) * flatPlanes(base + d); d += 1 }
        if (s > 0) bv |= 1L << (bandBits - 1 - b)
        b += 1
      }
      out(j) = bv
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planes = ctx.addReferenceObj("rhpPlanes", flatPlanes, "double[]")
      val (out, j, b, d, s, bv, base) = (ctx.freshName("out"), ctx.freshName("j"),
        ctx.freshName("b"), ctx.freshName("d"), ctx.freshName("s"),
        ctx.freshName("bv"), ctx.freshName("base"))
      s"""
         |if ($a.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "rhp_bands: expected $dims-dim vector, got " + $a.numElements());
         |}
         |for (int $d = 0; $d < $dims; $d++) {
         |  if ($a.isNullAt($d)) {
         |    throw new IllegalArgumentException(
         |      "rhp_bands: null vector component at index " + $d);
         |  }
         |}
         |long[] $out = new long[$nBands];
         |for (int $j = 0; $j < $nBands; $j++) {
         |  long $bv = 0L;
         |  for (int $b = 0; $b < $bandBits; $b++) {
         |    int $base = ($j * $bandBits + $b) * $dims;
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $dims; $d++) {
         |      $s += $a.getDouble($d) * $planes[$base + $d];
         |    }
         |    if ($s > 0) $bv |= 1L << ($bandBits - 1 - $b);
         |  }
         |  $out[$j] = $bv;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  private val fnName = "graft_dot_product"
  private val bandsFnName = "graft_rhp_bands"

  /** Idempotently register the expression with a session's function
    * registry (the public extension point; Column(expr) constructors are
    * private[sql] in Spark 4). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(fnName)
    if (!registry.functionExists(ident))
      registry.createOrReplaceTempFunction(
        fnName, exprs => DotProductExpr(exprs(0), exprs(1)), "scala_udf")
    val bandsIdent = org.apache.spark.sql.catalyst.FunctionIdentifier(bandsFnName)
    if (!registry.functionExists(bandsIdent))
      registry.createOrReplaceTempFunction(
        bandsFnName, exprs => RhpBandsExpr(exprs(0),
          lit2int(exprs(1)), lit2int(exprs(2)), lit2int(exprs(3))), "scala_udf")
  }

  private def lit2int(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"rhp_bands shape parameters must be integer literals, got $other")
  }

  /** Codegen'd dot product over two array<double> columns. Registers into
    * the active session on first use. */
  def dotNative(a: Column, b: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(fnName, a.cast("array<double>"), b.cast("array<double>"))
  }

  def normNative(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotNative(a, a))

  /** All RHP-LSH band values of `vec` (array<long>, length nBands) in one
    * codegen'd pass — see [[RhpBandsExpr]]. */
  def rhpBandsNative(vec: Column, nBands: Int, bandBits: Int, dims: Int): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(bandsFnName, vec.cast("array<double>"),
      org.apache.spark.sql.functions.lit(nBands),
      org.apache.spark.sql.functions.lit(bandBits),
      org.apache.spark.sql.functions.lit(dims))
  }
}
