package graft.extensions

import graft.functions.DotProductExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Multiply, Sqrt}

/** Session-extension wiring for the engine's native expressions: set
  * `spark.sql.extensions=graft.extensions.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`) and plain
  * SQL users get the codegen'd vector functions — no Scala API required:
  *
  * {{{
  *   SELECT doc_id FROM embeddings
  *   ORDER BY dot_product(embedding, :q) / (vec_norm(embedding) * vec_norm(:q)) DESC
  *   LIMIT 10
  * }}}
  *
  * `injectFunction` registers into every session built with the
  * extension (builtin-registry level, visible to `spark.sql`,
  * `CREATE VIEW`, thriftserver clients), unlike the per-session
  * temp-function fallback in [[graft.functions.VectorExpressions]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // full-cache joins broadcast by semantic guarantee, not by statistics
    // (see the rule's scaladoc for the 100 TB rationale)
    ext.injectOptimizerRule(graft.plans.BroadcastFullCacheJoins(_))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"dot_product takes 2 arguments, got ${args.length}")
        DotProductExpr(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "vec_norm"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"vec_norm takes 1 argument, got ${args.length}")
        Sqrt(DotProductExpr(args.head, args.head))
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"cosine_sim takes 2 arguments, got ${args.length}")
        org.apache.spark.sql.catalyst.expressions.Divide(
          DotProductExpr(args.head, args(1)),
          Multiply(Sqrt(DotProductExpr(args.head, args.head)),
                   Sqrt(DotProductExpr(args(1), args(1)))))
      }))
  }
}
