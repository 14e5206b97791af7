package graft

import graft.functions.{VectorExpressions, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen'd dot product must be bit-identical to the
  * higher-order-function formulation (same left-to-right accumulation). */
class VectorExprSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("4")

  test("native dot == HOF dot bit-for-bit on real embeddings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val both = emb.select(
      VectorFunctions.dot(col("embedding"), lit(q.toArray)).as("native"),
      VectorFunctions.dotHof(col("embedding"), lit(q.toArray)).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("native dot handles nulls and codegen + interpreted agree") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 2.0, 3.0)), Some(Array(4.0, 5.0, 6.0))),
      (None, Some(Array(1.0, 1.0, 1.0)))).toDF("a", "b")
    val out = df.select(VectorExpressions.dotNative(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0))
  }
}
