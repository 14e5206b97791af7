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

  test("native rhp_bands == per-plane dot composition bit-for-bit") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val planes = VectorFunctions.rhpPlanes(32, 64)
    val v = col("embedding").cast("array<double>")
    val composed = array((0 until 4).map { j =>
      (0 until 8).map { b =>
        when(VectorFunctions.dot(v, lit(planes(j * 8 + b))) > 0,
          lit(1L << (7 - b))).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    val both = emb.select(
      VectorExpressions.rhpBandsNative(v, 4, 8, 64).as("native"),
      composed.as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
    // dims mismatch fails loudly from inside the expression
    val e = intercept[Exception] {
      emb.select(VectorExpressions.rhpBandsNative(v, 4, 8, 32)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("rhp_bands")), msgs(e).mkString(" | "))
  }

  test("rhp_bands: null vector COMPONENT fails loudly on both execution paths") {
    import spark.implicits._
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val df = Seq(Seq[java.lang.Double](1.0, null, 3.0)).toDF("v")
    // codegen path (whole-stage over a local relation)
    val eCg = intercept[Exception] {
      df.select(VectorExpressions.rhpBandsNative(col("v"), 2, 4, 3)).collect()
    }
    assert(msgs(eCg).exists(_.contains("null vector component")), msgs(eCg).mkString(" | "))
    // interpreted path (codegen off → InterpretedUnsafeProjection / eval)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val eIn = intercept[Exception] {
        df.select(VectorExpressions.rhpBandsNative(col("v"), 2, 4, 3)).collect()
      }
      assert(msgs(eIn).exists(_.contains("null vector component")), msgs(eIn).mkString(" | "))
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("driver-side rhpBandsLocal == column rhp_bands on a real vector") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val local = VectorFunctions.rhpBandsLocal(q, 16, 8)
    val column = emb.filter(col("vec_id") === 0)
      .select(VectorExpressions.rhpBandsNative(
        col("embedding").cast("array<double>"), 16, 8, 64))
      .head().getSeq[Long](0)
    assert(local == column, s"driver/column band divergence: $local vs $column")
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

  test("native pq_codes == HOF argmin fold bit-for-bit on real embeddings") {
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") =!= 0)
    val cb = Similarity.pqBuildCodebook(emb, "embedding", "vec_id")
    val native = Similarity.pqEncode(emb, "embedding", "vec_id", cb)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val hof = Similarity.pqEncodeHof(emb, "embedding", "vec_id", cb)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native.nonEmpty && native.keySet == hof.keySet)
    native.foreach { case (id, cs) =>
      assert(cs == hof(id), s"code divergence for $id: $cs vs ${hof(id)}") }
  }

  test("pq_codes: wrong dims and null components fail loudly") {
    import spark.implicits._
    val cb = Array.fill(16)(Array.fill(64)(0.5))
    val short = Seq((1L, Array(1.0, 2.0))).toDF("vec_id", "embedding")
    val e1 = intercept[Exception] {
      graft.ops.Similarity.pqEncode(short, "embedding", "vec_id", cb).collect()
    }
    assert(e1.getMessage != null)
    val withNull = Seq((1L, Array.fill(64)(Option(1.0)).updated(7, None)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      graft.ops.Similarity.pqEncode(withNull, "embedding", "vec_id", cb).collect()
    }
    assert(e2.getMessage != null)
  }
}
