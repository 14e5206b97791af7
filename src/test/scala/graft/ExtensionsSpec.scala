package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions surface: the native vector expressions are
  * callable from plain SQL in any GraftSession-built session, and the
  * SQL path produces bit-identical results to the Column API (same
  * codegen'd expression underneath). */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("4")
  val dir = "/root/testdata/sf0.001"

  test("dot_product / vec_norm / cosine_sim resolve in plain SQL") {
    val r = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vec_norm(array(3.0D, 4.0D)) AS n,
        |       round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 9) AS c
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 1.0)
  }

  test("SQL cosine top-k over embeddings equals the Column-API top-k bit-for-bit") {
    val emb = Tables.embeddings(spark, dir)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val qv = Seq.tabulate(dim)(i => 0.01 * (i + 1))
    emb.createOrReplaceTempView("emb_sql")
    val qArr = qv.map(v => s"${v}D").mkString("array(", ", ", ")")
    val sql = spark.sql(
      s"""SELECT vec_id, round(cosine_sim(CAST(embedding AS array<double>), $qArr), 6) AS cos_sim
         |FROM emb_sql ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val api = graft.ops.Similarity.topKCosine(emb, "embedding", "vec_id", qv, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sql == api, s"sql=$sql api=$api")
  }

  test("null inputs propagate as null through the injected functions") {
    val r = spark.sql(
      "SELECT dot_product(CAST(NULL AS array<double>), array(1.0D)) AS d").head()
    assert(r.isNullAt(0))
  }
}
