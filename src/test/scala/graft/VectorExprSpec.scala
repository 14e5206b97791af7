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

  test("int8 pack/unpack: bit-parity round trip, packed serving identical, loud range failure") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") =!= 0)
    val q = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    // unpack(pack(qvec)) == qvec exactly, negatives included
    val quantized = graft.ops.Similarity.quantizeInt8(emb, "embedding", "vec_id")
    val roundTrip = quantized.select(
      col("qvec"),
      VectorExpressions.int8UnpackNative(
        VectorExpressions.int8PackNative(col("qvec"))).as("rt"))
    assert(roundTrip.filter(not(col("qvec") === col("rt"))).count() == 0)
    assert(quantized
      .select(min(aggregate(col("qvec"), lit(0L), (a, x) => least(a, x))))
      .head().getLong(0) < 0, "fixture has no negative codes — parity test is vacuous")
    // the persisted packed table serves the identical result to the
    // in-memory unpacked path (same scoring, cut and rescore)
    val packedDir = java.nio.file.Files.createTempDirectory("int8_").toString
    try {
      graft.ops.Similarity.quantizeInt8Packed(emb, "embedding", "vec_id")
        .write.mode("overwrite").parquet(packedDir)
      val served = graft.ops.Similarity.quantizedTopKCosinePacked(
        spark.read.parquet(packedDir), emb, "embedding", "vec_id", q, k = 20)
        .collect()
      val direct = graft.ops.Similarity.quantizedTopKCosine(
        emb, "embedding", "vec_id", q, k = 20).collect()
      assert(served.toSeq == direct.toSeq,
        s"packed serving diverged: ${served.toSeq} vs ${direct.toSeq}")
      // the compression claim, measured under PLAIN encoding (dictionary
      // off, no codec): that isolates what the FORMAT achieves — 1 B vs
      // 8 B per component — from parquet's entropy coding, which on a
      // tiny fixture dictionary-packs the small-range longs to ~1 B
      // itself and would make the file sizes measure the encoder, not
      // the format
      def bytes(dir: String): Long = {
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.walk(p).filter(_.toString.endsWith(".parquet"))
          .mapToLong(f => java.nio.file.Files.size(f)).sum()
      }
      def writePlain(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
        df.write.mode("overwrite")
          .option("parquet.enable.dictionary", "false")
          .option("compression", "uncompressed")
          .parquet(dir)
      val plainPacked = java.nio.file.Files.createTempDirectory("int8_pp_").toString
      val plainLong = java.nio.file.Files.createTempDirectory("int8_pl_").toString
      try {
        writePlain(graft.ops.Similarity.quantizeInt8Packed(emb, "embedding", "vec_id"),
          plainPacked)
        writePlain(quantized, plainLong)
        val (pb, lb) = (bytes(plainPacked), bytes(plainLong))
        assert(pb > 0 && pb * 2 <= lb,
          s"packed $pb B not meaningfully smaller than long-array $lb B under PLAIN")
      } finally {
        graft.util.Fs.deleteTree(java.nio.file.Paths.get(plainPacked))
        graft.util.Fs.deleteTree(java.nio.file.Paths.get(plainLong))
      }
      // and the packed column IS 1 B/component
      assert(spark.read.parquet(packedDir)
        .filter(length(col("qvec8")) =!= 64).count() == 0)
    } finally graft.util.Fs.deleteTree(java.nio.file.Paths.get(packedDir))
    // out-of-range packs fail loudly, never truncate
    val bad = Seq((1L, Seq(1L, 300L))).toDF("vec_id", "qvec")
    val e = intercept[Exception] {
      bad.select(VectorExpressions.int8PackNative(col("qvec"))).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("outside byte range"), s"unexpected failure: $msgs")
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
