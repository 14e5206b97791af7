package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form ridge regression over integer features — the "linear
  * probe" of training-data work (fit a cheap interpretable model on
  * engineered features to calibrate quality scores / predict a target),
  * trained the way a 100 TB engine must: ONE map-side-combinable
  * aggregation pass collects the sufficient statistics (the Gram matrix
  * XᵀX and XᵀY — ten longs for two features), the 3×3 normal equations
  * solve on the driver, and an optional second pass scores residuals.
  * No gradient descent, no iterations, no per-row model state.
  *
  * Determinism (the x49 oracle replays the fit bit-for-bit): features
  * and targets are integers, so the sufficient statistics are EXACT
  * integer sums (order-independent); the Cramer-rule determinants of the
  * integer normal matrix are exact BigInt/HUGEINT arithmetic — no FP
  * anywhere in the solve — and the only doubles are the final
  * determinant ratios (correctly-rounded integer→double conversions,
  * identical IEEE division in any engine). The residual pass pins each
  * squared residual to a long (floor(r²·10⁶)) so R² derives from exact
  * sums too. */
object LinearProbe {

  /** Fitted 2-feature ridge model: y ≈ b0 + b1·f1 + b2·f2, plus the
    * exact sufficient statistics the R² pass reuses. */
  case class RidgeModel(n: Long, b0: Double, b1: Double, b2: Double,
                        sy: Long, syy: Long)

  /** One-pass ridge fit on integer feature/target columns. `lambda`
    * penalizes the two feature weights (not the intercept), the standard
    * convention; it stays integer so the normal matrix stays integer. */
  def ridgeFit(df: DataFrame, f1: Column, f2: Column, y: Column,
               lambda: Long = 1L): RidgeModel = {
    val f = df.select(f1.cast("long").as("f1"), f2.cast("long").as("f2"),
      y.cast("long").as("y"))
    val s = f.agg(
      count(lit(1)).as("n"),
      sum(col("f1")).as("s1"), sum(col("f2")).as("s2"),
      sum(col("f1") * col("f1")).as("s11"),
      sum(col("f1") * col("f2")).as("s12"),
      sum(col("f2") * col("f2")).as("s22"),
      sum(col("y")).as("sy"),
      sum(col("f1") * col("y")).as("sy1"),
      sum(col("f2") * col("y")).as("sy2"),
      sum(col("y") * col("y")).as("syy")).head()
    val bi = (idx: Int) => BigInt(s.getLong(idx))
    val (n, s1, s2, s11, s12, s22) = (bi(0), bi(1), bi(2), bi(3), bi(4), bi(5))
    val (sy, sy1, sy2) = (bi(6), bi(7), bi(8))
    // normal matrix [[n,s1,s2],[s1,s11+λ,s12],[s2,s12,s22+λ]], rhs
    // [sy,sy1,sy2]; Cramer over exact integers (det terms ~ entries³ —
    // far past long range, exact in BigInt / the oracle's HUGEINT)
    val (a, b, c) = (n, s1, s2)
    val (d, e, fq) = (s1, s11 + lambda, s12)
    val (g, h, i) = (s2, s12, s22 + lambda)
    val (r0, r1, r2) = (sy, sy1, sy2)
    val dA = a * (e * i - fq * h) - b * (d * i - fq * g) + c * (d * h - e * g)
    require(dA != 0, "ridge normal matrix is singular (degenerate features)")
    val d0 = r0 * (e * i - fq * h) - b * (r1 * i - fq * r2) + c * (r1 * h - e * r2)
    val d1 = a * (r1 * i - fq * r2) - r0 * (d * i - fq * g) + c * (d * r2 - r1 * g)
    val d2 = a * (e * r2 - r1 * h) - b * (d * r2 - r1 * g) + r0 * (d * h - e * g)
    RidgeModel(s.getLong(0),
      d0.toDouble / dA.toDouble, d1.toDouble / dA.toDouble,
      d2.toDouble / dA.toDouble, s.getLong(6), s.getLong(9))
  }

  /** Per-row predictions under a fitted model (broadcast-free: the model
    * is three plan literals). */
  def predict(df: DataFrame, model: RidgeModel, f1: Column,
              f2: Column): Column =
    lit(model.b0) + lit(model.b1) * f1.cast("long") +
      lit(model.b2) * f2.cast("long")

  /** The document quality probe the x49 gate runs: predict `yCol` from
    * (word count, alphabetic-char count), report the model and its R² as
    * one summary row — (n, b0, b1, b2, r2). The residual pass computes
    * each doc's floor((y−ŷ)²·10⁶) as a long so the SSE sum is exact;
    * SST comes from the fit pass's integer sums. */
  def qualityProbe(docs: DataFrame, textCol: String,
                   yCol: String): DataFrame = {
    val feats = Caches.persistTracked(docs.select(
      size(split(col(textCol), " ")).cast("long").as("f1"),
      length(regexp_replace(col(textCol), "[^A-Za-z]", "")).cast("long").as("f2"),
      col(yCol).cast("long").as("y")))
    val m = ridgeFit(feats, col("f1"), col("f2"), col("y"))
    // identical double sequence in the oracle: CAST(syy) - CAST(sy)²/n
    val sst = m.syy.toDouble - m.sy.toDouble * m.sy.toDouble / m.n.toDouble
    val resid = col("y").cast("double") - predict(feats, m, col("f1"), col("f2"))
    feats
      .agg(sum(floor(resid * resid * lit(1e6)).cast("long")).as("sse_fix"))
      .select(lit(m.n).as("n"),
        round(lit(m.b0), 6).as("b0"), round(lit(m.b1), 6).as("b1"),
        round(lit(m.b2), 6).as("b2"),
        round(lit(1.0) - (col("sse_fix").cast("double") / lit(1e6)) / lit(sst), 6)
          .as("r2"))
  }
}
