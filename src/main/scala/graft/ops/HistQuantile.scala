package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable equi-width HISTOGRAM sketch with quantile estimation — the
  * fixed-size answer to "what's the p50/p90 of this column per group"
  * that exact quantiles (q36's sort-based percentiles) can't give at
  * 100 TB without a global sort per group. State is ≤ `buckets` counter
  * rows per group however large the group is; two shard histograms
  * merge by bucket-wise addition (literally the groupBy count), so the
  * build is ONE map-side-combinable aggregation — the quantile-sketch
  * member of the re-aggregatable family (MinHash x24, HLL x28, Bloom
  * x33, CMS x62). Estimation error is bounded by construction: the true
  * quantile lies in the picked bucket, so |est − truth| < bucket width
  * (pinned in OpsSpec; the standard equi-width histogram trade-off vs
  * KLL/t-digest, which buy adaptive width with non-replayable
  * randomness).
  *
  * Determinism (the x63 oracle replays everything): bucket assignment
  * is pure integer floor-division ((x−lo)·B div (hi−lo), clamped), the
  * rank r = ceil(q·n) is integer arithmetic, the bucket pick is the
  * first bucket whose cumulative count reaches r, and the in-bucket
  * interpolation divides exact integers under IEEE. */
object HistQuantile {

  /** Integer bucket index for column `valueCol` over [lo, hi) split into
    * `buckets` equi-width bins (`div` = exact integer floor-division;
    * no FP anywhere in assignment); values outside clamp to the edges. */
  private def bucketOf(valueCol: String, lo: Long, hi: Long,
                       buckets: Int): Column =
    least(lit(buckets - 1), greatest(lit(0),
      expr(s"((`$valueCol` - $lo) * $buckets) div ${hi - lo}")))

  /** Per-group histogram: (group, b, c) over touched buckets only.
    * Re-aggregation = unionByName shard grids + re-group. */
  def histBuild(df: DataFrame, groupCol: String, valueCol: String,
                lo: Long, hi: Long, buckets: Int = 64): DataFrame = {
    require(hi > lo && buckets > 0, s"bad histogram shape: [$lo,$hi) x $buckets")
    df.select(col(groupCol).as("grp"),
        bucketOf(valueCol, lo, hi, buckets).as("b"))
      .groupBy("grp", "b").agg(count(lit(1)).as("c"))
  }

  /** Estimate the qNumer/qDenom quantile per group from a built
    * histogram: rank r = ceil(q·n), pick the first bucket whose
    * cumulative count reaches r, interpolate linearly inside it.
    * Returns (grp, n_docs, est) — est = lo + width·(b + (r − cumBefore)/c_b). */
  def histQuantile(hist: DataFrame, lo: Long, hi: Long, buckets: Int,
                   qNumer: Int, qDenom: Int): DataFrame = {
    require(qNumer > 0 && qDenom > 0 && qNumer <= qDenom,
      s"quantile must be in (0,1]: $qNumer/$qDenom")
    val w = Window.partitionBy("grp").orderBy("b")
    val width = (hi - lo).toDouble / buckets
    hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("grp")))
      .withColumn("r", floor((col("n") * qNumer + lit(qDenom - 1)) / qDenom))
      .filter(col("cum") >= col("r"))
      .withColumn("rn", row_number().over(Window.partitionBy("grp").orderBy("b")))
      .filter(col("rn") === 1)
      .select(col("grp"), col("n").as("n_docs"),
        round(lit(lo) + lit(width) * (col("b") +
          (col("r") - (col("cum") - col("c"))).cast("double") / col("c")), 6)
          .as("est"))
  }

  /** One-call report: per-group p50 and p90 of `valueCol` estimated
    * from a single shared histogram build. Harness query x63 gates this
    * against a DuckDB oracle replaying the sketch bit-for-bit. */
  def quantileReport(df: DataFrame, groupCol: String, valueCol: String,
                     lo: Long, hi: Long, buckets: Int = 64): DataFrame = {
    val hist = Caches.persistTracked(
      histBuild(df, groupCol, valueCol, lo, hi, buckets))
    histQuantile(hist, lo, hi, buckets, 1, 2)
      .withColumnRenamed("est", "est_p50")
      .join(histQuantile(hist, lo, hi, buckets, 9, 10)
        .select(col("grp"), col("est").as("est_p90")), "grp")
      .select(col("grp").as(groupCol), col("n_docs"),
        col("est_p50"), col("est_p90"))
  }
}
