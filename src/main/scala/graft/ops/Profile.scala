package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the per-column data-quality report (row count,
  * null count, exact distinct count, native min/max, rendered-length
  * stats) a pipeline publishes before trusting a new corpus drop. The
  * tabular cousin of the x07 corpus report: x07 summarizes the TEXT of
  * one column, this summarizes the SHAPE of every column.
  *
  * Scale design (100 TB): ONE aggregation pass over the table — all
  * per-column aggregates (null/distinct/min/max/length-sum) evaluate in
  * a single `agg`, so the scan happens once and every aggregate
  * combines map-side. With `exact = true` the per-column distinct
  * counts expand the aggregate input k+1 ways (Catalyst's Expand for
  * multi-distinct) — the exactness tax the oracle needs; `exact =
  * false` IS the 100 TB dial: `approx_count_distinct` at `rsd` drops
  * the Expand entirely and keeps one combinable HLL sketch per column
  * (the x28 convention), leaving a single un-multiplied scan. The
  * result is k rows (k = columns profiled) — driver-sized by
  * construction, assembled by a single explode of one struct array.
  *
  * Determinism: counts are exact integers; min/max are the NATIVE
  * column extrema rendered to strings after aggregation (so integer
  * columns order numerically, not lexically); `avg_len` is the house
  * exact-integer IEEE division rounded to 6 places (x113 convention). */
object Profile {

  /** One row per profiled column:
    * (col_name, n_rows, n_null, n_distinct, min_val, max_val, sum_len,
    * avg_len) — `sum_len`/`avg_len` measure the string RENDERING of
    * non-null values (a storage-agnostic width proxy), `min_val`/
    * `max_val` are native extrema cast to string, null for all-null
    * columns, `avg_len` null when every value is null. `exact = false`
    * swaps the distinct counts for `approx_count_distinct(rsd)` —
    * same report shape, ±rsd `n_distinct`, no Expand in the plan. */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true,
              rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs >= 1 column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
        sum(length(col(c).cast("string"))).as(s"__len_$c"))
    }
    val g = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"),
        col(s"__len_$c").as("sum_len"))
    }
    g.select(explode(array(rows: _*)).as("p")).select("p.*")
      .withColumn("avg_len",
        when(col("n_rows") > col("n_null"),
          round(col("sum_len").cast("double") /
            (col("n_rows") - col("n_null")).cast("double"), 6)))
  }

  /** MERGEABLE profile state — the incremental form of [[profile]]:
    * ONE wide row holding, per profiled column, the exact combinable
    * sufficient statistics of the report — row count, null count, a
    * Datasketches HLL sketch for the distinct count (the mergeable
    * twin of `exact = false`'s estimator), NATIVE-typed min/max (so
    * numeric columns keep merging in numeric order, not lexically —
    * the reason the state is wide, not long), and the rendered-length
    * sum. Two states MERGE by one tiny aggregate ([[profileMerge]]):
    * counts add, sketches union, extrema min/max. Every EXACT field
    * (counts, nulls, native extrema, length sums) folds
    * associative-commutatively and equals the one-shot state; the HLL
    * estimate can differ by a few counts across merge orders (sketch
    * internal-state paths) but stays inside the sketch's error bound
    * in every order — the x62/x63 sketch-family merge discipline
    * applied to profiling, law-pinned in OpsSpec.
    * [[profileFromState]] renders the k-row report. A
    * 100-TB incremental profiler keeps one such row per partition drop
    * and folds on publish; per-batch cost is one combinable scan of
    * the batch.
    *
    * HLL input typing: the sketch aggregates integral/string/binary
    * natively; other types (double, date, ...) profile their STRING
    * rendering — distinct-count-preserving for any fixed rendering. */
  def profileState(df: DataFrame, cols: Seq[String],
                   lgK: Int = 12): DataFrame = {
    require(cols.nonEmpty, "profileState needs >= 1 column")
    val aggs = cols.flatMap { c =>
      import org.apache.spark.sql.types._
      val hin = df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType |
             StringType | BinaryType => col(c)
        case _ => col(c).cast("string")
      }
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        hll_sketch_agg(hin, lit(lgK)).as(s"__hll_$c"),
        min(col(c)).as(s"__min_$c"),
        max(col(c)).as(s"__max_$c"),
        sum(length(col(c).cast("string"))).as(s"__len_$c"))
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
  }

  /** Fold two [[profileState]] rows: counts add, HLL sketches union,
    * native extrema min/max — one model-sized aggregate. */
  def profileMerge(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(col(s"__null_$c")).as(s"__null_$c"),
        hll_union_agg(col(s"__hll_$c"), lit(true)).as(s"__hll_$c"),
        min(col(s"__min_$c")).as(s"__min_$c"),
        max(col(s"__max_$c")).as(s"__max_$c"),
        sum(col(s"__len_$c")).as(s"__len_$c"))
    }
    a.unionByName(b).agg(sum(col("__n")).as("__n"), aggs: _*)
  }

  /** Render the [[profile]]-shaped report (x119's exact columns, with
    * `n_distinct` the HLL estimate) from a [[profileState]] row. */
  def profileFromState(state: DataFrame, cols: Seq[String]): DataFrame = {
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"),
        coalesce(hll_sketch_estimate(col(s"__hll_$c")), lit(0L))
          .as("n_distinct"),
        col(s"__min_$c").cast("string").as("min_val"),
        col(s"__max_$c").cast("string").as("max_val"),
        col(s"__len_$c").as("sum_len"))
    }
    state.select(explode(array(rows: _*)).as("p")).select("p.*")
      .withColumn("avg_len",
        when(col("n_rows") > col("n_null"),
          round(col("sum_len").cast("double") /
            (col("n_rows") - col("n_null")).cast("double"), 6)))
  }
}
