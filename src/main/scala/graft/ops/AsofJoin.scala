package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: for every left row, attach the right row
  * with the greatest `rightTs <= leftTs` within the same key — the
  * temporal-lookup semantic behind the reference's
  * `FOR SYSTEM_TIME AS OF` surface generalized to a versioned right side
  * (the connector's full-cache join is the degenerate case where the
  * right table has exactly one "current" version per key).
  *
  * Implementation is the union-window technique, NOT a range join: tag
  * both sides, union, sort within key by (ts, tag) and carry the latest
  * right version forward as ONE struct (atomic — a legitimately-null
  * right field can never bleed in an older version), then keep the left
  * rows. One shuffle on the key, linear in |L|+|R|, no candidate-pair
  * explosion — the shape that survives 100 TB (a broadcast range join
  * needs R small; a naive theta join is quadratic). Right rows should be
  * unique per (key, ts) for determinism — pre-aggregate duplicates
  * upstream.
  */
object AsofJoin {

  /** Left as-of join. `rightCols` are the right payload columns to attach
    * (all null when no right row is at-or-before the left timestamp);
    * they must not collide with left column names. */
  def asofLeft(left: DataFrame, right: DataFrame, keyCol: String,
               leftTs: String, rightTs: String,
               rightCols: Seq[String]): DataFrame = {
    require(rightCols.forall(c => !left.columns.contains(c)),
      s"rightCols ${rightCols.mkString(",")} must not collide with left columns")
    val leftCols = left.columns.toSeq
    val rStructType = StructType(rightCols.map(c => right.schema(c)))
    // tag 0 = right, 1 = left: at equal ts the right row sorts FIRST, so a
    // left row at exactly rightTs sees that right version (<=, not <)
    val taggedRight = right.select(
      (Seq(col(rightTs).as("_ts"), lit(0).as("_tag"),
        struct(rightCols.map(col): _*).as("_r")) ++
        leftCols.map(c => if (c == keyCol) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(leftTs).as("_ts"), lit(1).as("_tag"),
        lit(null).cast(rStructType).as("_r")) ++ leftCols.map(col)): _*)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .withColumn("_last", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select((leftCols.map(col) ++
        rightCols.map(c => col("_last")(c).as(c))): _*)
  }
}
