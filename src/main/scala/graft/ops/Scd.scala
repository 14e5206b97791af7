package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history building — collapsing a stack of
  * periodic full snapshots into SCD-type-2 validity intervals (the
  * warehouse-standard "dimension history" table, and for a training-data
  * pipeline the provenance ledger that answers "which version of this
  * document was live when shard S was exported?"; the x115 snapshot diff
  * is the two-version special case of the same fingerprint discipline).
  *
  * Scale design (100 TB of snapshots): everything is keyed on the entity
  * id — one fingerprint scan, then per-id windows (lag to detect change
  * points, lead to close intervals). The only shuffle is the id
  * partitioning, reused by both windows; per-id row counts are bounded
  * by the snapshot count, so no partition ever holds more than
  * n_snapshots rows per entity and the sort inside each window is
  * trivially bounded. Nothing is ever snapshot × snapshot.
  *
  * Determinism: change detection is md5-of-payload equality (order- and
  * layout-insensitive, the x115 convention), validity bounds are the
  * snapshot version values themselves — so the x118 oracle replays the
  * whole build verbatim with the same two window functions. */
object Scd {

  /** Collapse (id, version, payload…) snapshot rows into SCD2 intervals:
    * one output row per maximal run of consecutive snapshots with
    * identical payload — `valid_from` = first version of the run,
    * `valid_to` = the version that REPLACED it (null while current,
    * half-open [from, to)), `is_current` = the entity's latest run
    * (true even for entities that disappeared from later snapshots —
    * absence is not a change record; pair with [[Export.snapshotDiff]]
    * to surface removals).
    *
    * A run boundary exists wherever the payload fingerprint differs
    * from the previous snapshot's (or there is no previous snapshot);
    * rows between boundaries are dropped, boundaries become intervals
    * closed by the NEXT boundary's version via lead. */
  def buildScd2(snapshots: DataFrame, idCol: String, versionCol: String,
                payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "buildScd2 needs >= 1 payload column")
    val fp = md5(concat_ws("\u0001",
      payloadCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
    val byVersion = Window.partitionBy(col(idCol)).orderBy(col(versionCol))
    val starts = snapshots
      .withColumn("__fp", fp)
      .withColumn("__prev_fp", lag(col("__fp"), 1).over(byVersion))
      .filter(col("__prev_fp").isNull || col("__fp") =!= col("__prev_fp"))
    starts
      .withColumn("valid_to", lead(col(versionCol), 1).over(byVersion))
      .select(col(idCol) +: col(versionCol).as("valid_from") +:
        col("valid_to") +: col("valid_to").isNull.as("is_current") +:
        payloadCols.map(col): _*)
  }
}
