package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Order- and layout-insensitive payload fingerprint (the x115/x118
    * convention): md5 over unit-separator-joined string renderings,
    * NULs standing in for NULLs. */
  private def payloadFp(payloadCols: Seq[String]): Column =
    md5(concat_ws("\u0001",
      payloadCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))

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
    val fp = payloadFp(payloadCols)
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

  /** INCREMENTAL SCD2 maintenance: fold ONE arriving full snapshot into
    * an existing [[buildScd2]] history without rebuilding from the
    * snapshot stack — the daily dimension load (the x73/x81 delta
    * discipline applied to the dimension side; reference analog: the
    * periodic-reload semantics of HttpLookupTableSource.scala:49-52 —
    * refresh without rebuilding the world).
    *
    * Law (the x123 gate + OpsSpec replay): for any split point,
    * `scd2Apply(buildScd2(snapshots < v), snapshot at v)` equals
    * `buildScd2(snapshots <= v)` row-for-row, and folding snapshots one
    * at a time from `buildScd2(first)` reproduces the full build.
    * Preconditions, both the warehouse-load invariants: `snapshot`
    * holds at most one row per id, and its version is strictly greater
    * than every `valid_from` already in `current`.
    *
    * Per id there are four cases, all decided by one fingerprint
    * comparison on the OPEN interval: unchanged (snapshot fp equals the
    * open run's) → pass through; changed → close the open interval at
    * the snapshot version and open a new one; new id → open its first
    * interval; id absent from the snapshot → pass through (absence is
    * not a change record, matching the build).
    *
    * Scale (100 TB of history): closed intervals stream through
    * untouched (no shuffle — they cannot change, by the half-open
    * interval invariant); the only keyed work is ONE id-keyed
    * full-outer join of the OPEN intervals (≤ one per id) against the
    * snapshot, and the ≤2 output rows per id come from a codegen'd
    * explode — nothing is ever history × snapshot. */
  def scd2Apply(current: DataFrame, snapshot: DataFrame, idCol: String,
                versionCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "scd2Apply needs >= 1 payload column")
    val vType = snapshot.schema(versionCol).dataType
    val closed = current.filter(!col("is_current"))
    val open = current.filter(col("is_current"))
      .withColumn("__cur_fp", payloadFp(payloadCols))
    val snap = snapshot
      .withColumn("__new_fp", payloadFp(payloadCols))
      .select(col(idCol) +: col(versionCol).as("__v") +: col("__new_fp") +:
        payloadCols.map(c => col(c).as(s"__new_$c")): _*)
    val j = open.join(snap, Seq(idCol), "full_outer")
    val hasOld = col("valid_from").isNotNull
    val changed = hasOld && col("__v").isNotNull &&
      col("__cur_fp") =!= col("__new_fp")
    val oldRow = struct(
      col("valid_from") +:
      when(changed, col("__v")).otherwise(col("valid_to")).as("valid_to") +:
      payloadCols.map(col): _*)
    val newRow = struct(
      col("__v").as("valid_from") +:
      lit(null).cast(vType).as("valid_to") +:
      payloadCols.map(c => col(s"__new_$c").as(c)): _*)
    j.select(col(idCol),
        explode(
          when(changed, array(oldRow, newRow))
            .when(hasOld, array(oldRow))
            .otherwise(array(newRow))).as("__r"))
      .select(col(idCol) +: col("__r.valid_from").as("valid_from") +:
        col("__r.valid_to").as("valid_to") +:
        col("__r.valid_to").isNull.as("is_current") +:
        payloadCols.map(c => col(s"__r.$c").as(c)): _*)
      .unionByName(closed)
  }

  /** POINT-IN-TIME dimension lookup through an SCD2 history — the join
    * that makes training data temporally correct: each fact row joins
    * the payload version that was LIVE at its `asOfCol` value
    * (valid_from <= as_of < valid_to, half-open; the open interval
    * matches everything from its valid_from on). Facts dated before an
    * entity's first version — or naming an unknown id — keep their row
    * with null payload (left join), so lookup misses are visible, not
    * dropped.
    *
    * Scale (100 TB of facts): the join is an id-keyed EQUI join (hash,
    * shuffle on the id) with the interval test as a residual — per id
    * the intervals PARTITION the version axis from first appearance,
    * so each fact matches at most one row and the output is
    * facts-sized. Never facts × history: the only shuffle key is the
    * id. */
  def scd2Lookup(facts: DataFrame, history: DataFrame, idCol: String,
                 asOfCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "scd2Lookup needs >= 1 payload column")
    val f = facts.as("f")
    val h = history.as("h")
    f.join(h,
        col(s"f.$idCol") === col(s"h.$idCol") &&
        col(s"f.$asOfCol") >= col("h.valid_from") &&
        (col("h.valid_to").isNull || col(s"f.$asOfCol") < col("h.valid_to")),
        "left")
      .select(facts.columns.map(c => col(s"f.$c")) ++
        (col("h.valid_from") +: payloadCols.map(c => col(s"h.$c"))): _*)
  }
}
