package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap joins at scale — the third member of the temporal
  * join family (q30 theta, x21 as-of): find pairs of intervals that
  * OVERLAP. Spark's native plan for `a.start < b.end AND b.start <
  * a.end` is a nested-loop product (no equi key), which is quadratic in
  * rows scanned; the scale form here is the classic BUCKET
  * DECOMPOSITION: explode each interval into the coarse time buckets it
  * covers (day granularity by default — bucket count per interval =
  * span/bucket, small for bounded intervals), equi-join on the bucket,
  * apply the exact overlap predicate as a residual, and dedup the
  * multi-bucket hits. One shuffle keyed on the bucket; candidates =
  * Σ_bucket n_b² instead of n² — bounded by the busiest bucket, and at
  * 100 TB the bucket is also the storage partition key, so the join is
  * partition-local.
  *
  * Overlap is STRICT (`a.start < b.end AND b.start < a.end`): touching
  * endpoints and zero-length intervals do not overlap — the SQL-standard
  * OVERLAPS-ish convention, replayed identically by the oracle's plain
  * quadratic join (the oracle needs only semantics, not the plan). */
object IntervalJoin {

  /** Self-join form: all ORDERED pairs (a, b) of rows of `intervals`
    * with distinct identity (`idCols` tuple differs) whose
    * [startCol, endCol] intervals strictly overlap. Returns a_/b_
    * prefixed identity columns plus a_start/a_end/b_start/b_end. Both
    * orientations of each unordered pair are emitted (callers group by
    * the a-side). `bucket` is the decomposition granularity — any
    * `date_trunc` unit; intervals spanning many buckets explode into
    * that many candidate rows, so pick it near the typical interval
    * span. */
  def selfOverlapPairs(intervals: DataFrame, idCols: Seq[String],
                       startCol: String, endCol: String,
                       bucket: String = "day"): DataFrame = {
    require(idCols.nonEmpty, "need at least one identity column")
    // EAGER + WIDE (r18): both self-join sides read `base`, so a lazy
    // frame re-derives the caller's (possibly expensive) interval build
    // once per side — x101's sessionization windows ran twice, once in
    // the broadcast build. And the interval frame often arrives through
    // a byte-coalesced exchange (x101: one 254 KB partition), which
    // pipelines the whole bucket join + quadratic residual into a single
    // task; re-keying on the identity at 2× session width spreads the
    // probe work. The checkpoint's id-keyed exchange is interval-sized —
    // cheap at any scale next to the candidate volume it feeds.
    val nPart =
      2 * intervals.sparkSession.sessionState.conf.numShufflePartitions
    val base = Caches.localCheckpointTracked(intervals.select(
        (idCols.map(col) :+ col(startCol).as("__s") :+ col(endCol).as("__e")): _*)
      .repartition(nPart, idCols.map(col): _*))
    val bucketed = base.withColumn("__b", explode(sequence(
      date_trunc(bucket, col("__s")), date_trunc(bucket, col("__e")),
      expr(s"interval 1 $bucket"))))
    val a = idCols.foldLeft(bucketed)((df, c) =>
        df.withColumnRenamed(c, s"a_$c"))
      .withColumnRenamed("__s", "a_start").withColumnRenamed("__e", "a_end")
    val b = idCols.foldLeft(bucketed)((df, c) =>
        df.withColumnRenamed(c, s"b_$c"))
      .withColumnRenamed("__s", "b_start").withColumnRenamed("__e", "b_end")
    val sameIdentity = idCols.map(c => col(s"a_$c") === col(s"b_$c"))
      .reduce(_ && _)
    a.join(b, "__b")
      .filter(!sameIdentity)
      .filter(col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .drop("__b")
      .distinct()
  }
}
