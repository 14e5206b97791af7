package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering and the
  * file-skipping audit that justifies it. Sorting a table by the bit
  * interleave of two normalized key columns places rows that are close
  * in BOTH dimensions into the same storage cell, so per-file min/max
  * statistics (parquet footers, the engine-independent zone-map idea)
  * prune multi-dimensional box predicates — the layout trick behind
  * Delta/Iceberg `ZORDER BY`, expressed here as plain deterministic
  * Spark expressions.
  *
  * Scale design (100 TB): normalization bounds come from ONE tiny
  * aggregate (broadcast back as a 1-row frame), the grid/interleave
  * math is pure codegen'd per-row arithmetic, and the audit is a single
  * cell-keyed aggregation — no shuffle anywhere except that keyed
  * count. The physical write path is [[zOrderWrite]] — one file per
  * storage cell, z-sorted within — and [[writtenZoneMap]] reads the
  * written tree back and proves each file's footer-equivalent min/max
  * equals the analytic cell audit.
  *
  * Determinism: grid coordinates are exact integer arithmetic
  * (`(c-lo)*(2^bits-1) div (hi-lo)`, floor on non-negatives, with the
  * product in DECIMAL(38,0) lanes so full-range int64 keys at high
  * `bits` cannot overflow), the interleave is an unrolled shift/mask
  * sum — the x121 oracle replays every bit. */
object Layout {

  /** Bit interleave (Morton code) of two grid coordinates in
    * [0, 2^bits): x occupies even bit positions, y odd. */
  def interleave(xi: Column, yi: Column, bits: Int): Column =
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(xi, i).bitwiseAND(lit(1L)), 2 * i),
          shiftleft(shiftright(yi, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)

  // overflow-safe grid: the span (hi - lo) and its guard evaluate in
  // DECIMAL(38,0) lanes, and the (c - lo) * (2^bits - 1) product runs
  // in int64 lanes only when that span provably fits (span <=
  // Long.Max / mask — every realistic key column); otherwise the whole
  // product/divide falls back to DECIMAL(38,0) (full-range int64 keys
  // at high bits reach ~2^94; decimal38 holds ~2^126), so neither the
  // guard nor the arithmetic can wrap. `div` is integral divide in
  // both branches, so the floor semantics and the BIGINT result are
  // identical.
  private def grid(cn: String, lo: String, hi: String, bits: Int): Column = {
    val mask = (1L << bits) - 1
    val span = s"(CAST($hi AS DECIMAL(38,0)) - $lo)"
    expr(s"CASE WHEN $hi <= $lo THEN CAST(0 AS BIGINT) " +
      s"WHEN $span <= ${Long.MaxValue / mask}L " +
      s"THEN ((`$cn` - $lo) * ${mask}L) div ($hi - $lo) " +
      s"ELSE CAST(((CAST(`$cn` AS DECIMAL(38,0)) - $lo) * $mask)" +
      s" div $span AS BIGINT) END")
  }

  /** Adds `xg`, `yg` (grid coordinates) and `z` (Morton code) for the
    * two integer key columns, normalizing each to [0, 2^bits) by the
    * column's global min/max. Constant columns grid to 0. */
  def withZOrder(df: DataFrame, xCol: String, yCol: String,
                 bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val b = df.agg(
      min(col(xCol)).as("__xlo"), max(col(xCol)).as("__xhi"),
      min(col(yCol)).as("__ylo"), max(col(yCol)).as("__yhi"))
    df.crossJoin(broadcast(b))
      .withColumn("xg", grid(xCol, "__xlo", "__xhi", bits))
      .withColumn("yg", grid(yCol, "__ylo", "__yhi", bits))
      .withColumn("z", interleave(col("xg"), col("yg"), bits))
      .drop("__xlo", "__xhi", "__ylo", "__yhi")
  }

  /** The zone-map audit for a Z-ordered layout: rows group into
    * 4^cellBits storage cells (the top `2*cellBits` bits of z — i.e.
    * files of a range-partitioned write), each reporting its row count
    * and per-dimension grid min/max, plus whether the cell is
    * SKIPPABLE for the box predicate
    * `xg ∈ [qxLo,qxHi] ∧ yg ∈ [qyLo,qyHi]` — the pruning decision an
    * engine makes from footer stats alone. By construction each cell
    * spans < 2^(bits-cellBits) grid units per dimension (the top
    * cellBits bits of each coordinate are fixed inside a cell), which
    * is exactly why the skip rate is high: see the OpsSpec locality
    * law. */
  def zOrderAudit(df: DataFrame, xCol: String, yCol: String,
                  bits: Int = 8, cellBits: Int = 4,
                  qxLo: Int = 0, qxHi: Int = 0,
                  qyLo: Int = 0, qyHi: Int = 0): DataFrame = {
    require(cellBits >= 1 && cellBits <= bits,
      s"cellBits out of range: $cellBits vs bits=$bits")
    withZOrder(df, xCol, yCol, bits)
      .withColumn("cell", shiftright(col("z"), 2 * (bits - cellBits)))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        min(col("xg")).as("min_xg"), max(col("xg")).as("max_xg"),
        min(col("yg")).as("min_yg"), max(col("yg")).as("max_yg"))
      .withColumn("skippable",
        col("max_xg") < qxLo || col("min_xg") > qxHi ||
        col("max_yg") < qyLo || col("min_yg") > qyHi)
  }

  /** PHYSICAL Z-order write — the layout [[zOrderAudit]] reasons about,
    * materialized: rows hash-route to their storage cell (the top
    * `2*cellBits` Morton bits), sort by (cell, z) inside each task, and
    * write one parquet tree partitioned by `cell`. The grid columns
    * (`xg`, `yg`, `z`) are persisted alongside the data so the footer
    * stats an engine would prune on are first-class columns. Returns
    * the normalization bounds — the tree's MODEL, which
    * [[zOrderCompact]] needs to assign later arrivals to the same
    * cells.
    *
    * `filesPerCell` is the WRITE-PARALLELISM dial (power of two). At 1
    * (the audit-exact default) every row of a cell routes to one task
    * and one file, so the file's footer min/max ARE the cell's
    * zone-map stats — but write parallelism and file size are then
    * capped at 4^cellBits tasks however large the data (at 100 TB and
    * cellBits = 4 that is ~400 GB written by a single task into a
    * single file). At filesPerCell = 2^s the rows of a cell split by
    * the next `s` Morton bits BELOW the cell prefix into up to
    * filesPerCell salt groups — each a CONTIGUOUS z sub-range, i.e. a
    * finer cell — and route on (cell, salt) across
    * 4^cellBits · filesPerCell tasks, so tasks stay
    * data-size-independent and every file still nests inside its
    * cell's zone-map bounds (per-file stats are tighter, never wider:
    * footer pruning only improves). Hash collisions may merge salt
    * groups of a cell into one task (fewer, larger files — never
    * wrong); [[writtenZoneMap]] reports per FILE either way, and the
    * ScaleSpec law quantifies over both shapes.
    *
    * NULL-key contract: rows with a null key in either dimension are
    * EXCLUDED from the tree (a zone map cannot place them; route them
    * to a separate store upstream). Write and compact apply the same
    * rule, so the compaction law quantifies over non-null-keyed rows —
    * without the filter, a null key would land in the Hive default
    * partition, where compaction's cell equi-join could never match it
    * and a later rewrite would silently drop the stored rows. */
  def zOrderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
                  bits: Int = 8, cellBits: Int = 4,
                  filesPerCell: Int = 1): ZBounds = {
    require(cellBits >= 1 && cellBits <= bits,
      s"cellBits out of range: $cellBits vs bits=$bits")
    val in = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val r = in.agg(
      min(col(xCol).cast("long")), max(col(xCol).cast("long")),
      min(col(yCol).cast("long")), max(col(yCol).cast("long"))).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      "zOrderWrite needs a non-empty frame with non-null keys")
    val b = ZBounds(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // __fold carries each row's fold provenance (the base write owns
    // "base"); a constant per file, so parquet dictionary-encodes it to
    // ~nothing — see [[zOrderCompact]]'s replay contract
    routeCells(withZOrderFrozen(in, xCol, yCol, b, bits)
        .withColumn("__fold", lit("base")), bits, cellBits, filesPerCell)
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    b
  }

  /** Shared cell routing of the write/compact paths: add `cell`, route
    * on (cell[, salt]) and sort (cell, z) within each task — the sort's
    * `cell` prefix satisfies the file writer's required ordering, so no
    * second sort is inserted and the z order inside each written file
    * survives. See [[zOrderWrite]] for the `filesPerCell` contract. */
  private def routeCells(zdf: DataFrame, bits: Int, cellBits: Int,
                         filesPerCell: Int): DataFrame = {
    require(filesPerCell >= 1 && Integer.bitCount(filesPerCell) == 1,
      s"filesPerCell must be a power of two: $filesPerCell")
    val saltBits = 31 - Integer.numberOfLeadingZeros(filesPerCell)
    require(saltBits <= 2 * (bits - cellBits),
      s"filesPerCell=$filesPerCell needs $saltBits sub-cell z bits; " +
        s"only ${2 * (bits - cellBits)} below cellBits=$cellBits at bits=$bits")
    val cells = zdf.withColumn("cell",
      shiftright(col("z"), 2 * (bits - cellBits)))
    if (filesPerCell == 1)
      cells.repartition(col("cell")).sortWithinPartitions(col("cell"), col("z"))
    else {
      // salt = the saltBits Morton bits just below the cell prefix: a
      // contiguous z sub-range per salt value. Task count is sized to
      // the (cell, salt) universe here; a cluster deployment would cap
      // it at the executor-core budget instead.
      val nParts = math.min(1 << (2 * cellBits + saltBits), 1 << 16)
      cells
        .withColumn("__salt", shiftright(col("z"),
            2 * (bits - cellBits) - saltBits)
          .bitwiseAND(lit(filesPerCell - 1L)))
        .repartition(nParts, col("cell"), col("__salt"))
        .sortWithinPartitions(col("cell"), col("z"))
        .drop("__salt")
    }
  }

  /** FROZEN-bounds twin of [[withZOrder]]: the grid normalizes by the
    * MODEL bounds `b` (from the original [[zOrderWrite]]) instead of
    * the frame's own extrema, so later arrivals land in the SAME cell
    * geometry as the written tree; values outside the trained range
    * CLAMP into the edge cells (the zone-map convention for post-write
    * drift). The clamp applies to the INPUT, before any arithmetic:
    * the dividend (clamped − lo) then sits in [0, span], so the int64
    * branch's span guard is sufficient for ALL inputs (an un-clamped
    * far-out arrival could overflow (c − lo)·mask and land in an
    * arbitrary cell, not the edge), and the non-negative dividend
    * makes integral `div` floor-exact across engines. Pure per-row
    * codegen: no aggregate, no crossJoin. */
  def withZOrderFrozen(df: DataFrame, xCol: String, yCol: String,
                       b: ZBounds, bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val mask = (1L << bits) - 1
    def g(cn: String, lo: Long, hi: Long): Column = {
      // span in BigInt: a full-range int64 bound pair wraps `hi - lo`,
      // which would silently pick the int64 branch AND divide by the
      // wrapped span — both the guard and the decimal divisor stay wide
      val span = BigInt(hi) - BigInt(lo)
      if (span <= 0) lit(0L)
      else {
        val cc = s"greatest(${lo}L, least(${hi}L, `$cn`))"
        if (span <= BigInt(Long.MaxValue / mask))
          expr(s"(($cc - ${lo}L) * ${mask}L) div ${span.toLong}L")
        else
          expr(s"CAST(((CAST($cc AS DECIMAL(38,0)) - $lo) * $mask)" +
            s" div CAST($span AS DECIMAL(38,0)) AS BIGINT)")
      }
    }
    df.withColumn("xg", g(xCol, b.xLo, b.xHi))
      .withColumn("yg", g(yCol, b.yLo, b.yHi))
      .withColumn("z", interleave(col("xg"), col("yg"), bits))
  }

  /** Fold an append delta into a written Z-order tree — the x79/x84/x91
    * compaction discipline applied to layout: delta rows grid under the
    * FROZEN bounds (a pure per-row function, cost ∝ |delta|), only the
    * TOUCHED cell directories are rewritten (union of their existing
    * rows + the delta's, under dynamic partition overwrite), every
    * other cell's files are untouched bytes. After compaction the tree
    * reads back exactly as a full rebuild over static ∪ delta with the
    * static bounds — the x126 oracle law. `filesPerCell` applies to the
    * rewritten cell dirs exactly as in [[zOrderWrite]] (a touched cell's
    * rewrite is a small full write of that cell).
    *
    * REPLAY-SAFE (VERDICT r16 — the last compaction that replayed
    * unsafely): layout rows need no unique key and legitimate
    * duplicate rows within a delta must survive, so the fold cannot
    * dedupe row-wise like winnowing/ivfPq/bm25. Instead every stored
    * row carries `__fold`, a CONTENT-derived key of the delta it
    * arrived in (count + mod-p hash sum + xor of full xxhash64 over
    * the data columns in sorted-name order — the bm25 three-lane key).
    * A fold first DROPS any stored rows tagged with ITS OWN key from
    * the touched cells before unioning the delta back in, so
    * fold-twice ≡ fold-once EXACTLY — even when the first attempt
    * crashed after writing (the replay re-drops the partial rows and
    * re-lands them; same touched cells, since cell assignment is a
    * pure function of content under the frozen bounds). OpsSpec pins
    * fold-twice ≡ fold-once ≡ rebuild on the served zone map.
    * Corollary: a delta with IDENTICAL content to an earlier fold is
    * idempotent BY DESIGN (at-least-once semantics); a caller that
    * legitimately appends the same content twice must salt a column
    * upstream (e.g. a batch id) to distinguish the folds. `__fold` is
    * per-file constant, so it dictionary-encodes to ~nothing. */
  def zOrderCompact(spark: SparkSession, path: String, delta: DataFrame,
                    xCol: String, yCol: String, b: ZBounds,
                    bits: Int = 8, cellBits: Int = 4,
                    filesPerCell: Int = 1): Unit = {
    require(cellBits >= 1 && cellBits <= bits,
      s"cellBits out of range: $cellBits vs bits=$bits")
    // same null-key contract as the write (see zOrderWrite's scaladoc)
    val din = delta.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    // content-derived fold key over the delta's own columns in a
    // canonical (sorted-name) order: three independent order-free lanes
    val dataCols = din.columns.sorted.map(col).toSeq
    val kr = din.agg(count(lit(1)).as("n"),
      coalesce(sum(pmod(xxhash64(dataCols: _*), lit(1000000007L))),
        lit(0L)).as("h"),
      coalesce(expr(s"bit_xor(xxhash64(${din.columns.sorted
        .map(c => s"`$c`").mkString(", ")}))"), lit(0L)).as("x")).head()
    val foldKey = s"${kr.getLong(0)}_${java.lang.Long.toHexString(kr.getLong(1))}" +
      s"_${java.lang.Long.toHexString(kr.getLong(2))}"
    val dz = withZOrderFrozen(din, xCol, yCol, b, bits)
      .withColumn("__fold", lit(foldKey))
      .withColumn("cell", shiftright(col("z"), 2 * (bits - cellBits)))
    val touched = dz.select(col("cell")).distinct()
    val staticTouched = spark.read.parquet(path)
      .withColumn("cell", col("cell").cast("long"))
      .join(broadcast(touched), "cell")
      // replay guard: rows this very fold landed in an earlier
      // (possibly partial) attempt are dropped before re-landing
      .filter(col("__fold") =!= foldKey)
    val merged = Caches.localCheckpointScoped(routeCells(staticTouched
      .unionByName(dz.select(staticTouched.columns.map(col): _*))
      .drop("cell"), bits, cellBits, filesPerCell))
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prevMode = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try merged.df.write.mode("overwrite").partitionBy("cell").parquet(path)
    finally {
      prevMode match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      merged.release()
    }
  }

  /** Read-back audit of a [[zOrderWrite]] tree: one row per written
    * FILE with its row count, per-dimension grid min/max (column
    * min/max over the file's rows — by definition what the parquet
    * footer records for `xg`/`yg`) and the same box-skip verdict as
    * [[zOrderAudit]]. Because the write placed one file per cell, this
    * frame must equal the analytic cell audit row-for-row — the
    * ScaleSpec law — and `sum(skippable)` IS the number of files an
    * engine's footer pruning skips for the box query. */
  def writtenZoneMap(spark: SparkSession, path: String,
                     qxLo: Int = 0, qxHi: Int = 0,
                     qyLo: Int = 0, qyHi: Int = 0): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("cell").cast("long").as("cell"),
        input_file_name().as("file"))
      .agg(count(lit(1)).as("n"),
        min(col("xg")).as("min_xg"), max(col("xg")).as("max_xg"),
        min(col("yg")).as("min_yg"), max(col("yg")).as("max_yg"))
      .withColumn("skippable",
        col("max_xg") < qxLo || col("min_xg") > qxHi ||
        col("max_yg") < qyLo || col("min_yg") > qyHi)
}

/** Normalization bounds of a written Z-order tree — the tree's MODEL:
  * [[Layout.zOrderCompact]] grids arrivals under these so they land in
  * the written cell geometry. */
final case class ZBounds(xLo: Long, xHi: Long, yLo: Long, yHi: Long)
