package graft

import org.apache.spark.sql.SparkSession
import java.lang.management.ManagementFactory
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Round benchmark: every harness query at SPARK_GRAFT_SF_DIR, one JSON
  * result line.
  *
  * Methodology:
  *  - each query is forced through the `noop` sink, which fully evaluates
  *    every output column — a `count()` would let Catalyst prune the very
  *    projections being measured (a scalar-function query would degenerate
  *    to a scan-count);
  *  - failures propagate and fail the bench run — a broken query must not
  *    read as a fast one;
  *  - ALL operator-persisted storage is released between queries —
  *    `Caches.releaseAll()` (tracked persists + localCheckpoint blocks,
  *    which `clearCache()` alone would leave resident, inflating every
  *    later query's time) plus a defensive persistent-RDD sweep;
  *  - results keep deterministic sorted-name order all the way into the
  *    emitted JSON (Seq, not Map);
  *  - each query is timed best-of-N (SPARK_GRAFT_BENCH_RUNS, default 2,
  *    reported as `runs` in the JSON) — the host shows ±30% run noise on
  *    identical code, which single runs misread as regressions;
  *  - the stdout JSON line is COMPACT (short query keys = the `qNN`/`xNN`
  *    prefix, 3-decimal seconds): the driver keeps only the last 2000
  *    chars of stdout and a full-width line gets truncated past parsing.
  *    The full-name full-precision JSON goes to SPARK_GRAFT_BENCH_OUT
  *    (default `BENCH_LOCAL.json` in the cwd);
  *  - each query records process-CPU and GC time next to wall (the best
  *    run's deltas, ManagementFactory beans), and the bench SELF-ADJUDICATES
  *    host noise: it reads the previous committed BENCH_LOCAL.json and
  *    flags any query whose wall grew >1.5x while its process CPU did not
  *    (<1.25x) — wall inflating without CPU is another tenant stealing the
  *    host, not a code regression. Flags go on the compact stdout line as
  *    `"hostnoise"` so the per-round snapshot carries the verdict.
  */
object Bench {
  /** wall seconds + process-CPU ms + GC ms for one measured run. */
  private case class Timing(wallSec: Double, cpuMs: Long, gcMs: Long)

  private val osBean = ManagementFactory.getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]
  private def processCpuMs: Long = osBean.getProcessCpuTime / 1000000L
  private def gcTotalMs: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

  /** Previous run's per-query (wall, cpuMs) from the committed
    * BENCH_LOCAL.json, tolerating both the old flat-number format and the
    * current object format. Empty map if absent/unreadable.
    */
  private def previousRun(path: java.nio.file.Path): Map[String, (Double, Option[Long])] = {
    if (!Files.exists(path)) return Map.empty
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(Files.readString(path))
      val qs = root.path("queries")
      qs.fields().asScala.map { e =>
        val v = e.getValue
        if (v.isNumber) e.getKey -> (v.asDouble(), None)
        else e.getKey -> (v.path("wall").asDouble(), Option.when(v.has("cpu_ms"))(v.path("cpu_ms").asLong()))
      }.toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    // warm the JVM/codegen/scheduler so the first measured query isn't
    // charged ~5 s of one-time startup
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    // best-of-N per query: this ~2-core host shows ±30% run noise on
    // identical code (BASELINE.md), which single runs read as regressions
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
    // optional comma-separated name-prefix filter for local iteration
    // (e.g. SPARK_GRAFT_BENCH_ONLY=x23,x26); the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val outPath = Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
    val prev = previousRun(outPath)
    val results: Seq[(String, Timing)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
        .map { case (name, fn) =>
        val best = (1 to runs).map { _ =>
          val cpu0 = processCpuMs
          val gc0 = gcTotalMs
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          val timing = Timing(sec, processCpuMs - cpu0, gcTotalMs - gc0)
          graft.ops.Caches.releaseAll()
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
          // pay the predecessor's GC debt OUTSIDE the next timed window: a
          // heavy pipeline (e.g. x27's LSH build) leaves enough garbage
          // that the next small query's timed run absorbs a collection it
          // didn't cause — measured 2× on x28 when it follows x27 vs
          // isolated (r5 verdict's "unexplained" x28 regression). Between
          // queries this is hygiene, not distortion: each query is timed
          // from a settled heap, like a fresh executor would be.
          System.gc()
          timing
        }.minBy(_.wallSec)
        name -> best
      }
    val total = results.map(_._2.wallSec).sum
    val totalCpuMs = results.map(_._2.cpuMs).sum
    val totalGcMs = results.map(_._2.gcMs).sum
    // self-adjudication: wall inflated >1.5x vs the committed previous run
    // while process CPU stayed flat (<1.25x) — SUSPECTED host contention,
    // not a verdict: a non-CPU regression (added I/O, lock waits, spill)
    // has the same signature (ADVICE r7). The raw wall/cpu ratios are
    // recorded per flagged query so a flag that RECURS across runs (true
    // contention is transient) reads as a persistent regression instead
    // of being silently excused.
    val hostNoise = results.collect {
      case (name, t) if prev.get(name).exists { case (pw, pc) =>
        pw > 0 && t.wallSec > 1.5 * pw &&
          pc.exists(p => p > 0 && t.cpuMs < 1.25 * p)
      } => name
    }
    val ratios: Map[String, (Double, Double)] = results.flatMap { case (name, t) =>
      prev.get(name).collect { case (pw, pc) if pw > 0 =>
        name -> (t.wallSec / pw,
          pc.filter(_ > 0).map(t.cpuMs.toDouble / _).getOrElse(-1.0))
      }
    }.toMap
    def fmt(v: Double): String = f"$v%.3f"
    val shortQs = results
      .map { case (k, t) => s""""${k.takeWhile(_ != '_')}":${fmt(t.wallSec)}""" }
      .mkString("{", ",", "}")
    // keep the stdout line inside the driver's 2000-char tail: many flags
    // means whole-run contention — summarize rather than enumerate
    val noiseField =
      if (hostNoise.isEmpty) ""
      else if (hostNoise.size > 12) s""","hostnoise":"WHOLE_RUN:${hostNoise.size}""""
      else s""","hostnoise":"${hostNoise.map(_.takeWhile(_ != '_')).mkString(",")}""""
    val shortJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs":$runs,"cpu_ms":$totalCpuMs,"gc_ms":$totalGcMs$noiseField,"queries":$shortQs,"sf":"$sfDir"}"""
    val fullQs = results.map { case (k, t) =>
      val flagged =
        if (!hostNoise.contains(k)) ""
        else {
          val (wr, cr) = ratios(k)
          s""","host_noise_suspect":true,"wall_ratio":${fmt(wr)},"cpu_ratio":${fmt(cr)}"""
        }
      s""""$k":{"wall":${t.wallSec},"cpu_ms":${t.cpuMs},"gc_ms":${t.gcMs}$flagged}"""
    }.mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"cpu_ms":$totalCpuMs,"gc_ms":$totalGcMs,"queries":$fullQs,"sf":"$sfDir"}"""
    Files.writeString(outPath, fullJson + "\n")
    // stop Spark BEFORE printing the result line: spark.stop() logs
    // several lines, and the driver parses the stdout TAIL — r16's line
    // was emitted early and a later interleaved [warn] defeated the
    // parse (VERDICT r17 what's-wrong #2). Printing last (flushed),
    // with the full JSON already safe in SPARK_GRAFT_BENCH_OUT, keeps
    // the one-line contract AND minimizes the interleave window.
    spark.stop()
    println(shortJson)
    System.out.flush()
    // exit explicitly: non-daemon helper threads (the h01 embedded HTTP
    // endpoint) are stopped by shutdown hooks, which only run on exit
    sys.exit(0)
  }
}
