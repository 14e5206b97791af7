package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

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
  *  - the cache is cleared between queries so persisted intermediates of
  *    one operator neither leak nor subsidize the next;
  *  - results keep deterministic sorted-name order all the way into the
  *    emitted JSON (Seq, not Map);
  *  - the JSON line goes to stdout AND to SPARK_GRAFT_BENCH_OUT
  *    (default `BENCH_LOCAL.json` in the cwd) so the driver can parse it
  *    even when a build tool decorates stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    // warm the JVM/codegen/scheduler so the first measured query isn't
    // charged ~5 s of one-time startup
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val results: Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        name -> sec
      }
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    Files.writeString(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")),
      json + "\n")
    spark.stop()
    // exit explicitly: non-daemon helper threads (the h01 embedded HTTP
    // endpoint) are stopped by shutdown hooks, which only run on exit
    sys.exit(0)
  }
}
