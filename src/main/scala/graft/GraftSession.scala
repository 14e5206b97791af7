package graft

import org.apache.spark.sql.SparkSession

/** One place for session config shared by Verify, Bench and tests.
  *
  * - shuffle.partitions sized to local cores (not the 200 default);
  * - AQE on (runtime coalescing + skew-join handling — the knobs we rely
  *   on at cluster scale);
  * - parquet TIMESTAMP(NANOS) (events.ts) read as long, converted at load
  *   by [[Tables.events]];
  * - UTC session timezone for oracle parity.
  */
object GraftSession {
  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      // native vector functions (dot_product / vec_norm / cosine_sim)
      // available to plain SQL in every session
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.mergeSchema", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
