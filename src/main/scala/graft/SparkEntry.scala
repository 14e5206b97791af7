package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by capability modules under [[graft.queries]];
  * each entry pairs a Spark DataFrame program with a DuckDB oracle SQL of
  * identical column names and deterministic ordering.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * h01 is the reference's defining capability: events enriched through
    * the TTL-cached `http-full-cache` source via broadcast lookup join
    * (embedded offline endpoint). */
  def entry(spark: SparkSession): DataFrame =
    queries("h01_http_enrich_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.HttpEnrichment.queries ++
    graft.queries.Ext.queries ++
    graft.queries.PipelineGate.queries ++
    graft.queries.StreamGate.allQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
    graft.queries.HttpEnrichment.oracle ++
    graft.queries.Ext.oracle ++
    graft.queries.PipelineGate.oracle ++
    graft.queries.StreamGate.oracle
}
