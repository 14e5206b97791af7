package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-generated parquet tables (TESTDATA.md) plus
  * oracle-parity numeric helpers shared by every query in [[SparkEntry]].
  *
  * Parity strategy (driver hashes Spark parquet output vs DuckDB output):
  *  - Money/measure sums go through DECIMAL so the aggregate is exact and
  *    therefore independent of partition / aggregation order; a single
  *    final cast to double is correctly rounded identically by Spark and
  *    DuckDB. A raw double sum would differ in low bits between engines.
  *  - Every query ends in a deterministic total ORDER BY (unique tiebreak).
  *  - Column aliases match the oracle SQL exactly (driver sorts columns by
  *    name before hashing).
  */
object Tables {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame = apply(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame   = apply(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = apply(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = apply(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame     = apply(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame   = apply(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame   = apply(s, dir, "region")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) (reads as long
    * under nanosAsLong — convert via integer division; a double division
    * would lose precision above 2^53 ns) and as un-annotated
    * timestamp[us] (reads as TIMESTAMP_NTZ under Spark 4's
    * inferTimestampNTZ) — normalize both to a regular µs TIMESTAMP.
    * Session timezone is pinned UTC, so the NTZ→LTZ cast preserves the
    * wall-clock values the oracle sees. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = apply(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")

  /** Order-independent exact sum of a double measure: decimal-accumulate,
    * one final cast to double. Oracle: CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast("double")

  /** Deterministic average built on [[dsum]]; rounded so the single
    * IEEE division can't straddle a formatting boundary.
    * Oracle: ROUND(CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(x), 6). */
  def davg(c: Column): Column = round(dsum(c) / count(c), 6)
}
