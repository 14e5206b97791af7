package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for hot keys at cluster scale (SURVEY.md §7.3
  * note 5). AQE's skew-join splitting handles sort-merge joins
  * automatically (enabled in GraftSession); these helpers cover the
  * aggregation and broadcast-unfriendly cases where explicit salting is
  * still the right tool.
  */
object Skew {

  /** Two-phase salted aggregation: count/sum per key where single keys may
    * dominate partitions. Phase 1 aggregates (key, salt) — spreading a hot
    * key over `saltBuckets` reducers — phase 2 merges the partials.
    * Results are exactly equal to the direct aggregation (sums of longs /
    * decimals are associative). */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: Column,
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
  }

  /** Salted broadcast-side replication for joining a skewed fact against a
    * small dimension without one reducer owning the hot key: the dimension
    * is exploded `saltBuckets`× with a salt column, the fact picks a
    * deterministic pseudo-random salt, and the join key becomes
    * (key, salt). Only sensible when the dimension is small enough to
    * replicate; for sort-merge cases prefer AQE skew handling. */
  def saltedBroadcastJoin(fact: DataFrame, dim: DataFrame, key: String,
                          saltBuckets: Int = 8): DataFrame = {
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltBuckets.toLong)).cast("int"))
    saltedFact.join(broadcast(saltedDim), Seq(key, "__salt")).drop("__salt")
  }
}
