package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._

/** Bloom-prefiltered equi-join: build a bloom filter over the small
  * side's keys, drop big-side rows that cannot match BEFORE the shuffle,
  * then run the exact join. The filter only removes guaranteed
  * non-matches (false positives survive to the join, which discards
  * them), so the result is bit-identical to the plain join — it is a
  * pure I/O/shuffle reducer, the manual form of Spark's own
  * InjectRuntimeFilter for when stats don't trigger it (e.g. the small
  * side is a filtered subquery the optimizer can't size).
  *
  * Scale shape: the build is a distributed treeAggregate over the small
  * side (public `DataFrameStatFunctions.bloomFilter`); only the fused
  * sketch (≈1.2 MB per million keys at 1% fpp) returns to the driver and
  * ships to executors as a task literal — the same topology Spark's
  * runtime filter uses (8 MB default cap there). Probing is Spark's own
  * codegen'd [[BloomFilterMightContain]] over `xxhash64(key)`, fully
  * inside whole-stage codegen; at 100 TB the big-side scan emits only
  * `|match| + fpp·|big|` rows into the join exchange instead of |big|.
  *
  * Mirrors the reference's lookup-join motivation (prune unjoinable rows
  * early, reference lib/src/main FullCacheLookupFunction behavior) with
  * a sketch instead of a full cache.
  */
object BloomJoin {

  private val fnName = "graft_might_contain"

  /** Idempotently expose Spark's bloom-probe expression to the session
    * (same registry route as [[graft.functions.VectorExpressions]]:
    * Column(expr) constructors are private[sql] in Spark 4). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier(fnName)))
      registry.createOrReplaceTempFunction(
        fnName, exprs => BloomFilterMightContain(exprs(0), exprs(1)), "scala_udf")
  }

  /** Serialized bloom filter of `keys` (any orderable type; hashed to
    * long via xxhash64 so build and probe agree). */
  def buildFilterBytes(df: DataFrame, key: Column,
                       expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = df.stat.bloomFilter(xxhash64(key), expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain` prefilter predicate for `key` against a built
    * filter. The byte-array literal is foldable, so the probe stays in
    * whole-stage codegen and deserializes once per task. */
  def mightContain(spark: SparkSession, filterBytes: Array[Byte], key: Column): Column = {
    register(spark)
    call_function(fnName, lit(filterBytes), xxhash64(key))
  }

  /** Exact inner equi-join of `big ⋈ small` on `bigKey == smallKey`,
    * with the big side bloom-prefiltered on the small side's key set.
    * `expectedItems` should bound the small side's distinct-key count
    * (overshoot is safe — just a larger sketch). */
  def bloomPrefilteredJoin(big: DataFrame, bigKey: String,
                           small: DataFrame, smallKey: String,
                           expectedItems: Long = 1000000L,
                           fpp: Double = 0.01): DataFrame = {
    val spark = big.sparkSession
    val bytes = buildFilterBytes(small, col(smallKey), expectedItems, fpp)
    big.filter(mightContain(spark, bytes, col(bigKey)))
      .join(small, col(bigKey) === col(smallKey))
  }
}
