package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT two-phase per-key top-k — the skew-bounded replacement for
  * `row_number().over(Window.partitionBy(key))` + `filter(rank <= k)`
  * when one key's candidate set can be corpus-sized (a hot BM25 term, a
  * hot IVF cell): a single window partition serializes that key on one
  * task. Phase 1 salts each row by a hash of its tie-break id into
  * `nSalt` sub-partitions and takes the LOCAL top-k of each; phase 2
  * ranks the surviving ≤ nSalt·k rows per key. Because `order` is a
  * TOTAL order (the repo convention: score, then id), every global
  * top-k row is in its salt's local top-k, and ranking the merged
  * survivors under the same order assigns exactly the global ranks —
  * output ≡ the single-window form row-for-row (OpsSpec pins it). The
  * salt never reaches the result, so determinism is untouched; max
  * window-partition size drops from |candidates(key)| to
  * max(|candidates| / nSalt-ish, nSalt·k). */
object TopK {

  /** Rank `df`'s rows within each `keyCol` group by `order` (MUST be a
    * total order), keep ranks ≤ k, emit the rank as `rankName` (the
    * row_number Integer convention). `saltSrc` is any column that
    * spreads a key's rows — use the tie-break id. */
  def rankTopK(df: DataFrame, keyCol: String, saltSrc: Column,
               order: Seq[Column], k: Int, rankName: String,
               nSalt: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nSalt >= 1, s"nSalt must be >= 1, got $nSalt")
    val local = Window.partitionBy(col(keyCol), col("__salt")).orderBy(order: _*)
    val global = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    df
      .withColumn("__salt", pmod(xxhash64(saltSrc), lit(nSalt.toLong)))
      .withColumn("__lrk", row_number().over(local))
      .filter(col("__lrk") <= k)
      .drop("__salt", "__lrk")
      .withColumn(rankName, row_number().over(global))
      .filter(col(rankName) <= k)
  }
}
