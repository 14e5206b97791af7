package graft.ops

import graft.functions.PortableHash.md5u32
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: a fixed-size (depth × width) counter grid whose
  * cell (i, (aᵢ·h(w)+bᵢ) mod P mod width) accumulates every occurrence
  * of token w — the classic Cormode–Muthukrishnan frequency sketch.
  * Point estimate = min over the depth rows; always ≥ the true count
  * (every occurrence of w lands in w's cell on every row; collisions
  * only add). Completes the re-aggregatable sketch family next to
  * MinHash-union (x24), HLL (x28), and Bloom (x33): two shard grids
  * merge by cell-wise addition, which here is literally the groupBy
  * count — so the build is ONE map-side-combinable aggregation over the
  * token stream however many shards feed it, and the shipped state is
  * depth·width longs regardless of corpus or vocabulary size (the
  * whole point at 100 TB: exact vocab counts shuffle |vocab| rows,
  * the sketch shuffles 1024 cells).
  *
  * Determinism (the x62 oracle replays the sketch): the row hashes are
  * the md5-affine family ([[graft.functions.PortableHash]] — aᵢ, bᵢ
  * from md5("cms:a:i")/md5("cms:b:i"), h = first 8 md5 hex digits of
  * the token), all arithmetic is exact integer (aᵢ < 2²⁹, h < 2³², so
  * aᵢ·h+bᵢ < 2⁶² — no overflow under ANSI), and estimates are integer
  * minima. */
object Cms {
  private val P = 2147483647L // 2^31 - 1 (Mersenne prime, the MinHash modulus)

  private def seedA(i: Int): Long = md5u32(s"cms:a:$i") % 268435456L * 2 + 1
  private def seedB(i: Int): Long = md5u32(s"cms:b:$i") % P

  /** h(w): portable 32-bit token hash (same as the MinHash gram hash). */
  private def tokenHash(w: Column): Column =
    conv(substring(md5(w), 1, 8), 16, 10).cast("long")

  private def cell(i: Int, h: Column, width: Int): Column =
    (lit(seedA(i)) * h + lit(seedB(i))) % P % width

  /** Build the sketch over a corpus's token stream: one row per touched
    * cell, (r, cell, c) with r the hash-row index. Cells no token ever
    * hit are absent (count 0). Re-aggregation = unionByName two grids
    * and re-group — identical arithmetic. */
  def cmsBuild(docs: DataFrame, textCol: String, depth: Int = 4,
               width: Int = 256): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch shape: $depth x $width")
    docs
      .select(explode(TextStats.tokens(col(textCol))).as("w"))
      .select(tokenHash(col("w")).as("h"))
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("r"), cell(i, col("h"), width).as("cell"))): _*)).as("rc"))
      .select(col("rc.r").as("r"), col("rc.cell").as("cell"))
      .groupBy("r", "cell").agg(count(lit(1)).as("c"))
  }

  /** Point-estimate the frequency of each word in `words` from a built
    * grid: est = min over rows of the word's cell counts (0 if a cell
    * is absent). The grid side is sketch-sized — broadcast it. */
  def cmsEstimate(grid: DataFrame, words: DataFrame, wordCol: String,
                  depth: Int = 4, width: Int = 256): DataFrame = {
    val cells = words
      .withColumn("__h", tokenHash(col(wordCol)))
      .select(col("*"), explode(array((0 until depth).map(i =>
        struct(lit(i).as("r"), cell(i, col("__h"), width).as("cell"))): _*)).as("rc"))
      .select(col(wordCol), col("rc.r").as("r"), col("rc.cell").as("cell"))
    cells
      .join(broadcast(grid), Seq("r", "cell"), "left")
      .groupBy(col(wordCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est_count"))
  }

  /** Heavy hitters with sketch estimates: the exact top-k tokens (count
    * desc, word asc — deterministic) annotated with their CMS estimate
    * and the over-estimate guarantee bit. The exact side exists to
    * MEASURE the sketch against truth (harness query x62 pins
    * `overestimates` TRUE for every row); a pure-sketch deployment
    * estimates candidate keys without the exact pass. */
  def cmsHeavyHitters(docs: DataFrame, textCol: String, k: Int = 20,
                      depth: Int = 4, width: Int = 256): DataFrame = {
    val counts = Caches.persistTracked(
      docs.select(explode(TextStats.tokens(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("true_count")))
    val top = counts.orderBy(col("true_count").desc, col("w").asc).limit(k)
    val grid = cmsBuild(docs, textCol, depth, width)
    top
      .join(cmsEstimate(grid, top.select("w"), "w", depth, width), "w")
      .select(col("w").as("word"), col("true_count"), col("est_count"),
        (col("est_count") >= col("true_count")).as("overestimates"))
      .orderBy(col("true_count").desc, col("word").asc)
  }
}
