package graft

import org.apache.spark.sql.functions.col

/** One-off growth probe (not a spec): times simhash blocking at both chunk
  * widths on an arbitrary documents dir — the measurement behind the
  * BASELINE.md round-6 scale-growth table's chunk-width row.
  * `sbt "Test/runMain graft.ScaleProbe /path/to/dir"`. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = spark.read.parquet(args(0) + "/documents.parquet")
    for (bits <- Seq(8, 16); _ <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.ops.Dedup.simhashPairs(docs, "doc_id", "text",
          maxHamming = 3, chunkBits = bits)
        .write.format("noop").mode("overwrite").save()
      graft.ops.Caches.releaseAll()
      println(f"chunkBits=$bits: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      System.gc()
    }
    spark.stop()
    sys.exit(0)
  }
}
