package graft

import org.apache.spark.sql.functions.col

/** One-off growth probe (not a spec): times an operator's scale dial on an
  * arbitrary fixture dir — the measurements behind BASELINE.md's
  * scale-growth tables.
  *  - `sbt "Test/runMain graft.ScaleProbe /path/to/dir"` — simhash
  *    blocking at both chunk widths (round-6 table);
  *  - `sbt "Test/runMain graft.ScaleProbe /path/to/dir semdedup"` —
  *    banded cosine near-dup pairs at both band geometries: 16×8 (the
  *    x42 gate default, 128 planes) vs 16×16 (256 planes — band length
  *    divides the random-collision candidate term by 2^8, the semantic
  *    analog of simhash's chunkBits dial). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    args.lift(1).getOrElse("simhash") match {
      case "semdedup" =>
        val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
        for (bandBits <- Seq(8, 16); _ <- 1 to 2) {
          val t0 = System.nanoTime()
          graft.ops.Similarity.cosineNearDupPairs(emb, "embedding", "vec_id",
              threshold = 0.45, nBands = 16, bandBits = bandBits)
            .write.format("noop").mode("overwrite").save()
          graft.ops.Caches.releaseAll()
          println(f"bandBits=$bandBits: ${(System.nanoTime() - t0) / 1e9}%.2f s")
          System.gc()
        }
      case _ =>
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
    }
    spark.stop()
    sys.exit(0)
  }
}
