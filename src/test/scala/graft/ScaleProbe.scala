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
      case "x71recall" =>
        // serving-quality ledger: trained IVF×PQ recall@20 vs exact-L2
        // top-20 on the real corpus, across the quality dials (nProbe /
        // refine / K) — the measurements behind BASELINE.md's recall rows
        import org.apache.spark.sql.functions._
        val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
        val rest = emb.filter(col("vec_id") =!= 0)
        val q = emb.filter(col("vec_id") === 0)
          .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
        val exact = rest.select(col("vec_id"),
            aggregate(zip_with(col("embedding").cast("array<double>"),
              lit(q.toArray), (x, y) => (x - y) * (x - y)),
              lit(0.0), (a, x) => a + x).as("l2"))
          .orderBy(col("l2").asc, col("vec_id").asc).limit(20)
          .collect().map(_.getLong(0)).toSet
        for ((np_, rf, kC) <- Seq((4, 3, 16), (4, 8, 16), (6, 8, 16),
                                  (6, 8, 256), (8, 8, 256))) {
          val t0 = System.nanoTime()
          val got = graft.ops.Similarity.ivfPqTopKTrained(rest, "embedding",
              "vec_id", q, 20, nLists = 16, nProbe = np_, m = 8,
              nCentroids = kC, refine = rf)
            .collect().map(_.getLong(0)).toSet
          graft.ops.Caches.releaseAll()
          println(f"nProbe=$np_ refine=$rf K=$kC: recall@20=${(got & exact).size / 20.0}%.2f wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
          System.gc()
        }
        // residual IVFADC rows under the SAME protocol: sampled codebook
        // (x59) vs residual-trained codebook (x80) at the cheap and the
        // x71 quality dials — the BASELINE.md residual-quality rows
        for ((np_, rf, kC, ti, ci) <- Seq((4, 3, 16, 0, 0), (4, 3, 16, 2, 0),
                                          (6, 8, 256, 0, 0), (6, 8, 256, 2, 0),
                                          (6, 8, 256, 0, 2), (6, 8, 256, 2, 2))) {
          val t0 = System.nanoTime()
          val got = graft.ops.Similarity.ivfPqResidualTopK(rest, "embedding",
              "vec_id", q, 20, nLists = 16, nProbe = np_, m = 8,
              nCentroids = kC, refine = rf, trainIters = ti, coarseIters = ci)
            .collect().map(_.getLong(0)).toSet
          graft.ops.Caches.releaseAll()
          val label = (if (ci > 0) "kmeans-coarse " else "") +
            (if (ti > 0) "residual-trained" else "residual-sampled")
          println(f"$label nProbe=$np_ refine=$rf K=$kC: recall@20=${(got & exact).size / 20.0}%.2f wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
          System.gc()
        }
      case "x72cands" =>
        // candidate-volume trajectory for the cell-composed kNN graph:
        // the fraction must SHRINK as n grows under the √n auto dial —
        // the sub-quadratic claim, measured (BASELINE.md r9)
        val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
        val n = emb.count()
        val t0 = System.nanoTime()
        val c = graft.ops.Similarity.knnGraphCellCandidates(emb, "embedding",
          "vec_id", 5, 16, 4, 64, 0, 2).count()
        graft.ops.Caches.releaseAll()
        println(f"n=$n k=${graft.ops.Similarity.autoCellCount(emb)} directed_candidates=$c fraction=${c.toDouble / (n.toDouble * (n - 1))}%.4f wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      case "x72" =>
        // full cell-composed kNN graph build, bench protocol (best-of-2,
        // noop sink, process-CPU recorded)
        val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
        val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        val runs = (1 to 2).map { _ =>
          val c0 = os.getProcessCpuTime
          val t0 = System.nanoTime()
          graft.ops.Similarity.knnGraphCells(emb, "embedding", "vec_id", k = 5)
            .write.format("noop").mode("overwrite").save()
          val r = ((System.nanoTime() - t0) / 1e9, (os.getProcessCpuTime - c0) / 1e9)
          graft.ops.Caches.releaseAll()
          System.gc()
          r
        }
        val best = runs.minBy(_._1)
        println(f"x72 best-of-2: wall=${best._1}%.2f s cpu=${best._2}%.1f s")
      case "x72recall" =>
        // recall@5 of the cell-composed graph vs the exact quadratic twin
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
        val got = graft.ops.Similarity.knnGraphCells(emb, "embedding", "vec_id", k = 5)
          .select("src_id", "nbr_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val v = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val exact = v.withColumnsRenamed(Map("vec_id" -> "src_id", "v" -> "sv"))
          .crossJoin(v.withColumnsRenamed(Map("vec_id" -> "nbr_id", "v" -> "nv")))
          .filter(col("src_id") =!= col("nbr_id"))
          .withColumn("cos_sim",
            round(graft.functions.VectorFunctions.cosine(col("sv"), col("nv")), 6))
          .withColumn("rank", row_number().over(
            Window.partitionBy("src_id").orderBy(col("cos_sim").desc, col("nbr_id").asc)))
          .filter(col("rank") <= 5)
          .select("src_id", "nbr_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        graft.ops.Caches.releaseAll()
        println(f"x72 recall@5 vs exact: ${(exact & got).size.toDouble / exact.size}%.3f (|exact|=${exact.size})")
      case "x75" =>
        // batch IVF×PQ serving (n/50 queries over the encoded corpus),
        // bench protocol
        import org.apache.spark.sql.functions.col
        val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
        val corpus = emb.filter(col("vec_id") % 50 =!= 0)
        val queries = emb.filter(col("vec_id") % 50 === 0)
        val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        val runs = (1 to 2).map { _ =>
          val c0 = os.getProcessCpuTime
          val t0 = System.nanoTime()
          val (cents, assigned) = graft.ops.Similarity.ivfBuild(corpus, "embedding", "vec_id")
          val cb = graft.ops.Similarity.pqBuildCodebook(corpus, "embedding", "vec_id")
          graft.ops.Similarity.ivfPqServeAll(cents,
              graft.ops.Similarity.ivfPqEncode(assigned, "vec_id", cb),
              corpus, "embedding", "vec_id", queries, "vec_id", cb, k = 5)
            .write.format("noop").mode("overwrite").save()
          val r = ((System.nanoTime() - t0) / 1e9, (os.getProcessCpuTime - c0) / 1e9)
          graft.ops.Caches.releaseAll()
          System.gc()
          r
        }
        val best = runs.minBy(_._1)
        println(f"x75 best-of-2 (${queries.count()} queries): wall=${best._1}%.2f s cpu=${best._2}%.1f s")
      case "x76" =>
        // batch BM25 serving, bench protocol
        import spark.implicits._
        val docs = spark.read.parquet(args(0) + "/documents.parquet")
        val qs = Seq(
          (1L, Seq("hash", "join")), (2L, Seq("spark", "vector")),
          (3L, Seq("data", "filter", "stream")), (4L, Seq("cache", "data")))
          .toDF("q_id", "terms")
        val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        val runs = (1 to 2).map { _ =>
          val c0 = os.getProcessCpuTime
          val t0 = System.nanoTime()
          graft.ops.Retrieval.bm25ServeAll(docs, "doc_id", "text", qs,
              "q_id", "terms", k = 10)
            .write.format("noop").mode("overwrite").save()
          val r = ((System.nanoTime() - t0) / 1e9, (os.getProcessCpuTime - c0) / 1e9)
          graft.ops.Caches.releaseAll()
          System.gc()
          r
        }
        val best = runs.minBy(_._1)
        println(f"x76 best-of-2: wall=${best._1}%.2f s cpu=${best._2}%.1f s")
      case "x67" =>
        // SemDeDup at the auto dial, bench protocol
        val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
        val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        val runs = (1 to 2).map { _ =>
          val c0 = os.getProcessCpuTime
          val t0 = System.nanoTime()
          graft.ops.Similarity.semDeDupKmeans(emb, "embedding", "vec_id", tau = 0.45)
            .write.format("noop").mode("overwrite").save()
          val r = ((System.nanoTime() - t0) / 1e9, (os.getProcessCpuTime - c0) / 1e9)
          graft.ops.Caches.releaseAll()
          System.gc()
          r
        }
        val best = runs.minBy(_._1)
        println(f"x67 best-of-2 (auto k=${graft.ops.Similarity.autoCellCount(emb)}): wall=${best._1}%.2f s cpu=${best._2}%.1f s")
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
