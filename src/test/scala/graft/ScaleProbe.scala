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
      case "graph" =>
        // growth probe for the graph-analytics family (x92-x99): one
        // knnGraphCells build, then each consumer timed over the SAME
        // checkpointed edge frame — the measurements behind BASELINE.md's
        // graph-family growth rows. Consumers are |E|-linear per
        // iteration; only the build carries the O(n^1.5) candidate term.
        import org.apache.spark.sql.functions._
        val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
        val n = emb.count()
        def time[T](label: String)(f: => T): T = {
          val t0 = System.nanoTime()
          val r = f
          println(f"$label: wall=${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
          System.gc()
          r
        }
        val g = time("graph build (knnGraphCells k=5)") {
          val gg = graft.ops.Caches.localCheckpointTracked(
            graft.ops.Similarity.knnGraphCells(emb, "embedding", "vec_id",
              k = 5).select("src_id", "nbr_id", "cos_sim", "rank"))
          println(s"  edges=${gg.count()}")
          gg
        }
        time("pageRank 5 iters")(
          graft.ops.Graph.pageRank(g, emb.select("vec_id"), "vec_id")
            .write.format("noop").mode("overwrite").save())
        time("labelPropagate 3 iters") {
          val seeds = emb.select(col("vec_id"),
            when(col("vec_id") % 5 === 0, col("label")).as("label"))
          graft.ops.Graph.labelPropagate(g, seeds, "vec_id", "label")
            .write.format("noop").mode("overwrite").save()
        }
        time("mutualKnnPairs")(
          graft.ops.Graph.mutualKnnPairs(g)
            .write.format("noop").mode("overwrite").save())
        time("kCenterSample kSel=8")(
          graft.ops.Rerank.kCenterSample(emb, "embedding", "vec_id", 8)
            .write.format("noop").mode("overwrite").save())
        graft.ops.Caches.releaseAll()
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
      case "x78" =>
        // ANN-composed batch hybrid (x76 text ⊕ x75 ANN ranks), bench
        // protocol — the n/50 query sample carries terms + vector
        import spark.implicits._
        import org.apache.spark.sql.functions._
        val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
        val docs = spark.read.parquet(args(0) + "/documents.parquet")
        val corpus = emb.filter(col("vec_id") % 50 =!= 0)
        val terms = Seq(Seq("hash", "join"), Seq("spark", "vector"),
          Seq("data", "filter", "stream"), Seq("cache", "data"))
        val qs = emb.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("embedding"),
            element_at(typedLit(terms),
              (pmod(col("vec_id"), lit(4)) + 1).cast("int")).as("terms"))
        val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        val runs = (1 to 2).map { _ =>
          val c0 = os.getProcessCpuTime
          val t0 = System.nanoTime()
          val (cents, assigned) = graft.ops.Similarity.ivfBuild(corpus, "embedding", "vec_id")
          val cb = graft.ops.Similarity.pqBuildCodebook(corpus, "embedding", "vec_id")
          graft.ops.Retrieval.hybridServeAllAnn(docs, "doc_id", "text",
              cents, graft.ops.Similarity.ivfPqEncode(assigned, "vec_id", cb),
              corpus, "embedding", "vec_id", qs, "q_id", "terms", cb,
              kCand = 100, k = 10)
            .write.format("noop").mode("overwrite").save()
          val r = ((System.nanoTime() - t0) / 1e9, (os.getProcessCpuTime - c0) / 1e9)
          graft.ops.Caches.releaseAll()
          System.gc()
          r
        }
        val best = runs.minBy(_._1)
        println(f"x78 best-of-2 (${qs.count()} queries): wall=${best._1}%.2f s cpu=${best._2}%.1f s")
      case "x79" =>
        // index compaction, bench protocol: write the static 6/7 tree
        // once (untimed), then time compacting the 1/7 delta in
        import org.apache.spark.sql.functions.col
        val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
          .filter(col("vec_id") =!= 0)
        val (cents, assigned) = graft.ops.Similarity.ivfBuild(emb, "embedding", "vec_id")
        val cb = graft.ops.Similarity.pqBuildCodebook(emb, "embedding", "vec_id")
        val delta = emb.filter(col("vec_id") % 7 === 0)
        val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        val runs = (1 to 2).map { _ =>
          val tree = java.nio.file.Files.createTempDirectory("x79probe_").toString
          graft.ops.Similarity.ivfPqEncode(
              assigned.filter(col("vec_id") % 7 =!= 0), "vec_id", cb)
            .select("vec_id", "centroid_id", "codes")
            .write.mode("overwrite").partitionBy("centroid_id").parquet(tree)
          val c0 = os.getProcessCpuTime
          val t0 = System.nanoTime()
          graft.ops.Similarity.ivfPqCompact(tree, cents, delta,
            "embedding", "vec_id", cb).write.format("noop").mode("overwrite").save()
          val r = ((System.nanoTime() - t0) / 1e9, (os.getProcessCpuTime - c0) / 1e9)
          graft.ops.Caches.releaseAll()
          graft.util.Fs.deleteTree(java.nio.file.Paths.get(tree))
          System.gc()
          r
        }
        val best = runs.minBy(_._1)
        println(f"x79 compact-delta best-of-2 (|delta|=${delta.count()}): wall=${best._1}%.2f s cpu=${best._2}%.1f s")
      case "x81" =>
        // incremental BM25: time (a) the delta model build + merged
        // serve vs (b) the full rebuild + serve — the maintenance win
        import spark.implicits._
        import org.apache.spark.sql.functions.col
        val docs = spark.read.parquet(args(0) + "/documents.parquet")
        val qs = Seq(
          (1L, Seq("hash", "join")), (2L, Seq("spark", "vector")),
          (3L, Seq("data", "filter", "stream")), (4L, Seq("cache", "data")))
          .toDF("q_id", "terms")
        val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        // static model PERSISTED once (the maintained artifact — on a
        // cluster this is the written postings/df/stats tables)
        val s0 = graft.ops.Retrieval.bm25BuildModel(
          docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text")
        val staticM = graft.ops.Retrieval.Bm25Model(
          graft.ops.Caches.persistTracked(s0.postings),
          graft.ops.Caches.persistTracked(s0.df),
          graft.ops.Caches.persistTracked(s0.stats))
        staticM.postings.count(); staticM.df.count(); staticM.stats.count()
        val runs = (1 to 2).map { _ =>
          val c0 = os.getProcessCpuTime
          val t0 = System.nanoTime()
          val deltaM = graft.ops.Retrieval.bm25BuildModel(
            docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
          graft.ops.Retrieval.bm25ServeAllIndexed(
              graft.ops.Retrieval.bm25MergeModels(staticM, deltaM),
              "doc_id", qs, "q_id", "terms", k = 10)
            .write.format("noop").mode("overwrite").save()
          val r = ((System.nanoTime() - t0) / 1e9, (os.getProcessCpuTime - c0) / 1e9)
          System.gc()
          r
        }
        val best = runs.minBy(_._1)
        graft.ops.Caches.releaseAll()
        val runs2 = (1 to 2).map { _ =>
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
        val best2 = runs2.minBy(_._1)
        println(f"x81 delta-build+merged-serve best-of-2: wall=${best._1}%.2f s cpu=${best._2}%.1f s; full rebuild+serve: wall=${best2._1}%.2f s cpu=${best2._2}%.1f s")
      case "x82" =>
        // index-seek serving from the WRITTEN term-bucketed tree vs the
        // corpus-scan serve — the tree is built once (untimed: it is the
        // maintained artifact), each serve is best-of-2
        import spark.implicits._
        import org.apache.spark.sql.functions.col
        val docs = spark.read.parquet(args(0) + "/documents.parquet")
        val qs = Seq(
          (1L, Seq("hash", "join")), (2L, Seq("spark", "vector")),
          (3L, Seq("data", "filter", "stream")), (4L, Seq("cache", "data")))
          .toDF("q_id", "terms")
        val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        val tree = java.nio.file.Files.createTempDirectory("x82probe_").toString
        graft.ops.Retrieval.bm25WriteModel(
          graft.ops.Retrieval.bm25BuildModel(docs, "doc_id", "text"), tree)
        val seek = (1 to 2).map { _ =>
          val c0 = os.getProcessCpuTime
          val t0 = System.nanoTime()
          graft.ops.Retrieval.bm25ServeAllSeek(spark, tree, "doc_id", qs,
              "q_id", "terms", k = 10)
            .write.format("noop").mode("overwrite").save()
          val r = ((System.nanoTime() - t0) / 1e9, (os.getProcessCpuTime - c0) / 1e9)
          graft.ops.Caches.releaseAll()
          System.gc()
          r
        }.minBy(_._1)
        val scan = (1 to 2).map { _ =>
          val c0 = os.getProcessCpuTime
          val t0 = System.nanoTime()
          graft.ops.Retrieval.bm25ServeAll(docs, "doc_id", "text", qs,
              "q_id", "terms", k = 10)
            .write.format("noop").mode("overwrite").save()
          val r = ((System.nanoTime() - t0) / 1e9, (os.getProcessCpuTime - c0) / 1e9)
          graft.ops.Caches.releaseAll()
          System.gc()
          r
        }.minBy(_._1)
        graft.util.Fs.deleteTree(java.nio.file.Paths.get(tree))
        println(f"x82 seek-serve best-of-2: wall=${seek._1}%.2f s cpu=${seek._2}%.1f s; corpus-scan serve: wall=${scan._1}%.2f s cpu=${scan._2}%.1f s")
      case "x85" =>
        // fully-deployed hybrid (both trees written, seek-served) vs the
        // in-memory ANN-composed hybrid — trees and model built once
        // (untimed: the maintained artifacts), each serve best-of-2
        import spark.implicits._
        import org.apache.spark.sql.functions.col
        val docs = spark.read.parquet(args(0) + "/documents.parquet")
        val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
        val qdef = Seq(
          (1L, Seq("hash", "join"), 0L),
          (2L, Seq("spark", "vector"), 50L),
          (3L, Seq("data", "filter", "stream"), 100L),
          (4L, Seq("cache", "data"), 150L)).toDF("q_id", "terms", "src_vec")
        val qs = qdef.join(emb.select(col("vec_id").as("src_vec"),
          col("embedding")), "src_vec")
        val corpus = emb.filter(col("vec_id") % 50 =!= 0)
        val (cents, assigned) = graft.ops.Similarity.ivfBuild(corpus,
          "embedding", "vec_id")
        val cb = graft.ops.Similarity.pqBuildCodebook(corpus, "embedding",
          "vec_id")
        val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        val bm25Tree = java.nio.file.Files.createTempDirectory("x85p_bm25_").toString
        val annTree = java.nio.file.Files.createTempDirectory("x85p_ann_").toString
        graft.ops.Retrieval.bm25WriteModel(
          graft.ops.Retrieval.bm25BuildModel(docs, "doc_id", "text"), bm25Tree)
        graft.ops.Similarity.ivfPqEncode(assigned, "vec_id", cb)
          .select("vec_id", "centroid_id", "codes")
          .write.mode("overwrite").partitionBy("centroid_id").parquet(annTree)
        // the in-memory variant reads the SAME tree unpruned, so the
        // comparison isolates the seek benefit (partition pruning + bm25
        // bucket seek) from index storage cost
        val encoded = spark.read.parquet(annTree)
        def timed(f: => org.apache.spark.sql.DataFrame): (Double, Double) =
          (1 to 2).map { _ =>
            val c0 = os.getProcessCpuTime
            val t0 = System.nanoTime()
            f.write.format("noop").mode("overwrite").save()
            val r = ((System.nanoTime() - t0) / 1e9,
              (os.getProcessCpuTime - c0) / 1e9)
            graft.ops.Caches.releaseAll()
            System.gc()
            r
          }.minBy(_._1)
        val seek = timed(graft.ops.Retrieval.hybridServeAllSeek(spark,
          bm25Tree, annTree, "doc_id", cents, corpus, "embedding", "vec_id",
          qs, "q_id", "terms", cb, kCand = 100, k = 10))
        val mem = timed(graft.ops.Retrieval.hybridServeAllAnn(docs, "doc_id",
          "text", cents, encoded, corpus, "embedding", "vec_id", qs, "q_id",
          "terms", cb, kCand = 100, k = 10))
        graft.ops.Caches.releaseAll()
        graft.util.Fs.deleteTree(java.nio.file.Paths.get(bm25Tree))
        graft.util.Fs.deleteTree(java.nio.file.Paths.get(annTree))
        println(f"x85 seek-hybrid best-of-2: wall=${seek._1}%.2f s cpu=${seek._2}%.1f s; in-memory hybrid: wall=${mem._1}%.2f s cpu=${mem._2}%.1f s")
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
      case "x87" =>
        // IVF seeding quality + build cost: md5 sample (x15) vs 2-round
        // full-corpus Lloyd (x25) vs k-means|| (x87) — recall@20 of the
        // ivfProbe serve at nProbe=4, and build wall, at small and large k.
        // k-means||'s pass count is k-independent; Lloyd's per-pass dot
        // cost is k per row.
        import org.apache.spark.sql.functions.col
        val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
        val rest = emb.filter(col("vec_id") =!= 0)
        val qv = emb.filter(col("vec_id") === 0)
          .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
        val exact = graft.ops.Similarity.topKCosine(rest, "embedding",
            "vec_id", qv, 20)
          .collect().map(_.getLong(0)).toSet
        for (k <- Seq(16, 64, 256)) {
          for ((name, build) <- Seq[(String, () => (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame))](
            ("sample", () => graft.ops.Similarity.ivfBuild(rest, "embedding", "vec_id", k)),
            ("lloyd2", () => graft.ops.Similarity.ivfBuildKmeans(rest, "embedding", "vec_id", k)),
            ("kmpar", () => graft.ops.Similarity.ivfBuildKmeansParallel(
              rest, "embedding", "vec_id", k, l = 2 * k, rounds = 2)))) {
            val t0 = System.nanoTime()
            val (cents, assigned) = build()
            val got = graft.ops.Similarity.ivfProbe(cents, assigned,
                "vec_id", qv, 20, nProbe = math.max(4, k / 4))
              .collect().map(_.getLong(0)).toSet
            val wall = (System.nanoTime() - t0) / 1e9
            graft.ops.Caches.releaseAll()
            System.gc()
            println(f"x87 k=$k%3d $name%-6s recall@20=${(got & exact).size / 20.0}%.2f build+serve=${wall}%.2f s")
          }
        }
      case "x89" =>
        // reduce-then-index vs full-dim IVF: build+probe wall best-of-2
        import org.apache.spark.sql.functions.col
        val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
        val rest = emb.filter(col("vec_id") =!= 0)
        val qv = emb.filter(col("vec_id") === 0)
          .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
        val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        def timed(f: => org.apache.spark.sql.DataFrame): (Double, Double) =
          (1 to 2).map { _ =>
            val c0 = os.getProcessCpuTime
            val t0 = System.nanoTime()
            f.write.format("noop").mode("overwrite").save()
            val r = ((System.nanoTime() - t0) / 1e9,
              (os.getProcessCpuTime - c0) / 1e9)
            graft.ops.Caches.releaseAll()
            System.gc()
            r
          }.minBy(_._1)
        val proj = timed(graft.ops.Similarity.projectedIvfTopK(rest,
          "embedding", "vec_id", qv, 20, outDims = 16, nLists = 64,
          nProbe = 16))
        val full = timed(graft.ops.Similarity.ivfTopKCosine(rest,
          "embedding", "vec_id", qv, 20, nLists = 64, nProbe = 16))
        println(f"x89 projected(16d) best-of-2: wall=${proj._1}%.2f s cpu=${proj._2}%.1f s; full-dim IVF: wall=${full._1}%.2f s cpu=${full._2}%.1f s")
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
      case "classify" =>
        // NB classifier growth, bench protocol: train on the %5≠0 slice
        // + score the held-out slice, best-of-2 — the x108 shape minus
        // the final orderBy (the measurement targets the model passes,
        // not the output sort)
        val docs = spark.read.parquet(args(0) + "/documents.parquet")
        val tr = docs.filter(col("doc_id") % 5 =!= 0)
        val te = docs.filter(col("doc_id") % 5 === 0)
        val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        val runs = (1 to 2).map { _ =>
          val c0 = os.getProcessCpuTime
          val t0 = System.nanoTime()
          val m = graft.ops.Classify.trainNaiveBayes(tr, "lang", "text")
          graft.ops.Classify.nbScore(te, "doc_id", "text", m)
            .write.format("noop").mode("overwrite").save()
          val r = ((System.nanoTime() - t0) / 1e9, (os.getProcessCpuTime - c0) / 1e9)
          graft.ops.Caches.releaseAll()
          System.gc()
          r
        }
        val best = runs.minBy(_._1)
        println(f"classify best-of-2: train=${tr.count()} test=${te.count()} wall=${best._1}%.2f s cpu=${best._2}%.1f s")
      case "ppjoin" =>
        // the x122 tau dial, measured: candidate counts (prefix-only vs
        // + positional) and end-to-end wall across thresholds on the
        // x122 fixture corpus — the numbers behind the "run tau >= 0.8
        // in production" scaladoc line
        val docs0 = spark.read.parquet(args(0) + "/documents.parquet")
          .select(col("doc_id"), col("text"))
        val dirty = docs0.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            org.apache.spark.sql.functions.concat(col("text"),
              org.apache.spark.sql.functions.lit(" xtradup")).as("text"))
        val corpus = docs0.unionByName(dirty)
        for ((tn, td) <- Seq((1, 2), (3, 5), (4, 5))) {
          val nAll = {
            val (_, _, c) = graft.ops.Dedup.prefixJaccardParts(corpus,
              "doc_id", "text", tn, td, 3, positional = false)
            val n = c.count(); graft.ops.Caches.releaseAll(); n
          }
          val nPos = {
            val (_, _, c) = graft.ops.Dedup.prefixJaccardParts(corpus,
              "doc_id", "text", tn, td, 3, positional = true)
            val n = c.count(); graft.ops.Caches.releaseAll(); n
          }
          val nSuf = {
            val (_, _, c) = graft.ops.Dedup.prefixJaccardParts(corpus,
              "doc_id", "text", tn, td, 3, positional = true, suffix = true)
            val n = c.count(); graft.ops.Caches.releaseAll(); n
          }
          def e2e(suffix: Boolean): Double = {
            val t0 = System.nanoTime()
            graft.ops.Dedup.prefixJaccardJoin(corpus, "doc_id", "text",
                tn, td, 3, suffix = suffix)
              .write.format("noop").mode("overwrite").save()
            graft.ops.Caches.releaseAll()
            (System.nanoTime() - t0) / 1e9
          }
          val (wall, wallSuf) = (e2e(false), e2e(true))
          println(f"tau=$tn/$td: cand prefix-only=$nAll%,d +positional=$nPos%,d +suffix=$nSuf%,d wall=$wall%.2f s wall+suffix=$wallSuf%.2f s")
          System.gc()
        }
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
