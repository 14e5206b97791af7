package graft.queries

import graft.Tables
import graft.ops.{AsofJoin, Chunking, Classify, Cms, Dedup, Dsir, EventAnalytics, Export, Graph, HistQuantile, LangModel, LinearProbe, Multimodal, Rerank, Retrieval, Similarity, TextStats, TopK}
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] LLM-training-data pipeline operators (SURVEY.md §2.B [EXT] /
  * BASELINE.json north star): dedup (exact, n-gram Jaccard, MinHash+LSH,
  * SimHash), similarity search (exact + ANN), text analysis (tokens,
  * quality, fingerprint, language-ID), multimodal binary plumbing.
  * EVERY query carries a full DuckDB oracle. SQL-expressible operators
  * verify directly; approximate operators one of three ways: the LSH
  * paths (x03/x34) rescore candidates exactly and share the exact twins'
  * oracles; the sketch queries (q34/x28) emit their bounded-error claim
  * as a boolean column the oracle pins to TRUE; and the randomized paths
  * (x04/x06/x15/x24/x25) derive ALL randomness from md5 — the one hash
  * both engines share — so the oracle replays the approximation itself
  * bit-for-bit (hyperplanes, affine MinHash seeds, simhash token bits,
  * centroid samples, fixed-point Lloyd means). Recall/epsilon quality
  * stays pinned against exact counterparts in OpsSpec. */
object Ext {

  type Q = (SparkSession, String) => DataFrame

  /** Query embedding = vec_id 0's vector (driver-side single-row lookup,
    * a pushed single-row parquet read). Memoized per (session, dir) so the
    * five similarity queries don't each re-scan the embeddings parquet for
    * the same 64 doubles; entries are tiny, so the map never needs
    * eviction. */
  /** Per-query SCRATCH tree for the written-index queries (x79/x82/x84/
    * x85/x88/x91/x126): a deterministic `<name>` dir under one JVM-scoped
    * scratch root, with the PREVIOUS invocation's tree deleted before a
    * new one is handed out — repeated oracle/bench runs hold at most one
    * live tree per query (the returned frame reads its tree lazily, so
    * deletion must wait for the next same-name invocation), and a
    * shutdown hook removes the whole root at JVM exit. Queries run
    * sequentially in Verify/Bench and in sbt's forked test JVM, so
    * keep-latest is race-free. */
  private lazy val scratchRoot: java.nio.file.Path = {
    // prefer tmpfs over the disk-backed java.io.tmpdir (the StreamGate
    // gateTmpRoot convention, r18): the written-index queries pay
    // parquet write+read of their trees inside the timed region, and on
    // ext4 /tmp the partitioned writes are I/O-wait, not compute — on a
    // production cluster this is fast local/HDFS storage. Same files,
    // same commit protocol, only the volume is faster.
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val root = java.nio.file.Files.createTempDirectory(base, "graft_ext_scratch_")
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => graft.util.Fs.deleteTree(root)))
    root
  }
  private def scratchTree(name: String): String = {
    val p = scratchRoot.resolve(name)
    graft.util.Fs.deleteTree(p)
    p.toString
  }

  private val queryVecCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Double]]
  private def queryVec(s: SparkSession, dir: String): Seq[Double] =
    // keyed by dir alone — the vector is a pure function of the data
    // directory, and a session-object key would strongly retain stopped
    // sessions' whole object graphs for the JVM's lifetime
    queryVecCache.getOrElseUpdate(dir,
      Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head()
        .getSeq[Double](0))

  val queries: Map[String, Q] = Map(
    "x01_dedup_exact" -> { (s, dir) =>
      Dedup.exact(Tables.documents(s, dir), "text", "doc_id")
        .select(md5(col("text")).as("fp"), col("keep_id"), col("dup_cnt"))
        .orderBy("fp")
    },

    "x02_ngram_jaccard_pairs" -> { (s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir),
          idCol = "doc_id", textCol = "text", blockCol = "lang", n = 3, threshold = 0.5)
        .orderBy("a_id", "b_id")
    },

    // LSH-accelerated near-dup pairs, the production shape: MinHash+LSH
    // banding emits candidates (bucketed — never all-pairs), exact-Jaccard
    // rescoring keeps the true >=0.5 pairs. Output equals the quadratic
    // x02 path (OpsSpec pins LSH full recall on >=0.5 pairs), so it
    // carries x02's full DuckDB oracle — the LSH path is driver-verified,
    // not just spec-verified. Raw signature estimates stay covered by
    // OpsSpec's recall/epsilon tests.
    "x03_minhash_lsh_pairs" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val cands = Dedup.minhashLshPairs(docs,
          idCol = "doc_id", textCol = "text", threshold = 0.35)
      Dedup.verifyPairsJaccard(docs, "doc_id", "text", "lang", cands,
          n = 3, threshold = 0.5)
        .orderBy("a_id", "b_id")
    },

    // SimHash near-dup pairs — FULL oracle of the simhash OUTPUT itself:
    // the token hash is md5-derived (Dedup.simhash63), so DuckDB rebuilds
    // identical fingerprints brute-force and checks the emitted pair set +
    // hamming (8-chunk pigeonhole blocking is exact for hamming<=7, so
    // blocked == all-pairs). A Jaccard-proxy oracle remains provably
    // impossible (simhash tracks angle, not trigram Jaccard; measured
    // 74/79 recall at hamming 7, sf0.1) — that analysis stands; the oracle
    // checks what simhash computes, not what it can't promise.
    "x04_simhash_pairs" -> { (s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir),
          idCol = "doc_id", textCol = "text", maxHamming = 3)
        .orderBy("a_id", "b_id")
    },

    "x05_cosine_topk" -> { (s, dir) =>
      Similarity.topKCosine(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        vecCol = "embedding", idCol = "vec_id",
        queryVec = queryVec(s, dir), k = 20)
    },

    // JL RANDOM-PROJECTION top-k (the dimensionality-reduction scale
    // path): corpus and query projected 64 → 16 dims through the
    // md5-derived uniform[−1,1] plane matrix (the RHP family's — a
    // projected coordinate is the pre-sign dot the signature would
    // threshold), then exact cosine top-20 IN THE PROJECTED SPACE. One
    // shuffle-free pass, no stored model — the matrix re-derives from
    // md5 identically anywhere. FULL oracle of the whole reduction: the
    // matrix, both projection folds and the projected cosine replay in
    // SQL (the x06 plane derivation + x05 dot arithmetic).
    "x86_random_projection_topk" -> { (s, dir) =>
      val corpus = Tables.embeddings(s, dir).filter(col("vec_id") =!= 0)
      val qp = Similarity.randomProjectLocal(queryVec(s, dir), 16)
      Similarity.topKCosine(
        Similarity.randomProject(corpus, "embedding", "vec_id", 16),
        vecCol = "proj", idCol = "vec_id", queryVec = qp, k = 20)
    },

    // REDUCE-THEN-INDEX ANN (x86 ∘ x15): the IVF is built and probed
    // entirely in the 16-dim PROJECTED space (4× cheaper dots at build
    // and probe), candidates exact-rerank with the ORIGINAL vectors.
    // FULL oracle of the whole composition: projection matrix + folds
    // (x86's CTEs), md5 centroid sample + argmax assignment + probe in
    // projected space (x15's chain over the projected lists), original-
    // space rerank (x05's arithmetic).
    "x89_projected_ivf_topk" -> { (s, dir) =>
      Similarity.projectedIvfTopK(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        vecCol = "embedding", idCol = "vec_id",
        queryVec = queryVec(s, dir), k = 20)
    },

    // RHP-LSH ANN top-k — FULL oracle of the approximation itself: the
    // hyperplanes are md5-derived (VectorFunctions.rhpPlanes), so the
    // DuckDB oracle rebuilds the identical matrix, signatures, Hamming
    // prefilter, and exact rescoring bit-for-bit. The recall-vs-exact
    // relationship stays pinned in OpsSpec.
    "x06_ann_lsh_topk" -> { (s, dir) =>
      Similarity.annTopKCosine(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        vecCol = "embedding", idCol = "vec_id",
        queryVec = queryVec(s, dir), k = 20)
    },

    // Band-bucketed ANN top-k — the QUERY-SERVING path (VERDICT r6 #4):
    // build the (id, band_key) bucket index once, seek the query's 16
    // band keys as a pushed literal IN-filter, exact-rescore candidates.
    // FULL oracle of the approximation: planes are md5-derived, so DuckDB
    // rebuilds corpus + query bands and the same candidate set (hits AND
    // misses replay identically).
    "x43_ann_banded_topk" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") =!= 0)
      Similarity.annProbeBanded(emb,
        Similarity.annBuildBandIndex(emb, "embedding", "vec_id"),
        vecCol = "embedding", idCol = "vec_id",
        queryVec = queryVec(s, dir), k = 20)
    },

    // DELTA-index probe: 6/7 of the corpus is the static banded index,
    // 1/7 is the freshly-arrived delta banded inline — union-then-probe
    // ≡ rebuild-then-probe because band keys are pure per-row functions,
    // so the oracle is x43's whole-corpus SQL verbatim and the rebuild
    // cadence is a pure cost knob.
    "x70_ann_banded_delta" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") =!= 0)
      val static0 = emb.filter(col("vec_id") % 7 =!= 0)
      val delta = emb.filter(col("vec_id") % 7 === 0)
      Similarity.annProbeBandedDelta(static0,
        Similarity.annBuildBandIndex(static0, "embedding", "vec_id"),
        delta, vecCol = "embedding", idCol = "vec_id",
        queryVec = queryVec(s, dir), k = 20)
    },

    // BATCH ANN serving: top-5 for every query in a query TABLE (1-in-50
    // of the embeddings) against the rest of the corpus via the band_key
    // EQUI-join — the many-queries throughput shape (a driver IN-filter
    // per query would be a loop). Same md5 planes both sides, so the
    // oracle replays candidates AND the per-query window top-k.
    "x45_ann_banded_serve" -> { (s, dir) =>
      val all = Tables.embeddings(s, dir)
      val queries = all.filter(col("vec_id") % 50 === 0)
      val corpus = all.filter(col("vec_id") % 50 =!= 0)
      Similarity.annProbeBandedAll(corpus, queries,
          vecCol = "embedding", idCol = "vec_id", qIdCol = "vec_id", k = 5)
        .orderBy("q_id", "rank")
    },

    // Int8 scalar-quantized ANN — the COMPRESSED-SCAN serving shape (no
    // index at all; the scan itself is 4× smaller at storage): rank the
    // whole corpus by the exact-integer quantized cosine, cut top-60
    // deterministically, exact-rescore only those. FULL oracle of the
    // approximation: quantization is floor(x*127/amax+0.5) on IEEE
    // doubles and the quantized score is integer-dot / sqrt(integer
    // norms) — no FP accumulation anywhere the engines could diverge —
    // so DuckDB replays quantization, candidate cut, and final ranking
    // bit-for-bit.
    "x46_quantized_topk" -> { (s, dir) =>
      Similarity.quantizedTopKCosine(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        vecCol = "embedding", idCol = "vec_id",
        queryVec = queryVec(s, dir), k = 20)
    },

    // Product-quantization ANN — the 32×-compression serving shape: md5-
    // sampled 16×64 codebook, per-subspace argmin codes (8 ints/vector),
    // ADC probe (one m×K query table, per-row scoring = 8 table lookups,
    // zero per-row vector arithmetic), exact-L2² rerank of the top-60.
    // FULL oracle: sample, codes (row_number tie-break = the engine's
    // strict-less fold), tables, the ordered-by-j ADC sum, candidate cut
    // and rerank all replay bit-for-bit in SQL.
    "x51_pq_topk" -> { (s, dir) =>
      Similarity.pqTopK(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        vecCol = "embedding", idCol = "vec_id",
        queryVec = queryVec(s, dir), k = 20)
    },

    // TRAINED product quantization — x51's serving geometry with the
    // production-quality model: each subspace runs 2 Lloyd rounds over
    // its own subvectors (one corpus pass per round; means shuffle only
    // m·K fixed-point partials). FULL oracle of the TRAINING as well as
    // the serving: the ×10⁶ integer-space means replay exactly (the x25
    // convention), empty cells COALESCE to the previous round, and the
    // codes/ADC/cut/rerank replay as in x51.
    "x57_pq_trained_topk" -> { (s, dir) =>
      Similarity.pqTopKTrained(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        vecCol = "embedding", idCol = "vec_id",
        queryVec = queryVec(s, dir), k = 20)
    },

    // IVF×PQ — the production 100 TB serving index: coarse cosine-
    // Voronoi cells prune the scan to nProbe/nLists of the corpus
    // (storage-level partition pruning over the written index,
    // ScaleSpec-asserted), ADC scores ONLY the probed cells' code rows
    // (no vector reads), exact-L2² rerank fetches just refine·k float
    // vectors. FULL oracle: cell assignment, probe cut, codes, ADC sum,
    // candidate cut and rerank all replay bit-for-bit in SQL.
    "x58_ivfpq_topk" -> { (s, dir) =>
      Similarity.ivfPqTopK(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        vecCol = "embedding", idCol = "vec_id",
        queryVec = queryVec(s, dir), k = 20)
    },

    // FULLY-TRAINED IVF×PQ: k-means coarse cells (x25's fixed-point
    // Lloyd) + per-subspace-k-means PQ codebook (x57's training) through
    // x58's encode/probe — the quality-complete composition, at the
    // MEASURED quality dial (VERDICT r8 #2): K=256 byte codes, nProbe=6,
    // refine=8 → recall@20 = 0.80 vs exact-L2 on the real corpus at
    // sf0.1 (ScaleProbe x71recall; 0.20 at r8's 16/4/3 dial under the
    // same protocol — the coarse probe breadth and the ADC cut were the
    // binding stages, not training rounds). FULL oracle: both training
    // chains and every probe stage replay.
    "x71_ivfpq_trained_topk" -> { (s, dir) =>
      Similarity.ivfPqTopKTrained(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        vecCol = "embedding", idCol = "vec_id",
        queryVec = queryVec(s, dir), k = 20,
        nProbe = 6, nCentroids = 256, refine = 8)
    },

    // RESIDUAL IVF×PQ (classic IVFADC) — x58 with PQ spent on the
    // within-cell displacement v − centroid instead of the raw vector,
    // and the ADC table built per probed cell from q − c_cell. FULL
    // oracle: residual subtraction is exact IEEE, the residual-sample
    // codebook reuses the md5 ordering, and codes / per-cell tables /
    // cut / rerank replay stage for stage.
    "x59_ivfpq_residual_topk" -> { (s, dir) =>
      Similarity.ivfPqResidualTopK(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        vecCol = "embedding", idCol = "vec_id",
        queryVec = queryVec(s, dir), k = 20)
    },

    // TRAINED RESIDUAL IVFADC (VERDICT r9 missing #4): x59's residual
    // geometry with x57's per-subspace Lloyd training run ON the
    // residuals — the codebook adapts to the within-cell displacement
    // distribution, the standard top quality rung, at identical serving
    // cost. FULL oracle: the residual training rounds (fixed-point
    // integer means, COALESCE empty cells), codes, per-cell ADC tables,
    // cut and rerank all replay stage for stage.
    "x80_ivfpq_residual_trained" -> { (s, dir) =>
      Similarity.ivfPqResidualTopK(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        vecCol = "embedding", idCol = "vec_id",
        queryVec = queryVec(s, dir), k = 20, trainIters = 2)
    },

    // DELTA-maintained IVF×PQ (x70's union-≡-rebuild discipline over
    // x58's written index): 6/7 of the corpus is the static encoded
    // index, 1/7 arrives as a raw delta and is assigned + encoded
    // INLINE against the frozen model (cost ∝ |delta|), unioned before
    // the cell filter. Cell ids and codes are pure per-row functions of
    // (model, vector), so the split point cannot appear in the result —
    // the oracle is x58's whole-corpus SQL verbatim.
    "x73_ivfpq_delta" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") =!= 0)
      val (cents, assigned) = Similarity.ivfBuild(emb, "embedding", "vec_id")
      val cb = Similarity.pqBuildCodebook(emb, "embedding", "vec_id")
      val staticIdx = Similarity.ivfPqEncode(
        assigned.filter(col("vec_id") % 7 =!= 0), "vec_id", cb)
      val delta = emb.filter(col("vec_id") % 7 === 0)
      Similarity.ivfPqProbeDelta(cents, staticIdx, delta, emb,
        "embedding", "vec_id", queryVec(s, dir), cb, k = 20)
    },

    // INDEX COMPACTION (VERDICT r9 #4): the static 6/7 of the corpus is
    // WRITTEN as the partitionBy(centroid_id) tree, the 1/7 delta is
    // folded in by ivfPqCompact — assigned + encoded against the frozen
    // model, ONLY the touched cells rewritten under dynamic partition
    // overwrite — and the probe then runs over the compacted TREE with
    // no inline delta union left. Cell ids and codes are pure per-row
    // functions of the frozen model, so probe-after-compaction ≡
    // rebuild: the oracle is x58's whole-corpus SQL verbatim (the
    // x70/x73 law). The scratch tree lives until the next invocation
    // or JVM exit (the result frame lazily reads it).
    "x79_ivfpq_compact" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") =!= 0)
      val (cents, assigned) = Similarity.ivfBuild(emb, "embedding", "vec_id")
      val cb = Similarity.pqBuildCodebook(emb, "embedding", "vec_id")
      val tree = scratchTree("x79_idx")
      Similarity.ivfPqEncode(assigned.filter(col("vec_id") % 7 =!= 0),
          "vec_id", cb)
        .select("vec_id", "centroid_id", "codes")
        .write.mode("overwrite").partitionBy("centroid_id").parquet(tree)
      Similarity.ivfPqCompact(tree, cents,
        emb.filter(col("vec_id") % 7 === 0), "embedding", "vec_id", cb)
      Similarity.ivfPqProbe(cents, s.read.parquet(tree), emb,
        "embedding", "vec_id", queryVec(s, dir), cb, k = 20)
    },

    // BATCH IVF×PQ serving: top-5 for every query in a query TABLE over
    // the encoded index — x45's throughput shape at the IVF×PQ tier
    // (x58's per-query driver ADC literal would be a driver loop here).
    // Each query's probe cells come from the broadcast fold, its ADC
    // table is computed in-plan from the broadcast codebook, candidates
    // are the (query-cell, index-cell) equi-join. FULL oracle: per-query
    // probe ranks, codes, tables, cuts and reranks all replay.
    "x75_ivfpq_serve" -> { (s, dir) =>
      val all = Tables.embeddings(s, dir)
      val corpus = all.filter(col("vec_id") % 50 =!= 0)
      val qtab = all.filter(col("vec_id") % 50 === 0)
      val (cents, assigned) = Similarity.ivfBuild(corpus, "embedding", "vec_id")
      val cb = Similarity.pqBuildCodebook(corpus, "embedding", "vec_id")
      Similarity.ivfPqServeAll(cents,
          Similarity.ivfPqEncode(assigned, "vec_id", cb), corpus,
          "embedding", "vec_id", qtab, "vec_id", cb, k = 5)
        .orderBy("q_id", "rank")
    },

    // BATCH BM25 serving: top-10 for every query in a 4-query TABLE
    // (incl. one query whose first term matches nothing — the
    // missing-term path) — x75's throughput argument on the text side:
    // the per-(doc, term) fixed-point score is computed once over the
    // union of terms, each query aggregates its own rows by equi-join.
    // FULL oracle: tf/df/stats/score/sum/rank replay per query.
    "x76_bm25_serve" -> { (s, dir) =>
      import s.implicits._
      val qs = Seq(
        (1L, Seq("hash", "join")),
        (2L, Seq("spark", "vector")),
        (3L, Seq("data", "filter", "stream")),
        (4L, Seq("cache", "data"))).toDF("q_id", "terms")
      Retrieval.bm25ServeAll(Tables.documents(s, dir), "doc_id", "text",
          qs, "q_id", "terms", k = 10)
        .orderBy("q_id", "rank")
    },

    // INCREMENTAL BM25 model (VERDICT r9 missing #3): 6/7 of the corpus
    // builds the static model (postings + df + stats — the write-once
    // inverted index and its re-aggregatable counts), the 1/7 delta
    // builds ITS OWN model (cost ∝ |delta|), and serving runs from the
    // MERGED model — no rescan of the old corpus. Every model field is
    // an exact integer count, so merged-serve ≡ rebuilt-serve
    // bit-for-bit: the oracle is x76's whole-corpus SQL verbatim.
    "x81_bm25_incremental" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val qs = Seq(
        (1L, Seq("hash", "join")),
        (2L, Seq("spark", "vector")),
        (3L, Seq("data", "filter", "stream")),
        (4L, Seq("cache", "data"))).toDF("q_id", "terms")
      val staticM = Retrieval.bm25BuildModel(
        docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text")
      val deltaM = Retrieval.bm25BuildModel(
        docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
      Retrieval.bm25ServeAllIndexed(
          Retrieval.bm25MergeModels(staticM, deltaM), "doc_id",
          qs, "q_id", "terms", k = 10)
        .orderBy("q_id", "rank")
    },

    // BM25 INDEX-SEEK serving: the model is WRITTEN as the term-bucketed
    // tree (postings/df partitionBy(wb), wb = md5-bucket of the term)
    // and the query batch's buckets are pushed as a literal partition
    // filter — the scan reads ONLY the matching bucket dirs
    // (ScaleSpec-audited), the text analog of x43's banded seek /
    // x58's cell pruning. Bucket pruning keeps every matching-term row,
    // so the oracle is x76's whole-corpus SQL verbatim.
    "x82_bm25_seek" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val qs = Seq(
        (1L, Seq("hash", "join")),
        (2L, Seq("spark", "vector")),
        (3L, Seq("data", "filter", "stream")),
        (4L, Seq("cache", "data"))).toDF("q_id", "terms")
      val tree = scratchTree("x82_bm25")
      Retrieval.bm25WriteModel(
        Retrieval.bm25BuildModel(docs, "doc_id", "text"), tree)
      Retrieval.bm25ServeAllSeek(s, tree, "doc_id", qs, "q_id", "terms",
          k = 10)
        .orderBy("q_id", "rank")
    },

    // BM25 INDEX COMPACTION (x79's discipline on the text side): the
    // static 6/7 model is WRITTEN as the term-bucketed tree, the 1/7
    // delta builds its own model (cost ∝ |delta|) and bm25Compact folds
    // it in — only the delta terms' buckets rewritten (dynamic partition
    // overwrite), stats add — then serving seeks the compacted TREE.
    // Every field is an exact re-aggregatable count, so
    // serve-after-compaction ≡ rebuilt-serve: x76's SQL verbatim.
    "x84_bm25_compact" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val qs = Seq(
        (1L, Seq("hash", "join")),
        (2L, Seq("spark", "vector")),
        (3L, Seq("data", "filter", "stream")),
        (4L, Seq("cache", "data"))).toDF("q_id", "terms")
      val tree = scratchTree("x84_bm25")
      // 16-bucket GATE dial (results are bucket-count-invariant — the
      // oracle is bucketless; 64 stays the documented production default,
      // exercised by x82 and its ScaleSpec audit): at sf0.1 every delta
      // touches nearly all dirs, so fewer dirs = less gate-scale write
      // machinery without changing what is proven
      Retrieval.bm25WriteModel(Retrieval.bm25BuildModel(
        docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text"), tree,
        nBuckets = 16)
      Retrieval.bm25Compact(s, tree, docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", nBuckets = 16)
      Retrieval.bm25ServeAllSeek(s, tree, "doc_id", qs, "q_id", "terms",
          k = 10, nBuckets = 16)
        .orderBy("q_id", "rank")
    },

    // BATCH hybrid retrieval: per-query BM25 ranks (x76's shared scan)
    // ⊕ per-query cosine ranks (ONE corpus scan against the broadcast
    // query-vector table) fused by RRF — x65's contract for a query
    // TABLE carrying terms AND a vector. FULL oracle: both rank lists
    // and the integer fusion replay per query.
    "x77_hybrid_serve" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val qdef = Seq(
        (1L, Seq("hash", "join"), 0L),
        (2L, Seq("spark", "vector"), 50L),
        (3L, Seq("data", "filter", "stream"), 100L),
        (4L, Seq("cache", "data"), 150L)).toDF("q_id", "terms", "src_vec")
      val qs = qdef.join(emb.select(col("vec_id").as("src_vec"),
        col("embedding").cast("array<double>").as("qv")), "src_vec")
      Retrieval.hybridServeAll(Tables.documents(s, dir), emb, "doc_id",
          "text", "embedding", "vec_id", qs, "q_id", "terms", "qv",
          kCand = 100, k = 10)
        .orderBy("q_id", "rank")
    },

    // ANN-COMPOSED batch hybrid retrieval — the PRODUCTION hybrid shape
    // (VERDICT r9 #1): x76's BM25 rank chain ⊕ x75's IVF×PQ serving
    // ranks (cell-pruned codes-only ADC + exact rerank — never a
    // per-query corpus scan), fused by the same integer RRF. q3/q4
    // carry 'data' — the corpus's hot common term — so the salted
    // two-phase text cut is exercised on a genuinely skewed match set.
    // FULL oracle: both rank chains and the fusion replay per query.
    "x78_hybrid_serve_ann" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val qdef = Seq(
        (1L, Seq("hash", "join"), 0L),
        (2L, Seq("spark", "vector"), 50L),
        (3L, Seq("data", "filter", "stream"), 100L),
        (4L, Seq("cache", "data"), 150L)).toDF("q_id", "terms", "src_vec")
      val qs = qdef.join(emb.select(col("vec_id").as("src_vec"),
        col("embedding")), "src_vec")
      val corpus = emb.filter(col("vec_id") % 50 =!= 0)
      val (cents, assigned) = Similarity.ivfBuild(corpus, "embedding", "vec_id")
      val cb = Similarity.pqBuildCodebook(corpus, "embedding", "vec_id")
      Retrieval.hybridServeAllAnn(Tables.documents(s, dir), "doc_id",
          "text", cents, Similarity.ivfPqEncode(assigned, "vec_id", cb),
          corpus, "embedding", "vec_id", qs, "q_id", "terms", cb,
          kCand = 100, k = 10)
        .orderBy("q_id", "rank")
    },

    // FULLY-DEPLOYED hybrid serving — x78's composition with BOTH sides
    // read from WRITTEN trees: the BM25 model written term-bucketed
    // (x82's tree), the IVF×PQ index written partitionBy(centroid_id)
    // (x79/s12's tree), and hybridServeAllSeek seeks both — term-bucket
    // dirs and probed-cell dirs pruned by literal partition filters,
    // neither corpus rescanned. Same model, same dials, exact reads ⇒
    // x78's SQL verbatim (the x82 law on the text side, the superset-cut
    // argument on the vector side).
    "x85_hybrid_seek" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val qdef = Seq(
        (1L, Seq("hash", "join"), 0L),
        (2L, Seq("spark", "vector"), 50L),
        (3L, Seq("data", "filter", "stream"), 100L),
        (4L, Seq("cache", "data"), 150L)).toDF("q_id", "terms", "src_vec")
      val qs = qdef.join(emb.select(col("vec_id").as("src_vec"),
        col("embedding")), "src_vec")
      val corpus = emb.filter(col("vec_id") % 50 =!= 0)
      val (cents, assigned) = Similarity.ivfBuild(corpus, "embedding", "vec_id")
      val cb = Similarity.pqBuildCodebook(corpus, "embedding", "vec_id")
      val bm25Tree = scratchTree("x85_bm25")
      val annTree = scratchTree("x85_ann")
      // x84's 16-bucket gate dial; 64 stays the production default
      // (exercised by x82 and both ScaleSpec seek audits).
      // The text tree and the ANN tree are INDEPENDENT artifacts — deploy
      // them concurrently so the two write/commit chains overlap
      // (guide §2.6); results are the reads below, unchanged.
      locally {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val textSide = Future {
          Retrieval.bm25WriteModel(Retrieval.bm25BuildModel(
            Tables.documents(s, dir), "doc_id", "text"), bm25Tree,
            nBuckets = 16)
        }
        Similarity.ivfPqEncode(assigned, "vec_id", cb)
          .select("vec_id", "centroid_id", "codes")
          .write.mode("overwrite").partitionBy("centroid_id").parquet(annTree)
        Await.result(textSide, Duration.Inf)
      }
      Retrieval.hybridServeAllSeek(s, bm25Tree, annTree, "doc_id", cents,
          corpus, "embedding", "vec_id", qs, "q_id", "terms", cb,
          kCand = 100, k = 10, nBuckets = 16)
        .orderBy("q_id", "rank")
    },

    // x85 over the BYTE-PACKED tree — the real storage shape (m-byte
    // codes8 binaries, 8 B/vector at m=8 instead of a 32 B int array):
    // ivfPqEncodePacked writes the ANN tree, the seek unpacks in-plan
    // (exact integer inverse, spec-pinned), everything else is x85
    // verbatim — so the oracle is x78's SQL verbatim too.
    "x88_hybrid_seek_packed" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val qdef = Seq(
        (1L, Seq("hash", "join"), 0L),
        (2L, Seq("spark", "vector"), 50L),
        (3L, Seq("data", "filter", "stream"), 100L),
        (4L, Seq("cache", "data"), 150L)).toDF("q_id", "terms", "src_vec")
      val qs = qdef.join(emb.select(col("vec_id").as("src_vec"),
        col("embedding")), "src_vec")
      val corpus = emb.filter(col("vec_id") % 50 =!= 0)
      val (cents, assigned) = Similarity.ivfBuild(corpus, "embedding", "vec_id")
      val cb = Similarity.pqBuildCodebook(corpus, "embedding", "vec_id")
      val bm25Tree = scratchTree("x88_bm25")
      val annTree = scratchTree("x88_ann")
      // independent text/ANN artifacts deployed concurrently (the x85
      // overlap; guide §2.6) — results are the reads below, unchanged
      locally {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val textSide = Future {
          Retrieval.bm25WriteModel(Retrieval.bm25BuildModel(
            Tables.documents(s, dir), "doc_id", "text"), bm25Tree,
            nBuckets = 16)
        }
        Similarity.ivfPqEncodePacked(assigned, "vec_id", cb)
          .select("vec_id", "centroid_id", "codes8")
          .write.mode("overwrite").partitionBy("centroid_id").parquet(annTree)
        Await.result(textSide, Duration.Inf)
      }
      Retrieval.hybridServeAllSeek(s, bm25Tree, annTree, "doc_id", cents,
          corpus, "embedding", "vec_id", qs, "q_id", "terms", cb,
          kCand = 100, k = 10, nBuckets = 16, packed = true)
        .orderBy("q_id", "rank")
    },

    // EMBEDDING-side pipeline composition gate: semantic dedup (x42's
    // chain) → IVF×PQ index build over the SURVIVORS → batch serving of
    // the surviving query sample (x75's chain) — the curate→index→serve
    // contract as ONE oracle, the embedding analog of p01/p02's text
    // chain (the model sample, cells and codes all shift when the
    // survivor set drifts, so any dedup-stage change flips the hash).
    "p03_pipeline_embed_serve" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      // survivor set checkpointed (the p01 stage-boundary discipline):
      // the codebook collect, centroid sample, assignment, encode and
      // both serve joins all consume it — unbroken laziness re-derives
      // the LSH+verify+CC chain per consumer
      val kept = graft.ops.Caches.localCheckpointTracked(
        Similarity.semanticDedup(emb, "embedding", "vec_id",
          threshold = 0.45))
      val corpus = kept.filter(col("vec_id") % 50 =!= 0)
      val qs = kept.filter(col("vec_id") % 50 === 0)
      val (cents, assigned) = Similarity.ivfBuild(corpus, "embedding", "vec_id")
      val cb = Similarity.pqBuildCodebook(corpus, "embedding", "vec_id")
      Similarity.ivfPqServeAll(cents,
          Similarity.ivfPqEncode(assigned, "vec_id", cb), corpus,
          "embedding", "vec_id", qs, "vec_id", cb, k = 5)
        .orderBy("q_id", "rank")
    },

    // IVF ANN top-k — FULL oracle of the approximation: the centroid
    // sample orders by md5(id) (engine-portable), assignment is an argmax
    // whose result is order-independent given bit-identical scores, and
    // the probe + rescoring replay exactly in SQL.
    "x15_ivf_topk" -> { (s, dir) =>
      Similarity.ivfTopKCosine(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        vecCol = "embedding", idCol = "vec_id",
        queryVec = queryVec(s, dir), k = 20)
    },

    // IVF with k-means-trained centroids (2 Lloyd rounds, mergeable
    // vector-sum Aggregator). FULL oracle of the approximation: means are
    // fixed-point (×10⁶ long sums; the 6-dp mean is integer-space
    // floor((2s+n)/(2n)) — order-proof AND engine-portable, no round()
    // convention involved), so the oracle replays init sample → assign →
    // mean → assign → mean → probe → rescore, stage for stage, in SQL.
    "x25_ivf_kmeans_topk" -> { (s, dir) =>
      val (cents, assigned) = Similarity.ivfBuildKmeans(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        vecCol = "embedding", idCol = "vec_id")
      Similarity.ivfProbe(cents, assigned, "vec_id", queryVec(s, dir), k = 20)
    },

    // k-means|| INITIALIZED IVF (Bahmani et al., VLDB 2012) — the
    // scalable seeding: 2 oversampling rounds (ONE corpus pass each,
    // E[l]=16 kept per round by the exact-integer u·φ < l·2³²·d² rule,
    // u md5-derived), attraction weights (one pass), then 2 WEIGHTED
    // fixed-point Lloyd rounds on the model-sized candidate set — vs
    // k-means++'s k sequential passes. FULL oracle of the entire
    // training: seed, both oversampling rounds (HUGEINT threshold
    // arithmetic), weights, both weighted means and the probe replay in
    // SQL — every stochastic choice md5-derandomized, zero float
    // thresholds.
    "x87_ivf_kmeanspar_topk" -> { (s, dir) =>
      val (cents, assigned) = Similarity.ivfBuildKmeansParallel(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        vecCol = "embedding", idCol = "vec_id",
        nLists = 16, l = 16, rounds = 2, lloydIters = 2)
      Similarity.ivfProbe(cents, assigned, "vec_id", queryVec(s, dir), k = 20)
    },

    // HIERARCHICAL (two-level) coarse assignment — the 100 TB form of
    // the IVF build: per-row dot work drops from k to nSuper + k/nSuper
    // (≈ 2√k; 512× at k = 2¹⁶) by routing through nSuper super-cells,
    // both levels md5-deterministic cosine argmaxes. FULL oracle: super
    // sample, centroid grouping, both per-row argmax levels, probe and
    // rescore all replay. Law pinned in OpsSpec: nSuper=1 ≡ flat.
    "x74_ivf_hier_topk" -> { (s, dir) =>
      Similarity.ivfTopKCosineHier(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        vecCol = "embedding", idCol = "vec_id",
        queryVec = queryVec(s, dir), k = 20)
    },

    // Exact all-pairs cosine (oracle-checked verification path; the
    // LSH-blocked variant is the 100 TB path, recall-tested in OpsSpec).
    "x07_embedding_near_dups" -> { (s, dir) =>
      Similarity.exactCosinePairs(Tables.embeddings(s, dir),
          vecCol = "embedding", idCol = "vec_id", threshold = 0.45)
        .orderBy("a_id", "b_id")
    },

    // SEMANTIC dedup end-to-end over embeddings: banded RHP-LSH candidate
    // pairs (16×8-bit md5 planes) → exact cosine verify ≥ 0.45 → connected
    // components → min-id representative per cluster. FULL oracle of the
    // approximation: the planes are engine-portable, so DuckDB replays the
    // banding (collisions AND misses — recall at this below-S-curve
    // threshold is the algorithm's own, pinned separately in OpsSpec at
    // the real near-dup regime), the exact verify, and the components.
    "x42_semantic_dedup" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val pairs = Similarity.cosineNearDupPairs(emb,
        vecCol = "embedding", idCol = "vec_id", threshold = 0.45)
      Dedup.connectedComponents(emb.select(col("vec_id")), "vec_id",
          pairs.select("a_id", "b_id"))
        .select(col("id").as("vec_id"), col("cluster_id"),
          (col("id") === col("cluster_id")).as("kept"))
        .orderBy("vec_id")
    },

    "x08_lang_stats" -> { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
             countDistinct(col("source")).as("n_sources"),
             round(sum(col("n_chars")).cast("double") / count(lit(1)), 6).as("avg_chars"))
        .orderBy("lang")
    },

    "x09_text_quality" -> { (s, dir) =>
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      TextStats.qualityColumns(col("text")).foldLeft(base) {
        case (df, (name, c)) => df.withColumn(name, c)
      }.drop("text").orderBy("doc_id")
    },

    "x10_fingerprint" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    "x11_source_token_stats" -> { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("n_tokens", TextStats.tokenCount(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_tokens")).as("total_tokens"),
             max(col("n_tokens")).as("max_tokens"))
        .orderBy("source")
    },

    // Whitespace vs BPE-ish token counts per doc (the LLM-cost proxy).
    "x29_bpeish_tokens" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextStats.tokenCount(col("text")).as("ws_tokens"),
          TextStats.bpeishTokenCount(col("text")).as("bpeish_tokens"))
        .orderBy("doc_id")
    },

    // REAL merge-table BPE token counts (x29's upgrade, VERDICT r6 #8):
    // rank-ordered merge application per word under the fixed
    // deterministic merge table (graft.ops.Bpe — trained at init from
    // the seed text via the public Sennrich BPE algorithm). The oracle
    // replays the application from the SAME merges as a generated
    // replace-chain over brace-delimited symbols, so the subword counts
    // are hash-gated, not proxied. Compression ratio vs whitespace
    // tokens comes along as the corpus-level signal a cost model reads.
    "x44_bpe_tokens" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextStats.tokenCount(col("text")).as("ws_tokens"),
          graft.functions.TextExpressions.bpeTokenCountNative(col("text"))
            .as("bpe_tokens"))
        .orderBy("doc_id")
    },

    // CORPUS-TRAINED BPE (x44's application with a DATA-derived model):
    // graft.ops.Bpe.trainCorpus learns 6 merges from the documents table
    // itself — word counts are one corpus pass, each round's pair argmax
    // and merge apply run on the vocabulary-sized frame — then every doc
    // is tokenized under the learned table. FULL oracle of the TRAINING:
    // the rounds unroll as CTEs (the x57 Lloyd-unrolling pattern), each
    // replaying pair counts (exact integers), the (count desc, a, b)
    // argmax, and the brace-string replace pass; application is the
    // replace chain over the learned pairs. Any drift in any round
    // flips the per-doc counts.
    "x83_bpe_corpus_trained" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val table = graft.ops.Bpe.trainCorpus(docs, "text", nMerges = 6)
      docs.select(col("doc_id"),
          graft.ops.Bpe.tokenCountUnder(col("text"), table).as("bpe_tokens"))
        .orderBy("doc_id")
    },

    // BYTE-convention corpus training (x157, VERDICT r15 #3): x83's
    // distributed training lifted to the fixed tokenizer's byte
    // discipline — words are raw non-whitespace runs, base symbols the
    // hex pairs of each word's UTF-8 bytes — so the TRAINED tokenizer
    // (not just the seed-fixed one) is byte-complete: case,
    // punctuation, digits and non-ASCII all train and tokenize, no
    // drop, no UNK. Merge rounds are the shared trainRounds loop
    // (symbol-agnostic). FULL oracle: the x83 replay with the byte
    // prep — the hex alphabet keeps the brace encoding collision-free.
    "x157_bpe_corpus_trained_bytes" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val table = graft.ops.Bpe.trainCorpusBytes(docs, "text", nMerges = 6)
      docs.select(col("doc_id"),
          graft.ops.Bpe.tokenCountUnderBytes(col("text"), table)
            .as("bpe_tokens"))
        .orderBy("doc_id")
    },

    // TRAINED-TOKENIZER PRODUCTION LANE (x161, VERDICT r16 #1): the
    // composition a real pipeline ships — train the byte-complete
    // vocab ON THE CORPUS (x157's trainCorpusBytes), FREEZE the merge
    // table, then run the x137-shaped encode→pack under the TRAINED
    // table instead of the fixed seed one: CDC chunks → token-id
    // sequences (count + exact id sum per chunk) → strict next-fit
    // packs per lang, with per-pack chunk/id/id-sum totals. The hash
    // moves if TRAINING drifts (different merges → different ids and
    // counts), if ENCODING drifts (merge application or the 255+rank
    // first-wins id mint), or if PACKING drifts (the fill recurrence).
    // At a production vocab size (~100k merges) the replace-chain
    // encode would swap for the native per-word merge-loop expression
    // under the trained table (the x134 hot path generalized); the
    // 6-merge gate rides the chain, which IS the oracle's textual
    // mirror. FULL oracle: x157's training replay chained into x137's
    // chunk/pack replay with ids minted from the learned pairs.
    "x161_trained_tokenizer_pipeline" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val table = graft.ops.Bpe.trainCorpusBytes(docs, "text", nMerges = 6)
        .toIndexedSeq
      val chunks = Chunking.contentDefinedChunks(docs, "doc_id", "text",
          windowWords = 4, maskMod = 16, keepCols = Seq("lang"))
        .withColumn("ids", graft.ops.Bpe.encodeIdsChain(col("chunk"), table))
        .select(col("doc_id"), col("chunk_idx"), col("lang"),
          size(col("ids")).as("n_ids"),
          expr("aggregate(ids, CAST(0 AS BIGINT), (a, x) -> a + x)")
            .as("ids_sum"))
      Chunking.packChunksStrict(chunks, "lang", "n_ids",
          capacity = 512, orderCols = Seq("doc_id", "chunk_idx"))
        .groupBy("lang", "pack_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_ids")).cast("long").as("pack_ids"),
          sum(col("ids_sum")).cast("long").as("pack_ids_sum"))
        .orderBy("lang", "pack_id")
    },

    "x12_lang_guess" -> { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("lang_guess", TextStats.langGuess(col("text")))
        .groupBy("lang_guess")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang_guess")
    },

    "x13_multimodal_meta" -> { (s, dir) =>
      Multimodal.fromDocuments(Tables.documents(s, dir))
        .select(col("media_id"), col("modality"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.n_frames").as("n_frames"))
        .orderBy("media_id")
    },

    "x14_multimodal_decode" -> { (s, dir) =>
      Multimodal.decodeAll(Multimodal.fromDocuments(Tables.documents(s, dir)))
        .select("media_id", "modality", "n_bytes", "n_frames")
        .orderBy("media_id")
    },

    // Pairs → clusters: connected components over the exact-Jaccard graph
    // (min-id labels; singletons map to themselves). Oracle = recursive CTE.
    "x16_dedup_clusters" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs,
          idCol = "doc_id", textCol = "text", blockCol = "lang", n = 3, threshold = 0.5)
        .select("a_id", "b_id")
      Dedup.connectedComponents(docs.select("doc_id"), "doc_id", pairs)
        .select(col("id").as("doc_id"), col("cluster_id"))
        .orderBy("doc_id")
    },

    // The retention step after clustering: keep the min-id doc per
    // near-dup component plus every singleton (completes the
    // pairs → clusters → keep-one chain end-to-end in the harness).
    "x27_dedup_keep_one" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs,
          idCol = "doc_id", textCol = "text", blockCol = "lang", n = 3, threshold = 0.5)
        .select("a_id", "b_id")
      val comp = Dedup.connectedComponents(docs.select("doc_id"), "doc_id", pairs)
      Dedup.keepClusterRepresentatives(docs, "doc_id", comp)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // The 100 TB dedup pipeline END-TO-END, every stage the scale shape:
    // MinHash+LSH candidates (bucketed) → exact-Jaccard verify (linear in
    // candidates) → connected components (edge-sized rounds) → keep-one
    // retention. With full-recall candidates (pinned in OpsSpec) the
    // retention set equals the exact-path x27, so the whole chain carries
    // x27's DuckDB oracle.
    "x34_dedup_scale_path" -> { (s, dir) =>
      Dedup.nearDupDedup(Tables.documents(s, dir),
          idCol = "doc_id", textCol = "text", blockCol = "lang")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // Salted two-phase aggregation (hot-key mitigation): exactly equal to
    // the direct aggregate — decimal partial sums are associative — so the
    // plain GROUP BY is its oracle.
    "x35_salted_agg" -> { (s, dir) =>
      graft.ops.Skew.saltedSum(Tables.orders(s, dir), "o_orderpriority",
          col("o_totalprice").cast("decimal(28,6)"))
        .select(col("o_orderpriority"), col("n"),
          col("total").cast("double").as("total"))
        .orderBy("o_orderpriority")
    },

    // Re-aggregatable distinct-count sketches: per-language HLL sketches
    // merged with hll_union_agg — the two-level sketch workflow (build
    // once per shard, merge cheaply). The sketch estimate itself is not
    // oracle-computable, so the output carries the exact counts plus the
    // BOUNDED-ERROR CLAIM as a column: `approx_within_5pct` goes false (→
    // driver hash red) if the union estimate ever drifts beyond 5% of
    // exact, making the sketch's accuracy driver-visible.
    "x28_hll_union" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val perLang = docs.groupBy("lang")
        .agg(hll_sketch_agg(col("source")).as("sk"),
             countDistinct(col("source")).as("exact_lang"))
      val merged = perLang.agg(
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_total"),
          sum(col("exact_lang")).as("sum_per_lang_exact"))
      val exactTot = docs.agg(
          countDistinct(col("source")).as("exact_total_sources"))
      merged.crossJoin(exactTot)
        .select(col("exact_total_sources"), col("sum_per_lang_exact"),
          (abs(col("approx_total") - col("exact_total_sources")) <=
            greatest(lit(1L), (col("exact_total_sources") * 0.05).cast("long")))
            .as("approx_within_5pct"))
    },

    // Token-window chunking with overlap (50-token chunks, 10 overlap).
    "x17_chunking" -> { (s, dir) =>
      Chunking.chunk(Tables.documents(s, dir), "doc_id", "text",
          chunkTokens = 50, overlap = 10)
        .orderBy("doc_id", "chunk_idx")
    },

    // Deterministic 3/16 hash sample (engine-reproducible md5 predicate).
    "x18_hash_sample" -> { (s, dir) =>
      Tables.documents(s, dir)
        .filter(Chunking.hashSample(col("doc_id"), keepHexDigits = 3))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // Exactly-10-per-language stratified sample, hash-ranked.
    "x19_stratified_sample" -> { (s, dir) =>
      Chunking.stratifiedFixedSample(Tables.documents(s, dir), "lang", "doc_id", k = 10)
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    },

    // Sequence packing: chunks → fixed-capacity (256-token) training
    // packs, greedily per source stream — the step between chunking and
    // batch assembly. Window cumsum per shard; shards pack independently,
    // so the operator parallelizes at any scale.
    "x36_sequence_packing" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val chunks = Chunking.chunk(docs, "doc_id", "text",
          chunkTokens = 50, overlap = 10, keepCols = Seq("source"))
      Chunking.packChunks(chunks, "source", "n_chunk_tokens",
          capacity = 256, orderCols = Seq("doc_id", "chunk_idx"))
        .groupBy("source", "pack_id")
        .agg(count(lit(1)).as("n_chunks"),
             sum(col("n_chunk_tokens")).cast("long").as("pack_tokens"))
        .orderBy("source", "pack_id")
    },

    // Domain mixing: deterministic per-language keep rates (en 0.75,
    // zh 0.5, others 0.25) via the 1/65536-granular md5 predicate — the
    // mixture-reweighting pass of corpus assembly, reproducible on any
    // engine/partitioning. Emits per-language totals plus the kept set's
    // envelope for a stronger oracle check.
    "x37_domain_mix" -> { (s, dir) =>
      val id = col("doc_id")
      val keep = when(col("lang") === "en", Chunking.hashKeepFraction(id, 0.75))
        .when(col("lang") === "zh", Chunking.hashKeepFraction(id, 0.5))
        .otherwise(Chunking.hashKeepFraction(id, 0.25))
      Tables.documents(s, dir)
        .withColumn("keep", keep)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
             count_if(col("keep")).as("n_kept"),
             round(count_if(col("keep")).cast("double") / count(lit(1)), 6)
               .as("kept_ratio"),
             min(when(col("keep"), id)).as("min_kept"),
             max(when(col("keep"), id)).as("max_kept"))
        .orderBy("lang")
    },

    // Benchmark decontamination: corpus docs sharing any 8-gram with the
    // held-out benchmark source (src0) — the eval-overlap scrub every
    // training corpus runs before release.
    "x38_decontamination" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Dedup.contaminatedDocs(
          corpus = docs.filter(col("source") =!= "src0"),
          benchmark = docs.filter(col("source") === "src0"),
          idCol = "doc_id", textCol = "text", n = 8)
        .orderBy("doc_id")
    },

    // SPAN-level decontamination: x38 flags whole docs; this EXCISES
    // exactly the words covered by any 8-word window occurring in the
    // held-out set (source src0), keeping the rest — the x47 interval
    // machinery pointed at an external reference set. Full oracle (md5
    // window keys, semi-join membership, interval union, position-
    // ordered reassembly gated by md5).
    "x53_decontaminate_spans" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Dedup.decontaminateSpans(
          corpus = docs.filter(col("source") =!= "src0"),
          benchmark = docs.filter(col("source") === "src0"),
          idCol = "doc_id", textCol = "text", windowWords = 8)
        .select(col("doc_id"), col("n_words"), col("n_kept"),
          md5(col("clean_text")).as("clean_md5"))
        .orderBy("doc_id")
    },

    // Corpus report ("dataset card" numbers): doc/lang/token totals, exact
    // duplicate count, quality-gate pass count — ONE scan, all facets as
    // composed Column expressions plus two distinct-aggregates; the
    // summary every dataset release ships with.
    "x39_corpus_report" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"),
          TextStats.tokenCount(col("text")).as("ws"),
          TextStats.bpeishTokenCount(col("text")).as("bp"),
          TextStats.fingerprint(col("text")).as("fp"),
          TextStats.qualityGate(col("text")).as("passes"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("ws")).cast("long").as("total_ws_tokens"),
          sum(col("bp")).cast("long").as("total_bpeish_tokens"),
          (count(lit(1)) - countDistinct(col("fp"))).as("n_exact_dups"),
          count_if(col("passes")).as("n_quality_pass"))
    },

    // Frame sampling: every-2nd 64-byte slice of each media payload
    // without any decode — the cheap keyframe pass. Slice identity is
    // compared via md5-of-hex (DuckDB 1.0 has no BLOB substring, so the
    // oracle slices the hex projection — 2 hex chars per byte, same
    // uppercase alphabet in both engines).
    "x40_frame_slices" -> { (s, dir) =>
      Multimodal.sampleSlices(
          Multimodal.fromDocuments(Tables.documents(s, dir)),
          sliceLen = 64, everyK = 2)
        .select(col("media_id"), col("modality"), col("slice_idx"),
          octet_length(col("slice")).as("n_slice_bytes"),
          md5(hex(col("slice"))).as("slice_md5"))
        .orderBy("media_id", "slice_idx")
    },

    // C4-style block-level corpus dedup: 20-token blocks deduped EXACTLY
    // across the whole corpus (first occurrence by (doc_id, block_idx)
    // survives), docs reassembled from their surviving blocks — the
    // cross-document boilerplate-removal pass of a pretraining pipeline,
    // as one linear plan (posexplode → min-struct agg → per-doc regroup).
    "x41_block_dedup" -> { (s, dir) =>
      Dedup.blockDedup(Tables.documents(s, dir), "doc_id", "text",
          blockTokens = 20)
        .orderBy("doc_id")
    },

    // Memorization-risk audit: per-doc fraction of stride-1 8-word
    // windows occurring more than once in the corpus (the read-only
    // companion of x47 — score to decide, scrub to act). Full oracle:
    // exact integer window counts, identical ratio arithmetic.
    "x56_duplication_score" -> { (s, dir) =>
      Dedup.duplicationScore(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    },

    // ExactSubstr-style SPAN dedup: stride-1 8-word windows, first
    // occurrence (min (doc_id, pos)) kept, every word under a non-first
    // duplicate window deleted, doc reassembled from the surviving
    // words. Catches repeats at ANY offset — the thing x41's aligned
    // blocks structurally miss. Full oracle (deterministic windowing +
    // lexicographic first + interval union); clean text gated via md5 to
    // keep the result rows small.
    "x47_substring_dedup" -> { (s, dir) =>
      Dedup.exactSubstringDedup(Tables.documents(s, dir), "doc_id", "text",
          windowWords = 8)
        .select(col("doc_id"), col("n_words"), col("n_kept"),
          md5(col("clean_text")).as("clean_md5"))
        .orderBy("doc_id")
    },

    // Incremental INGEST dedup: docs 400+ arrive as a new batch and are
    // screened against the 0..399 corpus only — cross-side MinHash-band
    // candidates, signature estimate filter, exact Jaccard verify. The
    // oracle is the exact cross-set computation (the x02/x03 pattern:
    // verification is exact, so gate equality == LSH missed nothing);
    // corpus-internal and batch-internal dups must NOT be flagged.
    "x50_incremental_dedup" -> { (s, dir) =>
      val all = Tables.documents(s, dir)
      Dedup.incrementalNearDupFilter(
          all.filter(col("doc_id") < 400), all.filter(col("doc_id") >= 400),
          "doc_id", "text", "lang")
        .orderBy("doc_id")
    },

    // PII-style scrub: emails + long digit runs → placeholders.
    "x20_pii_redaction" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextStats.redactPii(col("text")).as("red"))
        .orderBy("doc_id")
    },

    // End-to-end corpus cleaning: quality gate → canonical-fingerprint
    // dedup (keep lowest id) → deterministic hash sample. The composition
    // a training-data prep job actually runs, as ONE declarative plan.
    "x26_clean_corpus" -> { (s, dir) =>
      // qualityGate is the SINGLE quality evaluation; n_tokens is the only
      // quality stat the output carries, computed once directly. Project
      // down to the 5 surviving columns BEFORE the dedup window so `text`
      // never travels through the fingerprint shuffle.
      val gated = Tables.documents(s, dir)
        .filter(TextStats.qualityGate(col("text")))
        .select(col("doc_id"), col("lang"), col("source"),
          TextStats.tokenCount(col("text")).as("n_tokens"),
          TextStats.fingerprint(col("text")).as("fp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fp").orderBy("doc_id")
      gated
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .filter(Chunking.hashSample(col("doc_id"), keepHexDigits = 8))
        .select("doc_id", "lang", "source", "n_tokens")
        .orderBy("doc_id")
    },

    // Pairwise source-level trigram Jaccard over RARE grams (the
    // oracle-checked counterpart of the x24 sketch path). Grams present in
    // more than `maxDf` sources are dropped BEFORE the self-join — a hot
    // gram contributes df² join rows, so ubiquitous boilerplate shingles
    // are the operator's scale-killer; capping df bounds per-gram fan-in
    // at maxDf² no matter the corpus size. The hot set is tiny by
    // definition → broadcast anti-join, no extra shuffle of the gram
    // table. The oracle applies the identical cap (the uncapped exact
    // values remain pinned against the x24 sketch in OpsSpec).
    "x23_source_similarity" -> { (s, dir) =>
      val maxDf = 10
      val tri = Dedup.ngrams(
          Tables.documents(s, dir).select(col("source"), col("text")), "text", 3)
        .select(col("source"), col("g"))
      // ONE gram-keyed shuffle replaces r4's distinct + df-count + anti-join
      // + persist: collect_set dedups (source,g) with map-side partial agg,
      // and the df≤cap filter is just size(set). Pairs explode from each
      // gram's sorted source list (df ≤ maxDf ⇒ ≤ maxDf² pairs per gram, so
      // fan-out stays bounded no matter the corpus size). Note the set is
      // bounded by the number of DISTINCT SOURCES, not documents — for a
      // corpus with millions of sources the r4 two-pass anti-join bounds
      // memory better; for the domain-sized cardinalities this operator
      // targets, one shuffle wins.
      val byGram = tri.groupBy("g")
        .agg(array_sort(collect_set(col("source"))).as("ss"))
        .filter(size(col("ss")) <= maxDf)
      val sizes = byGram.select(explode(col("ss")).as("source"))
        .groupBy("source").agg(count(lit(1)).as("n"))
      // size ≥ 2 guard: sequence(1, 0) descends rather than emitting empty
      val pairCol = flatten(transform(
        sequence(lit(1), size(col("ss")) - 1),
        i => transform(slice(col("ss"), i + 1, size(col("ss"))),
          b => struct(element_at(col("ss"), i).as("a_src"), b.as("b_src")))))
      val common = byGram.filter(size(col("ss")) >= 2)
        .select(explode(pairCol).as("p"))
        .select(col("p.a_src").as("a_src"), col("p.b_src").as("b_src"))
        .groupBy("a_src", "b_src").agg(count(lit(1)).as("common"))
      common
        .join(sizes.withColumnRenamed("n", "na"), common("a_src") === sizes("source")).drop("source")
        .join(sizes.withColumnRenamed("n", "nb"), common("b_src") === sizes("source")).drop("source")
        .select(col("a_src"), col("b_src"),
          round(col("common").cast("double") / (col("na") + col("nb") - col("common")), 6).as("jac"))
        .orderBy("a_src", "b_src")
    },

    // Sketch path: one MinHash-union sketch per source (custom Aggregator,
    // map-side merge), pairwise estimates from sketches only. FULL oracle
    // of the approximation itself: the signature family is md5-derived
    // integer arithmetic (Dedup.portableMinhashSignature), so DuckDB
    // rebuilds identical sketches and estimates. Estimate-vs-exact epsilon
    // stays asserted in OpsSpec.
    "x24_source_sketch" -> { (s, dir) =>
      Dedup.sketchJaccardPairs(
          Dedup.groupMinhashSketch(Tables.documents(s, dir), "source", "text"),
          "source")
        .withColumn("est_jac", round(col("est_jac"), 6))
        .orderBy("a_grp", "b_grp")
    },

    // Gopher-style quality signals per document: token count, mean word
    // length, digit ratio (single-pass scalar folds) plus the repeated-
    // top-bigram fraction (explode → per-doc mode — the repetition signal
    // ratio-quality filters key on). All-integer ratios → exact in both
    // engines; shuffles key on doc_id only.
    "x30_gopher_quality" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
      val bi = docs.select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => concat(element_at(col("toks"), i), lit(" "),
          element_at(col("toks"), i + 1)))).as("g"))
      val frac = bi.groupBy("doc_id", "g").agg(count(lit(1)).as("n"))
        .groupBy("doc_id")
        .agg(round(max(col("n")) * lit(1.0) / sum(col("n")), 6).as("top_bigram_frac"))
      val stats = docs.select(col("doc_id"),
        size(col("toks")).as("n_words"),
        round(length(regexp_replace(col("text"), " ", "")).cast("double") /
          size(col("toks")), 6).as("mean_word_len"),
        round(length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
          length(col("text")), 6).as("digit_ratio"))
      stats.join(frac, "doc_id")
        .withColumn("passes",
          col("n_words") >= 10 && col("mean_word_len") <= 12 &&
          col("digit_ratio") <= 0.2 && col("top_bigram_frac") <= 0.2)
        .orderBy("doc_id")
    },

    // Bigram-LM perplexity scoring (CCNet-style fluency filter): train
    // add-one-smoothed bigram counts on the corpus, score every doc by
    // average negative log-likelihood. FULL oracle: probabilities are
    // exact-integer-derived IEEE divisions, ln is bit-identical between
    // the JVM and DuckDB on this domain (verified JIT-hot over every
    // distinct corpus rational), and per-transition log-probs are pinned
    // to longs (floor(ln·1e12)) so the per-doc sum is exact integer
    // arithmetic. The exp-based ppl column stays OUT of the gate (exp
    // diverges at the ulp level between engines); OpsSpec pins it.
    "x48_lm_perplexity" -> { (s, dir) =>
      LangModel.perplexityScoreSelf(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_transitions"), col("nll_nats"))
        .orderBy("doc_id")
    },

    // DSIR importance resampling (hashed unigram buckets, B=64): raw =
    // the whole corpus, target = the English slice; keep the top quarter
    // by importance weight. FULL oracle: bucket = md5-derived 32-bit int
    // mod 64 (portable), smoothed probabilities are exact-integer IEEE
    // divisions, per-bucket ln pins to floor(ln(p)*1e12) longs (the
    // x48/x52 convention), per-doc sums are exact integers, and the keep
    // cut is pure integer rank arithmetic on (wfix desc, doc_id).
    "x60_dsir_selection" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Dsir.dsirSelect(docs, docs.filter(col("lang") === "en"),
          "doc_id", "text")
        .orderBy("doc_id")
    },

    // DSIR THRESHOLD selection (x150): x60's keep decision as a pure
    // per-doc weight cut — kept iff wfix ≥ 0, i.e. the document looks
    // at least as target-like as the raw average — with NO global rank
    // window anywhere in the plan (the extreme-scale form the x60
    // scaladoc prescribed; VERDICT r14 missing #4). The threshold is a
    // frozen dial; 0 nats is the natural reference point. FULL oracle:
    // x60's weight chain verbatim, the cut a literal integer compare.
    "x150_dsir_threshold_select" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Dsir.dsirSelectThreshold(docs, docs.filter(col("lang") === "en"),
          "doc_id", "text", thresholdFix = 0L)
        .orderBy("doc_id")
    },

    // Histogram-sketch quantiles: per-lang p50/p90 of n_chars estimated
    // from a 64-bucket equi-width grid — the mergeable quantile sketch.
    // FULL oracle: integer floor-division buckets, integer rank
    // ceil(q·n), first-bucket-reaching-rank pick, exact-integer-derived
    // IEEE interpolation.
    "x63_hist_quantiles" -> { (s, dir) =>
      HistQuantile.quantileReport(Tables.documents(s, dir), "lang", "n_chars",
          lo = 0L, hi = 600L)
        .orderBy("lang")
    },

    // Count-min sketch heavy hitters: exact top-20 tokens annotated with
    // their estimate from a 4×256 CMS grid. FULL oracle: the grid, the
    // md5-affine row hashes, the estimates, and the over-estimate
    // guarantee bit all replay as exact integer arithmetic.
    "x62_cms_heavy_hitters" -> { (s, dir) =>
      Cms.cmsHeavyHitters(Tables.documents(s, dir), "text")
    },

    // In-document repetition signals (Gopher/Dolma repetition filters):
    // most-frequent 2-/3-gram char mass + duplicated-5-gram char mass.
    // FULL oracle: counts × char lengths are exact integers, the top
    // gram is a deterministic (count desc, gram asc) pick, and the
    // ratios are identical IEEE divisions.
    "x61_repetition_signals" -> { (s, dir) =>
      TextStats.repetitionSignals(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Closed-form ridge "linear probe": predict n_chars from (word
    // count, alpha-char count) — ONE sufficient-statistics aggregation
    // pass, a 3×3 Cramer solve over EXACT integers (BigInt here, HUGEINT
    // in the oracle: determinant terms pass 10²³), a fixed-point
    // residual pass for R². FULL oracle: integer sums are
    // order-independent, the integer determinants are exact, and the
    // only doubles are correctly-rounded int→double conversions plus
    // identical IEEE divisions.
    "x49_ridge_probe" -> { (s, dir) =>
      LinearProbe.qualityProbe(Tables.documents(s, dir), "text", "n_chars")
    },

    // Per-source distribution drift: KL(P_source || P_corpus) over the
    // corpus vocabulary, add-one smoothed — the corpus-monitoring
    // report. FULL oracle: probabilities are exact-integer-derived IEEE
    // divisions, ln is bit-identical JVM<->DuckDB over this query's full
    // p/q domain (tested JIT-hot, 615 distinct ratios), and each KL term
    // pins to a long so per-source sums are exact.
    "x52_distribution_drift" -> { (s, dir) =>
      LangModel.distributionDrift(Tables.documents(s, dir), "source", "text")
        .orderBy("slice")
    },

    // Vocabulary coverage curve (tokenizer design): fraction of corpus
    // tokens covered by the top-K words, K in {10, 100, 1000}. FULL
    // oracle: deterministic top-K (count desc, word asc) replayed via
    // QUALIFY; coverage divides exact integer token counts.
    "x55_vocab_coverage" -> { (s, dir) =>
      TextStats.vocabCoverage(Tables.documents(s, dir), "text")
        .orderBy("k")
    },

    // Sqrt-temperature rebalancing (alpha = 0.5 multilingual-mix): each
    // lang downsamples to rate sqrt(n_min/n_g), rates computed in-plan.
    // FULL oracle: sqrt is IEEE-correctly-rounded (bit-identical in
    // every engine, unlike ln/exp), so DuckDB rebuilds rates, 1/65536
    // cutoffs, and every per-doc md5 keep decision.
    "x54_temperature_mix" -> { (s, dir) =>
      Chunking.temperatureMix(Tables.documents(s, dir), "lang", "doc_id")
        .groupBy(col("lang"))
        .agg(max(col("ng")).as("n_docs"),
          max(col("cut")).cast("long").as("cut"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          round(sum(when(col("keep"), 1L).otherwise(0L)) * lit(1.0) /
            count(lit(1)), 6).as("kept_ratio"),
          min(when(col("keep"), col("doc_id"))).as("min_kept"),
          max(when(col("keep"), col("doc_id"))).as("max_kept"))
        .orderBy("lang")
    },

    // Per-label embedding centroids (the reduce step of k-means / class
    // prototypes): posexplode to (label, dim) cells, decimal-exact per-dim
    // sums (accumulation-order-proof), then the centroid norm and first
    // component. Shuffles one row per (label, dim) — 64·|labels| cells,
    // never vectors. Decimals stay ≤18 digits (long-backed, not
    // BigDecimal): components are |v|<1 so a (18,6) per-dim sum has 1e12
    // headroom and the (18,12) m² norm accumulator 1e6 — exactness is
    // unchanged (both engines sum the same exact values; width only
    // bounds overflow).
    "x31_label_centroids" -> { (s, dir) =>
      val pe = Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding").cast("array<double>")))
        .toDF("label", "pos", "v")
      val dims = pe.groupBy("label", "pos")
        .agg(sum(col("v").cast("decimal(18,6)")).cast("double").as("sdim"),
          count(lit(1)).as("n"))
        .select(col("label"), col("pos"), col("n"),
          round(col("sdim") / col("n"), 6).as("m"))
      dims.groupBy("label")
        .agg(max(col("n")).as("n_vectors"),
          round(sqrt(sum((col("m") * col("m")).cast("decimal(18,12)"))
            .cast("double")), 6).as("centroid_norm"),
          max(when(col("pos") === 0, col("m"))).as("centroid_d0"))
        .orderBy("label")
    },

    // Document-length histogram (50-token buckets, capped at bucket 19):
    // the corpus-profiling pass before choosing chunking/packing sizes.
    "x32_token_histogram" -> { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .withColumn("bucket", least(floor(col("n_tokens") / lit(50)), lit(19)).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
             min(col("n_tokens")).as("min_tokens"),
             max(col("n_tokens")).as("max_tokens"))
        .orderBy("bucket")
    },

    // Bloom-prefiltered join: the small side is a filtered subquery whose
    // selectivity stats can't trigger Spark's InjectRuntimeFilter, so the
    // operator builds the sketch explicitly. Exact result (the join
    // discards bloom false positives) → full DuckDB oracle.
    "x33_bloom_join" -> { (s, dir) =>
      val cust = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name")
      graft.ops.BloomJoin.bloomPrefilteredJoin(
          Tables.orders(s, dir), "o_custkey", cust, "c_custkey",
          expectedItems = 10000L)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_cnt"),
             Tables.dsum(col("o_totalprice")).as("revenue"))
        .orderBy("o_orderpriority")
    },

    // TF-IDF top terms per source: distinct-terms-per-doc explode, global
    // document frequency, per-source term frequency, ln-IDF score, top-5
    // per source with rounded-score + term tiebreak (both engines rank on
    // the same rounded value so ties break identically).
    "x22_tfidf_terms" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val terms = docs.select(col("doc_id"), col("source"),
        explode(array_distinct(TextStats.tokens(lower(col("text"))))).as("term"))
      val dfq = terms.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val tfq = terms.groupBy("source", "term").agg(count(lit(1)).as("tf"))
      val tot = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tfq.join(dfq, "term").crossJoin(broadcast(tot))
        .withColumn("tfidf",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("tfidf").desc, col("term").asc)
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        .select("source", "rk", "term", "tf", "df", "tfidf")
        .orderBy("source", "rk")
    },

    // As-of join: each click attaches the most recent error at-or-before
    // it for the same user (union-window implementation; DuckDB ASOF JOIN
    // oracle). Error side pre-deduped per (user, ts) for determinism.
    "x21_asof_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val errors = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id"), col("ts").as("err_ts"))
        .agg(max(col("value")).as("err_value"))
      AsofJoin.asofLeft(clicks, errors, "user_id", "ts", "err_ts",
          rightCols = Seq("err_ts", "err_value"))
        .orderBy("event_id")
    },

    // BM25 top-20 for a fixed 4-term query — the text-retrieval serving
    // shape (scan → match-set filter → (doc,term) tf → broadcast df/stats
    // → fixed-point score sum → TakeOrdered). FULL oracle: tf/df/dl/N are
    // exact integers, idf = ln((2N−2df+1)/(2df+1)) is the proven ln-on-
    // rationals convention, the score chain is the identical IEEE op
    // sequence in both engines, and per-doc sums are floor(s·10⁹) longs.
    "x64_bm25_topk" -> { (s, dir) =>
      // ordered on the exact integer score_fix (carried in the output),
      // never the rounded display value — matches the oracle's sort key
      // bit-for-bit even when two fixed scores round equal (ADVICE r8)
      Retrieval.bm25TopK(Tables.documents(s, dir), "doc_id", "text",
          Seq("hash", "join", "spark", "vector"))
        .orderBy(col("score_fix").desc, col("doc_id").asc)
    },

    // HYBRID retrieval: BM25 top-100 ranks ⊕ exact-cosine top-100 ranks,
    // reciprocal-rank fusion (k=60), top-10 overall — production hybrid
    // search over one id space (doc_id ≡ vec_id; row 0 is the query on
    // both sides). FULL oracle: both rank lists replay (integer BM25
    // fixed-point ranks; x05's rounded-cosine ranks) and each RRF term is
    // pure integer 10¹² div (60+rank).
    "x65_hybrid_rrf_topk" -> { (s, dir) =>
      Retrieval.hybridTopK(
          Tables.documents(s, dir).filter(col("doc_id") =!= 0),
          Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
          "doc_id", "text", "embedding", "vec_id",
          Seq("hash", "join", "spark", "vector"), queryVec(s, dir))
        .orderBy(col("rrf_fix").desc, col("doc_id").asc)
    },

    // Deterministic shard-export manifest (8 shards): per-shard doc and
    // token counts, id bounds, and an order-free content checksum — the
    // verifiable last mile of a training-data export. FULL oracle:
    // md5-derived shard hash, whitespace token counts, and a commuting
    // sum of per-doc 32-bit content hashes, all exact integers.
    "x66_shard_manifest" -> { (s, dir) =>
      Export.shardManifest(Tables.documents(s, dir), "doc_id", "text",
        nShards = 8)
    },

    // SemDeDup: fixed-point-k-means cells → within-cell cosine pairs →
    // connected components → keep the member LEAST similar to its
    // centroid. FULL oracle: x25's Lloyd replay, within-cell rounded
    // cosines, recursive-CTE components, min-(cent_cos, id) keeper.
    "x67_semdedup" -> { (s, dir) =>
      Similarity.semDeDupKmeans(Tables.embeddings(s, dir), "embedding",
          "vec_id", tau = 0.45)
        .orderBy("vec_id")
    },

    // Curriculum manifest: docs ranked easiest-first by x48's bigram-LM
    // nll, cut into 10 integer-rank buckets, per-bucket doc/transition
    // mass and nll bounds — the difficulty-ordered export a curriculum
    // job consumes. FULL oracle: x48's fixed-point nll, (nll, id) total
    // order, floor((rn−1)·10/m) integer buckets.
    "x69_curriculum_manifest" -> { (s, dir) =>
      Export.curriculumManifest(Tables.documents(s, dir), "doc_id", "text")
    },

    // THRESHOLD curriculum manifest (x156, VERDICT r15 #2): x69's
    // difficulty bucketing as a pure per-doc cut against FROZEN nll
    // boundaries — bucket = #{cuts ≤ nll}, NO unpartitioned row_number
    // anywhere (the extreme-scale swap the x69 scaladoc prescribed;
    // same discipline as x150). Cuts are a frozen dial in the ROUNDED
    // 6-decimal nll lane (x48's hash-gated column), each ending in
    // 5e-7 so no attainable rounded value can sit on a boundary (the
    // dead-band rule). FULL oracle: x48's nll chain + the same literal
    // comparisons.
    "x156_curriculum_threshold" -> { (s, dir) =>
      Export.curriculumManifestThreshold(Tables.documents(s, dir),
        "doc_id", "text", cutsNats = curriculumCutDials)
    },

    // k-NN graph: every vector's top-5 neighbors from its banded-LSH
    // candidate set (band collisions only — never all-pairs). 16×4-bit
    // bands — the SHORT-band dial, because a graph build must recall
    // MID-similarity neighbors (this corpus's true top-5 sit at cos
    // 0.24–0.51, where 8-bit bands collide <25% of the time and 4-bit
    // bands ~90%). FULL oracle: md5-rebuilt hyperplanes, band keys, the
    // candidate join, rounded cosines, per-source row_number ranks.
    "x68_knn_graph" -> { (s, dir) =>
      Similarity.knnGraphBanded(Tables.embeddings(s, dir), "embedding",
          "vec_id", k = 5, nBands = 16, bandBits = 4)
        .orderBy("src_id", "rank")
    },

    // SUB-QUADRATIC k-NN graph — the x68 successor its scaladoc promised:
    // √n k-means cells (auto-dial, the x67 formula) × asymmetric
    // multi-probe (each vector indexed under its home cell, probing its
    // 5 nearest) × 16×4-bit bands within cells. Candidates ∝ n^1.5 at
    // the auto dial (measured fraction 0.58 → 0.34 → 0.13 at n=500/2k/
    // 20k) vs x68's n²; recall@5 vs exact 0.89 at sf0.01 (OpsSpec floor
    // 0.75). FULL oracle: fixed-point Lloyd cells, probe ranks, md5
    // bands, the symmetric candidate union, rounded cosines, ranks.
    "x72_knn_graph_cells" -> { (s, dir) =>
      Similarity.knnGraphCells(Tables.embeddings(s, dir), "embedding",
          "vec_id", k = 5)
        .orderBy("src_id", "rank")
    },

    // DELTA-MAINTAINED k-NN graph (x73's law on the graph artifact):
    // the frozen static-trained model makes the candidate relation a
    // pure pairwise function, so arrivals add only Δ-touching pairs
    // (every join Δ-bounded) and the stored n·k top-k lists merge
    // EXACTLY (a new arrival can only displace old neighbors downward —
    // the OpsSpec-pinned displacement argument). FULL oracle: x72's
    // chain with ONLY the Lloyd-training CTEs scanning the static
    // split — cells, bands, the symmetric candidate union, cosines and
    // ranks replay over the whole union verbatim.
    "x90_knn_graph_delta" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.knnGraphCellsDelta(emb.filter(col("vec_id") % 7 =!= 0),
          emb.filter(col("vec_id") % 7 === 0), "embedding", "vec_id",
          k = 5)
        .orderBy("src_id", "rank")
    },

    // k-NN graph COMPACTION (x79's discipline on the graph artifact,
    // closing the family build → delta → compaction): the static graph
    // is WRITTEN partitionBy(sb = src_id mod 16), knnGraphCompact folds
    // the arrivals in — affected sources re-rank stored-k ∪ Δ-touching
    // pairs (the recompute-volume saving; unaffected sources carried
    // over untouched under dynamic partition overwrite) — and the gate
    // reads the TREE back. Read-after-compaction ≡ the frozen-model
    // rebuild: x90's SQL verbatim.
    "x91_knn_graph_compact" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val static0 = emb.filter(col("vec_id") % 7 =!= 0)
      val tree = scratchTree("x91_graph")
      // ONE k-means training shared by build and compact (r18): both
      // previously trained the identical deterministic model on static0
      // (autoCellCount dial, 2 Lloyd rounds) — results are bit-identical,
      // the second Lloyd run and its ~10 per-round checkpoint jobs gone.
      val (cents, _) = Similarity.ivfBuildKmeans(static0, "embedding",
        "vec_id", nLists = Similarity.autoCellCount(static0), iters = 2)
      Similarity.knnGraphCells(static0, "embedding", "vec_id", k = 5,
          centsOpt = Some(cents))
        .withColumn("sb", pmod(col("src_id"), lit(16L)))
        .repartition(col("sb"))
        .sortWithinPartitions(col("sb"), col("src_id"), col("rank"))
        .write.mode("overwrite").partitionBy("sb").parquet(tree)
      Similarity.knnGraphCompact(s, tree, static0,
        emb.filter(col("vec_id") % 7 === 0), "embedding", "vec_id", k = 5,
        centsOpt = Some(cents))
      s.read.parquet(tree)
        .select(col("src_id"), col("nbr_id"), col("cos_sim"), col("rank"))
        .orderBy("src_id", "rank")
    },

    // MUTUAL k-NN pairs (reciprocal nearest neighbors): the
    // high-precision near-dup signal over the x68 banded graph — (a, b)
    // kept only when each is in the other's top-5. One self-equi-join
    // of the graph artifact on the reversed key pair; at 100 TB both
    // sides are the same stored tree partitioned by src_id.
    "x92_knn_mutual_pairs" -> { (s, dir) =>
      Graph.mutualKnnPairs(
          Similarity.knnGraphBanded(Tables.embeddings(s, dir), "embedding",
            "vec_id", k = 5, nBands = 16, bandBits = 4))
        .orderBy("a_id", "b_id")
    },

    // Fixed-point PageRank over the k-NN graph: similarity centrality
    // as a representativeness prior. 5 unrolled join–sum iterations in
    // exact 10⁻¹² integer arithmetic (oracle replays every round).
    "x93_pagerank_knn" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Graph.pageRank(
          Similarity.knnGraphBanded(emb, "embedding", "vec_id", k = 5,
            nBands = 16, bandBits = 4),
          emb.select("vec_id"), "vec_id", iters = 5)
        .orderBy("vec_id")
    },

    // Label propagation from a 20% clamped seed set (vec_id % 5 == 0
    // keeps its real `label`; the rest start NULL): 3 synchronous
    // majority rounds over the k-NN graph — semi-supervised tagging of
    // the unlabeled corpus, integer counts with (count DESC, label ASC)
    // ties all the way down.
    "x94_label_prop_knn" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val seeds = emb.select(col("vec_id"),
        when(col("vec_id") % 5 === 0, col("label")).as("label"))
      Graph.labelPropagate(
          Similarity.knnGraphBanded(emb, "embedding", "vec_id", k = 5,
            nBands = 16, bandBits = 4),
          seeds, "vec_id", "label", iters = 3)
        .orderBy("vec_id")
    },

    // MMR diversified rerank (λ = ½, 5·10⁸ fixed-point): top-10 exact
    // cosine candidates per query (the gate's candidate generator —
    // production feeds ivfPqServeAll's cut instead), then 5 greedy
    // marginal-relevance rounds. The brute-force relevance pass here is
    // queries×corpus by construction; the rerank itself touches only
    // the 10-candidate pools.
    "x95_mmr_rerank" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir).select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val qs = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val rel = e.filter(col("vec_id") % 100 =!= 0)
        .crossJoin(broadcast(qs))
        .withColumn("rel_half",
          floor(VectorFunctions.cosine(col("qv"), col("v")) * lit(5e8))
            .cast("long"))
        .select(col("q_id"), col("vec_id"), col("rel_half"), col("v"))
      val cands = TopK.rankTopK(rel, "q_id", col("vec_id"),
        Seq(col("rel_half").desc, col("vec_id").asc), 10, "__crk")
        .drop("__crk")
      Rerank.mmrRerank(cands, "q_id", "vec_id", "rel_half", "v", kSel = 5)
        .orderBy("q_id", "sel_rank")
    },

    // RM3 pseudo-relevance feedback: seed terms at full weight, the
    // top-3 non-seed terms of the feedback top-5 docs at half weight
    // (⌊s·5·10⁸⌋), full-outer combine so expansion-only matches can
    // enter the top-20. Ordered on the exact integer key.
    "x96_bm25_rm3" -> { (s, dir) =>
      Retrieval.bm25Rm3TopK(Tables.documents(s, dir), "doc_id", "text",
          Seq("hash", "join"))
        .orderBy(col("score_fix").desc, col("doc_id").asc)
    },

    // PERSONALIZED PageRank: teleport mass pinned to the vec_id % 25
    // seed set — graph-walk relatedness to the seeds ("more like
    // these"), exact 10⁻¹² integer arithmetic, non-seed nodes score
    // only walked-in mass.
    "x97_ppr_knn" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Graph.personalizedPageRank(
          Similarity.knnGraphBanded(emb, "embedding", "vec_id", k = 5,
            nBands = 16, bandBits = 4),
          emb.select("vec_id"),
          emb.filter(col("vec_id") % 25 === 0).select("vec_id"),
          "vec_id", iters = 5)
        .orderBy("vec_id")
    },

    // k-CENTER GREEDY coreset (farthest-point traversal): 8 centers
    // covering the embedding space, smallest-id seed, each round an
    // exact-integer argmin of max-cos-to-selected with id ties.
    "x98_kcenter_coreset" -> { (s, dir) =>
      Rerank.kCenterSample(Tables.embeddings(s, dir), "embedding",
          "vec_id", kSel = 8)
        .orderBy("sel_rank")
    },

    // GRAPH-CURATED dedup (the graph-family capstone): mutual-kNN pairs
    // at cos ≥ 0.4 → connected components → keep the MOST CENTRAL
    // member per cluster by PageRank (the representativeness keeper —
    // vs x27's min-id and x67's outlier rules). One graph build feeds
    // both the pair filter and the centrality prior.
    "x99_graph_dedup_keeper" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val g = graft.ops.Caches.localCheckpointTracked(
        Similarity.knnGraphBanded(emb, "embedding", "vec_id", k = 5,
          nBands = 16, bandBits = 4))
      val strong = Graph.mutualKnnPairs(g).filter(col("cos_sim") >= 0.4)
      val comps = Dedup.connectedComponents(emb.select("vec_id"), "vec_id",
        strong.select("a_id", "b_id"))
      val pr = Graph.pageRank(g.select("src_id", "nbr_id"),
        emb.select("vec_id"), "vec_id", iters = 5)
      val scored = comps.join(pr.select(col("vec_id").as("id"),
        col("pr_fix")), "id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster_id")
        .orderBy(col("pr_fix").desc, col("id").asc)
      val keeper = scored.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("cluster_id"), col("id").as("keep_id"))
      scored.join(keeper, "cluster_id")
        .select(col("id").as("vec_id"), col("cluster_id"), col("pr_fix"),
          (col("id") === col("keep_id")).as("kept"))
        .orderBy("vec_id")
    },

    // GRAPH-BOOSTED retrieval: BM25 seeds → personalized PageRank over
    // the similarity graph → RRF fusion — surfaces docs the terms never
    // match (the vocabulary-mismatch fix from the graph side; x96 is
    // the term side). Corpus restricted to graph-covered ids (doc_id ≡
    // vec_id, the x65 convention) so seeds always land in the graph.
    "x100_graph_boosted_topk" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val docs = Tables.documents(s, dir)
        .join(emb.select(col("vec_id").as("doc_id")), Seq("doc_id"),
          "left_semi")
      Graph.graphBoostedTopK(docs,
          Similarity.knnGraphBanded(emb, "embedding", "vec_id", k = 5,
            nBands = 16, bandBits = 4),
          emb.select("vec_id"), "doc_id", "text", "vec_id",
          Seq("hash", "join", "spark", "vector"))
        .orderBy(col("rrf_fix").desc, col("vec_id").asc)
    },

    // INTERVAL-OVERLAP join via bucket decomposition: which users were
    // active CONCURRENTLY — q35's sessionization feeding the bucketed
    // overlap join (day buckets, exact residual, multi-bucket dedup),
    // aggregated to per-user concurrency stats. The oracle replays the
    // SEMANTICS with a plain quadratic overlap join; the Spark plan is
    // the equi-keyed scale form (ScaleSpec-audited, OpsSpec pins
    // bucketed ≡ naive theta-join on the UNRESTRICTED session set).
    // Gate dial: first week + positive-duration sessions — this corpus
    // keeps every user active all month, so unrestricted candidates are
    // Σ n_b² over 30 uniformly-hot buckets (measured 63 s at sf0.1);
    // the week of multi-event sessions bounds the gate while the
    // operator stays fully general.
    "x101_session_overlap" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts")
      val sess = Tables.events(s, dir)
        .filter(col("ts") < lit("2024-01-08").cast("timestamp"))
        .withColumn("brk", when(col("ts") >
          lag(col("ts"), 1).over(w) + expr("interval 6 hours"), 1)
          .otherwise(0))
        .withColumn("sess", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess")
        .agg(min("ts").as("smin"), max("ts").as("smax"))
        .filter(col("smin") < col("smax"))
      graft.ops.IntervalJoin.selfOverlapPairs(
          sess.select("user_id", "sess", "smin", "smax"),
          Seq("user_id", "sess"), "smin", "smax")
        .filter(col("a_user_id") =!= col("b_user_id"))
        .groupBy(col("a_user_id").as("user_id"))
        .agg(countDistinct(col("b_user_id")).as("n_partners"),
          count(lit(1)).as("n_overlaps"))
        .orderBy("user_id")
    },

    // WEIGHTED PageRank: transitions ∝ GREATEST(0, ⌊cos·10⁶⌋)+1 — the
    // walk prefers strong edges; exact integer rounds like x93.
    "x106_weighted_pagerank" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val g = Similarity.knnGraphBanded(emb, "embedding", "vec_id", k = 5,
        nBands = 16, bandBits = 4)
      val weighted = g.select(col("src_id"), col("nbr_id"),
        (greatest(lit(0L), floor(col("cos_sim") * lit(1e6)).cast("long")) +
          lit(1L)).as("weight"))
      Graph.pageRankWeighted(weighted, emb.select("vec_id"), "vec_id",
          iters = 5)
        .orderBy("vec_id")
    },

    // Degree ASSORTATIVITY of the mutual graph: Newman's one-number
    // hub-structure diagnostic from six exact integer sums + two
    // IEEE-exact sqrts.
    "x107_assortativity" -> { (s, dir) =>
      Graph.assortativity(
        Graph.mutualKnnPairs(
          graft.ops.Caches.localCheckpointTracked(
            Similarity.knnGraphBanded(Tables.embeddings(s, dir), "embedding",
              "vec_id", k = 5, nBands = 16, bandBits = 4))))
    },

    // LINK-PREDICTION scores over the mutual pairs: common neighbors,
    // neighborhood Jaccard, smoothed Adamic–Adar — the structural
    // dup-confidence features beyond the pair's own cosine.
    "x105_link_scores" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val g = graft.ops.Caches.localCheckpointTracked(
        Similarity.knnGraphBanded(emb, "embedding", "vec_id", k = 5,
          nBands = 16, bandBits = 4))
      Graph.linkScores(Graph.mutualKnnPairs(g), g)
        .orderBy("a_id", "b_id")
    },

    // EIGENVECTOR centrality (fixed-point power iteration, max-norm):
    // the no-teleport centrality — mutual communities concentrate mass,
    // in-edge-free nodes decay to exactly 0. 8 exact integer rounds.
    "x103_eigen_centrality" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Graph.eigenCentrality(
          Similarity.knnGraphBanded(emb, "embedding", "vec_id", k = 5,
            nBands = 16, bandBits = 4),
          emb.select("vec_id"), "vec_id", iters = 8)
        .orderBy("vec_id")
    },

    // DUP-STRUCTURE report: component-size histogram of the ≥0.4
    // strong mutual graph — n_components / n_nodes / n_removable per
    // size, the dataset-card dup-mass summary (x39's graph edition).
    "x104_dup_structure_report" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val comps = Dedup.connectedComponents(emb.select("vec_id"), "vec_id",
        Graph.mutualKnnPairs(
          Similarity.knnGraphBanded(emb, "embedding", "vec_id", k = 5,
            nBands = 16, bandBits = 4))
          .filter(col("cos_sim") >= 0.4).select("a_id", "b_id"))
      comps.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
        .groupBy("csize")
        .agg(count(lit(1)).as("n_components"),
          (col("csize") * count(lit(1))).as("n_nodes"),
          ((col("csize") - 1) * count(lit(1))).as("n_removable"))
        .orderBy("csize")
    },

    // TRIANGLE counts + clustering coefficient over the ≥0.3 mutual
    // graph: tight duplicate communities close their wedges; hubs
    // without triangles are crossroads. Wedge-join formulation — two
    // equi-joins, triangle counted once at x<y<z.
    "x102_triangle_counts" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Graph.triangleCounts(
          Graph.mutualKnnPairs(
            Similarity.knnGraphBanded(emb, "embedding", "vec_id", k = 5,
              nBands = 16, bandBits = 4))
            .filter(col("cos_sim") >= 0.3))
        .orderBy("vec_id")
    },

    // p04: GRAPH-side curate → export composition — the x99 keeper
    // set's documents manifested by x66's arithmetic (p02 is the
    // text-side twin): any drift in the graph, the component labels,
    // the PageRank keeper, or the manifest arithmetic flips the shard
    // checksums. Singleton components keep themselves, so the kept set
    // is the deduplicated corpus.
    "p04_graph_curate_export" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val g = graft.ops.Caches.localCheckpointTracked(
        Similarity.knnGraphBanded(emb, "embedding", "vec_id", k = 5,
          nBands = 16, bandBits = 4))
      val comps = Dedup.connectedComponents(emb.select("vec_id"), "vec_id",
        Graph.mutualKnnPairs(g).filter(col("cos_sim") >= 0.4)
          .select("a_id", "b_id"))
      val pr = Graph.pageRank(g.select("src_id", "nbr_id"),
        emb.select("vec_id"), "vec_id", iters = 5)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster_id")
        .orderBy(col("pr_fix").desc, col("id").asc)
      val kept = comps
        .join(pr.select(col("vec_id").as("id"), col("pr_fix")), "id")
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("id").as("doc_id"))
      Export.shardManifest(
        Tables.documents(s, dir).join(kept, Seq("doc_id"), "left_semi"),
        "doc_id", "text", nShards = 8)
    },

    // MULTINOMIAL NAIVE-BAYES classifier (x108): the fastText-role
    // count classifier of public curation pipelines — train on the
    // doc_id%5≠0 slice (label = lang), score the held-out %5=0 slice.
    // Class scores are exact fixed-point integer sums (the x48 ln
    // convention); per-doc prediction + correctness.
    "x108_nb_classifier" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Classify.nbEvaluate(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "lang", "text")
        .orderBy("doc_id")
    },

    // FUNNEL conversion (x109): signup → click → purchase, strictly
    // sequential per user, conversion window 48 h from the first
    // signup. One row per signed-up user with per-stage timestamps.
    "x109_funnel" -> { (s, dir) =>
      EventAnalytics.funnel(Tables.events(s, dir), "user_id", "ts",
          "event_type", Seq("signup", "click", "purchase"), withinHours = 48)
        .orderBy("user_id")
    },

    // RETENTION cohort matrix (x110): cohort = day of first event;
    // (cohort_day, offset_days, active users) — the triangle chart.
    "x110_retention" -> { (s, dir) =>
      EventAnalytics.retentionMatrix(Tables.events(s, dir), "user_id", "ts")
        .orderBy("cohort_day", "offset_days")
    },

    // First-order Markov TRANSITION matrix (x111): per-user (ts, id)-
    // ordered consecutive event-type pairs, counts + exact-rational
    // row-normalized probabilities.
    "x111_transition_matrix" -> { (s, dir) =>
      EventAnalytics.transitionMatrix(Tables.events(s, dir), "user_id",
          "ts", "event_type", "event_id")
        .orderBy("src_type", "dst_type")
    },

    // k-CORE decomposition (x112): bounded peeling (k=3, 4 rounds) of
    // the mutual-kNN graph — the dense-community curation signal
    // between components (x16) and triangles (x102).
    "x112_kcore" -> { (s, dir) =>
      Graph.kCore(
          Graph.mutualKnnPairs(
            graft.ops.Caches.localCheckpointTracked(
              Similarity.knnGraphBanded(Tables.embeddings(s, dir), "embedding",
                "vec_id", k = 5, nBands = 16, bandBits = 4))),
          k = 3, rounds = 4)
        .orderBy("vec_id")
    },

    // Per-type Z-SCORE anomaly report (x113): exact integer sufficient
    // stats in cents, IEEE-identical z, |z| > 2 flag per event.
    "x113_anomaly_zscores" -> { (s, dir) =>
      EventAnalytics.anomalyScores(Tables.events(s, dir), "event_type",
          "value", "event_id")
        .orderBy("event_id")
    },

    // CLASSIFIER quality report (x114): per-class precision/recall/F1
    // over the x108 held-out evaluation — the table a pipeline reads
    // before trusting the filter. The model trains ONCE for scoring and
    // reporting; F1 uses the exact-rational 2·correct/(actual + pred).
    "x114_classifier_report" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val m = Classify.trainNaiveBayes(
        docs.filter(col("doc_id") % 5 =!= 0), "lang", "text")
      Classify.nbClassReport(m,
          Classify.nbEvaluate(m, docs.filter(col("doc_id") % 5 === 0),
            "doc_id", "lang", "text"))
        .orderBy("label")
    },

    // ROLLING ACTIVE USERS (x116): per-day DAU + trailing-7-day WAU —
    // the trailing window as an explode + equi-join, never a theta join.
    "x116_rolling_active" -> { (s, dir) =>
      EventAnalytics.rollingActiveUsers(Tables.events(s, dir), "user_id",
          "ts", windowDays = 7)
        .orderBy("day")
    },

    // FUZZY RECORD LINKAGE (x117): every part name (with the %7 keys'
    // third character dropped — the dirty table) linked to its best
    // canonical part by blocked levenshtein argmin on (dist, id) —
    // TWO block passes (prefix + suffix), so a corruption in either
    // end's blockLen chars still reaches its canonical block.
    "x117_fuzzy_link" -> { (s, dir) =>
      val part = Tables.part(s, dir)
      val dirty = part.select(col("p_partkey"),
        when(col("p_partkey") % 7 === 0,
          concat(substring(col("p_name"), 1, 2), expr("substring(p_name, 4)")))
          .otherwise(col("p_name")).as("p_name"))
      graft.ops.Linkage.fuzzyLink(dirty, part, "p_partkey", "p_name",
          blockLen = 2, maxDist = 2, suffixPass = true)
        .orderBy("d_id")
    },

    // SNAPSHOT DIFF (x115): change-data report between two corpus
    // versions — old = doc_id < 450, new = doc_id ≥ 50 with every
    // %9 doc's text rewritten — added/removed/changed/unchanged per id
    // by payload fingerprint, one id-keyed full-outer join.
    "x115_snapshot_diff" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val oldV = docs.filter(col("doc_id") < 450).select(col("doc_id"), col("text"))
      val newV = docs.filter(col("doc_id") >= 50)
        .select(col("doc_id"),
          when(col("doc_id") % 9 === 0, upper(col("text")))
            .otherwise(col("text")).as("text"))
      Export.snapshotDiff(oldV, newV, "doc_id", "text").orderBy("doc_id")
    },

    // p05: CLASSIFIER-screened export — the model-based sibling of p02
    // (quality-gate keeper) and p04 (graph keeper): train NB on the
    // labeled slice, screen the WHOLE corpus, export the docs predicted
    // 'en' through x66's shard manifest. Any drift in training, scoring,
    // the argmax, or the manifest arithmetic flips the shard checksums.
    "p05_classify_screen_export" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val m = Classify.trainNaiveBayes(
        docs.filter(col("doc_id") % 5 =!= 0), "lang", "text")
      val kept = Classify.nbScore(docs, "doc_id", "text", m)
        .filter(col("pred_label") === "en")
        .select("doc_id")
      Export.shardManifest(docs.join(kept, Seq("doc_id"), "left_semi"),
        "doc_id", "text", nShards = 8)
    },

    // SCD2 HISTORY BUILD (x118): four synthetic corpus snapshots —
    // each doc revises every (1 + doc_id % 3) versions by appending
    // '!' marks — collapsed into validity intervals [valid_from,
    // valid_to) by fingerprint change-point detection. The provenance
    // ledger behind x115's two-version diff.
    "x118_scd2_history" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val snaps = (0 to 3).map { v =>
        docs.select(col("doc_id"), lit(v).as("version"),
          concat(col("text"),
            expr(s"repeat('!', $v div (1 + doc_id % 3))")).as("text"))
      }.reduce(_ unionByName _)
      graft.ops.Scd.buildScd2(snaps, "doc_id", "version", Seq("text"))
        .orderBy("doc_id", "valid_from")
    },

    // COLUMN PROFILING (x119): the per-column shape report over the
    // corpus catalog columns — row/null/exact-distinct counts, native
    // min/max rendered to strings, rendered-length stats — with a
    // planted null pattern (every %7 doc's lang) exercising the
    // null-accounting path. One aggregation pass for all columns.
    "x119_column_profile" -> { (s, dir) =>
      val d = Tables.documents(s, dir).select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        when(col("doc_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("lang")).as("lang_dirty"))
      graft.ops.Profile.profile(d,
          Seq("doc_id", "lang", "source", "n_chars", "lang_dirty"))
        .orderBy("col_name")
    },

    // PMI COLLOCATIONS (x120): corpus-wide pointwise mutual information
    // over adjacent whitespace-token pairs at support >= 3 — the
    // collocation units a tokenizer/dedup pass should treat as atoms.
    "x120_pmi_collocations" -> { (s, dir) =>
      TextStats.pmiCollocations(Tables.documents(s, dir), "text",
          minCount = 3)
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
    },

    // Z-ORDER LAYOUT AUDIT (x121): lineitem gridded on
    // (l_partkey, l_suppkey) at 8 bits, Morton-interleaved, grouped
    // into the 256 top-byte storage cells — per-cell zone-map min/max
    // plus the skip verdict for the box xg∈[64,127] × yg∈[0,63]. The
    // footer-stats pruning math of a ZORDER BY write.
    "x121_zorder_audit" -> { (s, dir) =>
      graft.ops.Layout.zOrderAudit(Tables.lineitem(s, dir),
          "l_partkey", "l_suppkey", bits = 8, cellBits = 4,
          qxLo = 64, qxHi = 127, qyLo = 0, qyHi = 63)
        .orderBy("cell")
    },

    // EXACT SET-SIMILARITY JOIN (x122): PPJoin-style prefix-filtered
    // Jaccard self-join over 3-gram shingle sets (the x02 element
    // convention) at tau = 1/2, corpus plus planted %10
    // one-token-appended near-copies — recall 1.0 WITHOUT hashing (the
    // deterministic-completeness sibling of the x02/x03 LSH path).
    "x122_prefix_jaccard" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val dirty = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" xtradup")).as("text"))
      graft.ops.Dedup.prefixJaccardJoin(docs.unionByName(dirty),
          "doc_id", "text", tauNum = 1, tauDen = 2, ngramN = 3)
        .orderBy("id_a", "id_b")
    },

    // INCREMENTAL SCD2 APPLY (x123): fold the v3 snapshot into the
    // history built from v0-v2 — one id-keyed pass over the OPEN
    // intervals, closed history untouched. Oracle = the x118 full
    // four-snapshot build, verbatim: the apply law made hash-checkable.
    "x123_scd2_apply" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      def snapAt(v: Int) =
        docs.select(col("doc_id"), lit(v).as("version"),
          concat(col("text"),
            expr(s"repeat('!', $v div (1 + doc_id % 3))")).as("text"))
      val hist = graft.ops.Scd.buildScd2(
        (0 to 2).map(snapAt).reduce(_ unionByName _),
        "doc_id", "version", Seq("text"))
      graft.ops.Scd.scd2Apply(hist, snapAt(3), "doc_id", "version",
          Seq("text"))
        .orderBy("doc_id", "valid_from")
    },

    // SCD2 POINT-IN-TIME lookup (x124): each fact row (doc_id, as_of =
    // doc_id % 6 − 1 ∈ [−1, 4]) joins the text version LIVE at its
    // as_of — before-first-version facts (−1) keep a null payload, 4
    // hits the open interval. The temporally-correct training-data
    // join over the x118 history; one id-keyed equi join, facts-sized
    // output.
    "x124_scd2_lookup" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val snaps = (0 to 3).map { v =>
        docs.select(col("doc_id"), lit(v).as("version"),
          concat(col("text"),
            expr(s"repeat('!', $v div (1 + doc_id % 3))")).as("text"))
      }.reduce(_ unionByName _)
      val hist = graft.ops.Scd.buildScd2(snaps, "doc_id", "version",
        Seq("text"))
      val facts = Tables.documents(s, dir)
        .select(col("doc_id"), (col("doc_id") % 6 - 1).cast("int").as("as_of"))
      graft.ops.Scd.scd2Lookup(facts, hist, "doc_id", "as_of", Seq("text"))
        .orderBy("doc_id")
    },

    // ATTRIBUTED DECONTAMINATION (x125): the corpus checked against a
    // planted benchmark (every %13 doc re-badged as an eval doc) for
    // shared 5-gram shingles at support >= 2 — x38 flags WHICH docs
    // leak, x53 excises the spans; this is the audit form: WHICH
    // benchmark doc, how many shingles, what containment fraction.
    // Benchmark side broadcasts; the corpus is shingled once.
    "x125_decontamination" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val bench = docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 300000).as("bench_id"), col("text"))
      graft.ops.Dedup.contaminationReport(docs, bench, "doc_id", "text",
          "bench_id", "text", ngramN = 5, minShared = 2)
        .orderBy("doc_id", "bench_id")
    },

    // WEIGHTED SAMPLING WITHOUT REPLACEMENT (x127): the top-100 docs by
    // Efraimidis–Spirakis key ln(u)/w with w = n_chars — the
    // reproducible data-mixing draw (sample ∝ length/quality when
    // assembling a training mix). u is md5-affine, the key is the
    // fixed-point ln convention — both engines replay every key.
    "x127_weighted_sample" -> { (s, dir) =>
      graft.ops.Chunking.weightedSample(
          Tables.documents(s, dir).select("doc_id", "n_chars"),
          "doc_id", "n_chars", k = 100, salt = "mix")
        .orderBy(col("es_key").desc, col("doc_id"))
    },

    // Z-ORDER TREE COMPACTION (x126): write the clustered tree from the
    // static split (l_orderkey % 5 ≠ 0), fold in a SPATIALLY CLUSTERED
    // delta — the %5 arrivals in the bottom 1/16 of the partkey span,
    // the hot-region-append shape compaction exists for — under the
    // FROZEN bounds: only the ~16 low-xg cell dirs rewrite, the other
    // ~240 cells' files are untouched bytes. Then read the tree back
    // per cell. Oracle: the x121 audit arithmetic over static ∪ delta
    // with static-split bounds and edge-cell clamping — the compaction
    // law (compacted tree ≡ rebuild) made hash-checkable.
    "x126_zorder_compact" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val tree = scratchTree("x126_ztree")
      val b = graft.ops.Layout.zOrderWrite(
        li.filter(col("l_orderkey") % 5 =!= 0), "l_partkey", "l_suppkey",
        tree, bits = 8, cellBits = 4)
      val cut = b.xLo + (b.xHi - b.xLo) / 16
      graft.ops.Layout.zOrderCompact(s, tree,
        li.filter(col("l_orderkey") % 5 === 0 && col("l_partkey") <= cut),
        "l_partkey", "l_suppkey", b, bits = 8, cellBits = 4)
      s.read.parquet(tree)
        .groupBy(col("cell").cast("long").as("cell"))
        .agg(count(lit(1)).as("n"),
          min(col("xg")).as("min_xg"), max(col("xg")).as("max_xg"),
          min(col("yg")).as("min_yg"), max(col("yg")).as("max_yg"))
        .withColumn("skippable",
          col("max_xg") < 64 || col("min_xg") > 127 ||
          col("max_yg") < 0 || col("min_yg") > 63)
        .orderBy("cell")
    },

    // STRICT sequence packing (x128): x36's chunk stream packed by
    // next-fit so NO pack exceeds the 256-token capacity — a chunk that
    // would overflow closes the pack and opens the next (the boundary
    // law a training loader needs; x36's cumsum form may overrun by one
    // chunk, and the overrun tokens would be truncated at batch time).
    // Next-fit is sequential per shard, so the operator folds each
    // source's sorted chunk array with a Catalyst aggregate lambda —
    // one shuffle on the shard key, shards in parallel.
    "x128_strict_packing" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val chunks = Chunking.chunk(docs, "doc_id", "text",
          chunkTokens = 50, overlap = 10, keepCols = Seq("source"))
      Chunking.packChunksStrict(chunks, "source", "n_chunk_tokens",
          capacity = 256, orderCols = Seq("doc_id", "chunk_idx"))
        .groupBy("source", "pack_id")
        .agg(count(lit(1)).as("n_chunks"),
             sum(col("n_chunk_tokens")).cast("long").as("pack_tokens"))
        .orderBy("source", "pack_id")
    },

    // EPOCH-SHUFFLE manifest (x129): the reproducible training-order
    // permutation for epoch 1 as (shard, pos) loader coordinates —
    // md5-keyed shard routing + per-shard rank, no global sort, no RNG
    // state. A different epoch re-keys the whole permutation.
    "x129_epoch_shuffle" -> { (s, dir) =>
      Chunking.epochShuffle(
          Tables.documents(s, dir).select("doc_id"),
          "doc_id", epoch = 1, nShards = 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("shard", "pos")
    },

    // LEAKAGE-SAFE SPLIT (x130): train/val/test assigned at the
    // near-dup-CLUSTER level (the x16 components) so a validation doc's
    // near-duplicate can never sit in train — the split is a pure
    // md5 function of cluster_id (5%/5% permille cuts), so cluster
    // members provably agree and the assignment replays anywhere.
    "x130_leakage_safe_split" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs,
          idCol = "doc_id", textCol = "text", blockCol = "lang",
          n = 3, threshold = 0.5)
        .select("a_id", "b_id")
      val comps = Dedup.connectedComponents(docs.select("doc_id"), "doc_id",
        pairs)
      Dedup.leakageSafeSplit(comps, valPermille = 50, testPermille = 50)
        .select(col("id").as("doc_id"), col("cluster_id"), col("split"))
        .orderBy("doc_id")
    },

    // LSH-FED leakage-safe split (x136): the PRODUCTION path of x130 —
    // at 100 TB nobody computes the exact all-pairs tri-gram components
    // x130's fixture rides; the caller feeds x34's MinHash-LSH scale
    // path (bucketed candidates → exact-Jaccard verify → components)
    // and splits those clusters. With full-recall candidates (the x34
    // OpsSpec pin) the verified pair set — hence components, hence
    // every split assignment — equals the exact path's, so this runs
    // the LSH plan end-to-end under x130's oracle.
    "x136_lsh_leakage_split" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val cands = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, nHashes = 64, bands = 16, threshold = 0.35)
      val edges = Dedup.verifyPairsJaccard(docs, "doc_id", "text", "lang",
        cands.select("a_id", "b_id"), 3, 0.5)
      val comps = Dedup.connectedComponents(docs.select("doc_id"), "doc_id",
        edges.select("a_id", "b_id"))
      Dedup.leakageSafeSplit(comps, valPermille = 50, testPermille = 50)
        .select(col("id").as("doc_id"), col("cluster_id"), col("split"))
        .orderBy("doc_id")
    },

    // TOKEN-BUDGET mixture (x131): realize a 40k-token mix at
    // en 50% / zh 20% / de 15% / fr 15% (es NOT in the mix → dropped) —
    // per-group rates derived IN-PLAN by exact integer arithmetic
    // (target = budget·w div 1000, cut = target·65536 div tokens in a
    // DECIMAL(38,0) lane), realized by the md5 keep predicate. The
    // report row per group makes the realized mix auditable: target vs
    // kept tokens, the cut, the drop path.
    "x131_budget_mix" -> { (s, dir) =>
      Chunking.mixtureBudgetMix(Tables.documents(s, dir),
          "lang", "doc_id", "n_chars",
          Map("en" -> 500, "zh" -> 200, "de" -> 150, "fr" -> 150),
          budgetTokens = 40000L)
        .groupBy("lang")
        .agg(max(col("n_tokens")).as("n_tokens"),
          max(col("w_permille")).cast("long").as("w_permille"),
          max(col("target_tokens")).as("target_tokens"),
          max(col("cut")).cast("long").as("cut"),
          count_if(col("keep")).as("n_kept"),
          coalesce(sum(when(col("keep"), col("n_chars"))), lit(0L))
            .cast("long").as("kept_tokens"))
        .orderBy("lang")
    },

    // MULTI-EPOCH schedule (x132): the same mix at a 150k budget —
    // OVER-subscribing every weighted group at sf0.01 — planned as
    // full_epochs whole passes + a partial last epoch drawn by the md5
    // predicate at the remainder rate (a filter cannot upsample; epochs
    // close the gap). planned_tokens audits the schedule: full passes
    // carry n_tokens each, the partial carries its kept tokens.
    "x132_epoch_plan" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val plan = Chunking.epochPlanFromStats(
        Chunking.mixtureStats(docs, "lang", "n_chars"),
        "lang", Map("en" -> 500, "zh" -> 200, "de" -> 150, "fr" -> 150),
        budgetTokens = 150000L)
      Chunking.applyMixturePlan(docs, plan, "lang", "doc_id")
        .groupBy("lang")
        .agg(max(col("n_tokens")).as("n_tokens"),
          max(col("w_permille")).cast("long").as("w_permille"),
          max(col("target_tokens")).as("target_tokens"),
          max(col("full_epochs")).cast("long").as("full_epochs"),
          max(col("rem_target")).as("rem_target"),
          max(col("cut")).cast("long").as("cut"),
          count_if(col("keep")).as("n_kept_partial"),
          coalesce(sum(when(col("keep"), col("n_chars"))), lit(0L))
            .cast("long").as("kept_tokens_partial"))
        .withColumn("planned_tokens",
          col("full_epochs") * col("n_tokens") + col("kept_tokens_partial"))
        .orderBy("lang")
    },

    // CONTENT-DEFINED chunking (x133): rolling-hash boundaries (4-token
    // window, first-4-hex md5 residue mod 16) — the CDC dedup primitive:
    // unlike fixed windows, an insertion shifts only the chunks it
    // touches and every later chunk hash is preserved (the OpsSpec
    // stability law). chunk_hash is the any-alignment dedup key.
    "x133_cdc_chunks" -> { (s, dir) =>
      Chunking.contentDefinedChunks(Tables.documents(s, dir),
          "doc_id", "text", windowWords = 4, maskMod = 16)
        .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_hash")
        .orderBy("doc_id", "chunk_idx")
    },

    // BPE ENCODE-TO-IDS (x134): the missing last step of the tokenize
    // path — x44/x83 count tokens, this emits the token-ID sequences a
    // training loader consumes, under the fixed deterministic
    // BYTE-COMPLETE merge table (every char of every text maps to UTF-8
    // byte symbols — case, punctuation, non-ASCII — no silent drops, no
    // UNK). The encode is the native rank-ordered per-word merge loop
    // (BpeEncodeIdsExpr: one memoized JVM call per row from codegen,
    // zero shuffle, no driver text — ~10× cheaper than the r14
    // replace-chain fold). The oracle replays merge application AND the
    // id mapping from the same table, so every id of every doc is
    // hash-gated (csv-joined — the driver compare hashes scalar cells).
    "x134_bpe_encode_ids" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.TextExpressions.bpeEncodeIdsNative(col("text")).as("ids"))
        .select(col("doc_id"),
          size(col("ids")).as("n_ids"),
          concat_ws(",", transform(col("ids"), _.cast("string"))).as("ids_csv"))
        .orderBy("doc_id")
    },

    // CDC DEDUP CONSUMER (x135): x133's chunk_hash finally dedups —
    // shared-chunk token mass per doc pair as a permille of the smaller
    // doc's mass (containment ≥ 500), stop-chunks cut at df > 50,
    // components, min-id keeper. The any-alignment discipline: a
    // prefix-inserted revision keeps every later chunk hash, so CDC
    // catches it where fixed windows shift every hash (OpsSpec law).
    // Everything is exact integers (token masses, the permille div), so
    // the oracle replays pair scores, threshold, components, keepers.
    "x135_cdc_dedup_keeper" -> { (s, dir) =>
      Dedup.cdcNearDupComponents(Tables.documents(s, dir), "doc_id", "text",
          windowWords = 4, maskMod = 16, thresholdPermille = 500,
          maxChunkDf = 50)
        .select(col("id").as("doc_id"), col("cluster_id"),
          (col("id") === col("cluster_id")).as("is_keeper"))
        .orderBy("doc_id")
    },

    // TOKENIZE→PACK composition (x137): the loader-facing loop closed —
    // CDC chunks (x133) are encoded to BPE ids (x134) and the chunk
    // stream strict-packs (x128's next-fit fold) by ID count, so pack
    // boundaries bound what the loader actually ships (whitespace-token
    // capacities overrun in id space; packing must happen AFTER the
    // tokenizer). Per-lang shards; the per-pack audit carries chunk
    // counts and id totals. The oracle chains all three replays: chunk
    // boundaries, the merge/count chain per chunk, the fill recurrence.
    "x137_tokenize_pack" -> { (s, dir) =>
      val chunks = Chunking.contentDefinedChunks(Tables.documents(s, dir),
          "doc_id", "text", windowWords = 4, maskMod = 16,
          keepCols = Seq("lang"))
        .withColumn("n_ids",
          graft.functions.TextExpressions.bpeTokenCountNative(col("chunk")))
        // the fold gathers surviving columns into per-shard arrays: carry
        // only the keys + the id count, never the chunk text
        .select("doc_id", "chunk_idx", "lang", "n_ids")
      Chunking.packChunksStrict(chunks, "lang", "n_ids",
          capacity = 512, orderCols = Seq("doc_id", "chunk_idx"))
        .groupBy("lang", "pack_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_ids")).cast("long").as("pack_ids"))
        .orderBy("lang", "pack_id")
    },

    // TOKEN-DRIFT ATTRIBUTION (x138): x52 tells you a slice drifted;
    // this tells you WHICH tokens did it — per-token Jensen-Shannon
    // contributions between two corpus snapshots (even/odd doc split
    // standing in for old/new crawl), smoothed over the union vocab,
    // top 50 movers with the whole-vocab total riding along. The
    // corpus-sized work is two map-side-combinable token counts; the
    // attribution is vocab-sized. FULL oracle: exact counts, the
    // floor(·1e12) ln lane, total as an exact integer sum.
    "x138_token_drift" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      LangModel.tokenDriftMovers(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0),
        "text", topK = 50)
    },

    // CALIBRATION report (x139): does "high margin" mean "more often
    // right"? The x108 NB model's best-minus-runner-up confidence
    // margin on the held-out split, ranked and cut into 10 exact
    // integer-rank bins (x69's convention), per-bin accuracy in the
    // permille lane — the reliability table a pipeline reads before it
    // trusts a margin threshold as a keep gate (p07 is that gate).
    "x139_calibration_report" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val m = Classify.trainNaiveBayes(
        docs.filter(col("doc_id") % 5 =!= 0), "lang", "text")
      Classify.nbCalibrationReport(
        Classify.nbMarginScores(m, docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "lang", "text"),
        "doc_id", nBins = 10)
    },

    // MARGIN-SCREEN dial ladder (x159): the tuning-table discipline
    // (x155 ANN, x158 dedup) completed on the QUALITY lane — sweep
    // confidence-margin cuts over ONE held-out nbMarginScores frame
    // (cut sets nest; scored once, checkpointed) and report retention
    // + accuracy-among-kept per cut: the precision-vs-threshold table
    // that justifies p07's frozen 0.3-nat gate. All exact integers;
    // round-nat cut dials sit ~10 orders of magnitude from the
    // few-fix-unit ln jitter (OpsSpec pins the fixture distance).
    // FULL oracle: the NB chain + x139's top-2/margin lane + per-dial
    // filtered aggregates.
    "x159_margin_screen_ladder" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val m = Classify.trainNaiveBayes(
        docs.filter(col("doc_id") % 5 =!= 0), "lang", "text")
      val scored = graft.ops.Caches.localCheckpointTracked(
        Classify.nbMarginScores(m, docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "lang", "text"))
      Classify.marginScreenLadder(scored, marginCutDials)
        .orderBy("cut_fix")
    },

    // TOKENIZER FERTILITY (x140): ids per word and chars per id, per
    // language, under the frozen x44 merge table — the vocab-fit report
    // read before pointing one tokenizer at a multilingual corpus. One
    // combinable aggregation; the encode replays in the oracle via the
    // same merge chain as x134.
    "x140_tokenizer_fertility" -> { (s, dir) =>
      graft.ops.Bpe.fertilityReport(Tables.documents(s, dir), "lang", "text")
    },

    // p07: MARGIN-screened export — p05 hardened by the calibration
    // dial x139 audits: keep a doc only when the NB screen is both
    // 'en' AND confident (margin ≥ 0.3 nats in the fixed-point lane),
    // then ship the keepers through x66's manifest arithmetic. The
    // composition a pipeline actually deploys once the reliability
    // table justifies a threshold; drift in training, scoring, the
    // top-2, the margin cut, or the manifest flips the checksums.
    // The cut compares raw fix margins, which carry ±few-ulp ln jitter
    // across engines — a flip would need a doc's margin within that
    // jitter of exactly 0.3 nats (the same negligible-collision class
    // as every fixed-point rank in this suite).
    "p07_margin_screen_export" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val m = Classify.trainNaiveBayes(
        docs.filter(col("doc_id") % 5 =!= 0), "lang", "text")
      val kept = Classify.nbMarginScores(m, docs, "doc_id", "lang", "text")
        .filter(col("pred_label") === "en" &&
          col("margin_fix") >= lit(300000000000L))
        .select("doc_id")
      Export.shardManifest(docs.join(kept, Seq("doc_id"), "left_semi"),
        "doc_id", "text", nShards = 8)
    },

    // WINNOWING overlap (x141): the MOSS fingerprint discipline — every
    // shared run of >= w+k-1 = 11 tokens is GUARANTEED a shared
    // fingerprint (the OpsSpec law), at ~2/(w+1) of the gram volume.
    // CDC (x133/x135) fingerprints variable chunks for dedup storage;
    // winnowing fingerprints fixed grams for overlap DETECTION. Pair
    // report at >= 3 shared, stop-fingerprints cut at df > 50 (x135's
    // bound). FULL oracle: identical gram hashes, window minima,
    // distinct sets, df cut, pair counts.
    "x141_winnowing_overlap" -> { (s, dir) =>
      Dedup.winnowingOverlapPairs(Tables.documents(s, dir), "doc_id", "text",
          k = 4, w = 8, minShared = 3, maxFpDf = 50)
        .orderBy("a_id", "b_id")
    },

    // TF-IDF SALIENCE (x142): the top-10 terms characterizing each
    // source — tf within the slice x corpus idf in the floor(ln·1e6)
    // lane; x52 says how far a source drifted, x138 which tokens moved,
    // this what a slice is ABOUT. Slice-keyed window rank (never a
    // global sort). FULL oracle: exact counts, the fix lane, the
    // (salience DESC, term ASC) total order.
    "x142_tfidf_salience" -> { (s, dir) =>
      TextStats.tfidfSalience(Tables.documents(s, dir), "doc_id", "source",
          "text", topK = 10)
        .orderBy("source", "rk")
    },

    // CROSS-SOURCE DUPLICATION matrix (x143): x02's exact near-dup
    // pairs attributed to (source, source) cells — WHERE the
    // duplication comes from (crawl overlap between two sources on the
    // off-diagonal, within-source boilerplate on the diagonal), with
    // distinct implicated docs per cell. Everything after the pair step
    // is pair-sized; the 100 TB swap is the LSH pair path under the
    // same matrix tail. FULL oracle: the x02 chain, least/greatest cell
    // keys, both cell aggregates.
    "x143_cross_source_dup" -> { (s, dir) =>
      Dedup.crossSliceDuplication(Tables.documents(s, dir), "doc_id", "text",
          blockCol = "lang", sliceCol = "source", ngramN = 3,
          threshold = 0.5)
        .orderBy("src_a", "src_b")
    },

    // CLUSTER-SIZE HISTOGRAM (x144): the dedup telemetry over x16's
    // components — how big the near-dup families are, how many of each
    // size, and the corpus dedup rate (removable = size-1 per cluster,
    // permille of all docs) as a constant column. The report a pipeline
    // reads to decide whether dedup is even worth a pass. FULL oracle:
    // the x16 walk + exact size/count/rate integer arithmetic.
    "x144_cluster_size_histogram" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          blockCol = "lang", n = 3, threshold = 0.5)
        .select("a_id", "b_id")
      Dedup.clusterSizeHistogram(
          Dedup.connectedComponents(docs.select("doc_id"), "doc_id", pairs))
        .orderBy("cluster_size")
    },

    // PACK-FILL efficiency (x145): per-source next-fit realization over
    // x128's packs — pack/chunk counts, packed mass, and the fill as a
    // permille of shard capacity. Low fill = oversized chunks forcing
    // early pack breaks; the capacity-tuning dial next to the pack
    // manifests. FULL oracle: the x128 fill recurrence + shard-keyed
    // integer aggregation.
    "x145_pack_fill_report" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val chunks = Chunking.chunk(docs, "doc_id", "text",
          chunkTokens = 50, overlap = 10, keepCols = Seq("source"))
      Chunking.packFillReport(
          Chunking.packChunksStrict(chunks, "source", "n_chunk_tokens",
            capacity = 256, orderCols = Seq("doc_id", "chunk_idx")),
          "source", "n_chunk_tokens", capacity = 256)
        .orderBy("source")
    },

    // PACK-CAPACITY dial ladder (x160): the tuning-table discipline on
    // the EXPORT lane — x145's next-fit fold re-run at capacity ∈
    // {128, 256, 512} over ONE chunk frame (chunking runs once,
    // checkpointed; capacities don't nest, so each dial pays its own
    // fold — the cost the table prices), reporting corpus-wide packs,
    // mass, and fill per dial: the sequence-length tuning table. FULL
    // oracle: x145's chunk chain + one fill recurrence per dial.
    "x160_pack_capacity_ladder" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val chunks = graft.ops.Caches.localCheckpointTracked(
        Chunking.chunk(docs, "doc_id", "text", chunkTokens = 50,
          overlap = 10, keepCols = Seq("source")))
      Chunking.packCapacityLadder(chunks, "source", "n_chunk_tokens",
          capacities = Seq(128, 256, 512),
          orderCols = Seq("doc_id", "chunk_idx"))
        .orderBy("capacity")
    },

    // ANN RECALL audit (x146): recall@5 of the IVF×PQ batch serve (x75)
    // against the exact brute-force L2 top-5, per query — the
    // index-quality report a serving pipeline gates deploys on, run
    // IN-PLAN over the same corpus/query split as x75 (specs assert
    // recall thresholds; this makes the measurement itself a
    // hash-gated, engine-replayable artifact). Zero-hit queries report
    // 0, never vanish. FULL oracle: the whole x75 serve chain, the
    // exact chain, the intersection counts.
    "x146_ann_recall_report" -> { (s, dir) =>
      val all = Tables.embeddings(s, dir)
      val corpus = all.filter(col("vec_id") % 50 =!= 0)
      val qtab = all.filter(col("vec_id") % 50 === 0)
      val (cents, assigned) = Similarity.ivfBuild(corpus, "embedding", "vec_id")
      val cb = Similarity.pqBuildCodebook(corpus, "embedding", "vec_id")
      val served = Similarity.ivfPqServeAll(cents,
        Similarity.ivfPqEncode(assigned, "vec_id", cb), corpus,
        "embedding", "vec_id", qtab, "vec_id", cb, k = 5)
      val exact = Similarity.l2TopKAll(corpus, "embedding", "vec_id",
        qtab, "vec_id", k = 5)
      Similarity.recallAtK(served, exact, k = 5,
        queries = Some(qtab.select(col("vec_id").as("q_id")))).orderBy("q_id")
    },

    // TRAINED-INDEX RECALL audit (x147): x146's recall@5 report pointed
    // at the FULLY-TRAINED IVF×PQ family (x71's geometry — 2-round
    // fixed-point Lloyd coarse cells, 2-iteration per-subspace-k-means
    // 256-centroid PQ codebook, nProbe=6, refine=8) on the same
    // corpus/query split — the audit that prices what training buys
    // over x146's sampled build (VERDICT r14 missing #2: the families a
    // deployer chooses between had spec thresholds but no in-plan,
    // hash-gated recall artifact). FULL oracle: BOTH training chains
    // (x71's replay), the q_id-threaded probe/ADC/rerank, the exact
    // chain, the intersection counts.
    "x147_ann_recall_trained" -> { (s, dir) =>
      val all = Tables.embeddings(s, dir)
      val corpus = all.filter(col("vec_id") % 50 =!= 0)
      val qtab = all.filter(col("vec_id") % 50 === 0)
      val (cents, assigned) =
        Similarity.ivfBuildKmeans(corpus, "embedding", "vec_id")
      val cb = Similarity.pqTrainCodebook(corpus, "embedding", "vec_id",
        nCentroids = 256)
      val served = Similarity.ivfPqServeAll(cents,
        Similarity.ivfPqEncode(assigned, "vec_id", cb), corpus,
        "embedding", "vec_id", qtab, "vec_id", cb, k = 5,
        nProbe = 6, refine = 8)
      val exact = Similarity.l2TopKAll(corpus, "embedding", "vec_id",
        qtab, "vec_id", k = 5)
      Similarity.recallAtK(served, exact, k = 5,
        queries = Some(qtab.select(col("vec_id").as("q_id")))).orderBy("q_id")
    },

    // WINNOWING WRITTEN INDEX (x148): x141's fingerprint index
    // persisted as the fp-bucketed tree a 100 TB overlap service
    // actually reads — base docs written partitionBy(fp mod 16), the
    // held-out tenth folded in by bucket-local compaction (only touched
    // bucket dirs rewritten — OpsSpec pins the file-level locality),
    // the report served from the read-back tree. The index row is a
    // pure per-doc function of content, so compact-then-serve ≡
    // build-on-everything: the oracle is x141's SQL VERBATIM.
    "x148_winnowing_tree" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val tree = scratchTree("x148_winnow")
      // 16-bucket GATE dial (the x84 convention: results are
      // bucket-count-invariant, the oracle bucketless; 64 stays the
      // documented production default)
      Dedup.winnowingWriteIndex(
        Dedup.winnowingFingerprints(docs.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", k = 4, w = 8),
        "doc_id", tree, nBuckets = 16)
      Dedup.winnowingCompact(s, tree, docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", k = 4, w = 8, nBuckets = 16)
      Dedup.winnowingServeTree(s, tree, "doc_id", minShared = 3,
          maxFpDf = 50)
        .orderBy("a_id", "b_id")
    },

    // LSH-FED cross-source matrix (x149): the PRODUCTION path of x143
    // — at 100 TB the pair step is x34's MinHash-LSH bucketed
    // candidates → exact-Jaccard verify, not the exact all-gram
    // self-join x143's fixture rides; the matrix tail is the identical
    // code. With full-recall candidates (the x34 OpsSpec pin) the
    // verified pair set — hence every cell count — equals the exact
    // path's, so this runs the LSH plan end-to-end under x143's
    // oracle (the x136-gating precedent applied to the matrix).
    "x149_lsh_cross_source_dup" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val d = Dedup.lshProductionDials // the OpsSpec full-recall pin's dials
      val cands = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = d.n, nHashes = d.nHashes, bands = d.bands,
        threshold = d.lshThreshold)
      val verified = Dedup.verifyPairsJaccard(docs, "doc_id", "text", "lang",
        cands.select("a_id", "b_id"), d.n, d.jaccardThreshold)
      Dedup.crossSliceMatrixFromPairs(docs, verified, "doc_id", "source")
        .orderBy("src_a", "src_b")
    },

    // RECALL-vs-COST dial ladder (x155, VERDICT r15 #4): ONE built
    // IVF×PQ index (x146's sampled build on the same corpus/query
    // split) served at nProbe ∈ {1,2,4,8} with fixed k=5/refine=3,
    // reporting per dial the recall@5 mass and the exact candidate
    // volume the ADC scan touches — the tuning table a deployer reads
    // to price probe width before freezing it. Everything exact
    // integers. FULL oracle: the x146 serve chain × 4 dials (probe
    // ranks retained, codes computed once over the widest dial's
    // pruned set) with a shared exact tail, materialize-fenced.
    "x155_ann_recall_cost_ladder" -> { (s, dir) =>
      val all = Tables.embeddings(s, dir)
      val corpus = all.filter(col("vec_id") % 50 =!= 0)
      val qtab = all.filter(col("vec_id") % 50 === 0)
      val (cents, assigned) = Similarity.ivfBuild(corpus, "embedding", "vec_id")
      val cb = Similarity.pqBuildCodebook(corpus, "embedding", "vec_id")
      Similarity.ivfPqRecallCostLadder(cents,
        Similarity.ivfPqEncode(assigned, "vec_id", cb), corpus,
        "embedding", "vec_id", qtab, "vec_id", cb, k = 5,
        nProbes = Seq(1, 2, 4, 8)).orderBy("n_probe")
    },

    // DEDUP-RATE dial ladder (x158): the x155 ladder discipline on the
    // dedup lane — the exact trigram-Jaccard pair step runs ONCE at
    // the loosest τ (threshold sets nest), each dial τ ∈ {.5,.6,.7,.8}
    // is a filter slice pushed through connected components and
    // retention, reporting (tau_permille, n_pairs, n_dup_clusters,
    // n_removable) — the table a deployer reads before freezing τ.
    // Dial compares are IEEE quotients of exact integer counts —
    // bit-identical across engines, no dead-band needed. FULL oracle:
    // x16's chain with the pair cut swept per dial (4 recursive walks).
    "x158_dedup_rate_ladder" -> { (s, dir) =>
      Dedup.dedupRateLadder(Tables.documents(s, dir), "doc_id", "text",
          "lang", n = 3, taus = Seq(0.5, 0.6, 0.7, 0.8))
        .orderBy("tau_permille")
    },

    // BANDED-ANN dial ladder (x162, VERDICT r16 #2): the x155 ladder
    // discipline on the x45/x153 banded family's (nBands, bandBits)
    // dial — the geometry knob that moves recall sharpest (the x68
    // 25%→90% observation). Four nested same-bits dials share ONE
    // collision join at nBands=16 with the per-pair MIN band index
    // retained (dial n = the first_band < n slice); the 4- and 6-bit
    // dials each pay their own join (band words regroup across bits —
    // stated honestly, the x160 precedent). Reports recall@5 mass vs
    // the exact rounded-cosine truth and the candidate-pair volume per
    // dial — all exact integers. FULL oracle: the x153 banding chain
    // per distinct bandBits + per-dial slice/rescore/recall tails over
    // a shared exact ground truth.
    "x162_ann_banded_ladder" -> { (s, dir) =>
      val all = Tables.embeddings(s, dir)
      Similarity.annBandedRecallCostLadder(
          all.filter(col("vec_id") % 50 =!= 0),
          all.filter(col("vec_id") % 50 === 0),
          vecCol = "embedding", idCol = "vec_id", qIdCol = "vec_id",
          k = 5, dials = bandLadderDials)
        .orderBy("band_bits", "n_bands")
    },

    // PROJECTED-index dial ladder (x163): the x155 discipline on the
    // x89/x151 reduce-then-index family's probe width — projection,
    // IVF build, and the (probed cell, member) original-space rescore
    // all run ONCE at nProbe=8 with the probe rank retained; dial
    // p ∈ {1,2,4,8} is the prk ≤ p slice. Recall@5 vs the exact
    // rounded-cosine truth + candidate volume per dial. With x155
    // (IVF×PQ), x162 (banded) and x164 (residual), every served ANN
    // family now carries its tuning table. FULL oracle: the x151
    // projected chain with the ranked probe + per-dial slice/rescore
    // tails over a shared exact ground truth.
    "x163_ann_projected_ladder" -> { (s, dir) =>
      val all = Tables.embeddings(s, dir)
      Similarity.projectedIvfRecallCostLadder(
          all.filter(col("vec_id") % 50 =!= 0),
          "embedding", "vec_id",
          all.filter(col("vec_id") % 50 === 0), "vec_id",
          k = 5, nProbes = Seq(1, 2, 4, 8))
        .orderBy("n_probe")
    },

    // RESIDUAL-IVFADC dial ladder (x164): the x155 discipline on the
    // x59/x154 residual family at its SAMPLED rung (the ladder prices
    // the SERVING dial; x154 already audits what training buys) —
    // coarse build, residual encode, per-(query, cell) ADC tables and
    // the expensive scan all at nProbe=8 with rank retained; dial p is
    // the rk ≤ p slice through the refine·k cut and exact-L2 rerank.
    // FULL oracle: the sampled-residual chain threaded by probe rank ×
    // 4 dials with a shared exact L2 tail.
    "x164_ann_residual_ladder" -> { (s, dir) =>
      val all = Tables.embeddings(s, dir)
      Similarity.ivfPqResidualRecallCostLadder(
          all.filter(col("vec_id") % 50 =!= 0),
          "embedding", "vec_id",
          all.filter(col("vec_id") % 50 === 0), "vec_id",
          k = 5, nProbes = Seq(1, 2, 4, 8))
        .orderBy("n_probe")
    },

    // PROJECTED-index recall audit (x151): the x146 discipline applied
    // to the reduce-then-index family — x89's projected IVF served for
    // the whole query table (corpus projected once, per-query probe of
    // the 4 nearest projected cells, original-space rounded-cosine
    // rerank), measured against the exact brute-force COSINE top-5
    // (the metric this family ranks by — L2 truth would conflate metric
    // mismatch with index quality). Zero-hit queries report 0. FULL
    // oracle: the x89 chain threaded by q_id, the exact cosine chain,
    // the intersection counts.
    "x151_ann_recall_projected" -> { (s, dir) =>
      val all = Tables.embeddings(s, dir)
      val corpus = all.filter(col("vec_id") % 50 =!= 0)
      val qtab = all.filter(col("vec_id") % 50 === 0)
      val served = Similarity.projectedIvfServeAll(corpus, "embedding",
        "vec_id", qtab, "vec_id", k = 5, outDims = 16, nLists = 16,
        nProbe = 4)
      val exact = Similarity.cosineTopKAll(corpus, "embedding", "vec_id",
        qtab, "vec_id", k = 5)
      Similarity.recallAtK(served, exact, k = 5,
        queries = Some(qtab.select(col("vec_id").as("q_id")))).orderBy("q_id")
    },

    // WINNOWING index SEEK (x152): the probe side of x148 — a query
    // batch (the held-out tenth) fingerprints itself, pushes its
    // distinct fp-buckets as a literal partition IN-filter, and reads
    // ONLY those bucket dirs of the written index (ScaleSpec pins the
    // pruning); overlap = query fps × pruned index rows under the
    // index-side df stop cut — well-defined because a fingerprint's
    // index rows all live in its own bucket. The clone-detection query
    // a 100 TB overlap service answers without touching the corpus.
    // FULL oracle: the x141 fingerprint chain split asymmetrically
    // (query side vs index side), index-df cut, cross-side pair counts.
    "x152_winnowing_seek" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val tree = scratchTree("x152_winnow")
      Dedup.winnowingWriteIndex(
        Dedup.winnowingFingerprints(docs.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", k = 4, w = 8),
        "doc_id", tree, nBuckets = 16)
      Dedup.winnowingProbeTree(s, tree,
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
          k = 4, w = 8, minShared = 3, maxFpDf = 50, nBuckets = 16)
        .orderBy("a_id", "b_id")
    },

    // BANDED-index recall audit (x153): the x146 discipline applied to
    // the RHP-LSH banded family — x45's batch band_key serve measured
    // against the exact brute-force cosine top-5 per query. The banded
    // path can return NOTHING for a query (no band collision at all) —
    // exactly the failure recall audits exist to surface — so the
    // explicit query universe keeps those queries as recall-0 rows.
    // With x147 (trained), x151 (projected) and s35 (streaming-
    // maintained), every served ANN family now has an in-plan,
    // hash-gated quality artifact. FULL oracle: the x45 banding chain
    // to srv + the exact cosine chain + intersections.
    "x153_ann_recall_banded" -> { (s, dir) =>
      val all = Tables.embeddings(s, dir)
      val corpus = all.filter(col("vec_id") % 50 =!= 0)
      val qtab = all.filter(col("vec_id") % 50 === 0)
      val served = Similarity.annProbeBandedAll(corpus, qtab,
        vecCol = "embedding", idCol = "vec_id", qIdCol = "vec_id", k = 5)
      val exact = Similarity.cosineTopKAll(corpus, "embedding", "vec_id",
        qtab, "vec_id", k = 5)
      Similarity.recallAtK(
        served.select(col("q_id"), col("vec_id")), exact, k = 5,
        queries = Some(qtab.select(col("vec_id").as("q_id")))).orderBy("q_id")
    },

    // RESIDUAL-index recall audit (x154): the last served family under
    // the x146 discipline — x80's trained-residual IVFADC (codebook
    // trained on the within-cell displacements) batch-served at the
    // x147 dials and measured against the exact L2 top-5 (this family
    // reranks by L2). Completes the audit matrix: sampled x146,
    // trained x147, projected x151, banded x153, residual x154,
    // streaming-maintained s35. FULL oracle: x80's residual training
    // chain threaded by q_id + the shared exact/intersection tail.
    "x154_ann_recall_residual" -> { (s, dir) =>
      val all = Tables.embeddings(s, dir)
      val corpus = all.filter(col("vec_id") % 50 =!= 0)
      val qtab = all.filter(col("vec_id") % 50 === 0)
      val served = Similarity.ivfPqResidualServeAll(corpus, "embedding",
        "vec_id", qtab, "vec_id", k = 5, nProbe = 6, refine = 8,
        trainIters = 2)
      val exact = Similarity.l2TopKAll(corpus, "embedding", "vec_id",
        qtab, "vec_id", k = 5)
      Similarity.recallAtK(served, exact, k = 5,
        queries = Some(qtab.select(col("vec_id").as("q_id")))).orderBy("q_id")
    },
  )

  /** x72's full replay, parameterized by the Lloyd-TRAINING source
    * ($m): x72 trains on the whole corpus (e); x90 trains on the
    * static split (es) — the frozen maintained model — while cells,
    * bands, candidates and ranks still run over the whole union. */
  /** x68's banded-graph replay up to a `graph` CTE — (src_id, nbr_id,
    * cos_sim, rank ≤ 5) over the 16×4 RHP bands — shared by the
    * graph-analytics consumers (x92 mutual pairs, x93 PageRank, x94
    * label propagation): the graph is the stored artifact; each
    * consumer appends its own relational tail (starting `SELECT …` or
    * `, cte AS …`). `e` (vec_id, v) stays visible to tails. */
  /** x75's full serve replay up to `srv` (per-query L2-reranked
    * top-5 of the IVF×PQ batch serve) — shared by x75 (which appends
    * the rounded-distance projection) and x146 (which appends the
    * exact-L2 ground truth and the recall intersection). */
  private val ivfPqServeChainSql: String =
    """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 50 <> 0),
        |qs AS (
        |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |samp AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k,
        |    vec_id AS cid, v AS cv
        |  FROM e
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
        |asg AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT e.vec_id, samp.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * samp.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(samp.cv)), i -> samp.cv[i] * samp.cv[i])))) DESC,
        |        samp.cid ASC) AS rk
        |    FROM e, samp) WHERE rk = 1),
        |qprobe AS (
        |  SELECT q_id, cid FROM (
        |    SELECT qs.q_id, samp.cid,
        |      row_number() OVER (PARTITION BY qs.q_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(qs.qv)), i -> qs.qv[i] * samp.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(qs.qv)), i -> qs.qv[i] * qs.qv[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(samp.cv)), i -> samp.cv[i] * samp.cv[i])))) DESC,
        |        samp.cid ASC) AS rk
        |    FROM qs, samp) WHERE rk <= 4),
        |pruned AS (SELECT DISTINCT vec_id FROM asg JOIN qprobe USING (cid)),
        |jj AS (SELECT unnest(generate_series(0, 7)) AS j),
        |dist AS (
        |  SELECT e.vec_id, jj.j, samp.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (e.v[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]) *
        |      (e.v[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]))) AS dist
        |  FROM e JOIN pruned USING (vec_id), jj, samp),
        |codes AS (
        |  SELECT vec_id, j, k FROM dist
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, k) = 1),
        |qtab AS (
        |  SELECT qs.q_id, jj.j, samp.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (qs.qv[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]) *
        |      (qs.qv[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]))) AS dist
        |  FROM qs, jj, samp),
        |approx AS (
        |  SELECT qp.q_id, c.vec_id, list_sum(list(qt.dist ORDER BY c.j)) AS pq
        |  FROM qprobe qp
        |  JOIN asg ON asg.cid = qp.cid
        |  JOIN codes c ON c.vec_id = asg.vec_id
        |  JOIN qtab qt ON qt.q_id = qp.q_id AND qt.j = c.j AND qt.k = c.k
        |  GROUP BY qp.q_id, c.vec_id),
        |cand AS (
        |  SELECT q_id, vec_id, pq FROM approx
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY pq, vec_id) <= 15),
        |scored AS (
        |  SELECT cand.q_id, cand.vec_id, cand.pq,
        |    list_sum(list_transform(generate_series(1, len(e.v)), t ->
        |      (e.v[t] - qs.qv[t]) * (e.v[t] - qs.qv[t]))) AS l2
        |  FROM cand JOIN e USING (vec_id) JOIN qs USING (q_id)),
        |srv AS (
        |  SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY l2 ASC, vec_id ASC) AS INT) AS rank,
        |    vec_id, pq, l2
        |  FROM scored
        |  QUALIFY rank <= 5)""".stripMargin

  /** The recall@5 tail appended to a serve chain ending at `srv` with
    * `e`/`qs` in scope — the exact brute-force per-query L2 top-5, the
    * (q_id, vec_id) intersection counts, zero-hit queries kept by the
    * left join from the query table. Shared by x146 (sampled build) and
    * x147 (trained build) so the audits differ ONLY in the index under
    * measurement. */
  /** The hits + report half of every recall tail — identical for all
    * metrics, so the L2 and cosine audits are provably the same
    * arithmetic and a change lands in both at once. */
  private val recallHitsTailSql: String =
    """,
      |hits AS (
      |  SELECT s.q_id, COUNT(*) AS n_hits
      |  FROM srv s JOIN exact x ON x.q_id = s.q_id AND x.vec_id = s.vec_id
      |  GROUP BY 1)
      |SELECT qs.q_id AS q_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
      |  (CAST(COALESCE(h.n_hits, 0) AS BIGINT) * 1000) // 5 AS recall_permille
      |FROM qs LEFT JOIN hits h ON h.q_id = qs.q_id
      |ORDER BY qs.q_id""".stripMargin

  private val recallTailSql: String =
    """,
      |exact AS (
      |  SELECT q_id, vec_id FROM (
      |    SELECT qs.q_id, e.vec_id,
      |      row_number() OVER (PARTITION BY qs.q_id ORDER BY
      |        list_sum(list_transform(generate_series(1, len(e.v)), t ->
      |          (e.v[t] - qs.qv[t]) * (e.v[t] - qs.qv[t]))) ASC,
      |        e.vec_id ASC) AS rk
      |    FROM e, qs) WHERE rk <= 5)""".stripMargin + recallHitsTailSql

  /** x155's oracle: the [[ivfPqServeChainSql]] sampled build swept
    * over the probe dials — `qp` retains probe ranks to the WIDEST
    * dial (rk ≤ 8; probe sets nest, so dial p's cells are
    * `qp WHERE rk ≤ p`), `pruned`/`codes` computed ONCE over the
    * widest dial's cells, then per dial the ADC/cut/rerank stages, the
    * recall mass over the shared exact tail, and the candidate count
    * (the (query-cell, member) join's cardinality — exactly what the
    * ADC scan touches). Everything integer-exact in the report.
    * Wrapped in [[materializeCtes]] at the map entry (e/asg/exact are
    * referenced once per dial — unfenced, DuckDB would inline them
    * exponentially). */
  private val x155LadderSql: String = {
    val dials = Seq(1, 2, 4, 8)
    val perDial = dials.map { p =>
      s"""|qprobe$p AS (SELECT q_id, cid FROM qp WHERE rk <= $p),
          |approx$p AS (
          |  SELECT qpp.q_id, c.vec_id, list_sum(list(qt.dist ORDER BY c.j)) AS pq
          |  FROM qprobe$p qpp
          |  JOIN asg ON asg.cid = qpp.cid
          |  JOIN codes c ON c.vec_id = asg.vec_id
          |  JOIN qtab qt ON qt.q_id = qpp.q_id AND qt.j = c.j AND qt.k = c.k
          |  GROUP BY qpp.q_id, c.vec_id),
          |cand$p AS (
          |  SELECT q_id, vec_id, pq FROM approx$p
          |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY pq, vec_id) <= 15),
          |scored$p AS (
          |  SELECT cand$p.q_id, cand$p.vec_id,
          |    list_sum(list_transform(generate_series(1, len(e.v)), t ->
          |      (e.v[t] - qs.qv[t]) * (e.v[t] - qs.qv[t]))) AS l2
          |  FROM cand$p JOIN e USING (vec_id) JOIN qs USING (q_id)),
          |srv$p AS (
          |  SELECT q_id, vec_id FROM scored$p
          |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY l2 ASC, vec_id ASC) <= 5),
          |hits$p AS (
          |  SELECT s.q_id, COUNT(*) AS n_hits
          |  FROM srv$p s JOIN exact x ON x.q_id = s.q_id AND x.vec_id = s.vec_id
          |  GROUP BY 1),
          |rep$p AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
          |    CAST(SUM((CAST(COALESCE(h.n_hits, 0) AS BIGINT) * 1000) // 5) AS BIGINT) AS sum_rp
          |  FROM qs LEFT JOIN hits$p h ON h.q_id = qs.q_id),
          |nc$p AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates
          |  FROM qprobe$p JOIN asg USING (cid)),""".stripMargin
    }.mkString("\n")
    val selects = dials.map { p =>
      s"""|SELECT CAST($p AS INT) AS n_probe, n_queries,
          |  sum_rp AS sum_recall_permille,
          |  sum_rp // n_queries AS mean_recall_permille, n_candidates
          |FROM rep$p, nc$p""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""|WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 50 <> 0),
        |qs AS (
        |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |samp AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k,
        |    vec_id AS cid, v AS cv
        |  FROM e
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
        |asg AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT e.vec_id, samp.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * samp.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(samp.cv)), i -> samp.cv[i] * samp.cv[i])))) DESC,
        |        samp.cid ASC) AS rk
        |    FROM e, samp) WHERE rk = 1),
        |qp AS (
        |  SELECT q_id, cid, rk FROM (
        |    SELECT qs.q_id, samp.cid,
        |      row_number() OVER (PARTITION BY qs.q_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(qs.qv)), i -> qs.qv[i] * samp.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(qs.qv)), i -> qs.qv[i] * qs.qv[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(samp.cv)), i -> samp.cv[i] * samp.cv[i])))) DESC,
        |        samp.cid ASC) AS rk
        |    FROM qs, samp) WHERE rk <= 8),
        |pruned AS (SELECT DISTINCT vec_id FROM asg JOIN qp USING (cid)),
        |jj AS (SELECT unnest(generate_series(0, 7)) AS j),
        |dist AS (
        |  SELECT e.vec_id, jj.j, samp.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (e.v[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]) *
        |      (e.v[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]))) AS dist
        |  FROM e JOIN pruned USING (vec_id), jj, samp),
        |codes AS (
        |  SELECT vec_id, j, k FROM dist
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, k) = 1),
        |qtab AS (
        |  SELECT qs.q_id, jj.j, samp.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (qs.qv[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]) *
        |      (qs.qv[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]))) AS dist
        |  FROM qs, jj, samp),
        |exact AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT qs.q_id, e.vec_id,
        |      row_number() OVER (PARTITION BY qs.q_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), t ->
        |          (e.v[t] - qs.qv[t]) * (e.v[t] - qs.qv[t]))) ASC,
        |        e.vec_id ASC) AS rk
        |    FROM e, qs) WHERE rk <= 5),
        |$perDial
        |fin AS (
        |$selects
        |)
        |SELECT * FROM fin ORDER BY n_probe""".stripMargin
  }

  /** x162's frozen (nBands, bandBits) dials — one constant shared by
    * the gated query and the oracle generator below so the two can
    * never drift (the x149 lesson). Four nested same-bits dials price
    * band COUNT off one shared collision join; the 4- and 6-bit dials
    * price band WIDTH, each paying its own join (band words regroup —
    * they don't nest across bits). */
  private[graft] val bandLadderDials: Seq[(Int, Int)] =
    Seq((2, 8), (4, 8), (8, 8), (16, 8), (16, 4), (16, 6))

  /** x162's oracle: the x153 banded chain generalized over the dial
    * table — ONE plane/band/collision chain per DISTINCT bandBits (at
    * the group's widest nBands, per-pair MIN band index retained), each
    * same-bits dial a `first_band < n` slice, then the x155-shaped
    * per-dial rescore/recall/candidate tails against a shared exact
    * rounded-cosine ground truth. Plane values are the global-bit-index
    * md5 affine of the build expression, so each bandBits level's words
    * regroup the same planes exactly as the Spark side's. */
  private val x162BandLadderSql: String = {
    val byBits = bandLadderDials.groupBy(_._2).toSeq.sortBy(_._1)
    val groups = byBits.map { case (bb, group) =>
      val maxBands = group.map(_._1).max
      val nBits = maxBands * bb
      s"""|h$bb AS (
          |  SELECT b, list_transform(generate_series(0, 63),
          |    d -> (CAST('0x' || substr(md5('rhp:' || CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS UBIGINT) % 2000001) / 1000000.0 - 1.0) AS hv
          |  FROM generate_series(0, ${nBits - 1}) t(b)),
          |bitsC$bb AS (
          |  SELECT e.vec_id, CAST(h$bb.b // $bb AS INT) AS j,
          |    CASE WHEN list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * hv[i])) > 0
          |      THEN CAST(1 << (${bb - 1} - (h$bb.b % $bb)) AS BIGINT) ELSE 0 END AS bit
          |  FROM e, h$bb),
          |bandsC$bb AS (SELECT vec_id, j, SUM(bit) AS bv FROM bitsC$bb GROUP BY vec_id, j),
          |bitsQ$bb AS (
          |  SELECT qs.q_id, CAST(h$bb.b // $bb AS INT) AS j,
          |    CASE WHEN list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * hv[i])) > 0
          |      THEN CAST(1 << (${bb - 1} - (h$bb.b % $bb)) AS BIGINT) ELSE 0 END AS bit
          |  FROM qs, h$bb),
          |bandsQ$bb AS (SELECT q_id, j, SUM(bit) AS bv FROM bitsQ$bb GROUP BY q_id, j),
          |fb$bb AS (
          |  SELECT q.q_id, c.vec_id, MIN(q.j) AS first_band
          |  FROM bandsQ$bb q JOIN bandsC$bb c USING (j, bv) GROUP BY 1, 2),""".stripMargin
    }.mkString("\n")
    val perDial = bandLadderDials.map { case (n, bb) =>
      val t = s"${n}x$bb"
      s"""|cand$t AS (SELECT q_id, vec_id FROM fb$bb WHERE first_band < $n),
          |srv$t AS (
          |  SELECT q_id, vec_id FROM (
          |    SELECT cand$t.q_id, cand$t.vec_id,
          |      row_number() OVER (PARTITION BY cand$t.q_id ORDER BY
          |        round(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * q.qv[i])) /
          |          (sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i]))) *
          |           sqrt(list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i] * q.qv[i])))), 6) DESC,
          |        cand$t.vec_id ASC) AS rk
          |    FROM cand$t
          |    JOIN e c ON c.vec_id = cand$t.vec_id
          |    JOIN qs q ON q.q_id = cand$t.q_id) WHERE rk <= 5),
          |hits$t AS (
          |  SELECT s.q_id, COUNT(DISTINCT s.vec_id) AS n_hits
          |  FROM srv$t s JOIN exactc x ON x.q_id = s.q_id AND x.vec_id = s.vec_id
          |  GROUP BY 1),
          |rep$t AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
          |    CAST(SUM((CAST(COALESCE(h.n_hits, 0) AS BIGINT) * 1000) // 5) AS BIGINT) AS sum_rp
          |  FROM qs LEFT JOIN hits$t h ON h.q_id = qs.q_id),
          |nc$t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand$t),""".stripMargin
    }.mkString("\n")
    val selects = bandLadderDials.map { case (n, bb) =>
      val t = s"${n}x$bb"
      s"""|SELECT CAST($n AS INT) AS n_bands, CAST($bb AS INT) AS band_bits,
          |  n_queries, sum_rp AS sum_recall_permille,
          |  sum_rp // n_queries AS mean_recall_permille, n_candidates
          |FROM rep$t, nc$t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""|WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings WHERE vec_id % 50 <> 0),
        |qs AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id % 50 = 0),
        |exactc AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT qs.q_id, e.vec_id,
        |      row_number() OVER (PARTITION BY qs.q_id ORDER BY
        |        round(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * qs.qv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(qs.qv)), i -> qs.qv[i] * qs.qv[i])))), 6) DESC,
        |        e.vec_id ASC) AS rk
        |    FROM e, qs) WHERE rk <= 5),
        |$groups
        |$perDial
        |fin AS (
        |$selects
        |)
        |SELECT * FROM fin ORDER BY band_bits, n_bands""".stripMargin
  }

  /** x163's oracle: the x151 projected chain (16 planes, projected
    * corpus/query coordinates, md5 sample, argmax assignment) with the
    * probe ranked to the widest dial, each dial a `rk ≤ p` slice of
    * the (probed cell, member) pairs pushed through the original-space
    * rounded-cosine rescore, against a shared exact cosine ground
    * truth — the x155 ladder shape on the projected family. */
  private val x163ProjLadderSql: String = {
    val dials = Seq(1, 2, 4, 8)
    def cos(n: Int, a: String, b: String): String =
      s"list_sum(list_transform(generate_series(1, $n), i -> $a[i] * $b[i])) / " +
        s"(sqrt(list_sum(list_transform(generate_series(1, $n), i -> $a[i] * $a[i]))) * " +
        s"sqrt(list_sum(list_transform(generate_series(1, $n), i -> $b[i] * $b[i]))))"
    val perDial = dials.map { p =>
      s"""|cand$p AS (
          |  SELECT q.q_id, a.vec_id FROM qpr q JOIN asg a USING (cid)
          |  WHERE q.rk <= $p),
          |srv$p AS (
          |  SELECT q_id, vec_id FROM (
          |    SELECT cand$p.q_id, cand$p.vec_id,
          |      row_number() OVER (PARTITION BY cand$p.q_id ORDER BY
          |        round(${cos(64, "e.v", "qs.qv")}, 6) DESC,
          |        cand$p.vec_id ASC) AS rk
          |    FROM cand$p JOIN e ON e.vec_id = cand$p.vec_id
          |      JOIN qs ON qs.q_id = cand$p.q_id) WHERE rk <= 5),
          |hits$p AS (
          |  SELECT s.q_id, COUNT(DISTINCT s.vec_id) AS n_hits
          |  FROM srv$p s JOIN exactc x ON x.q_id = s.q_id AND x.vec_id = s.vec_id
          |  GROUP BY 1),
          |rep$p AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
          |    CAST(SUM((CAST(COALESCE(h.n_hits, 0) AS BIGINT) * 1000) // 5) AS BIGINT) AS sum_rp
          |  FROM qs LEFT JOIN hits$p h ON h.q_id = qs.q_id),
          |nc$p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand$p),""".stripMargin
    }.mkString("\n")
    val selects = dials.map { p =>
      s"""|SELECT CAST($p AS INT) AS n_probe, n_queries,
          |  sum_rp AS sum_recall_permille,
          |  sum_rp // n_queries AS mean_recall_permille, n_candidates
          |FROM rep$p, nc$p""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""|WITH h AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |    d -> (CAST('0x' || substr(md5('rhp:' || CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS UBIGINT) % 2000001) / 1000000.0 - 1.0) AS hv
        |  FROM generate_series(0, 15) t(b)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings WHERE vec_id % 50 <> 0),
        |qs AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id % 50 = 0),
        |ep AS (
        |  SELECT e.vec_id,
        |    list(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * h.hv[i])) ORDER BY h.b) AS p
        |  FROM e, h GROUP BY e.vec_id),
        |qp AS (
        |  SELECT qs.q_id,
        |    list(list_sum(list_transform(generate_series(1, 64), i -> qs.qv[i] * h.hv[i])) ORDER BY h.b) AS p
        |  FROM qs, h GROUP BY qs.q_id),
        |c0 AS (SELECT vec_id AS cid, p AS cv FROM ep
        |       ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
        |asg AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT ep.vec_id, c0.cid,
        |      row_number() OVER (PARTITION BY ep.vec_id ORDER BY
        |        ${cos(16, "ep.p", "c0.cv")} DESC,
        |        c0.cid ASC) AS rk
        |    FROM ep, c0) WHERE rk = 1),
        |qpr AS (
        |  SELECT q_id, cid, rk FROM (
        |    SELECT qp.q_id, c0.cid,
        |      row_number() OVER (PARTITION BY qp.q_id ORDER BY
        |        ${cos(16, "c0.cv", "qp.p")} DESC,
        |        c0.cid ASC) AS rk
        |    FROM qp, c0) WHERE rk <= 8),
        |exactc AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT qs.q_id, e.vec_id,
        |      row_number() OVER (PARTITION BY qs.q_id ORDER BY
        |        round(${cos(64, "e.v", "qs.qv")}, 6) DESC,
        |        e.vec_id ASC) AS rk
        |    FROM e, qs) WHERE rk <= 5),
        |$perDial
        |fin AS (
        |$selects
        |)
        |SELECT * FROM fin ORDER BY n_probe""".stripMargin
  }

  /** x164's oracle: the x154 residual-family chain at its SAMPLED rung
    * (md5 coarse sample + argmax assignment, residual frame, sampled
    * residual codebook, codes over the widest dial's pruned members,
    * per-(query, probed cell) ADC tables from ((q − c) − codeword)
    * with the probe rank retained) — each dial the `rk ≤ p` slice
    * through the refine·k cut and exact-L2 rerank, against a shared
    * exact L2 ground truth. */
  private val x164ResidLadderSql: String = {
    val dials = Seq(1, 2, 4, 8)
    def cosFull(a: String, b: String): String =
      s"list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])) / " +
        s"(sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $a[i]))) * " +
        s"sqrt(list_sum(list_transform(generate_series(1, len($b)), i -> $b[i] * $b[i]))))"
    val perDial = dials.map { p =>
      s"""|qprobe$p AS (SELECT q_id, cid FROM qpr WHERE rk <= $p),
          |approx$p AS (
          |  SELECT qpp.q_id, c.vec_id, list_sum(list(qt.dist ORDER BY c.j)) AS pq
          |  FROM qprobe$p qpp
          |  JOIN asg ON asg.cid = qpp.cid
          |  JOIN codes c ON c.vec_id = asg.vec_id
          |  JOIN qtab qt ON qt.q_id = qpp.q_id AND qt.cid = qpp.cid AND qt.j = c.j AND qt.k = c.k
          |  GROUP BY qpp.q_id, c.vec_id),
          |cand$p AS (
          |  SELECT q_id, vec_id, pq FROM approx$p
          |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY pq, vec_id) <= 15),
          |scored$p AS (
          |  SELECT cand$p.q_id, cand$p.vec_id,
          |    list_sum(list_transform(generate_series(1, len(e.v)), t ->
          |      (e.v[t] - qs.qv[t]) * (e.v[t] - qs.qv[t]))) AS l2
          |  FROM cand$p JOIN e USING (vec_id) JOIN qs USING (q_id)),
          |srv$p AS (
          |  SELECT q_id, vec_id FROM scored$p
          |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY l2 ASC, vec_id ASC) <= 5),
          |hits$p AS (
          |  SELECT s.q_id, COUNT(*) AS n_hits
          |  FROM srv$p s JOIN exact x ON x.q_id = s.q_id AND x.vec_id = s.vec_id
          |  GROUP BY 1),
          |rep$p AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
          |    CAST(SUM((CAST(COALESCE(h.n_hits, 0) AS BIGINT) * 1000) // 5) AS BIGINT) AS sum_rp
          |  FROM qs LEFT JOIN hits$p h ON h.q_id = qs.q_id),
          |nc$p AS (
          |  SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates
          |  FROM qprobe$p JOIN asg USING (cid)),""".stripMargin
    }.mkString("\n")
    val selects = dials.map { p =>
      s"""|SELECT CAST($p AS INT) AS n_probe, n_queries,
          |  sum_rp AS sum_recall_permille,
          |  sum_rp // n_queries AS mean_recall_permille, n_candidates
          |FROM rep$p, nc$p""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""|WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 50 <> 0),
        |qs AS (
        |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |samp AS (
        |  SELECT vec_id AS cid, v AS cv
        |  FROM e
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
        |asg AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT e.vec_id, samp.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        ${cosFull("e.v", "samp.cv")} DESC,
        |        samp.cid ASC) AS rk
        |    FROM e, samp) WHERE rk = 1),
        |qpr AS (
        |  SELECT q_id, cid, cv, rk FROM (
        |    SELECT qs.q_id, samp.cid, samp.cv,
        |      row_number() OVER (PARTITION BY qs.q_id ORDER BY
        |        ${cosFull("samp.cv", "qs.qv")} DESC,
        |        samp.cid ASC) AS rk
        |    FROM samp, qs) WHERE rk <= 8),
        |rv AS (
        |  SELECT a.vec_id, a.cid,
        |    list_transform(generate_series(1, len(e.v)), i -> e.v[i] - samp.cv[i]) AS r
        |  FROM asg a JOIN e USING (vec_id) JOIN samp ON samp.cid = a.cid),
        |pruned AS (SELECT DISTINCT vec_id FROM asg JOIN qpr USING (cid)),
        |jj AS (SELECT unnest(generate_series(0, 7)) AS j),
        |rcb0 AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k,
        |    r AS cv
        |  FROM rv
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
        |dist AS (
        |  SELECT rv.vec_id, jj.j, rcb0.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (rv.r[jj.j * 8 + t] - rcb0.cv[jj.j * 8 + t]) *
        |      (rv.r[jj.j * 8 + t] - rcb0.cv[jj.j * 8 + t]))) AS dist
        |  FROM rv JOIN pruned USING (vec_id), jj, rcb0),
        |codes AS (
        |  SELECT vec_id, j, k FROM dist
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, k) = 1),
        |qtab AS (
        |  SELECT qpr.q_id, qpr.cid, jj.j, rcb0.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      ((qs.qv[jj.j * 8 + t] - qpr.cv[jj.j * 8 + t]) - rcb0.cv[jj.j * 8 + t]) *
        |      ((qs.qv[jj.j * 8 + t] - qpr.cv[jj.j * 8 + t]) - rcb0.cv[jj.j * 8 + t]))) AS dist
        |  FROM qpr JOIN qs USING (q_id), jj, rcb0),
        |exact AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT qs.q_id, e.vec_id,
        |      row_number() OVER (PARTITION BY qs.q_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), t ->
        |          (e.v[t] - qs.qv[t]) * (e.v[t] - qs.qv[t]))) ASC,
        |        e.vec_id ASC) AS rk
        |    FROM e, qs) WHERE rk <= 5),
        |$perDial
        |fin AS (
        |$selects
        |)
        |SELECT * FROM fin ORDER BY n_probe""".stripMargin
  }

  /** The frozen curriculum cut dials shared by x156 and its streaming
    * twin s37 (whose oracle is x156's SQL verbatim — the dials must be
    * mechanically unable to drift, the x149 lesson). Each ends in 5e-7
    * so no attainable 6-decimal-rounded nll can sit on a boundary (the
    * dsirSelectThreshold dead-band rule); the x156 oracle spells the
    * same literals. */
  private[graft] val curriculumCutDials: Seq[Double] =
    Seq(3.3500005, 3.3800005, 3.4000005, 3.4500005)

  /** x159's frozen margin-cut dials (fix-lane longs: 0.1/0.3/0.6/1.0
    * nats) — one constant shared by the gated query, its oracle
    * generator below, and the OpsSpec dead-band pin. */
  private[graft] val marginCutDials: Seq[Long] =
    Seq(100000000000L, 300000000000L, 600000000000L, 1000000000000L)

  /** x158's oracle: x16's trigram-Jaccard + recursive-walk chain with
    * the pair cut swept per dial — tok/tri/nt/cand shared (computed at
    * the loosest cut with exact counts), then per dial the threshold
    * slice, the undirected edge set, the reachability walk, min-reach
    * components, cluster sizes, and the retention report. Dial
    * compares are quotients of exact integers — deterministic in both
    * engines. NOT materialize-fenced: recursive CTEs cannot be
    * MATERIALIZED, and the reference fan-out is flat (4 × cand), not
    * chained doubling. */
  private val x158DedupLadderSql: String = {
    val dials = Seq(500, 600, 700, 800)
    val perDial = dials.map { tp =>
      val tau = tp / 1000.0
      s"""|p$tp AS (
          |  SELECT a_id, b_id FROM cand
          |  JOIN nt na ON a_id = na.doc_id JOIN nt nb ON b_id = nb.doc_id
          |  WHERE common * 1.0 / (na.n + nb.n - common) >= $tau),
          |e$tp AS (SELECT a_id AS u, b_id AS v FROM p$tp UNION SELECT b_id, a_id FROM p$tp),
          |walk$tp(id, reach) AS (
          |  SELECT doc_id, doc_id FROM documents
          |  UNION
          |  SELECT w.id, e.v FROM walk$tp w JOIN e$tp e ON w.reach = e.u),
          |cs$tp AS (
          |  SELECT cluster_id, COUNT(*) AS sz FROM (
          |    SELECT id, MIN(reach) AS cluster_id FROM walk$tp GROUP BY id)
          |  GROUP BY 1),
          |rep$tp AS (
          |  SELECT CAST($tp AS INT) AS tau_permille,
          |    (SELECT CAST(COUNT(*) AS BIGINT) FROM p$tp) AS n_pairs,
          |    CAST(SUM(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_clusters,
          |    (SELECT COUNT(*) FROM documents) - CAST(COUNT(*) AS BIGINT) AS n_removable
          |  FROM cs$tp),""".stripMargin
    }.mkString("\n")
    val selects = dials.map(tp => s"SELECT * FROM rep$tp")
      .mkString("\nUNION ALL\n")
    s"""|WITH RECURSIVE tok AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (
        |  SELECT DISTINCT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(ts) - 2),
        |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
        |  FROM tok),
        |nt AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
        |cand AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
        |  FROM tri a JOIN tri b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |$perDial
        |fin AS (
        |$selects
        |)
        |SELECT * FROM fin ORDER BY tau_permille""".stripMargin
  }

  /** x160's oracle: x145's chunk chain shared, then one next-fit fill
    * recurrence per capacity dial (recursive CTEs — not fenceable, and
    * the fan-out is flat: each dial reads `r` once). */
  private val x160PackLadderSql: String = {
    val caps = Seq(128, 256, 512)
    val perCap = caps.map { cap =>
      s"""|f$cap AS (
          |  SELECT source, rk, n_chunk_tokens,
          |    CAST(0 AS BIGINT) AS pack_id, CAST(n_chunk_tokens AS BIGINT) AS fill
          |  FROM r WHERE rk = 1
          |  UNION ALL
          |  SELECT r.source, r.rk, r.n_chunk_tokens,
          |    CASE WHEN f$cap.fill + r.n_chunk_tokens > $cap
          |         THEN f$cap.pack_id + 1 ELSE f$cap.pack_id END,
          |    CASE WHEN f$cap.fill + r.n_chunk_tokens > $cap
          |         THEN CAST(r.n_chunk_tokens AS BIGINT)
          |         ELSE f$cap.fill + r.n_chunk_tokens END
          |  FROM r JOIN f$cap ON r.source = f$cap.source AND r.rk = f$cap.rk + 1),
          |pk$cap AS (
          |  SELECT source, pack_id, COUNT(*) AS nc,
          |    CAST(SUM(n_chunk_tokens) AS BIGINT) AS pt
          |  FROM f$cap GROUP BY source, pack_id),
          |rep$cap AS (
          |  SELECT CAST($cap AS INT) AS capacity,
          |    CAST(COUNT(*) AS BIGINT) AS n_packs,
          |    CAST(SUM(nc) AS BIGINT) AS n_chunks,
          |    CAST(SUM(pt) AS BIGINT) AS packed_tokens,
          |    (CAST(SUM(pt) AS BIGINT) * 1000) // (COUNT(*) * $cap) AS fill_permille
          |  FROM pk$cap),""".stripMargin
    }.mkString("\n")
    val selects = caps.map(c => s"SELECT * FROM rep$c").mkString("\nUNION ALL\n")
    s"""|WITH RECURSIVE t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS nt FROM t WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, GREATEST(CAST(ceil((nt - 10) / 40.0) AS INT), 1) - 1)) AS ci
        |  FROM n),
        |ch AS (
        |  SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
        |    CAST(len(toks[ci*40+1 : ci*40+50]) AS INT) AS n_chunk_tokens
        |  FROM c),
        |j AS (SELECT ch.doc_id, ch.chunk_idx, ch.n_chunk_tokens, d.source
        |      FROM ch JOIN documents d ON ch.doc_id = d.doc_id),
        |r AS (
        |  SELECT source, n_chunk_tokens,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id, chunk_idx) AS rk
        |  FROM j),
        |$perCap
        |fin AS (
        |$selects
        |)
        |SELECT * FROM fin ORDER BY capacity""".stripMargin
  }

  /** x71's trained replay (coarse Lloyd rounds ka1/kc1/ka2/kc2,
    * per-subspace PQ k-means a1/m1/s1/a2/m2/s2 — fixed-point centroid
    * means and all) re-pointed
    * at the x146 corpus/query split, with the serve stages threaded by
    * q_id exactly as [[ivfPqServeChainSql]] threads the sampled build:
    * per-query probe LIMIT 6 over the TRAINED cells (kc2), codes over
    * the union of probed cells from the TRAINED codebook (s2), ADC cut
    * ≤ refine·k = 40, exact-L2 rerank to `srv`. */
  private val ivfPqTrainedServeChainSql: String =
    """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 50 <> 0),
        |qs AS (
        |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |c0 AS (SELECT vec_id AS cid, v AS cv FROM e
        |       ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
        |ka1 AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c0.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c0.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(c0.cv)), i -> c0.cv[i] * c0.cv[i])))) DESC,
        |        c0.cid ASC) AS rk
        |    FROM e, c0) WHERE rk = 1),
        |kc1 AS (
        |  SELECT cid, list(m ORDER BY pos) AS cv FROM (
        |    SELECT cid, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS m FROM (
        |      SELECT cid, pos,
        |        2 * CAST(SUM(CAST(floor(vv * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM (SELECT cid, unnest(generate_series(1, len(v))) AS pos, unnest(v) AS vv FROM ka1)
        |      GROUP BY cid, pos)) GROUP BY cid),
        |ka2 AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, kc1.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * kc1.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(kc1.cv)), i -> kc1.cv[i] * kc1.cv[i])))) DESC,
        |        kc1.cid ASC) AS rk
        |    FROM e, kc1) WHERE rk = 1),
        |kc2 AS (
        |  SELECT cid, list(m ORDER BY pos) AS cv FROM (
        |    SELECT cid, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS m FROM (
        |      SELECT cid, pos,
        |        2 * CAST(SUM(CAST(floor(vv * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM (SELECT cid, unnest(generate_series(1, len(v))) AS pos, unnest(v) AS vv FROM ka2)
        |      GROUP BY cid, pos)) GROUP BY cid),
        |casg AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT e.vec_id, kc2.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * kc2.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(kc2.cv)), i -> kc2.cv[i] * kc2.cv[i])))) DESC,
        |        kc2.cid ASC) AS rk
        |    FROM e, kc2) WHERE rk = 1),
        |qprobe AS (
        |  SELECT q_id, cid FROM (
        |    SELECT qs.q_id, kc2.cid,
        |      row_number() OVER (PARTITION BY qs.q_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(kc2.cv)), i -> kc2.cv[i] * qs.qv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(kc2.cv)), i -> kc2.cv[i] * kc2.cv[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(qs.qv)), i -> qs.qv[i] * qs.qv[i])))) DESC,
        |        kc2.cid ASC) AS rk
        |    FROM qs, kc2) WHERE rk <= 6),
        |pruned AS (SELECT DISTINCT vec_id FROM casg JOIN qprobe USING (cid)),
        |jj AS (SELECT unnest(generate_series(0, 7)) AS j),
        |pp AS (SELECT unnest(generate_series(1, 8)) AS pos),
        |cb0 AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k, v AS cv
        |  FROM e
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 256),
        |s0 AS (
        |  SELECT jj.j, cb0.k,
        |    list_transform(generate_series(1, 8), t -> cb0.cv[jj.j * 8 + t]) AS sub
        |  FROM jj, cb0),
        |a1 AS (
        |  SELECT vec_id, j, k FROM (
        |    SELECT e.vec_id, s0.j, s0.k,
        |      row_number() OVER (PARTITION BY e.vec_id, s0.j ORDER BY
        |        list_sum(list_transform(generate_series(1, 8), t ->
        |          (e.v[s0.j * 8 + t] - s0.sub[t]) * (e.v[s0.j * 8 + t] - s0.sub[t]))) ASC,
        |        s0.k ASC) AS rk
        |    FROM e, s0) WHERE rk = 1),
        |m1 AS (
        |  SELECT j, k, list(mm ORDER BY pos) AS sub FROM (
        |    SELECT j, k, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS mm FROM (
        |      SELECT a1.j, a1.k, pp.pos,
        |        2 * CAST(SUM(CAST(floor(e.v[a1.j * 8 + pp.pos] * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM a1 JOIN e USING (vec_id), pp
        |      GROUP BY a1.j, a1.k, pp.pos)) GROUP BY j, k),
        |s1 AS (
        |  SELECT s0.j, s0.k, COALESCE(m1.sub, s0.sub) AS sub
        |  FROM s0 LEFT JOIN m1 ON m1.j = s0.j AND m1.k = s0.k),
        |a2 AS (
        |  SELECT vec_id, j, k FROM (
        |    SELECT e.vec_id, s1.j, s1.k,
        |      row_number() OVER (PARTITION BY e.vec_id, s1.j ORDER BY
        |        list_sum(list_transform(generate_series(1, 8), t ->
        |          (e.v[s1.j * 8 + t] - s1.sub[t]) * (e.v[s1.j * 8 + t] - s1.sub[t]))) ASC,
        |        s1.k ASC) AS rk
        |    FROM e, s1) WHERE rk = 1),
        |m2 AS (
        |  SELECT j, k, list(mm ORDER BY pos) AS sub FROM (
        |    SELECT j, k, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS mm FROM (
        |      SELECT a2.j, a2.k, pp.pos,
        |        2 * CAST(SUM(CAST(floor(e.v[a2.j * 8 + pp.pos] * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM a2 JOIN e USING (vec_id), pp
        |      GROUP BY a2.j, a2.k, pp.pos)) GROUP BY j, k),
        |s2 AS (
        |  SELECT s1.j, s1.k, COALESCE(m2.sub, s1.sub) AS sub
        |  FROM s1 LEFT JOIN m2 ON m2.j = s1.j AND m2.k = s1.k),
        |codes AS (
        |  SELECT vec_id, j, k FROM (
        |    SELECT e.vec_id, s2.j, s2.k,
        |      row_number() OVER (PARTITION BY e.vec_id, s2.j ORDER BY
        |        list_sum(list_transform(generate_series(1, 8), t ->
        |          (e.v[s2.j * 8 + t] - s2.sub[t]) * (e.v[s2.j * 8 + t] - s2.sub[t]))) ASC,
        |        s2.k ASC) AS rk
        |    FROM e JOIN pruned USING (vec_id), s2) WHERE rk = 1),
        |qtab AS (
        |  SELECT qs.q_id, s2.j, s2.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (qs.qv[s2.j * 8 + t] - s2.sub[t]) * (qs.qv[s2.j * 8 + t] - s2.sub[t]))) AS dist
        |  FROM qs, s2),
        |approx AS (
        |  SELECT qp.q_id, c.vec_id, list_sum(list(qt.dist ORDER BY c.j)) AS pq
        |  FROM qprobe qp
        |  JOIN casg ON casg.cid = qp.cid
        |  JOIN codes c ON c.vec_id = casg.vec_id
        |  JOIN qtab qt ON qt.q_id = qp.q_id AND qt.j = c.j AND qt.k = c.k
        |  GROUP BY qp.q_id, c.vec_id),
        |cand AS (
        |  SELECT q_id, vec_id, pq FROM approx
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY pq, vec_id) <= 40),
        |scored AS (
        |  SELECT cand.q_id, cand.vec_id, cand.pq,
        |    list_sum(list_transform(generate_series(1, len(e.v)), t ->
        |      (e.v[t] - qs.qv[t]) * (e.v[t] - qs.qv[t]))) AS l2
        |  FROM cand JOIN e USING (vec_id) JOIN qs USING (q_id)),
        |srv AS (
        |  SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY l2 ASC, vec_id ASC) AS INT) AS rank,
        |    vec_id, pq, l2
        |  FROM scored
        |  QUALIFY rank <= 5)""".stripMargin

  /** x89's projected-IVF replay threaded by q_id (the x151 audit):
    * projection matrix + per-row folds, md5 centroid sample + argmax
    * assignment in the 16-dim space, per-query top-4 projected-cosine
    * probe, original-space rounded-cosine rerank to `srv`
    * (q_id, vec_id). `e`/`qs` stay visible to the recall tail. */
  private val projectedServeChainSql: String =
    """WITH h AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |    d -> (CAST('0x' || substr(md5('rhp:' || CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS UBIGINT) % 2000001) / 1000000.0 - 1.0) AS hv
        |  FROM generate_series(0, 15) t(b)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings WHERE vec_id % 50 <> 0),
        |qs AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id % 50 = 0),
        |ep AS (
        |  SELECT e.vec_id,
        |    list(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * h.hv[i])) ORDER BY h.b) AS p
        |  FROM e, h GROUP BY e.vec_id),
        |qp AS (
        |  SELECT qs.q_id,
        |    list(list_sum(list_transform(generate_series(1, 64), i -> qs.qv[i] * h.hv[i])) ORDER BY h.b) AS p
        |  FROM qs, h GROUP BY qs.q_id),
        |c0 AS (SELECT vec_id AS cid, p AS cv FROM ep
        |       ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
        |asg AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT ep.vec_id, c0.cid,
        |      row_number() OVER (PARTITION BY ep.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, 16), i -> ep.p[i] * c0.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, 16), i -> ep.p[i] * ep.p[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, 16), i -> c0.cv[i] * c0.cv[i])))) DESC,
        |        c0.cid ASC) AS rk
        |    FROM ep, c0) WHERE rk = 1),
        |probe AS (
        |  SELECT q_id, cid FROM (
        |    SELECT qp.q_id, c0.cid,
        |      row_number() OVER (PARTITION BY qp.q_id ORDER BY
        |        list_sum(list_transform(generate_series(1, 16), i -> c0.cv[i] * qp.p[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, 16), i -> c0.cv[i] * c0.cv[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, 16), i -> qp.p[i] * qp.p[i])))) DESC,
        |        c0.cid ASC) AS rk
        |    FROM qp, c0) WHERE rk <= 4),
        |srv AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT probe.q_id, asg.vec_id,
        |      row_number() OVER (PARTITION BY probe.q_id ORDER BY
        |        round(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * qs.qv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, 64), i -> qs.qv[i] * qs.qv[i])))), 6) DESC,
        |        asg.vec_id ASC) AS rk
        |    FROM asg JOIN probe USING (cid)
        |      JOIN e ON e.vec_id = asg.vec_id
        |      JOIN qs ON qs.q_id = probe.q_id) WHERE rk <= 5)""".stripMargin

  /** The recall@5 tail for COSINE-ranked families — [[recallTailSql]]
    * with the exact ground truth ranked by the rounded original-space
    * cosine (the metric the projected/banded paths serve by; L2 truth
    * would conflate metric mismatch with index quality). Appends to a
    * chain ending at `srv` with `e`/`qs` in scope. */
  private val recallTailCosineSql: String =
    """,
      |exact AS (
      |  SELECT q_id, vec_id FROM (
      |    SELECT qs.q_id, e.vec_id,
      |      row_number() OVER (PARTITION BY qs.q_id ORDER BY
      |        round(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * qs.qv[i])) /
      |          (sqrt(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * e.v[i]))) *
      |           sqrt(list_sum(list_transform(generate_series(1, 64), i -> qs.qv[i] * qs.qv[i])))), 6) DESC,
      |        e.vec_id ASC) AS rk
      |    FROM e, qs) WHERE rk <= 5)""".stripMargin + recallHitsTailSql

  /** x80's trained-residual IVFADC replay threaded by q_id (the x154
    * audit): coarse md5 sample + argmax assignment, residual frame,
    * the two residual PQ training rounds (fixed-point integer means,
    * COALESCE empty cells), codes over the union of probed cells,
    * per-(query, cell) ADC tables from the residual q − c, cut ≤
    * refine·k = 40, exact-L2 rerank to `srv`. `e`/`qs` stay visible to
    * the recall tail. */
  private val residualServeChainSql: String =
    """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 50 <> 0),
        |qs AS (
        |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |samp AS (
        |  SELECT vec_id AS cid, v AS cv
        |  FROM e
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
        |asg AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT e.vec_id, samp.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * samp.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(samp.cv)), i -> samp.cv[i] * samp.cv[i])))) DESC,
        |        samp.cid ASC) AS rk
        |    FROM e, samp) WHERE rk = 1),
        |probe AS (
        |  SELECT q_id, cid, cv FROM (
        |    SELECT qs.q_id, samp.cid, samp.cv,
        |      row_number() OVER (PARTITION BY qs.q_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(samp.cv)), i -> samp.cv[i] * qs.qv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(samp.cv)), i -> samp.cv[i] * samp.cv[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(qs.qv)), i -> qs.qv[i] * qs.qv[i])))) DESC,
        |        samp.cid ASC) AS rk
        |    FROM samp, qs) WHERE rk <= 6),
        |rv AS (
        |  SELECT a.vec_id, a.cid,
        |    list_transform(generate_series(1, len(e.v)), i -> e.v[i] - samp.cv[i]) AS r
        |  FROM asg a JOIN e USING (vec_id) JOIN samp ON samp.cid = a.cid),
        |jj AS (SELECT unnest(generate_series(0, 7)) AS j),
        |pp AS (SELECT unnest(generate_series(1, 8)) AS pos),
        |rcb0 AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k,
        |    r AS cv
        |  FROM rv
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
        |s0 AS (
        |  SELECT jj.j, rcb0.k,
        |    list_transform(generate_series(1, 8), t -> rcb0.cv[jj.j * 8 + t]) AS sub
        |  FROM jj, rcb0),
        |a1 AS (
        |  SELECT vec_id, j, k FROM (
        |    SELECT rv.vec_id, s0.j, s0.k,
        |      row_number() OVER (PARTITION BY rv.vec_id, s0.j ORDER BY
        |        list_sum(list_transform(generate_series(1, 8), t ->
        |          (rv.r[s0.j * 8 + t] - s0.sub[t]) * (rv.r[s0.j * 8 + t] - s0.sub[t]))) ASC,
        |        s0.k ASC) AS rk
        |    FROM rv, s0) WHERE rk = 1),
        |m1 AS (
        |  SELECT j, k, list(mm ORDER BY pos) AS sub FROM (
        |    SELECT j, k, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS mm FROM (
        |      SELECT a1.j, a1.k, pp.pos,
        |        2 * CAST(SUM(CAST(floor(rv.r[a1.j * 8 + pp.pos] * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM a1 JOIN rv USING (vec_id), pp
        |      GROUP BY a1.j, a1.k, pp.pos)) GROUP BY j, k),
        |s1 AS (
        |  SELECT s0.j, s0.k, COALESCE(m1.sub, s0.sub) AS sub
        |  FROM s0 LEFT JOIN m1 ON m1.j = s0.j AND m1.k = s0.k),
        |a2 AS (
        |  SELECT vec_id, j, k FROM (
        |    SELECT rv.vec_id, s1.j, s1.k,
        |      row_number() OVER (PARTITION BY rv.vec_id, s1.j ORDER BY
        |        list_sum(list_transform(generate_series(1, 8), t ->
        |          (rv.r[s1.j * 8 + t] - s1.sub[t]) * (rv.r[s1.j * 8 + t] - s1.sub[t]))) ASC,
        |        s1.k ASC) AS rk
        |    FROM rv, s1) WHERE rk = 1),
        |m2 AS (
        |  SELECT j, k, list(mm ORDER BY pos) AS sub FROM (
        |    SELECT j, k, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS mm FROM (
        |      SELECT a2.j, a2.k, pp.pos,
        |        2 * CAST(SUM(CAST(floor(rv.r[a2.j * 8 + pp.pos] * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM a2 JOIN rv USING (vec_id), pp
        |      GROUP BY a2.j, a2.k, pp.pos)) GROUP BY j, k),
        |s2 AS (
        |  SELECT s1.j, s1.k, COALESCE(m2.sub, s1.sub) AS sub
        |  FROM s1 LEFT JOIN m2 ON m2.j = s1.j AND m2.k = s1.k),
        |pruned AS (
        |  SELECT DISTINCT vec_id FROM asg
        |  JOIN (SELECT DISTINCT cid FROM probe) p USING (cid)),
        |codes AS (
        |  SELECT vec_id, j, k FROM (
        |    SELECT rv.vec_id, s2.j, s2.k,
        |      row_number() OVER (PARTITION BY rv.vec_id, s2.j ORDER BY
        |        list_sum(list_transform(generate_series(1, 8), t ->
        |          (rv.r[s2.j * 8 + t] - s2.sub[t]) * (rv.r[s2.j * 8 + t] - s2.sub[t]))) ASC,
        |        s2.k ASC) AS rk
        |    FROM rv JOIN pruned USING (vec_id), s2) WHERE rk = 1),
        |qtab AS (
        |  SELECT probe.q_id, probe.cid, s2.j, s2.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      ((qs.qv[s2.j * 8 + t] - probe.cv[s2.j * 8 + t]) - s2.sub[t]) *
        |      ((qs.qv[s2.j * 8 + t] - probe.cv[s2.j * 8 + t]) - s2.sub[t]))) AS dist
        |  FROM qs JOIN probe ON probe.q_id = qs.q_id, s2),
        |approx AS (
        |  SELECT qt.q_id, c.vec_id, list_sum(list(qt.dist ORDER BY c.j)) AS pq
        |  FROM codes c
        |  JOIN asg ON asg.vec_id = c.vec_id
        |  JOIN qtab qt ON qt.cid = asg.cid AND qt.j = c.j AND qt.k = c.k
        |  GROUP BY qt.q_id, c.vec_id),
        |cand AS (
        |  SELECT q_id, vec_id, pq FROM approx
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY pq, vec_id) <= 40),
        |scored AS (
        |  SELECT cand.q_id, cand.vec_id, cand.pq,
        |    list_sum(list_transform(generate_series(1, len(e.v)), t ->
        |      (e.v[t] - qs.qv[t]) * (e.v[t] - qs.qv[t]))) AS l2
        |  FROM cand JOIN e USING (vec_id) JOIN qs USING (q_id)),
        |srv AS (
        |  SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY l2 ASC, vec_id ASC) AS INT) AS rank,
        |    vec_id, pq, l2
        |  FROM scored
        |  QUALIFY rank <= 5)""".stripMargin

  /** x45's banded batch serve as a chain ending at `srv` (q_id, vec_id)
    * with `e`/`qs` in scope for the cosine recall tail (the x153
    * audit): both sides banded by the same 128 md5 planes, candidates
    * by the (j, bv) equi-join, per-query rounded-cosine top-5. */
  private val bandedServeChainSql: String =
    """WITH h AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |    d -> (CAST('0x' || substr(md5('rhp:' || CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS UBIGINT) % 2000001) / 1000000.0 - 1.0) AS hv
        |  FROM generate_series(0, 127) t(b)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings WHERE vec_id % 50 <> 0),
        |qs AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id % 50 = 0),
        |bitsC AS (
        |  SELECT e.vec_id, CAST(h.b // 8 AS INT) AS j,
        |    CASE WHEN list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * hv[i])) > 0
        |      THEN CAST(1 << (7 - (h.b % 8)) AS BIGINT) ELSE 0 END AS bit
        |  FROM e, h),
        |bandsC AS (SELECT vec_id, j, SUM(bit) AS bv FROM bitsC GROUP BY vec_id, j),
        |bitsQ AS (
        |  SELECT qs.q_id, CAST(h.b // 8 AS INT) AS j,
        |    CASE WHEN list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * hv[i])) > 0
        |      THEN CAST(1 << (7 - (h.b % 8)) AS BIGINT) ELSE 0 END AS bit
        |  FROM qs, h),
        |bandsQ AS (SELECT q_id, j, SUM(bit) AS bv FROM bitsQ GROUP BY q_id, j),
        |cand AS (
        |  SELECT DISTINCT q.q_id, c.vec_id
        |  FROM bandsQ q JOIN bandsC c USING (j, bv)),
        |srv AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT cand.q_id, cand.vec_id,
        |      row_number() OVER (PARTITION BY cand.q_id ORDER BY
        |        round(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * q.qv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i] * q.qv[i])))), 6) DESC,
        |        cand.vec_id ASC) AS rk
        |    FROM cand
        |    JOIN e c ON c.vec_id = cand.vec_id
        |    JOIN qs q ON q.q_id = cand.q_id) WHERE rk <= 5)""".stripMargin

  /** The full Naive-Bayes replay, parameterized by the train/test split
    * predicates on `documents` — shared by x108 (the %5 evaluation
    * split) and s17 (the streaming ingest screen's static/arrival
    * split): per-class doc/token counts, V, N, the smoothed fixed-point
    * likelihood grid, exact per-(doc, class) integer sums, argmax on
    * (score DESC, label ASC). */
  private[queries] def nbEvalSql(trainWhere: String, testWhere: String): String =
    nbChainSql(trainWhere, testWhere) +
    """
      |SELECT b.doc_id, te.lang AS actual_label, b.pred_label,
      |  round(CAST(b.score_fix AS DOUBLE) / 1000000000000.0, 6) AS score_nats,
      |  te.lang = b.pred_label AS is_correct
      |FROM best b JOIN test te USING (doc_id)
      |WHERE b.rn = 1
      |ORDER BY b.doc_id""".stripMargin

  /** The NB chain up to `best` (per-doc argmax rank 1) with `train`,
    * `test`, `cls` in scope — consumers append their own tail (x108/s17
    * emit per-doc verdicts; x114 aggregates the per-class report; p05
    * composes the screened export). */
  private[queries] def nbChainSql(trainWhere: String, testWhere: String): String =
    s"""WITH train AS (SELECT doc_id, lang, text FROM documents WHERE $trainWhere),
       |test AS (SELECT doc_id, lang, text FROM documents WHERE $testWhere),""".stripMargin +
    """
      |ttok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM train),
      |cls AS (SELECT lang, COUNT(*) AS n_docs FROM train GROUP BY 1),
      |ctok AS (SELECT lang, COUNT(*) AS n_tok FROM ttok GROUP BY 1),
      |wc AS (SELECT lang, w, COUNT(*) AS cwc FROM ttok GROUP BY 1, 2),
      |v AS (SELECT COUNT(DISTINCT w) AS vsz FROM ttok),
      |n AS (SELECT COUNT(*) AS ntr FROM train),
      |pri AS (
      |  SELECT cls.lang,
      |    CAST(floor(ln(CAST(cls.n_docs AS DOUBLE) / n.ntr) * 1000000000000.0) AS BIGINT) AS prior_fix,
      |    ctok.n_tok
      |  FROM cls JOIN ctok USING (lang), n),
      |stok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM test),
      |term AS (
      |  SELECT s.doc_id, p.lang, p.prior_fix,
      |    CAST(floor(ln((COALESCE(wc.cwc, 0) + 1.0) /
      |      CAST(p.n_tok + v.vsz AS DOUBLE)) * 1000000000000.0) AS BIGINT) AS lw_fix
      |  FROM stok s CROSS JOIN pri p
      |  LEFT JOIN wc ON wc.lang = p.lang AND wc.w = s.w, v),
      |tot AS (
      |  SELECT doc_id, lang, prior_fix + CAST(SUM(lw_fix) AS BIGINT) AS score_fix
      |  FROM term GROUP BY doc_id, lang, prior_fix),
      |best AS (
      |  SELECT doc_id, lang AS pred_label, score_fix,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score_fix DESC, lang ASC) AS rn
      |  FROM tot)""".stripMargin

  /** DuckDB evaluates plain CTEs by INLINING: a CTE referenced k times
    * re-evaluates its whole subtree k times, so an unrolled chain whose
    * every link references the previous one 2–3× (x98's u-chain, the
    * pr-chain here, the pipeline replay's staged frames) costs
    * exponential-in-depth time — >300 s at sf0.1 where the same oracle
    * runs in seconds once each CTE is evaluated exactly once.
    * `AS MATERIALIZED` is DuckDB's pure evaluation fence (identical
    * semantics, forced single evaluation). Recursive CTEs — declared
    * with a column list, `walk(id, reach) AS (` — are left untouched:
    * the pattern requires the bare name directly before ` AS (`.
    *
    * CTE-CHAIN-ONLY: the `,\s*name AS (` alternative matches ANY
    * comma-preceded name-AS-paren, so a query with a multi-definition
    * named WINDOW clause (`WINDOW w1 AS (...), w2 AS (...)`) would be
    * rewritten into invalid SQL. Every oracle here keeps window specs
    * inline in OVER (...) — feed this helper nothing but WITH-chains. */
  private[graft] def materializeCtes(sql: String): String =
    sql.replaceAll(
      "((?:WITH RECURSIVE |WITH |,\\s*)[a-z][a-z0-9_]*) AS \\(",
      "$1 AS MATERIALIZED (")

  private def bandedGraphSql(tail: String): String =
    materializeCtes("""WITH h AS (
      |  SELECT b, list_transform(generate_series(0, 63),
      |    d -> (CAST('0x' || substr(md5('rhp:' || CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS UBIGINT) % 2000001) / 1000000.0 - 1.0) AS hv
      |  FROM generate_series(0, 63) t(b)),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |bits AS (
      |  SELECT e.vec_id, CAST(h.b // 4 AS INT) AS j,
      |    CASE WHEN list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * hv[i])) > 0
      |      THEN CAST(1 << (3 - (h.b % 4)) AS BIGINT) ELSE 0 END AS bit
      |  FROM e, h),
      |bands AS (SELECT vec_id, j, SUM(bit) AS bv FROM bits GROUP BY vec_id, j),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS nbr_id
      |  FROM bands a JOIN bands b USING (j, bv)
      |  WHERE a.vec_id <> b.vec_id),
      |scored AS (
      |  SELECT cand.src_id, cand.nbr_id,
      |    round(
      |      list_sum(list_transform(generate_series(1, len(sv.v)), i -> sv.v[i] * nv.v[i])) /
      |      (sqrt(list_sum(list_transform(generate_series(1, len(sv.v)), i -> sv.v[i] * sv.v[i]))) *
      |       sqrt(list_sum(list_transform(generate_series(1, len(nv.v)), i -> nv.v[i] * nv.v[i])))),
      |    6) AS cos_sim
      |  FROM cand
      |  JOIN e sv ON sv.vec_id = cand.src_id
      |  JOIN e nv ON nv.vec_id = cand.nbr_id),
      |graph AS (
      |  SELECT src_id, nbr_id, cos_sim,
      |    CAST(row_number() OVER (PARTITION BY src_id ORDER BY cos_sim DESC, nbr_id ASC) AS INT) AS rank
      |  FROM scored
      |  QUALIFY rank <= 5)
      |""".stripMargin + tail)

  /** The x99 graph-curation replay up to `comps` (recursive min-label
    * components of the >=0.4 mutual pairs) and `pr5` (the x93
    * fixed-point PageRank frame) — shared by x99 (per-row keeper
    * output) and p04 (manifest over the kept docs). `tail` starts with
    * a comma and appends the consumer CTEs + final SELECT; the leading
    * WITH is patched to WITH RECURSIVE for the walk. */
  private def graphKeeperSql(tail: String): String =
    bandedGraphSql(
      (1 to 5).map(t =>
        s"""m$t AS (
           |  SELECT ge.d AS nid,
           |    CAST(SUM(((p.pr_fix * 85) // 100) // od.od) AS BIGINT) AS s
           |  FROM ge JOIN pr${t - 1} p ON ge.s = p.nid JOIN od ON ge.s = od.s
           |  GROUP BY ge.d),
           |pr$t AS (
           |  SELECT i.nid, (SELECT base FROM c) + COALESCE(m$t.s, 0) AS pr_fix
           |  FROM ids i LEFT JOIN m$t USING (nid))""".stripMargin)
        .mkString(
          """, mp AS (
            |  SELECT g1.src_id AS a_id, g1.nbr_id AS b_id
            |  FROM graph g1
            |  JOIN graph g2 ON g1.src_id = g2.nbr_id AND g1.nbr_id = g2.src_id
            |  WHERE g1.src_id < g1.nbr_id AND g1.cos_sim >= 0.4),
            |edges2 AS (SELECT a_id AS u, b_id AS v FROM mp
            |           UNION SELECT b_id, a_id FROM mp),
            |walk(id, reach) AS (
            |  SELECT vec_id, vec_id FROM e
            |  UNION
            |  SELECT w.id, e2.v FROM walk w JOIN edges2 e2 ON w.reach = e2.u),
            |comps AS (SELECT id, MIN(reach) AS cluster_id FROM walk GROUP BY id),
            |ids AS (SELECT vec_id AS nid FROM e),
            |c AS (
            |  SELECT 1000000000000 // cnt AS init,
            |    ((1000000000000 * 15) // 100) // cnt AS base
            |  FROM (SELECT COUNT(*) AS cnt FROM ids)),
            |ge AS (SELECT src_id AS s, nbr_id AS d FROM graph),
            |od AS (SELECT s, COUNT(*) AS od FROM ge GROUP BY 1),
            |pr0 AS (SELECT nid, (SELECT init FROM c) AS pr_fix FROM ids),
            |""".stripMargin, ",\n", "") + tail)
      .replaceFirst("WITH h AS", "WITH RECURSIVE h AS")

  private def knnGraphSql(m: String, extraCte: String): String = {
    val tmpl =
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, v AS cv FROM $m
        |       ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
        |       LIMIT (SELECT GREATEST(4, CAST(floor(0.35 * sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)) FROM $m)),
        |a1 AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT $m.vec_id, $m.v, c0.cid,
        |      row_number() OVER (PARTITION BY $m.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len($m.v)), i -> $m.v[i] * c0.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len($m.v)), i -> $m.v[i] * $m.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(c0.cv)), i -> c0.cv[i] * c0.cv[i])))) DESC,
        |        c0.cid ASC) AS rk
        |    FROM $m, c0) WHERE rk = 1),
        |c1 AS (
        |  SELECT cid, list(m ORDER BY pos) AS cv FROM (
        |    SELECT cid, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS m FROM (
        |      SELECT cid, pos,
        |        2 * CAST(SUM(CAST(floor(vv * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM (SELECT cid, unnest(generate_series(1, len(v))) AS pos, unnest(v) AS vv FROM a1)
        |      GROUP BY cid, pos)) GROUP BY cid),
        |a2 AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT $m.vec_id, $m.v, c1.cid,
        |      row_number() OVER (PARTITION BY $m.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len($m.v)), i -> $m.v[i] * c1.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len($m.v)), i -> $m.v[i] * $m.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(c1.cv)), i -> c1.cv[i] * c1.cv[i])))) DESC,
        |        c1.cid ASC) AS rk
        |    FROM $m, c1) WHERE rk = 1),
        |c2 AS (
        |  SELECT cid, list(m ORDER BY pos) AS cv FROM (
        |    SELECT cid, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS m FROM (
        |      SELECT cid, pos,
        |        2 * CAST(SUM(CAST(floor(vv * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM (SELECT cid, unnest(generate_series(1, len(v))) AS pos, unnest(v) AS vv FROM a2)
        |      GROUP BY cid, pos)) GROUP BY cid),
        |pc AS (
        |  SELECT vec_id, cid, rk FROM (
        |    SELECT e.vec_id, c2.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c2.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(c2.cv)), i -> c2.cv[i] * c2.cv[i])))) DESC,
        |        c2.cid ASC) AS rk
        |    FROM e, c2) WHERE rk <= 5),
        |h AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |    d -> (CAST('0x' || substr(md5('rhp:' || CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS UBIGINT) % 2000001) / 1000000.0 - 1.0) AS hv
        |  FROM generate_series(0, 63) t(b)),
        |bits AS (
        |  SELECT e.vec_id, CAST(h.b // 4 AS INT) AS j,
        |    CASE WHEN list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * hv[i])) > 0
        |      THEN CAST(1 << (3 - (h.b % 4)) AS BIGINT) ELSE 0 END AS bit
        |  FROM e, h),
        |bands AS (SELECT vec_id, j, SUM(bit) AS bv FROM bits GROUP BY vec_id, j),
        |pb AS (SELECT p.vec_id, p.cid, b.j, b.bv FROM pc p JOIN bands b USING (vec_id)),
        |hb AS (SELECT p.vec_id, p.cid, b.j, b.bv FROM pc p JOIN bands b USING (vec_id) WHERE p.rk = 1),
        |dir AS (
        |  SELECT DISTINCT pb.vec_id AS a, hb.vec_id AS b
        |  FROM pb JOIN hb ON pb.cid = hb.cid AND pb.j = hb.j AND pb.bv = hb.bv
        |  WHERE pb.vec_id <> hb.vec_id),
        |cand AS (SELECT a AS src_id, b AS nbr_id FROM dir UNION SELECT b, a FROM dir),
        |scored AS (
        |  SELECT cand.src_id, cand.nbr_id,
        |    round(
        |      list_sum(list_transform(generate_series(1, len(sv.v)), i -> sv.v[i] * nv.v[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, len(sv.v)), i -> sv.v[i] * sv.v[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, len(nv.v)), i -> nv.v[i] * nv.v[i])))),
        |    6) AS cos_sim
        |  FROM cand
        |  JOIN e sv ON sv.vec_id = cand.src_id
        |  JOIN e nv ON nv.vec_id = cand.nbr_id)
        |SELECT src_id, nbr_id, cos_sim,
        |  CAST(row_number() OVER (PARTITION BY src_id ORDER BY cos_sim DESC, nbr_id ASC) AS INT) AS rank
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY src_id, rank""".stripMargin
    tmpl.replace("$m", m)
      .replace("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),",
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)," + extraCte)
  }

  /** x43's banded-probe replay, shared verbatim by x70 (delta-index
    * probe): band keys are pure per-row functions, so probing static ∪
    * delta equals probing the rebuilt whole-corpus index. */
  /** x58's IVF×PQ replay, shared verbatim by x73 (delta-maintained
    * index): cell assignment and PQ codes are pure per-row functions
    * of the frozen model, so probing static ∪ inline-encoded delta
    * equals probing the whole corpus encoded at once. */
  private val x58IvfPqSql: String =
    """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id <> 0),
        |q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |samp AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k,
        |    vec_id AS cid, v AS cv
        |  FROM e
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
        |asg AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT e.vec_id, samp.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * samp.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(samp.cv)), i -> samp.cv[i] * samp.cv[i])))) DESC,
        |        samp.cid ASC) AS rk
        |    FROM e, samp) WHERE rk = 1),
        |probe AS (
        |  SELECT cid FROM samp, q
        |  ORDER BY
        |    list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * qv[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * cv[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))) DESC,
        |    cid ASC LIMIT 4),
        |pruned AS (
        |  SELECT vec_id FROM asg JOIN probe USING (cid)),
        |jj AS (SELECT unnest(generate_series(0, 7)) AS j),
        |dist AS (
        |  SELECT e.vec_id, jj.j, samp.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (e.v[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]) *
        |      (e.v[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]))) AS dist
        |  FROM e JOIN pruned USING (vec_id), jj, samp),
        |codes AS (
        |  SELECT vec_id, j, k FROM dist
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, k) = 1),
        |qtab AS (
        |  SELECT jj.j, samp.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (q.qv[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]) *
        |      (q.qv[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]))) AS dist
        |  FROM q, jj, samp),
        |approx AS (
        |  SELECT c.vec_id, list_sum(list(qt.dist ORDER BY c.j)) AS pq
        |  FROM codes c JOIN qtab qt ON qt.j = c.j AND qt.k = c.k
        |  GROUP BY c.vec_id),
        |cand AS (
        |  SELECT vec_id, pq FROM approx
        |  QUALIFY row_number() OVER (ORDER BY pq, vec_id) <= 60),
        |scored AS (
        |  SELECT cand.vec_id, cand.pq,
        |    list_sum(list_transform(generate_series(1, len(e.v)), t ->
        |      (e.v[t] - q.qv[t]) * (e.v[t] - q.qv[t]))) AS l2
        |  FROM cand JOIN e ON e.vec_id = cand.vec_id, q)
        |SELECT vec_id, round(pq, 6) AS pq_dist, round(l2, 6) AS l2_dist
        |FROM scored ORDER BY l2 ASC, vec_id ASC LIMIT 20""".stripMargin

  /** x76's batch-BM25 replay, shared verbatim by x81 (incremental
    * model): postings/df/stats are re-aggregatable exact counts, so
    * serving the merged static⊕delta model equals serving the rebuilt
    * whole-corpus model. */
  private val x76Bm25ServeSql: String =
    """WITH qdef(q_id, w) AS (VALUES
      |  (1, 'hash'), (1, 'join'),
      |  (2, 'spark'), (2, 'vector'),
      |  (3, 'data'), (3, 'filter'), (3, 'stream'),
      |  (4, 'cache'), (4, 'data')),
      |b2 AS (
      |  SELECT doc_id, len(ts) AS dl, ts FROM (
      |    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
      |    FROM documents)),
      |stats AS (SELECT COUNT(*) AS nd, SUM(dl) AS ntok FROM b2),
      |tf AS (
      |  SELECT doc_id, dl, w, COUNT(*) AS tf
      |  FROM (SELECT doc_id, dl, unnest(ts) AS w FROM b2)
      |  WHERE w IN (SELECT DISTINCT w FROM qdef)
      |  GROUP BY 1, 2, 3),
      |dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT t.doc_id, t.w,
      |    CAST(floor(
      |      ((ln(CAST(2 * s.nd - 2 * d.df + 1 AS DOUBLE) / CAST(2 * d.df + 1 AS DOUBLE))
      |        * (CAST(t.tf AS DOUBLE) * CAST(2.2 AS DOUBLE)))
      |       / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
      |          (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
      |           (CAST(t.dl * s.nd AS DOUBLE) / CAST(s.ntok AS DOUBLE)))))
      |      * 1000000000.0) AS BIGINT) AS sfix
      |  FROM tf t JOIN dfq d USING (w) CROSS JOIN stats s),
      |agg AS (
      |  SELECT q.q_id, sc.doc_id, COUNT(*) AS n_terms, SUM(sc.sfix) AS score_fix
      |  FROM qdef q JOIN scored sc USING (w)
      |  GROUP BY 1, 2)
      |SELECT CAST(q_id AS BIGINT) AS q_id,
      |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY score_fix DESC, doc_id ASC) AS INT) AS rank,
      |  doc_id, n_terms,
      |  round(CAST(score_fix AS DOUBLE) / 1000000000.0, 6) AS bm25,
      |  CAST(score_fix AS BIGINT) AS score_fix
      |FROM agg
      |QUALIFY rank <= 10
      |ORDER BY q_id, rank""".stripMargin

  private val x43BandedSql: String =
    """WITH h AS (
      |  SELECT b, list_transform(generate_series(0, 63),
      |    d -> (CAST('0x' || substr(md5('rhp:' || CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS UBIGINT) % 2000001) / 1000000.0 - 1.0) AS hv
      |  FROM generate_series(0, 127) t(b)),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0),
      |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
      |bits AS (
      |  SELECT e.vec_id, CAST(h.b // 8 AS INT) AS j,
      |    CASE WHEN list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * hv[i])) > 0
      |      THEN CAST(1 << (7 - (h.b % 8)) AS BIGINT) ELSE 0 END AS bit
      |  FROM e, h),
      |bands AS (SELECT vec_id, j, SUM(bit) AS bv FROM bits GROUP BY vec_id, j),
      |qbits AS (
      |  SELECT CAST(h.b // 8 AS INT) AS j,
      |    CASE WHEN list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * hv[i])) > 0
      |      THEN CAST(1 << (7 - (h.b % 8)) AS BIGINT) ELSE 0 END AS bit
      |  FROM q, h),
      |qbands AS (SELECT j, SUM(bit) AS bv FROM qbits GROUP BY j),
      |cand AS (SELECT DISTINCT vec_id FROM bands JOIN qbands USING (j, bv))
      |SELECT e.vec_id,
      |  round(
      |    list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * qv[i])) /
      |    (sqrt(list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * v[i]))) *
      |     sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))),
      |  6) AS cos_sim
      |FROM e JOIN cand USING (vec_id), q
      |ORDER BY cos_sim DESC, vec_id ASC LIMIT 20""".stripMargin

  /** x83's oracle: corpus BPE training REPLAYED in SQL — nMerges=6
    * rounds unrolled as CTE chains (the x57 Lloyd-unrolling pattern).
    * Round r: pair counts over the vocab frame's brace strings (exact
    * integers, overlapping adjacent pairs, never across words), the
    * (count desc, a, b) argmax with the ≥2 rule, one replace pass; the
    * application chain then folds the six learned pairs over each
    * doc's brace string and counts '{'. Zero floats anywhere. */
  /** The SYMBOL-AGNOSTIC training-round CTEs shared by x83 (char
    * convention) and x157 (byte convention) — the pair-extraction
    * regex reads whatever sits between braces, so the same unrolled
    * rounds replay both alphabets; only the s0/app0 prep differs. */
  private def bpeRoundsSql(nMerges: Int): String =
    (1 to nMerges).map { r =>
      val prev = s"s${r - 1}"
      s"""|p$r AS (
          |  SELECT string_split(pr, ' ')[1] AS a, string_split(pr, ' ')[2] AS b,
          |    SUM(cnt) AS n
          |  FROM (
          |    SELECT cnt, unnest(list_transform(generate_series(1, len(sy) - 1),
          |      i -> sy[i] || ' ' || sy[i + 1])) AS pr
          |    FROM (SELECT cnt, regexp_extract_all(s, '\\{([^}]*)\\}', 1) AS sy FROM $prev)
          |    WHERE len(sy) > 1)
          |  GROUP BY 1, 2),
          |b$r AS (SELECT a, b FROM p$r WHERE n >= 2 ORDER BY n DESC, a, b LIMIT 1),
          |s$r AS (
          |  SELECT cnt, replace(s, '{' || b$r.a || '} {' || b$r.b || '}',
          |    '{' || b$r.a || b$r.b || '}') AS s
          |  FROM $prev, b$r),""".stripMargin
    }.mkString("\n")

  /** The application-pass CTEs (one learned replace per round) shared
    * by x83/x157 (doc-keyed) and x161 (chunk-keyed via `keyCols`). */
  private def bpeAppsSql(nMerges: Int, keyCols: String = "doc_id"): String =
    (1 to nMerges).map { r =>
      s"""|app$r AS (
          |  SELECT $keyCols, replace(s, '{' || b$r.a || '} {' || b$r.b || '}',
          |    '{' || b$r.a || b$r.b || '}') AS s
          |  FROM app${r - 1}, b$r),""".stripMargin
    }.mkString("\n")

  private val x83BpeSql: String =
    s"""|WITH w0 AS (
        |  SELECT w, COUNT(*) AS cnt FROM (
        |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |    FROM documents)
        |  GROUP BY w),
        |s0 AS (SELECT cnt, regexp_replace(w, '(.)', '{\\1} ', 'g') AS s FROM w0),
        |${bpeRoundsSql(6)}
        |app0 AS (
        |  SELECT doc_id, array_to_string(list_transform(
        |    regexp_extract_all(lower(text), '[a-z0-9]+'),
        |    w -> regexp_replace(w, '(.)', '{\\1} ', 'g')), '/ ') AS s
        |  FROM documents),
        |${bpeAppsSql(6)}
        |final AS (SELECT doc_id, s FROM app6)
        |SELECT doc_id,
        |  CAST(length(s) - length(replace(s, '{', '')) AS INT) AS bpe_tokens
        |FROM final ORDER BY doc_id""".stripMargin

  /** x157's oracle: x83's training replay lifted to the BYTE
    * convention — words are raw non-whitespace runs, base symbols the
    * lowercase hex pairs of each word's UTF-8 bytes (DuckDB's
    * `hex(varchar)` hexes the UTF-8 bytes, the [[graft.ops.Bpe
    * .byteSyms]] convention), the rounds/application CTEs verbatim
    * from the shared generators. */
  private val x157BpeBytesSql: String =
    s"""|WITH w0 AS (
        |  SELECT w, COUNT(*) AS cnt FROM (
        |    SELECT unnest(regexp_extract_all(text, '[^ \\t\\n\\f\\r]+')) AS w
        |    FROM documents)
        |  GROUP BY w),
        |s0 AS (SELECT cnt, regexp_replace(lower(hex(w)), '(..)', '{\\1} ', 'g') AS s FROM w0),
        |${bpeRoundsSql(6)}
        |app0 AS (
        |  SELECT doc_id, array_to_string(list_transform(
        |    regexp_extract_all(text, '[^ \\t\\n\\f\\r]+'),
        |    w -> regexp_replace(lower(hex(w)), '(..)', '{\\1} ', 'g')), '/ ') AS s
        |  FROM documents),
        |${bpeAppsSql(6)}
        |final AS (SELECT doc_id, s FROM app6)
        |SELECT doc_id,
        |  CAST(length(s) - length(replace(s, '{', '')) AS INT) AS bpe_tokens
        |FROM final ORDER BY doc_id""".stripMargin

  /** x161's oracle — the TRAINED-tokenizer production lane: x157's
    * training replay (shared round CTEs minting b1..b6) chained into
    * x137's chunk/pack replay, with the per-chunk encode applying the
    * LEARNED pairs instead of the fixed seed table and ids minted by
    * [[graft.ops.Bpe.vocabOf]]'s discipline in SQL — base hex symbols
    * id = their byte value, merge rank r (1-based) mints 255 + r,
    * first-wins on duplicate surface strings (MIN(r)). n_ids derives
    * from the brace count (not the unnested symbol rows, which would
    * drop an empty chunk); ids_sum left-joins back with COALESCE 0 for
    * the same reason. The pack recurrence is x137's verbatim with
    * ids_sum threaded through. */
  private val x161TrainedPipelineSql: String = {
    val vcbUnion = (1 to 6)
      .map(r => s"SELECT $r AS r, a || b AS s FROM b$r")
      .mkString(" UNION ALL ")
    s"""|WITH RECURSIVE w0 AS (
        |  SELECT w, COUNT(*) AS cnt FROM (
        |    SELECT unnest(regexp_extract_all(text, '[^ \\t\\n\\f\\r]+')) AS w
        |    FROM documents)
        |  GROUP BY w),
        |s0 AS (SELECT cnt, regexp_replace(lower(hex(w)), '(..)', '{\\1} ', 'g') AS s FROM w0),
        |${bpeRoundsSql(6)}
        |vcb AS (SELECT s, 255 + MIN(r) AS id FROM ($vcbUnion) GROUP BY s),
        |t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |n AS (SELECT doc_id, ts, len(ts) AS nt FROM t),
        |bd AS (
        |  SELECT doc_id, ts, nt,
        |    CASE WHEN nt >= 4 THEN
        |      list_filter(generate_series(4, nt), i ->
        |        CAST('0x' || substr(md5(array_to_string(ts[i-3:i], ' ')), 1, 4) AS INT) % 16 = 0)
        |    ELSE [] END AS bnd
        |  FROM n),
        |fb AS (
        |  SELECT doc_id, ts, nt,
        |    CASE WHEN len(bnd) > 0 AND bnd[-1] = nt THEN bnd
        |         ELSE list_append(bnd, nt) END AS bnd2
        |  FROM bd),
        |c AS (
        |  SELECT doc_id, unnest(generate_series(1, len(bnd2))) AS ci, ts, bnd2
        |  FROM fb),
        |ck AS (
        |  SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
        |    array_to_string(ts[CASE WHEN ci = 1 THEN 1 ELSE bnd2[ci-1] + 1 END : bnd2[ci]], ' ') AS chunk
        |  FROM c),
        |app0 AS (
        |  SELECT doc_id, chunk_idx, array_to_string(list_transform(
        |    regexp_extract_all(chunk, '[^ \\t\\n\\f\\r]+'),
        |    w -> regexp_replace(lower(hex(w)), '(..)', '{\\1} ', 'g')), '/ ') AS s
        |  FROM ck),
        |${bpeAppsSql(6, "doc_id, chunk_idx")}
        |syms AS (SELECT doc_id, chunk_idx,
        |    unnest(regexp_extract_all(s, '\\{([^}]*)\\}', 1)) AS sy FROM app6),
        |tid AS (SELECT doc_id, chunk_idx,
        |    CASE WHEN length(sy) = 2 THEN CAST('0x' || sy AS INT) ELSE vcb.id END AS tid
        |  FROM syms LEFT JOIN vcb ON vcb.s = sy),
        |idsum AS (SELECT doc_id, chunk_idx, CAST(SUM(tid) AS BIGINT) AS ids_sum
        |          FROM tid GROUP BY 1, 2),
        |cnt AS (SELECT a.doc_id, a.chunk_idx,
        |    CAST(length(a.s) - length(replace(a.s, '{', '')) AS INT) AS n_ids,
        |    COALESCE(idsum.ids_sum, 0) AS ids_sum
        |  FROM app6 a LEFT JOIN idsum USING (doc_id, chunk_idx)),
        |j AS (SELECT cnt.doc_id, cnt.chunk_idx, cnt.n_ids, cnt.ids_sum, d.lang
        |      FROM cnt JOIN documents d USING (doc_id)),
        |r AS (
        |  SELECT lang, n_ids, ids_sum,
        |    row_number() OVER (PARTITION BY lang ORDER BY doc_id, chunk_idx) AS rk
        |  FROM j),
        |f(lang, rk, n_ids, ids_sum, pack_id, fill) AS (
        |  SELECT lang, rk, n_ids, ids_sum, CAST(0 AS BIGINT), CAST(n_ids AS BIGINT)
        |  FROM r WHERE rk = 1
        |  UNION ALL
        |  SELECT r.lang, r.rk, r.n_ids, r.ids_sum,
        |    CASE WHEN f.fill + r.n_ids > 512 THEN f.pack_id + 1 ELSE f.pack_id END,
        |    CASE WHEN f.fill + r.n_ids > 512 THEN CAST(r.n_ids AS BIGINT)
        |         ELSE f.fill + r.n_ids END
        |  FROM r JOIN f ON r.lang = f.lang AND r.rk = f.rk + 1)
        |SELECT lang, pack_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(n_ids) AS BIGINT) AS pack_ids,
        |  CAST(SUM(ids_sum) AS BIGINT) AS pack_ids_sum
        |FROM f GROUP BY lang, pack_id ORDER BY lang, pack_id""".stripMargin
  }

  private val enList = TextStats.stopwords("en").map(w => s"'$w'").mkString("[", ",", "]")
  private val esList = TextStats.stopwords("es").map(w => s"'$w'").mkString("[", ",", "]")
  private val deList = TextStats.stopwords("de").map(w => s"'$w'").mkString("[", ",", "]")

  /** x78's oracle, shared VERBATIM by x85 (both-trees seek serving)
    * and s14 (streaming dual-tree maintenance): written-tree reads are
    * exact, so the served hybrid is the same composition. */
  /** x87's oracle: the ENTIRE k-means|| training unrolled — md5-min
    * seed, two oversampling rounds (exact-integer HUGEINT threshold:
    * u·φ < l·2³²·d², l = 16 so l·2³² = 68719476736), attraction
    * weights, md5-min-16 Lloyd seed, two WEIGHTED fixed-point mean
    * rounds (the x25 integer-space convention with w-multiplied sums),
    * then the ivfProbe replay. Generated with a cosine helper — every
    * instance is the same sequential IEEE fold as x05/x25. */
  private val x87KmeansParSql: String = {
    def cos(a: String, b: String): String =
      s"list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])) / " +
        s"(sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $a[i]))) * " +
        s"sqrt(list_sum(list_transform(generate_series(1, len($b)), i -> $b[i] * $b[i]))))"
    def round_(r: Int): String = {
      val prev = s"k${r - 1}"
      s"""|m$r AS (SELECT e.vec_id, MAX(${cos("e.v", s"$prev.cv")}) AS mc FROM e, $prev GROUP BY e.vec_id),
          |d$r AS (SELECT vec_id, CAST(floor((1.0 - mc) * 1000000000.0) AS BIGINT) AS d2 FROM m$r),
          |p$r AS (SELECT CAST(SUM(d2) AS BIGINT) AS phi FROM d$r),
          |s$r AS (SELECT e.vec_id AS cand_id, e.v AS cv
          |  FROM d$r JOIN e USING (vec_id), p$r
          |  WHERE CAST(CAST('0x' || substr(md5('kpp:$r:' || CAST(d$r.vec_id AS VARCHAR)), 1, 8) AS UBIGINT) AS HUGEINT) * CAST(p$r.phi AS HUGEINT)
          |      < CAST(68719476736 AS HUGEINT) * CAST(d$r.d2 AS HUGEINT)),
          |k$r AS (SELECT cand_id, cv FROM $prev UNION ALL SELECT cand_id, cv FROM s$r),""".stripMargin
    }
    def lloyd(r: Int): String = {
      val prev = s"g${r - 1}"
      s"""|ga$r AS (SELECT cand_id, cid FROM (
          |    SELECT wc.cand_id, $prev.cid,
          |      row_number() OVER (PARTITION BY wc.cand_id ORDER BY ${cos("wc.cv", s"$prev.cv")} DESC, $prev.cid ASC) AS rk
          |    FROM wc, $prev) WHERE rk = 1),
          |g$r AS (SELECT cid, list(m ORDER BY pos) AS cv FROM (
          |    SELECT cid, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS m FROM (
          |      SELECT ga$r.cid, x.pos,
          |        2 * CAST(SUM(x.w * CAST(floor(x.vv * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + CAST(SUM(x.w) AS BIGINT) AS u,
          |        2 * CAST(SUM(x.w) AS BIGINT) AS n2
          |      FROM (SELECT cand_id, w, unnest(generate_series(1, len(cv))) AS pos, unnest(cv) AS vv FROM wc) x
          |      JOIN ga$r USING (cand_id)
          |      GROUP BY ga$r.cid, x.pos)) GROUP BY cid),""".stripMargin
    }
    s"""|WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |k0 AS (SELECT vec_id AS cand_id, v AS cv FROM e
        |       ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 1),
        |${round_(1)}
        |${round_(2)}
        |wa AS (SELECT vec_id, cand_id FROM (
        |    SELECT e.vec_id, k2.cand_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.v", "k2.cv")} DESC, k2.cand_id ASC) AS rk
        |    FROM e, k2) WHERE rk = 1),
        |wt AS (SELECT cand_id, CAST(COUNT(*) AS BIGINT) AS w FROM wa GROUP BY cand_id),
        |wc AS (SELECT k2.cand_id, k2.cv, wt.w FROM k2 JOIN wt USING (cand_id)),
        |g0 AS (SELECT cand_id AS cid, cv FROM wc
        |       ORDER BY md5(CAST(cand_id AS VARCHAR)) ASC, cand_id ASC LIMIT 16),
        |${lloyd(1)}
        |${lloyd(2)}
        |a AS (SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, g2.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.v", "g2.cv")} DESC, g2.cid ASC) AS rk
        |    FROM e, g2) WHERE rk = 1),
        |probe AS (SELECT cid FROM g2, q
        |  ORDER BY ${cos("g2.cv", "qv")} DESC, cid ASC LIMIT 4)
        |SELECT a.vec_id, round(${cos("a.v", "qv")}, 6) AS cos_sim
        |FROM a JOIN probe USING (cid), q
        |ORDER BY cos_sim DESC, vec_id ASC LIMIT 20""".stripMargin
  }

  private val x78HybridAnnSql: String =
      """WITH qdef(q_id, w, src_vec) AS (VALUES
        |  (1, 'hash', 0), (1, 'join', 0),
        |  (2, 'spark', 50), (2, 'vector', 50),
        |  (3, 'data', 100), (3, 'filter', 100), (3, 'stream', 100),
        |  (4, 'cache', 150), (4, 'data', 150)),
        |b2 AS (
        |  SELECT doc_id, len(ts) AS dl, ts FROM (
        |    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |    FROM documents)),
        |stats AS (SELECT COUNT(*) AS nd, SUM(dl) AS ntok FROM b2),
        |tf AS (
        |  SELECT doc_id, dl, w, COUNT(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(ts) AS w FROM b2)
        |  WHERE w IN (SELECT DISTINCT w FROM qdef)
        |  GROUP BY 1, 2, 3),
        |dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
        |bscored AS (
        |  SELECT t.doc_id, t.w,
        |    CAST(floor(
        |      ((ln(CAST(2 * s.nd - 2 * d.df + 1 AS DOUBLE) / CAST(2 * d.df + 1 AS DOUBLE))
        |        * (CAST(t.tf AS DOUBLE) * CAST(2.2 AS DOUBLE)))
        |       / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
        |          (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
        |           (CAST(t.dl * s.nd AS DOUBLE) / CAST(s.ntok AS DOUBLE)))))
        |      * 1000000000.0) AS BIGINT) AS sfix
        |  FROM tf t JOIN dfq d USING (w) CROSS JOIN stats s),
        |bagg AS (
        |  SELECT q.q_id, sc.doc_id, SUM(sc.sfix) AS score_fix
        |  FROM qdef q JOIN bscored sc USING (w)
        |  GROUP BY 1, 2),
        |tr AS (
        |  SELECT q_id, doc_id AS id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY score_fix DESC, doc_id ASC) AS text_rank
        |  FROM bagg QUALIFY text_rank <= 100),
        |e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 50 <> 0),
        |qs AS (
        |  SELECT DISTINCT d.q_id, CAST(e2.embedding AS DOUBLE[]) AS qv
        |  FROM qdef d JOIN embeddings e2 ON e2.vec_id = d.src_vec),
        |samp AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k,
        |    vec_id AS cid, v AS cv
        |  FROM e
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
        |asg AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT e.vec_id, samp.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * samp.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(samp.cv)), i -> samp.cv[i] * samp.cv[i])))) DESC,
        |        samp.cid ASC) AS rk
        |    FROM e, samp) WHERE rk = 1),
        |qprobe AS (
        |  SELECT q_id, cid FROM (
        |    SELECT qs.q_id, samp.cid,
        |      row_number() OVER (PARTITION BY qs.q_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(qs.qv)), i -> qs.qv[i] * samp.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(qs.qv)), i -> qs.qv[i] * qs.qv[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(samp.cv)), i -> samp.cv[i] * samp.cv[i])))) DESC,
        |        samp.cid ASC) AS rk
        |    FROM qs, samp) WHERE rk <= 4),
        |pruned AS (SELECT DISTINCT vec_id FROM asg JOIN qprobe USING (cid)),
        |jj AS (SELECT unnest(generate_series(0, 7)) AS j),
        |dist AS (
        |  SELECT e.vec_id, jj.j, samp.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (e.v[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]) *
        |      (e.v[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]))) AS dist
        |  FROM e JOIN pruned USING (vec_id), jj, samp),
        |codes AS (
        |  SELECT vec_id, j, k FROM dist
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, k) = 1),
        |qtab AS (
        |  SELECT qs.q_id, jj.j, samp.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (qs.qv[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]) *
        |      (qs.qv[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]))) AS dist
        |  FROM qs, jj, samp),
        |approx AS (
        |  SELECT qp.q_id, c.vec_id, list_sum(list(qt.dist ORDER BY c.j)) AS pq
        |  FROM qprobe qp
        |  JOIN asg ON asg.cid = qp.cid
        |  JOIN codes c ON c.vec_id = asg.vec_id
        |  JOIN qtab qt ON qt.q_id = qp.q_id AND qt.j = c.j AND qt.k = c.k
        |  GROUP BY qp.q_id, c.vec_id),
        |cand AS (
        |  SELECT q_id, vec_id, pq FROM approx
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY pq, vec_id) <= 300),
        |scored AS (
        |  SELECT cand.q_id, cand.vec_id, cand.pq,
        |    list_sum(list_transform(generate_series(1, len(e.v)), t ->
        |      (e.v[t] - qs.qv[t]) * (e.v[t] - qs.qv[t]))) AS l2
        |  FROM cand JOIN e USING (vec_id) JOIN qs USING (q_id)),
        |vr AS (
        |  SELECT q_id, vec_id AS id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY l2 ASC, vec_id ASC) AS vec_rank
        |  FROM scored QUALIFY vec_rank <= 100),
        |fused AS (
        |  SELECT COALESCE(tr.q_id, vr.q_id) AS q_id, COALESCE(tr.id, vr.id) AS id,
        |    tr.text_rank, vr.vec_rank,
        |    COALESCE(CAST(floor(1000000000000.0 / (CAST(tr.text_rank AS DOUBLE) + 60.0)) AS BIGINT), 0)
        |  + COALESCE(CAST(floor(1000000000000.0 / (CAST(vr.vec_rank AS DOUBLE) + 60.0)) AS BIGINT), 0) AS rrf_fix
        |  FROM tr FULL OUTER JOIN vr ON tr.q_id = vr.q_id AND tr.id = vr.id)
        |SELECT CAST(q_id AS BIGINT) AS q_id,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf_fix DESC, id ASC) AS INT) AS rank,
        |  id AS doc_id, text_rank, vec_rank,
        |  round(CAST(rrf_fix AS DOUBLE) / 1000000000000.0, 6) AS rrf, rrf_fix
        |FROM fused
        |QUALIFY rank <= 10
        |ORDER BY q_id, rank""".stripMargin

  /** The winnowing fingerprint chain up to `f` (doc_id, fp) — the
    * 4-gram 8-hex md5 hashes, window-of-8 minima (short-doc
    * one-fingerprint degeneration included), per-doc DISTINCT. Shared
    * by [[winnowingOverlapSql]] (the symmetric x141/x148/s33/s36
    * report) and the x152 seek oracle (the asymmetric query-vs-index
    * split) so a fix to the fingerprint arithmetic lands in every
    * consumer at once. */
  private val winnowingFpChainSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |n AS (SELECT doc_id, ts, len(ts) AS nt FROM t),
      |h AS (
      |  SELECT doc_id,
      |    CASE WHEN nt >= 4 THEN
      |      list_transform(generate_series(1, nt - 3), i ->
      |        CAST(CAST('0x' || substr(md5(array_to_string(ts[i:i+3], ' ')), 1, 8) AS UBIGINT) AS BIGINT))
      |    ELSE [] END AS hs
      |  FROM n),
      |wnd AS (
      |  SELECT doc_id,
      |    CASE WHEN len(hs) >= 8 THEN
      |      list_distinct(list_transform(generate_series(1, len(hs) - 7),
      |        j -> list_min(hs[j:j+7])))
      |    WHEN len(hs) >= 1 THEN [list_min(hs)]
      |    ELSE [] END AS fps
      |  FROM h),
      |f AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM wnd)""".stripMargin

  /** Winnowing overlap replay — the fingerprint chain, the df <= 50
    * stop-fingerprint cut, pair counts at >= 3. Shared by x141 (the
    * one-shot frame) and x148 (the written fp-bucketed tree after
    * compaction — the index row is a pure per-doc function of content,
    * so the tree read-back equals the one-shot frame). Fenced: f feeds
    * the df cut and both join sides. */
  private val winnowingOverlapSql: String = materializeCtes(
    winnowingFpChainSql + """,
      |kept AS (
      |  SELECT f.doc_id, f.fp FROM f
      |  JOIN (SELECT fp FROM f GROUP BY fp HAVING COUNT(*) <= 50) k USING (fp)),
      |p AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared_fps
      |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT a_id, b_id, CAST(shared_fps AS BIGINT) AS shared_fps
      |FROM p WHERE shared_fps >= 3 ORDER BY a_id, b_id""".stripMargin)

  /** Cross-source matrix replay — the x02 trigram-Jaccard chain, the
    * >= 0.5 cut, least/greatest source cell keys, pair counts and
    * distinct implicated docs per cell. Shared by x143 (the exact pair
    * step) and x149 (the MinHash-LSH → verify production pair step —
    * full-recall candidates, the x34 OpsSpec pin, make the verified
    * pair set equal the exact path's). Fenced: tri/lab feed multiple
    * consumers. */
  private val crossSourceDupSql: String = materializeCtes(
    """WITH tok AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |tri AS (
      |  SELECT DISTINCT doc_id, lang,
      |    unnest(list_transform(generate_series(1, len(ts) - 2),
      |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
      |  FROM tok),
      |nt AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
      |  FROM tri a JOIN tri b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |jp AS (
      |  SELECT a_id, b_id FROM pairs
      |  JOIN nt na ON a_id = na.doc_id JOIN nt nb ON b_id = nb.doc_id
      |  WHERE common * 1.0 / (na.n + nb.n - common) >= 0.5),
      |lab AS (
      |  SELECT least(da.source, db.source) AS src_a,
      |    greatest(da.source, db.source) AS src_b, a_id, b_id
      |  FROM jp
      |  JOIN documents da ON da.doc_id = a_id
      |  JOIN documents db ON db.doc_id = b_id),
      |np AS (SELECT src_a, src_b, COUNT(*) AS n_pairs FROM lab GROUP BY 1, 2),
      |nd AS (
      |  SELECT src_a, src_b, COUNT(*) AS n_docs FROM (
      |    SELECT DISTINCT src_a, src_b, unnest([a_id, b_id]) AS d FROM lab)
      |  GROUP BY 1, 2)
      |SELECT np.src_a, np.src_b, np.n_pairs, nd.n_docs
      |FROM np JOIN nd USING (src_a, src_b)
      |ORDER BY src_a, src_b""".stripMargin)

  /** The x118 CTE chain up to `iv` (doc_id, valid_from, valid_to,
    * text) — shared by x118/x123 (the full build; the apply law says
    * the folded history IS the full build) and x124 (the point-in-time
    * lookup joins against it). */
  private val scd2ChainSql: String =
      """WITH snaps AS (
        |  SELECT doc_id, v.v AS version,
        |    text || repeat('!', v.v // (1 + doc_id % 3)) AS text
        |  FROM documents, (SELECT unnest([0, 1, 2, 3]) AS v) v),
        |fp AS (
        |  SELECT doc_id, version, text,
        |    md5(concat_ws(chr(1), COALESCE(text, chr(0)))) AS fpv
        |  FROM snaps),
        |ch AS (
        |  SELECT doc_id, version, text, fpv,
        |    lag(fpv) OVER (PARTITION BY doc_id ORDER BY version) AS prev
        |  FROM fp),
        |st AS (
        |  SELECT doc_id, version, text FROM ch
        |  WHERE prev IS NULL OR fpv <> prev),
        |iv AS (
        |  SELECT doc_id, version AS valid_from,
        |    lead(version) OVER (PARTITION BY doc_id ORDER BY version)
        |      AS valid_to,
        |    text
        |  FROM st)""".stripMargin

  private val scd2HistorySql: String = scd2ChainSql +
      """
        |SELECT doc_id, valid_from, valid_to,
        |  valid_to IS NULL AS is_current, text
        |FROM iv
        |ORDER BY doc_id, valid_from""".stripMargin

  /** x130's oracle — the exact tri-gram pair path, component walk,
    * md5-of-cluster_id split — shared verbatim by x136 (the LSH-fed
    * production path yields the identical verified pair set). */
  private val x130SplitSql: String =
    """WITH RECURSIVE tok AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (
        |  SELECT DISTINCT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(ts) - 2),
        |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
        |  FROM tok),
        |nt AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
        |cand AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
        |  FROM tri a JOIN tri b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT a_id, b_id FROM cand
        |  JOIN nt na ON a_id = na.doc_id JOIN nt nb ON b_id = nb.doc_id
        |  WHERE common * 1.0 / (na.n + nb.n - common) >= 0.5),
        |edges AS (SELECT a_id AS u, b_id AS v FROM p UNION SELECT b_id, a_id FROM p),
        |walk(id, reach) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT w.id, e.v FROM walk w JOIN edges e ON w.reach = e.u),
        |comp AS (SELECT id AS doc_id, MIN(reach) AS cluster_id FROM walk GROUP BY id)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN CAST('0x' || substr(md5('split:' || CAST(cluster_id AS VARCHAR)), 1, 4) AS INT) < 3277 THEN 'val'
        |       WHEN CAST('0x' || substr(md5('split:' || CAST(cluster_id AS VARCHAR)), 1, 4) AS INT) < 6554 THEN 'test'
        |       ELSE 'train' END AS split
        |FROM comp ORDER BY doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "x30_gopher_quality" ->
      """WITH tok AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bi AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 1),
        |    i -> ts[i] || ' ' || ts[i+1])) AS g
        |  FROM tok),
        |bc AS (SELECT doc_id, g, COUNT(*) AS n FROM bi GROUP BY 1, 2),
        |frac AS (
        |  SELECT doc_id, round(MAX(n) * 1.0 / SUM(n), 6) AS top_bigram_frac
        |  FROM bc GROUP BY doc_id),
        |stats AS (
        |  SELECT doc_id, len(ts) AS n_words,
        |    round(len(replace(text, ' ', '')) * 1.0 / len(ts), 6) AS mean_word_len,
        |    round(len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / len(text), 6) AS digit_ratio
        |  FROM tok)
        |SELECT s.doc_id, s.n_words, s.mean_word_len, s.digit_ratio, f.top_bigram_frac,
        |  (s.n_words >= 10 AND s.mean_word_len <= 12 AND s.digit_ratio <= 0.2
        |   AND f.top_bigram_frac <= 0.2) AS passes
        |FROM stats s JOIN frac f ON s.doc_id = f.doc_id
        |ORDER BY s.doc_id""".stripMargin,

    "x31_label_centroids" ->
      """WITH pe AS (
        |  SELECT label, unnest(generate_series(0, len(embedding) - 1)) AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |dims AS (
        |  SELECT label, pos, COUNT(*) AS n,
        |    round(CAST(SUM(CAST(v AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS m
        |  FROM pe GROUP BY label, pos)
        |SELECT label, MAX(n) AS n_vectors,
        |  round(sqrt(CAST(SUM(CAST(m * m AS DECIMAL(38,12))) AS DOUBLE)), 6) AS centroid_norm,
        |  MAX(CASE WHEN pos = 0 THEN m END) AS centroid_d0
        |FROM dims GROUP BY label ORDER BY label""".stripMargin,

    "x32_token_histogram" ->
      """SELECT CAST(LEAST(FLOOR(len(string_split(text, ' ')) / 50), 19) AS BIGINT) AS bucket,
        |  COUNT(*) AS n_docs,
        |  MIN(len(string_split(text, ' '))) AS min_tokens,
        |  MAX(len(string_split(text, ' '))) AS max_tokens
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,

    "x33_bloom_join" ->
      """SELECT o_orderpriority, COUNT(*) AS order_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "x01_dedup_exact" ->
      """SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS dup_cnt
        |FROM documents GROUP BY text ORDER BY fp""".stripMargin,

    "x02_ngram_jaccard_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (
        |  SELECT DISTINCT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(ts) - 2),
        |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
        |  FROM tok),
        |nt AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
        |  FROM tri a JOIN tri b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id, common, na.n AS na, nb.n AS nb,
        |       common * 1.0 / (na.n + nb.n - common) AS jac
        |FROM pairs JOIN nt na ON a_id = na.doc_id JOIN nt nb ON b_id = nb.doc_id
        |WHERE common * 1.0 / (na.n + nb.n - common) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,

    "x05_cosine_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0)
        |SELECT vec_id,
        |  round(
        |    list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * qv[i])) /
        |    (sqrt(list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * v[i]))) *
        |     sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))),
        |  6) AS cos_sim
        |FROM e, q
        |ORDER BY cos_sim DESC, vec_id ASC LIMIT 20""".stripMargin,

    // JL projection replay: the 16×64 plane matrix re-derives from md5
    // (integer-exact), each projected coordinate is the same sequential
    // IEEE fold as the signature dots (list_sum ≡ the codegen'd
    // aggregate's order), and the projected-space cosine is x05's
    // arithmetic over the 16-dim lists.
    "x86_random_projection_topk" ->
      """WITH h AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |    d -> (CAST('0x' || substr(md5('rhp:' || CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS UBIGINT) % 2000001) / 1000000.0 - 1.0) AS hv
        |  FROM generate_series(0, 15) t(b)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
        |ep AS (
        |  SELECT e.vec_id,
        |    list(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * h.hv[i])) ORDER BY h.b) AS p
        |  FROM e, h GROUP BY e.vec_id),
        |qp AS (
        |  SELECT list(list_sum(list_transform(generate_series(1, 64), i -> q.v[i] * h.hv[i])) ORDER BY h.b) AS p
        |  FROM q, h)
        |SELECT ep.vec_id,
        |  round(
        |    list_sum(list_transform(generate_series(1, 16), i -> ep.p[i] * qp.p[i])) /
        |    (sqrt(list_sum(list_transform(generate_series(1, 16), i -> ep.p[i] * ep.p[i]))) *
        |     sqrt(list_sum(list_transform(generate_series(1, 16), i -> qp.p[i] * qp.p[i])))),
        |  6) AS cos_sim
        |FROM ep, qp
        |ORDER BY cos_sim DESC, vec_id ASC LIMIT 20""".stripMargin,

    // Reduce-then-index replay: x86's projection CTEs, then x15's IVF
    // chain run over the PROJECTED lists (sample, argmax assignment,
    // probe), then the rerank joins back the ORIGINAL vectors with
    // x05's cosine arithmetic.
    "x89_projected_ivf_topk" ->
      """WITH h AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |    d -> (CAST('0x' || substr(md5('rhp:' || CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS UBIGINT) % 2000001) / 1000000.0 - 1.0) AS hv
        |  FROM generate_series(0, 15) t(b)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
        |ep AS (
        |  SELECT e.vec_id,
        |    list(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * h.hv[i])) ORDER BY h.b) AS p
        |  FROM e, h GROUP BY e.vec_id),
        |qp AS (
        |  SELECT list(list_sum(list_transform(generate_series(1, 64), i -> q.v[i] * h.hv[i])) ORDER BY h.b) AS p
        |  FROM q, h),
        |c0 AS (SELECT vec_id AS cid, p AS cv FROM ep
        |       ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
        |asg AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT ep.vec_id, c0.cid,
        |      row_number() OVER (PARTITION BY ep.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, 16), i -> ep.p[i] * c0.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, 16), i -> ep.p[i] * ep.p[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, 16), i -> c0.cv[i] * c0.cv[i])))) DESC,
        |        c0.cid ASC) AS rk
        |    FROM ep, c0) WHERE rk = 1),
        |probe AS (
        |  SELECT cid FROM c0, qp
        |  ORDER BY
        |    list_sum(list_transform(generate_series(1, 16), i -> c0.cv[i] * qp.p[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, 16), i -> c0.cv[i] * c0.cv[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, 16), i -> qp.p[i] * qp.p[i])))) DESC,
        |    cid ASC LIMIT 4)
        |SELECT e.vec_id,
        |  round(
        |    list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * q.v[i])) /
        |    (sqrt(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * e.v[i]))) *
        |     sqrt(list_sum(list_transform(generate_series(1, 64), i -> q.v[i] * q.v[i])))),
        |  6) AS cos_sim
        |FROM asg JOIN probe USING (cid) JOIN e USING (vec_id), q
        |ORDER BY cos_sim DESC, vec_id ASC LIMIT 20""".stripMargin,

    // Full oracle of the ANN approximation itself: the hyperplane matrix is
    // md5-derived (see VectorFunctions.rhpPlanes), integer-exact in both
    // engines; projections/cosines are the same sequential IEEE folds as
    // x05's (list_sum == the codegen'd dot's accumulation order); the
    // signature pack is integer arithmetic, so no order sensitivity.
    "x06_ann_lsh_topk" ->
      """WITH h AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |    d -> (CAST('0x' || substr(md5('rhp:' || CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS UBIGINT) % 2000001) / 1000000.0 - 1.0) AS hv
        |  FROM generate_series(0, 15) t(b)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |sig AS (
        |  SELECT vec_id, CAST(SUM(CASE WHEN
        |      list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * hv[i])) > 0
        |    THEN 1 << (15 - b) ELSE 0 END) AS BIGINT) AS sig
        |  FROM e, h GROUP BY vec_id),
        |qsig AS (
        |  SELECT CAST(SUM(CASE WHEN
        |      list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * hv[i])) > 0
        |    THEN 1 << (15 - b) ELSE 0 END) AS BIGINT) AS qs
        |  FROM q, h)
        |SELECT e.vec_id,
        |  round(
        |    list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * qv[i])) /
        |    (sqrt(list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * v[i]))) *
        |     sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))),
        |  6) AS cos_sim
        |FROM e JOIN sig USING (vec_id), q, qsig
        |WHERE bit_count(xor(sig.sig, qsig.qs)) <= 8
        |ORDER BY cos_sim DESC, vec_id ASC LIMIT 20""".stripMargin,

    // Full oracle of the IVF approximation: md5-ordered centroid sample,
    // per-row argmax assignment (row_number == the Spark fold's strict->
    // lower-id tiebreak given bit-identical scores), nProbe=4 probe, exact
    // rescoring of candidate lists only.
    "x15_ivf_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
        |scored AS (
        |  SELECT e.vec_id, e.v, c.cid,
        |    list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c.cv[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, len(c.cv)), i -> c.cv[i] * c.cv[i])))) AS s
        |  FROM e, c),
        |assigned AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT vec_id, v, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rk
        |    FROM scored) WHERE rk = 1),
        |probe AS (
        |  SELECT cid FROM c, q
        |  ORDER BY
        |    list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * qv[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * cv[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))) DESC,
        |    cid ASC LIMIT 4)
        |SELECT a.vec_id,
        |  round(
        |    list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * qv[i])) /
        |    (sqrt(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i]))) *
        |     sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))),
        |  6) AS cos_sim
        |FROM assigned a JOIN probe USING (cid), q
        |ORDER BY cos_sim DESC, vec_id ASC LIMIT 20""".stripMargin,

    // Batch BM25 replay: x64's tf/df/stats/score arithmetic over the
    // UNION of the four queries' terms, then each query sums its own
    // terms' fixed scores (the per-(doc, term) score is query-
    // independent) and ranks within itself.
    "x76_bm25_serve" -> x76Bm25ServeSql,

    // x81 incremental BM25 model: postings/df/stats are exact
    // re-aggregatable counts and the score is a pure function of them,
    // so serving the MERGED (static ⊕ appended) model ≡ serving the
    // rebuilt whole-corpus model — x76's SQL IS the oracle (the
    // x70/x73/x79 law applied to text).
    "x81_bm25_incremental" -> x76Bm25ServeSql,

    // x82 index-seek serving: bucket pruning keeps every matching-term
    // row, so serving from the written bucketed tree ≡ the whole-corpus
    // scan serve — x76's SQL verbatim again.
    "x82_bm25_seek" -> x76Bm25ServeSql,

    // x84 compaction: exact counts fold, so the compacted tree serves
    // exactly what the rebuilt whole-corpus model serves — x76's SQL
    // verbatim (the x79 law on the text side).
    "x84_bm25_compact" -> x76Bm25ServeSql,

    // x85 fully-deployed hybrid: both written trees serve exactly what
    // the in-memory model serves (bucket pruning keeps every
    // matching-term row; the probed-cell filter is a superset of every
    // query's cells) — x78's SQL verbatim.
    "x85_hybrid_seek" -> x78HybridAnnSql,

    // x88 packed tree: the byte pack/unpack is an exact integer
    // bijection (spec-pinned), so the packed tree serves exactly what
    // the unpacked tree serves — x78's SQL verbatim again.
    "x88_hybrid_seek_packed" -> x78HybridAnnSql,

    // Batch hybrid replay: x76's text chain + per-query rounded-cosine
    // ranks over one corpus pass + x65's floor-of-one-IEEE-division
    // fusion, all partitioned by query.
    "x77_hybrid_serve" ->
      """WITH qdef(q_id, w, src_vec) AS (VALUES
        |  (1, 'hash', 0), (1, 'join', 0),
        |  (2, 'spark', 50), (2, 'vector', 50),
        |  (3, 'data', 100), (3, 'filter', 100), (3, 'stream', 100),
        |  (4, 'cache', 150), (4, 'data', 150)),
        |b2 AS (
        |  SELECT doc_id, len(ts) AS dl, ts FROM (
        |    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |    FROM documents)),
        |stats AS (SELECT COUNT(*) AS nd, SUM(dl) AS ntok FROM b2),
        |tf AS (
        |  SELECT doc_id, dl, w, COUNT(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(ts) AS w FROM b2)
        |  WHERE w IN (SELECT DISTINCT w FROM qdef)
        |  GROUP BY 1, 2, 3),
        |dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
        |bscored AS (
        |  SELECT t.doc_id, t.w,
        |    CAST(floor(
        |      ((ln(CAST(2 * s.nd - 2 * d.df + 1 AS DOUBLE) / CAST(2 * d.df + 1 AS DOUBLE))
        |        * (CAST(t.tf AS DOUBLE) * CAST(2.2 AS DOUBLE)))
        |       / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
        |          (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
        |           (CAST(t.dl * s.nd AS DOUBLE) / CAST(s.ntok AS DOUBLE)))))
        |      * 1000000000.0) AS BIGINT) AS sfix
        |  FROM tf t JOIN dfq d USING (w) CROSS JOIN stats s),
        |bagg AS (
        |  SELECT q.q_id, sc.doc_id, SUM(sc.sfix) AS score_fix
        |  FROM qdef q JOIN bscored sc USING (w)
        |  GROUP BY 1, 2),
        |tr AS (
        |  SELECT q_id, doc_id AS id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY score_fix DESC, doc_id ASC) AS text_rank
        |  FROM bagg QUALIFY text_rank <= 100),
        |qv AS (SELECT DISTINCT d.q_id, CAST(e.embedding AS DOUBLE[]) AS qv
        |       FROM qdef d JOIN embeddings e ON e.vec_id = d.src_vec),
        |ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |vr AS (
        |  SELECT q_id, vec_id AS id, vec_rank FROM (
        |    SELECT qv.q_id, ev.vec_id,
        |      row_number() OVER (PARTITION BY qv.q_id ORDER BY
        |        round(
        |          list_sum(list_transform(generate_series(1, len(ev.v)), i -> ev.v[i] * qv.qv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(ev.v)), i -> ev.v[i] * ev.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(qv.qv)), i -> qv.qv[i] * qv.qv[i])))),
        |        6) DESC, ev.vec_id ASC) AS vec_rank
        |    FROM ev, qv) WHERE vec_rank <= 100),
        |fused AS (
        |  SELECT COALESCE(tr.q_id, vr.q_id) AS q_id, COALESCE(tr.id, vr.id) AS id,
        |    tr.text_rank, vr.vec_rank,
        |    COALESCE(CAST(floor(1000000000000.0 / (CAST(tr.text_rank AS DOUBLE) + 60.0)) AS BIGINT), 0)
        |  + COALESCE(CAST(floor(1000000000000.0 / (CAST(vr.vec_rank AS DOUBLE) + 60.0)) AS BIGINT), 0) AS rrf_fix
        |  FROM tr FULL OUTER JOIN vr ON tr.q_id = vr.q_id AND tr.id = vr.id)
        |SELECT CAST(q_id AS BIGINT) AS q_id,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf_fix DESC, id ASC) AS INT) AS rank,
        |  id AS doc_id, text_rank, vec_rank,
        |  round(CAST(rrf_fix AS DOUBLE) / 1000000000000.0, 6) AS rrf, rrf_fix
        |FROM fused
        |QUALIFY rank <= 10
        |ORDER BY q_id, rank""".stripMargin,

    // ANN-composed hybrid replay: x76's text chain (QUALIFY ≤ kCand) ⊕
    // x75's IVF×PQ serving chain (corpus = vec_id % 50 <> 0, queries
    // from qdef's source vectors, ADC cut ≤ refine·kCand, l2-rerank
    // ranks ≤ kCand) + x65's floor-of-one-IEEE-division fusion.
    "x78_hybrid_serve_ann" -> x78HybridAnnSql,

    // Embedding-pipeline replay: x42's banding → verify → components
    // chain picks the min-id survivors, then x75's serve chain runs with
    // corpus, queries, centroid sample AND codebook all drawn from the
    // survivor set — stage N's CTEs consume stage N−1's exactly as the
    // Spark plan chains.
    "p03_pipeline_embed_serve" ->
      """WITH RECURSIVE h AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |    d -> (CAST('0x' || substr(md5('rhp:' || CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS UBIGINT) % 2000001) / 1000000.0 - 1.0) AS hv
        |  FROM generate_series(0, 127) t(b)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |bits AS (
        |  SELECT e.vec_id, CAST(h.b // 8 AS INT) AS j,
        |    CASE WHEN list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * hv[i])) > 0
        |      THEN CAST(1 << (7 - (h.b % 8)) AS BIGINT) ELSE 0 END AS bit
        |  FROM e, h),
        |bands AS (SELECT vec_id, j, SUM(bit) AS bv FROM bits GROUP BY vec_id, j),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM bands a JOIN bands b ON a.j = b.j AND a.bv = b.bv AND a.vec_id < b.vec_id),
        |n AS (SELECT vec_id, sqrt(list_sum(list_transform(generate_series(1, len(v)), i -> v[i]*v[i]))) AS nrm FROM e),
        |p AS (
        |  SELECT a_id, b_id
        |  FROM cand
        |  JOIN e ea ON ea.vec_id = a_id JOIN e eb ON eb.vec_id = b_id
        |  JOIN n na ON na.vec_id = a_id JOIN n nb ON nb.vec_id = b_id
        |  WHERE round(list_sum(list_transform(generate_series(1, len(ea.v)), i -> ea.v[i] * eb.v[i])) / (na.nrm * nb.nrm), 6) >= 0.45),
        |edges AS (SELECT a_id AS u, b_id AS w FROM p UNION SELECT b_id, a_id FROM p),
        |walk(id, reach) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT wk.id, ed.w FROM walk wk JOIN edges ed ON wk.reach = ed.u),
        |keptset AS (
        |  SELECT id AS vec_id FROM (
        |    SELECT id, MIN(reach) AS mr FROM walk GROUP BY id) WHERE mr = id),
        |e2 AS (SELECT e.vec_id, e.v FROM e JOIN keptset USING (vec_id)
        |       WHERE vec_id % 50 <> 0),
        |qs AS (SELECT e.vec_id AS q_id, e.v AS qv FROM e JOIN keptset USING (vec_id)
        |       WHERE vec_id % 50 = 0),
        |samp AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k,
        |    vec_id AS cid, v AS cv
        |  FROM e2
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
        |asg AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT e2.vec_id, samp.cid,
        |      row_number() OVER (PARTITION BY e2.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e2.v)), i -> e2.v[i] * samp.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e2.v)), i -> e2.v[i] * e2.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(samp.cv)), i -> samp.cv[i] * samp.cv[i])))) DESC,
        |        samp.cid ASC) AS rk
        |    FROM e2, samp) WHERE rk = 1),
        |qprobe AS (
        |  SELECT q_id, cid FROM (
        |    SELECT qs.q_id, samp.cid,
        |      row_number() OVER (PARTITION BY qs.q_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(qs.qv)), i -> qs.qv[i] * samp.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(qs.qv)), i -> qs.qv[i] * qs.qv[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(samp.cv)), i -> samp.cv[i] * samp.cv[i])))) DESC,
        |        samp.cid ASC) AS rk
        |    FROM qs, samp) WHERE rk <= 4),
        |pruned AS (SELECT DISTINCT vec_id FROM asg JOIN qprobe USING (cid)),
        |jj AS (SELECT unnest(generate_series(0, 7)) AS j),
        |dist AS (
        |  SELECT e2.vec_id, jj.j, samp.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (e2.v[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]) *
        |      (e2.v[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]))) AS dist
        |  FROM e2 JOIN pruned USING (vec_id), jj, samp),
        |codes AS (
        |  SELECT vec_id, j, k FROM dist
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, k) = 1),
        |qtab AS (
        |  SELECT qs.q_id, jj.j, samp.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (qs.qv[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]) *
        |      (qs.qv[jj.j * 8 + t] - samp.cv[jj.j * 8 + t]))) AS dist
        |  FROM qs, jj, samp),
        |approx AS (
        |  SELECT qp.q_id, c.vec_id, list_sum(list(qt.dist ORDER BY c.j)) AS pq
        |  FROM qprobe qp
        |  JOIN asg ON asg.cid = qp.cid
        |  JOIN codes c ON c.vec_id = asg.vec_id
        |  JOIN qtab qt ON qt.q_id = qp.q_id AND qt.j = c.j AND qt.k = c.k
        |  GROUP BY qp.q_id, c.vec_id),
        |cand2 AS (
        |  SELECT q_id, vec_id, pq FROM approx
        |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY pq, vec_id) <= 15),
        |scored AS (
        |  SELECT cand2.q_id, cand2.vec_id, cand2.pq,
        |    list_sum(list_transform(generate_series(1, len(e2.v)), t ->
        |      (e2.v[t] - qs.qv[t]) * (e2.v[t] - qs.qv[t]))) AS l2
        |  FROM cand2 JOIN e2 USING (vec_id) JOIN qs USING (q_id))
        |SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY l2 ASC, vec_id ASC) AS INT) AS rank,
        |  vec_id, round(pq, 6) AS pq_dist, round(l2, 6) AS l2_dist
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY q_id, rank""".stripMargin,

    // Batch IVF×PQ serving replay: x58's chain generalized over the
    // query TABLE — per-query probe ranks (row_number over q × samp),
    // codes over the UNION of probed cells, per-(query, j, k) ADC
    // tables, the ordered-by-j group sum, per-query cut and rerank.
    // The chain up to `srv` is shared with x146's recall audit.
    "x75_ivfpq_serve" ->
      (ivfPqServeChainSql + """
        |SELECT q_id, rank, vec_id, round(pq, 6) AS pq_dist,
        |  round(l2, 6) AS l2_dist
        |FROM srv ORDER BY q_id, rank""".stripMargin),

    // ANN recall audit replay: the full x75 serve chain, the exact
    // brute-force per-query L2 top-5 over the same corpus/queries, the
    // (q_id, vec_id) intersection counts, zero-hit queries kept by the
    // left join. Integers only in the output.
    "x146_ann_recall_report" -> (ivfPqServeChainSql + recallTailSql),

    "x155_ann_recall_cost_ladder" -> materializeCtes(x155LadderSql),

    // Banded-ladder replay: per distinct bandBits one plane/band/
    // collision chain (min band index per pair), per dial the slice +
    // rescore + recall/candidate tails, shared exact ground truth.
    // Fenced: e/qs/exactc/fb* feed many consumers.
    "x162_ann_banded_ladder" -> materializeCtes(x162BandLadderSql),

    // Projected-ladder replay: the x151 chain with the probe ranked to
    // the widest dial, per-dial member slices + rounded-cosine rescore
    // + recall/candidate tails. Fenced: ep/qp/c0/asg/qpr/exactc feed
    // many consumers.
    "x163_ann_projected_ladder" -> materializeCtes(x163ProjLadderSql),

    // Residual-ladder replay: the sampled-residual x154 chain with the
    // probe ranked, codes over the widest dial's pruned members,
    // per-dial ADC slice/cut/rerank + recall/candidate tails. Fenced:
    // asg/qpr/rv/rcb0/codes/qtab/exact feed many consumers.
    "x164_ann_residual_ladder" -> materializeCtes(x164ResidLadderSql),

    "x158_dedup_rate_ladder" -> x158DedupLadderSql,

    "x160_pack_capacity_ladder" -> x160PackLadderSql,

    // Trained-index recall replay: x71's two training chains (the
    // coarse Lloyd rounds and the per-subspace PQ k-means, fixed-point
    // centroid means and all) re-pointed at the x146 corpus/query
    // split, the probe/ADC/rerank threaded by q_id, then the same
    // exact + intersection tail as x146. Fenced: the Lloyd chain is
    // re-referenced by assignment AND probe, the PQ chain by codes AND
    // the ADC tables — materialization keeps each round evaluated once.
    "x147_ann_recall_trained" ->
      materializeCtes(ivfPqTrainedServeChainSql + recallTailSql),

    // Projected-index recall replay: the x89 chain threaded by q_id
    // (projection folds, md5 sample, argmax assignment, per-query
    // probe, original-space rounded-cosine rerank), then the exact
    // cosine top-5 + intersection tail — the metric this family ranks
    // by. Fenced: ep feeds the sample and the assignment, e/qs feed
    // projection, rerank and the exact side.
    "x151_ann_recall_projected" ->
      materializeCtes(projectedServeChainSql + recallTailCosineSql),

    // Banded-index recall replay: the x45 banding chain (both sides
    // banded by the same md5 planes, (j, bv) candidates, per-query
    // rounded-cosine top-5), then the exact cosine + intersection
    // tail; queries with zero band collisions survive as recall-0 rows
    // through the tail's left join. Fenced: bands/e/qs feed multiple
    // consumers.
    "x153_ann_recall_banded" ->
      materializeCtes(bandedServeChainSql + recallTailCosineSql),

    // Residual-index recall replay: x80's trained-residual chain (the
    // two fixed-point PQ rounds over the residual frame) threaded by
    // q_id — per-query probe LIMIT 6, per-(query, cell) residual ADC
    // tables, cut ≤ 40, exact-L2 rerank — then the shared exact +
    // intersection tail. Fenced: rv feeds the codebook rounds, codes
    // and sample; e/qs feed assignment, rerank and the exact side.
    "x154_ann_recall_residual" ->
      materializeCtes(residualServeChainSql + recallTailSql),

    // Hierarchical IVF replay: x15's sample + probe + rescore with the
    // assignment split into the two routed argmax levels — super sample
    // (md5 over the centroid ids), nearest-super grouping of centroids,
    // per-row best super then best child within it, every level ties to
    // the lower id.
    "x74_ivf_hier_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
        |ss AS (SELECT cid AS super_id, cv AS sv FROM c
        |       ORDER BY md5(CAST(cid AS VARCHAR)) ASC, cid ASC LIMIT 4),
        |grp AS (
        |  SELECT cid, cv, super_id FROM (
        |    SELECT c.cid, c.cv, ss.super_id,
        |      row_number() OVER (PARTITION BY c.cid ORDER BY
        |        list_sum(list_transform(generate_series(1, len(c.cv)), i -> c.cv[i] * ss.sv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(c.cv)), i -> c.cv[i] * c.cv[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(ss.sv)), i -> ss.sv[i] * ss.sv[i])))) DESC,
        |        ss.super_id ASC) AS rk
        |    FROM c, ss) WHERE rk = 1),
        |rs AS (
        |  SELECT vec_id, v, super_id FROM (
        |    SELECT e.vec_id, e.v, ss.super_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * ss.sv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(ss.sv)), i -> ss.sv[i] * ss.sv[i])))) DESC,
        |        ss.super_id ASC) AS rk
        |    FROM e, ss) WHERE rk = 1),
        |assigned AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT rs.vec_id, rs.v, g.cid,
        |      row_number() OVER (PARTITION BY rs.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(rs.v)), i -> rs.v[i] * g.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(rs.v)), i -> rs.v[i] * rs.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(g.cv)), i -> g.cv[i] * g.cv[i])))) DESC,
        |        g.cid ASC) AS rk
        |    FROM rs JOIN grp g ON g.super_id = rs.super_id) WHERE rk = 1),
        |probe AS (
        |  SELECT cid FROM c, q
        |  ORDER BY
        |    list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * qv[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * cv[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))) DESC,
        |    cid ASC LIMIT 4)
        |SELECT a.vec_id,
        |  round(
        |    list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * qv[i])) /
        |    (sqrt(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i]))) *
        |     sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))),
        |  6) AS cos_sim
        |FROM assigned a JOIN probe USING (cid), q
        |ORDER BY cos_sim DESC, vec_id ASC LIMIT 20""".stripMargin,

    // Full oracle of the k-means IVF: replays both Lloyd rounds — md5
    // init sample, argmax assignment, FIXED-POINT means (floor(v·1e6+0.5)
    // long sums; 6-dp mean as floor((2s+n)/(2n)) in INTEGER space — the
    // remainder subtraction makes the numerator exactly divisible, so no
    // engine's round()/division convention enters) — then the nProbe=4
    // probe and exact rescoring. Identical 6-dp centroid values →
    // bit-identical cosine folds → same assignment, probe and top-k.
    "x25_ivf_kmeans_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |c0 AS (SELECT vec_id AS cid, v AS cv FROM e
        |       ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
        |a1 AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c0.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c0.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(c0.cv)), i -> c0.cv[i] * c0.cv[i])))) DESC,
        |        c0.cid ASC) AS rk
        |    FROM e, c0) WHERE rk = 1),
        |c1 AS (
        |  SELECT cid, list(m ORDER BY pos) AS cv FROM (
        |    SELECT cid, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS m FROM (
        |      SELECT cid, pos,
        |        2 * CAST(SUM(CAST(floor(vv * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM (SELECT cid, unnest(generate_series(1, len(v))) AS pos, unnest(v) AS vv FROM a1)
        |      GROUP BY cid, pos)) GROUP BY cid),
        |a2 AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c1.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c1.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(c1.cv)), i -> c1.cv[i] * c1.cv[i])))) DESC,
        |        c1.cid ASC) AS rk
        |    FROM e, c1) WHERE rk = 1),
        |c2 AS (
        |  SELECT cid, list(m ORDER BY pos) AS cv FROM (
        |    SELECT cid, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS m FROM (
        |      SELECT cid, pos,
        |        2 * CAST(SUM(CAST(floor(vv * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM (SELECT cid, unnest(generate_series(1, len(v))) AS pos, unnest(v) AS vv FROM a2)
        |      GROUP BY cid, pos)) GROUP BY cid),
        |a3 AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c2.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c2.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(c2.cv)), i -> c2.cv[i] * c2.cv[i])))) DESC,
        |        c2.cid ASC) AS rk
        |    FROM e, c2) WHERE rk = 1),
        |probe AS (
        |  SELECT cid FROM c2, q
        |  ORDER BY
        |    list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * qv[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * cv[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))) DESC,
        |    cid ASC LIMIT 4)
        |SELECT a.vec_id,
        |  round(
        |    list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * qv[i])) /
        |    (sqrt(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i]))) *
        |     sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))),
        |  6) AS cos_sim
        |FROM a3 a JOIN probe USING (cid), q
        |ORDER BY cos_sim DESC, vec_id ASC LIMIT 20""".stripMargin,

    // k-means|| replay: the whole derandomized training chain (see the
    // x87KmeansParSql scaladoc) — any drift in any round, weight or
    // mean moves centroids and flips the served top-20.
    "x87_ivf_kmeanspar_topk" -> x87KmeansParSql,

    "x07_embedding_near_dups" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |    round(
        |      list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, len(b.v)), i -> b.v[i] * b.v[i])))),
        |    6) AS cos_sim
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT a_id, b_id, cos_sim FROM p WHERE cos_sim >= 0.45
        |ORDER BY a_id, b_id""".stripMargin,

    "x08_lang_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |  round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "x09_text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS len,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS n_tokens,
        |  round(CAST(length(text) - length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)
        |        / NULLIF(len(list_filter(string_split(text, ' '), t -> t <> '')), 0), 6) AS avg_token_len,
        |  round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |        / NULLIF(length(text), 0), 6) AS alpha_ratio,
        |  round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
        |        / NULLIF(length(text), 0), 6) AS digit_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x10_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x11_source_token_stats" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS total_tokens,
        |  CAST(MAX(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS INT) AS max_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "x29_bpeish_tokens" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Corpus-trained BPE: training rounds unrolled (pair counts, argmax,
    // replace pass — all exact integers and string rewrites), then the
    // application chain under the learned pairs.
    "x83_bpe_corpus_trained" -> x83BpeSql,

    "x157_bpe_corpus_trained_bytes" -> x157BpeBytesSql,

    // Trained-tokenizer production-lane replay: training rounds +
    // learned-pair application per CDC chunk + vocab id mint + the
    // pack recurrence — fenced (b1..b6/app6/vcb feed multiple
    // consumers; the recursive member is left alone).
    "x161_trained_tokenizer_pipeline" -> materializeCtes(x161TrainedPipelineSql),

    // Generated from the same merge table the engine applies: the chain
    // of replace() passes IS the BPE application, so hits and misses of
    // every merge replay identically.
    "x44_bpe_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS ws_tokens,
         |  CAST(length(s) - length(replace(s, '{', '')) AS INT) AS bpe_tokens
         |FROM (SELECT doc_id, text, ${graft.ops.Bpe.oracleSqlExpr("text")} AS s
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "x12_lang_guess" ->
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    len(list_intersect(list_distinct(list_filter(string_split(lower(text), ' '), t -> t <> '')), $enList)) AS s_en,
         |    len(list_intersect(list_distinct(list_filter(string_split(lower(text), ' '), t -> t <> '')), $esList)) AS s_es,
         |    len(list_intersect(list_distinct(list_filter(string_split(lower(text), ' '), t -> t <> '')), $deList)) AS s_de
         |  FROM documents)
         |SELECT lang_guess, COUNT(*) AS n FROM (
         |  SELECT CASE
         |    WHEN s_en = 0 AND s_es = 0 AND s_de = 0 THEN 'und'
         |    WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
         |    WHEN s_es >= s_de THEN 'es'
         |    ELSE 'de' END AS lang_guess
         |  FROM scored)
         |GROUP BY lang_guess ORDER BY lang_guess""".stripMargin,

    "x13_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        |  CAST(octet_length(encode(text)) % 480 AS INT) AS height,
        |  CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin,

    "x14_multimodal_decode" ->
      """SELECT doc_id AS media_id,
        |  CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin,

    // Connected components as a recursive reachability walk: reach(id) =
    // every vertex reachable over the exact-Jaccard>=0.5 edge set; the
    // component label is the min reachable id (same as Spark's min-label
    // propagation fixpoint).
    "x16_dedup_clusters" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (
        |  SELECT DISTINCT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(ts) - 2),
        |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
        |  FROM tok),
        |nt AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
        |cand AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
        |  FROM tri a JOIN tri b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT a_id, b_id FROM cand
        |  JOIN nt na ON a_id = na.doc_id JOIN nt nb ON b_id = nb.doc_id
        |  WHERE common * 1.0 / (na.n + nb.n - common) >= 0.5),
        |edges AS (SELECT a_id AS u, b_id AS v FROM p UNION SELECT b_id, a_id FROM p),
        |walk(id, reach) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT w.id, e.v FROM walk w JOIN edges e ON w.reach = e.u)
        |SELECT id AS doc_id, MIN(reach) AS cluster_id FROM walk
        |GROUP BY id ORDER BY doc_id""".stripMargin,

    "x17_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS nt FROM t WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, GREATEST(CAST(ceil((nt - 10) / 40.0) AS INT), 1) - 1)) AS ci
        |  FROM n)
        |SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
        |  array_to_string(toks[ci*40+1 : ci*40+50], ' ') AS chunk,
        |  CAST(len(toks[ci*40+1 : ci*40+50]) AS INT) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "x18_hash_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2')
        |ORDER BY doc_id""".stripMargin,

    "x36_sequence_packing" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS nt FROM t WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, GREATEST(CAST(ceil((nt - 10) / 40.0) AS INT), 1) - 1)) AS ci
        |  FROM n),
        |ch AS (
        |  SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
        |    CAST(len(toks[ci*40+1 : ci*40+50]) AS INT) AS n_chunk_tokens
        |  FROM c),
        |j AS (SELECT ch.doc_id, ch.chunk_idx, ch.n_chunk_tokens, d.source
        |      FROM ch JOIN documents d ON ch.doc_id = d.doc_id),
        |p AS (
        |  SELECT source, n_chunk_tokens,
        |    SUM(n_chunk_tokens) OVER (PARTITION BY source ORDER BY doc_id, chunk_idx
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM j)
        |SELECT source, CAST(FLOOR((cum - n_chunk_tokens) / 256.0) AS BIGINT) AS pack_id,
        |  COUNT(*) AS n_chunks, CAST(SUM(n_chunk_tokens) AS BIGINT) AS pack_tokens
        |FROM p GROUP BY source, pack_id ORDER BY source, pack_id""".stripMargin,

    "x37_domain_mix" ->
      """WITH k AS (
        |  SELECT lang, doc_id,
        |    CASE lang
        |      WHEN 'en' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'c000'
        |      WHEN 'zh' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
        |      ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
        |    END AS keep
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_total, CAST(count_if(keep) AS BIGINT) AS n_kept,
        |  round(count_if(keep) * 1.0 / COUNT(*), 6) AS kept_ratio,
        |  MIN(CASE WHEN keep THEN doc_id END) AS min_kept,
        |  MAX(CASE WHEN keep THEN doc_id END) AS max_kept
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    "x40_frame_slices" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |    hex(encode(text)) AS ph, octet_length(encode(text)) AS nb
        |  FROM documents),
        |s AS (
        |  SELECT media_id, modality, ph,
        |    unnest(generate_series(0, CAST(ceil(nb / 64.0) AS INT) - 1, 2)) AS slice_idx
        |  FROM m WHERE nb > 0)
        |SELECT media_id, modality, CAST(slice_idx AS INT) AS slice_idx,
        |  CAST(len(substr(ph, slice_idx * 128 + 1, 128)) / 2 AS INT) AS n_slice_bytes,
        |  md5(substr(ph, slice_idx * 128 + 1, 128)) AS slice_md5
        |FROM s ORDER BY media_id, slice_idx""".stripMargin,

    // The x42 banding CTE applied to ANN serving: corpus bands and query
    // bands from the same md5-rebuilt 128-plane matrix, candidates =
    // band-equality join (j, bv) — the same set as the engine's
    // band_key = j*256+bv IN-filter — then x05's exact rescoring.
    "x43_ann_banded_topk" -> x43BandedSql,

    // Delta-index probe: union-then-probe ≡ rebuild-then-probe (band
    // keys are pure per-row functions), so the whole-corpus x43 replay
    // IS the oracle — the split point cannot appear in the result.
    "x70_ann_banded_delta" -> x43BandedSql,

    // Fully-trained IVF×PQ: x25's coarse Lloyd chain (renamed ka*/kc*),
    // the trained-cell assignment and cosine probe cut, then x57's PQ
    // training chain verbatim, codes over the probed cells only, ADC,
    // and the exact-L2² rerank.
    "x71_ivfpq_trained_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id <> 0),
        |q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |c0 AS (SELECT vec_id AS cid, v AS cv FROM e
        |       ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
        |ka1 AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c0.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c0.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(c0.cv)), i -> c0.cv[i] * c0.cv[i])))) DESC,
        |        c0.cid ASC) AS rk
        |    FROM e, c0) WHERE rk = 1),
        |kc1 AS (
        |  SELECT cid, list(m ORDER BY pos) AS cv FROM (
        |    SELECT cid, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS m FROM (
        |      SELECT cid, pos,
        |        2 * CAST(SUM(CAST(floor(vv * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM (SELECT cid, unnest(generate_series(1, len(v))) AS pos, unnest(v) AS vv FROM ka1)
        |      GROUP BY cid, pos)) GROUP BY cid),
        |ka2 AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, kc1.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * kc1.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(kc1.cv)), i -> kc1.cv[i] * kc1.cv[i])))) DESC,
        |        kc1.cid ASC) AS rk
        |    FROM e, kc1) WHERE rk = 1),
        |kc2 AS (
        |  SELECT cid, list(m ORDER BY pos) AS cv FROM (
        |    SELECT cid, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS m FROM (
        |      SELECT cid, pos,
        |        2 * CAST(SUM(CAST(floor(vv * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM (SELECT cid, unnest(generate_series(1, len(v))) AS pos, unnest(v) AS vv FROM ka2)
        |      GROUP BY cid, pos)) GROUP BY cid),
        |casg AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT e.vec_id, kc2.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * kc2.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(kc2.cv)), i -> kc2.cv[i] * kc2.cv[i])))) DESC,
        |        kc2.cid ASC) AS rk
        |    FROM e, kc2) WHERE rk = 1),
        |probe AS (
        |  SELECT cid FROM kc2, q
        |  ORDER BY
        |    list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * qv[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * cv[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))) DESC,
        |    cid ASC LIMIT 6),
        |pruned AS (SELECT vec_id FROM casg JOIN probe USING (cid)),
        |jj AS (SELECT unnest(generate_series(0, 7)) AS j),
        |pp AS (SELECT unnest(generate_series(1, 8)) AS pos),
        |cb0 AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k, v AS cv
        |  FROM e
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 256),
        |s0 AS (
        |  SELECT jj.j, cb0.k,
        |    list_transform(generate_series(1, 8), t -> cb0.cv[jj.j * 8 + t]) AS sub
        |  FROM jj, cb0),
        |a1 AS (
        |  SELECT vec_id, j, k FROM (
        |    SELECT e.vec_id, s0.j, s0.k,
        |      row_number() OVER (PARTITION BY e.vec_id, s0.j ORDER BY
        |        list_sum(list_transform(generate_series(1, 8), t ->
        |          (e.v[s0.j * 8 + t] - s0.sub[t]) * (e.v[s0.j * 8 + t] - s0.sub[t]))) ASC,
        |        s0.k ASC) AS rk
        |    FROM e, s0) WHERE rk = 1),
        |m1 AS (
        |  SELECT j, k, list(mm ORDER BY pos) AS sub FROM (
        |    SELECT j, k, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS mm FROM (
        |      SELECT a1.j, a1.k, pp.pos,
        |        2 * CAST(SUM(CAST(floor(e.v[a1.j * 8 + pp.pos] * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM a1 JOIN e USING (vec_id), pp
        |      GROUP BY a1.j, a1.k, pp.pos)) GROUP BY j, k),
        |s1 AS (
        |  SELECT s0.j, s0.k, COALESCE(m1.sub, s0.sub) AS sub
        |  FROM s0 LEFT JOIN m1 ON m1.j = s0.j AND m1.k = s0.k),
        |a2 AS (
        |  SELECT vec_id, j, k FROM (
        |    SELECT e.vec_id, s1.j, s1.k,
        |      row_number() OVER (PARTITION BY e.vec_id, s1.j ORDER BY
        |        list_sum(list_transform(generate_series(1, 8), t ->
        |          (e.v[s1.j * 8 + t] - s1.sub[t]) * (e.v[s1.j * 8 + t] - s1.sub[t]))) ASC,
        |        s1.k ASC) AS rk
        |    FROM e, s1) WHERE rk = 1),
        |m2 AS (
        |  SELECT j, k, list(mm ORDER BY pos) AS sub FROM (
        |    SELECT j, k, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS mm FROM (
        |      SELECT a2.j, a2.k, pp.pos,
        |        2 * CAST(SUM(CAST(floor(e.v[a2.j * 8 + pp.pos] * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM a2 JOIN e USING (vec_id), pp
        |      GROUP BY a2.j, a2.k, pp.pos)) GROUP BY j, k),
        |s2 AS (
        |  SELECT s1.j, s1.k, COALESCE(m2.sub, s1.sub) AS sub
        |  FROM s1 LEFT JOIN m2 ON m2.j = s1.j AND m2.k = s1.k),
        |codes AS (
        |  SELECT vec_id, j, k FROM (
        |    SELECT e.vec_id, s2.j, s2.k,
        |      row_number() OVER (PARTITION BY e.vec_id, s2.j ORDER BY
        |        list_sum(list_transform(generate_series(1, 8), t ->
        |          (e.v[s2.j * 8 + t] - s2.sub[t]) * (e.v[s2.j * 8 + t] - s2.sub[t]))) ASC,
        |        s2.k ASC) AS rk
        |    FROM e JOIN pruned USING (vec_id), s2) WHERE rk = 1),
        |qtab AS (
        |  SELECT s2.j, s2.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (q.qv[s2.j * 8 + t] - s2.sub[t]) * (q.qv[s2.j * 8 + t] - s2.sub[t]))) AS dist
        |  FROM q, s2),
        |approx AS (
        |  SELECT c.vec_id, list_sum(list(qt.dist ORDER BY c.j)) AS pq
        |  FROM codes c JOIN qtab qt ON qt.j = c.j AND qt.k = c.k
        |  GROUP BY c.vec_id),
        |cand AS (
        |  SELECT vec_id, pq FROM approx
        |  QUALIFY row_number() OVER (ORDER BY pq, vec_id) <= 160),
        |scored AS (
        |  SELECT cand.vec_id, cand.pq,
        |    list_sum(list_transform(generate_series(1, len(e.v)), t ->
        |      (e.v[t] - q.qv[t]) * (e.v[t] - q.qv[t]))) AS l2
        |  FROM cand JOIN e ON e.vec_id = cand.vec_id, q)
        |SELECT vec_id, round(pq, 6) AS pq_dist, round(l2, 6) AS l2_dist
        |FROM scored ORDER BY l2 ASC, vec_id ASC LIMIT 20""".stripMargin,

    // x43's banding CTE with BOTH sides banded and a (j, bv) self-join:
    // the same candidate set as the engine's band_key equi-join, then
    // per-query window top-k.
    "x45_ann_banded_serve" ->
      """WITH h AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |    d -> (CAST('0x' || substr(md5('rhp:' || CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS UBIGINT) % 2000001) / 1000000.0 - 1.0) AS hv
        |  FROM generate_series(0, 127) t(b)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |bits AS (
        |  SELECT e.vec_id, CAST(h.b // 8 AS INT) AS j,
        |    CASE WHEN list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * hv[i])) > 0
        |      THEN CAST(1 << (7 - (h.b % 8)) AS BIGINT) ELSE 0 END AS bit
        |  FROM e, h),
        |bands AS (SELECT vec_id, j, SUM(bit) AS bv FROM bits GROUP BY vec_id, j),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id
        |  FROM bands q JOIN bands c USING (j, bv)
        |  WHERE q.vec_id % 50 = 0 AND c.vec_id % 50 <> 0),
        |scored AS (
        |  SELECT cand.q_id, cand.vec_id,
        |    round(
        |      list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * q.v[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * q.v[i])))),
        |    6) AS cos_sim
        |  FROM cand
        |  JOIN e c ON c.vec_id = cand.vec_id
        |  JOIN e q ON q.vec_id = cand.q_id)
        |SELECT q_id, vec_id, cos_sim,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY q_id, rank""".stripMargin,

    // PQ replayed stage for stage: md5-ordered 16-sample codebook,
    // per-(vec, subspace, centroid) L2² over 8 dims, row_number argmin
    // (ORDER BY dist, k == the engine's strict-less fold keeping the
    // smaller index), the query's ADC table from the same arithmetic,
    // ADC sums ordered by subspace (list(... ORDER BY j) = the engine's
    // ascending-j fold), top-60 cut on (pq, id), exact-L2² rerank.
    "x51_pq_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id <> 0),
        |q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |cb AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k, v AS cv
        |  FROM e
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
        |jj AS (SELECT unnest(generate_series(0, 7)) AS j),
        |dist AS (
        |  SELECT e.vec_id, jj.j, cb.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (e.v[jj.j * 8 + t] - cb.cv[jj.j * 8 + t]) *
        |      (e.v[jj.j * 8 + t] - cb.cv[jj.j * 8 + t]))) AS dist
        |  FROM e, jj, cb),
        |codes AS (
        |  SELECT vec_id, j, k FROM dist
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, k) = 1),
        |qtab AS (
        |  SELECT jj.j, cb.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (q.qv[jj.j * 8 + t] - cb.cv[jj.j * 8 + t]) *
        |      (q.qv[jj.j * 8 + t] - cb.cv[jj.j * 8 + t]))) AS dist
        |  FROM q, jj, cb),
        |approx AS (
        |  SELECT c.vec_id, list_sum(list(qt.dist ORDER BY c.j)) AS pq
        |  FROM codes c JOIN qtab qt ON qt.j = c.j AND qt.k = c.k
        |  GROUP BY c.vec_id),
        |cand AS (
        |  SELECT vec_id, pq FROM approx
        |  QUALIFY row_number() OVER (ORDER BY pq, vec_id) <= 60),
        |scored AS (
        |  SELECT cand.vec_id, cand.pq,
        |    list_sum(list_transform(generate_series(1, len(e.v)), t ->
        |      (e.v[t] - q.qv[t]) * (e.v[t] - q.qv[t]))) AS l2
        |  FROM cand JOIN e ON e.vec_id = cand.vec_id, q)
        |SELECT vec_id, round(pq, 6) AS pq_dist, round(l2, 6) AS l2_dist
        |FROM scored ORDER BY l2 ASC, vec_id ASC LIMIT 20""".stripMargin,

    // Residual IVFADC replayed stage for stage: x58's sample/assignment/
    // probe, then residuals v−cv (exact IEEE subtraction), the residual-
    // sample codebook (same md5 order over rv), residual argmin codes,
    // PER-CELL query tables from (qv−cv_cell)−rcb, the cell-keyed ADC
    // join, cut and rerank.
    "x59_ivfpq_residual_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id <> 0),
        |q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |samp AS (
        |  SELECT vec_id AS cid, v AS cv
        |  FROM e
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
        |asg AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT e.vec_id, samp.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * samp.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(samp.cv)), i -> samp.cv[i] * samp.cv[i])))) DESC,
        |        samp.cid ASC) AS rk
        |    FROM e, samp) WHERE rk = 1),
        |probe AS (
        |  SELECT cid, cv FROM samp, q
        |  ORDER BY
        |    list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * qv[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * cv[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))) DESC,
        |    cid ASC LIMIT 4),
        |rv AS (
        |  SELECT a.vec_id, a.cid,
        |    list_transform(generate_series(1, len(e.v)), i -> e.v[i] - samp.cv[i]) AS r
        |  FROM asg a JOIN e USING (vec_id) JOIN samp ON samp.cid = a.cid),
        |rcb AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k,
        |    r AS cv
        |  FROM rv
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
        |pruned AS (
        |  SELECT vec_id FROM asg JOIN (SELECT cid FROM probe) p USING (cid)),
        |jj AS (SELECT unnest(generate_series(0, 7)) AS j),
        |dist AS (
        |  SELECT rv.vec_id, jj.j, rcb.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (rv.r[jj.j * 8 + t] - rcb.cv[jj.j * 8 + t]) *
        |      (rv.r[jj.j * 8 + t] - rcb.cv[jj.j * 8 + t]))) AS dist
        |  FROM rv JOIN pruned USING (vec_id), jj, rcb),
        |codes AS (
        |  SELECT vec_id, j, k FROM dist
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, k) = 1),
        |qtab AS (
        |  SELECT probe.cid, jj.j, rcb.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      ((q.qv[jj.j * 8 + t] - probe.cv[jj.j * 8 + t]) - rcb.cv[jj.j * 8 + t]) *
        |      ((q.qv[jj.j * 8 + t] - probe.cv[jj.j * 8 + t]) - rcb.cv[jj.j * 8 + t]))) AS dist
        |  FROM q, probe, jj, rcb),
        |approx AS (
        |  SELECT c.vec_id, list_sum(list(qt.dist ORDER BY c.j)) AS pq
        |  FROM codes c
        |  JOIN asg ON asg.vec_id = c.vec_id
        |  JOIN qtab qt ON qt.cid = asg.cid AND qt.j = c.j AND qt.k = c.k
        |  GROUP BY c.vec_id),
        |cand AS (
        |  SELECT vec_id, pq FROM approx
        |  QUALIFY row_number() OVER (ORDER BY pq, vec_id) <= 60),
        |scored AS (
        |  SELECT cand.vec_id, cand.pq,
        |    list_sum(list_transform(generate_series(1, len(e.v)), t ->
        |      (e.v[t] - q.qv[t]) * (e.v[t] - q.qv[t]))) AS l2
        |  FROM cand JOIN e ON e.vec_id = cand.vec_id, q)
        |SELECT vec_id, round(pq, 6) AS pq_dist, round(l2, 6) AS l2_dist
        |FROM scored ORDER BY l2 ASC, vec_id ASC LIMIT 20""".stripMargin,

    // Trained residual IVFADC replayed stage for stage: x59's coarse
    // cells / residuals / per-cell query tables with x57's two
    // fixed-point Lloyd rounds (argmin per subspace, integer means,
    // COALESCE empty cells) run ON the residual frame rv instead of the
    // raw vectors.
    "x80_ivfpq_residual_trained" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id <> 0),
        |q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |samp AS (
        |  SELECT vec_id AS cid, v AS cv
        |  FROM e
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
        |asg AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT e.vec_id, samp.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * samp.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(samp.cv)), i -> samp.cv[i] * samp.cv[i])))) DESC,
        |        samp.cid ASC) AS rk
        |    FROM e, samp) WHERE rk = 1),
        |probe AS (
        |  SELECT cid, cv FROM samp, q
        |  ORDER BY
        |    list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * qv[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * cv[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))) DESC,
        |    cid ASC LIMIT 4),
        |rv AS (
        |  SELECT a.vec_id, a.cid,
        |    list_transform(generate_series(1, len(e.v)), i -> e.v[i] - samp.cv[i]) AS r
        |  FROM asg a JOIN e USING (vec_id) JOIN samp ON samp.cid = a.cid),
        |jj AS (SELECT unnest(generate_series(0, 7)) AS j),
        |pp AS (SELECT unnest(generate_series(1, 8)) AS pos),
        |rcb0 AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k,
        |    r AS cv
        |  FROM rv
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
        |s0 AS (
        |  SELECT jj.j, rcb0.k,
        |    list_transform(generate_series(1, 8), t -> rcb0.cv[jj.j * 8 + t]) AS sub
        |  FROM jj, rcb0),
        |a1 AS (
        |  SELECT vec_id, j, k FROM (
        |    SELECT rv.vec_id, s0.j, s0.k,
        |      row_number() OVER (PARTITION BY rv.vec_id, s0.j ORDER BY
        |        list_sum(list_transform(generate_series(1, 8), t ->
        |          (rv.r[s0.j * 8 + t] - s0.sub[t]) * (rv.r[s0.j * 8 + t] - s0.sub[t]))) ASC,
        |        s0.k ASC) AS rk
        |    FROM rv, s0) WHERE rk = 1),
        |m1 AS (
        |  SELECT j, k, list(mm ORDER BY pos) AS sub FROM (
        |    SELECT j, k, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS mm FROM (
        |      SELECT a1.j, a1.k, pp.pos,
        |        2 * CAST(SUM(CAST(floor(rv.r[a1.j * 8 + pp.pos] * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM a1 JOIN rv USING (vec_id), pp
        |      GROUP BY a1.j, a1.k, pp.pos)) GROUP BY j, k),
        |s1 AS (
        |  SELECT s0.j, s0.k, COALESCE(m1.sub, s0.sub) AS sub
        |  FROM s0 LEFT JOIN m1 ON m1.j = s0.j AND m1.k = s0.k),
        |a2 AS (
        |  SELECT vec_id, j, k FROM (
        |    SELECT rv.vec_id, s1.j, s1.k,
        |      row_number() OVER (PARTITION BY rv.vec_id, s1.j ORDER BY
        |        list_sum(list_transform(generate_series(1, 8), t ->
        |          (rv.r[s1.j * 8 + t] - s1.sub[t]) * (rv.r[s1.j * 8 + t] - s1.sub[t]))) ASC,
        |        s1.k ASC) AS rk
        |    FROM rv, s1) WHERE rk = 1),
        |m2 AS (
        |  SELECT j, k, list(mm ORDER BY pos) AS sub FROM (
        |    SELECT j, k, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS mm FROM (
        |      SELECT a2.j, a2.k, pp.pos,
        |        2 * CAST(SUM(CAST(floor(rv.r[a2.j * 8 + pp.pos] * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM a2 JOIN rv USING (vec_id), pp
        |      GROUP BY a2.j, a2.k, pp.pos)) GROUP BY j, k),
        |s2 AS (
        |  SELECT s1.j, s1.k, COALESCE(m2.sub, s1.sub) AS sub
        |  FROM s1 LEFT JOIN m2 ON m2.j = s1.j AND m2.k = s1.k),
        |pruned AS (
        |  SELECT vec_id FROM asg JOIN (SELECT cid FROM probe) p USING (cid)),
        |codes AS (
        |  SELECT vec_id, j, k FROM (
        |    SELECT rv.vec_id, s2.j, s2.k,
        |      row_number() OVER (PARTITION BY rv.vec_id, s2.j ORDER BY
        |        list_sum(list_transform(generate_series(1, 8), t ->
        |          (rv.r[s2.j * 8 + t] - s2.sub[t]) * (rv.r[s2.j * 8 + t] - s2.sub[t]))) ASC,
        |        s2.k ASC) AS rk
        |    FROM rv JOIN pruned USING (vec_id), s2) WHERE rk = 1),
        |qtab AS (
        |  SELECT probe.cid, s2.j, s2.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      ((q.qv[s2.j * 8 + t] - probe.cv[s2.j * 8 + t]) - s2.sub[t]) *
        |      ((q.qv[s2.j * 8 + t] - probe.cv[s2.j * 8 + t]) - s2.sub[t]))) AS dist
        |  FROM q, probe, s2),
        |approx AS (
        |  SELECT c.vec_id, list_sum(list(qt.dist ORDER BY c.j)) AS pq
        |  FROM codes c
        |  JOIN asg ON asg.vec_id = c.vec_id
        |  JOIN qtab qt ON qt.cid = asg.cid AND qt.j = c.j AND qt.k = c.k
        |  GROUP BY c.vec_id),
        |cand AS (
        |  SELECT vec_id, pq FROM approx
        |  QUALIFY row_number() OVER (ORDER BY pq, vec_id) <= 60),
        |scored AS (
        |  SELECT cand.vec_id, cand.pq,
        |    list_sum(list_transform(generate_series(1, len(e.v)), t ->
        |      (e.v[t] - q.qv[t]) * (e.v[t] - q.qv[t]))) AS l2
        |  FROM cand JOIN e ON e.vec_id = cand.vec_id, q)
        |SELECT vec_id, round(pq, 6) AS pq_dist, round(l2, 6) AS l2_dist
        |FROM scored ORDER BY l2 ASC, vec_id ASC LIMIT 20""".stripMargin,

    // Trained-PQ replayed stage for stage: md5-sampled init codebook,
    // then per (vec, subspace) argmin assignment (row_number dist ASC,
    // k ASC = the engine's strict-less fold), per (subspace, code, pos)
    // fixed-point integer mean (floor((2s+n)/(2n)) — the x25
    // convention), COALESCE to the previous round's subvector for empty
    // cells, twice; then x51's encode → ADC table → cut → rerank on the
    // trained model.
    "x57_pq_trained_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id <> 0),
        |q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |jj AS (SELECT unnest(generate_series(0, 7)) AS j),
        |pp AS (SELECT unnest(generate_series(1, 8)) AS pos),
        |cb0 AS (
        |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k, v AS cv
        |  FROM e
        |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16),
        |s0 AS (
        |  SELECT jj.j, cb0.k,
        |    list_transform(generate_series(1, 8), t -> cb0.cv[jj.j * 8 + t]) AS sub
        |  FROM jj, cb0),
        |a1 AS (
        |  SELECT vec_id, j, k FROM (
        |    SELECT e.vec_id, s0.j, s0.k,
        |      row_number() OVER (PARTITION BY e.vec_id, s0.j ORDER BY
        |        list_sum(list_transform(generate_series(1, 8), t ->
        |          (e.v[s0.j * 8 + t] - s0.sub[t]) * (e.v[s0.j * 8 + t] - s0.sub[t]))) ASC,
        |        s0.k ASC) AS rk
        |    FROM e, s0) WHERE rk = 1),
        |m1 AS (
        |  SELECT j, k, list(mm ORDER BY pos) AS sub FROM (
        |    SELECT j, k, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS mm FROM (
        |      SELECT a1.j, a1.k, pp.pos,
        |        2 * CAST(SUM(CAST(floor(e.v[a1.j * 8 + pp.pos] * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM a1 JOIN e USING (vec_id), pp
        |      GROUP BY a1.j, a1.k, pp.pos)) GROUP BY j, k),
        |s1 AS (
        |  SELECT s0.j, s0.k, COALESCE(m1.sub, s0.sub) AS sub
        |  FROM s0 LEFT JOIN m1 ON m1.j = s0.j AND m1.k = s0.k),
        |a2 AS (
        |  SELECT vec_id, j, k FROM (
        |    SELECT e.vec_id, s1.j, s1.k,
        |      row_number() OVER (PARTITION BY e.vec_id, s1.j ORDER BY
        |        list_sum(list_transform(generate_series(1, 8), t ->
        |          (e.v[s1.j * 8 + t] - s1.sub[t]) * (e.v[s1.j * 8 + t] - s1.sub[t]))) ASC,
        |        s1.k ASC) AS rk
        |    FROM e, s1) WHERE rk = 1),
        |m2 AS (
        |  SELECT j, k, list(mm ORDER BY pos) AS sub FROM (
        |    SELECT j, k, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS mm FROM (
        |      SELECT a2.j, a2.k, pp.pos,
        |        2 * CAST(SUM(CAST(floor(e.v[a2.j * 8 + pp.pos] * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM a2 JOIN e USING (vec_id), pp
        |      GROUP BY a2.j, a2.k, pp.pos)) GROUP BY j, k),
        |s2 AS (
        |  SELECT s1.j, s1.k, COALESCE(m2.sub, s1.sub) AS sub
        |  FROM s1 LEFT JOIN m2 ON m2.j = s1.j AND m2.k = s1.k),
        |codes AS (
        |  SELECT vec_id, j, k FROM (
        |    SELECT e.vec_id, s2.j, s2.k,
        |      row_number() OVER (PARTITION BY e.vec_id, s2.j ORDER BY
        |        list_sum(list_transform(generate_series(1, 8), t ->
        |          (e.v[s2.j * 8 + t] - s2.sub[t]) * (e.v[s2.j * 8 + t] - s2.sub[t]))) ASC,
        |        s2.k ASC) AS rk
        |    FROM e, s2) WHERE rk = 1),
        |qtab AS (
        |  SELECT s2.j, s2.k,
        |    list_sum(list_transform(generate_series(1, 8), t ->
        |      (q.qv[s2.j * 8 + t] - s2.sub[t]) * (q.qv[s2.j * 8 + t] - s2.sub[t]))) AS dist
        |  FROM q, s2),
        |approx AS (
        |  SELECT c.vec_id, list_sum(list(qt.dist ORDER BY c.j)) AS pq
        |  FROM codes c JOIN qtab qt ON qt.j = c.j AND qt.k = c.k
        |  GROUP BY c.vec_id),
        |cand AS (
        |  SELECT vec_id, pq FROM approx
        |  QUALIFY row_number() OVER (ORDER BY pq, vec_id) <= 60),
        |scored AS (
        |  SELECT cand.vec_id, cand.pq,
        |    list_sum(list_transform(generate_series(1, len(e.v)), t ->
        |      (e.v[t] - q.qv[t]) * (e.v[t] - q.qv[t]))) AS l2
        |  FROM cand JOIN e ON e.vec_id = cand.vec_id, q)
        |SELECT vec_id, round(pq, 6) AS pq_dist, round(l2, 6) AS l2_dist
        |FROM scored ORDER BY l2 ASC, vec_id ASC LIMIT 20""".stripMargin,

    // IVF×PQ replayed stage for stage: the md5 sample doubles as coarse
    // centroids (cid = vec_id) and PQ codebook (k = rank-1); cell
    // assignment is x25's cosine argmax (row_number DESC, cid ASC), the
    // probe cut is the same ranking against the query, and only rows in
    // probed cells enter x51's ADC sum → top-60 cut → exact-L2 rerank.
    "x58_ivfpq_topk" -> x58IvfPqSql,

    // x73 delta-maintained IVF×PQ: same model, same cells, same codes —
    // union-then-probe ≡ rebuild-then-probe, so the whole-corpus replay
    // IS the oracle (the x70 pattern).
    "x73_ivfpq_delta" -> x58IvfPqSql,

    // x79 index compaction: frozen model, pure per-row cells and codes —
    // probing the compacted tree ≡ probing the rebuilt whole-corpus
    // index, so x58's SQL IS the oracle (the x70/x73 law).
    "x79_ivfpq_compact" -> x58IvfPqSql,

    // Int8 quantization replayed exactly: floor(x * (127/amax) + 0.5) on
    // IEEE doubles (NOT round() — half-even vs half-up conventions
    // differ between engines; floor(x+0.5) doesn't), integer dot/norms
    // (order-independent sums), deterministic top-60 cut (quantized
    // score desc, id asc), exact float rescoring of the candidates only.
    "x46_quantized_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id <> 0),
        |q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id = 0),
        |qz AS (
        |  SELECT vec_id, v,
        |    CASE WHEN amax = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(v, x -> CAST(floor(x * (127.0 / amax) + 0.5) AS BIGINT))
        |    END AS qv
        |  FROM (SELECT vec_id, v,
        |          list_max(list_transform(v, x -> abs(x))) AS amax FROM e)),
        |qq AS (
        |  SELECT v,
        |    CASE WHEN amax = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(v, x -> CAST(floor(x * (127.0 / amax) + 0.5) AS BIGINT))
        |    END AS qv
        |  FROM (SELECT v,
        |          list_max(list_transform(v, x -> abs(x))) AS amax FROM q)),
        |scored AS (
        |  SELECT qz.vec_id,
        |    CASE WHEN list_sum(list_transform(qz.qv, x -> x * x)) *
        |              list_sum(list_transform(qq.qv, x -> x * x)) = 0 THEN 0.0
        |    ELSE round(
        |      CAST(list_sum(list_transform(generate_series(1, len(qz.qv)),
        |        i -> qz.qv[i] * qq.qv[i])) AS DOUBLE) /
        |      sqrt(CAST(
        |        list_sum(list_transform(generate_series(1, len(qz.qv)), i -> qz.qv[i] * qz.qv[i])) *
        |        list_sum(list_transform(generate_series(1, len(qq.qv)), i -> qq.qv[i] * qq.qv[i]))
        |        AS DOUBLE)),
        |    6) END AS qcos_sim
        |  FROM qz, qq),
        |cand AS (
        |  SELECT vec_id, qcos_sim FROM scored
        |  QUALIFY row_number() OVER (ORDER BY qcos_sim DESC, vec_id ASC) <= 60)
        |SELECT cand.vec_id, cand.qcos_sim,
        |  CASE WHEN sqrt(list_sum(list_transform(e.v, x -> x * x))) *
        |            sqrt(list_sum(list_transform(q.v, x -> x * x))) = 0 THEN 0.0
        |  ELSE round(
        |    list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * q.v[i])) /
        |    (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |     sqrt(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * q.v[i])))),
        |  6) END AS cos_sim
        |FROM cand JOIN e ON e.vec_id = cand.vec_id, q
        |ORDER BY cos_sim DESC, cand.vec_id ASC LIMIT 20""".stripMargin,

    // Banding replayed stage for stage (the x06 pattern at 128 planes):
    // md5-rebuilt hyperplanes → 16×8-bit band bytes → band-equality
    // candidates → precomputed-norm exact cosine ≥ 0.45 → x16's
    // reachability-walk components → min-id representative. Collisions
    // AND misses replay identically, so the gate is exact regardless of
    // the S-curve's recall at this threshold.
    "x42_semantic_dedup" ->
      """WITH RECURSIVE h AS (
        |  SELECT b, list_transform(generate_series(0, 63),
        |    d -> (CAST('0x' || substr(md5('rhp:' || CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 8) AS UBIGINT) % 2000001) / 1000000.0 - 1.0) AS hv
        |  FROM generate_series(0, 127) t(b)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |bits AS (
        |  SELECT e.vec_id, CAST(h.b // 8 AS INT) AS j,
        |    CASE WHEN list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * hv[i])) > 0
        |      THEN CAST(1 << (7 - (h.b % 8)) AS BIGINT) ELSE 0 END AS bit
        |  FROM e, h),
        |bands AS (SELECT vec_id, j, SUM(bit) AS bv FROM bits GROUP BY vec_id, j),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM bands a JOIN bands b ON a.j = b.j AND a.bv = b.bv AND a.vec_id < b.vec_id),
        |n AS (SELECT vec_id, sqrt(list_sum(list_transform(generate_series(1, len(v)), i -> v[i]*v[i]))) AS nrm FROM e),
        |p AS (
        |  SELECT a_id, b_id
        |  FROM cand
        |  JOIN e ea ON ea.vec_id = a_id JOIN e eb ON eb.vec_id = b_id
        |  JOIN n na ON na.vec_id = a_id JOIN n nb ON nb.vec_id = b_id
        |  WHERE round(list_sum(list_transform(generate_series(1, len(ea.v)), i -> ea.v[i] * eb.v[i])) / (na.nrm * nb.nrm), 6) >= 0.45),
        |edges AS (SELECT a_id AS u, b_id AS w FROM p UNION SELECT b_id, a_id FROM p),
        |walk(id, reach) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT wk.id, ed.w FROM walk wk JOIN edges ed ON wk.reach = ed.u)
        |SELECT id AS vec_id, MIN(reach) AS cluster_id, (MIN(reach) = id) AS kept
        |FROM walk GROUP BY id ORDER BY vec_id""".stripMargin,

    // Same blocking, first-occurrence pick and ordered reassembly in SQL
    // (QUALIFY row_number = Spark's min(struct) keeper; string_agg ORDER BY
    // block_idx = the sort_array reassembly). DuckDB list slices are
    // 1-based inclusive and truncate at the end like Spark's slice().
    "x41_block_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |b AS (
        |  SELECT doc_id, toks,
        |    UNNEST(range(0, (len(toks) - 1) // 20 + 1)) AS block_idx
        |  FROM t),
        |bt AS (
        |  SELECT doc_id, CAST(block_idx AS INT) AS block_idx,
        |    array_to_string(toks[block_idx * 20 + 1 : block_idx * 20 + 20], ' ') AS block_text
        |  FROM b),
        |k AS (
        |  SELECT doc_id, block_idx, block_text FROM bt
        |  QUALIFY row_number() OVER (PARTITION BY block_text ORDER BY doc_id, block_idx) = 1)
        |SELECT doc_id,
        |  string_agg(block_text, ' ' ORDER BY block_idx) AS clean_text,
        |  COUNT(*) AS n_blocks
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // The ridge fit replayed exactly: integer sufficient statistics,
    // HUGEINT Cramer determinants (same cofactor expansion order as the
    // engine's BigInt solve), correctly-rounded HUGEINT→DOUBLE ratios,
    // fixed-point residual sum, identical double sequence for SST/R².
    "x49_ridge_probe" ->
      """WITH f AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS f1,
        |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS f2,
        |    CAST(n_chars AS BIGINT) AS y
        |  FROM documents),
        |s AS (
        |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(f1) AS HUGEINT) AS s1, CAST(SUM(f2) AS HUGEINT) AS s2,
        |    CAST(SUM(f1*f1) AS HUGEINT) AS s11, CAST(SUM(f1*f2) AS HUGEINT) AS s12,
        |    CAST(SUM(f2*f2) AS HUGEINT) AS s22,
        |    CAST(SUM(y) AS HUGEINT) AS sy, CAST(SUM(f1*y) AS HUGEINT) AS sy1,
        |    CAST(SUM(f2*y) AS HUGEINT) AS sy2, CAST(SUM(y*y) AS HUGEINT) AS syy
        |  FROM f),
        |det AS (
        |  SELECT n, sy, syy,
        |    n*((s11+1)*(s22+1) - s12*s12) - s1*(s1*(s22+1) - s12*s2) + s2*(s1*s12 - (s11+1)*s2) AS dA,
        |    sy*((s11+1)*(s22+1) - s12*s12) - s1*(sy1*(s22+1) - s12*sy2) + s2*(sy1*s12 - (s11+1)*sy2) AS d0,
        |    n*(sy1*(s22+1) - s12*sy2) - sy*(s1*(s22+1) - s12*s2) + s2*(s1*sy2 - sy1*s2) AS d1,
        |    n*((s11+1)*sy2 - sy1*s12) - s1*(s1*sy2 - sy1*s2) + sy*(s1*s12 - (s11+1)*s2) AS d2
        |  FROM s),
        |beta AS (
        |  SELECT n, sy, syy,
        |    CAST(d0 AS DOUBLE) / CAST(dA AS DOUBLE) AS b0,
        |    CAST(d1 AS DOUBLE) / CAST(dA AS DOUBLE) AS b1,
        |    CAST(d2 AS DOUBLE) / CAST(dA AS DOUBLE) AS b2
        |  FROM det),
        |res AS (
        |  SELECT SUM(CAST(floor(
        |      (CAST(y AS DOUBLE) - (b0 + b1*f1 + b2*f2)) *
        |      (CAST(y AS DOUBLE) - (b0 + b1*f1 + b2*f2)) * 1000000.0)
        |    AS BIGINT)) AS sse_fix
        |  FROM f, beta)
        |SELECT CAST(beta.n AS BIGINT) AS n,
        |  round(b0, 6) AS b0, round(b1, 6) AS b1, round(b2, 6) AS b2,
        |  round(1.0 - (CAST(sse_fix AS DOUBLE) / 1000000.0) /
        |    (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(beta.n AS DOUBLE)), 6) AS r2
        |FROM beta, res""".stripMargin,

    // Deterministic top-K per k via QUALIFY (count desc, word asc = the
    // engine's TakeOrderedAndProject ordering); exact integer ratios.
    "x55_vocab_coverage" ->
      """WITH w AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
        |  FROM documents),
        |c AS (SELECT w, COUNT(*) AS c FROM w GROUP BY 1),
        |tot AS (SELECT SUM(c) AS total FROM c),
        |ks AS (SELECT unnest([10, 100, 1000]) AS k),
        |top AS (
        |  SELECT ks.k, c.c FROM ks, c
        |  QUALIFY row_number() OVER (PARTITION BY ks.k ORDER BY c.c DESC, c.w ASC) <= ks.k)
        |SELECT k, CAST(COUNT(*) AS BIGINT) AS n_vocab_words,
        |  round(CAST(SUM(c) AS DOUBLE) / CAST(total AS DOUBLE), 6) AS coverage
        |FROM top, tot GROUP BY k, total ORDER BY k""".stripMargin,

    // Rates, cutoffs, and keep decisions rebuilt: sqrt is correctly
    // rounded by spec, floor/multiply identical, printf('%04x') matches
    // the engine's lower(lpad(conv(...))) hex, and the rate-1 group
    // short-circuits the 4-hex compare on both sides.
    "x54_temperature_mix" ->
      """WITH c AS (SELECT lang, COUNT(*) AS ng FROM documents GROUP BY 1),
        |m AS (SELECT MIN(ng) AS nmin FROM c),
        |r AS (
        |  SELECT lang, ng,
        |    CAST(floor(sqrt(CAST(nmin AS DOUBLE) / ng) * 65536.0 + 0.5) AS INT) AS cut
        |  FROM c, m),
        |k AS (
        |  SELECT d.lang, d.doc_id, r.ng, r.cut,
        |    (r.cut >= 65536 OR
        |     substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < printf('%04x', r.cut)) AS keep
        |  FROM documents d JOIN r USING (lang))
        |SELECT lang, CAST(MAX(ng) AS BIGINT) AS n_docs, CAST(MAX(cut) AS BIGINT) AS cut,
        |  CAST(count_if(keep) AS BIGINT) AS n_kept,
        |  round(count_if(keep) * 1.0 / COUNT(*), 6) AS kept_ratio,
        |  MIN(CASE WHEN keep THEN doc_id END) AS min_kept,
        |  MAX(CASE WHEN keep THEN doc_id END) AS max_kept
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    // x47's covered-interval scrub with membership from the benchmark's
    // distinct window set instead of first-occurrence ranking.
    "x53_decontaminate_spans" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE source <> 'src0'),
        |bw AS (
        |  SELECT string_split(text, ' ') AS ws FROM documents
        |  WHERE source = 'src0'),
        |bg AS (
        |  SELECT DISTINCT md5(array_to_string(ws[i : i + 7], ' ')) AS g
        |  FROM bw, unnest(generate_series(1, len(ws) - 7)) t(i)
        |  WHERE len(ws) >= 8),
        |g AS (
        |  SELECT doc_id, CAST(i AS INT) AS pos,
        |    md5(array_to_string(ws[i : i + 7], ' ')) AS g
        |  FROM w, unnest(generate_series(1, len(ws) - 7)) t(i)
        |  WHERE len(ws) >= 8),
        |hits AS (SELECT doc_id, pos FROM g SEMI JOIN bg USING (g)),
        |cov AS (
        |  SELECT DISTINCT doc_id, wp FROM (
        |    SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS wp FROM hits)),
        |words AS (
        |  SELECT doc_id, CAST(i AS INT) AS wp, ws[i] AS word
        |  FROM w, unnest(generate_series(1, len(ws))) t(i)),
        |kept AS (
        |  SELECT words.doc_id,
        |    string_agg(word, ' ' ORDER BY words.wp) AS clean_text,
        |    COUNT(*) AS n_kept
        |  FROM words LEFT JOIN cov
        |    ON cov.doc_id = words.doc_id AND cov.wp = words.wp
        |  WHERE cov.wp IS NULL
        |  GROUP BY words.doc_id)
        |SELECT w.doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
        |  md5(coalesce(clean_text, '')) AS clean_md5
        |FROM w LEFT JOIN kept USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // KL drift replayed exactly: token counts, the (source x vocab)
    // smoothed grid, floor(p*ln(p/q)*1e12) longs, exact per-source sums,
    // identical double sequence for the report.
    "x52_distribution_drift" ->
      """WITH w AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
        |tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT w) AS BIGINT) AS vsz FROM w),
        |cw AS (SELECT w, COUNT(*) AS cw FROM w GROUP BY 1),
        |ns AS (SELECT source, COUNT(*) AS nsrc FROM w GROUP BY 1),
        |csw AS (SELECT source, w, COUNT(*) AS csw FROM w GROUP BY 1, 2),
        |grid AS (
        |  SELECT ns.source, ns.nsrc, cw.w, cw.cw, coalesce(csw.csw, 0) AS csw
        |  FROM ns CROSS JOIN cw
        |  LEFT JOIN csw ON csw.source = ns.source AND csw.w = cw.w),
        |term AS (
        |  SELECT source, nsrc,
        |    CAST(floor(
        |      ((csw + 1.0) / (nsrc + tot.vsz)) *
        |      ln(((csw + 1.0) / (nsrc + tot.vsz)) / ((cw + 1.0) / (tot.n + tot.vsz))) *
        |      1000000000000.0) AS BIGINT) AS fix
        |  FROM grid, tot)
        |SELECT source AS slice, MAX(nsrc) AS n_tokens,
        |  round(CAST(SUM(fix) AS DOUBLE) / 1000000000000.0, 6) AS kl_nats
        |FROM term GROUP BY source ORDER BY slice""".stripMargin,

    // The LM retrained and the scoring replayed in SQL: transition
    // stream → unigram/bigram counts + vocab size → per-transition
    // floor(ln((cb+1)/(cu+V))·1e12) as BIGINT → exact per-doc integer
    // sum → one identical double sequence for the average. Inner joins
    // suffice (self-scoring: every transition was trained on).
    "x48_lm_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |tr AS (
        |  SELECT doc_id, ts[i] AS prev, ts[i+1] AS cur
        |  FROM tok, unnest(generate_series(1, len(ts) - 1)) u(i)
        |  WHERE len(ts) >= 2),
        |uni AS (SELECT prev, COUNT(*) AS cu FROM tr GROUP BY 1),
        |bi AS (SELECT prev, cur, COUNT(*) AS cb FROM tr GROUP BY 1, 2),
        |v AS (SELECT COUNT(DISTINCT w) AS vsz
        |      FROM (SELECT unnest(ts) AS w FROM tok)),
        |lp AS (
        |  SELECT tr.doc_id,
        |    CAST(floor(ln((bi.cb + 1.0) / (uni.cu + v.vsz)) * 1000000000000.0) AS BIGINT) AS lp_fix
        |  FROM tr
        |  JOIN uni ON uni.prev = tr.prev
        |  JOIN bi ON bi.prev = tr.prev AND bi.cur = tr.cur, v),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_transitions, SUM(lp_fix) AS sfix
        |  FROM lp GROUP BY 1)
        |SELECT tok.doc_id,
        |  CAST(coalesce(n_transitions, 0) AS BIGINT) AS n_transitions,
        |  round(CAST(-sfix AS DOUBLE) / 1000000000000.0 / n_transitions, 6) AS nll_nats
        |FROM tok LEFT JOIN agg USING (doc_id)
        |ORDER BY tok.doc_id""".stripMargin,

    // DSIR replay: both smoothed bucket distributions, the fixed-point
    // log-ratio table, exact per-doc integer sums, integer rank cut.
    "x60_dsir_selection" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tb AS (
        |  SELECT doc_id, lang,
        |    CAST(CAST('0x' || substr(md5(w), 1, 8) AS UBIGINT) AS BIGINT) % 64 AS b
        |  FROM tok),
        |rawc AS (SELECT b, COUNT(*) AS c FROM tb GROUP BY 1),
        |rawn AS (SELECT COUNT(*) AS n FROM tb),
        |tgtc AS (SELECT b, COUNT(*) AS c FROM tb WHERE lang = 'en' GROUP BY 1),
        |tgtn AS (SELECT COUNT(*) AS n FROM tb WHERE lang = 'en'),
        |grid AS (
        |  SELECT gs.b,
        |    CAST(floor(ln((COALESCE(t.c, 0) + 1.0) / (tn.n + 64)) * 1000000000000.0) AS BIGINT)
        |  - CAST(floor(ln((COALESCE(r.c, 0) + 1.0) / (rn.n + 64)) * 1000000000000.0) AS BIGINT) AS lr_fix
        |  FROM generate_series(0, 63) gs(b)
        |  LEFT JOIN tgtc t ON t.b = gs.b
        |  LEFT JOIN rawc r ON r.b = gs.b, tgtn tn, rawn rn),
        |perdoc AS (
        |  SELECT tb.doc_id, COUNT(*) AS n_tokens, SUM(g.lr_fix) AS sfix
        |  FROM tb JOIN grid g ON g.b = tb.b GROUP BY 1),
        |ranked AS (
        |  SELECT doc_id, n_tokens, sfix,
        |    row_number() OVER (ORDER BY sfix DESC, doc_id) AS rn,
        |    COUNT(*) OVER () AS m
        |  FROM perdoc)
        |SELECT doc_id, n_tokens,
        |  round(CAST(sfix AS DOUBLE) / 1000000000000.0, 6) AS logw_nats,
        |  rn <= floor((m * 1 + 3) / 4) AS kept
        |FROM ranked ORDER BY doc_id""".stripMargin,

    // Threshold-select replay: x60's weight chain verbatim, the keep
    // decision a literal integer compare (sfix >= 0) — no rank CTE.
    "x150_dsir_threshold_select" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tb AS (
        |  SELECT doc_id, lang,
        |    CAST(CAST('0x' || substr(md5(w), 1, 8) AS UBIGINT) AS BIGINT) % 64 AS b
        |  FROM tok),
        |rawc AS (SELECT b, COUNT(*) AS c FROM tb GROUP BY 1),
        |rawn AS (SELECT COUNT(*) AS n FROM tb),
        |tgtc AS (SELECT b, COUNT(*) AS c FROM tb WHERE lang = 'en' GROUP BY 1),
        |tgtn AS (SELECT COUNT(*) AS n FROM tb WHERE lang = 'en'),
        |grid AS (
        |  SELECT gs.b,
        |    CAST(floor(ln((COALESCE(t.c, 0) + 1.0) / (tn.n + 64)) * 1000000000000.0) AS BIGINT)
        |  - CAST(floor(ln((COALESCE(r.c, 0) + 1.0) / (rn.n + 64)) * 1000000000000.0) AS BIGINT) AS lr_fix
        |  FROM generate_series(0, 63) gs(b)
        |  LEFT JOIN tgtc t ON t.b = gs.b
        |  LEFT JOIN rawc r ON r.b = gs.b, tgtn tn, rawn rn),
        |perdoc AS (
        |  SELECT tb.doc_id, COUNT(*) AS n_tokens, SUM(g.lr_fix) AS sfix
        |  FROM tb JOIN grid g ON g.b = tb.b GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |  round(CAST(sfix AS DOUBLE) / 1000000000000.0, 6) AS logw_nats,
        |  sfix >= 0 AS kept
        |FROM perdoc ORDER BY doc_id""".stripMargin,

    // Histogram replay: integer buckets, window cumsum, rank pick,
    // identical interpolation arithmetic.
    "x63_hist_quantiles" ->
      """WITH h AS (
        |  SELECT lang, LEAST(63, GREATEST(0, (n_chars - 0) * 64 // 600)) AS b,
        |    COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, b, c,
        |    SUM(c) OVER (PARTITION BY lang ORDER BY b) AS cum,
        |    SUM(c) OVER (PARTITION BY lang) AS n
        |  FROM h),
        |p50 AS (
        |  SELECT lang, n,
        |    0 + (600.0 / 64) * (b + (r - (cum - c)) * 1.0 / c) AS est
        |  FROM (SELECT *, (n * 1 + 1) // 2 AS r FROM cum) t
        |  WHERE cum >= r
        |  QUALIFY row_number() OVER (PARTITION BY lang ORDER BY b) = 1),
        |p90 AS (
        |  SELECT lang,
        |    0 + (600.0 / 64) * (b + (r - (cum - c)) * 1.0 / c) AS est
        |  FROM (SELECT *, (n * 9 + 9) // 10 AS r FROM cum) t
        |  WHERE cum >= r
        |  QUALIFY row_number() OVER (PARTITION BY lang ORDER BY b) = 1)
        |SELECT p50.lang, CAST(p50.n AS BIGINT) AS n_docs,
        |  round(p50.est, 6) AS est_p50, round(p90.est, 6) AS est_p90
        |FROM p50 JOIN p90 USING (lang) ORDER BY p50.lang""".stripMargin,

    // CMS replay: md5-affine seeds, the 4×256 grid, integer minima.
    "x62_cms_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
        |  FROM documents),
        |h AS (
        |  SELECT w, CAST(CAST('0x' || substr(md5(w), 1, 8) AS UBIGINT) AS BIGINT) AS h
        |  FROM tok),
        |seeds AS (
        |  SELECT i,
        |    CAST(CAST('0x' || substr(md5('cms:a:' || i), 1, 8) AS UBIGINT) AS BIGINT)
        |      % 268435456 * 2 + 1 AS a,
        |    CAST(CAST('0x' || substr(md5('cms:b:' || i), 1, 8) AS UBIGINT) AS BIGINT)
        |      % 2147483647 AS b
        |  FROM generate_series(0, 3) s(i)),
        |grid AS (
        |  SELECT i AS r, (a * h + b) % 2147483647 % 256 AS cell, COUNT(*) AS c
        |  FROM h, seeds GROUP BY 1, 2),
        |counts AS (SELECT w, COUNT(*) AS true_count FROM tok GROUP BY 1),
        |top AS (SELECT w, true_count FROM counts ORDER BY true_count DESC, w LIMIT 20),
        |wcell AS (
        |  SELECT t.w, s.i AS r,
        |    (s.a * CAST(CAST('0x' || substr(md5(t.w), 1, 8) AS UBIGINT) AS BIGINT) + s.b)
        |      % 2147483647 % 256 AS cell
        |  FROM top t, seeds s),
        |est AS (
        |  SELECT w, MIN(COALESCE(c, 0)) AS est_count
        |  FROM wcell LEFT JOIN grid ON grid.r = wcell.r AND grid.cell = wcell.cell
        |  GROUP BY 1)
        |SELECT t.w AS word, t.true_count, e.est_count,
        |  e.est_count >= t.true_count AS overestimates
        |FROM top t JOIN est e USING (w)
        |ORDER BY t.true_count DESC, word""".stripMargin,

    // Repetition replay: per-n gram counts, deterministic top pick via
    // row_number, integer char-mass sums, identical IEEE ratios.
    "x61_repetition_signals" ->
      """WITH base AS (
        |  SELECT doc_id, len(text) AS n_chars, string_split(text, ' ') AS ts
        |  FROM documents),
        |g2 AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 1),
        |    i -> ts[i] || ' ' || ts[i+1])) AS g
        |  FROM base WHERE len(ts) >= 2),
        |g3 AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 2),
        |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
        |  FROM base WHERE len(ts) >= 3),
        |g5 AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 4),
        |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4])) AS g
        |  FROM base WHERE len(ts) >= 5),
        |t2 AS (
        |  SELECT doc_id, n * len(g) AS chars2 FROM (
        |    SELECT doc_id, g, COUNT(*) AS n FROM g2 GROUP BY 1, 2)
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, g ASC) = 1),
        |t3 AS (
        |  SELECT doc_id, n * len(g) AS chars3 FROM (
        |    SELECT doc_id, g, COUNT(*) AS n FROM g3 GROUP BY 1, 2)
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, g ASC) = 1),
        |d5 AS (
        |  SELECT doc_id, SUM(CASE WHEN n > 1 THEN (n - 1) * len(g) ELSE 0 END) AS chars5
        |  FROM (SELECT doc_id, g, COUNT(*) AS n FROM g5 GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT b.doc_id,
        |  round(COALESCE(chars2, 0) * 1.0 / n_chars, 6) AS top2_char_frac,
        |  round(COALESCE(chars3, 0) * 1.0 / n_chars, 6) AS top3_char_frac,
        |  round(COALESCE(chars5, 0) * 1.0 / n_chars, 6) AS dup5_char_frac,
        |  (round(COALESCE(chars2, 0) * 1.0 / n_chars, 6) > 0.20
        |   OR round(COALESCE(chars3, 0) * 1.0 / n_chars, 6) > 0.18
        |   OR round(COALESCE(chars5, 0) * 1.0 / n_chars, 6) > 0.15) AS repetitive
        |FROM base b
        |LEFT JOIN t2 ON t2.doc_id = b.doc_id
        |LEFT JOIN t3 ON t3.doc_id = b.doc_id
        |LEFT JOIN d5 ON d5.doc_id = b.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    // x47's windows with a global occurrence count instead of a
    // first-occurrence pick; ratios divide exact integers.
    "x56_duplication_score" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, md5(array_to_string(ws[i : i + 7], ' ')) AS g
        |  FROM w, unnest(generate_series(1, len(ws) - 7)) t(i)
        |  WHERE len(ws) >= 8),
        |occ AS (SELECT g, COUNT(*) AS n_occ FROM g GROUP BY 1),
        |d AS (
        |  SELECT g.doc_id, COUNT(*) AS n_windows,
        |    CAST(count_if(occ.n_occ > 1) AS BIGINT) AS n_dup
        |  FROM g JOIN occ USING (g) GROUP BY 1)
        |SELECT w.doc_id, CAST(coalesce(n_windows, 0) AS BIGINT) AS n_windows,
        |  CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_windows,
        |  round(CAST(n_dup AS DOUBLE) / n_windows, 6) AS dup_ratio
        |FROM w LEFT JOIN d USING (doc_id)
        |ORDER BY w.doc_id""".stripMargin,

    // Exact cross-set near-dup relation (corpus side < 400, batch side
    // >= 400), x02's gram/Jaccard conventions, aggregated per batch doc.
    "x50_incremental_dedup" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (
        |  SELECT DISTINCT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(ts) - 2),
        |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
        |  FROM tok),
        |nt AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
        |  FROM tri a JOIN tri b ON a.g = b.g AND a.lang = b.lang
        |  WHERE a.doc_id < 400 AND b.doc_id >= 400
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT a_id, b_id FROM pairs
        |  JOIN nt na ON a_id = na.doc_id JOIN nt nb ON b_id = nb.doc_id
        |  WHERE common * 1.0 / (na.n + nb.n - common) >= 0.5),
        |agg AS (
        |  SELECT b_id AS doc_id, MIN(a_id) AS match_id, COUNT(*) AS n_matches
        |  FROM m GROUP BY 1)
        |SELECT d.doc_id, match_id IS NULL AS kept, match_id,
        |  CAST(coalesce(n_matches, 0) AS BIGINT) AS n_matches
        |FROM (SELECT doc_id FROM documents WHERE doc_id >= 400) d
        |LEFT JOIN agg USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // Stride-1 8-word windows keyed by md5(window text); row_number over
    // (doc_id, pos) = Spark's min(struct) first-occurrence; covered word
    // positions are the interval union of non-first windows; surviving
    // words reassemble in position order. Fully-covered docs keep
    // n_kept = 0 and md5('').
    "x47_substring_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, CAST(i AS INT) AS pos,
        |    md5(array_to_string(ws[i : i + 7], ' ')) AS g
        |  FROM w, unnest(generate_series(1, len(ws) - 7)) t(i)
        |  WHERE len(ws) >= 8),
        |dups AS (
        |  SELECT doc_id, pos FROM g
        |  QUALIFY row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) > 1),
        |cov AS (
        |  SELECT DISTINCT doc_id, wp FROM (
        |    SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS wp FROM dups)),
        |words AS (
        |  SELECT doc_id, CAST(i AS INT) AS wp, ws[i] AS word
        |  FROM w, unnest(generate_series(1, len(ws))) t(i)),
        |kept AS (
        |  SELECT words.doc_id,
        |    string_agg(word, ' ' ORDER BY words.wp) AS clean_text,
        |    COUNT(*) AS n_kept
        |  FROM words LEFT JOIN cov
        |    ON cov.doc_id = words.doc_id AND cov.wp = words.wp
        |  WHERE cov.wp IS NULL
        |  GROUP BY words.doc_id)
        |SELECT w.doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
        |  md5(coalesce(clean_text, '')) AS clean_md5
        |FROM w LEFT JOIN kept USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "x39_corpus_report" ->
      """WITH f AS (
        |  SELECT lang,
        |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS ws,
        |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bp,
        |    md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
        |    (len(list_filter(string_split(text, ' '), t -> t <> '')) >= 5 AND
        |     round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |           / NULLIF(length(text), 0), 6) >= 0.5) AS passes
        |  FROM documents)
        |SELECT COUNT(*) AS n_docs,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(SUM(ws) AS BIGINT) AS total_ws_tokens,
        |  CAST(SUM(bp) AS BIGINT) AS total_bpeish_tokens,
        |  CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_exact_dups,
        |  CAST(count_if(passes) AS BIGINT) AS n_quality_pass
        |FROM f""".stripMargin,

    "x38_decontamination" ->
      """WITH tok AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8),
        |g AS (
        |  SELECT DISTINCT doc_id, source,
        |    unnest(list_transform(generate_series(1, len(ts) - 7),
        |      i -> ts[i]||' '||ts[i+1]||' '||ts[i+2]||' '||ts[i+3]||' '||
        |           ts[i+4]||' '||ts[i+5]||' '||ts[i+6]||' '||ts[i+7])) AS g
        |  FROM tok),
        |bench AS (SELECT DISTINCT g FROM g WHERE source = 'src0')
        |SELECT doc_id, COUNT(*) AS n_shared_grams
        |FROM g WHERE source <> 'src0' AND g IN (SELECT g FROM bench)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "x19_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 10 ORDER BY lang, doc_id""".stripMargin,

    "x20_pii_redaction" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{6,}', '<NUM>', 'g') AS red
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x27_dedup_keep_one" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (
        |  SELECT DISTINCT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(ts) - 2),
        |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
        |  FROM tok),
        |nt AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
        |cand AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
        |  FROM tri a JOIN tri b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT a_id, b_id FROM cand
        |  JOIN nt na ON a_id = na.doc_id JOIN nt nb ON b_id = nb.doc_id
        |  WHERE common * 1.0 / (na.n + nb.n - common) >= 0.5),
        |edges AS (SELECT a_id AS u, b_id AS v FROM p UNION SELECT b_id, a_id FROM p),
        |walk(id, reach) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT w.id, e.v FROM walk w JOIN edges e ON w.reach = e.u),
        |comp AS (SELECT id AS doc_id, MIN(reach) AS cluster_id FROM walk GROUP BY id)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN comp c ON d.doc_id = c.doc_id
        |WHERE c.doc_id = c.cluster_id
        |ORDER BY d.doc_id""".stripMargin,

    "x26_clean_corpus" ->
      """WITH q AS (
        |  SELECT doc_id, lang, source, text,
        |    CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / NULLIF(length(text), 0) AS alpha_ratio_raw
        |  FROM documents),
        |gated AS (
        |  SELECT doc_id, lang, source, n_tokens,
        |    md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |  FROM q WHERE n_tokens >= 5 AND round(alpha_ratio_raw, 6) >= 0.5),
        |deduped AS (
        |  SELECT doc_id, lang, source, n_tokens,
        |    ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
        |  FROM gated)
        |SELECT doc_id, lang, source, n_tokens
        |FROM deduped
        |WHERE rk = 1
        |  AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
        |      ('0','1','2','3','4','5','6','7')
        |ORDER BY doc_id""".stripMargin,

    "x23_source_similarity" ->
      """WITH tok AS (
        |  SELECT source, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (
        |  SELECT DISTINCT source,
        |    unnest(list_transform(generate_series(1, len(ts) - 2),
        |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
        |  FROM tok),
        |capped AS (
        |  SELECT source, g FROM tri
        |  WHERE g NOT IN (SELECT g FROM tri GROUP BY g HAVING COUNT(*) > 10)),
        |nt AS (SELECT source, COUNT(*) AS n FROM capped GROUP BY source),
        |pairs AS (
        |  SELECT a.source AS a_src, b.source AS b_src, COUNT(*) AS common
        |  FROM capped a JOIN capped b ON a.g = b.g AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT a_src, b_src,
        |  round(common * 1.0 / (na.n + nb.n - common), 6) AS jac
        |FROM pairs JOIN nt na ON a_src = na.source JOIN nt nb ON b_src = nb.source
        |ORDER BY a_src, b_src""".stripMargin,

    // Full oracle of the sketch approximation: rebuild the md5-affine
    // MinHash family (Dedup.portableMinhashSignature — integer-exact in
    // both engines), take per-(source, seed) minima over the distinct gram
    // set (= the union sketch's min-merge), and estimate Jaccard as the
    // matching-component fraction. est_jac = k/64 has ≤6 decimal digits,
    // so round(·, 6) is a no-op in both engines.
    "x24_source_sketch" ->
      """WITH seeds AS (
        |  SELECT i,
        |    CAST((CAST('0x' || substr(md5('mh:a:' || CAST(i AS VARCHAR)), 1, 8) AS UBIGINT)
        |      % 268435456) * 2 + 1 AS BIGINT) AS a,
        |    CAST(CAST('0x' || substr(md5('mh:b:' || CAST(i AS VARCHAR)), 1, 8) AS UBIGINT)
        |      % 2147483647 AS BIGINT) AS b
        |  FROM generate_series(0, 63) t(i)),
        |tok AS (
        |  SELECT source, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (
        |  SELECT DISTINCT source,
        |    unnest(list_transform(generate_series(1, len(ts) - 2),
        |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
        |  FROM tok),
        |h AS (
        |  SELECT source, CAST(CAST('0x' || substr(md5(g), 1, 8) AS UBIGINT) AS BIGINT) AS m
        |  FROM tri),
        |sig AS (
        |  SELECT source, i, MIN((a * m + b) % 2147483647) AS mn
        |  FROM h, seeds GROUP BY source, i)
        |SELECT sa.source AS a_grp, sb.source AS b_grp,
        |  round(SUM(CASE WHEN sa.mn = sb.mn THEN 1 ELSE 0 END) / 64.0, 6) AS est_jac
        |FROM sig sa JOIN sig sb ON sa.i = sb.i AND sa.source < sb.source
        |GROUP BY 1, 2 ORDER BY a_grp, b_grp""".stripMargin,

    // x03 = the LSH-accelerated exact path; with full-recall candidates
    // (OpsSpec-pinned) its output equals x02's, so it shares the oracle.
    "x03_minhash_lsh_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (
        |  SELECT DISTINCT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(ts) - 2),
        |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
        |  FROM tok),
        |nt AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
        |  FROM tri a JOIN tri b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id, common, na.n AS na, nb.n AS nb,
        |       common * 1.0 / (na.n + nb.n - common) AS jac
        |FROM pairs JOIN nt na ON a_id = na.doc_id JOIN nt nb ON b_id = nb.doc_id
        |WHERE common * 1.0 / (na.n + nb.n - common) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,

    // Full oracle of the simhash output: rebuild every fingerprint from
    // the md5 token hash (two 32-bit halves — Dedup.simhash63's exact bit
    // layout: hex 9-16 → bits 0..31, hex 1-8 → bits 32..62), majority-vote
    // per bit (token MULTIPLICITY counts — no DISTINCT), then brute-force
    // all pairs at hamming<=3 (the 8-chunk blocking is exact for <=7, so
    // blocked == all-pairs). Token-less docs keep fp=0 via the LEFT JOIN,
    // matching the Spark fold over an empty array.
    "x04_simhash_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    CAST(CAST('0x' || substr(md5(t), 9, 8) AS UBIGINT) AS BIGINT) AS lo,
        |    CAST(CAST('0x' || substr(md5(t), 1, 8) AS UBIGINT) AS BIGINT) AS hi
        |  FROM tok),
        |votes AS (
        |  SELECT doc_id, b,
        |    SUM(CASE WHEN (CASE WHEN b < 32 THEN lo >> b ELSE hi >> (b - 32) END) & 1 = 1
        |             THEN 1 ELSE -1 END) AS v
        |  FROM h, generate_series(0, 62) s(b)
        |  GROUP BY doc_id, b),
        |fp AS (
        |  SELECT d.doc_id,
        |    COALESCE(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END), 0) AS fp
        |  FROM documents d LEFT JOIN votes USING (doc_id) GROUP BY d.doc_id)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  bit_count(xor(a.fp, b.fp)) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,

    // x34 = the LSH-candidate scale pipeline; with full-recall candidates
    // its retention set equals the exact path's, so it shares x27's oracle.
    "x34_dedup_scale_path" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (
        |  SELECT DISTINCT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(ts) - 2),
        |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
        |  FROM tok),
        |nt AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
        |cand AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
        |  FROM tri a JOIN tri b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT a_id, b_id FROM cand
        |  JOIN nt na ON a_id = na.doc_id JOIN nt nb ON b_id = nb.doc_id
        |  WHERE common * 1.0 / (na.n + nb.n - common) >= 0.5),
        |edges AS (SELECT a_id AS u, b_id AS v FROM p UNION SELECT b_id, a_id FROM p),
        |walk(id, reach) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT w.id, e.v FROM walk w JOIN edges e ON w.reach = e.u),
        |comp AS (SELECT id AS doc_id, MIN(reach) AS cluster_id FROM walk GROUP BY id)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN comp c ON d.doc_id = c.doc_id
        |WHERE c.doc_id = c.cluster_id
        |ORDER BY d.doc_id""".stripMargin,

    "x35_salted_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "x28_hll_union" ->
      """SELECT COUNT(DISTINCT source) AS exact_total_sources,
        |  CAST((SELECT SUM(n) FROM (
        |     SELECT COUNT(DISTINCT source) AS n FROM documents GROUP BY lang))
        |   AS BIGINT) AS sum_per_lang_exact,
        |  TRUE AS approx_within_5pct
        |FROM documents""".stripMargin,

    "x22_tfidf_terms" ->
      """WITH terms AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct(list_filter(string_split(lower(text), ' '), t -> t <> ''))) AS term
        |  FROM documents),
        |dfq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY term),
        |tfq AS (SELECT source, term, COUNT(*) AS tf FROM terms GROUP BY source, term),
        |tot AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT source, term, tf, df,
        |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        |  FROM tfq JOIN dfq USING (term) CROSS JOIN tot),
        |ranked AS (
        |  SELECT source, term, tf, df, tfidf,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY tfidf DESC, term ASC) AS rk
        |  FROM scored)
        |SELECT source, CAST(rk AS INT) AS rk, term, tf, df, tfidf
        |FROM ranked WHERE rk <= 5 ORDER BY source, rk""".stripMargin,

    "x21_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        |errors AS (
        |  SELECT user_id, ts AS err_ts, MAX(value) AS err_value
        |  FROM events WHERE event_type = 'error' GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id, c.ts, c.value, e.err_ts, e.err_value
        |FROM clicks c ASOF LEFT JOIN errors e
        |  ON c.user_id = e.user_id AND c.ts >= e.err_ts
        |ORDER BY c.event_id""".stripMargin,

    // BM25 replay: tf/df/dl/N exact integers; idf's ln argument is one
    // IEEE division of integer-derived doubles; the score chain mirrors
    // the Spark expression op-for-op; per-term floor(s*1e9) longs sum
    // order-free; the top-20 cut is on the integer score.
    "x64_bm25_topk" ->
      """WITH b2 AS (
        |  SELECT doc_id, len(ts) AS dl, ts FROM (
        |    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |    FROM documents)),
        |stats AS (SELECT COUNT(*) AS nd, SUM(dl) AS ntok FROM b2),
        |tf AS (
        |  SELECT doc_id, dl, w, COUNT(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(ts) AS w FROM b2)
        |  WHERE w IN ('hash', 'join', 'spark', 'vector')
        |  GROUP BY 1, 2, 3),
        |dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT t.doc_id,
        |    CAST(floor(
        |      ((ln(CAST(2 * s.nd - 2 * d.df + 1 AS DOUBLE) / CAST(2 * d.df + 1 AS DOUBLE))
        |        * (CAST(t.tf AS DOUBLE) * CAST(2.2 AS DOUBLE)))
        |       / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
        |          (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
        |           (CAST(t.dl * s.nd AS DOUBLE) / CAST(s.ntok AS DOUBLE)))))
        |      * 1000000000.0) AS BIGINT) AS sfix
        |  FROM tf t JOIN dfq d USING (w) CROSS JOIN stats s),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_terms, SUM(sfix) AS score_fix
        |  FROM scored GROUP BY 1)
        |SELECT doc_id, n_terms,
        |  round(CAST(score_fix AS DOUBLE) / 1000000000.0, 6) AS bm25,
        |  CAST(score_fix AS BIGINT) AS score_fix
        |FROM agg ORDER BY score_fix DESC, doc_id ASC LIMIT 20""".stripMargin,

    // Hybrid RRF replay: the BM25 rank list re-derives x64's integer
    // scores over doc_id <> 0, the cosine rank list re-derives x05's
    // rounded cosines over vec_id <> 0, and each fusion term is
    // floor-of-one-IEEE-division — identical arithmetic both engines.
    "x65_hybrid_rrf_topk" ->
      """WITH b2 AS (
        |  SELECT doc_id, len(ts) AS dl, ts FROM (
        |    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |    FROM documents WHERE doc_id <> 0)),
        |stats AS (SELECT COUNT(*) AS nd, SUM(dl) AS ntok FROM b2),
        |tf AS (
        |  SELECT doc_id, dl, w, COUNT(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(ts) AS w FROM b2)
        |  WHERE w IN ('hash', 'join', 'spark', 'vector')
        |  GROUP BY 1, 2, 3),
        |dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT t.doc_id,
        |    CAST(floor(
        |      ((ln(CAST(2 * s.nd - 2 * d.df + 1 AS DOUBLE) / CAST(2 * d.df + 1 AS DOUBLE))
        |        * (CAST(t.tf AS DOUBLE) * CAST(2.2 AS DOUBLE)))
        |       / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
        |          (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
        |           (CAST(t.dl * s.nd AS DOUBLE) / CAST(s.ntok AS DOUBLE)))))
        |      * 1000000000.0) AS BIGINT) AS sfix
        |  FROM tf t JOIN dfq d USING (w) CROSS JOIN stats s),
        |agg AS (
        |  SELECT doc_id, SUM(sfix) AS score_fix FROM scored GROUP BY 1),
        |tr AS (
        |  SELECT doc_id AS id,
        |    row_number() OVER (ORDER BY score_fix DESC, doc_id ASC) AS text_rank
        |  FROM agg QUALIFY text_rank <= 100),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings WHERE vec_id <> 0),
        |cs AS (
        |  SELECT vec_id,
        |    round(
        |      list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * qv[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * v[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))),
        |    6) AS cos_sim
        |  FROM e, q ORDER BY cos_sim DESC, vec_id ASC LIMIT 100),
        |vr AS (
        |  SELECT vec_id AS id,
        |    row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS vec_rank
        |  FROM cs),
        |fused AS (
        |  SELECT COALESCE(tr.id, vr.id) AS id, tr.text_rank, vr.vec_rank,
        |    COALESCE(CAST(floor(1000000000000.0 / (CAST(tr.text_rank AS DOUBLE) + 60.0)) AS BIGINT), 0)
        |  + COALESCE(CAST(floor(1000000000000.0 / (CAST(vr.vec_rank AS DOUBLE) + 60.0)) AS BIGINT), 0) AS rrf_fix
        |  FROM tr FULL OUTER JOIN vr ON tr.id = vr.id)
        |SELECT id AS doc_id, text_rank, vec_rank,
        |  round(CAST(rrf_fix AS DOUBLE) / 1000000000000.0, 6) AS rrf, rrf_fix
        |FROM fused ORDER BY rrf_fix DESC, id ASC LIMIT 10""".stripMargin,

    // Shard-manifest replay: md5 shard hash, token counts, and the
    // commuting content-hash sum are all exact integer arithmetic.
    "x66_shard_manifest" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS BIGINT) % 8 AS shard,
        |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS ntok,
        |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 8) AS UBIGINT) AS BIGINT) AS chk
        |  FROM documents)
        |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
        |  CAST(SUM(chk) AS BIGINT) AS checksum
        |FROM d GROUP BY shard ORDER BY shard""".stripMargin,

    // SemDeDup replay: the two fixed-point Lloyd rounds are x25's CTE
    // chain verbatim (over the whole corpus — no query row here); the
    // within-cell pair step, the recursive component walk, and the
    // least-similar-to-centroid keeper pick are all over rounded
    // cosines and integer ids.
    "x67_semdedup" ->
      """WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, v AS cv FROM e
        |       ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
        |       LIMIT (SELECT GREATEST(4, CAST(floor(0.35 * sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)) FROM e)),
        |a1 AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c0.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c0.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(c0.cv)), i -> c0.cv[i] * c0.cv[i])))) DESC,
        |        c0.cid ASC) AS rk
        |    FROM e, c0) WHERE rk = 1),
        |c1 AS (
        |  SELECT cid, list(m ORDER BY pos) AS cv FROM (
        |    SELECT cid, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS m FROM (
        |      SELECT cid, pos,
        |        2 * CAST(SUM(CAST(floor(vv * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM (SELECT cid, unnest(generate_series(1, len(v))) AS pos, unnest(v) AS vv FROM a1)
        |      GROUP BY cid, pos)) GROUP BY cid),
        |a2 AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c1.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c1.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(c1.cv)), i -> c1.cv[i] * c1.cv[i])))) DESC,
        |        c1.cid ASC) AS rk
        |    FROM e, c1) WHERE rk = 1),
        |c2 AS (
        |  SELECT cid, list(m ORDER BY pos) AS cv FROM (
        |    SELECT cid, pos, ((u - ((u % n2) + n2) % n2) / n2) / 1000000.0 AS m FROM (
        |      SELECT cid, pos,
        |        2 * CAST(SUM(CAST(floor(vv * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) + COUNT(*) AS u,
        |        2 * COUNT(*) AS n2
        |      FROM (SELECT cid, unnest(generate_series(1, len(v))) AS pos, unnest(v) AS vv FROM a2)
        |      GROUP BY cid, pos)) GROUP BY cid),
        |a3 AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c2.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * c2.cv[i])) /
        |          (sqrt(list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * e.v[i]))) *
        |           sqrt(list_sum(list_transform(generate_series(1, len(c2.cv)), i -> c2.cv[i] * c2.cv[i])))) DESC,
        |        c2.cid ASC) AS rk
        |    FROM e, c2) WHERE rk = 1),
        |p AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM a3 a JOIN a3 b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  WHERE round(
        |      list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, len(b.v)), i -> b.v[i] * b.v[i])))),
        |    6) >= 0.45),
        |edges AS (SELECT a_id AS u, b_id AS w FROM p UNION SELECT b_id, a_id FROM p),
        |walk(id, reach) AS (
        |  SELECT vec_id, vec_id FROM e
        |  UNION
        |  SELECT wk.id, ed.w FROM walk wk JOIN edges ed ON wk.reach = ed.u),
        |comps AS (SELECT id, MIN(reach) AS cluster_id FROM walk GROUP BY id),
        |cc AS (
        |  SELECT a.vec_id, round(
        |      list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * c2.cv[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i]))) *
        |       sqrt(list_sum(list_transform(generate_series(1, len(c2.cv)), i -> c2.cv[i] * c2.cv[i])))),
        |    6) AS cent_cos
        |  FROM a3 a JOIN c2 ON a.cid = c2.cid),
        |keeper AS (
        |  SELECT cluster_id, id AS keep_id FROM (
        |    SELECT comps.cluster_id, comps.id,
        |      row_number() OVER (PARTITION BY comps.cluster_id
        |        ORDER BY cc.cent_cos ASC, comps.id ASC) AS rk
        |    FROM comps JOIN cc ON comps.id = cc.vec_id) WHERE rk = 1)
        |SELECT comps.id AS vec_id, comps.cluster_id, cc.cent_cos,
        |  comps.id = keeper.keep_id AS kept
        |FROM comps JOIN cc ON comps.id = cc.vec_id
        |JOIN keeper USING (cluster_id)
        |ORDER BY vec_id""".stripMargin,

    // Curriculum replay: x48's nll CTEs, then the total-order rank, the
    // integer bucket cut, and the per-bucket aggregates.
    "x69_curriculum_manifest" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |tr AS (
        |  SELECT doc_id, ts[i] AS prev, ts[i+1] AS cur
        |  FROM tok, unnest(generate_series(1, len(ts) - 1)) u(i)
        |  WHERE len(ts) >= 2),
        |uni AS (SELECT prev, COUNT(*) AS cu FROM tr GROUP BY 1),
        |bi AS (SELECT prev, cur, COUNT(*) AS cb FROM tr GROUP BY 1, 2),
        |v AS (SELECT COUNT(DISTINCT w) AS vsz
        |      FROM (SELECT unnest(ts) AS w FROM tok)),
        |lp AS (
        |  SELECT tr.doc_id,
        |    CAST(floor(ln((bi.cb + 1.0) / (uni.cu + v.vsz)) * 1000000000000.0) AS BIGINT) AS lp_fix
        |  FROM tr
        |  JOIN uni ON uni.prev = tr.prev
        |  JOIN bi ON bi.prev = tr.prev AND bi.cur = tr.cur, v),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_transitions, SUM(lp_fix) AS sfix
        |  FROM lp GROUP BY 1),
        |scored AS (
        |  SELECT doc_id, n_transitions,
        |    round(CAST(-sfix AS DOUBLE) / 1000000000000.0 / n_transitions, 6) AS nll_nats
        |  FROM agg WHERE n_transitions > 0),
        |ranked AS (
        |  SELECT doc_id, n_transitions, nll_nats,
        |    row_number() OVER (ORDER BY nll_nats ASC, doc_id ASC) AS rn,
        |    COUNT(*) OVER () AS m
        |  FROM scored)
        |SELECT ((rn - 1) * 10) // m AS bucket, COUNT(*) AS n_docs,
        |  CAST(SUM(n_transitions) AS BIGINT) AS n_transitions,
        |  MIN(nll_nats) AS nll_lo, MAX(nll_nats) AS nll_hi
        |FROM ranked GROUP BY 1 ORDER BY bucket""".stripMargin,

    // Threshold-curriculum replay: x48's nll chain verbatim, the bucket
    // a sum of literal comparisons against the frozen cuts — no window.
    "x156_curriculum_threshold" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |tr AS (
        |  SELECT doc_id, ts[i] AS prev, ts[i+1] AS cur
        |  FROM tok, unnest(generate_series(1, len(ts) - 1)) u(i)
        |  WHERE len(ts) >= 2),
        |uni AS (SELECT prev, COUNT(*) AS cu FROM tr GROUP BY 1),
        |bi AS (SELECT prev, cur, COUNT(*) AS cb FROM tr GROUP BY 1, 2),
        |v AS (SELECT COUNT(DISTINCT w) AS vsz
        |      FROM (SELECT unnest(ts) AS w FROM tok)),
        |lp AS (
        |  SELECT tr.doc_id,
        |    CAST(floor(ln((bi.cb + 1.0) / (uni.cu + v.vsz)) * 1000000000000.0) AS BIGINT) AS lp_fix
        |  FROM tr
        |  JOIN uni ON uni.prev = tr.prev
        |  JOIN bi ON bi.prev = tr.prev AND bi.cur = tr.cur, v),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_transitions, SUM(lp_fix) AS sfix
        |  FROM lp GROUP BY 1),
        |scored AS (
        |  SELECT doc_id, n_transitions,
        |    round(CAST(-sfix AS DOUBLE) / 1000000000000.0 / n_transitions, 6) AS nll_nats
        |  FROM agg WHERE n_transitions > 0)
        |SELECT CAST(
        |    CAST(nll_nats >= CAST(3.3500005 AS DOUBLE) AS INT)
        |  + CAST(nll_nats >= CAST(3.3800005 AS DOUBLE) AS INT)
        |  + CAST(nll_nats >= CAST(3.4000005 AS DOUBLE) AS INT)
        |  + CAST(nll_nats >= CAST(3.4500005 AS DOUBLE) AS INT) AS INT) AS bucket,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_transitions) AS BIGINT) AS n_transitions,
        |  MIN(nll_nats) AS nll_lo, MAX(nll_nats) AS nll_hi
        |FROM scored GROUP BY 1 ORDER BY bucket""".stripMargin,

    // k-NN graph replay: x45's band arithmetic at the 16×4-bit dial
    // (planes 0..63, j = b div 4, bit 1 << (3 − b mod 4)) with the
    // corpus on both sides of the candidate join (a ≠ b), then exact
    // rounded cosines and per-source ranks.
    "x68_knn_graph" -> bandedGraphSql(
      """SELECT src_id, nbr_id, cos_sim, rank FROM graph
        |ORDER BY src_id, rank""".stripMargin),

    // Mutual-kNN pairs: the x68 graph CTE self-joined on the reversed
    // key pair, a < b canonical direction.
    "x92_knn_mutual_pairs" -> bandedGraphSql(
      """SELECT g1.src_id AS a_id, g1.nbr_id AS b_id, g1.cos_sim
        |FROM graph g1
        |JOIN graph g2 ON g1.src_id = g2.nbr_id AND g1.nbr_id = g2.src_id
        |WHERE g1.src_id < g1.nbr_id
        |ORDER BY a_id, b_id""".stripMargin),

    // PageRank replay: the x68 graph CTE as the edge set, then 5
    // unrolled fixed-point iterations — init/base/contributions are
    // BIGINT floor divisions on non-negative values (Graph.pageRank
    // scaladoc), so every CTE is exact integer arithmetic; SUMs cast
    // back from HUGEINT.
    "x93_pagerank_knn" -> bandedGraphSql(
      (1 to 5).map(t =>
        s"""m$t AS (
           |  SELECT ge.d AS nid,
           |    CAST(SUM(((p.pr_fix * 85) // 100) // od.od) AS BIGINT) AS s
           |  FROM ge JOIN pr${t - 1} p ON ge.s = p.nid JOIN od ON ge.s = od.s
           |  GROUP BY ge.d),
           |pr$t AS (
           |  SELECT i.nid, (SELECT base FROM c) + COALESCE(m$t.s, 0) AS pr_fix
           |  FROM ids i LEFT JOIN m$t USING (nid))""".stripMargin)
        .mkString(
          """, ids AS (SELECT vec_id AS nid FROM e),
            |c AS (
            |  SELECT 1000000000000 // cnt AS init,
            |    ((1000000000000 * 15) // 100) // cnt AS base
            |  FROM (SELECT COUNT(*) AS cnt FROM ids)),
            |ge AS (SELECT src_id AS s, nbr_id AS d FROM graph),
            |od AS (SELECT s, COUNT(*) AS od FROM ge GROUP BY 1),
            |pr0 AS (SELECT nid, (SELECT init FROM c) AS pr_fix FROM ids),
            |""".stripMargin, ",\n", """
            |SELECT nid AS vec_id, pr_fix,
            |  round(CAST(pr_fix AS DOUBLE) / 1000000000000.0, 6) AS pr
            |FROM pr5 ORDER BY vec_id""".stripMargin)),

    // Label-propagation replay: 3 unrolled majority rounds — integer
    // counts, (count DESC, label ASC) ties, clamped seeds.
    "x94_label_prop_knn" -> bandedGraphSql(
      (1 to 3).map(t =>
        s"""m$t AS (
           |  SELECT ge.s AS nid, p.cur AS lbl, COUNT(*) AS cnt
           |  FROM ge JOIN l${t - 1} p ON ge.d = p.nid
           |  WHERE p.cur IS NOT NULL GROUP BY 1, 2),
           |b$t AS (
           |  SELECT nid, lbl FROM (
           |    SELECT nid, lbl, row_number() OVER (
           |      PARTITION BY nid ORDER BY cnt DESC, lbl ASC) AS rk
           |    FROM m$t) WHERE rk = 1),
           |l$t AS (
           |  SELECT l${t - 1}.nid, l${t - 1}.seed,
           |    COALESCE(l${t - 1}.seed, b$t.lbl, l${t - 1}.cur) AS cur
           |  FROM l${t - 1} LEFT JOIN b$t USING (nid))""".stripMargin)
        .mkString(
          """, seeds AS (
            |  SELECT vec_id AS nid,
            |    CASE WHEN vec_id % 5 = 0 THEN label END AS seed
            |  FROM embeddings),
            |ge AS (SELECT src_id AS s, nbr_id AS d FROM graph),
            |l0 AS (SELECT nid, seed, seed AS cur FROM seeds),
            |""".stripMargin, ",\n", """
            |SELECT nid AS vec_id, cur AS label,
            |  CASE WHEN seed IS NOT NULL THEN 'seed'
            |       WHEN cur IS NOT NULL THEN 'prop' END AS origin
            |FROM l3 ORDER BY vec_id""".stripMargin)),

    // MMR replay: exact cosine candidates (top-10 per query), then the
    // greedy rounds unrolled — each round anti-joins the selected set,
    // takes the MAX fixed-point penalty against it, and argmaxes
    // rel − pen with (DESC, vec_id ASC) ties. All longs.
    "x95_mmr_rerank" -> {
      def cosFix(a: String, b: String): String =
        s"CAST(floor(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])) / " +
          s"(sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $a[i]))) * " +
          s"sqrt(list_sum(list_transform(generate_series(1, len($b)), i -> $b[i] * $b[i])))) * 500000000.0) AS BIGINT)"
      val rounds = (2 to 5).map { t =>
        s"""pool$t AS (
           |  SELECT c2.q_id, c2.vec_id, ANY_VALUE(c2.v) AS v,
           |    ANY_VALUE(c2.rel_half) AS rel_half,
           |    MAX(${cosFix("c2.v", "u.v")}) AS pen
           |  FROM cand c2 JOIN u${t - 1} u USING (q_id)
           |  WHERE NOT EXISTS (SELECT 1 FROM u${t - 1} x
           |    WHERE x.q_id = c2.q_id AND x.vec_id = c2.vec_id)
           |  GROUP BY c2.q_id, c2.vec_id),
           |s$t AS (
           |  SELECT q_id, $t AS sel_rank, vec_id, rel_half,
           |    rel_half - pen AS mmr_fix, v
           |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
           |      ORDER BY rel_half - pen DESC, vec_id ASC) AS rk FROM pool$t)
           |  WHERE rk = 1),
           |u$t AS (SELECT * FROM u${t - 1} UNION ALL SELECT * FROM s$t)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
         |c AS (SELECT vec_id, v FROM e WHERE vec_id % 100 <> 0),
         |rel AS (
         |  SELECT q.q_id, c.vec_id, c.v,
         |    ${cosFix("q.qv", "c.v")} AS rel_half
         |  FROM q, c),
         |cand AS (
         |  SELECT q_id, vec_id, v, rel_half
         |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
         |      ORDER BY rel_half DESC, vec_id ASC) AS rk FROM rel)
         |  WHERE rk <= 10),
         |s1 AS (
         |  SELECT q_id, 1 AS sel_rank, vec_id, rel_half,
         |    rel_half AS mmr_fix, v
         |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
         |      ORDER BY rel_half DESC, vec_id ASC) AS rk FROM cand)
         |  WHERE rk = 1),
         |u1 AS (SELECT * FROM s1),
         |$rounds
         |SELECT q_id, sel_rank, vec_id, rel_half, mmr_fix,
         |  round(CAST(mmr_fix AS DOUBLE) / 500000000.0, 6) AS mmr
         |FROM u5 ORDER BY q_id, sel_rank""".stripMargin
    },

    // RM3 replay: x64's tf/df/score arithmetic over the full postings,
    // feedback top-5 cut, expansion mining (Σtf DESC, w ASC), the
    // half-weight rescore (⌊s·5·10⁸⌋ — the ½ folded into the floor
    // scale), and the full-outer combine.
    "x96_bm25_rm3" -> {
      def sc(scale: String): String =
        s"""CAST(floor(
           |      ((ln(CAST(2 * s.nd - 2 * d.df + 1 AS DOUBLE) / CAST(2 * d.df + 1 AS DOUBLE))
           |        * (CAST(t.tf AS DOUBLE) * CAST(2.2 AS DOUBLE)))
           |       / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
           |          (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
           |           (CAST(t.dl * s.nd AS DOUBLE) / CAST(s.ntok AS DOUBLE)))))
           |      * $scale) AS BIGINT)""".stripMargin
      s"""WITH b2 AS (
         |  SELECT doc_id, len(ts) AS dl, ts FROM (
         |    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
         |    FROM documents)),
         |stats AS (SELECT COUNT(*) AS nd, SUM(dl) AS ntok FROM b2),
         |post AS (
         |  SELECT doc_id, dl, w, COUNT(*) AS tf
         |  FROM (SELECT doc_id, dl, unnest(ts) AS w FROM b2)
         |  GROUP BY 1, 2, 3),
         |dfall AS (SELECT w, COUNT(*) AS df FROM post GROUP BY 1),
         |orig AS (
         |  SELECT doc_id, COUNT(*) AS n_orig, SUM(sfix) AS orig_fix FROM (
         |    SELECT t.doc_id, ${sc("1000000000.0")} AS sfix
         |    FROM post t JOIN dfall d USING (w) CROSS JOIN stats s
         |    WHERE t.w IN ('hash', 'join')) GROUP BY 1),
         |fb AS (SELECT doc_id FROM orig ORDER BY orig_fix DESC, doc_id ASC LIMIT 5),
         |expsel AS (
         |  SELECT w, fb_tf FROM (
         |    SELECT p.w, SUM(p.tf) AS fb_tf
         |    FROM post p JOIN fb USING (doc_id)
         |    WHERE p.w NOT IN ('hash', 'join') GROUP BY 1)
         |  ORDER BY fb_tf DESC, w ASC LIMIT 3),
         |expstr AS (SELECT string_agg(w, ',' ORDER BY fb_tf DESC, w ASC) AS exp_terms FROM expsel),
         |expsc AS (
         |  SELECT doc_id, COUNT(*) AS n_exp, SUM(efix) AS exp_fix FROM (
         |    SELECT t.doc_id, ${sc("500000000.0")} AS efix
         |    FROM post t JOIN expsel e ON t.w = e.w
         |    JOIN dfall d ON t.w = d.w CROSS JOIN stats s) GROUP BY 1),
         |comb AS (
         |  SELECT COALESCE(o.doc_id, x.doc_id) AS doc_id,
         |    CAST(COALESCE(o.n_orig, 0) + COALESCE(x.n_exp, 0) AS BIGINT) AS n_terms,
         |    CAST(COALESCE(o.orig_fix, 0) + COALESCE(x.exp_fix, 0) AS BIGINT) AS score_fix
         |  FROM orig o FULL JOIN expsc x ON o.doc_id = x.doc_id)
         |SELECT doc_id, n_terms,
         |  round(CAST(score_fix AS DOUBLE) / 1000000000.0, 6) AS bm25,
         |  score_fix, (SELECT exp_terms FROM expstr) AS exp_terms
         |FROM comb ORDER BY score_fix DESC, doc_id ASC LIMIT 20""".stripMargin
    },

    // Personalized-PageRank replay: x93's unrolled fixed-point
    // iterations with init and teleport gated to the seed set.
    "x97_ppr_knn" -> bandedGraphSql(
      (1 to 5).map(t =>
        s"""m$t AS (
           |  SELECT ge.d AS nid,
           |    CAST(SUM(((p.pr_fix * 85) // 100) // od.od) AS BIGINT) AS s
           |  FROM ge JOIN pr${t - 1} p ON ge.s = p.nid JOIN od ON ge.s = od.s
           |  GROUP BY ge.d),
           |pr$t AS (
           |  SELECT i.nid,
           |    CASE WHEN sd.nid IS NOT NULL THEN (SELECT base FROM c)
           |         ELSE 0 END + COALESCE(m$t.s, 0) AS pr_fix
           |  FROM ids i LEFT JOIN sd USING (nid)
           |  LEFT JOIN m$t USING (nid))""".stripMargin)
        .mkString(
          """, ids AS (SELECT vec_id AS nid FROM e),
            |sd AS (SELECT nid FROM ids WHERE nid % 25 = 0),
            |c AS (
            |  SELECT 1000000000000 // cnt AS init,
            |    ((1000000000000 * 15) // 100) // cnt AS base
            |  FROM (SELECT COUNT(*) AS cnt FROM sd)),
            |ge AS (SELECT src_id AS s, nbr_id AS d FROM graph),
            |od AS (SELECT s, COUNT(*) AS od FROM ge GROUP BY 1),
            |pr0 AS (
            |  SELECT i.nid,
            |    CASE WHEN sd.nid IS NOT NULL THEN (SELECT init FROM c)
            |         ELSE 0 END AS pr_fix
            |  FROM ids i LEFT JOIN sd USING (nid)),
            |""".stripMargin, ",\n", """
            |SELECT nid AS vec_id, pr_fix,
            |  round(CAST(pr_fix AS DOUBLE) / 1000000000000.0, 6) AS pr
            |FROM pr5 ORDER BY vec_id""".stripMargin)),

    // k-center replay: smallest-id seed, then each farthest-point
    // round unrolled — anti-join the selected set, MAX fixed-point
    // cosine against it, argmin (cov ASC, vec_id ASC) via LIMIT 1.
    "x98_kcenter_coreset" -> {
      def cosFix(a: String, b: String): String =
        s"CAST(floor(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])) / " +
          s"(sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $a[i]))) * " +
          s"sqrt(list_sum(list_transform(generate_series(1, len($b)), i -> $b[i] * $b[i])))) * 1000000000.0) AS BIGINT)"
      val rounds = (2 to 8).map { t =>
        s"""pool$t AS (
           |  SELECT c2.vec_id, ANY_VALUE(c2.v) AS v,
           |    MAX(${cosFix("c2.v", "u.v")}) AS cov
           |  FROM e c2 JOIN u${t - 1} u ON TRUE
           |  WHERE NOT EXISTS (SELECT 1 FROM u${t - 1} x
           |    WHERE x.vec_id = c2.vec_id)
           |  GROUP BY c2.vec_id),
           |s$t AS (
           |  SELECT $t AS sel_rank, vec_id, cov AS cov_fix, v
           |  FROM pool$t ORDER BY cov ASC, vec_id ASC LIMIT 1),
           |u$t AS (SELECT * FROM u${t - 1} UNION ALL SELECT * FROM s$t)""".stripMargin
      }.mkString(",\n")
      materializeCtes(
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |s1 AS (
           |  SELECT 1 AS sel_rank, vec_id, CAST(NULL AS BIGINT) AS cov_fix, v
           |  FROM e ORDER BY vec_id ASC LIMIT 1),
           |u1 AS (SELECT * FROM s1),
           |$rounds
           |SELECT sel_rank, vec_id, cov_fix,
           |  round(CAST(cov_fix AS DOUBLE) / 1000000000.0, 6) AS cov
           |FROM u8 ORDER BY sel_rank""".stripMargin)
    },

    // Graph-curated dedup replay: the graph CTE feeds the ≥0.4 mutual
    // pairs, the x16-convention recursive min-label components, AND
    // x93's fixed-point PageRank chain; the keeper is the per-cluster
    // (pr_fix DESC, id ASC) argmax. WITH → WITH RECURSIVE for the walk.
    "x99_graph_dedup_keeper" -> graphKeeperSql(
      """,
        |prsc AS (
        |  SELECT comps.id, comps.cluster_id, pr5.pr_fix
        |  FROM comps JOIN pr5 ON comps.id = pr5.nid),
        |keeper AS (
        |  SELECT cluster_id, id AS keep_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY cluster_id
        |      ORDER BY pr_fix DESC, id ASC) AS rk FROM prsc)
        |  WHERE rk = 1)
        |SELECT s2.id AS vec_id, s2.cluster_id, s2.pr_fix,
        |  s2.id = k.keep_id AS kept
        |FROM prsc s2 JOIN keeper k USING (cluster_id)
        |ORDER BY vec_id""".stripMargin),

    // p04: the graph-curation chain's KEPT set feeding x66's manifest
    // arithmetic over the kept documents' raw texts — the graph-side
    // curate→export contract as one replay (p02 is the text-side twin).
    "p04_graph_curate_export" -> graphKeeperSql(
      """,
        |prsc AS (
        |  SELECT comps.id, comps.cluster_id, pr5.pr_fix
        |  FROM comps JOIN pr5 ON comps.id = pr5.nid),
        |keeper AS (
        |  SELECT cluster_id, id AS keep_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY cluster_id
        |      ORDER BY pr_fix DESC, id ASC) AS rk FROM prsc)
        |  WHERE rk = 1)
        |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
        |  CAST(SUM(chk) AS BIGINT) AS checksum
        |FROM (
        |  SELECT d.doc_id,
        |    CAST(CAST('0x' || substr(md5('shard:' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS BIGINT) % 8 AS shard,
        |    len(list_filter(string_split(d.text, ' '), t -> t <> '')) AS ntok,
        |    CAST(CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || d.text), 1, 8) AS UBIGINT) AS BIGINT) AS chk
        |  FROM documents d JOIN keeper k2 ON d.doc_id = k2.keep_id)
        |GROUP BY shard ORDER BY shard""".stripMargin),


    // Weighted-PageRank replay: x93's rounds with the per-source
    // weight-sum split — all operands non-negative longs.
    "x106_weighted_pagerank" -> bandedGraphSql(
      (1 to 5).map(t =>
        s"""m$t AS (
           |  SELECT ge.d AS nid,
           |    CAST(SUM((((p.pr_fix * 85) // 100) * ge.w) // ws.ws) AS BIGINT) AS s
           |  FROM ge JOIN pr${t - 1} p ON ge.s = p.nid JOIN ws ON ge.s = ws.s
           |  GROUP BY ge.d),
           |pr$t AS (
           |  SELECT i.nid, (SELECT base FROM c) + COALESCE(m$t.s, 0) AS pr_fix
           |  FROM ids i LEFT JOIN m$t USING (nid))""".stripMargin)
        .mkString(
          """, ids AS (SELECT vec_id AS nid FROM e),
            |c AS (
            |  SELECT 1000000000000 // cnt AS init,
            |    ((1000000000000 * 15) // 100) // cnt AS base
            |  FROM (SELECT COUNT(*) AS cnt FROM ids)),
            |ge AS (
            |  SELECT src_id AS s, nbr_id AS d,
            |    GREATEST(0, CAST(floor(cos_sim * 1000000) AS BIGINT)) + 1 AS w
            |  FROM graph),
            |ws AS (SELECT s, CAST(SUM(w) AS BIGINT) AS ws FROM ge GROUP BY 1),
            |pr0 AS (SELECT nid, (SELECT init FROM c) AS pr_fix FROM ids),
            |""".stripMargin, ",\n", """
            |SELECT nid AS vec_id, pr_fix,
            |  round(CAST(pr_fix AS DOUBLE) / 1000000000000.0, 6) AS pr
            |FROM pr5 ORDER BY vec_id""".stripMargin)),

    // Assortativity replay: both edge orientations, endpoint degrees,
    // six exact integer sums, the guarded Pearson expression.
    "x107_assortativity" -> bandedGraphSql(
      """, mp AS (
        |  SELECT g1.src_id AS a_id, g1.nbr_id AS b_id
        |  FROM graph g1
        |  JOIN graph g2 ON g1.src_id = g2.nbr_id AND g1.nbr_id = g2.src_id
        |  WHERE g1.src_id < g1.nbr_id),
        |und AS (SELECT a_id AS u, b_id AS v FROM mp
        |        UNION ALL SELECT b_id, a_id FROM mp),
        |deg AS (SELECT u, COUNT(*) AS dg FROM und GROUP BY 1),
        |xy AS (
        |  SELECT da.dg AS dx, db.dg AS dy
        |  FROM und JOIN deg da ON da.u = und.u JOIN deg db ON db.u = und.v),
        |st AS (
        |  SELECT COUNT(*) AS m, CAST(SUM(dx) AS BIGINT) AS sx,
        |    CAST(SUM(dy) AS BIGINT) AS sy,
        |    CAST(SUM(dx * dy) AS BIGINT) AS sxy,
        |    CAST(SUM(dx * dx) AS BIGINT) AS sxx,
        |    CAST(SUM(dy * dy) AS BIGINT) AS syy
        |  FROM xy)
        |SELECT m AS n_edges,
        |  CASE WHEN m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
        |       THEN round(CAST(m * sxy - sx * sy AS DOUBLE) /
        |                  (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
        |                   sqrt(CAST(m * syy - sy * sy AS DOUBLE))), 6)
        |  END AS assortativity
        |FROM st""".stripMargin),

    // Link-score replay: mutual pairs, the pair × neighborhood chain,
    // degree frames, ⌊10⁹/ln(1+deg_in)⌋ floors (the proven ln-on-
    // rationals convention), both guarded divisions.
    "x105_link_scores" -> bandedGraphSql(
      """, mp AS (
        |  SELECT g1.src_id AS a_id, g1.nbr_id AS b_id
        |  FROM graph g1
        |  JOIN graph g2 ON g1.src_id = g2.nbr_id AND g1.nbr_id = g2.src_id
        |  WHERE g1.src_id < g1.nbr_id),
        |ge AS (SELECT src_id AS s, nbr_id AS d FROM graph),
        |dout AS (SELECT s, COUNT(*) AS dout FROM ge GROUP BY 1),
        |din AS (SELECT d, COUNT(*) AS din FROM ge GROUP BY 1),
        |com AS (
        |  SELECT mp.a_id, mp.b_id, ea.d AS z
        |  FROM mp
        |  JOIN ge ea ON ea.s = mp.a_id
        |  JOIN ge eb ON eb.s = mp.b_id AND eb.d = ea.d
        |  WHERE ea.d <> mp.a_id AND ea.d <> mp.b_id),
        |agg AS (
        |  SELECT a_id, b_id, COUNT(*) AS cn,
        |    CAST(SUM(CAST(floor(1000000000.0 /
        |      ln(CAST(1 + din.din AS DOUBLE))) AS BIGINT)) AS BIGINT) AS aa_fix
        |  FROM com JOIN din ON din.d = com.z GROUP BY 1, 2),
        |fin AS (
        |  SELECT mp.a_id, mp.b_id,
        |    COALESCE(agg.cn, 0) AS cn, COALESCE(agg.aa_fix, 0) AS aa_fix,
        |    da.dout - 1 AS na, db.dout - 1 AS nb
        |  FROM mp LEFT JOIN agg USING (a_id, b_id)
        |  JOIN dout da ON da.s = mp.a_id
        |  JOIN dout db ON db.s = mp.b_id)
        |SELECT a_id, b_id, cn,
        |  CASE WHEN na + nb - cn > 0
        |       THEN round(CAST(cn AS DOUBLE) / (na + nb - cn), 6) END AS jaccard,
        |  aa_fix, round(CAST(aa_fix AS DOUBLE) / 1000000000.0, 6) AS aa
        |FROM fin ORDER BY a_id, b_id""".stripMargin),

    // Eigenvector-centrality replay: 8 unrolled power-iteration rounds
    // — exact long sums and the max-norm BIGINT floor division
    // (non-negative operands, so // ≡ div). The max is a window MAX
    // over the joined frame (NULL-skipping ≡ the max over y) so each
    // CTE is referenced ONCE — a second reference per level makes the
    // inlined chain exponential in DuckDB.
    "x103_eigen_centrality" -> bandedGraphSql(
      (1 to 8).map(t =>
        s"""y$t AS (
           |  SELECT ge.d AS nid, CAST(SUM(p.xv) AS BIGINT) AS yv
           |  FROM ge JOIN x${t - 1} p ON ge.s = p.nid GROUP BY 1),
           |x$t AS (
           |  SELECT nid, COALESCE((yv * 1000000) // MAX(yv) OVER (), 0) AS xv
           |  FROM (SELECT i.nid, y$t.yv FROM ids i LEFT JOIN y$t USING (nid)))""".stripMargin)
        .mkString(
          """, ids AS (SELECT vec_id AS nid FROM e),
            |ge AS (SELECT src_id AS s, nbr_id AS d FROM graph),
            |x0 AS (SELECT nid, CAST(1000000 AS BIGINT) AS xv FROM ids),
            |""".stripMargin, ",\n", """
            |SELECT nid AS vec_id, xv AS eig_fix,
            |  round(CAST(xv AS DOUBLE) / 1000000.0, 6) AS eig
            |FROM x8 ORDER BY vec_id""".stripMargin)),

    // Dup-structure replay: the graphKeeperSql chain's components (the
    // unreferenced PageRank CTEs prune away), size histogram on top.
    "x104_dup_structure_report" -> graphKeeperSql(
      """,
        |sizes AS (SELECT cluster_id, COUNT(*) AS csize FROM comps GROUP BY 1)
        |SELECT csize, COUNT(*) AS n_components,
        |  CAST(csize * COUNT(*) AS BIGINT) AS n_nodes,
        |  CAST((csize - 1) * COUNT(*) AS BIGINT) AS n_removable
        |FROM sizes GROUP BY 1 ORDER BY csize""".stripMargin),

    // Triangle replay: the ≥0.3 mutual pairs, the canonical wedge
    // join (x<y<z by construction), EXISTS closure, corner explode,
    // degree counts, one IEEE division for the coefficient.
    "x102_triangle_counts" -> bandedGraphSql(
      """, mp AS (
        |  SELECT g1.src_id AS a_id, g1.nbr_id AS b_id
        |  FROM graph g1
        |  JOIN graph g2 ON g1.src_id = g2.nbr_id AND g1.nbr_id = g2.src_id
        |  WHERE g1.src_id < g1.nbr_id AND g1.cos_sim >= 0.3),
        |w2 AS (
        |  SELECT e1.a_id AS x, e1.b_id AS y, e2.b_id AS z
        |  FROM mp e1 JOIN mp e2 ON e1.b_id = e2.a_id),
        |tris AS (
        |  SELECT x, y, z FROM w2
        |  WHERE EXISTS (SELECT 1 FROM mp e3
        |                WHERE e3.a_id = w2.x AND e3.b_id = w2.z)),
        |cnt AS (
        |  SELECT id, COUNT(*) AS n_tri
        |  FROM (SELECT unnest([x, y, z]) AS id FROM tris) GROUP BY 1),
        |deg AS (
        |  SELECT id, COUNT(*) AS degree
        |  FROM (SELECT a_id AS id FROM mp UNION ALL SELECT b_id FROM mp)
        |  GROUP BY 1)
        |SELECT deg.id AS vec_id, deg.degree,
        |  COALESCE(cnt.n_tri, 0) AS n_tri,
        |  CASE WHEN deg.degree >= 2
        |       THEN round(2.0 * COALESCE(cnt.n_tri, 0) /
        |                  (deg.degree * (deg.degree - 1)), 6) END AS clustering
        |FROM deg LEFT JOIN cnt USING (id) ORDER BY vec_id""".stripMargin),

    // Graph-boosted retrieval replay: restricted-corpus x64 BM25,
    // top-20 text ranks + top-5 seeds, x97's seed-gated fixed-point
    // walk, zero-mass exclusion, the pre-cut rank windows, and x65's
    // floor-of-one-IEEE-division fusion.
    "x100_graph_boosted_topk" -> {
      def sc(scale: String): String =
        s"""CAST(floor(
           |      ((ln(CAST(2 * s.nd - 2 * d.df + 1 AS DOUBLE) / CAST(2 * d.df + 1 AS DOUBLE))
           |        * (CAST(t.tf AS DOUBLE) * CAST(2.2 AS DOUBLE)))
           |       / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
           |          (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
           |           (CAST(t.dl * s.nd AS DOUBLE) / CAST(s.ntok AS DOUBLE)))))
           |      * $scale) AS BIGINT)""".stripMargin
      val walk = (1 to 5).map(t =>
        s"""m$t AS (
           |  SELECT ge.d AS nid,
           |    CAST(SUM(((p.pr_fix * 85) // 100) // od.od) AS BIGINT) AS s
           |  FROM ge JOIN pr${t - 1} p ON ge.s = p.nid JOIN od ON ge.s = od.s
           |  GROUP BY ge.d),
           |pr$t AS (
           |  SELECT i.nid,
           |    CASE WHEN sd.nid IS NOT NULL THEN (SELECT base FROM c)
           |         ELSE 0 END + COALESCE(m$t.s, 0) AS pr_fix
           |  FROM ids i LEFT JOIN sd USING (nid)
           |  LEFT JOIN m$t USING (nid))""".stripMargin).mkString(",\n")
      bandedGraphSql(
        s""", docs2 AS (
           |  SELECT doc_id, text FROM documents
           |  WHERE doc_id IN (SELECT vec_id FROM embeddings)),
           |b2 AS (
           |  SELECT doc_id, len(ts) AS dl, ts FROM (
           |    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
           |    FROM docs2)),
           |stats2 AS (SELECT COUNT(*) AS nd, SUM(dl) AS ntok FROM b2),
           |tf2 AS (
           |  SELECT doc_id, dl, w, COUNT(*) AS tf
           |  FROM (SELECT doc_id, dl, unnest(ts) AS w FROM b2)
           |  WHERE w IN ('hash', 'join', 'spark', 'vector')
           |  GROUP BY 1, 2, 3),
           |dfq AS (SELECT w, COUNT(*) AS df FROM tf2 GROUP BY 1),
           |bagg AS (
           |  SELECT doc_id, CAST(SUM(sfix) AS BIGINT) AS score_fix FROM (
           |    SELECT t.doc_id, ${sc("1000000000.0")} AS sfix
           |    FROM tf2 t JOIN dfq d USING (w) CROSS JOIN stats2 s)
           |  GROUP BY 1),
           |trank AS (
           |  SELECT doc_id, CAST(row_number() OVER (
           |      ORDER BY score_fix DESC, doc_id ASC) AS INT) AS t_rank
           |  FROM (SELECT * FROM bagg ORDER BY score_fix DESC, doc_id ASC LIMIT 20)),
           |sd AS (SELECT doc_id AS nid FROM trank WHERE t_rank <= 5),
           |ids AS (SELECT vec_id AS nid FROM e),
           |c AS (
           |  SELECT 1000000000000 // cnt AS init,
           |    ((1000000000000 * 15) // 100) // cnt AS base
           |  FROM (SELECT COUNT(*) AS cnt FROM sd)),
           |ge AS (SELECT src_id AS s, nbr_id AS d FROM graph),
           |od AS (SELECT s, COUNT(*) AS od FROM ge GROUP BY 1),
           |pr0 AS (
           |  SELECT i.nid,
           |    CASE WHEN sd.nid IS NOT NULL THEN (SELECT init FROM c)
           |         ELSE 0 END AS pr_fix
           |  FROM ids i LEFT JOIN sd USING (nid)),
           |$walk,
           |vrank AS (
           |  SELECT nid, CAST(row_number() OVER (
           |      ORDER BY pr_fix DESC, nid ASC) AS INT) AS v_rank
           |  FROM (SELECT * FROM pr5 WHERE pr_fix > 0
           |        ORDER BY pr_fix DESC, nid ASC LIMIT 20)),
           |fused AS (
           |  SELECT COALESCE(t.doc_id, v.nid) AS vec_id, t.t_rank, v.v_rank,
           |    COALESCE(CAST(floor(1000000000000.0 / (CAST(t.t_rank AS DOUBLE) + 60.0)) AS BIGINT), 0)
           |  + COALESCE(CAST(floor(1000000000000.0 / (CAST(v.v_rank AS DOUBLE) + 60.0)) AS BIGINT), 0) AS rrf_fix
           |  FROM trank t FULL JOIN vrank v ON t.doc_id = v.nid)
           |SELECT vec_id, t_rank, v_rank, rrf_fix,
           |  round(CAST(rrf_fix AS DOUBLE) / 1000000000000.0, 6) AS rrf
           |FROM fused ORDER BY rrf_fix DESC, vec_id ASC LIMIT 10""".stripMargin)
    },

    // Session-overlap replay: q35's sessionization convention over the
    // gate's week of events, positive-duration sessions only, then a
    // PLAIN quadratic strict-overlap join (semantics only — the Spark
    // side's bucket decomposition is a plan choice the oracle need not
    // mirror), per-user partner/overlap counts.
    "x101_session_overlap" ->
      """WITH s AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                + INTERVAL 6 HOUR
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'),
        |g AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM s),
        |sess AS (
        |  SELECT user_id, sess, MIN(ts) AS smin, MAX(ts) AS smax
        |  FROM g GROUP BY 1, 2
        |  HAVING MIN(ts) < MAX(ts)),
        |pairs AS (
        |  SELECT a.user_id AS ua, b.user_id AS ub
        |  FROM sess a JOIN sess b
        |    ON a.user_id <> b.user_id
        |   AND a.smin < b.smax AND b.smin < a.smax)
        |SELECT ua AS user_id, COUNT(DISTINCT ub) AS n_partners,
        |  COUNT(*) AS n_overlaps
        |FROM pairs GROUP BY 1 ORDER BY user_id""".stripMargin,

    // Cell-composed k-NN graph replay: x67's fixed-point Lloyd chain
    // (auto-dial LIMIT included), top-5 probe-cell ranks, x68's 16×4
    // band arithmetic, the asymmetric probe-home candidate join (both
    // directions, UNION-deduplicated), exact rounded cosines, ranks.
    "x72_knn_graph_cells" -> knnGraphSql("e", ""),

    // x90: x72's chain with the model trained on the static split only
    "x90_knn_graph_delta" -> knnGraphSql("es",
      "\nes AS (SELECT vec_id, v FROM e WHERE vec_id % 7 <> 0),"),

    // x91 compaction: read-after-compaction ≡ the frozen-model rebuild
    // (the x79/x84 law on the graph artifact) — x90's SQL verbatim.
    "x91_knn_graph_compact" -> knnGraphSql("es",
      "\nes AS (SELECT vec_id, v FROM e WHERE vec_id % 7 <> 0),"),

    // NB replay: the full training (per-class doc/token counts, V, N),
    // the smoothed fixed-point likelihood grid, exact per-(doc, class)
    // integer sums, argmax on (score DESC, label ASC).
    "x108_nb_classifier" -> nbEvalSql("doc_id % 5 <> 0", "doc_id % 5 = 0"),

    // Report replay: the x108 chain, per-doc argmax verdicts, three
    // class-keyed counts, the model-UNION-actual axis, guarded exact-rational
    // precision/recall and the 2·correct/(actual+pred) F1 identity.
    "x114_classifier_report" ->
      (nbChainSql("doc_id % 5 <> 0", "doc_id % 5 = 0") +
        """,
          |eval AS (
          |  SELECT b.doc_id, te.lang AS actual_label, b.pred_label
          |  FROM best b JOIN test te USING (doc_id) WHERE b.rn = 1),
          |na AS (SELECT actual_label AS label, COUNT(*) AS n_actual
          |       FROM eval GROUP BY 1),
          |np AS (SELECT pred_label AS label, COUNT(*) AS n_pred
          |       FROM eval GROUP BY 1),
          |nc AS (SELECT actual_label AS label, COUNT(*) AS n_correct
          |       FROM eval WHERE actual_label = pred_label GROUP BY 1),
          |axis AS (
          |  SELECT lang AS label FROM cls
          |  UNION SELECT actual_label FROM eval),
          |rep AS (
          |  SELECT axis.label,
          |    COALESCE(na.n_actual, 0) AS n_actual,
          |    COALESCE(np.n_pred, 0) AS n_pred,
          |    COALESCE(nc.n_correct, 0) AS n_correct
          |  FROM axis
          |  LEFT JOIN na ON na.label = axis.label
          |  LEFT JOIN np ON np.label = axis.label
          |  LEFT JOIN nc ON nc.label = axis.label)
          |SELECT label, n_actual, n_pred, n_correct,
          |  CASE WHEN n_pred > 0
          |    THEN round(CAST(n_correct AS DOUBLE) / n_pred, 6) END AS precision,
          |  CASE WHEN n_actual > 0
          |    THEN round(CAST(n_correct AS DOUBLE) / n_actual, 6) END AS recall,
          |  CASE WHEN n_actual + n_pred > 0
          |    THEN round(2.0 * n_correct / (n_actual + n_pred), 6) END AS f1
          |FROM rep ORDER BY label""".stripMargin),

    // p05 replay: the NB chain screening the WHOLE corpus (test = all
    // docs), the pred='en' keeper set, and x66's manifest arithmetic
    // over the kept documents.
    "p05_classify_screen_export" ->
      (nbChainSql("doc_id % 5 <> 0", "1 = 1") +
        """,
          |kept AS (
          |  SELECT doc_id FROM best WHERE rn = 1 AND pred_label = 'en'),
          |d AS (
          |  SELECT d0.doc_id,
          |    CAST(CAST('0x' || substr(md5('shard:' || CAST(d0.doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS BIGINT) % 8 AS shard,
          |    len(list_filter(string_split(d0.text, ' '), t -> t <> '')) AS ntok,
          |    CAST(CAST('0x' || substr(md5(CAST(d0.doc_id AS VARCHAR) || ':' || d0.text), 1, 8) AS UBIGINT) AS BIGINT) AS chk
          |  FROM documents d0 JOIN kept USING (doc_id))
          |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens,
          |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
          |  CAST(SUM(chk) AS BIGINT) AS checksum
          |FROM d GROUP BY shard ORDER BY shard""".stripMargin),

    // Winnowing replay: the same 4-gram 8-hex md5 hashes, window-of-8
    // minima (short-doc one-fingerprint degeneration included), per-doc
    // DISTINCT, the df <= 50 stop-fingerprint cut, pair counts at >= 3.
    // Fenced: f feeds the df cut and both join sides.
    "x141_winnowing_overlap" -> winnowingOverlapSql,

    // x148 = the same report served from the written fp-bucketed tree
    // after a bucket-local compaction; the index row is a pure per-doc
    // function of content, so the tree read-back equals the one-shot
    // fingerprint frame and x141's SQL replays it verbatim.
    "x148_winnowing_tree" -> winnowingOverlapSql,

    // Winnowing seek replay: the x141 fingerprint chain computed for
    // ALL docs, then split asymmetrically — query side (doc_id%10=0)
    // probes the index side (the rest) under the INDEX-side df <= 50
    // stop cut; pair counts cross sides (no a<b — the sides are
    // disjoint). Bucket pruning keeps every index row of every queried
    // fingerprint (a fingerprint's rows live in its own bucket), so
    // the pruned probe equals this full-index replay. Fenced: f feeds
    // both sides, fi feeds the df cut and the join.
    "x152_winnowing_seek" -> materializeCtes(
      winnowingFpChainSql + """,
        |fq AS (SELECT doc_id, fp FROM f WHERE doc_id % 10 = 0),
        |fi AS (SELECT doc_id, fp FROM f WHERE doc_id % 10 <> 0),
        |kept AS (
        |  SELECT fi.doc_id, fi.fp FROM fi
        |  JOIN (SELECT fp FROM fi GROUP BY fp HAVING COUNT(*) <= 50) k USING (fp)),
        |p AS (
        |  SELECT fq.doc_id AS a_id, kept.doc_id AS b_id, COUNT(*) AS shared_fps
        |  FROM fq JOIN kept ON fq.fp = kept.fp
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id, CAST(shared_fps AS BIGINT) AS shared_fps
        |FROM p WHERE shared_fps >= 3 ORDER BY a_id, b_id""".stripMargin),

    // Salience replay: exact tf/df counts (df per-doc-distinct), the
    // floor(ln(N/df)·1e6) idf lane, the integer product, the
    // (salience DESC, term ASC) rank per source.
    "x142_tfidf_salience" -> materializeCtes(
      """WITH wds AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |n AS (SELECT COUNT(*) AS nd FROM documents),
        |df AS (
        |  SELECT w, COUNT(*) AS df
        |  FROM (SELECT DISTINCT doc_id, w FROM wds) GROUP BY 1),
        |tf AS (SELECT source, w, COUNT(*) AS tf FROM wds GROUP BY 1, 2),
        |sal AS (
        |  SELECT tf.source, tf.w, tf.tf, df.df,
        |    tf.tf * CAST(floor(ln(CAST(n.nd AS DOUBLE) / df.df) * 1000000.0) AS BIGINT) AS salience_fix
        |  FROM tf JOIN df USING (w), n),
        |rk AS (
        |  SELECT source, w AS term, tf, df, salience_fix,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY salience_fix DESC, w ASC) AS rk
        |  FROM sal)
        |SELECT source, term, tf, df, salience_fix, CAST(rk AS INT) AS rk
        |FROM rk WHERE rk <= 10 ORDER BY source, rk""".stripMargin),

    // Cross-source matrix replay: the x02 trigram-Jaccard chain, the
    // >= 0.5 cut, least/greatest source cell keys, pair counts and
    // distinct implicated docs per cell.
    "x143_cross_source_dup" -> crossSourceDupSql,

    // x149 = the same matrix computed from the MinHash-LSH → verify
    // production pair step; full-recall candidates (the x34 OpsSpec
    // pin) make the verified pair set — hence every cell — equal the
    // exact path's.
    "x149_lsh_cross_source_dup" -> crossSourceDupSql,

    // Histogram replay: the x16 component walk, cluster sizes, the
    // size-keyed histogram, and the exact removable-permille rate.
    // Recursive chain stays unfenced (x16's shape); cs feeds both the
    // histogram and the totals so it is computed in each, exact either
    // way (integer counts).
    "x144_cluster_size_histogram" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (
        |  SELECT DISTINCT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(ts) - 2),
        |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
        |  FROM tok),
        |nt AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
        |cand AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
        |  FROM tri a JOIN tri b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT a_id, b_id FROM cand
        |  JOIN nt na ON a_id = na.doc_id JOIN nt nb ON b_id = nb.doc_id
        |  WHERE common * 1.0 / (na.n + nb.n - common) >= 0.5),
        |edges AS (SELECT a_id AS u, b_id AS v FROM p UNION SELECT b_id, a_id FROM p),
        |walk(id, reach) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT w.id, e.v FROM walk w JOIN edges e ON w.reach = e.u),
        |comp AS (SELECT id, MIN(reach) AS cluster_id FROM walk GROUP BY id),
        |cs AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(cluster_size) AS BIGINT) AS n_total,
        |    CAST(SUM(cluster_size - 1) AS BIGINT) AS n_removable
        |  FROM cs)
        |SELECT cluster_size, COUNT(*) AS n_clusters,
        |  CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
        |  (tot.n_removable * 1000) // tot.n_total AS dedup_rate_permille
        |FROM cs, tot GROUP BY cluster_size, tot.n_removable, tot.n_total
        |ORDER BY cluster_size""".stripMargin,

    // Pack-fill replay: the x128 chunk + fill recurrence, then the
    // shard-keyed pack/chunk/mass aggregation and the capacity permille.
    "x145_pack_fill_report" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS nt FROM t WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, GREATEST(CAST(ceil((nt - 10) / 40.0) AS INT), 1) - 1)) AS ci
        |  FROM n),
        |ch AS (
        |  SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
        |    CAST(len(toks[ci*40+1 : ci*40+50]) AS INT) AS n_chunk_tokens
        |  FROM c),
        |j AS (SELECT ch.doc_id, ch.chunk_idx, ch.n_chunk_tokens, d.source
        |      FROM ch JOIN documents d ON ch.doc_id = d.doc_id),
        |r AS (
        |  SELECT source, n_chunk_tokens,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id, chunk_idx) AS rk
        |  FROM j),
        |f AS (
        |  SELECT source, rk, n_chunk_tokens,
        |    CAST(0 AS BIGINT) AS pack_id, CAST(n_chunk_tokens AS BIGINT) AS fill
        |  FROM r WHERE rk = 1
        |  UNION ALL
        |  SELECT r.source, r.rk, r.n_chunk_tokens,
        |    CASE WHEN f.fill + r.n_chunk_tokens > 256
        |         THEN f.pack_id + 1 ELSE f.pack_id END,
        |    CASE WHEN f.fill + r.n_chunk_tokens > 256
        |         THEN CAST(r.n_chunk_tokens AS BIGINT)
        |         ELSE f.fill + r.n_chunk_tokens END
        |  FROM r JOIN f ON r.source = f.source AND r.rk = f.rk + 1),
        |pk AS (
        |  SELECT source, pack_id, COUNT(*) AS nc,
        |    CAST(SUM(n_chunk_tokens) AS BIGINT) AS pt
        |  FROM f GROUP BY source, pack_id)
        |SELECT source, COUNT(*) AS n_packs,
        |  CAST(SUM(nc) AS BIGINT) AS n_chunks,
        |  CAST(SUM(pt) AS BIGINT) AS packed_tokens,
        |  (CAST(SUM(pt) AS BIGINT) * 1000) // (COUNT(*) * 256) AS fill_permille
        |FROM pk GROUP BY source ORDER BY source""".stripMargin,

    // Funnel replay: three sequential conditional-min CTEs, the stage
    // count, the 48 h conversion-window rule.
    "x109_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY 1)
        |SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
        |  CASE WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END
        |  + CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END
        |  + CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END AS n_stages,
        |  COALESCE(s3.t3 IS NOT NULL AND s3.t3 <= s1.t1 + INTERVAL 48 HOUR,
        |    FALSE) AS converted
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY s1.user_id""".stripMargin,

    // Retention replay: distinct (user, day) activity, min-day cohort,
    // exact DATE offsets.
    "x110_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |coh AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY 1)
        |SELECT c.cohort_day,
        |  date_diff('day', CAST(c.cohort_day AS DATE), CAST(a.day AS DATE)) AS offset_days,
        |  COUNT(*) AS n_users
        |FROM act a JOIN coh c USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY cohort_day, offset_days""".stripMargin,

    // Transition replay: the same (ts, event_id)-ordered lead window,
    // pair counts, exact-rational row normalization.
    "x111_transition_matrix" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS src_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS dst_type
        |  FROM events),
        |cnt AS (
        |  SELECT src_type, dst_type, COUNT(*) AS n_transitions
        |  FROM seq WHERE dst_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (
        |  SELECT src_type, CAST(SUM(n_transitions) AS BIGINT) AS n_src
        |  FROM cnt GROUP BY 1)
        |SELECT c.src_type, c.dst_type, c.n_transitions,
        |  round(CAST(c.n_transitions AS DOUBLE) / t.n_src, 6) AS p
        |FROM cnt c JOIN tot t USING (src_type)
        |ORDER BY src_type, dst_type""".stripMargin,

    // k-core replay: mutual pairs off the banded graph doubled into
    // both orientations, then 4 unrolled peel rounds. Each round is ONE
    // reference to the previous round — endpoint degrees come from two
    // COUNT windows on the symmetric list, not a self-join — because a
    // round that referenced its predecessor twice would inline the whole
    // banded-graph chain exponentially in DuckDB (the x103 lesson).
    "x112_kcore" -> bandedGraphSql(
      """, mp AS (
        |  SELECT g1.src_id AS a_id, g1.nbr_id AS b_id
        |  FROM graph g1
        |  JOIN graph g2 ON g1.src_id = g2.nbr_id AND g1.nbr_id = g2.src_id
        |  WHERE g1.src_id < g1.nbr_id),
        |u0 AS (SELECT a_id AS u, b_id AS v FROM mp
        |       UNION ALL SELECT b_id, a_id FROM mp)""".stripMargin +
      (1 to 4).map(r =>
        s"""u$r AS (
           |  SELECT u, v FROM (
           |    SELECT u, v, COUNT(*) OVER (PARTITION BY u) AS du,
           |                 COUNT(*) OVER (PARTITION BY v) AS dv
           |    FROM u${r - 1})
           |  WHERE du >= 3 AND dv >= 3)""".stripMargin)
        .mkString(",\n", ",\n", "\n") +
      """SELECT u AS vec_id, COUNT(*) AS core_deg
        |FROM u4
        |GROUP BY 1
        |ORDER BY vec_id""".stripMargin),

    // Rolling-active replay: distinct (user, day), the day grid, the
    // same ×7 contribution explode, exact distinct counts.
    "x116_rolling_active" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |b AS (
        |  SELECT date_trunc('day', min(ts)) AS lo,
        |         date_trunc('day', max(ts)) AS hi FROM events),
        |days AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b),
        |dau AS (
        |  SELECT day, COUNT(DISTINCT user_id) AS dau FROM act GROUP BY 1),
        |contrib AS (
        |  SELECT user_id,
        |    unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS day
        |  FROM act),
        |wau AS (
        |  SELECT day, COUNT(DISTINCT user_id) AS wau FROM contrib GROUP BY 1)
        |SELECT days.day, COALESCE(dau.dau, 0) AS dau, COALESCE(wau.wau, 0) AS wau
        |FROM days LEFT JOIN dau USING (day) LEFT JOIN wau USING (day)
        |ORDER BY days.day""".stripMargin,

    // Linkage replay: the %7 third-char drop, the 2-char block equi
    // join, integer levenshtein, argmin on (dist, id), left join back.
    "x117_fuzzy_link" ->
      """WITH canon AS (SELECT p_partkey AS c_id, p_name AS c_name FROM part),
        |dirty AS (
        |  SELECT p_partkey AS d_id,
        |    CASE WHEN p_partkey % 7 = 0
        |         THEN substr(p_name, 1, 2) || substr(p_name, 4)
        |         ELSE p_name END AS d_name
        |  FROM part),
        |cand AS (
        |  SELECT d.d_id, c.c_id, c.c_name,
        |    levenshtein(d.d_name, c.c_name) AS dist
        |  FROM dirty d JOIN canon c
        |    ON substr(d.d_name, 1, 2) = substr(c.c_name, 1, 2)
        |    OR right(d.d_name, 2) = right(c.c_name, 2)
        |  WHERE levenshtein(d.d_name, c.c_name) <= 2),
        |best AS (
        |  SELECT d_id, c_id AS matched_id, c_name AS matched_name, dist,
        |    row_number() OVER (PARTITION BY d_id ORDER BY dist, c_id) AS rn
        |  FROM cand)
        |SELECT d.d_id, d.d_name, b.matched_id, b.matched_name, b.dist
        |FROM dirty d LEFT JOIN best b ON b.d_id = d.d_id AND b.rn = 1
        |ORDER BY d.d_id""".stripMargin,

    // Diff replay: both fingerprint scans (the %9 rewrite included),
    // one full-outer join, the 4-way status CASE.
    "x115_snapshot_diff" ->
      """WITH o AS (
        |  SELECT doc_id, md5(text) AS old_fp FROM documents WHERE doc_id < 450),
        |nw AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 9 = 0 THEN upper(text) ELSE text END) AS new_fp
        |  FROM documents WHERE doc_id >= 50)
        |SELECT COALESCE(o.doc_id, nw.doc_id) AS doc_id,
        |  CASE WHEN o.old_fp IS NULL THEN 'added'
        |       WHEN nw.new_fp IS NULL THEN 'removed'
        |       WHEN o.old_fp = nw.new_fp THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  o.old_fp, nw.new_fp
        |FROM o FULL OUTER JOIN nw ON o.doc_id = nw.doc_id
        |ORDER BY doc_id""".stripMargin,

    // z-score replay: integer-cent sufficient stats, the exact-integer
    // rational z evaluated in IEEE doubles, the guarded |z| > 2 flag.
    "x113_anomaly_zscores" ->
      """WITH v AS (
        |  SELECT event_id, event_type, value,
        |    CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events),
        |st AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(vc) AS BIGINT) AS s1,
        |    CAST(SUM(vc * vc) AS BIGINT) AS s2
        |  FROM v GROUP BY 1),
        |zc AS (
        |  SELECT v.event_id, v.event_type, v.value, st.n,
        |    CAST(v.vc * st.n - st.s1 AS DOUBLE) AS num,
        |    st.n * st.s2 - st.s1 * st.s1 AS varn2
        |  FROM v JOIN st USING (event_type))
        |SELECT event_id, event_type, value,
        |  CASE WHEN n > 1 AND varn2 > 0
        |    THEN round(num / sqrt(CAST(varn2 AS DOUBLE)), 6) END AS z,
        |  COALESCE(CASE WHEN n > 1 AND varn2 > 0
        |    THEN abs(num / sqrt(CAST(varn2 AS DOUBLE))) > 2.0 END,
        |    FALSE) AS is_anomaly
        |FROM zc
        |ORDER BY event_id""".stripMargin,

    // SCD2 replay: the same four synthetic snapshots, the md5
    // change-point lag, run starts, lead-closed intervals. The
    // faithful fingerprint is concat_ws(chr(1), coalesce(text,
    // chr(0))) — identity on a single non-null column but replayed
    // verbatim.
    "x118_scd2_history" -> scd2HistorySql,

    // Incremental apply replay: the LAW is the oracle — folding the v3
    // snapshot into the v0-v2 build must equal the full four-snapshot
    // build, so x123 shares x118's SQL verbatim.
    "x123_scd2_apply" -> scd2HistorySql,

    // A-ES replay: the md5-affine uniform, the left-to-right IEEE
    // ln(u)/w, the ⌊·10¹²⌋ fixed point, (key DESC, id) top-100.
    "x127_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, n_chars,
        |    CAST(floor(
        |      ln((CAST(CAST('0x' || substr(md5('mix:' ||
        |            CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS DOUBLE)
        |          + 0.5) / 4294967296.0)
        |      / CAST(n_chars AS DOUBLE) * 1e12) AS BIGINT) AS es_key
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, n_chars, es_key
        |FROM w
        |ORDER BY es_key DESC, doc_id
        |LIMIT 100""".stripMargin,

    // Next-fit replay: x36's chunk CTE, ranked per source, then the
    // sequential fill recurrence as a recursive CTE — pack closes when
    // fill + tok > 256, exactly the operator's fold.
    "x128_strict_packing" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS nt FROM t WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, GREATEST(CAST(ceil((nt - 10) / 40.0) AS INT), 1) - 1)) AS ci
        |  FROM n),
        |ch AS (
        |  SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
        |    CAST(len(toks[ci*40+1 : ci*40+50]) AS INT) AS n_chunk_tokens
        |  FROM c),
        |j AS (SELECT ch.doc_id, ch.chunk_idx, ch.n_chunk_tokens, d.source
        |      FROM ch JOIN documents d ON ch.doc_id = d.doc_id),
        |r AS (
        |  SELECT source, n_chunk_tokens,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id, chunk_idx) AS rk
        |  FROM j),
        |f AS (
        |  SELECT source, rk, n_chunk_tokens,
        |    CAST(0 AS BIGINT) AS pack_id, CAST(n_chunk_tokens AS BIGINT) AS fill
        |  FROM r WHERE rk = 1
        |  UNION ALL
        |  SELECT r.source, r.rk, r.n_chunk_tokens,
        |    CASE WHEN f.fill + r.n_chunk_tokens > 256
        |         THEN f.pack_id + 1 ELSE f.pack_id END,
        |    CASE WHEN f.fill + r.n_chunk_tokens > 256
        |         THEN CAST(r.n_chunk_tokens AS BIGINT)
        |         ELSE f.fill + r.n_chunk_tokens END
        |  FROM r JOIN f ON r.source = f.source AND r.rk = f.rk + 1)
        |SELECT source, pack_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(n_chunk_tokens) AS BIGINT) AS pack_tokens
        |FROM f GROUP BY source, pack_id ORDER BY source, pack_id""".stripMargin,

    // Epoch-shuffle replay: the same md5('epoch:1:' || id) key — first
    // 8 hex mod 8 routes the shard, rank by (full hex, id) is the
    // position. Both engines evaluate the identical hex arithmetic.
    "x129_epoch_shuffle" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    md5('epoch:1:' || CAST(doc_id AS VARCHAR)) AS hx
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CAST('0x' || substr(hx, 1, 8) AS UBIGINT) % 8 AS INT) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY CAST('0x' || substr(hx, 1, 8) AS UBIGINT) % 8
        |    ORDER BY hx, doc_id) - 1 AS BIGINT) AS pos
        |FROM m ORDER BY shard, pos""".stripMargin,

    // Leakage-safe-split replay: x16's cluster walk verbatim, then the
    // pure-function-of-cluster_id split — first 4 md5 hex of
    // 'split:<cluster_id>' against the 5%/5% 1/65536-granularity cuts.
    "x130_leakage_safe_split" -> x130SplitSql,

    // x136 = the same split computed from x34's LSH-verified components;
    // full-recall candidates (the x34 OpsSpec pin) make the verified
    // pair set — hence components and split — equal the exact path's.
    "x136_lsh_leakage_split" -> x130SplitSql,

    // Budget-mix replay: the same integer plan arithmetic (permille
    // target, DECIMAL(38,0) cut lane, 65536 cap) and the same md5 keep
    // predicate; groups outside the weight map fall to w = 0.
    "x131_budget_mix" ->
      """WITH s AS (
        |  SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |w(lang, w_permille) AS (
        |  VALUES ('en', 500), ('zh', 200), ('de', 150), ('fr', 150)),
        |p AS (
        |  SELECT s.lang, s.n_tokens,
        |    COALESCE(w.w_permille, 0) AS w_permille,
        |    CAST((CAST(40000 AS HUGEINT) * COALESCE(w.w_permille, 0)) // 1000 AS BIGINT) AS target_tokens
        |  FROM s LEFT JOIN w USING (lang)),
        |pc AS (
        |  SELECT *, CASE WHEN target_tokens >= n_tokens THEN 65536
        |    ELSE CAST((CAST(target_tokens AS HUGEINT) * 65536) // n_tokens AS INT)
        |    END AS cut
        |  FROM p),
        |k AS (
        |  SELECT d.lang, d.doc_id, d.n_chars, pc.n_tokens, pc.w_permille,
        |    pc.target_tokens, pc.cut,
        |    (pc.cut >= 65536 OR
        |     substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < printf('%04x', pc.cut)) AS keep
        |  FROM documents d JOIN pc USING (lang))
        |SELECT lang, CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(MAX(w_permille) AS BIGINT) AS w_permille,
        |  CAST(MAX(target_tokens) AS BIGINT) AS target_tokens,
        |  CAST(MAX(cut) AS BIGINT) AS cut,
        |  CAST(count_if(keep) AS BIGINT) AS n_kept,
        |  CAST(COALESCE(SUM(CASE WHEN keep THEN n_chars END), 0) AS BIGINT) AS kept_tokens
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    // Epoch-plan replay: the same integer schedule arithmetic — floor
    // whole-epoch division, remainder, HUGEINT cut lane (DuckDB's //
    // on DECIMAL rounds — the x131 trap), the md5 partial-epoch draw.
    "x132_epoch_plan" ->
      """WITH s AS (
        |  SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |w(lang, w_permille) AS (
        |  VALUES ('en', 500), ('zh', 200), ('de', 150), ('fr', 150)),
        |p AS (
        |  SELECT s.lang, s.n_tokens,
        |    COALESCE(w.w_permille, 0) AS w_permille,
        |    CAST((CAST(150000 AS HUGEINT) * COALESCE(w.w_permille, 0)) // 1000 AS BIGINT) AS target_tokens
        |  FROM s LEFT JOIN w USING (lang)),
        |pe AS (
        |  SELECT *, CASE WHEN n_tokens <= 0 THEN 0
        |    ELSE CAST(target_tokens // n_tokens AS INT) END AS full_epochs
        |  FROM p),
        |pr AS (
        |  SELECT *, target_tokens - CAST(full_epochs AS BIGINT) * n_tokens AS rem_target
        |  FROM pe),
        |pc AS (
        |  SELECT *, CASE WHEN n_tokens <= 0 THEN 0
        |    ELSE CAST((CAST(rem_target AS HUGEINT) * 65536) // n_tokens AS INT)
        |    END AS cut
        |  FROM pr),
        |k AS (
        |  SELECT d.lang, d.doc_id, d.n_chars, pc.n_tokens, pc.w_permille,
        |    pc.target_tokens, pc.full_epochs, pc.rem_target, pc.cut,
        |    (pc.cut >= 65536 OR
        |     substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < printf('%04x', pc.cut)) AS keep
        |  FROM documents d JOIN pc USING (lang))
        |SELECT lang, CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(MAX(w_permille) AS BIGINT) AS w_permille,
        |  CAST(MAX(target_tokens) AS BIGINT) AS target_tokens,
        |  CAST(MAX(full_epochs) AS BIGINT) AS full_epochs,
        |  CAST(MAX(rem_target) AS BIGINT) AS rem_target,
        |  CAST(MAX(cut) AS BIGINT) AS cut,
        |  CAST(count_if(keep) AS BIGINT) AS n_kept_partial,
        |  CAST(COALESCE(SUM(CASE WHEN keep THEN n_chars END), 0) AS BIGINT) AS kept_tokens_partial,
        |  CAST(MAX(full_epochs) * MAX(n_tokens) +
        |       COALESCE(SUM(CASE WHEN keep THEN n_chars END), 0) AS BIGINT) AS planned_tokens
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    // CDC replay: the same boundary arithmetic — trailing 4-token
    // window md5, first-4-hex residue mod 16, forced end boundary,
    // 1-based inclusive segment slicing.
    "x133_cdc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |n AS (SELECT doc_id, ts, len(ts) AS nt FROM t),
        |b AS (
        |  SELECT doc_id, ts, nt,
        |    CASE WHEN nt >= 4 THEN
        |      list_filter(generate_series(4, nt), i ->
        |        CAST('0x' || substr(md5(array_to_string(ts[i-3:i], ' ')), 1, 4) AS INT) % 16 = 0)
        |    ELSE [] END AS bnd
        |  FROM n),
        |fb AS (
        |  SELECT doc_id, ts, nt,
        |    CASE WHEN len(bnd) > 0 AND bnd[-1] = nt THEN bnd
        |         ELSE list_append(bnd, nt) END AS bnd2
        |  FROM b),
        |c AS (
        |  SELECT doc_id, unnest(generate_series(1, len(bnd2))) AS ci, ts, bnd2
        |  FROM fb)
        |SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
        |  CAST(bnd2[ci] - (CASE WHEN ci = 1 THEN 0 ELSE bnd2[ci-1] END) AS INT) AS n_chunk_tokens,
        |  md5(array_to_string(ts[CASE WHEN ci = 1 THEN 1 ELSE bnd2[ci-1] + 1 END : bnd2[ci]], ' ')) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    // Encode-to-ids replay: the x44 merge-application replace chain
    // (evaluated once per row in the subquery), then the SAME vocab id
    // mapping as the Spark plan literal, generated as a CASE chain —
    // every emitted id replays bit-for-bit.
    "x134_bpe_encode_ids" ->
      s"""WITH m AS (SELECT doc_id, ${graft.ops.Bpe.oracleSqlExpr("text")} AS s
         |           FROM documents),
         |i AS (SELECT doc_id, ${graft.ops.Bpe.oracleIdsFromMergedExpr("s")} AS ids
         |      FROM m)
         |SELECT doc_id, CAST(len(ids) AS INT) AS n_ids,
         |  array_to_string(list_transform(ids, x -> CAST(x AS VARCHAR)), ',') AS ids_csv
         |FROM i ORDER BY doc_id""".stripMargin,

    // CDC-dedup replay: x133's chunk chain, per-doc DISTINCT (hash,
    // tokens), the df <= 50 stop-chunk cut, shared-mass pair scores in
    // the integer permille lane (HUGEINT-free: shared*1000 fits BIGINT
    // and // on BIGINT truncates = floors for non-negatives, pairing
    // Spark's div), threshold 500, the x130 component walk, min-id
    // keeper. Fenced: the chunk chain is referenced through d/kept by
    // several consumers and must evaluate once.
    "x135_cdc_dedup_keeper" -> materializeCtes(
      """WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |n AS (SELECT doc_id, ts, len(ts) AS nt FROM t),
        |b AS (
        |  SELECT doc_id, ts, nt,
        |    CASE WHEN nt >= 4 THEN
        |      list_filter(generate_series(4, nt), i ->
        |        CAST('0x' || substr(md5(array_to_string(ts[i-3:i], ' ')), 1, 4) AS INT) % 16 = 0)
        |    ELSE [] END AS bnd
        |  FROM n),
        |fb AS (
        |  SELECT doc_id, ts, nt,
        |    CASE WHEN len(bnd) > 0 AND bnd[-1] = nt THEN bnd
        |         ELSE list_append(bnd, nt) END AS bnd2
        |  FROM b),
        |c AS (
        |  SELECT doc_id, unnest(generate_series(1, len(bnd2))) AS ci, ts, bnd2
        |  FROM fb),
        |ch AS (
        |  SELECT doc_id,
        |    CAST(bnd2[ci] - (CASE WHEN ci = 1 THEN 0 ELSE bnd2[ci-1] END) AS BIGINT) AS tok,
        |    md5(array_to_string(ts[CASE WHEN ci = 1 THEN 1 ELSE bnd2[ci-1] + 1 END : bnd2[ci]], ' ')) AS h
        |  FROM c),
        |d AS (SELECT DISTINCT doc_id, h, tok FROM ch),
        |kept AS (
        |  SELECT d.doc_id, d.h, d.tok FROM d
        |  JOIN (SELECT h FROM d GROUP BY h HAVING COUNT(*) <= 50) k USING (h)),
        |m AS (SELECT doc_id, SUM(tok) AS mass FROM kept GROUP BY 1),
        |sh AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, SUM(a.tok) AS shared
        |  FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT a_id, b_id FROM sh
        |  JOIN m ma ON ma.doc_id = a_id JOIN m mb ON mb.doc_id = b_id
        |  WHERE CAST((shared * 1000) // least(ma.mass, mb.mass) AS INT) >= 500),
        |edges AS (SELECT a_id AS u, b_id AS v FROM p UNION SELECT b_id, a_id FROM p),
        |walk(id, reach) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT w.id, e.v FROM walk w JOIN edges e ON w.reach = e.u),
        |comp AS (SELECT id AS doc_id, MIN(reach) AS cluster_id FROM walk GROUP BY id)
        |SELECT doc_id, cluster_id, doc_id = cluster_id AS is_keeper
        |FROM comp ORDER BY doc_id""".stripMargin),

    // Tokenize→pack replay: x133's boundary chain exposing the chunk
    // TEXT, the x44 merge chain + '{' count per chunk (n_ids), the x128
    // fill recurrence per lang at capacity 512 (declared with a column
    // list so the fence leaves the recursive member alone). Fenced: the
    // chunk chain feeds the per-chunk encode and the recurrence seeds.
    "x137_tokenize_pack" -> materializeCtes(
      s"""WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |n AS (SELECT doc_id, ts, len(ts) AS nt FROM t),
        |b AS (
        |  SELECT doc_id, ts, nt,
        |    CASE WHEN nt >= 4 THEN
        |      list_filter(generate_series(4, nt), i ->
        |        CAST('0x' || substr(md5(array_to_string(ts[i-3:i], ' ')), 1, 4) AS INT) % 16 = 0)
        |    ELSE [] END AS bnd
        |  FROM n),
        |fb AS (
        |  SELECT doc_id, ts, nt,
        |    CASE WHEN len(bnd) > 0 AND bnd[-1] = nt THEN bnd
        |         ELSE list_append(bnd, nt) END AS bnd2
        |  FROM b),
        |c AS (
        |  SELECT doc_id, unnest(generate_series(1, len(bnd2))) AS ci, ts, bnd2
        |  FROM fb),
        |ck AS (
        |  SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
        |    array_to_string(ts[CASE WHEN ci = 1 THEN 1 ELSE bnd2[ci-1] + 1 END : bnd2[ci]], ' ') AS chunk
        |  FROM c),
        |enc AS (SELECT doc_id, chunk_idx, ${graft.ops.Bpe.oracleSqlExpr("chunk")} AS s FROM ck),
        |cnt AS (SELECT doc_id, chunk_idx,
        |          CAST(length(s) - length(replace(s, '{', '')) AS INT) AS n_ids
        |        FROM enc),
        |j AS (SELECT cnt.doc_id, cnt.chunk_idx, cnt.n_ids, d.lang
        |      FROM cnt JOIN documents d USING (doc_id)),
        |r AS (
        |  SELECT lang, n_ids,
        |    row_number() OVER (PARTITION BY lang ORDER BY doc_id, chunk_idx) AS rk
        |  FROM j),
        |f(lang, rk, n_ids, pack_id, fill) AS (
        |  SELECT lang, rk, n_ids, CAST(0 AS BIGINT), CAST(n_ids AS BIGINT)
        |  FROM r WHERE rk = 1
        |  UNION ALL
        |  SELECT r.lang, r.rk, r.n_ids,
        |    CASE WHEN f.fill + r.n_ids > 512 THEN f.pack_id + 1 ELSE f.pack_id END,
        |    CASE WHEN f.fill + r.n_ids > 512 THEN CAST(r.n_ids AS BIGINT)
        |         ELSE f.fill + r.n_ids END
        |  FROM r JOIN f ON r.lang = f.lang AND r.rk = f.rk + 1)
        |SELECT lang, pack_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(n_ids) AS BIGINT) AS pack_ids
        |FROM f GROUP BY lang, pack_id ORDER BY lang, pack_id""".stripMargin),

    // Token-drift replay: exact per-snapshot counts, the union-vocab
    // full outer join, p/q as IEEE doubles from exact integers, the
    // floor(·1e12) JSD term lane (x52's verified ln convention — the
    // formula text matches the Spark plan shape operation-for-
    // operation), the exact integer total, top-50 on the unique
    // (jsd_fix DESC, w ASC) total order. Fenced: j/term feed two
    // consumers each.
    "x138_token_drift" -> materializeCtes(
      """WITH wa AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |  WHERE doc_id % 2 = 0),
        |wb AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |  WHERE doc_id % 2 <> 0),
        |ca AS (SELECT w, COUNT(*) AS c_a FROM wa GROUP BY 1),
        |cb AS (SELECT w, COUNT(*) AS c_b FROM wb GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(ca.w, cb.w) AS w,
        |    CAST(COALESCE(c_a, 0) AS BIGINT) AS c_a,
        |    CAST(COALESCE(c_b, 0) AS BIGINT) AS c_b
        |  FROM ca FULL OUTER JOIN cb ON ca.w = cb.w),
        |tot AS (
        |  SELECT CAST(SUM(c_a) AS BIGINT) AS na,
        |    CAST(SUM(c_b) AS BIGINT) AS nb,
        |    CAST(COUNT(*) AS BIGINT) AS vsz
        |  FROM j),
        |pq AS (
        |  SELECT w, c_a, c_b,
        |    (c_a + 1.0) / CAST(tot.na + tot.vsz AS DOUBLE) AS p,
        |    (c_b + 1.0) / CAST(tot.nb + tot.vsz AS DOUBLE) AS q
        |  FROM j, tot),
        |term AS (
        |  SELECT w, c_a, c_b,
        |    CAST(floor((p * ln(2.0 * p / (p + q)) + q * ln(2.0 * q / (p + q)))
        |      * 0.5 * 1000000000000.0) AS BIGINT) AS jsd_fix
        |  FROM pq),
        |t AS (SELECT CAST(SUM(jsd_fix) AS BIGINT) AS tj FROM term)
        |SELECT w, c_a, c_b, jsd_fix,
        |  round(CAST(t.tj AS DOUBLE) / 1000000000000.0, 6) AS total_jsd_nats
        |FROM term, t
        |ORDER BY jsd_fix DESC, w ASC LIMIT 50""".stripMargin),

    // Calibration replay: the x108 chain, top-2 scores per doc from the
    // argmax rank (rn <= 2 pivot), the fixed-point margin, the x69
    // integer-rank bin cut, per-bin counts and the permille accuracy
    // division. Counts/accuracy are exact integers; the margin bounds
    // report round-6 nats (the fix lane carries ±few-ulp ln jitter
    // across engines — the same reason x108 reports score_nats).
    "x139_calibration_report" ->
      (nbChainSql("doc_id % 5 <> 0", "doc_id % 5 = 0") +
        """,
          |t2 AS (
          |  SELECT doc_id,
          |    MAX(CASE WHEN rn = 1 THEN pred_label END) AS pred_label,
          |    MAX(CASE WHEN rn = 1 THEN score_fix END) AS s1_fix,
          |    MAX(CASE WHEN rn = 2 THEN score_fix END) AS s2_fix
          |  FROM best WHERE rn <= 2 GROUP BY doc_id),
          |mg AS (
          |  SELECT t2.doc_id, s1_fix - s2_fix AS margin_fix,
          |    te.lang = t2.pred_label AS is_correct
          |  FROM t2 JOIN test te USING (doc_id)),
          |rk AS (
          |  SELECT doc_id, margin_fix, is_correct,
          |    row_number() OVER (ORDER BY margin_fix ASC, doc_id ASC) AS rn,
          |    COUNT(*) OVER () AS m
          |  FROM mg)
          |SELECT ((rn - 1) * 10) // m AS bin,
          |  COUNT(*) AS n_docs,
          |  CAST(SUM(CASE WHEN is_correct THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_correct,
          |  (CAST(SUM(CASE WHEN is_correct THEN 1 ELSE 0 END) AS BIGINT)
          |    * 1000) // COUNT(*) AS acc_permille,
          |  round(CAST(MIN(margin_fix) AS DOUBLE) / 1000000000000.0, 6)
          |    AS min_margin_nats,
          |  round(CAST(MAX(margin_fix) AS DOUBLE) / 1000000000000.0, 6)
          |    AS max_margin_nats
          |FROM rk GROUP BY 1 ORDER BY bin""".stripMargin),

    // Fertility replay: the x134 merge chain per doc (evaluated once in
    // the m subquery), ids via the brace-symbol count, words via the
    // byte tokenizer's own non-whitespace-run extraction (the explicit
    // ASCII class both regex engines scan identically), exact integer
    // sums and the guarded permille divisions.
    "x140_tokenizer_fertility" ->
      s"""WITH m AS (
         |  SELECT lang, text, ${graft.ops.Bpe.oracleSqlExpr("text")} AS s
         |  FROM documents)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(len(regexp_extract_all(text, '[^ \\t\\n\\f\\r]+')))
         |    AS BIGINT) AS n_words,
         |  CAST(SUM(length(s) - length(replace(s, '{', ''))) AS BIGINT)
         |    AS n_ids,
         |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
         |  CASE WHEN CAST(SUM(len(regexp_extract_all(text, '[^ \\t\\n\\f\\r]+'))) AS BIGINT) > 0
         |    THEN (CAST(SUM(length(s) - length(replace(s, '{', ''))) AS BIGINT) * 1000)
         |      // CAST(SUM(len(regexp_extract_all(text, '[^ \\t\\n\\f\\r]+'))) AS BIGINT) END
         |    AS fertility_permille,
         |  CASE WHEN CAST(SUM(length(s) - length(replace(s, '{', ''))) AS BIGINT) > 0
         |    THEN (CAST(SUM(length(text)) AS BIGINT) * 1000)
         |      // CAST(SUM(length(s) - length(replace(s, '{', ''))) AS BIGINT) END
         |    AS chars_per_id_permille
         |FROM m GROUP BY lang ORDER BY lang""".stripMargin,

    // Margin-ladder replay: the NB chain on the x139 split, the top-2
    // pivot and exact fixed-point margin, then one filtered aggregate
    // per frozen cut dial (the shared marginCutDials literals).
    "x159_margin_screen_ladder" ->
      (nbChainSql("doc_id % 5 <> 0", "doc_id % 5 = 0") +
        """,
          |t2 AS (
          |  SELECT doc_id,
          |    MAX(CASE WHEN rn = 1 THEN pred_label END) AS pred_label,
          |    MAX(CASE WHEN rn = 1 THEN score_fix END) AS s1_fix,
          |    MAX(CASE WHEN rn = 2 THEN score_fix END) AS s2_fix
          |  FROM best WHERE rn <= 2 GROUP BY doc_id),
          |mg AS (
          |  SELECT t2.doc_id, s1_fix - s2_fix AS margin_fix,
          |    te.lang = t2.pred_label AS is_correct
          |  FROM t2 JOIN test te USING (doc_id)),
          |""".stripMargin +
        marginCutDials.zipWithIndex.map { case (c, i) =>
          s"""|rep$i AS (
              |  SELECT CAST($c AS BIGINT) AS cut_fix,
              |    CAST(COUNT(*) AS BIGINT) AS n_kept,
              |    CAST(SUM(CASE WHEN is_correct THEN 1 ELSE 0 END) AS BIGINT) AS n_correct_kept,
              |    CASE WHEN COUNT(*) = 0 THEN 0
              |      ELSE (CAST(SUM(CASE WHEN is_correct THEN 1 ELSE 0 END) AS BIGINT) * 1000) // COUNT(*)
              |    END AS kept_acc_permille
              |  FROM mg WHERE margin_fix >= $c),""".stripMargin
        }.mkString("\n") +
        s"""|
            |fin AS (
            |${marginCutDials.indices.map(i => s"SELECT * FROM rep$i").mkString("\nUNION ALL\n")}
            |)
            |SELECT * FROM fin ORDER BY cut_fix""".stripMargin),

    // p07 replay: the NB chain screening the WHOLE corpus, the top-2
    // pivot and exact fixed-point margin (x139's lane), the pred='en' ∧
    // margin ≥ 3·10¹¹ keeper set, and x66's manifest arithmetic over
    // the kept documents.
    "p07_margin_screen_export" ->
      (nbChainSql("doc_id % 5 <> 0", "1 = 1") +
        """,
          |t2 AS (
          |  SELECT doc_id,
          |    MAX(CASE WHEN rn = 1 THEN pred_label END) AS pred_label,
          |    MAX(CASE WHEN rn = 1 THEN score_fix END) AS s1_fix,
          |    MAX(CASE WHEN rn = 2 THEN score_fix END) AS s2_fix
          |  FROM best WHERE rn <= 2 GROUP BY doc_id),
          |kept AS (
          |  SELECT doc_id FROM t2
          |  WHERE pred_label = 'en' AND s1_fix - s2_fix >= 300000000000),
          |d AS (
          |  SELECT d0.doc_id,
          |    CAST(CAST('0x' || substr(md5('shard:' || CAST(d0.doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS BIGINT) % 8 AS shard,
          |    len(list_filter(string_split(d0.text, ' '), t -> t <> '')) AS ntok,
          |    CAST(CAST('0x' || substr(md5(CAST(d0.doc_id AS VARCHAR) || ':' || d0.text), 1, 8) AS UBIGINT) AS BIGINT) AS chk
          |  FROM documents d0 JOIN kept USING (doc_id))
          |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens,
          |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
          |  CAST(SUM(chk) AS BIGINT) AS checksum
          |FROM d GROUP BY shard ORDER BY shard""".stripMargin),

    // Decontamination replay: the same 5-gram shingling (x122's split
    // convention, md5 digests, per-doc DISTINCT), the overlap join,
    // the support cut, the round-6 containment fraction.
    "x125_decontamination" ->
      """WITH cb AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |cs AS (
        |  SELECT DISTINCT doc_id, md5(g) AS t FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(generate_series(1, len(ts) - 4),
        |        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' ||
        |             ts[i+3] || ' ' || ts[i+4])) AS g
        |    FROM cb)),
        |bb AS (
        |  SELECT doc_id + 300000 AS bench_id, string_split(text, ' ') AS ts
        |  FROM documents
        |  WHERE doc_id % 13 = 0 AND len(string_split(text, ' ')) >= 5),
        |bs AS (
        |  SELECT DISTINCT bench_id, md5(g) AS t FROM (
        |    SELECT bench_id,
        |      unnest(list_transform(generate_series(1, len(ts) - 4),
        |        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' ||
        |             ts[i+3] || ' ' || ts[i+4])) AS g
        |    FROM bb)),
        |nd AS (SELECT doc_id, COUNT(*) AS n_doc_shingles FROM cs GROUP BY 1),
        |sh AS (
        |  SELECT cs.doc_id, bs.bench_id, COUNT(*) AS n_shared
        |  FROM cs JOIN bs USING (t) GROUP BY 1, 2)
        |SELECT s.doc_id, s.bench_id, s.n_shared, n.n_doc_shingles,
        |  round(CAST(s.n_shared AS DOUBLE) / n.n_doc_shingles, 6)
        |    AS contamination
        |FROM sh s JOIN nd n USING (doc_id)
        |WHERE s.n_shared >= 2
        |ORDER BY doc_id, bench_id""".stripMargin,

    // Compaction replay: the x121 grid/interleave arithmetic over the
    // FULL table, bounds from the STATIC split only, greatest/least
    // edge-cell clamping (which also absorbs the truncate-vs-floor
    // divergence of negative integer division between engines).
    "x126_zorder_compact" -> {
      val zExpr = (0 until 8).flatMap { i =>
        Seq(s"(((xg >> $i) & 1) << ${2 * i})",
            s"(((yg >> $i) & 1) << ${2 * i + 1})")
      }.mkString(" + ")
      s"""WITH b AS (
         |  SELECT min(l_partkey) AS xlo, max(l_partkey) AS xhi,
         |         min(l_suppkey) AS ylo, max(l_suppkey) AS yhi
         |  FROM lineitem WHERE l_orderkey % 5 <> 0),
         |u AS (
         |  SELECT l_partkey, l_suppkey FROM lineitem, b
         |  WHERE l_orderkey % 5 <> 0
         |     OR l_partkey <= xlo + (xhi - xlo) // 16),
         |g AS (
         |  SELECT
         |    greatest(0, least(255, CASE WHEN xhi > xlo
         |      THEN ((l_partkey - xlo) * 255) // (xhi - xlo)
         |      ELSE 0 END)) AS xg,
         |    greatest(0, least(255, CASE WHEN yhi > ylo
         |      THEN ((l_suppkey - ylo) * 255) // (yhi - ylo)
         |      ELSE 0 END)) AS yg
         |  FROM u, b),
         |z AS (SELECT xg, yg, $zExpr AS z FROM g),
         |c AS (SELECT xg, yg, z >> 8 AS cell FROM z)
         |SELECT cell, COUNT(*) AS n,
         |  min(xg) AS min_xg, max(xg) AS max_xg,
         |  min(yg) AS min_yg, max(yg) AS max_yg,
         |  (max(xg) < 64 OR min(xg) > 127 OR
         |   max(yg) < 0 OR min(yg) > 63) AS skippable
         |FROM c
         |GROUP BY cell
         |ORDER BY cell""".stripMargin
    },

    // Point-in-time lookup replay: the x118 chain's iv frame, a facts
    // CTE, the half-open interval left join (open interval = null
    // valid_to matches everything from its valid_from on).
    "x124_scd2_lookup" -> (scd2ChainSql +
      """,
        |facts AS (
        |  SELECT doc_id, CAST(doc_id % 6 - 1 AS INT) AS as_of
        |  FROM documents)
        |SELECT f.doc_id, f.as_of, h.valid_from, h.text
        |FROM facts f LEFT JOIN iv h ON h.doc_id = f.doc_id
        |  AND f.as_of >= h.valid_from
        |  AND (h.valid_to IS NULL OR f.as_of < h.valid_to)
        |ORDER BY f.doc_id""".stripMargin),


    // Profile replay: the same planted-null frame, one per-column
    // aggregate block per profiled column (the UNION ALL is the
    // relational spelling of the single-pass struct-array explode),
    // exact counts, native-extrema-then-cast, the house round-6
    // division for avg_len.
    "x119_column_profile" -> {
      val d =
        """WITH d AS (
          |  SELECT doc_id, lang, source, n_chars,
          |    CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang_dirty
          |  FROM documents),
          |""".stripMargin
      def block(c: String) =
        s"""  SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |    CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_null,
           |    COUNT(DISTINCT $c) AS n_distinct,
           |    CAST(min($c) AS VARCHAR) AS min_val,
           |    CAST(max($c) AS VARCHAR) AS max_val,
           |    CAST(SUM(length(CAST($c AS VARCHAR))) AS BIGINT) AS sum_len
           |  FROM d""".stripMargin
      d + Seq("doc_id", "lang", "source", "n_chars", "lang_dirty")
        .map(block).mkString("p AS (\n", "\n  UNION ALL\n", ")\n") +
      """SELECT col_name, n_rows, n_null, n_distinct, min_val, max_val,
        |  sum_len,
        |  CASE WHEN n_rows > n_null THEN
        |    round(CAST(sum_len AS DOUBLE) / (n_rows - n_null), 6) END
        |    AS avg_len
        |FROM p
        |ORDER BY col_name""".stripMargin
    },

    // PMI replay: the same whitespace split, adjacency bigrams by list
    // index, exact unigram/bigram counts, the identical left-to-right
    // IEEE pmi expression rounded to 6.
    "x120_pmi_collocations" ->
      """WITH t AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ts
        |  FROM documents),
        |uni AS (
        |  SELECT w, COUNT(*) AS c
        |  FROM (SELECT unnest(ts) AS w FROM t) GROUP BY 1),
        |bg AS (
        |  SELECT ts[i] AS w1, ts[i + 1] AS w2
        |  FROM t, LATERAL (
        |    SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g),
        |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uni),
        |tb AS (SELECT CAST(SUM(c12) AS BIGINT) AS n_bi FROM big)
        |SELECT b.w1, b.w2, b.c12, u1.c AS c1, u2.c AS c2,
        |  round(ln(CAST(b.c12 AS DOUBLE) * n_uni * n_uni /
        |    (CAST(n_bi AS DOUBLE) * u1.c * u2.c)), 6) AS pmi
        |FROM big b
        |JOIN uni u1 ON b.w1 = u1.w
        |JOIN uni u2 ON b.w2 = u2.w, tot, tb
        |WHERE b.c12 >= 3
        |ORDER BY pmi DESC, w1, w2""".stripMargin,

    // Z-order replay: the same exact-integer grid normalization, the
    // unrolled 8-bit shift/mask interleave, top-byte cells, zone-map
    // aggregates, the identical box-skip verdict.
    "x121_zorder_audit" -> {
      val zExpr = (0 until 8).flatMap { i =>
        Seq(s"(((xg >> $i) & 1) << ${2 * i})",
            s"(((yg >> $i) & 1) << ${2 * i + 1})")
      }.mkString(" + ")
      s"""WITH b AS (
         |  SELECT min(l_partkey) AS xlo, max(l_partkey) AS xhi,
         |         min(l_suppkey) AS ylo, max(l_suppkey) AS yhi
         |  FROM lineitem),
         |g AS (
         |  SELECT
         |    CASE WHEN xhi > xlo
         |      THEN ((l_partkey - xlo) * 255) // (xhi - xlo)
         |      ELSE 0 END AS xg,
         |    CASE WHEN yhi > ylo
         |      THEN ((l_suppkey - ylo) * 255) // (yhi - ylo)
         |      ELSE 0 END AS yg
         |  FROM lineitem, b),
         |z AS (SELECT xg, yg, $zExpr AS z FROM g),
         |c AS (SELECT xg, yg, z >> 8 AS cell FROM z)
         |SELECT cell, COUNT(*) AS n,
         |  min(xg) AS min_xg, max(xg) AS max_xg,
         |  min(yg) AS min_yg, max(yg) AS max_yg,
         |  (max(xg) < 64 OR min(xg) > 127 OR
         |   max(yg) < 0 OR min(yg) > 63) AS skippable
         |FROM c
         |GROUP BY cell
         |ORDER BY cell""".stripMargin
    },

    // Prefix-join replay: same planted corpus, distinct token sets,
    // df-rarity ranks, the ceil prefix cut, both-prefix candidate
    // join with the size filter, exact intersection counts, integer
    // cross-multiplied threshold.
    "x122_prefix_jaccard" ->
      """WITH corpus AS (
        |  SELECT doc_id AS id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' xtradup'
        |  FROM documents WHERE doc_id % 10 = 0),
        |base AS (
        |  SELECT id, string_split(text, ' ') AS ts FROM corpus
        |  WHERE len(string_split(text, ' ')) >= 3),
        |tok AS (
        |  SELECT DISTINCT id, md5(g) AS t FROM (
        |    SELECT id,
        |      unnest(list_transform(generate_series(1, len(ts) - 2),
        |        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
        |    FROM base)),
        |dfreq AS (SELECT t, COUNT(*) AS df FROM tok GROUP BY 1),
        |sz AS (SELECT id, COUNT(*) AS n FROM tok GROUP BY 1),
        |rk AS (
        |  SELECT tok.id, tok.t,
        |    row_number() OVER (PARTITION BY tok.id
        |      ORDER BY dfreq.df, tok.t) AS rk
        |  FROM tok JOIN dfreq USING (t)),
        |pre AS (
        |  SELECT rk.id, rk.t, sz.n
        |  FROM rk JOIN sz USING (id)
        |  WHERE rk.rk <= sz.n - ((sz.n + 1) // 2) + 1),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM pre a JOIN pre b ON a.t = b.t AND a.id < b.id
        |    AND a.n <= b.n * 2 AND b.n <= a.n * 2),
        |ins AS (
        |  SELECT c.id_a, c.id_b, COUNT(*) AS inter
        |  FROM cand c
        |  JOIN tok ta ON ta.id = c.id_a
        |  JOIN tok tb ON tb.id = c.id_b AND tb.t = ta.t
        |  GROUP BY 1, 2)
        |SELECT i.id_a, i.id_b, sa.n AS n_a, sb.n AS n_b, i.inter,
        |  sa.n + sb.n - i.inter AS uni,
        |  round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 6)
        |    AS jaccard
        |FROM ins i
        |JOIN sz sa ON sa.id = i.id_a
        |JOIN sz sb ON sb.id = i.id_b
        |WHERE i.inter * 2 >= sa.n + sb.n - i.inter
        |ORDER BY id_a, id_b""".stripMargin,
  )
}
