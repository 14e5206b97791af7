package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.B [EXT]).
  *
  * Two paths:
  *  - [[topKCosine]]: brute-force exact — one scan, per-row score, global
  *    top-k via TakeOrderedAndProject (no full sort). The baseline and the
  *    verification oracle.
  *  - [[annTopKCosine]]: random-hyperplane LSH — score only rows whose
  *    signature is within `maxHammingBits` of the query's. At 100 TB the
  *    signature (one long) is precomputed/persisted with the corpus and the
  *    bucket filter prunes the scan to a tiny candidate set; brute force
  *    stays O(corpus) per query.
  */
object Similarity {

  /** Exact top-k by cosine against a constant query vector. */
  def topKCosine(emb: DataFrame, vecCol: String, idCol: String,
                 queryVec: Seq[Double], k: Int): DataFrame = {
    val q = lit(queryVec.toArray)
    emb
      .withColumn("cos_sim", round(VectorFunctions.cosine(col(vecCol), q), 6))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cos_sim"))
  }

  /** Approximate top-k: RHP-LSH signature prefilter, exact rescoring of
    * survivors. `nBits`=16 keeps bucket count moderate; `maxHammingBits`
    * trades recall for candidate-set size. */
  def annTopKCosine(emb: DataFrame, vecCol: String, idCol: String,
                    queryVec: Seq[Double], k: Int,
                    nBits: Int = 16, maxHammingBits: Int = 8): DataFrame = {
    val q = lit(queryVec.toArray)
    val qSig = VectorFunctions.rhpSignature(q, nBits)
    emb
      .withColumn("sig", VectorFunctions.rhpSignature(col(vecCol), nBits))
      .withColumn("sig_dist", bit_count(col("sig").bitwiseXOR(qSig)))
      .filter(col("sig_dist") <= maxHammingBits)
      .withColumn("cos_sim", round(VectorFunctions.cosine(col(vecCol), q), 6))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cos_sim"))
  }

  /** IVF (inverted-file) ANN top-k: vectors are assigned to their nearest
    * of `nLists` centroid vectors once (a persisted partition assignment at
    * corpus scale); a query probes only the `nProbe` nearest lists and
    * exact-scores those candidates. Centroids here are a deterministic
    * sample of the corpus (ids ordered, every n/nLists-th vector) rather
    * than k-means — the partition/probe machinery is identical and needs
    * no iterative driver loop; swap in trained centroids without touching
    * the query path.
    *
    * Scale shape: assignment is one broadcast-nested-loop pass over the
    * corpus (centroids are tiny); the probe filter prunes the scan to
    * nProbe/nLists of the data before any scoring. */
  def ivfTopKCosine(emb: DataFrame, vecCol: String, idCol: String,
                    queryVec: Seq[Double], k: Int,
                    nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val n = emb.count()
    val step = math.max(1L, n / nLists)
    // deterministic centroid sample: every step-th vector by id order
    val centroids = emb
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col(idCol))))
      .filter((col("rn") - 1) % step === 0)
      .limit(nLists)
      .select(col(idCol).as("centroid_id"), v.as("cv"))
    // assign each vector to its nearest centroid by cosine
    val assigned = emb.select(col(idCol), v.as("vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("score", VectorFunctions.dot(col("vec"), col("cv")) /
        (VectorFunctions.norm(col("vec")) * VectorFunctions.norm(col("cv"))))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
          .orderBy(col("score").desc, col("centroid_id").asc)))
      .filter(col("rk") === 1)
      .select(col(idCol), col("vec"), col("centroid_id"))
    // probe: the nProbe centroids nearest the query
    val q = lit(queryVec.toArray)
    val probeLists = centroids
      .withColumn("qscore", VectorFunctions.dot(col("cv"), q) /
        (VectorFunctions.norm(col("cv")) * VectorFunctions.norm(q)))
      .orderBy(col("qscore").desc, col("centroid_id").asc)
      .limit(nProbe)
      .select("centroid_id")
    assigned
      .join(broadcast(probeLists), "centroid_id")
      .withColumn("cos_sim", round(VectorFunctions.dot(col("vec"), q) /
        (VectorFunctions.norm(col("vec")) * VectorFunctions.norm(q)), 6))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cos_sim"))
  }

  /** Exact all-pairs cosine ≥ threshold via self-join. O(n²) dot products —
    * the verification path for [[cosineNearDupPairs]]; at 100 TB use the
    * LSH-blocked variant (or IVF partitioning) instead. */
  def exactCosinePairs(emb: DataFrame, vecCol: String, idCol: String,
                       threshold: Double): DataFrame = {
    // Norms are precomputed per side (O(n) instead of O(n²)); the pair row
    // then evaluates dot/(na*nb) — the identical IEEE sequence to the
    // oracle's dot/(sqrt(Σa²)·sqrt(Σb²)), just not recomputed per pair.
    val withNorm = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", VectorFunctions.norm(col("v")))
    val l = withNorm.select(col(idCol).as("a_id"), col("v").as("vec_a"), col("nrm").as("na"))
    val r = withNorm.select(col(idCol).as("b_id"), col("v").as("vec_b"), col("nrm").as("nb"))
    l.crossJoin(r)
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos_sim",
        round(VectorFunctions.dot(col("vec_a"), col("vec_b")) / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("a_id", "b_id", "cos_sim")
  }

  /** All near-duplicate pairs by embedding cosine ≥ threshold, blocked by
    * LSH signature chunks (8-bit) to avoid the full cross join; exact
    * cosine verification on candidates. */
  def cosineNearDupPairs(emb: DataFrame, vecCol: String, idCol: String,
                         threshold: Double, nBits: Int = 16): DataFrame = {
    val sigs = emb.withColumn("sig", VectorFunctions.rhpSignature(col(vecCol), nBits))
      .select(col(idCol), col("sig"), col(vecCol))
    val chunks = (0 until nBits / 8).map(j => struct(lit(j).as("j"),
      shiftrightunsigned(col("sig"), j * 8).bitwiseAND(lit(0xFFL)).as("v")))
    val blocked = sigs.withColumn("chunk", explode(array(chunks: _*)))
      .select(col(idCol), col("chunk.j"), col("chunk.v"), col(vecCol))
    val l = blocked.select(col(idCol).as("a_id"), col("j"), col("v"),
      col(vecCol).as("vec_a"))
    val r = blocked.select(col(idCol).as("b_id"), col("j"), col("v"),
      col(vecCol).as("vec_b"))
    l.join(r, Seq("j", "v"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "vec_a", "vec_b").distinct()
      .withColumn("cos_sim",
        round(VectorFunctions.cosine(col("vec_a"), col("vec_b")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("a_id", "b_id", "cos_sim")
  }
}
