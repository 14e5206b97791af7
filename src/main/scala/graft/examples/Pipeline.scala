package graft.examples

import graft.{GraftSession, Tables}
import graft.ops.{Chunking, Dedup, Similarity, TextStats}
import org.apache.spark.sql.functions._

/** Runnable end-to-end TRAINING-DATA pipeline over the test corpus — the
  * composition a pretraining prep job actually runs, each stage a
  * harness-verified operator, all of it one lazy DataFrame program until
  * the final actions:
  *
  *   quality gate → block-level boilerplate removal → near-dup dedup
  *   (MinHash-LSH → verify → components → keep-one) → benchmark
  *   decontamination → PII redaction → chunking → sequence packing,
  *   plus the embedding-side semantic dedup and a corpus report.
  *
  * Run: `sbt "runMain graft.examples.Pipeline"` (sf0.001 by default;
  * pass an sf dir to scale up). Prints per-stage survivor counts.
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    def stage(name: String, n: Long): Unit = println(f"[pipeline] $name%-28s $n%8d rows")

    val docs = Tables.documents(spark, dir)
    stage("corpus", docs.count())

    // 1. quality gate: keep docs passing length + alpha-ratio thresholds
    val quality = docs.filter(TextStats.qualityGate(col("text")))
    stage("quality gate", quality.count())

    // 2. cross-document boilerplate removal (block-level exact dedup)
    val deboiler = Dedup.blockDedup(quality, "doc_id", "text", blockTokens = 20)
      .withColumnRenamed("clean_text", "text")
    stage("block dedup", deboiler.count())

    // 3. near-dup dedup, the LSH scale path: candidates → exact verify →
    //    connected components → min-id representative per cluster
    val kept = Dedup.nearDupDedup(
      deboiler.join(quality.select("doc_id", "lang"), "doc_id"),
      "doc_id", "text", blockCol = "lang")
    stage("near-dup keep-one", kept.count())

    // 4. benchmark decontamination: drop docs sharing an 8-gram with the
    //    "benchmark" (here: a deterministic 1/16 hash-sample stand-in)
    val bench = kept.filter(Chunking.hashSample(col("doc_id"), keepHexDigits = 1))
      .select(col("doc_id").as("b_id"), col("text"))
    val contaminated = Dedup.contaminatedDocs(kept, bench, "doc_id", "text", n = 8)
    val cleanDocs = kept.join(contaminated.select("doc_id"), Seq("doc_id"), "leftanti")
    stage("decontaminated", cleanDocs.count())

    // 5. PII scrub + chunking + fixed-capacity sequence packing
    val scrubbed = cleanDocs.select(col("doc_id"),
      TextStats.redactPii(col("text")).as("text"))
    val chunks = Chunking.chunk(scrubbed, "doc_id", "text",
      chunkTokens = 50, overlap = 10)
    stage("chunks", chunks.count())
    val packs = Chunking.packChunks(
      chunks.withColumn("source", lit("corpus")),
      "source", "n_chunk_tokens", capacity = 256, Seq("doc_id", "chunk_idx"))
    stage("training packs", packs.select("source", "pack_id").distinct().count())

    // 6. embedding-side semantic dedup (banded LSH → verify → CC → keep-one)
    val emb = Tables.embeddings(spark, dir)
    val semKept = Similarity.semanticDedup(emb, "embedding", "vec_id",
      threshold = 0.9)
    stage("embeddings kept", semKept.count())

    graft.ops.Caches.releaseAll()
    spark.stop()
    sys.exit(0)
  }
}
