package graft

import graft.ops.{Caches, Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle of operator-persisted storage: after `Caches.releaseAll()`
  * no persisted frame and no localCheckpoint block created by an operator
  * stays resident — a long-lived session does not leak executor storage
  * (clearCache alone would leave checkpoint blocks behind). */
class CachesSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("4")
  val dir = "/root/testdata/sf0.001"

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("connectedComponents: rounds release eagerly, releaseAll frees the rest") {
    val docs = Tables.documents(spark, dir)
    val before = persistedIds
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
    val cc = Dedup.connectedComponents(docs, "doc_id", pairs)
    assert(cc.count() == docs.count()) // materialize: loop ran, blocks live
    val during = persistedIds.diff(before)
    assert(during.nonEmpty, "expected tracked storage while the result is live")
    Caches.releaseAll()
    val leaked = persistedIds.diff(before)
    assert(leaked.isEmpty, s"leaked persistent RDDs after releaseAll: $leaked")
  }

  test("ivfBuildKmeans: only the final round's blocks survive the loop") {
    val emb = Tables.embeddings(spark, dir)
    val before = persistedIds
    val (cents, assigned) = Similarity.ivfBuildKmeans(emb, "embedding", "vec_id",
      nLists = 4, iters = 3)
    assert(cents.count() > 0 && assigned.count() > 0)
    // 3 Lloyd rounds + the seed each checkpointed, but prior rounds are
    // freed as soon as the next materializes — at most the final round's
    // block(s) remain
    val during = persistedIds.diff(before)
    assert(during.size <= 2, s"stale per-round checkpoints still resident: $during")
    Caches.releaseAll()
    assert(persistedIds.diff(before).isEmpty, "releaseAll left checkpoint blocks")
  }

  test("reliable-checkpoint switch: same values, durable path, no local blocks") {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val localCp = Caches.localCheckpointTracked(emb)
    val expected = localCp.orderBy("vec_id").collect()
    Caches.releaseAll()
    val before = persistedIds
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    try {
      val cp = Caches.localCheckpointTracked(emb)
      // reliable checkpoints live in the checkpoint DIR (files), not in
      // executor block storage — cluster-safe under executor loss
      assert(persistedIds.diff(before).isEmpty,
        "reliable mode must not create executor-resident blocks")
      assert(spark.sparkContext.getCheckpointDir.nonEmpty,
        "reliable mode must establish a checkpoint dir")
      // lineage truncated (same contract as localCheckpoint)
      assert(cp.queryExecution.analyzed.isInstanceOf[
        org.apache.spark.sql.execution.LogicalRDD])
      assert(cp.orderBy("vec_id").collect().sameElements(expected))
      val scoped = Caches.localCheckpointScoped(emb)
      assert(scoped.df.count() == expected.length)
      scoped.release() // no-op for reliable checkpoints; must not throw
      Caches.releaseAll()
    } finally spark.conf.unset("spark.graft.checkpoint.reliable")
  }

  test("sketchJaccardPairs: sketch build persisted (single evaluation), then released") {
    val docs = Tables.documents(spark, dir)
    val before = persistedIds
    val sketches = Dedup.groupMinhashSketch(docs, "source", "text")
    val pairs = Dedup.sketchJaccardPairs(sketches, "source")
    assert(pairs.count() > 0)
    // the sketches frame feeds both cross-join sides through one
    // InMemoryRelation — its cached buffers are persistent storage
    assert(persistedIds.diff(before).nonEmpty, "sketches were not persisted")
    Caches.releaseAll()
    assert(persistedIds.diff(before).isEmpty, "releaseAll left sketch cache")
  }
}
