package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data EXPORT: deterministic shard assignment, the partitioned
  * write, and a verifiable manifest — the last mile of the pipeline,
  * where a cleaned corpus becomes the fixed set of files a training job
  * reads. Requirements at 100 TB: shard membership must be a pure
  * function of the row (re-running the export reproduces byte-identical
  * shards; two writers never disagree), shards must be size-balanced
  * (md5 is uniform), and the manifest must make corruption or partial
  * writes DETECTABLE without re-reading the corpus twice — hence
  * per-shard counts, id bounds, token totals, and an order-free content
  * checksum (a sum of per-doc 32-bit content hashes commutes, so it is
  * partition-order-independent and shard manifests add up to the corpus
  * manifest — the same re-aggregation law as the sketch family).
  *
  * Determinism (the x66 oracle replays the manifest): shard =
  * md5-derived 32-bit int mod S over the id (engine-portable); token
  * counts are the standard whitespace tokens; the checksum sums exact
  * integers. */
object Export {

  /** Deterministic shard of an id: first 8 md5 hex digits of
    * "shard:<id>" as an unsigned 32-bit int, mod `nShards`. */
  def shardOf(id: Column, nShards: Int): Column =
    conv(substring(md5(concat(lit("shard:"), id.cast("string"))), 1, 8),
      16, 10).cast("long") % nShards

  /** 32-bit content hash of one document: md5 over "id:text" — the
    * checksum unit whose per-shard SUM is the manifest's integrity
    * field. */
  private def contentHash(id: Column, text: Column): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":"), text)), 1, 8),
      16, 10).cast("long")

  /** Per-shard manifest: (shard, n_docs, n_tokens, min_id, max_id,
    * checksum). ONE map-side-combinable aggregation over the corpus;
    * every field re-aggregates (counts/sums add, min/max fold), so
    * shard-level manifests from independent writers merge to the corpus
    * manifest exactly. Harness query x66 gates this against a DuckDB
    * oracle replaying hash, counts, and checksum. */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
                    nShards: Int = 8): DataFrame = {
    require(nShards > 0, s"need a positive shard count, got $nShards")
    docs
      .select(col(idCol).as("__id"), col(textCol).as("__t"))
      .select(shardOf(col("__id"), nShards).as("shard"), col("__id"),
        TextStats.tokenCount(col("__t")).as("__ntok"),
        contentHash(col("__id"), col("__t")).as("__chk"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("__ntok")).as("n_tokens"),
        min(col("__id")).as("min_id"), max(col("__id")).as("max_id"),
        sum(col("__chk")).as("checksum"))
      .orderBy("shard")
  }

  /** PACK-payload manifest (p08 — VERDICT r14 next #6): the loader-
    * facing form of a [[graft.ops.Chunking.packChunksStrict]] result.
    * A training loader consumes each pack as ONE concatenated token-id
    * sequence with doc/chunk-boundary OFFSETS (where in the id stream
    * each chunk starts), so the integrity field must cover the payload
    * bytes and the boundaries, not just row counts: per pack, the
    * chunks sort by `orderCols` (the pack fold's own order), the
    * payload joins their `idsCol` texts, the offsets are the exclusive
    * running sum of `nIdsCol`, and the pack's 32-bit content hash runs
    * over "group:pack:offsets:payload". Packs then roll up through the
    * [[shardManifest]] discipline — shard = md5 of the pack key mod
    * `nShards`, checksum = order-free SUM of pack hashes — so
    * independent writers' manifests add to the corpus manifest and any
    * drift in chunking, encoding, packing order, or boundary arithmetic
    * flips a shard checksum.
    *
    * Scale shape: one shuffle to (groupCol, pack_id) — pack-sized
    * groups (≤ capacity ids each), never corpus-wide — then the
    * shard-keyed rollup; the per-pack fold is codegen'd HOFs, no UDF. */
  def packPayloadManifest(packed: DataFrame, groupCol: String,
                          idsCol: String, nIdsCol: String,
                          orderCols: Seq[String],
                          nShards: Int = 8): DataFrame = {
    require(nShards > 0, s"need a positive shard count, got $nShards")
    val item = struct(
      orderCols.map(col) ++
        Seq(col(nIdsCol).cast("long").as("__n"), col(idsCol).as("__ids")): _*)
    val offs = (arr: Column) => aggregate(arr,
      struct(array().cast("array<bigint>").as("o"), lit(0L).as("run")),
      (st, x) => struct(
        concat(st.getField("o"), array(st.getField("run"))).as("o"),
        (st.getField("run") + x.getField("__n")).as("run")),
      st => st.getField("o"))
    val key = concat_ws(":", col("__g"), col("pack_id").cast("string"))
    packed
      .groupBy(col(groupCol).cast("string").as("__g"), col("pack_id"))
      .agg(sort_array(collect_list(item)).as("__arr"))
      .withColumn("__n_chunks", size(col("__arr")).cast("long"))
      .withColumn("__n_ids", aggregate(col("__arr"), lit(0L),
        (a, x) => a + x.getField("__n")))
      .withColumn("__payload",
        array_join(transform(col("__arr"), _.getField("__ids")), " "))
      .withColumn("__offsets", array_join(
        transform(offs(col("__arr")), _.cast("string")), " "))
      .select(shardOf(key, nShards).as("shard"), col("__n_chunks"),
        col("__n_ids"),
        conv(substring(md5(concat_ws(":", key, col("__offsets"),
          col("__payload"))), 1, 8), 16, 10).cast("long").as("__chk"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_packs"), sum(col("__n_chunks")).as("n_chunks"),
        sum(col("__n_ids")).as("n_ids"), sum(col("__chk")).as("checksum"))
      .orderBy("shard")
  }

  /** CURRICULUM manifest: rank documents easiest-first by bigram-LM
    * fluency ([[LangModel.perplexityScoreSelf]]'s nll — low = fluent)
    * and cut the ranking into `nBuckets` integer-rank buckets — the
    * difficulty-ordered export a curriculum-training job consumes
    * (bucket 0 first). Docs with zero transitions (< 2 tokens) carry no
    * signal and are excluded. Per bucket: doc count, transition mass,
    * and the nll bounds the bucket spans.
    *
    * Determinism (the x69 oracle replays it): nll is x48's fixed-point
    * convention; the rank is a total order on (nll, id); the bucket is
    * pure integer arithmetic floor((rn−1)·B/m). The ranking is one
    * global sort of doc-sized rows — the same extreme-scale swap note
    * as [[graft.ops.Dsir.dsirSelect]];
    * [[curriculumManifestThreshold]] is the callable swap. */
  def curriculumManifest(docs: DataFrame, idCol: String, textCol: String,
                         nBuckets: Int = 10): DataFrame = {
    require(nBuckets > 0, s"need a positive bucket count, got $nBuckets")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("nll_nats").asc, col(idCol).asc)
    LangModel.perplexityScoreSelf(docs, idCol, textCol)
      .filter(col("n_transitions") > 0)
      .withColumn("rn", row_number().over(w))
      .withColumn("m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("bucket", expr(s"((rn - 1) * $nBuckets) div m"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_transitions")).as("n_transitions"),
        min(col("nll_nats")).as("nll_lo"), max(col("nll_nats")).as("nll_hi"))
      .orderBy("bucket")
  }

  /** The EXTREME-SCALE curriculum form (VERDICT r15 #2 — the
    * [[graft.ops.Dsir.dsirSelectThreshold]] treatment applied to the
    * LAST global window in the export lane): bucket documents by
    * comparing each doc's nll against FROZEN ascending cut points
    * instead of ranking the whole corpus — bucket = #{cuts ≤ nll}, a
    * pure per-doc function, so the plan has no corpus-width
    * single-partition stage: at 100 TB [[curriculumManifest]]'s
    * unpartitioned row_number over doc-sized rows is the bottleneck,
    * while the threshold form stays embarrassingly parallel (one
    * map-side-combinable aggregate over ≤ cuts+1 buckets). The cuts are
    * a frozen dial (a prior rank run's bucket-boundary nll values, or
    * quantiles of an nll sample) — model-sized input. Same output shape
    * as [[curriculumManifest]]; buckets no doc reaches simply don't
    * appear (report rows are data, not a fixed grid).
    *
    * DIAL RULE (the dsirSelectThreshold dead-band, in the ROUNDED
    * lane): `cutsNats` compare against `nll_nats`, the 6-decimal
    * ROUNDED per-transition nll (x48's hash-gated reported lane, so
    * the compared value is cross-engine bit-stable) — a cut must NOT
    * be an attainable 6-decimal grid value, or a doc could sit exactly
    * at the boundary; pick cuts strictly between grid points (e.g.
    * ending in 5e-7). OpsSpec pins cut ≡ rank at a fixture boundary;
    * ScaleSpec pins the window-free plan. */
  def curriculumManifestThreshold(docs: DataFrame, idCol: String,
                                  textCol: String,
                                  cutsNats: Seq[Double]): DataFrame =
    curriculumThresholdFromScored(
      LangModel.perplexityScoreSelf(docs, idCol, textCol), cutsNats)

  /** The bucket/aggregate tail of [[curriculumManifestThreshold]] over
    * an already-scored (…, n_transitions, nll_nats) frame — shared
    * with the streaming serve path (s37 scores from MAINTAINED LM
    * stats and buckets here, so batch and streaming provably run the
    * same arithmetic). */
  def curriculumThresholdFromScored(scored: DataFrame,
                                    cutsNats: Seq[Double]): DataFrame = {
    require(cutsNats.nonEmpty, "need at least one cut point")
    require(cutsNats.sliding(2).forall(w => w.size < 2 || w(0) < w(1)),
      s"cuts must be strictly increasing: $cutsNats")
    val bucket = cutsNats
      .map(c => when(col("nll_nats") >= lit(c), 1).otherwise(0))
      .reduce(_ + _)
    scored
      .filter(col("n_transitions") > 0)
      .withColumn("bucket", bucket.cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_transitions")).as("n_transitions"),
        min(col("nll_nats")).as("nll_lo"), max(col("nll_nats")).as("nll_hi"))
      .orderBy("bucket")
  }

  /** The WRITE: one parquet directory per shard (`shard=N/`), rows
    * sorted by id within each shard so re-runs produce identical file
    * contents. Returns Unit — reload with `spark.read.parquet(path)`;
    * OpsSpec's "shard export" test asserts the written shards agree
    * with [[shardManifest]] row-for-row. */
  def exportShards(docs: DataFrame, idCol: String, path: String,
                   nShards: Int = 8): Unit =
    docs
      .withColumn("shard", shardOf(col(idCol), nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** SNAPSHOT DIFF — the change-data report between two versions of a
    * corpus (the dataset-ops view a curation pipeline publishes next to
    * each refresh): one row per id in either snapshot with
    * status ∈ {added, removed, changed, unchanged} and both payload
    * fingerprints. Content equality is md5-of-payload, so the verdict
    * is insensitive to row order, file layout, or storage encoding —
    * and the x115 oracle replays it verbatim.
    *
    * Shape: two codegen'd fingerprint scans + ONE id-keyed full-outer
    * join — never payload × payload; at 100 TB both sides shuffle once
    * on the id (or co-locate for free if the snapshots share an
    * id-bucketed layout). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   payloadCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), md5(col(payloadCol)).as("old_fp"))
    val n = newDf.select(col(idCol), md5(col(payloadCol)).as("new_fp"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") === col("new_fp"), "unchanged")
          .otherwise("changed").as("status"),
        col("old_fp"), col("new_fp"))
  }
}
