package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Diversified re-ranking of retrieval candidates — Maximal Marginal
  * Relevance (Carbonell & Goldstein 1998), the standard fix for the
  * failure mode every pure top-k serve in this repo shares: the k most
  * relevant results are often near-duplicates of each other (by
  * construction, on a corpus the dedup family exists to clean). MMR
  * greedily picks the candidate maximizing
  *
  *   λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s)
  *
  * at λ = ½, which this implementation runs entirely in 5·10⁸
  * fixed-point: rel_half = ⌊cos(q,c)·5·10⁸⌋ and pen(c,s) =
  * ⌊cos(c,s)·5·10⁸⌋ are exact longs, so every argmax is an integer
  * comparison with (score DESC, id ASC) tie-breaks — greedy selection
  * is deterministic and the x95 oracle replays each round as an
  * unrolled CTE (anti-join the selected set, MAX-penalty join, argmax
  * window).
  *
  * Scale shape: MMR is a RE-rank — it runs on the ≤ nCand candidates a
  * bucketed server already cut (x75's `ivfPqServeAll`, x45's banded
  * serve), never the corpus. Each of the kSel rounds is one
  * (q_id)-keyed join of the ≤ nCand-row pool against the ≤ round-sized
  * selected set plus one ≤ nCand-row window per query — work is
  * queries·kSel·nCand², all model-sized per query, shuffles keyed on
  * q_id throughout. */
object Rerank {

  /** Fixed-point half-scale cosine: ⌊cos(a,b)·5·10⁸⌋ as a long — the
    * λ = ½ weight folded into the scale so relevance and penalty share
    * one exact integer unit. */
  private def cosHalfFix(a: org.apache.spark.sql.Column,
                         b: org.apache.spark.sql.Column) =
    floor(VectorFunctions.cosine(a, b) * lit(5e8)).cast("long")

  /** Greedy MMR over a candidate frame `cands` of (qIdCol, idCol,
    * relCol: long fixed-point relevance, vecCol: array<double>).
    * Selects `kSel` rows per query; returns (qIdCol, sel_rank, idCol,
    * relCol, mmr_fix, mmr) where mmr_fix = rel − max-penalty at
    * selection time (round 1 has no penalty: mmr_fix = rel). Queries
    * with fewer than kSel candidates return them all. */
  def mmrRerank(cands: DataFrame, qIdCol: String, idCol: String,
                relCol: String, vecCol: String, kSel: Int): DataFrame = {
    require(kSel >= 1, s"kSel must be >= 1, got $kSel")
    // EAGER checkpoints (r18; the [[kCenterSample]] idiom, guide §5):
    // the lazy-persist form re-entered its own history — each round's
    // broadcast build of the selected set re-derived the candidate
    // generator (a queries×corpus relevance pass for x95) and the whole
    // previous-round union chain. pool0 materializes the candidate pool
    // ONCE; each round's selected set is pool-sized and checkpointed,
    // the previous round's blocks freed as soon as the next lands.
    val pool0 = Caches.localCheckpointTracked(
      cands.select(col(qIdCol), col(idCol),
        col(relCol), col(vecCol).cast("array<double>").as("__v")))
    // round 1: pure relevance argmax (MMR's empty-penalty case)
    var sel = Caches.localCheckpointScoped(pool0
      .withColumn("__rk", row_number().over(Window.partitionBy(qIdCol)
        .orderBy(col(relCol).desc, col(idCol).asc)))
      .filter(col("__rk") === 1)
      .select(col(qIdCol), lit(1).as("sel_rank"), col(idCol), col(relCol),
        col(relCol).as("mmr_fix"), col("__v")))
    try for (t <- 2 to kSel) {
      val selV = sel.df.select(col(qIdCol), col(idCol).as("__sid"),
        col("__v").as("__sv"))
      val pool = pool0
        .join(selV.select(col(qIdCol), col("__sid").as(idCol)),
          Seq(qIdCol, idCol), "left_anti")
      val scored = pool
        .join(selV, qIdCol)
        .groupBy(col(qIdCol), col(idCol))
        .agg(first(col(relCol)).as(relCol), first(col("__v")).as("__v"),
          max(cosHalfFix(col("__v"), col("__sv"))).as("__pen"))
        .withColumn("mmr_fix", col(relCol) - col("__pen"))
      val picked = scored
        .withColumn("__rk", row_number().over(Window.partitionBy(qIdCol)
          .orderBy(col("mmr_fix").desc, col(idCol).asc)))
        .filter(col("__rk") === 1)
        .select(col(qIdCol), lit(t).as("sel_rank"), col(idCol), col(relCol),
          col("mmr_fix"), col("__v"))
      val next = Caches.localCheckpointScoped(sel.df.unionByName(picked))
      sel.release() // round t materialized → free round t-1's blocks
      sel = next
    } catch {
      case t: Throwable => sel.release(); throw t
    }
    // the final round's blocks back the returned plan — registry-owned
    Caches.adopt(sel).select(col(qIdCol), col("sel_rank"), col(idCol),
      col(relCol), col("mmr_fix"),
      round(col("mmr_fix").cast("double") / lit(5e8), 6).as("mmr"))
  }

  /** k-CENTER GREEDY coreset sampling (farthest-point traversal, the
    * 2-approximation of Gonzalez 1985) — the diversity-SELECTION
    * sibling of [[mmrRerank]]: pick `kSel` corpus rows that COVER the
    * embedding space (each round takes the point FARTHEST from every
    * already-picked center, i.e. argmin of its max cosine to the
    * selected set). The standard coreset/data-pruning move: a kSel-row
    * sample whose coverage radius is within 2× of the optimal
    * k-center's, used to seed curricula, pick annotation batches, or
    * prune redundant corpus mass.
    *
    * Determinism: the seed is the SMALLEST id (documented convention —
    * any fixed seed gives the same 2-approximation bound); every round
    * is an exact-integer argmin over ⌊cos·10⁹⌋ longs with id ASC ties.
    * Each round is one anti-join + one broadcast pass against the ≤
    * kSel selected vectors + one TakeOrderedAndProject argmin — never
    * a global window, never a corpus×corpus product; work is
    * kSel·n·d. Harness query x98 unrolls the rounds as CTEs.
    *
    * Returns (sel_rank, idCol, cov_fix, cov) where cov_fix is the max
    * fixed-point cosine to the previously selected centers at
    * selection time (NULL for the seed) — monotonically non-decreasing
    * in sel_rank from round 2 on (the classic shrinking-radius law:
    * pools shrink and max-cos grows with the center set; pinned in
    * OpsSpec). */
  def kCenterSample(emb: DataFrame, vecCol: String, idCol: String,
                    kSel: Int): DataFrame = {
    require(kSel >= 1, s"kSel must be >= 1, got $kSel")
    val pool0 = Caches.persistTracked(emb.select(col(idCol),
      col(vecCol).cast("array<double>").as("__v")))
    val seed = Caches.localCheckpointTracked(
      pool0.orderBy(col(idCol).asc).limit(1)
        .select(lit(1).as("sel_rank"), col(idCol),
          lit(null).cast("long").as("cov_fix"), col("__v")))
    // the pool carries a RUNNING max-cos-to-selected (__pen): each round
    // folds only the 1-row new center in with `greatest` — exact longs,
    // so the fold equals the fresh per-round MAX the oracle computes —
    // and each frame is EAGERLY checkpointed so round t+1's single-row
    // broadcast never re-derives the round-t chain (the lazy-persist
    // form re-entered its own union through every broadcast: measured
    // 26.6 s → the incremental fold is one n-row map per round)
    var sel = seed
    var pool = Caches.localCheckpointTracked(
      pool0.join(broadcast(seed.select(col(idCol))), Seq(idCol), "left_anti")
        .crossJoin(broadcast(seed.select(col("__v").as("__pv"))))
        .withColumn("__pen", floor(VectorFunctions.cosine(col("__v"),
          col("__pv")) * lit(1e9)).cast("long"))
        .drop("__pv"))
    for (t <- 2 to kSel) {
      val picked = Caches.localCheckpointTracked(
        pool.orderBy(col("__pen").asc, col(idCol).asc).limit(1)
          .select(lit(t).as("sel_rank"), col(idCol),
            col("__pen").as("cov_fix"), col("__v")))
      sel = sel.unionByName(picked)
      if (t < kSel) {
        pool = Caches.localCheckpointTracked(
          pool.join(broadcast(picked.select(col(idCol))), Seq(idCol),
              "left_anti")
            .crossJoin(broadcast(picked.select(col("__v").as("__pv"))))
            .withColumn("__pen", greatest(col("__pen"),
              floor(VectorFunctions.cosine(col("__v"), col("__pv")) *
                lit(1e9)).cast("long")))
            .drop("__pv"))
      }
    }
    sel.select(col("sel_rank"), col(idCol), col("cov_fix"),
      round(col("cov_fix").cast("double") / lit(1e9), 6).as("cov"))
  }
}
