package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream product analytics over an (id, ts, user, type, value)
  * event log: funnel conversion, retention cohorts, Markov transition
  * matrices, and per-slice z-score anomaly reports — the classic
  * warehouse analyses an analytics engine is expected to answer next to
  * its relational surface (and, for a training-data pipeline, the usage
  * telemetry that decides what to collect more of).
  *
  * Scale design (100 TB of events): every operator is built from
  * user-keyed or type-keyed aggregations — the only shuffles are on
  * those keys, all counts combine map-side, and nothing is ever
  * user × user or event × event. The per-user window in
  * [[transitionMatrix]] partitions by user (bounded per-user event
  * counts; a pathological single-user log would need the x35 salting
  * treatment). Determinism: timestamps are exact µs values (MIN/MAX
  * are order-free), counts are integers, and every emitted ratio is an
  * exact-integer-derived IEEE division — so the x109–x113 oracles
  * replay each analysis bit-for-bit. */
object EventAnalytics {

  /** Multi-stage FUNNEL: for each user, the earliest time of stage 1,
    * then for each later stage the earliest event of that type AT OR
    * AFTER the previous reached stage (strictly sequential semantics —
    * an out-of-order conversion does not count). One row per user who
    * reached stage 1: the per-stage timestamps `t1..tk` (null once the
    * funnel is abandoned), `n_stages`, and `converted` = reached the
    * last stage within `withinHours` of stage 1 (the conversion-window
    * business rule; 0 disables the window).
    *
    * Shape: one conditional-min aggregate per stage, each keyed on the
    * user column — k small hash aggregates + k−1 user-keyed joins, no
    * self-join of the event log against itself. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String],
             withinHours: Int = 0): DataFrame = {
    require(stages.size >= 2, s"funnel needs >= 2 stages: $stages")
    funnelReport(
      stageTimes(toStaged(events, userCol, tsCol, typeCol, stages),
        userCol, stages.size),
      userCol, stages.size, withinHours)
  }

  /** Stage-typed event projection: (userCol, __stage ∈ 1..k, __ts) —
    * rows of non-stage types drop here, so everything downstream is
    * linear in the FUNNEL-RELEVANT event count. */
  private def toStaged(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, stages: Seq[String]): DataFrame = {
    // one stage index per event type: a repeated stage name would make
    // the mapping ambiguous (the old per-stage filters silently let one
    // event satisfy two stages) — reject loudly instead
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct event types: $stages")
    val idx = stages.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (st, i)) => when(col(typeCol) === st, lit(i + 1)).otherwise(acc)
    }
    events.select(col(userCol), idx.as("__stage"), col(tsCol).as("__ts"))
      .filter(col("__stage").isNotNull)
  }

  /** The strictly-sequential conditional mins t1..tk per user — k small
    * user-keyed hash aggregates + k−1 user-keyed joins. */
  private def stageTimes(staged: DataFrame, userCol: String,
                         k: Int): DataFrame = {
    val s1 = staged.filter(col("__stage") === 1)
      .groupBy(col(userCol)).agg(min(col("__ts")).as("t1"))
    (2 to k).foldLeft(s1) { (acc, i) =>
      val nxt = staged.filter(col("__stage") === i)
        .join(acc.select(col(userCol), col(s"t${i - 1}")), Seq(userCol))
        .filter(col("__ts") >= col(s"t${i - 1}"))
        .groupBy(col(userCol)).agg(min(col("__ts")).as(s"t$i"))
      acc.join(nxt, Seq(userCol), "left")
    }
  }

  private def funnelReport(times: DataFrame, userCol: String, k: Int,
                           withinHours: Int): DataFrame = {
    val stageCols = (1 to k).map(i => col(s"t$i"))
    val reached = stageCols.map(c => when(c.isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    val lastOk =
      if (withinHours <= 0) stageCols.last.isNotNull
      else stageCols.last.isNotNull &&
        stageCols.last <= col("t1") + expr(s"interval $withinHours hours")
    times.select(col(userCol) +: stageCols :+
      reached.as("n_stages") :+ coalesce(lastOk, lit(false)).as("converted"): _*)
  }

  /** INCREMENTAL funnel state — the deployment form (the s16/s17
    * frozen-definition fold discipline applied to x109): state is the
    * PRUNED per-(user, stage) candidate-timestamp log, folded one
    * micro-batch at a time; [[funnelFromState]] renders the exact
    * batch-funnel answer at any point. Exactness under ARBITRARY
    * arrival order (batches scramble event time): for stage j the
    * state keeps every seen timestamp ≤ the current conditional min
    * t_j (all of t_j's possible successors as earlier-stage minima
    * keep arriving and t_{j−1} keeps DECREASING — the admitted set
    * {ts ≥ t_{j−1}} only ever grows downward), and drops timestamps
    * > t_j, which can never again be a conditional min because t_j
    * itself stays admitted forever. So fold(prune) ∘ fold(prune) ≡
    * one batch computation — the s18 gate hashes that law against
    * x109's SQL on the full log. State size: once a user's stage j−1
    * min exists, stage j collapses toward one retained row; the
    * unbounded tail is users who hold stage-j events but NEVER start
    * the funnel (t_{j−1} null keeps all their staged rows pending —
    * exactness demands it, since any late stage-1 arrival could admit
    * them).
    *
    * `retainHours` is the production RETENTION dial that bounds that
    * tail: a PENDING staged row — stage j > 1 whose admission gate
    * t_{j−1} is null or still above its timestamp — is dropped once it
    * falls more than `retainHours` behind the state's event-time
    * frontier (max ts seen). Soundness: a pending row at ts can only
    * ever be admitted by t_{j−1} decreasing to ≤ ts, every decrease of
    * any t_i is rooted in a NEW arrival (induction down to t₁, the
    * unconditional min), and under an arrival-lateness bound of
    * `retainHours` behind the frontier every new arrival has
    * ts' ≥ frontier − retainHours — so a pending row older than that
    * can never again be admitted and cutting it provably changes NO
    * report column (the OpsSpec cut-invariance law; conditional mins
    * themselves are never pending, so started users keep their rows).
    * Set it to the pipeline's allowed lateness (watermark) bound; 0
    * disables the cut (exact under arbitrarily late arrival, unbounded
    * tail). Per-batch cost is one distinct + the k conditional-min
    * aggregates over state ∪ batch, all user-keyed, plus one max. */
  def funnelState(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, stages: Seq[String],
                  retainHours: Int = 0): DataFrame = {
    require(stages.size >= 2, s"funnel needs >= 2 stages: $stages")
    pruneState(toStaged(events, userCol, tsCol, typeCol, stages),
      userCol, stages.size, retainHours)
  }

  /** Fold one batch of events into a [[funnelState]] frame (see
    * [[funnelState]] for the `retainHours` pending-state cut). */
  def funnelFold(state: DataFrame, events: DataFrame, userCol: String,
                 tsCol: String, typeCol: String, stages: Seq[String],
                 retainHours: Int = 0): DataFrame =
    pruneState(
      state.unionByName(toStaged(events, userCol, tsCol, typeCol, stages)),
      userCol, stages.size, retainHours)

  /** Render the batch-funnel report (x109's exact columns) from a
    * [[funnelState]] frame. */
  def funnelFromState(state: DataFrame, userCol: String, nStages: Int,
                      withinHours: Int = 0): DataFrame =
    funnelReport(stageTimes(state, userCol, nStages), userCol, nStages,
      withinHours)

  private def pruneState(staged: DataFrame, userCol: String, k: Int,
                         retainHours: Int): DataFrame = {
    val distinctSt = staged.distinct()
    val times = stageTimes(distinctSt, userCol, k)
    val keep = (1 to k).map(j => col("__stage") === j &&
        (col(s"t$j").isNull || col("__ts") <= col(s"t$j")))
      .reduce(_ || _)
    val kept = distinctSt.join(times, Seq(userCol), "left").filter(keep)
    val cut =
      if (retainHours <= 0) kept
      else {
        // t_{j-1} for this row's stage: the admission gate the pending
        // test reads (stage 1 has none — never pending)
        val prevT = (2 to k).foldLeft(lit(null).cast("timestamp")) {
          (acc, j) => when(col("__stage") === j, col(s"t${j - 1}")).otherwise(acc)
        }
        val pending = col("__stage") > 1 &&
          (prevT.isNull || col("__ts") < prevT)
        val frontier = staged.agg(max(col("__ts")).as("__frontier"))
        kept.crossJoin(broadcast(frontier))
          .filter(!(pending &&
            col("__ts") < col("__frontier") - expr(s"interval $retainHours hours")))
      }
    cut.select(col(userCol), col("__stage"), col("__ts"))
  }

  /** RETENTION cohort matrix: cohort = the day of a user's first event;
    * one row per (cohort_day, offset_days) with the number of cohort
    * users active that day. The product-health triangle chart.
    *
    * Shape: one user-keyed min (cohort), one distinct over (user, day)
    * — both combinable — then a user-keyed join and a (cohort, offset)
    * count. Offsets are exact DATE differences. */
  def retentionMatrix(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame =
    retentionFromState(retentionState(events, userCol, tsCol), userCol)

  /** INCREMENTAL retention state: the distinct (user, activity-day)
    * pair set — retention's exact sufficient statistic, linear in
    * active pairs (not events) and folded by plain set union, so
    * per-batch maintenance is trivially associative-commutative (the
    * s19 gate law; unlike the funnel there is no conditional to
    * re-qualify — min-cohort and offsets are pure functions of the
    * set). */
  def retentionState(events: DataFrame, userCol: String,
                     tsCol: String): DataFrame =
    events.select(col(userCol), date_trunc("day", col(tsCol)).as("day"))
      .distinct()

  /** Fold one batch into a [[retentionState]] frame (distinct union —
    * one user/day-keyed shuffle over state ∪ batch). */
  def retentionFold(state: DataFrame, events: DataFrame, userCol: String,
                    tsCol: String): DataFrame =
    state.unionByName(retentionState(events, userCol, tsCol)).distinct()

  /** Render the cohort matrix (x110's exact columns) from a
    * [[retentionState]] frame. */
  def retentionFromState(state: DataFrame, userCol: String): DataFrame = {
    val cohort = state.groupBy(col(userCol)).agg(min(col("day")).as("cohort_day"))
    state.join(cohort, Seq(userCol))
      .withColumn("offset_days",
        datediff(col("day").cast("date"), col("cohort_day").cast("date")))
      .groupBy(col("cohort_day"), col("offset_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-user event-type TRANSITION matrix (first-order Markov): order
    * each user's events by (ts, id) — the id breaks equal-timestamp
    * ties so the sequence is total — take consecutive type pairs, count
    * per (src, dst), and emit the row-normalized transition probability
    * as an exact rational rounded to 6 places.
    *
    * Shape: ONE user-partitioned window (per-user sequences are
    * bounded), one (src, dst) count, one src-keyed total join — never
    * event × event. */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("src_type"))
      .withColumn("dst_type", lead(col("src_type"), 1).over(w))
      .filter(col("dst_type").isNotNull)
    transitionFromPairs(pairs.groupBy(col("src_type"), col("dst_type"))
      .agg(count(lit(1)).as("n_transitions")))
  }

  /** INCREMENTAL Markov maintenance — [[transitionMatrix]] kept as
    * batches arrive: state is the (src_type, dst_type, n_transitions)
    * PAIR-COUNT table (type² rows — tiny) plus a per-user FRONTIER (the
    * user's last seen (ts, id, type), one row per user), folded one
    * batch at a time. Each batch contributes its internal consecutive
    * pairs plus the boundary pair from each user's frontier to their
    * first batch event — computed by ONE lead window over frontier ∪
    * batch ([[transitionBatchPairs]]); counts then add
    * (associative-commutative, [[transitionPairsMerge]]) and the
    * frontier advances to the per-user max ([[transitionNewFrontier]]).
    *
    * ORDERING PREREQUISITE (the s20 discipline): exactness requires
    * per-user in-order arrival by (ts, id) — an ordered produce with
    * key-hash routing delivers it (each user's records sit in one
    * partition in produced order, and offset-ranged admission preserves
    * partition order across batches). Out-of-order delivery would need
    * the full event log as state — there is no smaller exact sufficient
    * statistic for sequence pairs under arbitrary arrival.
    *
    * Scale: per-batch cost is one user-keyed window over frontier ∪
    * batch (frontier is user-count-sized, batch is batch-sized) + one
    * type-keyed count — never a corpus-sized recompute. */
  def transitionBatchPairs(frontier: DataFrame, batch: DataFrame,
                           userCol: String, tsCol: String, typeCol: String,
                           idCol: String): DataFrame = {
    val b = batch.select(col(userCol), col(tsCol).as("__ts"),
      col(idCol).as("__id"), col(typeCol).as("__type"))
    val u = if (frontier == null) b else frontier.unionByName(b)
    val w = Window.partitionBy(col(userCol)).orderBy(col("__ts"), col("__id"))
    u.withColumn("dst_type", lead(col("__type"), 1).over(w))
      .filter(col("dst_type").isNotNull)
      .groupBy(col("__type").as("src_type"), col("dst_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Advance the per-user frontier to the (ts, id)-max of frontier ∪
    * batch — one user-keyed max_by aggregate. */
  def transitionNewFrontier(frontier: DataFrame, batch: DataFrame,
                            userCol: String, tsCol: String, typeCol: String,
                            idCol: String): DataFrame = {
    val b = batch.select(col(userCol), col(tsCol).as("__ts"),
      col(idCol).as("__id"), col(typeCol).as("__type"))
    val u = if (frontier == null) b else frontier.unionByName(b)
    u.groupBy(col(userCol))
      .agg(max_by(struct(col("__ts"), col("__id"), col("__type")),
        struct(col("__ts"), col("__id"))).as("__m"))
      .select(col(userCol), col("__m.__ts").as("__ts"),
        col("__m.__id").as("__id"), col("__m.__type").as("__type"))
  }

  /** Fold two pair-count frames: pure integer addition per (src, dst). */
  def transitionPairsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("src_type"), col("dst_type"))
      .agg(sum(col("n_transitions")).as("n_transitions"))

  /** Render x111's exact columns from a pair-count frame. */
  def transitionFromPairs(cnt: DataFrame): DataFrame = {
    val tot = cnt.groupBy(col("src_type"))
      .agg(sum(col("n_transitions")).as("n_src"))
    cnt.join(tot, Seq("src_type"))
      .select(col("src_type"), col("dst_type"), col("n_transitions"),
        round(col("n_transitions").cast("double") / col("n_src"), 6).as("p"))
  }

  /** ROLLING ACTIVE USERS: per calendar day in the log's span, the
    * distinct users active that day (DAU) and over the trailing
    * `windowDays` days (the WAU/MAU family). The scale form inverts the
    * range join: each (user, day) activity row EXPLODES into the
    * `windowDays` grid days it contributes to, turning the trailing
    * window into a plain day-keyed equi-join + distinct count — never a
    * theta join of the grid against the activity table. Day grid rows
    * are span-sized (tiny); the corpus-sized work is the distinct and
    * the ×windowDays explode.
    *
    * With `exact = true` the distinct counts are exact (COUNT
    * DISTINCT, combinable via Spark's two-phase plan); `exact = false`
    * is the callable HLL twin (x28 convention): both counts become
    * `approx_count_distinct(rsd)` — same shape and day grid, ±rsd
    * counts, one combinable sketch per day instead of the exact
    * distinct's shuffle of every (day, user) pair — the MAU-window
    * dial once per-day user cardinality stops fitting the agg. */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int = 7, exact: Boolean = true,
                         rsd: Double = 0.05): DataFrame =
    rollingActiveFromState(retentionState(events, userCol, tsCol), userCol,
      windowDays, exact, rsd)

  /** Render the [[rollingActiveUsers]] report from a maintained
    * activity-pair state — the SAME distinct (user, day) set
    * [[retentionState]]/[[retentionFold]] keep for retention (one state,
    * two reports: the day grid, DAU and the trailing window all derive
    * from the pair set alone, so the rolling-active report is
    * incrementally maintainable by the identical set-union fold — the
    * s19 law reused verbatim by the s24 gate). */
  def rollingActiveFromState(state: DataFrame, userCol: String,
                             windowDays: Int = 7, exact: Boolean = true,
                             rsd: Double = 0.05): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    def cntD(c: Column) =
      if (exact) countDistinct(c) else approx_count_distinct(c, rsd)
    val act = state.select(col(userCol).as("__u"), col("day"))
    val days = act
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("day"))
    val dau = act.groupBy("day").agg(cntD(col("__u")).as("dau"))
    val contrib = act.select(col("__u"), explode(sequence(col("day"),
      col("day") + expr(s"interval ${windowDays - 1} days"),
      expr("interval 1 day"))).as("day"))
    val wau = contrib.groupBy("day").agg(cntD(col("__u")).as("wau"))
    days
      .join(dau, Seq("day"), "left")
      .join(wau, Seq("day"), "left")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"))
  }

  /** Per-slice Z-SCORE anomaly report: values are pinned to integer
    * cents (⌊v·100⌉ — the measure is 2-decimal by construction), the
    * per-slice sufficient statistics (n, Σv, Σv²) are exact combinable
    * longs, and each event's z-score is the exact-integer rational
    * (v·n − Σv)/√(n·Σv² − (Σv)²) evaluated in IEEE doubles — identical
    * in any engine, so both the score and the |z| > zCut flag replay.
    * One row per event: (id, slice, value, z, is_anomaly).
    *
    * Shape: one slice-keyed aggregate (slices are few → broadcast back)
    * + one codegen'd scan — two passes, no window. Exactness bound: the
    * long products need n·Σv² and (Σv)² < 2⁶³ — at 2-decimal values
    * ≤ 500 that holds to ~10⁷ rows per slice; beyond that switch the
    * sufficient stats to DECIMAL(38) sums (same shape, wider lanes). */
  def anomalyScores(events: DataFrame, sliceCol: String, valueCol: String,
                    idCol: String, zCut: Double = 2.0): DataFrame =
    anomalyScoresFromStats(events, anomalyStats(events, sliceCol, valueCol),
      sliceCol, valueCol, idCol, zCut)

  /** The per-slice sufficient statistics (slice, __n, Σv, Σv²) as exact
    * combinable longs — anomaly detection's maintained artifact: two
    * stats frames MERGE by plain addition ([[anomalyStatsMerge]]), so
    * per-batch maintenance is trivially associative-commutative (the
    * s21 gate law; the x28/x81 sketch-family discipline — here the
    * "sketch" is three exact integers per slice). */
  def anomalyStats(events: DataFrame, sliceCol: String,
                   valueCol: String): DataFrame = {
    val vc = round(col(valueCol) * 100).cast("long")
    events.groupBy(col(sliceCol))
      .agg(count(lit(1)).as("__n"), sum(vc).as("__s1"),
        sum(vc * vc).as("__s2"))
  }

  /** Fold two stats frames: pure integer addition per slice. */
  def anomalyStatsMerge(a: DataFrame, b: DataFrame,
                        sliceCol: String): DataFrame =
    a.unionByName(b).groupBy(col(sliceCol))
      .agg(sum(col("__n")).as("__n"), sum(col("__s1")).as("__s1"),
        sum(col("__s2")).as("__s2"))

  /** Score an event frame against an (externally maintained) stats
    * frame — x113's exact columns. */
  def anomalyScoresFromStats(events: DataFrame, stats: DataFrame,
                             sliceCol: String, valueCol: String,
                             idCol: String, zCut: Double = 2.0): DataFrame = {
    val vc = round(col(valueCol) * 100).cast("long")
    val num = (vc * col("__n") - col("__s1")).cast("double")
    val varN2 = col("__n") * col("__s2") - col("__s1") * col("__s1")
    val z = num / sqrt(varN2.cast("double"))
    // zero-variance slices (varN2 = 0) have no meaningful z: null score,
    // never anomalous (the guard also keeps ±Inf/NaN out of the output)
    val defined = col("__n") > 1 && varN2 > 0
    events.join(broadcast(stats), Seq(sliceCol))
      .select(col(idCol), col(sliceCol), col(valueCol),
        when(defined, round(z, 6)).as("z"),
        coalesce(when(defined, abs(z) > zCut), lit(false))
          .as("is_anomaly"))
  }
}
