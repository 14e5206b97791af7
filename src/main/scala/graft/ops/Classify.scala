package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive-Bayes text classifier: the model-based quality /
  * language / domain filter of public training-data pipelines (the role
  * fastText plays in CCNet/RedPajama-style curation — a cheap linear
  * classifier over token counts, trained on a labeled slice, applied to
  * the whole corpus). A neural classifier is out of scope for an
  * analytics engine; add-one-smoothed multinomial NB is the classic
  * count-based formulation and exercises the same engine shape as
  * [[LangModel]]: a trained model TABLE broadcast against the corpus it
  * scores.
  *
  * Scale design (100 TB): training is two map-side-combinable groupBy
  * counts over the token stream (per-class token counts and per-class
  * doc counts — token keys are near-uniform, no skew) plus one
  * countDistinct action for V. Scoring broadcasts the model — a real
  * deployment caps the vocabulary (top-K by frequency), so the
  * (class × vocab) likelihood table is small by construction — and the
  * per-document pass is explode + two broadcast hash joins + ONE
  * combinable per-doc aggregate. The argmax over classes is a
  * min(struct(...)) aggregate, NOT a window: no per-doc sort partition,
  * fully map-side combinable. Remove the broadcast hints for an
  * uncapped web-scale vocab and the joins degrade gracefully to shuffle
  * equi-joins on the same keys.
  *
  * Determinism (the x108 oracle replays training AND scoring exactly):
  * every probability is an exact-integer-derived rational —
  * prior = n_c/N, likelihood = (c_wc+1)/(T_c+V) — and `ln` over that
  * domain is bit-identical between the JVM and DuckDB's libm (the
  * proven x48/x52/x60 convention). Each term pins to a long via
  * floor(ln(p)·10¹²), so per-document class scores are exact integer
  * sums — order-independent — and the argmax (score DESC, label ASC)
  * is a total order. */
object Classify {

  /** A trained NB model: `classStats` one row per class
    * (label, prior_fix = ⌊ln(n_c/N)·10¹²⌋, n_tok = T_c), `wordCounts`
    * (label, w, cwc), and the training vocabulary size for add-one
    * smoothing. */
  case class NbModel(classStats: DataFrame, wordCounts: DataFrame,
                     vocabSize: Long)

  /** Train on a labeled corpus: per-class doc counts (the prior), the
    * per-class token totals and (class, word) counts (the likelihood),
    * V by one countDistinct action. */
  def trainNaiveBayes(train: DataFrame, labelCol: String,
                      textCol: String): NbModel = {
    val tok = train.select(col(labelCol).as("label"),
      explode(split(col(textCol), " ")).as("w"))
    val wc = tok.groupBy("label", "w").agg(count(lit(1)).as("cwc"))
    val ctok = tok.groupBy("label").agg(count(lit(1)).as("n_tok"))
    val cls = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val row = train.agg(count(lit(1))).head()
    val n = row.getLong(0)
    val v = tok.agg(countDistinct(col("w"))).head().getLong(0)
    val classStats = cls.join(ctok, Seq("label"))
      .select(col("label"),
        floor(log(col("n_docs").cast("double") / lit(n.toDouble)) * lit(1e12))
          .cast("long").as("prior_fix"),
        col("n_tok"))
    NbModel(classStats, wc, v)
  }

  /** Score every document against every class and keep the argmax. One
    * row per input doc: (id, pred_label, score_nats). Unseen words fall
    * back to the smoothing floor (cwc = 0), so held-out text scores
    * under every class; ties break on the smaller label. Scoring is a
    * pure per-document function of the frozen model — the property the
    * s17 streaming gate leans on (batch boundaries cannot change any
    * document's scores). */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
              m: NbModel): DataFrame = {
    val perClass = nbClassScores(docs, idCol, textCol, m)
    // argmax by combinable aggregate: min over (−score, label) = highest
    // score, smallest label on ties — no per-doc window partition
    perClass
      .groupBy(col(idCol))
      .agg(min(struct((-col("score_fix")).as("neg"),
        col("label").as("pred_label"),
        col("score_fix").as("score_fix"))).as("b"))
      .select(col(idCol), col("b.pred_label").as("pred_label"),
        round(col("b.score_fix").cast("double") / lit(1e12), 6).as("score_nats"))
  }

  /** The per-(doc, class) fixed-point score frame behind [[nbScore]]:
    * (idCol, label, score_fix) — one row per document per model class
    * (the cross join guarantees coverage; unseen words fall back to the
    * cwc = 0 smoothing floor). Scale shape: scan + two broadcast hash
    * joins + one (doc, class)-keyed aggregate — docs × L rows, L the
    * class count (small by construction). */
  def nbClassScores(docs: DataFrame, idCol: String, textCol: String,
                    m: NbModel): DataFrame = {
    val stok = docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
    stok
      .crossJoin(broadcast(m.classStats))
      .join(broadcast(m.wordCounts), Seq("label", "w"), "left")
      .withColumn("lw_fix",
        floor(log((coalesce(col("cwc"), lit(0L)) + lit(1.0)) /
          (col("n_tok") + lit(m.vocabSize)).cast("double")) * lit(1e12))
          .cast("long"))
      .groupBy(col(idCol), col("label"), col("prior_fix"))
      .agg(sum(col("lw_fix")).as("s_fix"))
      .select(col(idCol), col("label"),
        (col("s_fix") + col("prior_fix")).as("score_fix"))
  }

  /** Per-document CONFIDENCE MARGIN: best-class score minus runner-up
    * score in the fixed-point lane — the argmax-confidence proxy a
    * screening pipeline thresholds on (fixed-point subtraction: exact
    * integers, no softmax float soup). One row per doc: (idCol,
    * actual_label, pred_label, margin_fix, is_correct). Requires a
    * model with ≥ 2 classes — with one class there is no runner-up and
    * the ANSI element_at fails loudly rather than inventing a margin.
    *
    * The top-2 comes from ONE combinable aggregate (array_sort over the
    * collected (−score, label) structs, slice 2 — L entries per doc, L
    * the class count), not a per-doc window: no global sort, one
    * doc-keyed shuffle. */
  def nbMarginScores(m: NbModel, docs: DataFrame, idCol: String,
                     labelCol: String, textCol: String): DataFrame =
    nbClassScores(docs, idCol, textCol, m)
      .groupBy(col(idCol))
      .agg(slice(array_sort(collect_list(struct(
        (-col("score_fix")).as("neg"), col("label").as("l")))), 1, 2).as("t"))
      .select(col(idCol),
        element_at(col("t"), 1).getField("l").as("pred_label"),
        (element_at(col("t"), 2).getField("neg") -
          element_at(col("t"), 1).getField("neg")).as("margin_fix"))
      .join(docs.select(col(idCol), col(labelCol).as("actual_label")),
        Seq(idCol))
      .select(col(idCol), col("actual_label"), col("pred_label"),
        col("margin_fix"),
        (col("actual_label") === col("pred_label")).as("is_correct"))

  /** CALIBRATION report over an [[nbMarginScores]] frame: rank docs by
    * confidence margin (ascending, doc id tie-break), cut the ranking
    * into `nBins` exact integer-rank bins (x69's floor((rn−1)·B/m)
    * convention), and report per-bin accuracy in the permille lane —
    * the reliability table that tells a pipeline whether "high margin"
    * actually means "more often right" before it trusts a margin
    * threshold as a keep gate. One row per non-empty bin: (bin, n_docs,
    * n_correct, acc_permille, min_margin_nats, max_margin_nats).
    * Counts and the permille accuracy are exact integers; the margin
    * BOUNDS report in the round-6 nats lane, not raw fix units —
    * per-word ln floors can land ±1 ulp apart across engines, so
    * summed margins carry a few units of fix jitter (the same reason
    * [[nbScore]] reports score_nats). The RANK still uses the exact
    * fix lane: an order flip would need two DISTINCT margins within
    * that jitter (~3·10⁻¹² nats apart), not a realistic collision for
    * sums of ln terms, while ties (identical texts) are exactly equal
    * in both engines and break on the doc id.
    *
    * The ranking is one global sort of doc-sized rows — the same
    * extreme-scale swap note as [[Export.curriculumManifest]] (a
    * report path; swap in a sampled-boundaries rank at 100 TB). */
  def nbCalibrationReport(margins: DataFrame, idCol: String,
                          nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"need a positive bin count, got $nBins")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("margin_fix").asc, col(idCol).asc)
    margins
      .withColumn("rn", row_number().over(w))
      .withColumn("m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("bin", expr(s"((rn - 1) * $nBins) div m"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        count_if(col("is_correct")).as("n_correct"),
        round(min(col("margin_fix")).cast("double") / lit(1e12), 6)
          .as("min_margin_nats"),
        round(max(col("margin_fix")).cast("double") / lit(1e12), 6)
          .as("max_margin_nats"))
      .withColumn("acc_permille", expr("(n_correct * 1000) div n_docs"))
      .select(col("bin"), col("n_docs"), col("n_correct"),
        col("acc_permille"), col("min_margin_nats"), col("max_margin_nats"))
      .orderBy("bin")
  }

  /** MARGIN-SCREEN dial ladder (the x155/x158 tuning-table discipline
    * on the quality lane): sweep confidence-margin cuts over ONE
    * [[nbMarginScores]] frame and report, per cut, the retention and
    * the accuracy among the kept — the precision-vs-threshold table a
    * deployer reads before freezing p07's margin gate. Cut sets NEST
    * (margin ≥ c₂ ⊆ margin ≥ c₁ for c₁ < c₂), so the scored frame is
    * computed once (checkpoint it at the call site) and each dial is a
    * filter slice + one aggregate. One row per cut: (cut_fix, n_kept,
    * n_correct_kept, kept_acc_permille) — all exact integers (margins
    * are fixed-point longs, the cut a literal long compare).
    *
    * DIAL RULE: summed per-word ln floors carry ±few-fix-unit
    * cross-engine jitter (the x139/p07 caveat), so cuts must sit a
    * dead-band away from every attainable margin — round-nats dials
    * (10¹¹-unit multiples) are ~10 orders of magnitude away from the
    * jitter; OpsSpec pins the fixture margin-to-cut distance. */
  def marginScreenLadder(scored: DataFrame,
                         cutsFix: Seq[Long]): DataFrame = {
    require(cutsFix.nonEmpty, "need at least one margin cut")
    require(cutsFix.sliding(2).forall(w => w.size < 2 || w(0) < w(1)),
      s"cuts must be strictly increasing: $cutsFix")
    cutsFix.map { c =>
      scored.filter(col("margin_fix") >= c)
        .agg(count(lit(1)).as("n_kept"),
          count_if(col("is_correct")).as("n_correct_kept"))
        .select(lit(c).as("cut_fix"), col("n_kept"), col("n_correct_kept"),
          when(col("n_kept") === 0, lit(0L))
            .otherwise(expr("(n_correct_kept * 1000) div n_kept"))
            .as("kept_acc_permille"))
    }.reduce(_.unionByName(_))
  }

  /** The classifier evaluation a pipeline runs before trusting a filter:
    * train on one split, score the held-out split, emit per-doc
    * prediction + correctness. */
  def nbEvaluate(train: DataFrame, test: DataFrame, idCol: String,
                 labelCol: String, textCol: String): DataFrame =
    nbEvaluate(trainNaiveBayes(train, labelCol, textCol), test,
      idCol, labelCol, textCol)

  /** Evaluation under an already-trained model (shared by x114's report
    * so train runs once for scoring AND reporting). */
  def nbEvaluate(m: NbModel, test: DataFrame, idCol: String,
                 labelCol: String, textCol: String): DataFrame =
    nbScore(test, idCol, textCol, m)
      .join(test.select(col(idCol), col(labelCol).as("actual_label")), Seq(idCol))
      .select(col(idCol), col("actual_label"), col("pred_label"),
        col("score_nats"),
        (col("actual_label") === col("pred_label")).as("is_correct"))

  /** Per-class quality report over an [[nbEvaluate]] frame — the
    * precision/recall/F1 table a pipeline reads before trusting the
    * filter. One row per class on the MODEL ∪ ACTUAL axis: model
    * classes absent from the held-out actuals still report their
    * precision, and held-out classes the model never saw still appear
    * (n_pred = 0, recall 0) — so sum(n_actual) always equals the
    * evaluated row count, no silent undercount. Columns: n_actual,
    * n_pred, n_correct, precision = correct/pred, recall = correct/actual, and
    * F1 via the integer-friendly identity 2·correct/(actual + pred)
    * (≡ 2PR/(P+R) — one exact-rational division, so the x114 oracle
    * replays it without FP-ordering concerns). Three class-keyed
    * counts over the doc-sized eval frame; the report is
    * classes-sized. */
  def nbClassReport(m: NbModel, evaluated: DataFrame): DataFrame = {
    val na = evaluated.groupBy(col("actual_label").as("label"))
      .agg(count(lit(1)).as("n_actual"))
    val np = evaluated.groupBy(col("pred_label").as("label"))
      .agg(count(lit(1)).as("n_pred"))
    val nc = evaluated.filter(col("actual_label") === col("pred_label"))
      .groupBy(col("actual_label").as("label"))
      .agg(count(lit(1)).as("n_correct"))
    val base = m.classStats.select("label")
      .unionByName(evaluated.select(col("actual_label").as("label")))
      .distinct()
      .join(na, Seq("label"), "left")
      .join(np, Seq("label"), "left")
      .join(nc, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_correct"), lit(0L)).as("n_correct"))
    base.select(col("label"), col("n_actual"), col("n_pred"), col("n_correct"),
      when(col("n_pred") > 0,
        round(col("n_correct").cast("double") / col("n_pred"), 6)).as("precision"),
      when(col("n_actual") > 0,
        round(col("n_correct").cast("double") / col("n_actual"), 6)).as("recall"),
      when(col("n_actual") + col("n_pred") > 0,
        round(lit(2.0) * col("n_correct") /
          (col("n_actual") + col("n_pred")), 6)).as("f1"))
  }
}
