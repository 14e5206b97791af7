package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md §2.B
  * [EXT]): tokenization, quality scoring, document fingerprinting, and an
  * n-gram/stopword language-ID heuristic. All pure Column expressions
  * (codegen'd, shuffle-free per row) so they scale linearly over document
  * shards.
  */
object TextStats {

  /** Whitespace tokens with empties dropped (multi-space safe). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword pre-tokenization: letter runs, digit runs, and single
    * non-alphanumeric marks — the coarse split a byte-pair tokenizer
    * applies before merges (cf. GPT-2's pre-tokenizer regex, simplified to
    * classes that behave identically in Java regex and RE2). A much better
    * LLM-cost proxy than whitespace tokens ("don't!" = 1 ws token but 4
    * BPE-ish pieces). */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeishTokens(text: Column): Column = regexp_extract_all(text, lit(bpeishPattern), lit(0))

  /** Counted with regexp_count — same number as size(bpeishTokens) without
    * materializing the full match array per document. */
  def bpeishTokenCount(text: Column): Column = regexp_count(text, lit(bpeishPattern))

  /** Canonical-form fingerprint: md5 of lowercased, whitespace-collapsed
    * text — the exact-dup key that survives formatting noise. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Per-document quality facets: char length, token stats, alpha/digit/
    * space character ratios. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val len = length(text)
    // char-class counts via translate (single pass, no regex engine):
    // count(class) = len - len(text with class chars removed)
    val letters = ('a' to 'z').mkString + ('A' to 'Z').mkString
    val alpha = len - length(translate(text, letters, ""))
    val digit = len - length(translate(text, "0123456789", ""))
    val space = len - length(translate(text, " ", ""))
    val nTok = tokenCount(text)
    Seq(
      "len" -> len,
      "n_tokens" -> nTok,
      "avg_token_len" -> round((len - space).cast("double") / nullif(nTok, lit(0)), 6),
      "alpha_ratio" -> round(alpha.cast("double") / nullif(len, lit(0)), 6),
      "digit_ratio" -> round(digit.cast("double") / nullif(len, lit(0)), 6))
  }

  /** The corpus quality gate (≥5 tokens, ≥50% alphabetic) — ONE definition
    * shared by the clean-corpus pipeline (x26) and the corpus report (x39)
    * so the "quality pass" notion cannot drift between them. Evaluates the
    * same rounded ratio [[qualityColumns]] emits. */
  def qualityGate(text: Column): Column = {
    val q = qualityColumns(text).toMap
    q("n_tokens") >= 5 && q("alpha_ratio") >= 0.5
  }

  /** Stopword vocabularies for the language-ID heuristic. Deliberately tiny
    * and fixed: the heuristic (and its SQL oracle) must be reproducible. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "zu"))

  /** Language-ID: argmax stopword-hit count with deterministic tiebreak
    * (en > es > de > und). Works on token overlap only — no external model. */
  def langGuess(text: Column): Column = {
    // single fold over the distinct tokens accumulating all three scores
    // at once (separate array_intersect calls would rebuild the token
    // array per language — higher-order args re-evaluate per use)
    val toks = array_distinct(tokens(lower(text)))
    def hit(t: Column, lang: String): Column =
      when(t.isin(stopwords(lang): _*), 1).otherwise(0)
    val scores = aggregate(toks,
      struct(lit(0).as("en"), lit(0).as("es"), lit(0).as("de")),
      (acc, t) => struct(
        (acc("en") + hit(t, "en")).as("en"),
        (acc("es") + hit(t, "es")).as("es"),
        (acc("de") + hit(t, "de")).as("de")))
    val (en, es, de) = (scores("en"), scores("es"), scores("de"))
    when(en === 0 && es === 0 && de === 0, lit("und"))
      .when(en >= es && en >= de, lit("en"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** PII-style scrubbing: emails and long digit runs replaced by
    * placeholder tokens. Pure regexp_replace (codegen'd, linear); the
    * patterns use only syntax that behaves identically in Java regex and
    * the oracle's engine. */
  def redactPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    regexp_replace(regexp_replace(text, email, "<EMAIL>"), "[0-9]{6,}", "<NUM>")
  }

  /** All-facet document profile. */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val withQuality = qualityColumns(col(textCol)).foldLeft(docs) {
      case (df, (name, c)) => df.withColumn(name, c)
    }
    withQuality
      .withColumn("fp", fingerprint(col(textCol)))
      .withColumn("lang_guess", langGuess(col(textCol)))
  }

  /** VOCABULARY COVERAGE curve — the tokenizer-design report: for each
    * K, the fraction of all corpus tokens covered by the K most frequent
    * words (ties broken by word, so the curve is deterministic and the
    * x55 oracle replays it). One row per K: (k, n_vocab_words, coverage).
    *
    * Scale shape: ONE word-count aggregate over the corpus (map-side
    * combinable), then per K a TakeOrderedAndProject over the VOCAB table
    * (never a global window, never a corpus sort) and a two-long
    * division — the vocab table is the small side by construction.
    * Coverage ratios divide exact integer token counts, so the doubles
    * are engine-identical. */
  def vocabCoverage(docs: DataFrame, textCol: String,
                    ks: Seq[Int] = Seq(10, 100, 1000)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0), s"ks must be positive: $ks")
    val counts = Caches.persistTracked(
      docs.select(explode(tokens(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c")))
    val total = counts.agg(sum(col("c"))).head().getLong(0)
    ks.map { k =>
      counts.orderBy(col("c").desc, col("w").asc).limit(k)
        .agg(sum(col("c")).as("ck"), count(lit(1)).as("nw"))
        .select(lit(k).as("k"), col("nw").as("n_vocab_words"),
          round(col("ck").cast("double") / lit(total.toDouble), 6).as("coverage"))
    }.reduce(_ unionByName _)
  }

  /** In-document REPETITION signals — the Gopher/Dolma repetition
    * filters that catch boilerplate, keyword-stuffed, and
    * degenerate-generation pages the per-doc ratio gates
    * ([[qualityGate]]) miss. One row per doc:
    *
    *  - `top2_char_frac` / `top3_char_frac`: occurrences of the MOST
    *    frequent 2-/3-gram × its char length, over doc char length
    *    (ties broken gram-ascending — deterministic);
    *  - `dup5_char_frac`: Σ over distinct 5-grams seen more than once of
    *    (occurrences − 1) × char length, over doc char length — chars in
    *    repeats BEYOND the first occurrence; overlapping repeats can
    *    push the numerator past the doc length (a faithful property of
    *    n-gram repeat mass, not a bug);
    *  - `repetitive`: any signal over its Gopher-flavored threshold
    *    (0.20 / 0.18 / 0.15).
    *
    * Docs too short for an n-gram floor that signal at 0.0. All ratios
    * divide exact integers (counts × char lengths), so both engines
    * reproduce them bit-for-bit — the x61 oracle replays the whole
    * report. Scale shape: per-n gram explode → (doc, gram) count →
    * doc-keyed aggregate; linear in corpus words, shuffles key on
    * (doc, gram) then doc — no self-join, no window over the corpus. */
  def repetitionSignals(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val base = docs.select(col(idCol), length(col(textCol)).as("n_chars"),
      split(col(textCol), " ").as("ts"))
    def grams(n: Int) = base
      .filter(size(col("ts")) >= n)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("ts")) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j =>
          element_at(col("ts"), i + j)): _*))).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("n"))
    // top-gram pick via min-struct on (-count, gram): highest count,
    // then lexicographically-first gram — order-independent
    def topFrac(n: Int, name: String) = grams(n)
      .groupBy(col(idCol))
      .agg(min(struct((-col("n")).as("nn"), col("g").as("tg"))).as("t"))
      .select(col(idCol), (-col("t.nn") * length(col("t.tg"))).as(name))
    val dup5 = grams(5)
      .groupBy(col(idCol))
      .agg(sum(when(col("n") > 1, (col("n") - 1) * length(col("g")))
        .otherwise(0L)).as("dup5_chars"))
    def frac(c: Column) =
      round(coalesce(c, lit(0L)).cast("double") / col("n_chars"), 6)
    base.select(col(idCol), col("n_chars"))
      .join(topFrac(2, "t2"), Seq(idCol), "left")
      .join(topFrac(3, "t3"), Seq(idCol), "left")
      .join(dup5, Seq(idCol), "left")
      .select(col(idCol),
        frac(col("t2")).as("top2_char_frac"),
        frac(col("t3")).as("top3_char_frac"),
        frac(col("dup5_chars")).as("dup5_char_frac"),
        (frac(col("t2")) > 0.20 || frac(col("t3")) > 0.18 ||
          frac(col("dup5_chars")) > 0.15).as("repetitive"))
  }

  /** PMI COLLOCATIONS — corpus-wide pointwise mutual information over
    * adjacent whitespace-token pairs: pmi(w1,w2) = ln(p(w1w2) /
    * (p(w1)·p(w2))) with bigram probability c12/n_bi and unigram
    * probabilities c/n_uni. The classic collocation-extraction measure
    * (Church & Hanks 1990); for a training-data pipeline it surfaces
    * the multi-word units (named entities, boilerplate idioms) that
    * tokenizer-vocabulary and dedup decisions should treat as atoms.
    *
    * Shape (100 TB): one explode → two token-keyed counts (unigrams,
    * bigrams — both combine map-side), two token-keyed equi-joins to
    * attach c1/c2 to each surviving bigram, and the two grand totals
    * cross-joined as a broadcast 1-row frame. Nothing is ever
    * token × token: the bigram domain comes from ADJACENCY (linear in
    * corpus size), the `minCount` support cut prunes the tail before
    * the joins, and every shuffle is on a token/bigram key.
    *
    * Determinism: all counts are exact integers; pmi is a fixed
    * left-to-right IEEE expression over them, rounded to 6 (the x113
    * convention) — so the x120 oracle replays the extraction verbatim
    * and the (pmi DESC, w1, w2) output order is total. */
  def pmiCollocations(docs: DataFrame, textCol: String,
                      minCount: Int = 3): DataFrame = {
    val toks = docs.select(tokens(col(textCol)).as("ts"))
    val uni = toks.select(explode(col("ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    // greatest(.., 0): a zero/one-token document has no adjacency pairs —
    // slice with a negative length would throw, the oracle's
    // generate_series(1, len-1) is just empty
    val big = toks.select(explode(expr(
        "transform(slice(ts, 1, greatest(size(ts) - 1, 0)), " +
        "(x, i) -> struct(x AS w1, element_at(ts, i + 2) AS w2))")).as("b"))
      .select(col("b.w1"), col("b.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val totals = uni.agg(sum(col("c")).as("n_uni"))
      .crossJoin(big.agg(sum(col("c12")).as("n_bi")))
    big.filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        round(log(col("c12").cast("double") * col("n_uni") * col("n_uni") /
          (col("n_bi").cast("double") * col("c1") * col("c2"))), 6)
          .as("pmi"))
  }

  /** TF-IDF SALIENCE per slice: the top-K terms that CHARACTERIZE each
    * source/domain/day — term frequency within the slice × corpus
    * inverse document frequency, the "what is this domain about"
    * report next to x52's "how far has it drifted" and x120's
    * corpus-wide collocations. idf_fix = floor(ln(N/df)·10⁶) (df ≥ 1
    * for every observed term, a corpus-wide term scores exactly 0);
    * salience_fix = tf · idf_fix stays in BIGINT at any realistic
    * slice tf (swap the product into a DECIMAL(38,0) lane past ~10¹²
    * tf). One row per (slice, rank ≤ topK), tie-broken on the term.
    *
    * Scale shape: two map-side-combinable counts over the token stream
    * (tf slice-keyed, df per-doc-distinct), a vocab-sized join, and a
    * SLICE-KEYED window rank (partitioned — never a global sort). The
    * x142 oracle replays the fix lane exactly (the ±1-ulp ln floor
    * class every fix-lane report here accepts). */
  def tfidfSalience(docs: DataFrame, idCol: String, groupCol: String,
                    textCol: String, topK: Int = 10): DataFrame =
    tfidfSalienceFromStats(
      Caches.persistTracked(tfidfStats(docs, idCol, groupCol, textCol)),
      groupCol, topK)

  /** The TALL vocab-sized stats state behind [[tfidfSalience]] — one
    * frame so a streaming maintainer folds ONE artifact: kind 'tf'
    * rows are (group, word) term counts, kind 'df' rows per-doc-
    * DISTINCT word doc frequencies, the single kind 'nd' row the doc
    * count. All integer counts folded by [[tfidfStatsMerge]] —
    * tf/nd unconditionally; df validly, PROVIDED batches partition the
    * docs (each doc arrives exactly once — the s34 arrival contract,
    * same doc-keyed argument as the s31/s33 indexes), since a doc's
    * distinct words are counted within its own batch. `grp` is
    * stringified ('' for non-tf rows) so one schema carries all three
    * kinds. */
  def tfidfStats(docs: DataFrame, idCol: String, groupCol: String,
                 textCol: String): DataFrame = {
    val words = Caches.persistTracked(docs.select(col(idCol).as("__id"),
      col(groupCol).cast("string").as("__grp"),
      explode(split(col(textCol), " ")).as("w")))
    val tf = words.groupBy("__grp", "w").agg(count(lit(1)).as("c"))
      .select(lit("tf").as("kind"), col("__grp").as("grp"), col("w"), col("c"))
    val df = words.select("__id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(lit("df").as("kind"), lit("").as("grp"), col("w"), col("c"))
    val nd = docs.agg(count(lit(1)).as("c"))
      .select(lit("nd").as("kind"), lit("").as("grp"), lit("").as("w"), col("c"))
    tf.unionByName(df).unionByName(nd)
  }

  /** Fold two [[tfidfStats]] frames by per-key addition. */
  def tfidfStatsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("kind", "grp", "w")
      .agg(sum(col("c")).cast("long").as("c"))

  /** The salience report as a pure function of a [[tfidfStats]] state
    * (the s34 read path). Output matches [[tfidfSalience]] with the
    * group column rendered as string. */
  def tfidfSalienceFromStats(stats: DataFrame, groupCol: String,
                             topK: Int = 10): DataFrame = {
    require(topK >= 1, s"need topK >= 1, got $topK")
    val ndRow = stats.filter(col("kind") === "nd").agg(sum(col("c"))).head()
    val n = if (ndRow.isNullAt(0)) 0L else ndRow.getLong(0)
    require(n > 0, "salience needs a non-empty doc-count ('nd') state row")
    val tf = stats.filter(col("kind") === "tf")
      .select(col("grp").as("__grp"), col("w"), col("c").as("tf"))
    val df = stats.filter(col("kind") === "df")
      .select(col("w"), col("c").as("df"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__grp"))
      .orderBy(col("salience_fix").desc, col("w").asc)
    tf.join(df, Seq("w"))
      .withColumn("idf_fix",
        floor(log(lit(n.toDouble) / col("df")) * lit(1e6)).cast("long"))
      .withColumn("salience_fix", col("tf") * col("idf_fix"))
      .withColumn("rk", row_number().over(win))
      .filter(col("rk") <= topK)
      .select(col("__grp").as(groupCol), col("w").as("term"),
        col("tf"), col("df"), col("salience_fix"), col("rk"))
  }
}
