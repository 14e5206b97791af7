package graft.ops

import scala.collection.mutable

/** Real merge-table byte-pair encoding (the public BPE algorithm:
  * Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units") — the upgrade x44 makes over x29's regex proxy.
  *
  * Production tokenizers ship a FIXED merge table trained offline and
  * apply it corpus-wide; that split is what makes the operator gateable
  * here: the merge list is derived deterministically at object init from
  * a seed text embedded below, so BOTH the Spark-side native expression
  * ([[graft.functions.BpeTokenCountExpr]]) and the static DuckDB oracle
  * (a generated chain of `replace()` calls over a brace-delimited symbol
  * encoding, [[oracleSqlExpr]]) are built from the same merges and agree
  * exactly. A CORPUS-derived merge table cannot sit under this driver's
  * oracle contract — `oracleSql` is static SQL over the input tables,
  * and replaying ~100 BPE TRAINING iterations in SQL is a recursive
  * program, not a query — so training stays offline-deterministic, which
  * is also the production shape (you don't retrain the tokenizer per
  * batch at 100 TB; you version the vocab).
  *
  * Application semantics (both engines): words are maximal `[a-z0-9]+`
  * runs of the lowercased text; each word starts as its character
  * sequence; merges apply IN RANK ORDER, each as one left-to-right
  * non-overlapping pass. Rank-order application is equivalent to the
  * priority-queue formulation because a merged symbol can only appear in
  * pairs of strictly later rank (it did not exist when earlier pairs were
  * learned), and one pass per merge is exhaustive because merging (a,b)
  * creates only (left,ab)/(ab,right) adjacencies, never a new (a,b).
  */
object Bpe {

  /** Deterministic seed corpus for the fixed merge table. Plain prose
    * written for this repo (not quoted from anywhere), with enough
    * repeated stems that the learned merges look like a real subword
    * vocabulary: common suffixes (-ing, -ed, -tion), doubled letters,
    * frequent function words. */
  val seedText: String =
    """the streaming engine reads the records and the engine keeps reading
      |records while the partitions keep streaming merged batches the
      |tokenizer is learning merges and the learned merges are applied to
      |every word in every partition the training pass counts repeated
      |pairs and the counting pass merges the most repeated pair the
      |deduplication stage is hashing shingles and the hashed shingles are
      |bucketed the bucketing stage is joining buckets and the joined
      |buckets are verified the verification stage is scoring candidates
      |and the scored candidates are clustered the clustering stage keeps
      |one representative document and the kept documents are chunked the
      |chunking stage is packing sequences and the packed sequences are
      |sampled the sampling stage is mixing domains and the mixed domains
      |are written the writing stage commits partitions and the committed
      |partitions are checkpointed the checkpointing stage resumes streams
      |and the resumed streams are watermarked the watermarking stage
      |evicts state and the evicted state is bounded""".stripMargin

  /** One left-to-right non-overlapping merge pass (shared by training and
    * application — the two must agree on overlap tie-breaking). */
  def applyMergeOnce(syms: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Maximal [a-z0-9]+ runs of the lowercased text. */
  def words(text: String): Seq[String] = {
    val t = text.toLowerCase(java.util.Locale.ROOT)
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.nonEmpty) { out += sb.toString; sb.clear() }
      i += 1
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq
  }

  /** Classic BPE training: count words, then repeatedly merge the most
    * frequent adjacent symbol pair (ties broken lexicographically — the
    * determinism the oracle depends on). Stops early once no pair occurs
    * twice (merging count-1 pairs would just memorize the seed). */
  def train(text: String, nMerges: Int): Seq[(String, String)] = {
    var vocab: Map[IndexedSeq[String], Int] =
      words(text).groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toIndexedSeq -> ws.size
      }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < nMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Int].withDefaultValue(0)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        pairCounts((syms(i), syms(i + 1))) += f
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) done = true
      else {
        val (a, b) = candidates.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
        merges += ((a, b))
        vocab = vocab.toSeq
          .map { case (syms, f) => applyMergeOnce(syms, a, b) -> f }
          .groupBy(_._1).map { case (syms, fs) => syms -> fs.map(_._2).sum }
      }
    }
    merges.toSeq
  }

  /** DISTRIBUTED corpus BPE training — [[train]]'s algorithm run over a
    * documents TABLE instead of a driver-side string: word counts are
    * ONE corpus pass/shuffle (the only corpus-sized work — classic BPE
    * trains on the word-frequency table), and each merge round then
    * operates on the VOCABULARY-sized (word, cnt, symbol-state) frame:
    * pair counts weighted by word frequency, argmax with the total
    * order (count desc, a asc, b asc), one `replace` pass applying the
    * merge. The driver carries only `nMerges` round trips and the
    * (a, b) pairs — never data; per-round frames are
    * localCheckpointScoped and released (the [[Similarity
    * .ivfBuildKmeans]] Lloyd discipline). At 100 TB the vocab frame is
    * millions of rows, so rounds stay distributed rather than
    * collapsing the vocabulary to the driver.
    *
    * The symbol state is the brace-delimited string of
    * [[oracleSqlExpr]]'s convention ("{h} {i} "), so one `replace(s,
    * "{a} {b}", "{ab}")` IS the left-to-right non-overlapping merge
    * pass ([[applyMergeOnce]]'s semantics) in Spark and DuckDB alike —
    * everything is exact integer counts and string rewriting, zero
    * floats, so harness query x83 replays the whole training (unrolled
    * rounds, the x57 Lloyd-unrolling pattern) and the application in
    * SQL. Ties: (count desc, a asc, b asc) — OpsSpec pins distributed ≡
    * the sequential reference [[train]] on the same corpus. */
  def trainCorpus(docs: org.apache.spark.sql.DataFrame, textCol: String,
                  nMerges: Int): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    var cur = Caches.localCheckpointScoped(docs
      .select(explode(expr(
        s"regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("s", regexp_replace(col("w"), "(.)", "\\{$1\\} ")))
    val found = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for (_ <- 1 to nMerges) {
      val best = cur.df
        .select(col("cnt"),
          expr("regexp_extract_all(s, '\\\\{([^}]*)\\\\}', 1)").as("sy"))
        .filter(size(col("sy")) > 1)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(sy) - 1), " +
            "i -> struct(element_at(sy, i) AS a, element_at(sy, i + 1) AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .filter(col("n") >= 2) // the [[train]] rule: never memorize a count-1 pair
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      require(best.nonEmpty,
        s"corpus exhausted after ${found.size} of $nMerges merges " +
          "(no pair occurs twice); lower nMerges")
      val (a, b) = (best(0).getString(0), best(0).getString(1))
      found += ((a, b))
      val next = Caches.localCheckpointScoped(cur.df.withColumn("s",
        replace(col("s"), lit(s"{$a} {$b}"), lit(s"{$a$b}"))))
      cur.release()
      cur = next
    }
    cur.release()
    found.toSeq
  }

  /** Spark Column: BPE token count of `textCol` under an arbitrary
    * merge `table` — the brace-string prep (words joined "/ " so merges
    * cannot cross word boundaries) folded through one codegen'd
    * `replace` per merge, then '{' counted. Bit-identical to
    * [[tokenCount]] with the same table (OpsSpec pins it) and to the
    * oracle's replace-chain. */
  def tokenCountUnder(textCol: org.apache.spark.sql.Column,
                      table: Seq[(String, String)]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val merged = mergedUnder(textCol, table)
    (length(merged) - length(replace(merged, lit("{"), lit("")))).cast("int")
  }

  /** The shared brace-string encode core: words (maximal `[a-z0-9]+`
    * runs of the lowercased text) rendered as "{c} {c} … " and joined
    * "/ " so merges cannot cross word boundaries, then the merge table
    * folded through one codegen'd `replace` per merge. ONE definition
    * consumed by [[tokenCountUnder]] (counts '{') and [[encodeIds]]
    * (extracts symbols) — the two MUST stay bit-identical for the
    * oracle contract, so the convention lives here exactly once. */
  private def mergedUnder(textCol: org.apache.spark.sql.Column,
                          table: Seq[(String, String)]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val prep = array_join(transform(
      regexp_extract_all(lower(textCol), lit("[a-z0-9]+"), lit(0)),
      w => regexp_replace(w, "(.)", "\\{$1\\} ")), "/ ")
    table.foldLeft(prep) { case (c, (a, b)) =>
      replace(c, lit(s"{$a} {$b}"), lit(s"{$a$b}"))
    }
  }

  /** The fixed merge table (trained once per JVM; deterministic). */
  lazy val merges: IndexedSeq[(String, String)] = train(seedText, 120).toIndexedSeq

  /** The id space of a merge table — what turns counted tokens into the
    * `token_ids` a training loader actually consumes: base alphabet
    * [0-9a-z] takes ids 0–35 in character order, merge rank r (0-based)
    * mints id 36+r for its merged symbol. If two merge chains ever mint
    * the same surface string (e.g. (a,bc) after (ab,c) both yield
    * "abc"), the FIRST mint wins and the later id is never emitted —
    * ids stay a function of the symbol string, encode stays
    * deterministic, and later ids simply go unused (a real tokenizer's
    * vocab has the same first-wins discipline). */
  def vocabOf(table: Seq[(String, String)]): IndexedSeq[(String, Int)] = {
    val minted = "0123456789abcdefghijklmnopqrstuvwxyz".map(_.toString) ++
      table.map { case (a, b) => a + b }
    val seen = mutable.LinkedHashMap.empty[String, Int]
    minted.zipWithIndex.foreach { case (s, i) =>
      if (!seen.contains(s)) seen(s) = i
    }
    seen.toIndexedSeq
  }

  /** (symbol, id) pairs of the fixed [[merges]] table. */
  lazy val vocab: IndexedSeq[(String, Int)] = vocabOf(merges)

  /** The merged SYMBOL sequence of one text (reference implementation):
    * [[tokenCount]]'s fold, returning the symbols instead of their
    * count. Concatenating the symbols reproduces the letters of
    * [[words]] exactly — BPE segments, it never rewrites. */
  def encodeSymbols(text: String,
                    table: IndexedSeq[(String, String)] = merges): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    for (w <- words(text)) {
      var syms: IndexedSeq[String] = w.map(_.toString).toIndexedSeq
      var m = 0
      while (m < table.length && syms.length > 1) {
        val (a, b) = table(m)
        var i = 0
        var found = false
        while (!found && i + 1 < syms.length) {
          if (syms(i) == a && syms(i + 1) == b) found = true else i += 1
        }
        if (found) syms = applyMergeOnce(syms, a, b)
        m += 1
      }
      out ++= syms
    }
    out.toSeq
  }

  /** Reference encode-to-ids: [[encodeSymbols]] mapped through
    * [[vocabOf]]. Backs the x134 specs; the distributed twin is
    * [[encodeIds]]. */
  def encodeIdsLocal(text: String,
                     table: IndexedSeq[(String, String)] = merges): Seq[Int] = {
    val idOf = vocabOf(table).toMap
    encodeSymbols(text, table).map(idOf)
  }

  /** Spark Column: BPE token-ID sequence (`array<int>`) of `textCol`
    * under `table` — the missing last step between token COUNTS and
    * what a training loader consumes. Same brace-string replace fold as
    * [[tokenCountUnder]] (codegen'd, per-row, zero shuffle), then the
    * symbols are extracted and mapped through the [[vocabOf]] id map as
    * a plan-literal `map<string,int>` — the broadcast-model enrichment
    * shape: the frozen merge table and vocab ride the plan, no driver
    * text, no UDF. Every emitted symbol is in the vocab by construction
    * (symbols only ever merge FROM the base alphabet), and under ANSI
    * mode `element_at` would fail loudly, never emit a wrong id, if
    * that invariant ever broke. */
  def encodeIds(textCol: org.apache.spark.sql.Column,
                table: IndexedSeq[(String, String)] = merges): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val merged = mergedUnder(textCol, table)
    val idMap = map(vocabOf(table)
      .flatMap { case (s, i) => Seq(lit(s), lit(i)) }: _*)
    transform(regexp_extract_all(merged, lit("\\{([^}]*)\\}"), lit(1)),
      sy => element_at(idMap, sy))
  }

  /** TOKENIZER FERTILITY report per language — the table a tokenizer
    * owner reads before pointing a vocab at a multilingual corpus: ids
    * per word (fertility) and chars per id (compression), both in the
    * exact permille lane. Words are the tokenizer's own word units
    * (maximal `[a-z0-9]+` runs of the lowercased text — the same
    * definition [[encodeIds]] segments, so fertility ≥ 1000 by
    * construction: every word emits at least one id). One row per
    * language: (lang, n_docs, n_words, n_ids, n_chars,
    * fertility_permille, chars_per_id_permille).
    *
    * Scale shape: ONE map-side-combinable aggregation over the corpus —
    * the encode is a codegen'd per-row fold under the plan-literal
    * merge table (zero shuffle before the lang-keyed combine), and the
    * output is languages-sized. All counts are exact integers and the
    * permille ratios integer `div` (guarded: an all-symbol language
    * with zero words/ids reports null, never an ANSI divide error), so
    * the x140 oracle replays the report bit-for-bit. */
  def fertilityReport(docs: org.apache.spark.sql.DataFrame, langCol: String,
                      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    docs.groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(regexp_count(lower(col(textCol)), lit("[a-z0-9]+")))
          .cast("long").as("n_words"),
        // ids-per-doc = tokenCountUnder's brace count (BpeSpec pins it
        // == encodeIds length) — no id array or vocab map materialized
        // on the corpus-sized hot path just to take a size
        sum(tokenCountUnder(col(textCol), merges)).cast("long").as("n_ids"),
        sum(length(col(textCol))).cast("long").as("n_chars"))
      .withColumn("fertility_permille",
        expr("CASE WHEN n_words > 0 THEN (n_ids * 1000) div n_words END"))
      .withColumn("chars_per_id_permille",
        expr("CASE WHEN n_ids > 0 THEN (n_chars * 1000) div n_ids END"))
      .orderBy("lang")
  }

  /** DuckDB expression mapping `mergedCol` (a column already holding
    * [[oracleSqlExpr]]'s merged brace string — evaluate that once in a
    * subquery, the chain is ~120 nested replaces) to the id LIST:
    * symbols extracted by the same brace regex, ids via a generated
    * CASE chain over [[vocab]] (first-wins, identical to the Spark map
    * literal). ELSE -1 can't fire for well-formed merged strings; it
    * exists so a convention drift reads as an impossible id, not a
    * silently dropped NULL element. */
  def oracleIdsFromMergedExpr(mergedCol: String): String = {
    val caseChain = "CASE sy " +
      vocab.map { case (s, i) => s"WHEN '$s' THEN $i" }.mkString(" ") +
      " ELSE -1 END"
    s"list_transform(regexp_extract_all($mergedCol, '\\{([^}]*)\\}', 1), " +
      s"sy -> $caseChain)"
  }

  /** Token count of one text under [[merges]] — the reference
    * implementation backing [[graft.functions.BpeTokenCountExpr]] (which
    * calls this per row) and the specs. */
  def tokenCount(text: String, table: IndexedSeq[(String, String)] = merges): Int = {
    var total = 0
    for (w <- words(text)) {
      var syms: IndexedSeq[String] = w.map(_.toString).toIndexedSeq
      var m = 0
      while (m < table.length && syms.length > 1) {
        val (a, b) = table(m)
        // cheap containment guard: scan for the pair before rebuilding
        var i = 0
        var found = false
        while (!found && i + 1 < syms.length) {
          if (syms(i) == a && syms(i + 1) == b) found = true else i += 1
        }
        if (found) syms = applyMergeOnce(syms, a, b)
        m += 1
      }
      total += syms.length
    }
    total
  }

  /** DuckDB expression producing the MERGED symbol string for column
    * `col`: every word becomes brace-delimited symbols ("{h} {i} "),
    * words are joined with "/ " so merges cannot cross word boundaries,
    * and each merge is one plain `replace` pass (left-to-right
    * non-overlapping — the same tie-break as [[applyMergeOnce]]). Braces
    * and '/' cannot collide with symbol text because the alphabet is
    * [a-z0-9]. The caller counts tokens as the number of '{' characters
    * (wrap in a subquery — the chain is ~100 nested calls and should be
    * evaluated once per row). */
  def oracleSqlExpr(col: String): String = {
    val prepared =
      s"array_to_string(list_transform(regexp_extract_all(lower($col), '[a-z0-9]+'), " +
        "w -> regexp_replace(w, '(.)', '{\\1} ', 'g')), '/ ')"
    merges.foldLeft(prepared) { case (s, (a, b)) =>
      s"replace($s, '{$a} {$b}', '{$a$b}')"
    }
  }
}
