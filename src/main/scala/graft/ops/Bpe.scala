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
  * ([[graft.functions.BpeTokenCountExpr]] / [[graft.functions.BpeEncodeIdsExpr]])
  * and the static DuckDB oracle (a generated chain of `replace()` calls
  * over a brace-delimited symbol encoding, [[oracleSqlExpr]]) are built
  * from the same merges and agree exactly. A CORPUS-derived merge table
  * cannot sit under this driver's oracle contract — `oracleSql` is
  * static SQL over the input tables, and replaying ~100 BPE TRAINING
  * iterations in SQL is a recursive program, not a query — so training
  * stays offline-deterministic, which is also the production shape (you
  * don't retrain the tokenizer per batch at 100 TB; you version the
  * vocab).
  *
  * TWO symbol conventions live here, deliberately:
  *
  *  1. The FIXED tokenizer (x44/x134/x137/x140/p06) is BYTE-COMPLETE
  *     (GPT-2-style byte fallback): words are maximal runs of
  *     non-whitespace (ASCII whitespace set { ' ', \t, \n, \f, \r } —
  *     vertical tab U+000B is deliberately a word char because Java's `\s` and
  *     RE2's `\s` disagree on it, and the oracle regexes must agree
  *     with the JVM scanner); each word starts as the sequence of its
  *     UTF-8 BYTES, rendered as lowercase two-hex-digit base symbols
  *     ("74" for 't'). EVERY character of every text — case,
  *     punctuation, digits, non-ASCII — maps to base symbols, so no
  *     input is ever silently dropped and there is no UNK. Merged
  *     symbols are concatenated hex strings, so the symbol alphabet is
  *     [0-9a-f] and the brace/slash delimiters of the oracle encoding
  *     can never collide with symbol text.
  *  2. The CORPUS-TRAINED path (x83, [[trainCorpus]]) keeps its
  *     documented char-level `[a-z0-9]+` convention: its whole training
  *     replays in unrolled SQL, and the char alphabet is what keeps
  *     that replay readable; it is a data-derived model demo, not the
  *     shipping tokenizer.
  *
  * Application semantics (both engines, both conventions): merges apply
  * IN RANK ORDER, each as one left-to-right non-overlapping pass.
  * Rank-order application is equivalent to the priority-queue
  * formulation because a merged symbol can only appear in pairs of
  * strictly later rank (it did not exist when earlier pairs were
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

  /** Seed corpus for the BYTE-complete fixed table: [[seedText]] plus a
    * punctuated, mixed-case, digit- and non-ASCII-bearing paragraph
    * (also written for this repo), so the trained merges cover
    * capitalized stems, common punctuation bigrams, decimal digits and
    * multi-byte UTF-8 sequences — the classes the `[a-z0-9]`-only
    * alphabet used to drop. */
  val seedTextBytes: String = seedText +
    """
      |The Engine, version 2.0 (build 2024), reads CSV, JSON, and Parquet.
      |The Reader retries; the Writer commits; the Planner prunes. "Exactly
      |once," they said -- and exactly once it was! Costs: $3.50, $7.25,
      |$12.99 -- the totals add up to 100%. Don't re-tokenize; don't
      |re-shuffle; don't re-read. The 1,000 executors wrote 2,000,000 rows
      |in 3.5 seconds? Yes -- 10x faster than the 2023 run. Quoted "tokens"
      |keep their quotes, (parenthesized notes) keep their parens, and
      |trailing periods stay. The cafe vs. café pair, the naive vs.
      |naïve pair, and the über-prefix all round-trip byte-for-byte:
      |UTF-8 text is just bytes here. Version 2.0? Version 2.0. Build
      |2024-01-01, build 2024-02-02, build 2024-03-03: dates repeat, so the
      |"20" and "2024" and "-0" byte pairs earn merges. The Engine, the
      |Reader, the Writer, the Planner: Capitalized Determiners Repeat Too.
      |""".stripMargin

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

  /** Maximal [a-z0-9]+ runs of the lowercased text — the CORPUS-TRAINED
    * path's word unit ([[trainCorpus]]/x83 only; the fixed tokenizer
    * uses [[wordsBytes]]). */
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

  /** The fixed tokenizer's word unit: maximal runs of non-whitespace,
    * case and punctuation PRESERVED. Whitespace is the explicit ASCII
    * set { ' ', \t, \n, \f, \r } — the intersection both engines'
    * regex `[^ \t\n\f\r]+` scans identically (vertical tab U+000B is a word char;
    * Java `\s` and RE2 `\s` disagree on it, so it must not split). */
  def wordsBytes(text: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r') {
        if (sb.nonEmpty) { out += sb.toString; sb.clear() }
      } else sb.append(c)
      i += 1
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq
  }

  /** A word's base-symbol sequence: its UTF-8 bytes as lowercase
    * two-hex-digit strings — the byte-fallback discipline that makes
    * the fixed tokenizer total over arbitrary text. */
  def byteSyms(word: String): IndexedSeq[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = f"${bytes(i) & 0xff}%02x"; i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** Classic BPE training over pre-symbolized words: count word forms,
    * then repeatedly merge the most frequent adjacent symbol pair (ties
    * broken lexicographically — the determinism the oracle depends on).
    * Stops early once no pair occurs twice (merging count-1 pairs would
    * just memorize the seed). */
  private def trainFrom(symWords: Seq[IndexedSeq[String]], nMerges: Int): Seq[(String, String)] = {
    var vocab: Map[IndexedSeq[String], Int] =
      symWords.groupBy(identity).map { case (w, ws) => w -> ws.size }
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

  /** Char-level training ([[words]] units) — the sequential reference
    * [[trainCorpus]] is spec-pinned against. */
  def train(text: String, nMerges: Int): Seq[(String, String)] =
    trainFrom(words(text).map(w => w.map(_.toString): IndexedSeq[String]), nMerges)

  /** Byte-level training ([[wordsBytes]] units over [[byteSyms]]) — what
    * mints the fixed [[merges]] table. */
  def trainBytes(text: String, nMerges: Int): Seq[(String, String)] =
    trainFrom(wordsBytes(text).map(byteSyms), nMerges)

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
    * The symbol state is the brace-delimited string of the oracle
    * convention ("{h} {i} "), so one `replace(s, "{a} {b}", "{ab}")` IS
    * the left-to-right non-overlapping merge pass ([[applyMergeOnce]]'s
    * semantics) in Spark and DuckDB alike — everything is exact integer
    * counts and string rewriting, zero floats, so harness query x83
    * replays the whole training (unrolled rounds, the x57
    * Lloyd-unrolling pattern) and the application in SQL. Ties:
    * (count desc, a asc, b asc) — OpsSpec pins distributed ≡ the
    * sequential reference [[train]] on the same corpus. */
  def trainCorpus(docs: org.apache.spark.sql.DataFrame, textCol: String,
                  nMerges: Int): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    trainRounds(docs
      .select(explode(expr(
        s"regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("s", regexp_replace(col("w"), "(.)", "\\{$1\\} ")),
      nMerges)
  }

  /** [[trainCorpus]] lifted to the BYTE convention (VERDICT r15 #3):
    * words are maximal non-whitespace runs of the RAW text
    * ([[wordsBytes]]'s scanner — the fixed tokenizer's unit), base
    * symbols are the lowercase hex pairs of each word's UTF-8 bytes
    * ([[byteSyms]]), so the TRAINED tokenizer — not just the seed-fixed
    * one — is byte-complete: every character of every document maps to
    * base symbols, nothing is dropped, no UNK. The merge rounds are
    * [[trainRounds]] verbatim (the loop is symbol-agnostic); only the
    * word/symbol prep differs, and the hex alphabet keeps the brace
    * encoding collision-free (`Bpe` header convention 1), so harness
    * query x157 replays the whole training in unrolled SQL exactly as
    * x83 replays the char-level path. OpsSpec pins distributed ≡ the
    * sequential [[trainBytes]] on the same corpus. */
  def trainCorpusBytes(docs: org.apache.spark.sql.DataFrame, textCol: String,
                       nMerges: Int): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    trainRounds(docs
      .select(explode(regexp_extract_all(col(textCol),
        lit("[^ \\t\\n\\f\\r]+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("s", regexp_replace(
        lower(hex(encode(col("w"), "UTF-8"))), "(..)", "\\{$1\\} ")),
      nMerges)
  }

  /** The shared merge-round loop of [[trainCorpus]] /
    * [[trainCorpusBytes]]: `cur0` is the VOCABULARY-sized
    * (w, cnt, s) frame with `s` the brace-delimited base-symbol string;
    * each round counts adjacent pairs weighted by word frequency
    * (exact integers), takes the (count desc, a asc, b asc) argmax
    * under the ≥2 rule, and applies one `replace` pass. Symbol-agnostic
    * — the pair-extraction regex reads whatever sits between braces. */
  private def trainRounds(cur0: org.apache.spark.sql.DataFrame,
                          nMerges: Int): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    var cur = Caches.localCheckpointScoped(cur0)
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
    * CHAR-level merge `table` (the [[trainCorpus]] convention — x83's
    * application path): the brace-string prep (words joined "/ " so
    * merges cannot cross word boundaries) folded through one codegen'd
    * `replace` per merge, then '{' counted. Bit-identical to
    * [[tokenCount]] with the same table (OpsSpec pins it) and to the
    * x83 oracle's replace-chain. */
  def tokenCountUnder(textCol: org.apache.spark.sql.Column,
                      table: Seq[(String, String)]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val merged = mergedUnder(textCol, table)
    (length(merged) - length(replace(merged, lit("{"), lit("")))).cast("int")
  }

  /** [[tokenCountUnder]]'s BYTE-convention twin: BPE token count of
    * `textCol` under an arbitrary BYTE-level merge table (the
    * [[trainCorpusBytes]] convention — x157's application path): the
    * hex-pair brace-string prep folded through one codegen'd `replace`
    * per merge, then '{' counted. Bit-identical to the x157 oracle's
    * replace-chain by construction ([[mergedUnderBytes]] is the shared
    * core). */
  def tokenCountUnderBytes(textCol: org.apache.spark.sql.Column,
                           table: Seq[(String, String)]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val merged = mergedUnderBytes(textCol, table)
    (length(merged) - length(replace(merged, lit("{"), lit("")))).cast("int")
  }

  /** The CHAR-level brace-string encode core (corpus-trained tables):
    * words (maximal `[a-z0-9]+` runs of the lowercased text) rendered
    * as "{c} {c} … " and joined "/ " so merges cannot cross word
    * boundaries, then the merge table folded through one codegen'd
    * `replace` per merge. */
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

  /** The BYTE-level brace-string encode core under an arbitrary table —
    * the replace-chain twin of the native expression, kept for the
    * bit-parity specs and as the textual mirror of [[oracleSqlExpr]]:
    * words (maximal non-whitespace runs) rendered as hex-pair symbols
    * "{74} {68} … " and joined "/ ", then one codegen'd `replace` per
    * merge. Symbols are [0-9a-f] so the delimiters can never collide. */
  def mergedUnderBytes(textCol: org.apache.spark.sql.Column,
                       table: Seq[(String, String)]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val prep = array_join(transform(
      regexp_extract_all(textCol, lit("[^ \\t\\n\\f\\r]+"), lit(0)),
      w => regexp_replace(lower(hex(encode(w, "UTF-8"))), "(..)", "\\{$1\\} ")), "/ ")
    table.foldLeft(prep) { case (c, (a, b)) =>
      replace(c, lit(s"{$a} {$b}"), lit(s"{$a$b}"))
    }
  }

  /** The fixed BYTE-complete merge table (trained once per JVM;
    * deterministic). 160 merges over the byte alphabet lands the same
    * subword granularity the 120-merge char table had (ASCII chars are
    * one byte each) plus coverage of case/punctuation/digit/UTF-8
    * patterns from the extended seed. */
  lazy val merges: IndexedSeq[(String, String)] = trainBytes(seedTextBytes, 160).toIndexedSeq

  /** The id space of a byte-level merge table — what turns counted
    * tokens into the `token_ids` a training loader actually consumes:
    * the 256 byte symbols "00".."ff" take ids 0–255 in byte order, and
    * merge rank r (0-based) mints id 256+r for its merged symbol. If
    * two merge chains ever mint the same surface string (same byte
    * sequence via different merge orders), the FIRST mint wins and the
    * later id is never emitted — ids stay a function of the symbol
    * string, encode stays deterministic, and later ids simply go unused
    * (a real tokenizer's vocab has the same first-wins discipline).
    * Merged symbols are ≥2 concatenated hex pairs (length ≥4), so they
    * can never collide with a 2-char base symbol. */
  def vocabOf(table: Seq[(String, String)]): IndexedSeq[(String, Int)] = {
    val minted = (0 until 256).map(b => f"$b%02x") ++
      table.map { case (a, b) => a + b }
    val seen = mutable.LinkedHashMap.empty[String, Int]
    minted.zipWithIndex.foreach { case (s, i) =>
      if (!seen.contains(s)) seen(s) = i
    }
    seen.toIndexedSeq
  }

  /** (symbol, id) pairs of the fixed [[merges]] table. */
  lazy val vocab: IndexedSeq[(String, Int)] = vocabOf(merges)

  @transient private lazy val fixedIdOf: Map[String, Int] = vocab.toMap

  /** The merged SYMBOL sequence of one text (reference implementation):
    * rank-ordered per-word merge application over [[byteSyms]].
    * Concatenating the symbols reproduces the hex of each word's UTF-8
    * bytes exactly — BPE segments, it never rewrites. */
  def encodeSymbols(text: String,
                    table: IndexedSeq[(String, String)] = merges): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    for (w <- wordsBytes(text)) out ++= encodeWordSymbols(w, table)
    out.toSeq
  }

  /** One word's merged symbol sequence: [[byteSyms]] base symbols, each
    * table entry applied in rank order as one non-overlapping pass,
    * with a containment scan before each rebuild. */
  private def encodeWordSymbols(w: String,
                                table: IndexedSeq[(String, String)]): IndexedSeq[String] = {
    var syms: IndexedSeq[String] = byteSyms(w)
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
    syms
  }

  /** Reference encode-to-ids: [[encodeSymbols]] mapped through
    * [[vocabOf]]. Backs the x134 specs; the distributed twin is
    * [[graft.functions.BpeEncodeIdsExpr]] (hot path) /
    * [[encodeIdsChain]] (replace-chain twin). */
  def encodeIdsLocal(text: String,
                     table: IndexedSeq[(String, String)] = merges): Seq[Int] = {
    val idOf = if (table eq merges) fixedIdOf else vocabOf(table).toMap
    encodeSymbols(text, table).map(idOf)
  }

  // ---- fixed-table hot path -------------------------------------------
  //
  // The per-word merge loop is O(|table| × word-bytes) — already ~10×
  // cheaper than the replace-chain fold's O(|table| × TEXT-bytes) rescans
  // — and natural-language words repeat heavily, so a bounded word→ids
  // memo makes the amortized cost one hash probe per word. The cache is
  // valid for the lifetime of the JVM because the fixed table is
  // immutable; the caps bound memory against adversarial vocabularies
  // on THREE axes — entry count, entry size, and TOTAL retained bytes
  // (the count×size worst case alone would pin ~hundreds of MB per
  // executor JVM forever; the byte budget caps the sum regardless of
  // the entry-size mix). Past any cap the global cache stops admitting;
  // repeat occurrences of uncached words then re-encode across CALLS,
  // but never within one call — encodeIdsArray keeps a per-call local
  // memo for global-cache misses, so each distinct word is encoded at
  // most once per text either way. Correctness is unchanged in every
  // regime (the memo only short-circuits a pure function).

  private val wordIdCacheCap = 1 << 17
  private val wordIdCacheMaxWordLen = 256
  // ~64 MiB retained-byte budget; an entry retains roughly
  // 2·|word| (String chars) + 4·|ids| + ~64 object/CHM overhead bytes
  private val wordIdCacheMaxBytes = 64L << 20
  @transient private lazy val wordIdCacheBytes =
    new java.util.concurrent.atomic.AtomicLong(0L)
  @transient private lazy val wordIdCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()

  private def encodeWordIdsUncached(w: String): Array[Int] = {
    val syms = encodeWordSymbols(w, merges)
    val ids = new Array[Int](syms.length)
    var i = 0
    while (i < syms.length) { ids(i) = fixedIdOf(syms(i)); i += 1 }
    ids
  }

  private def idsOfWordFixed(w: String): Array[Int] = {
    val hit = wordIdCache.get(w)
    if (hit != null) hit
    else {
      val ids = encodeWordIdsUncached(w)
      if (w.length <= wordIdCacheMaxWordLen &&
          wordIdCache.size < wordIdCacheCap) {
        // RESERVE the bytes before inserting (addAndGet, rolled back on
        // a lost put race or a blown budget) so concurrent executor
        // threads cannot collectively overshoot the byte cap — the
        // check-then-add form could exceed it by threads × entry size
        val sz = 2L * w.length + 4L * ids.length + 64L
        if (wordIdCacheBytes.addAndGet(sz) <= wordIdCacheMaxBytes) {
          if (wordIdCache.putIfAbsent(w, ids) != null)
            wordIdCacheBytes.addAndGet(-sz)
        } else wordIdCacheBytes.addAndGet(-sz)
      }
      ids
    }
  }

  /** Hot-path encode of one text under the FIXED table — the body of
    * [[graft.functions.BpeEncodeIdsExpr]]. One memoized merge loop per
    * distinct word per call (a per-call local memo covers words the
    * bounded global cache declines, so repeats within one text never
    * re-encode; repeats across calls re-encode only once the global
    * caps are hit); bit-identical to [[encodeIdsLocal]] (spec-pinned). */
  def encodeIdsArray(text: String): Array[Int] = {
    val ws = wordsBytes(text)
    var local: java.util.HashMap[String, Array[Int]] = null
    val arrs = ws.map { w =>
      val hit = wordIdCache.get(w)
      if (hit != null) hit
      else {
        if (local == null) local = new java.util.HashMap[String, Array[Int]]()
        var ids = local.get(w)
        if (ids == null) { ids = idsOfWordFixed(w); local.put(w, ids) }
        ids
      }
    }
    var n = 0
    arrs.foreach(a => n += a.length)
    val out = new Array[Int](n)
    var o = 0
    arrs.foreach { ids =>
      System.arraycopy(ids, 0, out, o, ids.length)
      o += ids.length
    }
    out
  }

  /** Token count of one text under a byte-level merge table — the
    * reference backing [[graft.functions.BpeTokenCountExpr]] (which
    * calls this per row) and the specs. Fixed-table calls ride the
    * word memo. */
  def tokenCount(text: String, table: IndexedSeq[(String, String)] = merges): Int =
    if (table eq merges) {
      var total = 0
      wordsBytes(text).foreach(w => total += idsOfWordFixed(w).length)
      total
    } else {
      var total = 0
      for (w <- wordsBytes(text)) total += encodeWordSymbols(w, table).length
      total
    }

  /** Char-level token count under a CORPUS-trained table ([[words]]
    * units — x83's application semantics, spec-pinned against
    * [[tokenCountUnder]]). */
  def tokenCountChars(text: String, table: IndexedSeq[(String, String)]): Int = {
    var total = 0
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
      total += syms.length
    }
    total
  }

  /** Spark Column: BPE token-ID sequence (`array<int>`) via the
    * replace-chain fold — the bit-parity TWIN of the native expression
    * (its plan shape textually mirrors the DuckDB oracle: the same
    * brace-string fold, then symbols mapped through the [[vocabOf]] id
    * map as a plan-literal `map<string,int>`). Production queries use
    * [[graft.functions.TextExpressions.bpeEncodeIdsNative]]; this form
    * exists so the specs can pin native ≡ chain ≡ local reference.
    * Every emitted symbol is in the vocab by construction (symbols only
    * ever merge FROM the 256-byte base alphabet), and under ANSI mode
    * `element_at` would fail loudly, never emit a wrong id, if that
    * invariant ever broke. */
  def encodeIdsChain(textCol: org.apache.spark.sql.Column,
                     table: IndexedSeq[(String, String)] = merges): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val merged = mergedUnderBytes(textCol, table)
    val idMap = map(vocabOf(table)
      .flatMap { case (s, i) => Seq(lit(s), lit(i)) }: _*)
    transform(regexp_extract_all(merged, lit("\\{([^}]*)\\}"), lit(1)),
      sy => element_at(idMap, sy))
  }

  /** TOKENIZER FERTILITY report per language — the table a tokenizer
    * owner reads before pointing a vocab at a multilingual corpus: ids
    * per word (fertility) and chars per id (compression), both in the
    * exact permille lane. Words are the tokenizer's own word units
    * (maximal non-whitespace runs — the same definition the encode
    * segments, so fertility ≥ 1000 by construction: every word emits at
    * least one id). One row per language: (lang, n_docs, n_words,
    * n_ids, n_chars, fertility_permille, chars_per_id_permille).
    *
    * Scale shape: ONE map-side-combinable aggregation over the corpus —
    * the encode is the native per-row merge loop under the frozen table
    * (zero shuffle before the lang-keyed combine), and the output is
    * languages-sized. All counts are exact integers and the permille
    * ratios integer `div` (guarded: a whitespace-only language with
    * zero words/ids reports null, never an ANSI divide error), so the
    * x140 oracle replays the report bit-for-bit. */
  def fertilityReport(docs: org.apache.spark.sql.DataFrame, langCol: String,
                      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    docs.groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(regexp_count(col(textCol), lit("[^ \\t\\n\\f\\r]+")))
          .cast("long").as("n_words"),
        // ids-per-doc = the native count (BpeSpec pins it == encode-ids
        // length) — no id array materialized on the corpus-sized hot
        // path just to take a size
        sum(graft.functions.TextExpressions.bpeTokenCountNative(col(textCol)))
          .cast("long").as("n_ids"),
        sum(length(col(textCol))).cast("long").as("n_chars"))
      .withColumn("fertility_permille",
        expr("CASE WHEN n_words > 0 THEN (n_ids * 1000) div n_words END"))
      .withColumn("chars_per_id_permille",
        expr("CASE WHEN n_ids > 0 THEN (n_chars * 1000) div n_ids END"))
      .orderBy("lang")
  }

  /** DuckDB expression mapping `mergedCol` (a column already holding
    * [[oracleSqlExpr]]'s merged brace string — evaluate that once in a
    * subquery, the chain is ~160 nested replaces) to the id LIST:
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

  /** DuckDB expression producing the MERGED symbol string for column
    * `col` under the fixed BYTE table: every word (maximal
    * non-whitespace run — RE2 scans the same explicit ASCII class the
    * JVM scanner uses) becomes brace-delimited lowercase hex-pair
    * symbols of its UTF-8 bytes ("{74} {68} "), words are joined with
    * "/ " so merges cannot cross word boundaries, and each merge is one
    * plain `replace` pass (left-to-right non-overlapping — the same
    * tie-break as [[applyMergeOnce]]). Braces and '/' cannot collide
    * with symbol text because the symbol alphabet is [0-9a-f]. The
    * caller counts tokens as the number of '{' characters (wrap in a
    * subquery — the fold is ~160 replace passes and should be evaluated
    * once per row).
    *
    * Shape: a `list_reduce` fold over a flat list literal — the seed is
    * the prepared brace string, each further element is one merge as
    * "pattern|replacement" ('|' can never occur in symbol text) — NOT a
    * syntactically nested replace chain: DuckDB's binder caps expression
    * nesting at 128, which the byte table's 160 merges exceed; the flat
    * fold is depth-constant in the merge count while computing the
    * identical left-to-right pass sequence. */
  def oracleSqlExpr(col: String): String = {
    val prepared =
      s"array_to_string(list_transform(regexp_extract_all($col, '[^ \\t\\n\\f\\r]+'), " +
        "w -> regexp_replace(lower(hex(encode(w))), '(..)', '{\\1} ', 'g')), '/ ')"
    val mergeList = merges.map { case (a, b) => s"'{$a} {$b}|{$a$b}'" }.mkString(", ")
    s"list_reduce(list_prepend($prepared, [$mergeList]), " +
      "(acc, x) -> replace(acc, string_split(x, '|')[1], string_split(x, '|')[2]))"
  }
}
