package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking and deterministic sampling for training-data
  * pipelines (SURVEY.md §2.B [EXT]).
  *
  * Scale shape: both are pure per-row Column programs — chunking explodes
  * into chunk rows with no shuffle (output partitioning inherits the
  * input's), sampling is a shuffle-free filter whose key is a cross-engine
  * reproducible hash (md5 of the decimal id string), so the same rows are
  * kept on any engine, any partitioning, any run.
  */
object Chunking {

  /** Split each document into token-window chunks of `chunkTokens` tokens
    * overlapping by `overlap` (stride = chunkTokens - overlap); the final
    * chunk may be short, and every non-empty document yields at least one
    * chunk. Output: one row per (doc, chunk_idx) with the chunk text and
    * its token count. `keepCols` are carried through unchanged — cheaper
    * than joining metadata back onto the exploded chunk rows afterwards
    * (that join would re-shuffle the whole chunk table at corpus scale).
    *
    * Tokenization convention: [[TextStats.tokens]] (empty tokens from
    * repeated separators are dropped) — DELIBERATELY different from
    * [[contentDefinedChunks]]' raw single-space split; see there. Mixing
    * the two over one corpus yields different token counts by design. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int = 50, overlap: Int = 10,
            keepCols: Seq[String] = Nil): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap=$overlap < chunkTokens=$chunkTokens")
    val stride = chunkTokens - overlap
    val nChunks = greatest(
      ceil((col("n_toks") - lit(overlap)).cast("double") / stride).cast("int"),
      lit(1))
    docs
      .withColumn("toks", TextStats.tokens(col(textCol)))
      .withColumn("n_toks", size(col("toks")))
      .filter(col("n_toks") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0), nChunks - 1)))
      .withColumn("chunk_toks",
        slice(col("toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)))
      .select(col(idCol) +: keepCols.map(col) :+ col("chunk_idx") :+
        concat_ws(" ", col("chunk_toks")).as("chunk") :+
        size(col("chunk_toks")).as("n_chunk_tokens"): _*)
  }

  /** CONTENT-DEFINED chunking (the CDC/rolling-hash discipline of the
    * dedup literature, re-expressed over word tokens): a chunk boundary
    * falls after token i exactly when the md5 of the trailing
    * `windowWords`-token window at i lands in the boundary residue
    * class (first 4 hex mod `maskMod` == 0), plus a forced boundary at
    * the doc end. Boundaries are a pure function of LOCAL content —
    * unlike [[chunk]]'s fixed windows, inserting or deleting a passage
    * shifts only the chunks it touches, and every later chunk's CONTENT
    * (and hash) is preserved — which is what makes CDC chunks the
    * stable dedup key for corpora of near-identical revisions
    * (re-crawls, wiki dumps, code checkpoints). Expected chunk length ≈
    * `maskMod` tokens; docs shorter than the window are one whole-doc
    * chunk. Output: one row per (doc, 1-based chunk_idx) with the chunk
    * text, its token count, and `chunk_hash` = md5(chunk) — the dedup
    * key (groupBy chunk_hash finds shared content at any alignment);
    * `keepCols` carry through unchanged (the [[chunk]] discipline —
    * cheaper than re-joining metadata onto the exploded chunk rows).
    *
    * Scale shape: boundary detection and segment assembly are codegen'd
    * higher-order functions per row — no shuffle, no UDF; output
    * partitioning inherits the input's exactly like [[chunk]].
    *
    * Tokenization convention: a raw single-space split (NOT
    * [[TextStats.tokens]], which [[chunk]] uses) — CDC chunk hashes must
    * be reproducible by any engine's plain `string_split(text, ' ')`
    * convention so a cross-engine reader can recompute and verify
    * `chunk_hash` boundaries; dropping empty tokens would silently move
    * boundaries between engines that disagree on separator runs. */
  def contentDefinedChunks(docs: DataFrame, idCol: String, textCol: String,
                           windowWords: Int = 4,
                           maskMod: Int = 16,
                           keepCols: Seq[String] = Nil): DataFrame = {
    require(windowWords >= 1, s"need windowWords >= 1, got $windowWords")
    require(maskMod >= 1, s"need maskMod >= 1, got $maskMod")
    val w = windowWords
    docs
      .withColumn("toks", split(col(textCol), " "))
      .withColumn("nt", size(col("toks")))
      // candidate boundaries: window-hash residue 0 (guard short docs —
      // Spark's sequence(a, b) DECREASES when b < a)
      .withColumn("bnd",
        when(col("nt") >= w,
          filter(sequence(lit(w), col("nt")), i =>
            conv(substring(md5(concat_ws(" ",
              slice(col("toks"), i - (w - 1), lit(w)))), 1, 4), 16, 10)
              .cast("int") % maskMod === 0))
          .otherwise(array().cast("array<int>")))
      // forced boundary at the doc end (unless already one)
      .withColumn("bnd2",
        when(size(col("bnd")) > 0 &&
             element_at(col("bnd"), -1) === col("nt"), col("bnd"))
          .otherwise(concat(col("bnd"), array(col("nt")))))
      .withColumn("ci", explode(sequence(lit(1), size(col("bnd2")))))
      .withColumn("__start",
        expr("CASE WHEN ci = 1 THEN 1 ELSE element_at(bnd2, ci - 1) + 1 END"))
      .withColumn("n_chunk_tokens",
        expr("element_at(bnd2, ci) - " +
          "CASE WHEN ci = 1 THEN 0 ELSE element_at(bnd2, ci - 1) END"))
      .withColumn("chunk",
        expr("concat_ws(' ', slice(toks, __start, n_chunk_tokens))"))
      .select(col(idCol) +: keepCols.map(col) :+ col("ci").as("chunk_idx") :+
        col("chunk") :+ col("n_chunk_tokens").cast("int").as("n_chunk_tokens") :+
        md5(col("chunk")).as("chunk_hash"): _*)
  }

  /** Deterministic ~`keepHexDigits`/16 sample predicate: keep a row iff
    * the first hex digit of md5(id-as-decimal-string) is below the cutoff.
    * Engine- and partitioning-independent (md5 of a decimal string is
    * identical everywhere), so the sample is reproducible end-to-end. */
  def hashSample(id: Column, keepHexDigits: Int = 3): Column = {
    require(keepHexDigits >= 1 && keepHexDigits <= 16)
    val keep = "0123456789abcdef".take(keepHexDigits).map(_.toString)
    substring(md5(id.cast("string")), 1, 1).isin(keep: _*)
  }

  /** Deterministic keep-with-probability-`rate` predicate at 1/65536
    * granularity: keep a row iff the first four hex digits of
    * md5(id-as-decimal-string) sort below the rate's 4-hex cutoff.
    * Lowercase-hex string comparison behaves identically in every engine,
    * so a domain-mixing job reproduces the same document set anywhere.
    * The finer granularity (vs [[hashSample]]'s 16ths) is what mixture
    * weights like 0.37 need. */
  def hashKeepFraction(id: Column, rate: Double): Column = {
    require(rate >= 0.0 && rate <= 1.0, s"rate=$rate out of [0,1]")
    val cut = math.round(rate * 65536).toInt
    // rates rounding to 65536 must short-circuit: f"$cut%04x" would be the
    // 5-char "10000" and the 4-char lexicographic compare collapses to ~6%
    if (cut >= 65536) lit(true)
    else substring(md5(id.cast("string")), 1, 4) < lit(f"$cut%04x")
  }

  /** Greedy stream packing of chunks into fixed-capacity training
    * sequences, the step between chunking and batch assembly: within each
    * `shardCol` stream (ordered by `orderCols`), chunk i joins pack
    * floor(tokens-before-i / capacity) — a pack closes once the running
    * total crosses the capacity boundary (chunks are never split, so a
    * pack may overrun by at most one chunk — [[packChunksStrict]] is
    * the no-overrun form). One window per shard; no
    * global coordination, so shards pack in parallel at any scale. */
  def packChunks(chunks: DataFrame, shardCol: String, tokenCol: String,
                 capacity: Int, orderCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    chunks
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(tokenCol)).cast("double") / capacity).cast("long"))
      .drop("__cum")
  }

  /** STRICT next-fit packing: like [[packChunks]] but no pack ever exceeds
    * `capacity` (a chunk that would overflow the open pack CLOSES it and
    * starts the next one) — the boundary law a training loader needs, since
    * an overrun pack must be truncated at batch-assembly time and the
    * truncated tokens are silently lost. The one exception is a single
    * chunk larger than `capacity` itself, which occupies a pack alone
    * (next-fit semantics; chunk with [[chunk]]`(chunkTokens <= capacity)`
    * and the case never arises).
    *
    * Next-fit fill state is inherently sequential — pack i's boundary
    * depends on every chunk before it — so there is no window/cumsum
    * closed form. The scalable shape is a per-shard fold: each shard's
    * chunks are gathered into one sorted array and folded with
    * `functions.aggregate` (a codegen-evaluated Catalyst lambda, no UDF).
    * One shuffle on `shardCol`; shards pack independently, so at 100 TB
    * the dial is shard granularity (e.g. source × date × hash-bucket),
    * which bounds the per-task array exactly like the reference pattern
    * in [[packChunks]] — choose shards of ~10⁵ chunks and a million
    * shards fold in parallel. Order keys must be unique per shard (they
    * are the sort key of the gathered array). */
  def packChunksStrict(chunks: DataFrame, shardCol: String, tokenCol: String,
                       capacity: Int, orderCols: Seq[String]): DataFrame =
    packAssignments(
      packChunksStrictFold(chunks, shardCol, tokenCol, capacity, orderCols))

  /** The next-fit fold itself, RESUMABLE: one output row per shard with
    * the sorted item array, its per-chunk pack assignments, and the
    * post-fold open-pack state `(pack_fill, pack_bin)`. Passing a prior
    * fold's state as `state` (schema: shardCol, pack_fill, pack_bin)
    * continues packing where it left off — pack `pack_bin` keeps filling
    * from `pack_fill` — which is the STREAMING maintenance form: fold
    * each micro-batch with the running state and the concatenation law
    * holds (state ∘ batch ≡ one fold over the concatenated stream),
    * because (fill, bin) is the complete sequential state of next-fit.
    * Prerequisite, as with every order-sensitive fold here: per-shard
    * arrival order must equal `orderCols` order across batches (ordered
    * produce + shard-key routing). Shards absent from `state` seed
    * fresh; shards absent from `chunks` do NOT appear in the output —
    * union their prior state back via [[packStateMerge]]. */
  def packChunksStrictFold(chunks: DataFrame, shardCol: String,
                           tokenCol: String, capacity: Int,
                           orderCols: Seq[String],
                           state: DataFrame = null): DataFrame = {
    require(capacity > 0, s"need a positive capacity, got $capacity")
    val cap = lit(capacity.toLong)
    val item = struct(
      orderCols.map(col) ++
        Seq(col(tokenCol).cast("long").as("__tok"),
            struct(chunks.columns.map(col): _*).as("__row")): _*)
    val grouped = chunks
      .groupBy(col(shardCol).as("__shard"))
      .agg(sort_array(collect_list(item)).as("__items"))
    // seed: fill starts AT capacity with bin -1, so the first chunk of a
    // fresh shard always opens pack 0; a resumed shard starts from its
    // carried (fill, bin).
    val seeded =
      if (state == null)
        grouped.withColumn("__fill0", cap).withColumn("__bin0", lit(-1L))
      else
        grouped
          .join(state.select(col(shardCol).as("__st_shard"),
              col("pack_fill").as("__st_fill"), col("pack_bin").as("__st_bin")),
            col("__shard") === col("__st_shard"), "left")
          .withColumn("__fill0", coalesce(col("__st_fill"), cap))
          .withColumn("__bin0", coalesce(col("__st_bin"), lit(-1L)))
          .drop("__st_shard", "__st_fill", "__st_bin")
    val st0 = struct(col("__fill0").as("fill"), col("__bin0").as("bin"),
      array().cast("array<bigint>").as("bins"))
    val folded = aggregate(col("__items"), st0, (st, x) => {
      val tok  = x.getField("__tok")
      // bin < 0: a fresh shard's first chunk ALWAYS opens pack 0, even
      // a zero-token one (a symbol-free chunk under an id-count token
      // column) — the fill test alone would leave it at the invalid
      // seed bin -1, where the oracle recurrence seeds rk=1 at pack 0
      val open = st.getField("fill") + tok > cap || st.getField("bin") < 0L
      val bin  = when(open, st.getField("bin") + 1L).otherwise(st.getField("bin"))
      val fill = when(open, tok).otherwise(st.getField("fill") + tok)
      struct(fill.as("fill"), bin.as("bin"),
        concat(st.getField("bins"), array(bin)).as("bins"))
    })
    seeded
      .withColumn("__folded", folded)
      .select(col("__shard"), col("__items"),
        col("__folded.bins").as("__bins"),
        col("__folded.fill").as("pack_fill"),
        col("__folded.bin").as("pack_bin"))
  }

  /** PACK-FILL efficiency report over a [[packChunksStrict]] frame: per
    * shard, how well next-fit filled the capacity — pack count, chunk
    * count, packed token mass, and the realized fill as a permille of
    * shard capacity (n_packs · capacity). The loader-budget telemetry
    * read next to x128/x137's pack manifests: a low fill permille means
    * oversized chunks are forcing early pack breaks and the capacity or
    * the chunker needs retuning. Shard-keyed aggregates only; output is
    * shards-sized; all integers (the x145 oracle replays it exactly). */
  def packFillReport(packs: DataFrame, shardCol: String, tokenCol: String,
                     capacity: Int): DataFrame = {
    require(capacity > 0, s"need a positive capacity, got $capacity")
    packs
      .groupBy(col(shardCol), col("pack_id"))
      .agg(count(lit(1)).as("__nc"),
        sum(col(tokenCol)).cast("long").as("__pt"))
      .groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_packs"),
        sum(col("__nc")).cast("long").as("n_chunks"),
        sum(col("__pt")).cast("long").as("packed_tokens"))
      .withColumn("fill_permille",
        expr(s"(packed_tokens * 1000) div (n_packs * ${capacity}L)"))
  }

  /** PACK-CAPACITY dial ladder (the x155/x158/x159 tuning-table
    * discipline on the EXPORT lane): re-run the next-fit pack fold at
    * each capacity dial over ONE chunk frame (checkpoint it at the
    * call site) and report, per capacity, the corpus-wide pack count,
    * chunk/token mass, and fill efficiency — the table a deployer
    * reads to pick the training sequence length (harness query x160).
    * One row per dial: (capacity, n_packs, n_chunks, packed_tokens,
    * fill_permille), all exact integers. Capacities do NOT nest (a
    * different capacity re-threads every pack boundary), so each dial
    * pays its own fold — that per-dial recurrence is the real cost the
    * table prices, exactly like x158's per-dial components; the
    * corpus-sized chunking runs once. */
  def packCapacityLadder(chunks: DataFrame, shardCol: String,
                         tokenCol: String, capacities: Seq[Int],
                         orderCols: Seq[String]): DataFrame = {
    require(capacities.nonEmpty, "need at least one capacity dial")
    require(capacities.sliding(2).forall(w => w.size < 2 || w(0) < w(1)),
      s"capacities must be strictly increasing: $capacities")
    capacities.map { cap =>
      packChunksStrict(chunks, shardCol, tokenCol, cap, orderCols)
        .groupBy(col(shardCol), col("pack_id"))
        .agg(count(lit(1)).as("__nc"),
          sum(col(tokenCol)).cast("long").as("__pt"))
        .agg(count(lit(1)).as("n_packs"),
          sum(col("__nc")).cast("long").as("n_chunks"),
          sum(col("__pt")).cast("long").as("packed_tokens"))
        .select(lit(cap).as("capacity"), col("n_packs"), col("n_chunks"),
          col("packed_tokens"),
          expr(s"(packed_tokens * 1000) div (n_packs * ${cap}L)")
            .as("fill_permille"))
    }.reduce(_.unionByName(_))
  }

  /** Explode a [[packChunksStrictFold]] frame back to the input rows,
    * each with its `pack_id`. */
  def packAssignments(folded: DataFrame): DataFrame =
    folded
      .withColumn("__packed", explode(zip_with(
        col("__items"), col("__bins"),
        (it, b) => struct(it.getField("__row").as("row"), b.as("pack_id")))))
      .select(col("__packed.row.*"), col("__packed.pack_id"))

  /** The open-pack state of a [[packChunksStrictFold]] frame, keyed by
    * `shardCol` — feed it back as the next fold's `state`. */
  def packFoldState(folded: DataFrame, shardCol: String): DataFrame =
    folded.select(col("__shard").as(shardCol),
      col("pack_fill"), col("pack_bin"))

  /** Carry forward state for shards the fresh batch did not touch:
    * fresh rows win, untouched shards keep their prior state. */
  def packStateMerge(old: DataFrame, fresh: DataFrame,
                     shardCol: String): DataFrame =
    old.join(fresh.select(shardCol), Seq(shardCol), "left_anti")
      .unionByName(fresh)

  /** WEIGHTED sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
    * 2006): keep the k rows with the largest u^(1/w) — equivalently
    * the largest ln(u)/w — where u is a deterministic per-row uniform
    * and w the row's weight. Inclusion probability is ∝ weight
    * (heavier rows win more keys), which is the DATA-MIXING primitive:
    * sample documents ∝ token count (or quality score) when assembling
    * a training mix, reproducibly.
    *
    * Determinism: u derives from the first 8 md5 hex digits of
    * `salt:id` — (v + 0.5)/2³² ∈ (0, 1), the x66 md5-affine
    * convention — and the key is the fixed left-to-right IEEE
    * expression ln(u)/w pinned to integer ⌊·10¹²⌋ fixed point (the x48
    * ln convention), ties broken by id: the x127 oracle replays every
    * key bit-for-bit. Rows with weight <= 0 are excluded (they can
    * never be sampled; the guard also keeps ±Inf out of the ANSI
    * cast). Weight scale: the fixed-point lane holds |ln(u)/w| up to
    * ~9·10⁶, i.e. weights down to ~3·10⁻⁶ — token counts, char counts
    * and [0,1] quality scores all sit far inside it; rescale weights
    * into that range rather than feeding, say, probabilities in
    * 10⁻⁹ units (the ANSI long cast would fail loudly, not corrupt).
    *
    * Scale (100 TB): the key is one codegen'd per-row expression, the
    * global top-k is orderBy + limit — Spark's TakeOrderedAndProject,
    * a per-partition heap + driver merge of k·parts rows, no full
    * sort, no shuffle of the corpus. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String = "ws"): DataFrame = {
    require(k > 0, s"need a positive sample size, got $k")
    val v = conv(substring(md5(concat(lit(salt), lit(":"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("double")
    val u = (v + lit(0.5)) / lit(4294967296.0)
    val key = floor(log(u) / col(weightCol).cast("double") * 1e12)
      .cast("long")
    df.filter(col(weightCol) > 0)
      .withColumn("es_key", key)
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }

  /** Exactly-k-per-stratum deterministic sample: rank rows inside each
    * stratum by (md5(id), id) and keep the first k. One shuffle on the
    * stratum key; the hash order is engine-reproducible. */
  def stratifiedFixedSample(df: DataFrame, strataCol: String, idCol: String,
                            k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("rk")
  }

  /** TOKEN-BUDGET mixture realization: given per-group mix weights (in
    * permille) and a total token budget, derive each group's keep rate
    * IN-PLAN and realize the mix with the deterministic md5 predicate —
    * the "assemble a 1T-token mix at 50% web / 30% wiki / 20% books"
    * step, downsample-only. Exact integer arithmetic end to end (the
    * [[temperatureMix]] discipline): target_g = budget·w_g div 1000,
    * cut_g = target_g·65536 div tokens_g in a DECIMAL(38,0) lane (so a
    * 10¹⁷-token budget cannot wrap), capped at 65536 when the group is
    * OVER-subscribed (target > available: the engine keeps everything
    * and the gap is visible as target_tokens > n_tokens — a filter
    * cannot upsample; epoch the shortfall with [[epochShuffle]]).
    * Groups absent from `weightsPermille` get weight 0 and drop — "not
    * in the mix". Keep decisions hash per ROW at the group's rate, so
    * kept TOKENS land on target in expectation (docs are exchangeable
    * w.r.t. md5) — the report columns make the realized mix auditable.
    *
    * Returns docs + (n_tokens, w_permille, target_tokens, cut, keep).
    *
    * Scale shape: one count aggregate over the corpus, a broadcast of
    * the group-sized plan table, and a per-row codegen'd md5 predicate
    * — linear, one shuffle, identical to [[temperatureMix]]'s.
    *
    * Decomposes into [[mixtureStats]] → [[mixturePlanFromStats]] →
    * [[applyMixturePlan]]: the stats are group-sized integer sums
    * (folded by add — [[mixtureStatsMerge]]), the plan is a pure
    * function of them, and keeps are a read-time PREDICATE of the plan
    * — so the streaming-maintained artifact is the tiny stats/plan
    * state, never a materialized keep set (a retroactive cut change
    * re-scores at scan time for free). */
  def mixtureBudgetMix(docs: DataFrame, groupCol: String, idCol: String,
                       tokenCol: String, weightsPermille: Map[String, Int],
                       budgetTokens: Long): DataFrame =
    applyMixturePlan(docs,
      mixturePlanFromStats(mixtureStats(docs, groupCol, tokenCol),
        groupCol, weightsPermille, budgetTokens),
      groupCol, idCol)

  /** The group-sized token-sum state behind [[mixtureBudgetMix]]:
    * (groupCol, n_tokens). Integer sums — associative-commutative, so
    * incremental maintenance folds batches by [[mixtureStatsMerge]]. */
  def mixtureStats(docs: DataFrame, groupCol: String,
                   tokenCol: String): DataFrame =
    docs.groupBy(col(groupCol))
      .agg(sum(col(tokenCol)).cast("long").as("n_tokens"))

  /** Fold two [[mixtureStats]] frames by per-group addition. */
  def mixtureStatsMerge(a: DataFrame, b: DataFrame,
                        groupCol: String): DataFrame =
    a.unionByName(b).groupBy(col(groupCol))
      .agg(sum(col("n_tokens")).cast("long").as("n_tokens"))

  /** The plan arithmetic of [[mixtureBudgetMix]] as a pure function of
    * the stats state: (groupCol, n_tokens, w_permille, target_tokens,
    * cut). Group-sized; at scale this is the driver-visible artifact a
    * reader broadcasts. */
  def mixturePlanFromStats(stats: DataFrame, groupCol: String,
                           weightsPermille: Map[String, Int],
                           budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"need a non-negative budget, got $budgetTokens")
    require(weightsPermille.nonEmpty &&
      weightsPermille.values.forall(w => w >= 0 && w <= 1000) &&
      weightsPermille.values.sum <= 1000,
      s"weights must be permille values summing to <= 1000: $weightsPermille")
    val spark = stats.sparkSession
    import spark.implicits._
    val wdf = weightsPermille.toSeq.toDF(groupCol, "w_permille")
    stats
      .join(wdf, Seq(groupCol), "left")
      .withColumn("w_permille", coalesce(col("w_permille"), lit(0)))
      // target in the DECIMAL(38,0) lane too: budget·w_permille in BIGINT
      // wraps silently (non-ANSI arithmetic path) above ~9.2e15 at
      // w=1000, turning a trillion-token target negative → cut 0 → the
      // group silently dropped. The quotient is <= budget, so the final
      // BIGINT cast is always safe.
      .withColumn("target_tokens", expr(
        s"CAST((CAST($budgetTokens AS DECIMAL(38,0)) * w_permille)" +
          " div 1000 AS BIGINT)"))
      .withColumn("cut",
        when(col("target_tokens") >= col("n_tokens"), lit(65536))
          .otherwise(expr("CAST((CAST(target_tokens AS DECIMAL(38,0)) * 65536)" +
            " div n_tokens AS INT)")))
  }

  /** MULTI-EPOCH schedule for OVER-subscribed mixes: where
    * [[mixturePlanFromStats]] caps an over-subscribed group at
    * keep-everything (a filter cannot upsample), this emits how
    * trainers actually close the gap — repeat the group `full_epochs`
    * whole times and draw the REMAINDER as a partial last epoch:
    * full_epochs = target div tokens, rem_target = target −
    * full_epochs·tokens, and `cut` realizes rem_target by the same md5
    * predicate (rem < tokens, so the cut never saturates). Pair each
    * whole epoch with [[epochShuffle]] for its training order. Exact
    * integer arithmetic throughout; groups with weight 0 plan 0/0/0.
    *
    * Output: (groupCol, n_tokens, w_permille, target_tokens,
    * full_epochs, rem_target, cut) — `cut`-compatible with
    * [[applyMixturePlan]], which then scores the partial epoch's
    * keeps. */
  def epochPlanFromStats(stats: DataFrame, groupCol: String,
                         weightsPermille: Map[String, Int],
                         budgetTokens: Long): DataFrame =
    mixturePlanFromStats(stats, groupCol, weightsPermille, budgetTokens)
      .drop("cut")
      .withColumn("full_epochs",
        when(col("n_tokens") <= 0, lit(0))
          .otherwise(expr("CAST(target_tokens div n_tokens AS INT)")))
      .withColumn("rem_target",
        col("target_tokens") - col("full_epochs").cast("long") * col("n_tokens"))
      .withColumn("cut",
        when(col("n_tokens") <= 0, lit(0))
          .otherwise(expr("CAST((CAST(rem_target AS DECIMAL(38,0)) * 65536)" +
            " div n_tokens AS INT)")))

  /** Score rows against a [[mixturePlanFromStats]] plan: the broadcast
    * join + md5 keep predicate — the read-time realization (keeps are
    * never materialized; a new plan re-scores the same rows). Rows whose
    * group is ABSENT from the plan score `keep = false` with cut 0 and
    * weight 0 (left join, never an inner-join drop): when a maintained
    * stats/plan state lags arrivals, unplanned rows must be visibly
    * excluded, not silently vanish from the report. Their plan report
    * columns (`n_tokens`, `target_tokens`) stay null — the plan genuinely
    * has no numbers for them. */
  def applyMixturePlan(docs: DataFrame, plan: DataFrame, groupCol: String,
                       idCol: String): DataFrame =
    docs.join(broadcast(plan), Seq(groupCol), "left")
      .withColumn("w_permille", coalesce(col("w_permille"), lit(0)))
      .withColumn("cut", coalesce(col("cut"), lit(0)))
      .withColumn("keep", col("cut") >= 65536 ||
        substring(md5(col(idCol).cast("string")), 1, 4) <
          lower(lpad(conv(col("cut"), 10, 16), 4, "0")))

  /** EPOCH-SHUFFLE manifest: the reproducible global training-order
    * permutation for one epoch, realized as (shard, pos) coordinates —
    * the form a distributed loader actually consumes (write shard
    * files once, read each sequentially), not a materialized reorder
    * of the corpus. shard = first 8 md5 hex digits of
    * `epoch:<epoch>:<id>` mod `nShards`; pos = the row's rank inside
    * its shard by (full md5 hex, id). A new epoch re-keys everything —
    * a fresh permutation per epoch from the same one-line recipe, and
    * both coordinates replay bit-for-bit in any engine (the md5-affine
    * x66 convention; no RNG state to ship).
    *
    * Scale (100 TB): one hash shuffle on `shard` (uniform by
    * construction — md5 is the partitioner) and a per-shard sort of
    * corpus/nShards rows inside the rank window; `nShards` is the
    * parallelism dial (10⁴ shards → ~10 GB sorts that spill cleanly),
    * and there is NO global sort and no driver-side permutation
    * table. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   nShards: Int): DataFrame = {
    require(nShards > 0, s"need a positive shard count, got $nShards")
    require(epoch >= 0, s"need a non-negative epoch, got $epoch")
    val hx = md5(concat(lit(s"epoch:$epoch:"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__hx"), col(idCol))
    df.withColumn("__hx", hx)
      .withColumn("shard",
        (conv(substring(col("__hx"), 1, 8), 16, 10).cast("long")
          % nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .drop("__hx")
  }

  /** SQRT-TEMPERATURE rebalancing (the α = 0.5 of multilingual-mix
    * practice): downsample each group to rate √(n_min/n_g), so the kept
    * distribution flattens toward the α-tempered one while the smallest
    * group keeps everything (downsample-only — filtering cannot
    * upsample). Rates come from the data in-plan (no driver state):
    * group counts → global min → `floor(√(n_min/n_g)·65536 + 0.5)`
    * cutoff at [[hashKeepFraction]]'s 1/65536 granularity — and because
    * `sqrt` is IEEE-CORRECTLY-ROUNDED (unlike ln/exp, bit-identical in
    * every engine by spec), the whole computation replays externally:
    * the x54 oracle rebuilds rates, cutoffs, and the per-doc md5 keep
    * decisions bit-for-bit. Returns docs + (ng, cut, keep); the
    * rate-1 group short-circuits the 4-hex compare exactly like
    * [[hashKeepFraction]].
    *
    * Scale shape: one count aggregate, a broadcast of the tiny rate
    * table, a per-row md5 predicate — linear, one shuffle. */
  def temperatureMix(docs: DataFrame, groupCol: String,
                     idCol: String): DataFrame = {
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("ng"))
    val nmin = counts.agg(min(col("ng")).as("nmin"))
    val rates = counts.crossJoin(nmin)
      .withColumn("cut", floor(
        sqrt(col("nmin").cast("double") / col("ng")) * lit(65536.0) + lit(0.5))
        .cast("int"))
      .select(col(groupCol), col("ng"), col("cut"))
    docs
      .join(broadcast(rates), Seq(groupCol))
      .withColumn("keep", col("cut") >= 65536 ||
        substring(md5(col(idCol).cast("string")), 1, 4) <
          lower(lpad(conv(col("cut"), 10, 16), 4, "0")))
  }
}
