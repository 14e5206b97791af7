package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over the corpus k-NN graph — the consumption side of
  * the [[Similarity.knnGraphCells]] / [[Similarity.knnGraphBanded]]
  * builders. A training-data platform builds the neighbor graph once
  * (write-once artifact, x91's compacted tree) and then asks graph
  * questions of it: which near-dup pairs are MUTUALLY nearest (the
  * high-precision dedup signal), which documents are central to the
  * corpus (PageRank over similarity edges — a standard quality /
  * representativeness prior), and what label does the neighborhood
  * imply for the 80% of rows no classifier has seen (label
  * propagation from a small seeded subset — semi-supervised domain /
  * quality tagging).
  *
  * Every operator here consumes a PLAIN EDGE FRAME — (src_id, nbr_id[,
  * cos_sim, rank]) — so they run unchanged over the banded graph, the
  * cell-composed graph, or the compacted stored tree read back from
  * parquet. Iterative operators are the classic Spark join–aggregate
  * loop: per iteration one equi-shuffle of the edge frame keyed on the
  * join id and one node-sized aggregate; at 100 TB the edge frame is
  * pre-partitioned by `src_id` (the stored tree's layout) so the
  * per-iteration join reuses one partitioning, messages combine
  * map-side (exact integer sums), and no step ever materializes more
  * than |E| + |V| rows.
  *
  * Determinism (full-oracle discipline): PageRank runs in 10⁻¹²
  * fixed-point — init/teleport/damping/out-degree splits are BIGINT
  * floor divisions on non-negative values, so per-node sums are
  * order-free exact integer arithmetic replayed verbatim by the x93
  * oracle's unrolled iteration CTEs. Label propagation is integer
  * counts with (count DESC, label ASC) majority tie-breaks. Mutual-kNN
  * needs no arithmetic at all — `cos_sim` is the builder's already
  * rounded symmetric value (a·b and ‖a‖‖b‖ are commutative IEEE
  * products, so both directions carry the identical score).
  */
object Graph {

  /** MUTUAL k-NN pairs: (a, b) kept iff b is in a's top-k AND a is in
    * b's top-k — reciprocal nearest neighbors, the classic
    * high-precision near-dup/link signal (one-sided kNN membership is
    * asymmetric: a hub lands in everyone's list without being close to
    * any of them). One self-equi-join of the graph on the reversed key
    * pair, `a < b` canonicalization; emits (a_id, b_id, cos_sim) with
    * the a→b direction's score (bit-identical to b→a, scaladoc above).
    */
  def mutualKnnPairs(graph: DataFrame): DataFrame = {
    // both sides of the reciprocity self-join read `graph`; eager so an
    // inline graph BUILD runs once, not once per side (the broadcast-build
    // job for one side does not populate a lazy persist for the other).
    // SKIP the checkpoint when the caller already passes a materialized
    // (checkpointed) frame — x99/x105/x107/x112/p04 do — so the k-NN edge
    // frame is not written to block storage twice (ADVICE r17).
    val proj = graph.select(col("src_id"), col("nbr_id"), col("cos_sim"))
    def materializedAlready(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p match {
        case _: org.apache.spark.sql.execution.LogicalRDD => true
        case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
          materializedAlready(pr.child)
        case _ => false
      }
    val g =
      if (materializedAlready(proj.queryExecution.analyzed)) proj
      else Caches.localCheckpointTracked(proj)
    val fwd = g.select(col("src_id"), col("nbr_id"), col("cos_sim"))
    val rev = g.select(col("src_id").as("r_src"), col("nbr_id").as("r_nbr"))
    fwd.join(rev, fwd("src_id") === rev("r_nbr") && fwd("nbr_id") === rev("r_src"))
      .filter(col("src_id") < col("nbr_id"))
      .select(col("src_id").as("a_id"), col("nbr_id").as("b_id"),
        col("cos_sim"))
  }

  /** Fixed-point PageRank over a directed edge frame — centrality over
    * the similarity graph as a representativeness prior (a document
    * many near-neighbors point at is corpus-typical; an isolated one
    * is an outlier — both ends are curation signals).
    *
    * Integer semantics (SCALE = 10¹², damping 0.85, all divisions
    * BIGINT floor on non-negative operands, so Spark's `div` and
    * DuckDB's `//` agree):
    *
    *   init      = SCALE div n
    *   base      = (SCALE·15 div 100) div n
    *   contrib_e = (pr[src]·85 div 100) div outdeg[src]
    *   pr'[v]    = base + Σ contrib over in-edges of v
    *
    * Dangling nodes (no out-edges) DROP their damped mass — the
    * simplest of the standard conventions, stated here because the
    * oracle replays it; ranks are insensitive to the uniform
    * redistribution alternative. The loop is `iters` rounds of
    * edge-join + node-sized sum; each round's node frame is persisted
    * so lineage stays flat. At 100 TB: edges pre-partitioned by
    * src_id, pr/outdeg join on that same key, message sums combine
    * map-side (longs), and the node frame is |V|-sized.
    *
    * Returns (idCol, pr_fix, pr = round(pr_fix/SCALE, 6)) for every
    * node. Harness query x93 replays `iters` unrolled CTEs over the
    * x68 banded graph. */
  def pageRank(edges: DataFrame, nodes: DataFrame, idCol: String,
               srcCol: String = "src_id", dstCol: String = "nbr_id",
               iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val SCALE = 1000000000000L
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty node frame")
    val base = (SCALE * 15L / 100L) / n
    // edges and out-degrees are EAGERLY checkpointed (the x98 lesson,
    // extended r17): a lazily persisted edge frame is re-derived from
    // scratch by every round's broadcast-build job — the graph BUILD
    // above this operator re-ran once per iteration (profiled 6–15 s
    // CPU per round on x93 before the fix, ~0 after)
    val ge = Caches.localCheckpointTracked(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")))
    val od = Caches.localCheckpointTracked(
      ge.groupBy("__src").agg(count(lit(1)).as("__od")))
    var pr = nodes.select(col(idCol).as("__nid"))
      .withColumn("pr_fix", lit(SCALE / n))
    for (_ <- 1 to iters) {
      val msgs = ge
        .join(pr.select(col("__nid").as("__src"), col("pr_fix")), "__src")
        .join(od, "__src")
        .select(col("__dst").as("__nid"),
          expr("((pr_fix * 85) div 100) div __od").as("__c"))
        .groupBy("__nid").agg(sum("__c").as("__s"))
      pr = Caches.localCheckpointTracked(
        nodes.select(col(idCol).as("__nid"))
          .join(msgs, Seq("__nid"), "left")
          .select(col("__nid"),
            (lit(base) + coalesce(col("__s"), lit(0L))).as("pr_fix")))
    }
    pr.select(col("__nid").as(idCol), col("pr_fix"),
      round(col("pr_fix").cast("double") / lit(1e12), 6).as("pr"))
  }

  /** WEIGHTED PageRank — transitions proportional to a POSITIVE integer
    * edge weight instead of the uniform out-degree split: on a
    * similarity graph the walk should prefer STRONG edges (the x93
    * uniform split treats a 0.9-cosine neighbor like a 0.2 one).
    * Exact integer semantics extending [[pageRank]]:
    *
    *   contrib_e = (((pr[src]·85) div 100) · w_e) div Σ_{e' from src} w_e'
    *
    * All operands non-negative; with pr ≤ SCALE = 10¹² and w ≤ ~10⁶
    * the product stays under 2⁶³ (callers deriving weights from
    * cosines should clamp to the 10⁶ fixed-point scale — the x106 gate
    * uses GREATEST(0, ⌊cos·10⁶⌋) + 1, strictly positive so every edge
    * keeps a floor probability). Per-source weight sums replace the
    * out-degree frame; everything else — teleport base, dangling drop,
    * per-round persist — is [[pageRank]] verbatim. Harness query x106
    * replays the weighted rounds. */
  def pageRankWeighted(edges: DataFrame, nodes: DataFrame, idCol: String,
                       srcCol: String = "src_id",
                       dstCol: String = "nbr_id",
                       weightCol: String = "weight",
                       iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val SCALE = 1000000000000L
    val n = nodes.count()
    require(n > 0, "pageRankWeighted needs a non-empty node frame")
    val base = (SCALE * 15L / 100L) / n
    // eager, like [[pageRank]]: a lazy edge persist re-derives the graph
    // build in every round's broadcast job
    val ge = Caches.localCheckpointTracked(edges.select(col(srcCol).as("__src"),
      col(dstCol).as("__dst"), col(weightCol).cast("long").as("__w")))
    val ws = Caches.localCheckpointTracked(
      ge.groupBy("__src").agg(sum("__w").as("__ws")))
    var pr = nodes.select(col(idCol).as("__nid"))
      .withColumn("pr_fix", lit(SCALE / n))
    for (_ <- 1 to iters) {
      val msgs = ge
        .join(pr.select(col("__nid").as("__src"), col("pr_fix")), "__src")
        .join(ws, "__src")
        .select(col("__dst").as("__nid"),
          expr("(((pr_fix * 85) div 100) * __w) div __ws").as("__c"))
        .groupBy("__nid").agg(sum("__c").as("__s"))
      pr = Caches.localCheckpointTracked(
        nodes.select(col(idCol).as("__nid"))
          .join(msgs, Seq("__nid"), "left")
          .select(col("__nid"),
            (lit(base) + coalesce(col("__s"), lit(0L))).as("pr_fix")))
    }
    pr.select(col("__nid").as(idCol), col("pr_fix"),
      round(col("pr_fix").cast("double") / lit(1e12), 6).as("pr"))
  }

  /** Degree ASSORTATIVITY of the mutual graph — Newman's one-number
    * hub-structure diagnostic: r > 0 means high-degree nodes link to
    * each other (dup communities are degree-stratified), r < 0 means
    * hubs link to leaves (star-like near-dup fans). Pearson
    * correlation over the endpoint-degree pairs of every DIRECTED
    * realization of the undirected edges (both orientations, the
    * standard symmetric convention): all six sufficient statistics
    * (m, Σx, Σy, Σxy, Σx², Σy²) are exact integer sums — the x49
    * one-pass map-side-combinable discipline — and the final
    *
    *   r = (m·Σxy − Σx·Σy) / (√(m·Σx² − (Σx)²) · √(m·Σy² − (Σy)²))
    *
    * is a fixed expression of exact-integer-derived doubles (sqrt is
    * IEEE-correctly-rounded, the proven x54 convention). Returns one
    * row (n_edges = m, assortativity rounded to 6); NULL when a
    * variance is zero (regular graph). Harness query x107 replays the
    * sums and the expression. */
  def assortativity(pairs: DataFrame): DataFrame = {
    // pairs feeds both orientations and und feeds both the degree frame
    // and the endpoint join — persist each so the (possibly expensive)
    // pair build runs once, not four times
    val p = Caches.localCheckpointTracked(
      pairs.select(col("a_id"), col("b_id")))
    val und = Caches.localCheckpointTracked(
      p.select(col("a_id").as("__u"), col("b_id").as("__v"))
        .unionAll(p.select(col("b_id").as("__u"), col("a_id").as("__v"))))
    val deg = und.groupBy("__u").agg(count(lit(1)).as("__deg"))
    val xy = und
      .join(deg.select(col("__u"), col("__deg").as("__dx")), "__u")
      .join(deg.select(col("__u").as("__v"), col("__deg").as("__dy")), "__v")
    xy.agg(count(lit(1)).as("m"), sum("__dx").as("sx"), sum("__dy").as("sy"),
        sum(col("__dx") * col("__dy")).as("sxy"),
        sum(col("__dx") * col("__dx")).as("sxx"),
        sum(col("__dy") * col("__dy")).as("syy"))
      .select(col("m").as("n_edges"),
        when(col("m") * col("sxx") - col("sx") * col("sx") > 0 &&
            col("m") * col("syy") - col("sy") * col("sy") > 0,
          round((col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double")) *
             sqrt((col("m") * col("syy") - col("sy") * col("sy")).cast("double"))),
            6)).as("assortativity"))
  }

  /** PERSONALIZED PageRank — the graph-walk relatedness primitive:
    * teleport mass returns only to the `seeds` set, so the stationary
    * scores measure proximity TO THE SEEDS through the similarity
    * graph (related-document expansion, graph-based recommendation,
    * "more like these" curation). Same exact integer semantics as
    * [[pageRank]] with the init/teleport redistributed:
    *
    *   init[v]   = SCALE div |S|   if v ∈ S else 0
    *   base[v]   = (SCALE·15 div 100) div |S|   if v ∈ S else 0
    *   contrib_e = (pr[src]·85 div 100) div outdeg[src]
    *
    * Non-seed nodes accumulate only walked-in mass; dangling mass
    * drops (the [[pageRank]] convention). Returns every node —
    * untouched nodes score 0. Harness query x97 replays the unrolled
    * iterations with the seed-gated base term. */
  def personalizedPageRank(edges: DataFrame, nodes: DataFrame,
                           seeds: DataFrame, idCol: String,
                           srcCol: String = "src_id",
                           dstCol: String = "nbr_id",
                           iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val SCALE = 1000000000000L
    val seedF = Caches.localCheckpointTracked(
      seeds.select(col(idCol).as("__nid")).distinct())
    val nS = seedF.count()
    require(nS > 0, "personalizedPageRank needs a non-empty seed set")
    val base = (SCALE * 15L / 100L) / nS
    // eager, like [[pageRank]]: a lazy edge persist re-derives the graph
    // build in every round's broadcast job
    val ge = Caches.localCheckpointTracked(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")))
    val od = Caches.localCheckpointTracked(
      ge.groupBy("__src").agg(count(lit(1)).as("__od")))
    val nodeF = nodes.select(col(idCol).as("__nid"))
    val isSeed = seedF.withColumn("__s", lit(1))
    var pr = nodeF.join(isSeed, Seq("__nid"), "left")
      .withColumn("pr_fix",
        when(col("__s").isNotNull, lit(SCALE / nS)).otherwise(lit(0L)))
      .select("__nid", "pr_fix")
    for (_ <- 1 to iters) {
      val msgs = ge
        .join(pr.select(col("__nid").as("__src"), col("pr_fix")), "__src")
        .join(od, "__src")
        .select(col("__dst").as("__nid"),
          expr("((pr_fix * 85) div 100) div __od").as("__c"))
        .groupBy("__nid").agg(sum("__c").as("__m"))
      pr = Caches.localCheckpointTracked(
        nodeF.join(isSeed, Seq("__nid"), "left")
          .join(msgs, Seq("__nid"), "left")
          .select(col("__nid"),
            (when(col("__s").isNotNull, lit(base)).otherwise(lit(0L)) +
              coalesce(col("__m"), lit(0L))).as("pr_fix")))
    }
    pr.select(col("__nid").as(idCol), col("pr_fix"),
      round(col("pr_fix").cast("double") / lit(1e12), 6).as("pr"))
  }

  /** LINK-PREDICTION scores for candidate pairs — the dup-CONFIDENCE
    * features (Liben-Nowell & Kleinberg 2003): two documents whose
    * NEIGHBORHOODS agree are near-dups with structural corroboration
    * beyond their own cosine. For each (a, b) in `pairs` (the
    * [[mutualKnnPairs]] canonical shape) over the directed top-k edge
    * frame:
    *
    *  - `cn`      = |N(a) ∩ N(b) \ {a,b}| — common third parties;
    *  - `jaccard` = cn / (|N(a)\{b}| + |N(b)\{a}| − cn); mutual pairs
    *    always contain each other, so the sizes are out-degree − 1;
    *    NULL when the union is empty;
    *  - `aa_fix`  = Σ_z ⌊10⁹ / ln(1 + deg_in(z))⌋ — the SMOOTHED
    *    Adamic–Adar (1 + deg avoids the ln(1) pole): hubs corroborate
    *    less. Floors sum order-free; ln on integer-derived doubles is
    *    the proven bit-identical x48/x52 convention.
    *
    * One (pair × neighborhood) equi-join chain — candidates = Σ over
    * pairs of deg(a), never n² — plus two degree frames. Harness query
    * x105 replays every count, the ln floors, and both divisions. */
  def linkScores(pairs: DataFrame, edges: DataFrame,
                 srcCol: String = "src_id",
                 dstCol: String = "nbr_id"): DataFrame = {
    val e = Caches.localCheckpointTracked(
      edges.select(col(srcCol).as("__s"), col(dstCol).as("__d")))
    val dout = e.groupBy(col("__s")).agg(count(lit(1)).as("__dout"))
    val din = e.groupBy(col("__d")).agg(count(lit(1)).as("__din"))
    // pairs feeds the common-neighbor join AND the final left join —
    // eager so a composed pair build (e.g. mutual-kNN) runs once
    val p = Caches.localCheckpointTracked(
      pairs.select(col("a_id"), col("b_id")))
    val com = p
      .join(e.select(col("__s").as("a_id"), col("__d").as("__z")), "a_id")
      .join(e.select(col("__s").as("b_id"), col("__d").as("__z")),
        Seq("b_id", "__z"))
      .filter(col("__z") =!= col("a_id") && col("__z") =!= col("b_id"))
    val agg = com
      .join(din.select(col("__d").as("__z"), col("__din")), "__z")
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("cn"),
        sum(floor(lit(1e9) / log((col("__din") + lit(1L)).cast("double")))
          .cast("long")).as("aa_fix"))
    p.join(agg, Seq("a_id", "b_id"), "left")
      .join(dout.select(col("__s").as("a_id"), col("__dout").as("__da")), "a_id")
      .join(dout.select(col("__s").as("b_id"), col("__dout").as("__db")), "b_id")
      .select(col("a_id"), col("b_id"),
        coalesce(col("cn"), lit(0L)).as("cn"),
        when(col("__da") - 1 + col("__db") - 1 -
            coalesce(col("cn"), lit(0L)) > 0,
          round(coalesce(col("cn"), lit(0L)).cast("double") /
            (col("__da") - 1 + col("__db") - 1 -
              coalesce(col("cn"), lit(0L))), 6)).as("jaccard"),
        coalesce(col("aa_fix"), lit(0L)).as("aa_fix"),
        round(coalesce(col("aa_fix"), lit(0L)).cast("double") / lit(1e9), 6)
          .as("aa"))
  }

  /** EIGENVECTOR centrality by fixed-point power iteration — the other
    * classic centrality next to [[pageRank]]: no teleport, no
    * out-degree split — a node is central in proportion to the
    * centrality MASS of the nodes pointing at it, so tight mutual
    * communities light up while PageRank's teleport floor hides them.
    * Integer semantics, exactly replayable:
    *
    *   x₀[v]  = 10⁶
    *   y[v]   = Σ_{(u→v) ∈ E} x[u]          (exact long sums)
    *   x'[v]  = (y[v]·10⁶) div max_w y[w]    (max-norm, BIGINT floor div)
    *
    * Max-norm instead of L2 keeps every step in integers (no sqrt);
    * all values are non-negative so Spark's `div` and DuckDB's `//`
    * agree; y ≤ n·10⁶ and y·10⁶ ≤ n·10¹² stay far under 2⁶³. Nodes
    * with no in-edges decay to exactly 0. Per iteration: one edge
    * equi-join + node-sized sum + a 1-row max broadcast — the
    * [[pageRank]] scale shape. Returns (idCol, eig_fix, eig) after
    * `iters` rounds; harness query x103 replays each round. */
  def eigenCentrality(edges: DataFrame, nodes: DataFrame, idCol: String,
                      srcCol: String = "src_id", dstCol: String = "nbr_id",
                      iters: Int = 8): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // eager, like [[pageRank]]: a lazy edge persist re-derives the graph
    // build in every round's join/aggregate job
    val ge = Caches.localCheckpointTracked(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")))
    val nodeF = nodes.select(col(idCol).as("__nid"))
    // each round is EAGERLY checkpointed (the x98 lesson — a lazy
    // persist loop re-enters its whole history through every round's
    // aggregate and blows the heap at 8 levels); the max is a 1-row
    // driver scalar (the nProbe-cells convention)
    var x = Caches.localCheckpointTracked(
      nodeF.withColumn("xv", lit(1000000L)))
    for (_ <- 1 to iters) {
      val y = Caches.localCheckpointTracked(ge
        .join(x.select(col("__nid").as("__src"), col("xv")), "__src")
        .groupBy(col("__dst").as("__nid"))
        .agg(sum("xv").as("yv")))
      val mv = y.agg(max("yv")).head().getLong(0)
      x = Caches.localCheckpointTracked(
        nodeF.join(y, Seq("__nid"), "left")
          .select(col("__nid"),
            coalesce(expr(s"(yv * 1000000) div ${mv}L"), lit(0L)).as("xv")))
    }
    x.select(col("__nid").as(idCol), col("xv").as("eig_fix"),
      round(col("xv").cast("double") / lit(1e6), 6).as("eig"))
  }

  /** Per-node TRIANGLE counts + local clustering coefficient over an
    * UNDIRECTED canonical edge frame (a_id < b_id, unique rows — the
    * [[mutualKnnPairs]] output shape): the standard community-density
    * signal — a near-dup neighborhood whose members are also mutual
    * neighbors of EACH OTHER is a tight duplicate community; a hub
    * with zero triangles is a lexical/semantic crossroads. The classic
    * distributed formulation: enumerate wedges x−y−z with x < y < z
    * (each edge pair joins once because edges are canonical), close
    * them with a semi-join back to the edge frame — every triangle
    * counted exactly once — then explode the three corners into
    * per-node counts. Two equi-joins + one count; candidates =
    * Σ_y deg²(y), the wedge volume, never n².
    *
    * Returns (idCol, degree, n_tri, clustering) for every node with ≥1
    * edge; clustering = round(2·n_tri / (deg·(deg−1)), 6) — exact
    * integer operands into one IEEE division — NULL for degree-1 nodes
    * (undefined, not 0). Harness query x102 replays wedges, closure,
    * corner counts and the coefficient in SQL. */
  def triangleCounts(pairs: DataFrame, idCol: String = "vec_id"): DataFrame = {
    // four consumers (two wedge sides, the semi-join probe, degrees) —
    // eager so a composed pair build runs once
    val e = Caches.localCheckpointTracked(
      pairs.select(col("a_id"), col("b_id")))
    val wedges = e.select(col("a_id").as("__x"), col("b_id").as("__y"))
      .join(e.select(col("a_id").as("__y"), col("b_id").as("__z")), "__y")
    val tris = wedges
      .join(e.select(col("a_id").as("__x"), col("b_id").as("__z")),
        Seq("__x", "__z"), "left_semi")
    val cnt = tris
      .select(explode(array(col("__x"), col("__y"), col("__z"))).as("__id"))
      .groupBy("__id").agg(count(lit(1)).as("n_tri"))
    val deg = e.select(col("a_id").as("__id"))
      .unionAll(e.select(col("b_id").as("__id")))
      .groupBy("__id").agg(count(lit(1)).as("degree"))
    deg.join(cnt, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("degree") >= 2, round(lit(2.0) *
          coalesce(col("n_tri"), lit(0L)) /
          (col("degree") * (col("degree") - lit(1L))), 6)).as("clustering"))
  }

  /** GRAPH-BOOSTED retrieval — text search re-ranked by a graph walk:
    * BM25 retrieves seed documents for the term query, personalized
    * PageRank diffuses relevance from those seeds through the
    * similarity graph (surfacing docs that never MATCH the terms but
    * sit in the seeds' neighborhood — the classic vocabulary-mismatch
    * fix, sibling of x96's term-side expansion), and reciprocal-rank
    * fusion combines the two lists ([[Retrieval.rrfFix]]'s exact
    * integer convention, x65). Requires docs and the graph to share
    * one id space (the x65 doc_id ≡ vec_id convention).
    *
    * Determinism: BM25 ranks on the exact ⌊s·10⁹⌋ key; the walk is
    * [[personalizedPageRank]]'s pure integer arithmetic (zero-mass
    * nodes are EXCLUDED before ranking — a sea of zeros would rank by
    * bare id); both rank windows run over pre-cut ≤ kCand rows (the
    * x65 rank-preserving pre-cut). Harness query x100 replays the
    * full composition: restricted-corpus BM25, seeds, the seed-gated
    * fixed-point walk, both rank lists, the floor-of-one-IEEE-division
    * fusion. */
  def graphBoostedTopK(docs: DataFrame, graph: DataFrame, nodes: DataFrame,
                       docIdCol: String, textCol: String, idCol: String,
                       terms: Seq[String], k: Int = 10, kCand: Int = 20,
                       fbDocs: Int = 5, iters: Int = 5): DataFrame = {
    val bagg = Retrieval.bm25Scored(docs, docIdCol, textCol, terms)
    val trank = Caches.localCheckpointTracked(bagg
      .orderBy(col("score_fix").desc, col(docIdCol).asc).limit(kCand)
      .withColumn("t_rank", row_number().over(Window
        .orderBy(col("score_fix").desc, col(docIdCol).asc)))
      .select(col(docIdCol).as(idCol), col("t_rank")))
    val seeds = trank.filter(col("t_rank") <= fbDocs).select(col(idCol))
    val vrank = personalizedPageRank(graph, nodes, seeds, idCol,
        iters = iters)
      .filter(col("pr_fix") > 0)
      .orderBy(col("pr_fix").desc, col(idCol).asc).limit(kCand)
      .withColumn("v_rank", row_number().over(Window
        .orderBy(col("pr_fix").desc, col(idCol).asc)))
      .select(col(idCol), col("v_rank"))
    trank.join(vrank, Seq(idCol), "full_outer")
      .withColumn("rrf_fix",
        coalesce(Retrieval.rrfFix(col("t_rank")), lit(0L)) +
          coalesce(Retrieval.rrfFix(col("v_rank")), lit(0L)))
      .orderBy(col("rrf_fix").desc, col(idCol).asc).limit(k)
      .select(col(idCol), col("t_rank"), col("v_rank"), col("rrf_fix"),
        round(col("rrf_fix").cast("double") / lit(1e12), 6).as("rrf"))
      .orderBy(col("rrf_fix").desc, col(idCol).asc)
  }

  /** Synchronous label propagation from a CLAMPED seed set — the
    * semi-supervised tagging move: a small labeled subset (human
    * audit, an expensive classifier run) spreads through the k-NN
    * graph so every document inherits its neighborhood's majority
    * label. Seeds never change; an unlabeled node takes the majority
    * label of its labeled out-neighbors (count DESC, label ASC
    * tie-break — integer-deterministic), keeps its previous label when
    * no neighbor is labeled this round, and stays NULL until label
    * mass reaches it.
    *
    * `seeds` is a node frame (idCol, labelCol) where non-seeds carry
    * NULL. Labels flow FROM a node's out-neighbors; for the standard
    * undirected-LPA behavior pass the symmetrized edge frame (edges ∪
    * reversed — OpsSpec's planted-cluster quality spec does, recovering
    * 100% of a 5-cluster plant from 20% seeds in 3 rounds). Per
    * iteration: one edge-join against the current |V|-sized
    * label frame, one (node, label) count, one majority window —
    * counts combine map-side; the majority window partitions by node
    * (≤ k rows each). Returns (idCol, labelCol, origin ∈ {'seed',
    * 'prop', NULL}). Harness query x94 replays `iters` unrolled
    * majority CTEs over the x68 banded graph. */
  def labelPropagate(edges: DataFrame, seeds: DataFrame, idCol: String,
                     labelCol: String, srcCol: String = "src_id",
                     dstCol: String = "nbr_id", iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // eager, like [[pageRank]]: a lazy edge persist re-derives the graph
    // build in every round's broadcast job
    val ge = Caches.localCheckpointTracked(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")))
    var st = seeds.select(col(idCol).as("__nid"),
      col(labelCol).as("__seed"), col(labelCol).as("__cur"))
    for (_ <- 1 to iters) {
      val best = ge
        .join(st.select(col("__nid").as("__dst"), col("__cur").as("__nlbl")),
          "__dst")
        .filter(col("__nlbl").isNotNull)
        .groupBy(col("__src"), col("__nlbl"))
        .agg(count(lit(1)).as("__cnt"))
        .withColumn("__rk", row_number().over(Window.partitionBy("__src")
          .orderBy(col("__cnt").desc, col("__nlbl").asc)))
        .filter(col("__rk") === 1)
        .select(col("__src").as("__nid"), col("__nlbl").as("__maj"))
      st = Caches.localCheckpointTracked(
        st.join(best, Seq("__nid"), "left")
          .select(col("__nid"), col("__seed"),
            coalesce(col("__seed"), col("__maj"), col("__cur")).as("__cur")))
    }
    st.select(col("__nid").as(idCol), col("__cur").as(labelCol),
      when(col("__seed").isNotNull, lit("seed"))
        .when(col("__cur").isNotNull, lit("prop")).as("origin"))
  }

  /** k-CORE decomposition by bounded peeling (the x93 fixed-round
    * discipline): starting from the undirected pair set, repeatedly
    * drop every node whose remaining degree is < k together with its
    * incident edges — after `rounds` rounds the survivors approximate
    * the k-core. A FIXED round count is a bounded peel, NOT the
    * fixpoint in general: a deep peeling chain (each round unlocking
    * the next removal) needs up to |V| rounds, so on such graphs the
    * result is a superset of the true k-core (exact once a round
    * removes nothing — peeling is monotone, so extra rounds never
    * oscillate; on the x112 fixture 4 rounds do converge). `rounds` IS
    * the dial: raise it — or call [[kCoreExact]], which loops until a
    * round's edge count stops changing — when the exact core matters
    * more than a bounded round budget. The k-core is the
    * graph-curation notion of a DENSE duplicate/community region —
    * stricter than connected components (x16), looser than triangles
    * (x102).
    *
    * Per round: one node-keyed degree count over the remaining edges +
    * two semi-joins to keep edges with both endpoints alive — all
    * shuffles on node ids, counts combine map-side, never node × node.
    * Each round's edge frame LOCAL-CHECKPOINTS (not merely persists):
    * round r's plan references round r−1 twice (degree + the edge
    * filter), so an un-truncated lineage doubles per round — the x103
    * exponential-plan lesson, Catalyst edition. Returns one
    * row per endpoint of the surviving edge set: (idCol, core_deg —
    * the node's degree inside the surviving subgraph; before
    * convergence a node freshly dropped below k can still appear — the
    * next round would peel it). Harness query x112 replays `rounds`
    * unrolled peel CTEs over the mutual graph. */
  def kCore(pairs: DataFrame, k: Int, rounds: Int,
            idCol: String = "vec_id"): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1, rounds >= 1: k=$k rounds=$rounds")
    // scoped checkpoints: round N's blocks free as soon as round N+1
    // materializes, so the loop holds ONE edge copy, not rounds+1; the
    // final round outlives the loop inside the returned plan → adopt
    var h = Caches.localCheckpointScoped(
      pairs.select(col("a_id").as("__a"), col("b_id").as("__b")))
    try {
      for (_ <- 1 to rounds) {
        val e = h.df
        val deg = e.select(col("__a").as("__id"))
          .unionAll(e.select(col("__b").as("__id")))
          .groupBy("__id").agg(count(lit(1)).as("__deg"))
        val alive = deg.filter(col("__deg") >= k).select("__id")
        val next = Caches.localCheckpointScoped(e
          .join(alive.withColumnRenamed("__id", "__a"), Seq("__a"), "left_semi")
          .join(alive.withColumnRenamed("__id", "__b"), Seq("__b"), "left_semi"))
        h.release()
        h = next
      }
    } catch {
      // a mid-loop job failure must not strand the live round's blocks:
      // scoped checkpoints are registered nowhere until adopt()
      case t: Throwable => h.release(); throw t
    }
    val e = Caches.adopt(h)
    e.select(col("__a").as("__id"))
      .unionAll(e.select(col("__b").as("__id")))
      .groupBy("__id").agg(count(lit(1)).as("core_deg"))
      .select(col("__id").as(idCol), col("core_deg"))
  }

  /** EXACT k-core: peel until a round removes no edge (the fixpoint
    * [[kCore]]'s bounded budget approximates from above), capped at
    * `maxRounds` as a runaway guard. Peeling is monotone, so the stop
    * test is one cheap `count()` per round over the round's ALREADY
    * materialized local checkpoint (no extra job) — when the count
    * holds, every remaining degree is >= k and the loop exits with the
    * true core. Deep peeling chains (each round unlocking the next
    * removal) need up to |V| rounds in theory; in practice cores
    * stabilize in a handful, so the driver-side round loop stays short
    * — the same iterate-with-truncation discipline as PageRank.
    * Throws if `maxRounds` rounds pass without convergence (a bounded
    * ANSWER would silently be a superset; callers wanting that
    * tradeoff call [[kCore]], which prices it in its contract). */
  def kCoreExact(pairs: DataFrame, k: Int, maxRounds: Int = 64,
                 idCol: String = "vec_id"): DataFrame = {
    require(k >= 1 && maxRounds >= 1,
      s"need k >= 1, maxRounds >= 1: k=$k maxRounds=$maxRounds")
    var h = Caches.localCheckpointScoped(
      pairs.select(col("a_id").as("__a"), col("b_id").as("__b")))
    try {
      var prev = h.df.count()
      var converged = prev == 0L
      var round = 0
      while (!converged && round < maxRounds) {
        round += 1
        val e = h.df
        val deg = e.select(col("__a").as("__id"))
          .unionAll(e.select(col("__b").as("__id")))
          .groupBy("__id").agg(count(lit(1)).as("__deg"))
        val alive = deg.filter(col("__deg") >= k).select("__id")
        val next = Caches.localCheckpointScoped(e
          .join(alive.withColumnRenamed("__id", "__a"), Seq("__a"), "left_semi")
          .join(alive.withColumnRenamed("__id", "__b"), Seq("__b"), "left_semi"))
        val n = next.df.count()
        h.release()
        h = next
        converged = n == prev || n == 0L
        prev = n
      }
      require(converged,
        s"k-core did not converge within $maxRounds rounds (raise maxRounds)")
    } catch {
      case t: Throwable => h.release(); throw t
    }
    val e = Caches.adopt(h)
    e.select(col("__a").as("__id"))
      .unionAll(e.select(col("__b").as("__id")))
      .groupBy("__id").agg(count(lit(1)).as("core_deg"))
      .select(col("__id").as(idCol), col("core_deg"))
  }
}
