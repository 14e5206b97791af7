package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks (ScalaCheck generators, fixed seed → fully
  * deterministic) of the ALGEBRAIC invariants the dedup/sketch operators
  * rest on — the laws hold for arbitrary inputs, not just the fixture:
  *
  *  - MinHash is a min-semilattice homomorphism: sig(A ∪ B) =
  *    elementwise-min(sig(A), sig(B)). This is exactly why the group
  *    sketch (min-union of per-row signatures) equals the signature of
  *    the group's distinct gram union — both hash families.
  *  - SimHash is a multiset invariant: token order cannot change the
  *    fingerprint (votes are a commutative sum).
  *  - blockDedup conserves content: every distinct block survives exactly
  *    once corpus-wide, only original blocks appear, and each doc keeps
  *    its surviving blocks in original order.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("4")

  private val alphabet = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("pq code pack/unpack is the identity on arbitrary K<=256 code arrays") {
    import spark.implicits._
    val codesGen = Gen.listOfN(8, Gen.choose(0, 255))
    val rows = (1 to 60).map(i => sample(codesGen, i * 31L))
    val df = rows.toDF("codes")
      .select(col("codes"),
        graft.ops.Similarity.pqUnpackCodes(
          graft.ops.Similarity.pqPackCodes(col("codes"))).as("back"))
    assert(df.filter(col("codes") =!= col("back")).count() == 0,
      "pack then unpack must reproduce every code array exactly")
    // and the packed form is exactly one byte per code
    assert(df.select(length(graft.ops.Similarity.pqPackCodes(col("codes"))))
      .distinct().collect().map(_.getInt(0)).toSeq == Seq(8))
  }

  test("autoCellCount: deterministic, floored at 4, monotone in corpus size") {
    import spark.implicits._
    def k(n: Int): Int = graft.ops.Similarity.autoCellCount(
      (1 to n).toDF("vec_id"))
    assert(k(1) == 4 && k(50) == 4, "small corpora must floor at 4 cells")
    val sizes = Seq(100, 500, 2000, 20000)
    val ks = sizes.map(k)
    assert(ks == ks.sorted, s"k must be monotone in n: $ks")
    assert(k(20000) == 49, "the measured x10 optimum (k=49 at n=20000) moved")
    assert(k(500) == k(500), "count-derived dial must be deterministic")
  }

  test("minhash: sig(A union B) == elementwise min(sig(A), sig(B)), both families") {
    import spark.implicits._
    val setGen = Gen.listOfN(12, Gen.listOfN(3, alphabet).map(_.mkString(" ")))
      .map(_.distinct)
    val pairs = (1 to 30).map { i =>
      (sample(setGen, i * 7L), sample(setGen, i * 13L + 1))
    }
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        array_distinct(concat(col("a"), col("b"))).as("u"))
    val checked = df.select(
      (Dedup.minhashSignature(col("u"), 32) ===
        zip_with(Dedup.minhashSignature(col("a"), 32),
          Dedup.minhashSignature(col("b"), 32), (x, y) => least(x, y))).as("fast_ok"),
      (Dedup.portableMinhashSignature(col("u"), 32) ===
        zip_with(Dedup.portableMinhashSignature(col("a"), 32),
          Dedup.portableMinhashSignature(col("b"), 32), (x, y) => least(x, y))).as("port_ok"))
      .collect()
    assert(checked.forall(r => r.getBoolean(0) && r.getBoolean(1)))
  }

  test("simhash: token order never changes the fingerprint") {
    import spark.implicits._
    val toksGen = Gen.listOfN(20, alphabet)
    val rows = (1 to 30).map { i =>
      val toks = sample(toksGen, i * 31L)
      (toks, new scala.util.Random(i).shuffle(toks))
    }
    val checked = rows.toDF("t", "s")
      .select((Dedup.simhash63(col("t")) === Dedup.simhash63(col("s"))).as("ok"))
      .collect()
    assert(checked.forall(_.getBoolean(0)))
  }

  test("blockDedup: conservation — every distinct block survives exactly once, in doc order") {
    import spark.implicits._
    // tiny alphabet + short blocks force heavy cross-doc block collisions
    val docGen = Gen.listOfN(12, alphabet).map(_.mkString(" "))
    val docs = (1 to 40).map(i => (i.toLong, sample(docGen, i * 101L)))
      .toDF("doc_id", "text")
    val out = Dedup.blockDedup(docs, "doc_id", "text", blockTokens = 4)
      .as[(Long, String, Long)].collect()
    def blocksOf(text: String): Seq[String] =
      text.split(" ").grouped(4).map(_.mkString(" ")).toSeq
    val inputBlocks = (1 to 40).flatMap(i => blocksOf(sample(docGen, i * 101L)))
    val outputBlocks = out.flatMap { case (_, t, _) => blocksOf(t) }
    // exactly-once corpus-wide, nothing invented, nothing lost
    assert(outputBlocks.distinct.length == outputBlocks.length,
      "a block survived twice")
    assert(outputBlocks.toSet == inputBlocks.toSet,
      "survivor set must equal the distinct input block set")
    // n_blocks bookkeeping matches the reassembled text, and each doc's
    // survivors appear in their original relative order (subsequence)
    out.foreach { case (id, t, n) =>
      val got = blocksOf(t)
      assert(got.length == n)
      val orig = blocksOf(sample(docGen, id * 101L))
      val it = orig.iterator
      assert(got.forall(b => it.contains(b)),
        s"doc $id: $got is not an in-order subsequence of $orig")
    }
  }

  test("prefix jaccard join == brute force on arbitrary corpora, any threshold") {
    import spark.implicits._
    // tiny alphabet + short docs force shared tokens, near-threshold
    // pairs and empty/degenerate docs — the full PPJoin candidate rule
    // (prefix + length + positional) must stay EXACT on all of them
    val docGen = Gen.chooseNum(0, 8)
      .flatMap(n => Gen.listOfN(n, alphabet)).map(_.mkString(" "))
    for (seed <- 1 to 2; (tn, td) <- Seq((1, 2), (3, 5), (4, 5))) {
      val corpus = (1 to 25).map(i => (i.toLong, sample(docGen, seed * 7919L + i)))
      val out = Dedup.prefixJaccardJoin(corpus.toDF("id", "text"),
          "id", "text", tauNum = tn, tauDen = td)
        .select("id_a", "id_b", "inter", "uni")
        .as[(Long, Long, Long, Long)].collect().toSet
      val sets = corpus.map(p => p._1 -> p._2.split(" ").filter(_.nonEmpty).toSet).toMap
      val brute = (for {
        a <- sets.keys; b <- sets.keys if a < b
        inter = (sets(a) & sets(b)).size
        uni = (sets(a) | sets(b)).size
        if uni > 0 && inter * td >= uni * tn
      } yield (a, b, inter.toLong, uni.toLong)).toSet
      assert(out == brute,
        s"seed=$seed tau=$tn/$td: ${out.diff(brute)} vs missing ${brute.diff(out)}")
    }
    graft.ops.Caches.releaseAll()
  }

  test("scd2 fold law holds on arbitrary snapshot stacks") {
    import spark.implicits._
    // random presence (gaps, late adds, disappearances) and random
    // payload churn over 5 versions: folding one version at a time
    // through scd2Apply must equal the full build — the incremental
    // load is exact on ANY history, not just the fixture
    for (seed <- 1 to 3) {
      val rows = for {
        id <- 1L to 8L
        v <- 0 to 4
        if sample(Gen.chooseNum(0, 9), seed * 10007L + id * 31 + v) < 7
      } yield (id, v, sample(alphabet, seed * 104729L + id * 17 + v * 3))
      val snaps = rows.toDF("id", "version", "payload")
      def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
        (r.getLong(0), r.getInt(1),
          if (r.isNullAt(2)) -1 else r.getInt(2),
          r.getBoolean(3), r.getString(4))).toSet
      val full = graft.ops.Scd.buildScd2(snaps, "id", "version", Seq("payload"))
      val folded = (1 to 4).foldLeft(
        graft.ops.Scd.buildScd2(snaps.filter(col("version") === 0),
          "id", "version", Seq("payload"))) { (h, v) =>
        graft.ops.Scd.scd2Apply(h, snaps.filter(col("version") === v),
          "id", "version", Seq("payload"))
      }
      assert(rowsOf(folded) == rowsOf(full), s"seed=$seed fold law broke")
    }
  }

  test("materializeCtes: plain CTEs fenced exactly once, recursive members untouched") {
    val sql =
      """WITH RECURSIVE h AS (
        |  SELECT 1 AS x),
        |bands AS (SELECT x, x * 2 AS y FROM h),
        | u2 AS (SELECT * FROM bands),
        |walk(id, reach) AS (
        |  SELECT x, x FROM h
        |  UNION
        |  SELECT w.id, b.y FROM walk w JOIN bands b ON w.reach = b.x)
        |SELECT * FROM walk""".stripMargin
    val out = graft.queries.Ext.materializeCtes(sql)
    // every bare-name CTE gets exactly one fence; CAST(... AS ...) and
    // aliases (x * 2 AS y) never match (the pattern needs ` AS (`)
    assert(out.contains("WITH RECURSIVE h AS MATERIALIZED ("), out)
    assert(out.contains("bands AS MATERIALIZED ("), out)
    assert(out.contains("u2 AS MATERIALIZED ("), out)
    // the recursive member keeps its column list and is NOT fenced
    // (DuckDB rejects MATERIALIZED on recursive CTEs)
    assert(out.contains("walk(id, reach) AS ("), out)
    assert(!out.contains("walk(id, reach) AS MATERIALIZED"), out)
    assert("AS MATERIALIZED \\(".r.findAllIn(out).size == 3, out)
    // idempotence: a second pass finds nothing left to fence
    assert(graft.queries.Ext.materializeCtes(out) == out)
  }
}
