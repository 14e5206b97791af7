package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions surface: the native vector expressions are
  * callable from plain SQL in any GraftSession-built session, and the
  * SQL path produces bit-identical results to the Column API (same
  * codegen'd expression underneath). */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("4")
  val dir = "/root/testdata/sf0.001"

  test("dot_product / vec_norm / cosine_sim resolve in plain SQL") {
    val r = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vec_norm(array(3.0D, 4.0D)) AS n,
        |       round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 9) AS c
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 1.0)
  }

  test("rhp_bands / simhash63 / minhash_sig resolve in plain SQL, equal the Column API") {
    val emb = Tables.embeddings(spark, dir)
    emb.createOrReplaceTempView("emb_ext")
    val sqlBands = spark.sql(
      """SELECT vec_id, rhp_bands(CAST(embedding AS array<double>), 4, 8, 64) AS b
        |FROM emb_ext ORDER BY vec_id LIMIT 5""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    val apiBands = emb
      .select(col("vec_id"), graft.functions.VectorExpressions
        .rhpBandsNative(col("embedding"), 4, 8, 64).as("b"))
      .orderBy("vec_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    assert(sqlBands == apiBands)
    val r = spark.sql(
      """SELECT simhash63(array('a', 'b')) AS s,
        |       minhash_sig(array('x y z'), 8, true) AS mp,
        |       minhash_sig(array('x y z'), 8, false) AS mf""".stripMargin).head()
    val api = spark.range(1).select(
      graft.ops.Dedup.simhash63(typedLit(Seq("a", "b"))).as("s"),
      graft.ops.Dedup.portableMinhashSignature(typedLit(Seq("x y z")), 8).as("mp"),
      graft.ops.Dedup.minhashSignature(typedLit(Seq("x y z")), 8).as("mf")).head()
    assert(r.getLong(0) == api.getLong(0))
    assert(r.getSeq[Long](1) == api.getSeq[Long](1))
    assert(r.getSeq[Long](2) == api.getSeq[Long](2))
    val bpe = spark.sql(
      "SELECT bpe_token_count('the streaming engine keeps streaming') AS n").head()
    assert(bpe.getInt(0) ==
      graft.ops.Bpe.tokenCount("the streaming engine keeps streaming"))
  }

  test("pq_codes resolves in plain SQL and equals the Column API") {
    val emb = Tables.embeddings(spark, dir).filter(col("vec_id") =!= 0)
    emb.createOrReplaceTempView("emb_pq")
    val cb = graft.ops.Similarity.pqBuildCodebook(emb, "embedding", "vec_id")
    // 'D' suffix: parse each component directly as a DOUBLE literal
    // (bare decimals would parse as DECIMAL first); Scala's shortest-
    // roundtrip toString guarantees the parsed value is bit-identical
    val flatSql = cb.flatten.map(d => s"${d}D").mkString("array(", ", ", ")")
    val sqlCodes = spark.sql(
      s"""SELECT vec_id, pq_codes(CAST(embedding AS array<double>),
         |  CAST($flatSql AS array<double>), 16, 8, 64) AS c
         |FROM emb_pq ORDER BY vec_id LIMIT 10""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    val apiCodes = graft.ops.Similarity.pqEncode(emb, "embedding", "vec_id", cb)
      .select(col("vec_id"), col("codes"))
      .orderBy("vec_id").limit(10)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    assert(sqlCodes == apiCodes, s"SQL/API code divergence")
  }

  test("SQL cosine top-k over embeddings equals the Column-API top-k bit-for-bit") {
    val emb = Tables.embeddings(spark, dir)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val qv = Seq.tabulate(dim)(i => 0.01 * (i + 1))
    emb.createOrReplaceTempView("emb_sql")
    val qArr = qv.map(v => s"${v}D").mkString("array(", ", ", ")")
    val sql = spark.sql(
      s"""SELECT vec_id, round(cosine_sim(CAST(embedding AS array<double>), $qArr), 6) AS cos_sim
         |FROM emb_sql ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val api = graft.ops.Similarity.topKCosine(emb, "embedding", "vec_id", qv, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sql == api, s"sql=$sql api=$api")
  }

  test("full-cache joins broadcast even with auto-broadcast disabled (injected rule)") {
    import spark.implicits._
    val server = new graft.sources.http.testkit.EmbeddedJsonServer
    try {
      server.payload = """[{"id":1,"name":"a"},{"id":2,"name":"b"}]"""
      val users = spark.read.format("http-full-cache")
        .schema("id INT, name STRING").option("url", server.url).load()
      val probe = (1 to 100).map(i => (i % 3, i.toDouble)).toDF("user_id", "amount")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        // statistics can no longer trigger a broadcast; only the injected
        // BroadcastFullCacheJoins rule can — the cache side must still
        // broadcast, and the probe side must never shuffle
        val joined = probe.join(users, probe("user_id") === users("id"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin"), s"no broadcast in plan:\n$plan")
        assert(!plan.contains("SortMergeJoin"), s"probe side shuffled:\n$plan")
        assert(joined.count() == 67) // i%3 ∈ {1,2} matches ids 1,2
        // control: a plain join must NOT broadcast under threshold -1,
        // proving it's the rule (not stats) that forced the hint above
        val a = Tables.nation(spark, "/root/testdata/sf0.001").select("n_nationkey")
        val b = Tables.region(spark, "/root/testdata/sf0.001")
          .select(col("r_regionkey").as("n_nationkey"))
        val ctrl = a.join(b, "n_nationkey").queryExecution.executedPlan.toString
        assert(!ctrl.contains("BroadcastHashJoin"), s"control broadcast leaked:\n$ctrl")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally server.stop()
  }

  test("broadcast rule guards: mixed sides not hinted, pinned strategies win") {
    import spark.implicits._
    val server = new graft.sources.http.testkit.EmbeddedJsonServer
    try {
      server.payload = """[{"id":1,"name":"a"},{"id":2,"name":"b"}]"""
      val users = spark.read.format("http-full-cache")
        .schema("id INT, name STRING").option("url", server.url).load()
      val probe = (1 to 100).map(i => (i % 3, i.toDouble)).toDF("user_id", "amount")
      val facts = (1 to 100).map(i => (i % 3, i)).toDF("id", "n")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        // a side that merely CONTAINS a cache scan (joined below with a
        // non-cache table) must not be broadcast by the rule
        val mixed = users.join(facts, "id")
        val plan = probe.join(mixed, probe("user_id") === mixed("id"))
          .queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"outer join with mixed side should not broadcast:\n$plan")
        // a user-pinned strategy on the cache side is respected
        val pinned = probe.join(users.hint("merge"),
          probe("user_id") === users("id"))
        val pinnedPlan = pinned.queryExecution.executedPlan.toString
        assert(pinnedPlan.contains("SortMergeJoin"),
          s"user-pinned merge hint must win over the rule:\n$pinnedPlan")
        assert(pinned.count() == 67)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally server.stop()
  }

  test("null inputs propagate as null through the injected functions") {
    val r = spark.sql(
      "SELECT dot_product(CAST(NULL AS array<double>), array(1.0D)) AS d").head()
    assert(r.isNullAt(0))
  }
}
