package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.Tables.{davg, dsum}

/** SURVEY.md §2.B relational capability surface: projection/filter/scalar,
  * joins (inner/left/semi/anti), aggregation (hash agg, distinct,
  * rollup/cube/grouping sets), windows, sort/limit, set ops, JSON scalar.
  * Each query has a DuckDB oracle in [[oracle]] with identical aliases and
  * deterministic ordering (see Tables for the parity rules).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // -- TPC-H Q1-style grouped aggregation: partial agg map-side, 2 groups,
    //    decimal-exact sums (ref: table-stakes agg surface, SURVEY §2.B).
    "q01_pricing_summary" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // -- Filter + projection; predicate and column pruning reach the scan.
    "q02_filter_project" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // -- Inner equi-join + agg (customer is the smaller side; at cluster
    //    scale orders shuffles on o_custkey, customer broadcasts).
    "q03_revenue_by_segment" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(dsum(col("o_totalprice")).as("revenue"),
             count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    },

    // -- Multi-way join through a dimension chain (nation, region are tiny:
    //    always broadcast; only orders⋈customer shuffles at scale).
    "q04_nation_revenue" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("r_name", "n_name")
    },

    // -- LEFT OUTER join preserving customers with no orders (the reference's
    //    core LEFT lookup-join shape, README.md:57-64).
    "q05_cust_order_stats" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
             coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
        .orderBy("c_custkey")
    },

    // -- LEFT SEMI join (EXISTS).
    "q06_semi_join" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 200000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // -- LEFT ANTI join (NOT EXISTS). The order side is cut to
    //    top-bracket orders (> 300000) so the result is NON-EMPTY at
    //    every test SF (VERDICT r16: an anti join of customers vs ALL
    //    orders matched nothing on the driver data, so its oracle row
    //    gated schema only — values never flowed through the hash).
    "q07_anti_join" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 300000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // -- Ranking window: top-3 orders per customer (row_number, unique
    //    tiebreak so rank is deterministic).
    "q08_topk_per_customer" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },

    // -- Analytic window: running sum over a total order within partition.
    //    l_quantity is integral-valued → running double sum is exact.
    // Window order must be TOTAL: the synthetic lineitem duplicates
    // (l_orderkey, l_linenumber) pairs (118k at sf0.1), and tied rows'
    // prefix sums are engine-order-dependent — l_quantity/l_extendedprice
    // tiebreaks make the running sum well-defined (rows still tied after
    // them have equal quantities, so their prefix-sum set is unambiguous).
    "q09_running_qty" -> { (s, dir) =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc,
          col("l_quantity").asc, col("l_extendedprice").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, dir)
        .withColumn("running_qty", sum(col("l_quantity")).over(w))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
        // running_qty completes the total order: rows tied on the three
        // keys (dup keys exist in the data) have distinct running sums
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
    },

    // -- lag/lead analytic functions over event time per user.
    "q10_event_gaps" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("prev_event", lag(col("event_id"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select("user_id", "event_id", "prev_event", "next_type")
        .orderBy("user_id", "event_id")
    },

    // -- Global sort + limit → TakeOrderedAndProject (no full sort at scale).
    "q11_top_orders" -> { (s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    // -- DISTINCT (shuffle dedup).
    "q12_distinct_segments" -> { (s, dir) =>
      Tables.customer(s, dir).select("c_mktsegment").distinct().orderBy("c_mktsegment")
    },

    // -- count(distinct) per group.
    "q13_priority_stats" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_custs"),
             count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // -- UNION (distinct) set op.
    "q14_union_nations" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      val p = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
      c.union(p).distinct().orderBy("nationkey")
    },

    // -- INTERSECT set op.
    "q15_intersect_nations" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      val p = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
      c.intersect(p).orderBy("nationkey")
    },

    // -- EXCEPT set op. The subtracted side is the nations of
    //    NEGATIVE-balance suppliers — a strict subset of all supplier
    //    nations — so the difference is NON-EMPTY at every test SF
    //    (VERDICT r16: all-suppliers covered every customer nation and
    //    the oracle row passed on 0 rows).
    "q16_except_nations" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      val p = Tables.supplier(s, dir).filter(col("s_acctbal") < 0)
        .select(col("s_nationkey").as("nationkey"))
      c.except(p).orderBy("nationkey")
    },

    // -- ROLLUP grouping hierarchy (nulls-first ordering aligned with oracle).
    "q17_rollup_flags" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // -- CUBE over two order dimensions.
    "q18_cube_status" -> { (s, dir) =>
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    // -- GROUPING SETS via the SQL surface (also exercises spark.sql).
    "q19_grouping_sets" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("graft_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus, COUNT(1) AS n
          |FROM graft_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    },

    // -- Scalar function surface: string/date/math (all codegen'd built-ins).
    "q20_scalar_funcs" -> { (s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          upper(substring(col("o_orderpriority"), 1, 3)).as("pri3"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_pri"),
          length(col("o_orderpriority")).as("pri_len"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          (col("o_orderkey") % 7).as("k7"),
          round(abs(col("o_totalprice") - 150000.0), 2).as("dist_150k"))
        .orderBy("o_orderkey")
    },

    // -- Conditional aggregation (CASE WHEN inside agg).
    "q21_case_agg" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(
          sum(when(col("o_totalprice") > 150000.0, 1L).otherwise(0L)).as("n_big"),
          sum(when(col("o_totalprice") <= 150000.0, 1L).otherwise(0L)).as("n_small"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    // -- HAVING (post-aggregation filter).
    "q22_having" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 15)
        .orderBy("o_custkey")
    },

    // -- Scalar subquery: orders 1.5× above global average price.
    "q23_above_avg" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val avgP = o.agg(avg(col("o_totalprice")).as("a"))
      o.crossJoin(broadcast(avgP))
        .filter(col("o_totalprice") > col("a") * 1.5)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // -- JSON scalar extraction from the events.props payload (the
    //    reference's whole product is JSON→rows; here as an expression).
    "q24_json_props" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("event_type")
    },

    // -- Timestamp normalization + daily aggregation over events.
    "q25_daily_events" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .groupBy("day")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("day")
    },

    // -- explode/unnest: word frequencies across documents.
    "q26_word_counts" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc)
        .limit(20)
    },

    // -- RIGHT OUTER join (probe side preserved on the right).
    "q27_right_join" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    },

    // -- FULL OUTER join of two aggregates (null-preserving both sides).
    "q28_full_outer" -> { (s, dir) =>
      val cn = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val sn = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      cn.join(sn, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    },

    // -- UNION ALL (bag semantics) + re-aggregation.
    "q29_union_all" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      val p = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
      c.union(p)
        .groupBy("nationkey")
        .agg(count(lit(1)).as("n"))
        .orderBy("nationkey")
    },

    // -- Non-equi (theta) join: range-bucket membership against a tiny
    //    dimension → BroadcastNestedLoopJoin (the only sane physical plan).
    "q30_theta_join" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      val n = Tables.nation(s, dir)
      e.join(broadcast(n),
          e("value") >= n("n_nationkey") * 10.0 &&
          e("value") < (n("n_nationkey") + 1) * 10.0, "inner")
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"), Tables.dsum(col("value")).as("sum_value"))
        .orderBy("n_name")
    },

    // -- Equi join with non-equi residual (classic shipped-after-order).
    "q31_join_residual" -> { (s, dir) =>
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey") &&
                l("l_shipdate") > o("o_orderdate"), "inner")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n_lines"),
             Tables.dsum(col("l_extendedprice")).as("revenue"))
        .orderBy("yr")
    },

    // -- from_json into a typed struct (schema-declared JSON parsing, the
    //    reference's core deserialization semantic as an expression).
    "q32_from_json" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("parsed", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .select(col("event_id"), col("parsed.k").as("k"))
        .orderBy("event_id")
    },

    // -- approx_count_distinct (HLL sketch): no oracle (sketch values are
    //    engine-specific); accuracy vs exact asserted in QueriesSmokeSpec.
    // -- HLL++ approximate distinct next to the exact count. The sketch
    //    value itself is engine-specific, so the output carries the exact
    //    count plus the bounded-error CLAIM (rsd=0.02 sketch, 5% bound) as
    //    a boolean — the driver hash goes red if the sketch ever drifts.
    "q34_approx_distinct" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_custs"),
             countDistinct(col("o_custkey")).as("exact_custs"))
        .select(col("o_orderpriority"), col("exact_custs"),
          (abs(col("approx_custs") - col("exact_custs")) <=
            greatest(lit(1L), (col("exact_custs") * 0.05).cast("long")))
            .as("approx_within_5pct"))
        .orderBy("o_orderpriority")
    },

    // -- Array function surface over the embedding column.
    "q33_array_funcs" -> { (s, dir) =>
      Tables.embeddings(s, dir)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          array_max(col("embedding")).as("mx"),
          array_min(col("embedding")).as("mn"),
          round(aggregate(col("embedding").cast("array<double>"), lit(0.0),
            (acc, x) => acc + x), 6).as("total"))
        .orderBy("vec_id")
    },

    // -- Correlated scalar subquery (Catalyst decorrelates it into a
    //    join; oracle runs the same SQL): orders at > 2x their customer's
    //    average price.
    "q39_correlated_subquery" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("graft_orders")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM graft_orders o
          |WHERE o_totalprice > (SELECT 2 * AVG(o2.o_totalprice)
          |                      FROM graft_orders o2
          |                      WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // -- Pivot (explicit value list → deterministic column set) and its
    //    CASE-aggregation oracle; count per user bucket × event type.
    "q37_pivot" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("user_bucket", (col("user_id") % 10).cast("long"))
        .groupBy("user_bucket")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0) // absent (bucket, type) pairs: 0 like the FILTER oracle
        .orderBy("user_bucket")
    },

    // -- Unpivot (wide → long): per-priority order stats melted into
    //    (metric, val) rows; oracle = UNION ALL of the measures.
    "q38_unpivot" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("double").as("n_orders"),
             Tables.dsum(col("o_totalprice")).as("total_price"))
        .unpivot(Array(col("o_orderpriority")),
          Array(col("n_orders"), col("total_price")), "metric", "val")
        .orderBy("o_orderpriority", "metric")
    },

    // -- Exact percentiles (linear interpolation — both engines compute
    //    the same continuous quantile; rounded to dodge low-bit drift).
    //    Scalar columns, not an array: the driver's oracle compare hashes
    //    pandas frames and cannot sort/hash array-typed cells.
    "q36_percentiles" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          expr("round(percentile(value, 0.25D), 6)").as("p25"),
          expr("round(percentile(value, 0.5D), 6)").as("p50"),
          expr("round(percentile(value, 0.9D), 6)").as("p90"))
        .orderBy("event_type")
    },

    // -- Distribution window functions: ntile/percent_rank/cume_dist per
    //    segment. Tie-free ordering (acctbal, custkey) so rank-derived
    //    values are deterministic in both engines.
    "q40_window_funcs" -> { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy("c_mktsegment", "c_custkey")
    },

    // -- RANGE-framed window: 30-day trailing revenue per customer. Spark
    //    ranges over epoch seconds (o_orderdate is day-granular, so the
    //    truncation is exact); the oracle uses the equivalent INTERVAL
    //    frame. Decimal sum → frame content, not accumulation order,
    //    decides the hash.
    "q41_range_window" -> { (s, dir) =>
      // NTZ has no direct long cast; NTZ→TZ is identity under the UTC
      // session timezone, then TZ→long = epoch seconds
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30L * 86400, 0)
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          round(sum(col("o_totalprice").cast("decimal(28,6)")).over(w)
            .cast("double"), 6).as("trailing_30d"))
        .orderBy("o_orderkey")
    },

    // -- EXISTS / NOT EXISTS correlated predicates (Catalyst turns them
    //    into semi/anti joins; the oracle runs the same SQL).
    "q42_exists_subquery" -> { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("graft_customer")
      Tables.orders(s, dir).createOrReplaceTempView("graft_orders_q42")
      s.sql(
        """SELECT c_custkey, c_name, c_acctbal
          |FROM graft_customer c
          |WHERE EXISTS (SELECT 1 FROM graft_orders_q42 o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          |  AND NOT EXISTS (SELECT 1 FROM graft_orders_q42 o
          |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
          |ORDER BY c_custkey""".stripMargin)
    },

    // -- min_by/max_by + count_if/bool_or. min_by ties on equal prices are
    //    engine-arbitrary, so the orderable is a tie-proof integer encode:
    //    round(price*1e6) (monotone, identical in both engines) shifted by
    //    2^24 plus the unique order key. Max encode ≈ 8.4e18 < 2^63.
    "q43_arg_minmax" -> { (s, dir) =>
      val enc = round(col("o_totalprice") * 1000000d).cast("long") *
        lit(16777216L) + col("o_orderkey")
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(min_by(col("o_orderkey"), enc).as("cheapest_order"),
             max_by(col("o_orderkey"), enc).as("priciest_order"),
             count_if(col("o_totalprice") > 200000).as("n_big"),
             bool_or(col("o_orderstatus") === "F").as("any_f"))
        .orderBy("o_orderpriority")
    },

    // -- Recursive CTE (Spark 4's UnionLoop): transitive closure over a
    //    synthetic parent chain (parent key = key - 5), computing each
    //    node's root and depth. Identical SQL runs on both engines.
    //
    //    Plan tuning (measured, r7): UnionLoop re-runs AQE planning on
    //    every iteration — for a 6-iteration closure that fixed re-planning
    //    cost dominated the query (1.33 s -> 0.71 s with a static plan +
    //    an explicit broadcast of the joined dim). Iterative plans are the
    //    one place AQE's per-query re-optimization works against us: the
    //    loop body's shape never changes between iterations, so we pay the
    //    planner 6x for one answer. Scoped via `newSession()` (own SQL
    //    conf, shared context/cache) so nothing session-global mutates.
    "q44_recursive_cte" -> { (s0, dir) =>
      val s = s0.newSession()
      s.conf.set("spark.sql.adaptive.enabled", "false")
      Tables.nation(s, dir).createOrReplaceTempView("graft_nation_q44")
      s.sql(
        """WITH RECURSIVE walk(key, root, depth) AS (
          |  SELECT n_nationkey, n_nationkey, 0 FROM graft_nation_q44 WHERE n_nationkey < 5
          |  UNION ALL
          |  SELECT /*+ BROADCAST(n) */ n.n_nationkey, w.root, w.depth + 1
          |  FROM graft_nation_q44 n JOIN walk w ON n.n_nationkey - 5 = w.key)
          |SELECT key, root, depth FROM walk ORDER BY key""".stripMargin)
    },

    // -- LATERAL correlated subquery (top-N per outer row): each nation
    //    pulls its top-2 customers by balance — the per-row dependent
    //    join Spark plans as a window under the hood. Deterministic:
    //    ties broken by name inside and outside the lateral.
    "q45_lateral_join" -> { (s, dir) =>
      Tables.nation(s, dir).createOrReplaceTempView("graft_nation_q45")
      Tables.customer(s, dir).createOrReplaceTempView("graft_customer_q45")
      s.sql(
        """SELECT n.n_name, t.c_name, t.c_acctbal
          |FROM graft_nation_q45 n,
          |LATERAL (SELECT c_name, c_acctbal FROM graft_customer_q45 c
          |         WHERE c.c_nationkey = n.n_nationkey
          |         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
          |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin)
    },

    // -- IGNORE NULLS window (gap-filling carry-forward): per customer,
    //    running last urgent-order date over the date-ordered history —
    //    the standard last-observation-carried-forward form. The
    //    window's order is totalized by the unique order key.
    "q46_ignore_nulls_window" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .withColumn("urgent_date",
          when(col("o_orderpriority") === "1-URGENT", col("o_orderdate")))
        .withColumn("last_urgent", last(col("urgent_date"), ignoreNulls = true).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("last_urgent"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // -- Gap-fill RESAMPLE (dense time grid + carry-forward): the
    //    time-series completion q46's carry-forward alone can't do —
    //    MISSING rows are generated. Per user, an hourly grid spanning
    //    the corpus [min, max] hour (sequence + explode; the grid's
    //    user×hour shape shuffles once on user), left-joined to the
    //    hourly aggregates, counts zero-filled and sums carried forward
    //    (q46's IGNORE NULLS form). Leading hours before a user's first
    //    event stay NULL — the fill never invents history. At 100 TB
    //    the grid is |users|·|hours| rows — generated, never scanned —
    //    and the single shuffle key is user_id.
    "q47_gap_fill_resample" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val bounds = ev.agg(
        date_trunc("hour", min(col("ts"))).as("h_lo"),
        date_trunc("hour", max(col("ts"))).as("h_hi"))
      val hours = bounds.select(explode(sequence(col("h_lo"), col("h_hi"),
        expr("interval 1 hour"))).as("h"))
      val hourly = ev
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"), Tables.dsum(col("value")).as("sv"))
      val w = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select("user_id").distinct()
        .crossJoin(broadcast(hours))
        .join(hourly, Seq("user_id", "h"), "left")
        .withColumn("n_events", coalesce(col("n"), lit(0L)))
        .withColumn("filled_sum", last(col("sv"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("h"), col("n_events"), col("filled_sum"))
        .orderBy("user_id", "h")
    },

    // -- NULL-safe equi-join (`<=>` / IS NOT DISTINCT FROM): nulls match
    //    nulls — the join form dedup-on-nullable-business-keys needs.
    //    Nullable keys derived by CASE from both sides; aggregated to a
    //    per-key pair count so the null bucket's cross product is
    //    visible as one row. n_nationkey % 5 = 0 nulls 5 of 25 nations,
    //    o_orderkey % 3 = 0 nulls a third of orders.
    "q48_nullsafe_join" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
        .withColumn("ok", when(col("o_orderkey") % 3 =!= 0,
          col("o_orderkey") % 7))
      val n = Tables.nation(s, dir)
        .withColumn("nk", when(col("n_nationkey") % 5 =!= 0,
          col("n_nationkey") % 7))
      o.join(broadcast(n), o("ok") <=> n("nk"), "inner")
        .groupBy(coalesce(col("ok").cast("string"), lit("NULL")).as("k_repr"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("n_nationkey")).as("n_nations"))
        .orderBy("k_repr")
    },

    // -- Rank-distribution window functions (percent_rank / cume_dist /
    //    ntile): each order's price standing within its priority class.
    //    The window order is totalized by the unique order key, so the
    //    ranks — and the single IEEE divisions behind the two ratios —
    //    are engine-exact; ntile follows the SQL-standard first-buckets-
    //    get-the-remainder rule in both engines.
    "q49_rank_distributions" -> { (s, dir) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(percent_rank().over(w), 6).as("pctl"),
          round(cume_dist().over(w), 6).as("cumd"),
          ntile(4).over(w).as("quartile"))
        .orderBy("o_orderkey")
    },

    // -- Ordered string aggregation (LISTAGG/string_agg): the collect →
    //    sort → join form is deterministic regardless of Spark's
    //    undefined collect_set order because the sort happens AFTER
    //    collection — the only safe way to hash-gate list aggregation.
    "q50_ordered_listagg" -> { (s, dir) =>
      // when(size > 0, ...): a group whose values are all NULL collects
      // an empty set — string_agg yields NULL there, array_join ''
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(array_sort(collect_set(col("source"))).as("__srcs"),
          countDistinct(col("source")).as("n_sources"))
        .select(col("lang"),
          when(size(col("__srcs")) > 0, array_join(col("__srcs"), ","))
            .as("sources"),
          col("n_sources"))
        .orderBy("lang")
    },

    // -- Session windows (gap-based sessionization) in batch: the same
    //    session_window expression the streaming path uses; oracle =
    //    lag/cumulative-sum sessionization. Session = [min ts, max ts+gap).
    //    Boundary: Spark MERGES events exactly gap apart (pinned by the
    //    OpsSpec fixture), so the oracle breaks only on strict `>` — aligned.
    "q35_session_windows" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "6 hours").as("win"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
             Tables.dsum(col("value")).as("sum_value"))
        .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
          col("user_id"), col("n_events"), col("sum_value"))
        .orderBy("user_id", "win_start")
    },
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_quantity), 6) AS avg_qty,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_extendedprice), 6) AS avg_price,
        |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_discount), 6) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount >= 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_revenue_by_segment" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q04_nation_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q05_cust_order_stats" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q06_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q07_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q08_topk_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q09_running_qty" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  SUM(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC,
        |             l_quantity ASC, l_extendedprice ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin,

    "q10_event_gaps" ->
      """SELECT user_id, event_id,
        |  lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id ASC) AS prev_event,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id ASC) AS next_type
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,

    "q11_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q12_distinct_segments" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",

    "q13_priority_stats" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q14_union_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q15_intersect_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q16_except_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier WHERE s_acctbal < 0
        |ORDER BY nationkey""".stripMargin,

    "q17_rollup_flags" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q18_cube_status" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q19_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q20_scalar_funcs" ->
      """SELECT o_orderkey,
        |  upper(substring(o_orderpriority, 1, 3)) AS pri3,
        |  concat(o_orderstatus, '-', o_orderpriority) AS status_pri,
        |  CAST(length(o_orderpriority) AS INT) AS pri_len,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  o_orderkey % 7 AS k7,
        |  round(abs(o_totalprice - 150000.0), 2) AS dist_150k
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q21_case_agg" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  CAST(SUM(CASE WHEN o_totalprice <= 150000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q22_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |GROUP BY o_custkey HAVING COUNT(*) >= 15
        |ORDER BY o_custkey""".stripMargin,

    "q23_above_avg" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q24_json_props" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q25_daily_events" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "q26_word_counts" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> ''
        |GROUP BY word ORDER BY n DESC, word ASC LIMIT 20""".stripMargin,

    "q27_right_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q28_full_outer" ->
      """WITH cn AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1),
        |sn AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
        |ORDER BY nationkey""".stripMargin,

    "q29_union_all" ->
      """SELECT nationkey, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey FROM supplier)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    "q30_theta_join" ->
      """SELECT n_name, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events JOIN nation
        |  ON value >= n_nationkey * 10.0 AND value < (n_nationkey + 1) * 10.0
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q31_join_residual" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
        |GROUP BY 1 ORDER BY yr""".stripMargin,

    "q32_from_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q33_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  list_max(embedding) AS mx,
        |  list_min(embedding) AS mn,
        |  round(list_sum(CAST(embedding AS DOUBLE[])), 6) AS total
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q39_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > (SELECT 2 * AVG(o2.o_totalprice)
        |                      FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q37_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'error') AS error,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin,

    "q38_unpivot" ->
      """WITH agg AS (
        |  SELECT o_orderpriority,
        |    CAST(COUNT(*) AS DOUBLE) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS val FROM agg
        |UNION ALL
        |SELECT o_orderpriority, 'total_price' AS metric, total_price AS val FROM agg
        |ORDER BY o_orderpriority, metric""".stripMargin,

    "q36_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 6) AS p25,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q40_window_funcs" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "q41_range_window" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
        |    AS trailing_30d
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q42_exists_subquery" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q44_recursive_cte" ->
      """WITH RECURSIVE walk(key, root, depth) AS (
        |  SELECT n_nationkey, n_nationkey, 0 FROM nation WHERE n_nationkey < 5
        |  UNION ALL
        |  SELECT n.n_nationkey, w.root, w.depth + 1
        |  FROM nation n JOIN walk w ON n.n_nationkey - 5 = w.key)
        |SELECT key, root, depth FROM walk ORDER BY key""".stripMargin,

    "q34_approx_distinct" ->
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_custkey) AS exact_custs,
        |  TRUE AS approx_within_5pct
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // arg_min/arg_max proved DuckDB-version-sensitive (r3's one red row);
    // since the encode is total and injective and orderkeys < 2^24,
    // arg_min(key, enc) == min(enc) % 2^24 — pure integer min/max is
    // version-proof in any engine. Spark keeps min_by/max_by (the surface
    // under test); by injectivity both sides compute identical values.
    "q43_arg_minmax" ->
      """SELECT o_orderpriority,
        |  min(CAST(round(o_totalprice * 1000000) AS BIGINT) * 16777216 + o_orderkey) % 16777216 AS cheapest_order,
        |  max(CAST(round(o_totalprice * 1000000) AS BIGINT) * 16777216 + o_orderkey) % 16777216 AS priciest_order,
        |  CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
        |  bool_or(o_orderstatus = 'F') AS any_f
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q45_lateral_join" ->
      """SELECT n.n_name, t.c_name, t.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_name, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin,

    "q46_ignore_nulls_window" ->
      """SELECT o_custkey, o_orderkey,
        |  last_value(CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderdate END IGNORE NULLS)
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_urgent
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q35_session_windows" ->
      """WITH s AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 6 HOUR
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |g AS (
        |  SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM s)
        |SELECT MIN(ts) AS win_start, MAX(ts) + INTERVAL 6 HOUR AS win_end, user_id,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, sess
        |ORDER BY user_id, win_start""".stripMargin,

    "q47_gap_fill_resample" ->
      """WITH b AS (
        |  SELECT date_trunc('hour', min(ts)) AS h_lo,
        |         date_trunc('hour', max(ts)) AS h_hi FROM events),
        |hours AS (
        |  SELECT unnest(generate_series(h_lo, h_hi, INTERVAL 1 HOUR)) AS h FROM b),
        |hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sv
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT u.user_id, hours.h
        |  FROM (SELECT DISTINCT user_id FROM events) u, hours)
        |SELECT grid.user_id, grid.h, COALESCE(hourly.n, 0) AS n_events,
        |  last_value(hourly.sv IGNORE NULLS) OVER (
        |    PARTITION BY grid.user_id ORDER BY grid.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
        |FROM grid LEFT JOIN hourly
        |  ON grid.user_id = hourly.user_id AND grid.h = hourly.h
        |ORDER BY grid.user_id, grid.h""".stripMargin,

    "q50_ordered_listagg" ->
      """SELECT lang,
        |  string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
        |  COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q49_rank_distributions" ->
      """SELECT o_orderkey, o_orderpriority,
        |  round(percent_rank() OVER w, 6) AS pctl,
        |  round(cume_dist() OVER w, 6) AS cumd,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q48_nullsafe_join" ->
      """WITH o AS (
        |  SELECT CASE WHEN o_orderkey % 3 <> 0 THEN o_orderkey % 7 END AS ok
        |  FROM orders),
        |n AS (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey % 5 <> 0 THEN n_nationkey % 7 END AS nk
        |  FROM nation)
        |SELECT COALESCE(CAST(o.ok AS VARCHAR), 'NULL') AS k_repr,
        |  COUNT(*) AS n_pairs,
        |  COUNT(DISTINCT n.n_nationkey) AS n_nations
        |FROM o JOIN n ON o.ok IS NOT DISTINCT FROM n.nk
        |GROUP BY 1 ORDER BY k_repr""".stripMargin,
  )
}
