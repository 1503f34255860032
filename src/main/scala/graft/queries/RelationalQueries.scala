package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Relational breadth the reference lacks (SURVEY.md §2.9) but any usable
  * analytics engine — and a 100 TB training-data pipeline — needs: joins of
  * every flavor, window functions, grouping sets, set ops, distinct
  * aggregates, time-bucketed aggregation.
  *
  * Scale notes baked into each plan:
  *  - dimension tables (customer/nation/region/supplier) are broadcast —
  *    no shuffle of the fact side for those joins;
  *  - fact-fact joins (lineitem⨝orders) shuffle on the join key once and
  *    AQE handles skew;
  *  - aggregates are partial (map-side combine) by construction;
  *  - every query has a deterministic total order and rounded doubles so
  *    the DuckDB oracle hash-matches.
  */
object RelationalQueries extends Registry {

  val defs: Map[String, QueryFn] = Map(
    // Broadcast hash join: small dim explicitly broadcast.
    "join_broadcast_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("total_price"))
        .orderBy("c_mktsegment")),

    // 5-way join: fact⨝fact shuffles on orderkey; all dims broadcast.
    "join_multiway_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy("r_name")),

    // The same 5-way revenue join through BUCKETED fact copies
    // (core.Bucketed): lineitem and orders co-bucketed + sorted on
    // orderkey, so the sort-merge join needs neither an exchange nor a
    // sort on either fact side — the 100 TB ingest layout, proven in the
    // registered surface rather than only in ScaleMechanicsSpec. The
    // merge hint pins the join shape (a broadcast at local SF would
    // bypass the mechanics being demonstrated); dims stay broadcast.
    // Same oracle as join_multiway_revenue — layout must not change
    // results.
    "join_multiway_revenue_bucketed" -> ((s, d) => {
      val (l, o) = graft.core.Bucketed.lineitemOrders(s, d)
      l.hint("merge")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy("r_name")
    }),

    // Cheapest-supplier-per-part: the argmin join (TPC-H Q2's core
    // shape) through the min_by/arg_min aggregate surface — one partial
    // aggregation, never a rank window over the whole fact. The
    // ordering key is made UNIQUE by construction (unit price in
    // centi-cents * 1e6 + suppkey, suppkey < 1e6), because min_by with
    // a tied ordering is engine-nondeterministic; with a unique key the
    // Spark min_by and DuckDB arg_min winners provably coincide. Unit
    // price stays integer: cents DIV whole-unit quantity.
    "join_argmin_supplier" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)" +
            " DIV CAST(l_quantity AS BIGINT)").as("unit_cc"))
        .withColumn("combo",
          col("unit_cc") * lit(1000000L) + col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(min_by(col("l_suppkey"), col("combo")).as("best_suppkey"),
          min("unit_cc").as("best_unit_cc"),
          count(lit(1)).as("n_offers"))
        .orderBy("l_partkey")),

    // The same 5-way join through the SQL surface: Views.register + a
    // spark.sql(...) text plan. Catalyst plans SQL and DataFrame
    // identically (same optimized plan, same broadcast decisions via AQE),
    // so this single entry proves the whole oracle-checked operator
    // surface is reachable by SQL users — the query language the
    // reference never had (SURVEY.md §2.9).
    "sql_multiway_revenue" -> ((s, d) => {
      graft.core.Views.register(s, d)
      s.sql(
        """SELECT r_name,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation   ON c_nationkey = n_nationkey
           JOIN region   ON n_regionkey = r_regionkey
           GROUP BY r_name ORDER BY r_name""")
    }),

    // SQL-surface PIVOT: the same day x event_type crosstab as
    // events_pivot_daily, but through Spark SQL's PIVOT clause — proving
    // the declarative SQL path plans the identical partial-aggregated
    // shape as the DataFrame .pivot() API (explicit IN list, so no
    // distinct-values pre-scan). Missing cells coalesce to 0 on both
    // engines.
    "sql_pivot" -> ((s, d) => {
      graft.core.Views.register(s, d)
      s.sql(
        """SELECT day,
                  coalesce(click, 0L)    AS click,
                  coalesce(error, 0L)    AS error,
                  coalesce(purchase, 0L) AS purchase,
                  coalesce(signup, 0L)   AS signup,
                  coalesce(`view`, 0L)   AS `view`
           FROM (SELECT date_format(ts, 'yyyy-MM-dd') AS day, event_type
                 FROM events)
           PIVOT (count(1) FOR event_type
                  IN ('click', 'error', 'purchase', 'signup', 'view'))
           ORDER BY day""")
    }),

    // Salted skew join (operators.Joins.saltedJoin): the events fact side
    // carries 150 hot user keys; salting spreads each over 8 reducers.
    // The oracle is the PLAIN join — salting must be invisible in the
    // result, which is exactly what the hash compare proves.
    "join_skew_salted" -> ((s, d) => {
      val facts = Tables.events(s, d)
        .select(col("user_id"), col("value"))
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.operators.Joins.saltedJoin(facts, dim, Seq("user_id"), salts = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("c_mktsegment")
    }),

    // Bloom-filter semi-join prefilter, made REPLAYABLE: a 2,048-bit /
    // 4-hash Bloom built from purchase users (bits = md5(r:uid) mod m —
    // the bit-set relation is <= 2,048 rows, broadcastable at any
    // corpus scale) prefilters the click stream before the exact semi
    // join — the runtime-filter mechanics AQE applies internally, with
    // the false-positive rate surfaced: the output is the
    // clicks / bloom-pass / true-match / false-positive accounting plus
    // the FPR in basis points. All integer; one click-side scan.
    "join_bloom_semi" -> ((s, d) => {
      val ev = Tables.events(s, d)
      // the synthetic users are uniform (every click user also
      // purchases), so the build side restricts to the sparse "VIP"
      // cohort (user_id % 17 == 0) — otherwise the filter passes
      // everything and the FPR accounting is vacuous
      val purchUsers = ev.filter(col("event_type") === "purchase" &&
          col("user_id") % 17 === 0)
        .select(col("user_id")).distinct()
      val bits = purchUsers
        .withColumn("r", explode(sequence(lit(0L), lit(3L))))
        .select((conv(substring(md5(concat(col("r").cast("string"),
          lit(":"), col("user_id").cast("string"))), 1, 15), 16, 10)
          .cast("long") % 2048).as("bit"))
        .distinct()
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"))
      val hits = clicks
        .withColumn("r", explode(sequence(lit(0L), lit(3L))))
        .withColumn("bit",
          conv(substring(md5(concat(col("r").cast("string"), lit(":"),
            col("user_id").cast("string"))), 1, 15), 16, 10)
            .cast("long") % 2048)
        .join(broadcast(bits), Seq("bit"))
        .groupBy("event_id", "user_id")
        .agg(count(lit(1)).as("nbits"))
        .filter(col("nbits") === 4)
        .select(col("event_id"), col("user_id"))
      val truly = clicks.join(
        purchUsers.withColumnRenamed("user_id", "user_id"),
        Seq("user_id"), "left_semi")
      hits.agg(count(lit(1)).as("n_bloom_pass"))
        .crossJoin(broadcast(clicks.agg(count(lit(1)).as("n_clicks"))))
        .crossJoin(broadcast(truly.agg(count(lit(1)).as("n_true"))))
        .select(col("n_clicks"), col("n_bloom_pass"), col("n_true"),
          (col("n_bloom_pass") - col("n_true")).as("n_false_pos"),
          expr("""CASE WHEN n_clicks - n_true = 0 THEN 0
                  ELSE ((n_bloom_pass - n_true) * 10000)
                       DIV (n_clicks - n_true) END""").as("fpr_bp"))
    }),

    // Correlated LATERAL subquery on the SQL surface (Spark 3.2+ lateral
    // join): per nation, the top-2 customers by account balance — the
    // "for each row, run this parameterized subquery" form analysts
    // write; Catalyst decorrelates it into the same join+window plan the
    // DSL would build, which is exactly what the oracle's LATERAL must
    // reproduce.
    "sql_lateral_topn" -> ((s, d) => {
      graft.core.Views.register(s, d)
      s.sql(
        """SELECT n.n_name, t.c_custkey, t.acctbal
           FROM nation n,
           LATERAL (SELECT c_custkey, round(c_acctbal, 2) AS acctbal
                    FROM customer
                    WHERE c_nationkey = n.n_nationkey
                    ORDER BY c_acctbal DESC, c_custkey ASC
                    LIMIT 2) t
           ORDER BY n.n_name, t.acctbal DESC, t.c_custkey""")
    }),

    // GROUPING SETS through the SQL surface (the DataFrame API exposes
    // only cube/rollup; arbitrary set lists are SQL-only). NULL groups
    // coalesced so the compare is total-order-stable.
    "sql_grouping_sets" -> ((s, d) => {
      graft.core.Views.register(s, d)
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS flag,
                  coalesce(l_linestatus, 'ALL') AS status,
                  count(*) AS cnt
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           ORDER BY 1, 2""")
    }),

    // Declarative recursion on the SQL surface (WITH RECURSIVE, new in
    // Spark 4.x): hierarchical subtree rollup over the implicit binary
    // user hierarchy (parent(u) = u DIV 2, root 1) — each ancestor
    // accumulates its whole subtree's event volume, the org-chart
    // aggregation pattern. The recursion walks a TREE, so every (user,
    // ancestor) path is unique and UNION ALL state stays linear in
    // users x depth (~log2(max_id) levels) — no dedup needed, safe at
    // scale. Per-user totals partial-aggregate BEFORE the chain join,
    // so the recursion shuffles (user, ancestor) ids, never raw events.
    "sql_recursive_rollup" -> ((s, d) => {
      graft.core.Views.register(s, d)
      s.sql(
        """WITH RECURSIVE chain AS (
             SELECT user_id AS u, user_id AS anc
             FROM (SELECT DISTINCT user_id FROM events WHERE user_id >= 1)
             UNION ALL
             SELECT u, anc DIV 2 FROM chain WHERE anc > 1),
           t AS (SELECT user_id AS u, count(*) AS n_ev, sum(value) AS sv
                 FROM events WHERE user_id >= 1 GROUP BY user_id)
           SELECT c.anc AS node, count(*) AS n_desc,
                  sum(t.n_ev) AS n_events,
                  round(sum(t.sv), 2) AS subtree_value
           FROM chain c JOIN t ON c.u = t.u
           GROUP BY c.anc ORDER BY node""")
    }),

    // Left-semi join (EXISTS): customers that have orders, count per nation.
    "semi_join_count" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("c_nationkey")),

    // Anti join (NOT EXISTS): customers with no high-value order. (Plain "customers
    // without orders" is empty in this data — a 0-row result would make
    // the oracle check vacuous.)
    "anti_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")),

    // Ranking window: top-3 orders per customer by price.
    "window_rank_topn" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    }),

    // Frame window: running quantity per order by line number. RANGE frame
    // (not ROWS): (l_orderkey, l_linenumber) is not unique in this data, so
    // a ROWS frame would depend on nondeterministic peer order; RANGE
    // includes all peers and is engine-stable.
    "window_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .withColumn("running_qty", round(sum("l_quantity").over(w), 2))
        .select(col("l_orderkey"), col("l_linenumber"), col("running_qty"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Lead/lag window: gap in days between a customer's consecutive orders.
    "window_lag_gap" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev_date").isNotNull)
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"), col("prev_date")).as("gap_days"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Distribution windows: balance quartile + cumulative distribution per
    // market segment. PARTITIONED window (segments sort in parallel — an
    // unpartitioned ntile would serialize the whole table into one sorted
    // partition at scale); total order (acctbal, custkey) inside each
    // partition so tile edges are engine-stable, and cume_dist over the
    // distinct composite key is an exact rational of row counts.
    "window_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      Tables.customer(s, d)
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .select(col("c_custkey"), col("c_mktsegment"), col("quartile"), col("cd"))
        .orderBy("c_custkey")
    }),

    // Rollup over two grouping columns (NULL groups coalesced to 'ALL' so
    // the oracle compare is total-order-stable across engines).
    "rollup_count" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("cnt"), col("sum_qty"))
        .orderBy("flag", "status")),

    "cube_count" -> ((s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("cnt"))
        .orderBy("status", "priority")),

    // Set operations.
    "setop_union" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy("nk")),

    "setop_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    // EXCEPT with a non-empty result: customers who never placed an
    // order with status 'F'.
    "setop_except" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("k"))
        .except(Tables.orders(s, d)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("k")))
        .orderBy("k")),

    // Distinct aggregates.
    "distinct_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),

    // Statistical aggregates.
    "stats_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(
          round(min("l_extendedprice"), 2).as("min_price"),
          round(max("l_extendedprice"), 2).as("max_price"),
          round(avg("l_extendedprice"), 2).as("avg_price"),
          round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"))
        .orderBy("l_linestatus")),

    // Discrete percentiles (value at rank ceil(p*n)): the doc-length /
    // price-distribution query a data-quality dashboard runs. Discrete
    // (an actual data value) rather than interpolated — interpolation
    // math differs in the last ulp across engines and a round() at a
    // .xx5 boundary flips a cent. At 100 TB swap for approx_percentile —
    // same shape, sketch-based.
    // Robust dispersion: median + median-absolute-deviation per group,
    // both picked by exact rank (the stats_percentiles recipe twice) so
    // the doubles compared are raw parquet values and identical
    // subtractions — no estimator drift between engines. The outlier
    // fence that survives the heavy tails stddev dies on.
    "stats_mad" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
      val wX = Window.partitionBy("g").orderBy("x")
      val med = base.withColumn("rn", row_number().over(wX))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
        .groupBy("g")
        .agg(max(when(col("rn") === ceil(col("n") * 0.5), col("x")))
          .as("med"))
      val wD = Window.partitionBy("g").orderBy("d")
      base.join(broadcast(med), "g")
        .withColumn("d", abs(col("x") - col("med")))
        .withColumn("rn", row_number().over(wD))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
        .groupBy("g")
        .agg(round(max(col("med")), 2).as("median"),
          round(max(when(col("rn") === ceil(col("n") * 0.5), col("d"))), 2)
            .as("mad"))
        .select(col("g").as("l_returnflag"), col("median"), col("mad"))
        .orderBy("l_returnflag")
    }),

    "stats_percentiles" -> ((s, d) => {
      val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
      val ranked = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1))
          .over(Window.partitionBy("l_returnflag")))
      def pick(p: Double) =
        max(when(col("rn") === ceil(col("n") * p), col("l_extendedprice")))
      ranked.groupBy("l_returnflag")
        .agg(pick(0.5).as("p50"), pick(0.9).as("p90"), pick(0.99).as("p99"))
        .orderBy("l_returnflag")
    }),

    // Sampling-based quantile estimation with an exact error audit —
    // the 100 TB quantile pattern: ranking the full relation per group
    // (what stats_percentiles does) needs a per-group sort of
    // everything; a deterministic md5 1/16 sample ranks 1/16 of it and
    // the estimate's error is MEASURED, not assumed. Everything is
    // engine-portable (md5 membership rule, integer cents, rank picks),
    // so unlike t-digest/GK sketches the sampled estimate itself
    // hash-matches the oracle. err_bp columns are the audit: basis
    // points of relative error per quantile, integer division.
    "stats_sampled_percentiles" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        conv(substring(md5(concat_ws("_", col("l_orderkey"),
          col("l_linenumber"), lit("pctl"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      def picks(df: org.apache.spark.sql.DataFrame, suffix: String) = {
        val w = Window.partitionBy("l_returnflag").orderBy("cents")
        def pick(p: Double) =
          max(when(col("rn") === ceil(col("n") * p), col("cents")))
        df.withColumn("rn", row_number().over(w))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy("l_returnflag")))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as(s"n_$suffix"),
            pick(0.5).as(s"p50_$suffix"), pick(0.9).as(s"p90_$suffix"),
            pick(0.99).as(s"p99_$suffix"))
      }
      picks(li, "exact")
        .join(picks(li.filter(col("h") % 256 < 16), "sample"),
          "l_returnflag")
        .withColumn("err50_bp",
          expr("abs(p50_sample - p50_exact) * 10000 div p50_exact"))
        .withColumn("err90_bp",
          expr("abs(p90_sample - p90_exact) * 10000 div p90_exact"))
        .withColumn("err99_bp",
          expr("abs(p99_sample - p99_exact) * 10000 div p99_exact"))
        .orderBy("l_returnflag")
    }),

    // Custom typed Aggregator through the udaf() surface (SURVEY §2.7:
    // the reference's App join/mergeCache pair): quantity-weighted mean
    // price. The oracle is the plain SQL ratio — the custom accumulator
    // must be indistinguishable from the composed built-ins.
    "udaf_weighted_mean" -> ((s, d) => {
      val wm = udaf(graft.functions.CraneAggregators.WeightedMean)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(wm(col("l_extendedprice"), col("l_quantity")), 2)
          .as("wmean_price"))
        .orderBy("l_returnflag")
    }),

    // Bivariate statistics: correlation, sample covariance, regression
    // slope — single-pass co-moment aggregates (mergeable partials, the
    // same shape HLL/avg use; no per-group materialization).
    "stats_corr" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qp"),
          round(covar_samp("l_quantity", "l_extendedprice"), 2).as("covar_qp"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 2)
            .as("slope_pq"))
        .orderBy("l_returnflag")),

    // Spearman rank correlation per return flag: Pearson corr over
    // tie-averaged ranks, the monotone-association screen that is
    // robust to the price outliers stats_corr is not. Average ranks
    // stay INTEGERS by doubling: 2*avg_rank = 2*rank + n_ties - 1
    // (corr is scale-invariant, so the doubled ranks give the same
    // rho), which removes every engine-specific fractional-rank
    // concern before the one rounded corr. Scale shape: a naive
    // rank() window partitions by 3 flags — a row-sized in-group sort
    // with parallelism 3. Instead rank comes from the VALUE-frequency
    // relation (distinct (flag, value) with counts, rank = 1 +
    // running count of strictly-smaller values): the window runs over
    // distinct values — orders of magnitude smaller than rows — and
    // rows get their ranks back through two keyed equi-joins AQE can
    // size (same result, identical ties arithmetic).
    "stats_spearman" -> ((s, d) => {
      def doubledRanks(valueCol: String, outCol: String) = {
        val w = Window.partitionBy("l_returnflag").orderBy(valueCol)
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.lineitem(s, d)
          .groupBy("l_returnflag", valueCol)
          .agg(count(lit(1)).as("cnt"))
          .withColumn("below", coalesce(sum("cnt").over(w), lit(0L)))
          // rank = below + 1; doubled avg rank = 2*rank + cnt - 1
          .select(col("l_returnflag"), col(valueCol),
            (lit(2L) * (col("below") + 1) + col("cnt") - 1).as(outCol))
      }
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"))
        .join(doubledRanks("l_quantity", "r2q"),
          Seq("l_returnflag", "l_quantity"))
        .join(doubledRanks("l_extendedprice", "r2p"),
          Seq("l_returnflag", "l_extendedprice"))
        .groupBy("l_returnflag")
        .agg(round(corr("r2q", "r2p"), 4).as("spearman_qp"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // Full outer join on pre-aggregated sides: per-nation customer
    // counts vs supplier counts over a FILTERED supplier subset (every
    // third nation), so unmatched rows genuinely occur and the null-fill
    // semantics are exercised. Both sides partial-aggregate before the
    // join — the shuffle carries (nation, count) pairs.
    "join_full_outer" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_cust"))
      val sup = Tables.supplier(s, d)
        .filter(col("s_nationkey") % 3 === 0)
        .groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sup, col("nk_c") === col("nk_s"), "full_outer")
        .select(
          coalesce(col("nk_c"), col("nk_s")).cast("long").as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    }),

    // Interpolated percentiles (percentile_cont / type-7 quantile): the
    // continuous twin of stats_percentiles' discrete rank pick — both
    // engines use rank = p*(n-1) with linear interpolation, so rounded
    // values hash-match. One partial-aggregated pass per group.
    "stats_percentiles_cont" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_cont"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_cont"),
          round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99_cont"))
        .orderBy("l_returnflag")),

    // Welch two-sample t-test (unequal variances): purchase vs click
    // event values — the A/B-test significance primitive. One single-row
    // conditional aggregate (partial, broadcast-free); t and the
    // Welch-Satterthwaite df are derived scalar arithmetic on it.
    "stats_welch_ttest" -> ((s, d) => {
      val e = Tables.events(s, d)
      val p = col("event_type") === "purchase"
      val c = col("event_type") === "click"
      e.agg(
          count(when(p, 1)).as("n_p"),
          avg(when(p, col("value"))).as("m_p"),
          var_samp(when(p, col("value"))).as("v_p"),
          count(when(c, 1)).as("n_c"),
          avg(when(c, col("value"))).as("m_c"),
          var_samp(when(c, col("value"))).as("v_c"))
        .select(col("n_p"), col("n_c"),
          round(col("m_p") - col("m_c"), 4).as("mean_diff"),
          round((col("m_p") - col("m_c")) /
            sqrt(col("v_p") / col("n_p") + col("v_c") / col("n_c")), 4)
            .as("t_stat"),
          round(
            pow(col("v_p") / col("n_p") + col("v_c") / col("n_c"), 2) /
              (pow(col("v_p") / col("n_p"), 2) / (col("n_p") - 1) +
               pow(col("v_c") / col("n_c"), 2) / (col("n_c") - 1)), 2)
            .as("df_welch"))
    }),

    // Equal-width histogram via integer bucket arithmetic (width_bucket
    // is not portable to the oracle engine; floor division of the same
    // IEEE operands is).
    "stats_histogram" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("bucket",
          least(lit(9L), floor(col("o_totalprice") / 50000)).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("bucket")),

    // The 100 TB form of the percentile query: a mergeable quantile
    // sketch (approx_percentile) — bounded memory per group, one partial
    // agg pass, no per-group sort. No SQL oracle (sketch internals are
    // engine-specific); RelationalQueriesSpec bounds it against the
    // exact discrete percentiles.
    // The sketch values themselves are engine-internal (GK-sketch rank
    // error), so the hash-checked output is the exact continuous
    // percentile (identical recipe to stats_percentiles_cont) plus an
    // integer within-2% verdict per percentile computed AGAINST the
    // sketch — the oracle asserts the flags are all 1, graduating the
    // old rows-only check to a hash check without weakening it.
    "stats_percentiles_approx" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("pcts"),
          expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
            .as("ex"))
        .select(col("l_returnflag"),
          round(element_at(col("ex"), 1), 4).as("p50_cont"),
          round(element_at(col("ex"), 2), 4).as("p90_cont"),
          round(element_at(col("ex"), 3), 4).as("p99_cont"),
          (abs(element_at(col("pcts"), 1) - element_at(col("ex"), 1))
            <= element_at(col("ex"), 1) * 0.02).cast("long").as("p50_ok"),
          (abs(element_at(col("pcts"), 2) - element_at(col("ex"), 2))
            <= element_at(col("ex"), 2) * 0.02).cast("long").as("p90_ok"),
          (abs(element_at(col("pcts"), 3) - element_at(col("ex"), 3))
            <= element_at(col("ex"), 3) * 0.02).cast("long").as("p99_ok"))
        .orderBy("l_returnflag")),

    // HAVING: order-priority buckets above a count threshold.
    "having_filter" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 50)
        .orderBy("o_orderpriority")),

    // Scalar-subquery pattern: customers above their nation's mean balance.
    // Planned as agg + broadcast join back onto the dimension.
    "above_avg_per_group" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val means = c.groupBy(col("c_nationkey").as("nk"))
        .agg(avg("c_acctbal").as("mean_bal"))
      c.join(broadcast(means), col("c_nationkey") === col("nk"))
        .filter(col("c_acctbal") > col("mean_bal"))
        .select(col("c_custkey"), col("c_nationkey"),
          round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy("c_custkey")
    }),

    // Time-bucketed aggregation over the events stream table.
    "events_hourly" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour")),

    // Filter + projection pushdown showcase over a date predicate.
    "date_filter_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")),

    // Open-order backlog per month via the interval-sweep trick: each
    // order contributes +1 at its order month and -1 the month after
    // its last shipment, and the backlog is the running sum of deltas.
    // That turns interval-overlap counting (O(orders x span) if each
    // order exploded its months) into O(orders) delta rows plus a
    // cumulative walk over the MONTH domain — bounded by the calendar,
    // not the table.
    "orders_open_backlog" -> ((s, d) => {
      val last = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(to_date(max(date_trunc("month", col("l_shipdate"))))
          .as("endm"))
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        to_date(date_trunc("month", col("o_orderdate"))).as("startm"))
      val iv = o.join(last, o("o_orderkey") === last("l_orderkey"))
      val deltas = iv.select(col("startm").as("m"), lit(1L).as("dl"))
        .unionAll(iv.select(add_months(col("endm"), 1).as("m"),
          lit(-1L).as("dl")))
        .groupBy("m").agg(sum("dl").as("delta"))
      val w = Window.orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas
        .select(col("m").cast("string").as("month"), col("delta"),
          sum("delta").over(w).as("open_orders"))
        .orderBy("month")
    }),

    // Revenue concentration (Pareto): the minimum number of parts whose
    // descending cumulative revenue reaches 50/80/95% of the total.
    // Revenue snaps to exact integer cents before any comparison, and
    // the threshold test is the integer cross-product cum*10000 >=
    // pct*total. NO unpartitioned window ever touches an SF-scaling
    // relation: per-part revenues collapse to the distinct-value
    // histogram, values bucket into $10k revenue bands, the only
    // global-ordered window walks the BUCKET rollup (bounded by the
    // revenue DOMAIN — max part revenue / 1e6 cents — not by SF), the
    // within-bucket cumulative is a PARTITIONED window (each bucket's
    // values, parallel across buckets), and each threshold's crossing
    // VALUE GROUP is the unique row where the cumulative straddles the
    // target, with the part count inside that tie group recovered by
    // one integer ceiling division — equal-revenue parts contribute
    // identical cents, so the minimal count never depends on tie
    // order. (At ~1e14 total cents the 1e4 cross-products approach
    // Int64 limits — widen to decimal(38) then.)
    "sales_pareto" -> ((s, d) => {
      val rev = Tables.lineitem(s, d).groupBy("l_partkey")
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) -
          col("l_discount")) * 100).cast("long")).as("cents"))
      val hist = rev.groupBy("cents").agg(count(lit(1)).as("cnt"))
        .withColumn("mass", col("cents") * col("cnt"))
        .withColumn("bucket", expr("cents DIV 1000000"))
      val bHist = hist.groupBy("bucket")
        .agg(sum("mass").as("bmass"), sum("cnt").as("bcnt"))
      val wB = Window.orderBy(col("bucket").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val bPrefix = bHist.select(col("bucket"),
        coalesce(sum("bmass").over(wB), lit(0L)).as("pmass"),
        coalesce(sum("bcnt").over(wB), lit(0L)).as("pcnt"))
      val wIn = Window.partitionBy("bucket")
        .orderBy(col("cents").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("imass", sum("mass").over(wIn))
        .withColumn("icnt", sum("cnt").over(wIn))
        .join(bPrefix, "bucket")
        .select(col("cents"), col("cnt"), col("mass"),
          (col("pmass") + col("imass")).as("cum_mass"),
          (col("pcnt") + col("icnt")).as("cum_cnt"))
      val tot = rev.agg(sum("cents").as("t"))
      cum.crossJoin(broadcast(tot))
        .select(explode(typedLit(Seq(5000L, 8000L, 9500L))).as("pct_bp"),
          col("cents"), col("cnt"), col("mass"), col("cum_mass"),
          col("cum_cnt"), col("t"))
        .filter(col("cum_mass") * 10000 >= col("pct_bp") * col("t") &&
          (col("cum_mass") - col("mass")) * 10000 <
            col("pct_bp") * col("t"))
        .select(col("pct_bp"),
          (col("cum_cnt") - col("cnt") +
            expr("""(pct_bp * t - 10000 * (cum_mass - mass)
                     + 10000 * cents - 1) DIV (10000 * cents)"""))
            .as("n_parts"))
        .orderBy("pct_bp")
    }),

    // RFM segmentation: per-customer Recency / Frequency / Monetary
    // quartiles (ntile over (metric, custkey) — the unique tie-break
    // key makes every bucket assignment engine-deterministic), rolled
    // up to the 4x4x4 segment grid with customer counts and revenue.
    // Revenue snaps to integer cents before any aggregation. The fact
    // scan reduces to one row per CUSTOMER first; the three quartile
    // windows then walk the customer dimension only (bounded far below
    // the fact table — the same deliberate-global-window class as
    // sales_pareto, documented here). At 100 TB the swap is quartile
    // THRESHOLDS from the cumulative histogram (the stats_ks_test /
    // orders_ship_lag recipe) joined back broadcast.
    "orders_rfm" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val ref = o.agg(max(col("o_orderdate").cast("date")).as("ref_date"))
      val cust = o.groupBy("o_custkey").agg(
        max(col("o_orderdate").cast("date")).as("last_date"),
        count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .crossJoin(broadcast(ref))
        .withColumn("recency_d",
          datediff(col("ref_date"), col("last_date")).cast("long"))
      val rq = ntile(4).over(
        Window.orderBy(col("recency_d").asc, col("o_custkey")))
      val fq = ntile(4).over(
        Window.orderBy(col("freq").desc, col("o_custkey")))
      val mq = ntile(4).over(
        Window.orderBy(col("cents").desc, col("o_custkey")))
      cust.select(col("cents"),
          rq.cast("long").as("r_q"), fq.cast("long").as("f_q"),
          mq.cast("long").as("m_q"))
        .groupBy("r_q", "f_q", "m_q")
        .agg(count(lit(1)).as("n_customers"),
          sum("cents").as("segment_cents"))
        .orderBy("r_q", "f_q", "m_q")
    }),

    // Order-to-ship lag distribution per order priority, exact
    // percentiles by the histogram-walk recipe (Audit.keySkew /
    // stats_ks_test): lag days collapse to a (priority, lag_day, count)
    // histogram first, the cumulative window then walks the DAY-lag
    // domain (calendar-bounded, ~5k distinct values per priority — never
    // the fact rows), and p50/p90 are the smallest lag whose cumulative
    // count clears the integer cross-product threshold (2*cum >= n,
    // 10*cum >= 9*n). Comparisons only — no division, so negative lags
    // (this synthetic calendar has them) cannot hit floor-vs-truncate
    // divergence.
    "orders_ship_lag" -> ((s, d) => {
      val l = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val h = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(col("o_orderpriority").as("priority"),
          datediff(col("l_shipdate").cast("date"),
            col("o_orderdate").cast("date")).cast("long").as("lag_d"))
        .groupBy("priority", "lag_d").agg(count(lit(1)).as("cnt"))
      val tot = h.groupBy("priority").agg(sum("cnt").as("n"),
        min("lag_d").as("min_lag"), max("lag_d").as("max_lag"))
      val w = Window.partitionBy("priority").orderBy("lag_d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = h.select(col("priority"), col("lag_d"),
        sum("cnt").over(w).as("cum")).join(tot, "priority")
      val p50 = cum.filter(col("cum") * 2 >= col("n"))
        .groupBy("priority").agg(min("lag_d").as("p50_d"))
      val p90 = cum.filter(col("cum") * 10 >= col("n") * 9)
        .groupBy("priority").agg(min("lag_d").as("p90_d"))
      tot.join(p50, "priority").join(p90, "priority")
        .select("priority", "n", "min_lag", "p50_d", "p90_d", "max_lag")
        .orderBy("priority")
    }),

    // 2-D skyline (Pareto-non-dominated set) over part: minimize
    // (price, size). A part is dominated iff some other part is <= on
    // both axes and strictly < on at least one. The definition is
    // quadratic; the plan is the histogram sweep: aggregate the part
    // relation to one row per DISTINCT price (min size at that price —
    // a distributed groupBy), run the cumulative prefix-min over that
    // value histogram, and join the thresholds back. A part survives
    // iff (a) no strictly-cheaper price admits a size <= its own
    // (prefix-min over rows strictly before its price bucket) and (b)
    // it attains the min size at its own price. The only unpartitioned
    // window walks the distinct-cents histogram — bounded by the PRICE
    // DOMAIN (TPC-H retailprice spans ~1e5 cent values), not by SF —
    // the same bounded-domain recipe as stats_ks_test; the DuckDB
    // oracle stays the declarative NOT-EXISTS quadratic — scale-safe
    // plan vs literal spec, the same twin recipe as the dedup family.
    "skyline_parts" -> ((s, d) => {
      val p = Tables.part(s, d).select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("cents"),
        col("p_size").cast("long").as("size"))
      val hist = p.groupBy("cents").agg(min("size").as("min_same"))
      val cheaper = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
      val thresholds = hist.select(col("cents"), col("min_same"),
        min("min_same").over(cheaper).as("min_cheaper"))
      p.join(thresholds, "cents")
        .filter((col("min_cheaper").isNull ||
            col("min_cheaper") > col("size")) &&
          col("min_same") === col("size"))
        .select("p_partkey", "cents", "size")
        .orderBy("p_partkey")
    }),

    // Statistical process control (p-chart): monthly share of finished
    // orders against the all-time center line, with the 3-sigma
    // out-of-control test collapsed to ONE integer comparison by
    // clearing every denominator: (x/n - X/N)^2 > 9 p(1-p)/n becomes
    // (xN - nX)^2 > 9 X (N-X) n — no division, no sqrt, no float, so
    // both engines flag identical months. The products are carried in
    // decimal(38,0) (Spark) / HUGEINT (oracle): at ~1e7 orders/month
    // and 1e10 total, dev^2 peaks ~1e34 — silent Int64 wraparound
    // under non-ANSI Spark would otherwise flip the flag while DuckDB
    // errors, so the widening keeps the two engines divergence-free at
    // every scale. The monitor relation is one row per MONTH — the
    // fact scan partial-aggregates once and the chart walks the
    // calendar.
    "orders_status_pchart" -> ((s, d) => {
      val o = Tables.orders(s, d).select(
        to_date(date_trunc("month", col("o_orderdate"))).as("m"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("f"))
      val mo = o.groupBy("m").agg(count(lit(1)).as("n"), sum("f").as("x"))
      val g = mo.agg(sum("n").as("nn"), sum("x").as("xx"))
      val dec = "decimal(38,0)"
      mo.crossJoin(broadcast(g))
        .withColumn("dev", col("x").cast(dec) * col("nn") -
          col("n").cast(dec) * col("xx"))
        .select(col("m").cast("string").as("month"), col("n"), col("x"),
          expr("(x * 10000) DIV n").as("share_bp"),
          expr("(xx * 10000) DIV nn").as("center_bp"),
          when(col("dev") * col("dev") >
            lit(9L).cast(dec) * col("xx") * (col("nn") - col("xx")) *
              col("n"),
            1L).otherwise(0L).as("ooc"))
        .orderBy("month")
    }),

    // TPC-H Q1 (pricing summary report) in exact integer units — the
    // canonical scan-heavy aggregate every warehouse is judged on, here
    // as the EXACT twin: quantities/prices snap to cents, discount/tax
    // to basis points, disc_price accumulates in cent-bp and charge
    // divides its cent-bp^2 product back to cent-bp per row (operands
    // non-negative, so truncate == floor; at ~1e9 per row the sums hold
    // ~9e18 rows of headroom — a true 100 TB run widens the two product
    // columns to decimal(38)). Averages are truncating divisions. One
    // scan, one partial aggregate, 6 groups; the shipdate predicate and
    // 7-column projection push into the parquet scan.
    "sql_tpch_q1" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate").cast("date") <=
          lit("1998-09-02").cast("date"))
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("l_quantity") * 100).cast("long").as("qty_c"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"),
          round(col("l_discount") * 10000).cast("long").as("disc_bp"),
          round(col("l_tax") * 10000).cast("long").as("tax_bp"))
        .withColumn("disc_price_cbp",
          col("price_c") * (lit(10000L) - col("disc_bp")))
        .withColumn("charge_cbp", expr(
          "(price_c * (10000 - disc_bp) * (10000 + tax_bp)) DIV 10000"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("qty_c").as("sum_qty_c"),
          sum("price_c").as("sum_base_price_c"),
          sum("disc_price_cbp").as("sum_disc_price_cbp"),
          sum("charge_cbp").as("sum_charge_cbp"),
          sum("disc_bp").as("sum_disc_bp"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty_c", expr("sum_qty_c DIV count_order"))
        .withColumn("avg_price_c",
          expr("sum_base_price_c DIV count_order"))
        .withColumn("avg_disc_bp", expr("sum_disc_bp DIV count_order"))
        .drop("sum_disc_bp")
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q6 (forecasting revenue change): the maximally selective
    // scan — three range predicates that must ALL reach the parquet
    // reader (a year of shipdates, a discount band, a quantity cap) and
    // one global sum. Revenue accumulates as exact cent-bp integers
    // (price cents x discount bp). The discount band compares snapped
    // INTEGER bp (>= 500, <= 700), not floats — 0.05 is not exactly
    // representable and a double literal comparison could disagree
    // across engines at the boundary.
    "sql_tpch_q6" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate").cast("date") >=
            lit("1996-01-01").cast("date") &&
          col("l_shipdate").cast("date") < lit("1997-01-01").cast("date")
          && col("l_quantity") < 24)
        .select(
          round(col("l_extendedprice") * 100).cast("long").as("price_c"),
          round(col("l_discount") * 10000).cast("long").as("disc_bp"))
        .filter(col("disc_bp") >= 500 && col("disc_bp") <= 700)
        .agg(count(lit(1)).as("n_items"),
          sum(col("price_c") * col("disc_bp")).as("revenue_cbp"))),

    // TPC-H Q3 (shipping priority): the canonical join benchmark —
    // segment-filtered customers x unshipped orders x future lineitems,
    // revenue per order in exact cent-bp, top-10 by revenue. The
    // customer dim broadcasts; the orders-lineitem join shuffles once
    // on orderkey; TakeOrdered replaces any global sort. (The synthetic
    // orders table has no o_shippriority; o_orderpriority stands in.)
    "sql_tpch_q3" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate").cast("date") <
          lit("1998-01-01").cast("date"))
        .select("o_orderkey", "o_custkey", "o_orderdate",
          "o_orderpriority")
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate").cast("date") >
          lit("1998-01-01").cast("date"))
        .select(col("l_orderkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(10000L) -
              round(col("l_discount") * 10000).cast("long")))
            .as("rev_cbp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"),
          col("o_orderdate").cast("date").cast("string")
            .as("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum("rev_cbp").as("revenue_cbp"))
        .orderBy(col("revenue_cbp").desc, col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue_cbp", "o_orderdate",
          "o_orderpriority")
    }),

    // TPC-H Q4 (order priority checking), adapted to this schema's
    // columns: orders in a quarter that have AT LEAST ONE late line
    // (shipped > 90 days after the order date — the synthetic lineitem
    // has no commit/receipt dates), counted by priority. The EXISTS
    // becomes a left-semi join whose right side reduces to (orderkey,
    // max lateness) BEFORE the join: the semi-join input shuffles one
    // row per order, not per lineitem.
    "sql_tpch_q4" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate").cast("date") >=
            lit("1996-01-01").cast("date") &&
          col("o_orderdate").cast("date") <
            lit("1996-04-01").cast("date"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val late = Tables.lineitem(s, d)
        .select("l_orderkey", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")) > 90)
        .select(col("l_orderkey").as("late_key")).distinct()
      o.join(late, o("o_orderkey") === col("late_key"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q5 (local supplier volume): the full star join — lineitem
    // x orders x customer x supplier x nation x region with the
    // LOCAL-supplier equi-condition (customer and supplier share a
    // nation), revenue per nation in exact cent-bp. Plan shape: the
    // three dims broadcast; the two fact relations shuffle once on
    // orderkey; the nation rollup rides map-side combine. The
    // c_nationkey = s_nationkey predicate applies AFTER the supplier
    // join (it correlates the two branches — exactly the join Catalyst
    // cannot push into either scan).
    "sql_tpch_q5" -> ((s, d) => {
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
        .select("r_regionkey")
      val n = Tables.nation(s, d)
        .select("n_nationkey", "n_name", "n_regionkey")
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate").cast("date") >=
            lit("1996-01-01").cast("date") &&
          col("o_orderdate").cast("date") <
            lit("1997-01-01").cast("date"))
        .select("o_orderkey", "o_custkey")
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(10000L) -
              round(col("l_discount") * 10000).cast("long")))
            .as("rev_cbp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .filter(col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum("rev_cbp").as("revenue_cbp"))
        .orderBy(col("revenue_cbp").desc, col("n_name"))
    }),

    // TPC-H Q2 (minimum-cost supplier), adapted to this schema: the
    // partsupp relation derives from lineitem (min unit price in cents
    // per (part, supplier) — truncating division of non-negative
    // operands), the region is EUROPE, size-15 parts. The CORRELATED
    // min-subquery decorrelates into a per-part min over the same
    // filtered supply relation joined back on (partkey, cost) —
    // explicitly the rewrite Catalyst performs on the literal form, so
    // the plan is two hash aggregates and equi-joins, no per-row
    // subquery execution; the DuckDB oracle states the correlated
    // subquery verbatim (scale-safe plan vs declarative spec). Money
    // in exact integer cents; ordering total (s_name unique).
    "sql_tpch_q2" -> ((s, d) => {
      val ps = Tables.lineitem(s, d)
        .select(col("l_partkey").as("partkey"),
          col("l_suppkey").as("suppkey"),
          expr("""(CAST(round(l_extendedprice * 100) AS BIGINT) * 100)
                  DIV CAST(round(l_quantity * 100) AS BIGINT)""")
            .as("unit_c"))
        .groupBy("partkey", "suppkey").agg(min("unit_c").as("cost_c"))
      val r = Tables.region(s, d).filter(col("r_name") === "EUROPE")
        .select("r_regionkey")
      val n = Tables.nation(s, d)
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val sup = Tables.supplier(s, d)
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          round(col("s_acctbal") * 100).cast("long").as("acctbal_c"))
      val eu = ps.join(broadcast(sup), col("suppkey") === col("s_suppkey"))
      val minCost = eu.groupBy(col("partkey").as("mk"))
        .agg(min("cost_c").as("min_c"))
      val p = Tables.part(s, d).filter(col("p_size") === 15)
        .select("p_partkey")
      eu.join(minCost,
          col("partkey") === col("mk") && col("cost_c") === col("min_c"))
        .join(broadcast(p), col("partkey") === col("p_partkey"))
        .select(col("acctbal_c").as("s_acctbal_c"), col("s_name"),
          col("n_name"), col("p_partkey"))
        .orderBy(col("s_acctbal_c").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q7 (volume shipping): the two-paths-to-one-dimension shape
    // — lineitem reaches nation once through the supplier and once
    // through the customer, with a disjunctive cross-pair filter and a
    // year rollup. Adapted: the two "trading nations" become the two
    // nationkey-parity blocs (a literal nation pair is empty at the
    // smallest SF's 10 suppliers), keeping both join paths, the
    // disjunction, and the (supp, cust, year) grouping. Revenue in
    // exact cent-basis-points.
    "sql_tpch_q7" -> ((s, d) => {
      val n = Tables.nation(s, d)
        .select(col("n_nationkey"),
          when(col("n_nationkey") % 2 === 0, "BLOC_EVEN")
            .otherwise("BLOC_ODD").as("bloc"))
      val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("bloc").as("cust_bloc"))
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("bloc").as("supp_bloc"))
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate").cast("date")).cast("long").as("l_year"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
            .as("rev_cbp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .filter(col("supp_bloc") =!= col("cust_bloc"))
        .groupBy("supp_bloc", "cust_bloc", "l_year")
        // rev_cbp ~1e11/row: a BIGINT sum wraps silently (non-ANSI)
        // past ~9e7 rows per (bloc,bloc,year) cell while DuckDB sums
        // in HUGEINT — accumulate in decimal(38,0) so the sum itself
        // is exact at any SF; the final BIGINT cast only leaves Int64
        // once a cell's true revenue tops 9.2e18 cbp (~$9.2e11)
        .agg(sum(col("rev_cbp").cast("decimal(38,0)")).as("rev_d"))
        .select(col("supp_bloc"), col("cust_bloc"), col("l_year"),
          col("rev_d").cast("long").as("revenue_cbp"))
        .orderBy("supp_bloc", "cust_bloc", "l_year")
    }),

    // TPC-H Q8 (national market share): of the PROMO-part revenue sold
    // to ASIA-region customers, the share supplied by NATION_3
    // suppliers, per order year — the two-sided dimension star
    // (customer → nation → region on one side, supplier → nation on
    // the other) collapsing to one conditional aggregate; share in
    // exact integer basis points.
    "sql_tpch_q8" -> ((s, d) => {
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
        .select("r_regionkey")
      val nc = Tables.nation(s, d)
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nk"))
      val c = Tables.customer(s, d)
        .join(broadcast(nc), col("c_nationkey") === col("c_nk"))
        .select("c_custkey")
      val supN = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"),
          (col("n_name") === "NATION_3").as("is_target"))
      val p = Tables.part(s, d).filter(col("p_type") === "PROMO")
        .select("p_partkey")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate").cast("date")).cast("long").as("o_year"))
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
            .as("rev_cbp"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .groupBy("o_year")
        // both sums accumulate in decimal(38,0) — see the q7 comment
        .agg(sum(when(col("is_target"), col("rev_cbp")).otherwise(0L)
            .cast("decimal(38,0)")).as("target_d"),
          sum(col("rev_cbp").cast("decimal(38,0)")).as("total_d"))
        .select(col("o_year"),
          col("target_d").cast("long").as("target_cbp"),
          col("total_d").cast("long").as("total_cbp"),
          expr("CAST((target_d * 10000) DIV total_d AS BIGINT)")
            .as("mkt_share_bp"))
        .orderBy("o_year")
    }),

    // TPC-H Q9 (product-type profit): profit per (supplier nation,
    // order year) over 'widget' parts, with supply cost derived from
    // the same lineitem-min unit price as Q2 (this schema has no
    // partsupp): amount_cbp = rev_cbp − qty_c·cost_c·100 (both sides
    // exact cent-basis-points; the cost product rescales centi-units ×
    // cents into cbp). The profit can be negative — sums stay exact
    // Int64 far past these SFs.
    "sql_tpch_q9" -> ((s, d) => {
      val ps = Tables.lineitem(s, d)
        .select(col("l_partkey").as("ps_pk"),
          col("l_suppkey").as("ps_sk"),
          expr("""(CAST(round(l_extendedprice * 100) AS BIGINT) * 100)
                  DIV CAST(round(l_quantity * 100) AS BIGINT)""")
            .as("unit_c"))
        .groupBy("ps_pk", "ps_sk").agg(min("unit_c").as("cost_c"))
      val p = Tables.part(s, d)
        .filter(col("p_name").contains("widget")).select("p_partkey")
      val supN = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate").cast("date")).cast("long").as("o_year"))
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          round(col("l_quantity") * 100).cast("long").as("qty_c"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
            .as("rev_cbp"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(ps, col("l_partkey") === col("ps_pk") &&
          col("l_suppkey") === col("ps_sk"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .select(col("n_name").as("nation"), col("o_year"),
          (col("rev_cbp") - col("qty_c") * col("cost_c") * 100L)
            .as("amount_cbp"))
        .groupBy("nation", "o_year")
        // decimal(38,0) accumulation — see the q7 comment (amounts can
        // be negative; the sum stays exact either sign)
        .agg(sum(col("amount_cbp").cast("decimal(38,0)")).as("profit_d"))
        .select(col("nation"), col("o_year"),
          col("profit_d").cast("long").as("profit_cbp"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q10 (returned-item reporting): customers ranked by the
    // revenue they returned in one quarter — the
    // filter-then-join-then-top-N shape. Exact cents/basis points;
    // c_custkey in the sort keys makes the LIMIT total.
    "sql_tpch_q10" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate").cast("date") >=
            lit("1996-01-01").cast("date") &&
          col("o_orderdate").cast("date") <
            lit("1996-04-01").cast("date"))
        .select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
            .as("rev_cbp"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal") * 100).cast("long").as("acctbal_c"),
          col("c_nationkey"))
      val n = Tables.nation(s, d).select("n_nationkey", "n_name")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        // decimal(38,0) accumulation — see the q7 comment
        .agg(sum(col("rev_cbp").cast("decimal(38,0)")).as("rev_d"))
        .withColumn("revenue_cbp", col("rev_d").cast("long"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue_cbp", "acctbal_c",
          "n_name")
        .orderBy(col("revenue_cbp").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q14 (promotion effect), widened from the reference's single
    // month to a per-month series: the share of each month's revenue
    // carried by PROMO-type parts, as one conditional aggregate over
    // the join — promo_share_bp is an exact integer division of two
    // cbp sums.
    "sql_tpch_q14" -> ((s, d) => {
      val p = Tables.part(s, d).select(col("p_partkey"),
        (col("p_type") === "PROMO").as("is_promo"))
      val l = Tables.lineitem(s, d)
        .select(col("l_partkey"),
          to_date(date_trunc("month", col("l_shipdate"))).cast("string")
            .as("month"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
            .as("rev_cbp"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("month")
        // decimal(38,0) end-to-end: both the sums themselves (see the
        // q7 comment) and the *10000 share product would wrap Int64 at
        // large SF while DuckDB's HUGEINT stays exact — the
        // orders_status_pchart divergence class
        .agg(sum(when(col("is_promo"), col("rev_cbp")).otherwise(0L)
            .cast("decimal(38,0)")).as("promo_d"),
          sum(col("rev_cbp").cast("decimal(38,0)")).as("total_d"))
        .select(col("month"),
          col("promo_d").cast("long").as("promo_cbp"),
          col("total_d").cast("long").as("total_cbp"),
          expr("CAST((promo_d * 10000) DIV total_d AS BIGINT)")
            .as("promo_share_bp"))
        .orderBy("month")
    }),

    // TPC-H Q15 (top supplier): the view-plus-scalar-max shape — each
    // supplier's revenue over one quarter, keeping exactly the
    // supplier(s) attaining the maximum via a broadcast scalar
    // aggregate (the literal query's correlated MAX subquery,
    // decorrelated). Integer cbp end-to-end, so "equals the max" is
    // exact on both engines.
    "sql_tpch_q15" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate").cast("date") >=
            lit("1996-01-01").cast("date") &&
          col("l_shipdate").cast("date") <
            lit("1996-04-01").cast("date"))
        .select(col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
            .as("rev_cbp"))
        .groupBy("l_suppkey")
        // decimal(38,0) accumulation — see the q7 comment; the max and
        // the equality filter stay in decimal, so "attains the max" is
        // exact at any SF
        .agg(sum(col("rev_cbp").cast("decimal(38,0)")).as("total_d"))
      val mx = rev.agg(max("total_d").as("max_d"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_d") === col("max_d"))
        .join(broadcast(Tables.supplier(s, d)
          .select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_d").cast("long").as("total_cbp"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q19 (discounted revenue, disjunctive predicates): three
    // OR'd (brand, size-range, quantity-range) conjunct groups over
    // the lineitem⋈part join — the shape that tests OR-of-ANDs
    // predicate handling (the part-side conjuncts still prune the
    // broadcast dim; the mixed l/p residual evaluates post-join).
    // One output row (RegistrySpec single-row exemption); exact cbp.
    "sql_tpch_q19" -> ((s, d) => {
      val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
      val l = Tables.lineitem(s, d)
        .select(col("l_partkey"),
          round(col("l_quantity") * 100).cast("long").as("qty_c"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
            .as("rev_cbp"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 10)
            && col("qty_c").between(100L, 2000L)) ||
          (col("p_brand") === "Brand#22" && col("p_size").between(10, 25)
            && col("qty_c").between(1000L, 3500L)) ||
          (col("p_brand") === "Brand#25" && col("p_size").between(20, 40)
            && col("qty_c").between(2000L, 5000L)))
        .agg(sum("rev_cbp").as("revenue_cbp"))
    }),

    // TPC-H Q21 (suppliers who kept orders waiting): the
    // EXISTS + NOT-EXISTS double-correlation shape — a supplier is
    // charged with an order iff it shipped late (> 60 days after the
    // order date), some OTHER supplier was also on the order, and NO
    // other supplier shipped late. Decorrelated into per-order
    // aggregates (distinct supplier count, distinct LATE supplier
    // count): charge iff n_supp > 1 and n_late = 1 and the late one is
    // this supplier — equivalent because "no other late" with this one
    // late means exactly one late supplier. Integer day arithmetic.
    "sql_tpch_q21" -> ((s, d) => {
      // ONE aggregation chain instead of the EXISTS/NOT-EXISTS
      // self-joins (or their double-countDistinct decorrelation, whose
      // Expand doubled every fact row through the shuffle and whose
      // distinct+join re-shuffled the relation twice — measured 1.31
      // exponent on the 6M→60M rung): collapse to one row per
      // (order, supplier) with an any-late flag — this groupBy reuses
      // the join's l_orderkey hash partitioning, so it adds NO
      // shuffle — then a window over l_orderkey (same partitioning
      // again) counts suppliers and late suppliers per order. The only
      // post-join shuffle left is the final small per-supplier count.
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate")
      val l = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (datediff(col("l_shipdate").cast("date"),
            col("o_orderdate").cast("date")) > 60).as("late"))
      val perSupp = l.groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(col("late"), 1L).otherwise(0L)).as("late"))
      val w = Window.partitionBy("l_orderkey")
      perSupp
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_late", sum(col("late")).over(w))
        .filter(col("late") === 1L && col("n_supp") > 1 &&
          col("n_late") === 1)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("l_suppkey"))
    }),

    // TPC-H Q17 (small-quantity-order revenue): the correlated AVG
    // subquery shape — lineitems of one brand's parts whose quantity
    // sits below 20% of that part's average quantity, summed and
    // divided by 7. Decorrelated: per-part (count, quantity-sum) over
    // the brand-filtered lineitems (the subquery ranges over ALL
    // lineitems of the part, and only brand parts can qualify, so the
    // semi-join-first order is equivalent), joined back; the 0.2·avg
    // comparison clears to the integer cross-product
    // 5·qty·n < sum_qty. One output row (RegistrySpec single-row
    // exemption); cents throughout, truncating DIV of non-negative
    // operands.
    "sql_tpch_q17" -> ((s, d) => {
      val p = Tables.part(s, d).filter(col("p_brand") === "Brand#13")
        .select("p_partkey")
      val l = Tables.lineitem(s, d)
        .select(col("l_partkey"),
          round(col("l_quantity") * 100).cast("long").as("qty_c"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val stats = l.groupBy(col("l_partkey").as("pk"))
        .agg(count(lit(1)).as("n"), sum("qty_c").as("sq"))
      l.join(stats, col("l_partkey") === col("pk"))
        .filter(col("qty_c") * 5 * col("n") < col("sq"))
        .agg(expr("CAST(sum(price_c) DIV 7 AS BIGINT)")
          .as("avg_yearly_c"))
    }),

    // TPC-H Q22 (global sales opportunity): the anti-join +
    // scalar-avg-subquery shape — customers of five nations with an
    // account balance above the average POSITIVE balance of that
    // cohort and no urgent order (the anti-join predicate; this
    // generator gives every customer some order, so the reference's
    // no-orders-at-all test would be vacuous), rolled up per nation.
    // The average is one truncating integer division of positive
    // cents; the comparison is exact on both engines.
    "sql_tpch_q22" -> ((s, d) => {
      val nsel = Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_3", "NATION_5",
          "NATION_7", "NATION_9"))
        .select("n_nationkey", "n_name")
      val c = Tables.customer(s, d)
        .join(broadcast(nsel), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"),
          round(col("c_acctbal") * 100).cast("long").as("acctbal_c"))
      val avgPos = c.filter(col("acctbal_c") > 0)
        .agg(expr("CAST(sum(acctbal_c) DIV count(1) AS BIGINT)")
          .as("avg_c"))
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority").startsWith("1-"))
        .select("o_custkey")
      c.crossJoin(broadcast(avgPos))
        .filter(col("acctbal_c") > col("avg_c"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("n_name")
        .agg(count(lit(1)).as("numcust"),
          sum("acctbal_c").as("totacctbal_c"))
        .orderBy("n_name")
    }),

    // TPC-H Q13 (customer order-count distribution): the
    // outer-join-with-join-predicate shape the exhibit exists to test —
    // urgent orders are excluded IN the join condition, not a WHERE, so
    // customers with only urgent orders surface at c_count = 0 instead
    // of dropping out — then two stacked counts. All-integer; both
    // aggregates partial-combine map-side.
    "sql_tpch_q13" -> ((s, d) => {
      val c = Tables.customer(s, d).select("c_custkey")
      val o = Tables.orders(s, d)
        .filter(!col("o_orderpriority").startsWith("1-"))
        .select("o_orderkey", "o_custkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q18 (large-volume customers): the agg-in-semi-join shape —
    // orders whose total lineitem quantity exceeds 200 units (threshold
    // adapted to this generator's short orders; the reference 300 is
    // above its max), pre-aggregated per order and joined back with
    // customer/order attributes. The HAVING relation already carries
    // the quantity sum, so the literal query's re-aggregation after
    // the IN-subquery collapses into one join. Quantities in exact
    // integer centi-units, totalprice in cents; ordering total via
    // o_orderkey.
    "sql_tpch_q18" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          round(col("l_quantity") * 100).cast("long").as("qty_c"))
      val big = l.groupBy("l_orderkey").agg(sum("qty_c").as("sum_qty_c"))
        .filter(col("sum_qty_c") > 20000L)
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").cast("string").as("o_orderdate"),
          round(col("o_totalprice") * 100).cast("long").as("totalprice_c"))
      val c = Tables.customer(s, d).select("c_custkey", "c_name")
      o.join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
          "totalprice_c", "sum_qty_c")
        .orderBy(col("totalprice_c").desc, col("o_orderdate"),
          col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q11 (important stock identification): per-part inventory
    // value from the lineitem-derived pseudo-partsupp (this schema has
    // no partsupp — same derivation as Q2/Q9: per (part, supplier) the
    // min observed unit price is the supply cost, total shipped
    // centi-qty the stock), restricted to NATION_3 suppliers, keeping
    // parts whose value exceeds a scalar fraction (1/10000) of the
    // grand total — the group-by-vs-scalar-subquery HAVING shape. The
    // per-pair product value_x (~1e11) is exact Int64; per-part and
    // grand-total sums accumulate in decimal(38,0) so the HAVING
    // compare never wraps at any SF, and the scalar total attaches as
    // a 1-row broadcast, not a recomputation per group.
    "sql_tpch_q11" -> ((s, d) => {
      val supN = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name") === "NATION_3").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val ps = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
          round(col("l_quantity") * 100).cast("long").as("qty_c"),
          expr("""(CAST(round(l_extendedprice * 100) AS BIGINT) * 100)
                  DIV CAST(round(l_quantity * 100) AS BIGINT)""")
            .as("unit_c"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(min("unit_c").as("cost_c"), sum("qty_c").as("avail_qc"))
      val perPart = ps
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"),
          (col("cost_c") * col("avail_qc")).as("value_x"))
        .groupBy("l_partkey")
        .agg(sum(col("value_x").cast("decimal(38,0)")).as("value_d"))
      val total = perPart.agg(sum("value_d").as("total_d"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value_d") * 10000 > col("total_d"))
        .select(col("l_partkey").as("p_partkey"),
          col("value_d").cast("long").as("value_x"))
        .orderBy(col("value_x").desc, col("p_partkey"))
    }),

    // TPC-H Q12 (shipping modes / order priority): this schema has no
    // l_shipmode or commit/receipt dates, so the mode is the return
    // flag (two of three picked, like the query's two ship modes) and
    // "late" is shipped more than 60 days after the order date. Same
    // two-level conditional aggregate: per mode, how many late 1996
    // lines belonged to high-priority orders vs the rest. The date
    // predicates push into the lineitem scan; orders joins pre-pruned
    // to two columns.
    "sql_tpch_q12" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate").cast("date").as("odate"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("A", "R"))
        .select(col("l_orderkey"), col("l_returnflag").as("ship_mode"),
          col("l_shipdate").cast("date").as("sdate"))
        .filter(col("sdate") >= lit("1996-01-01").cast("date") &&
          col("sdate") < lit("1997-01-01").cast("date"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("sdate") > date_add(col("odate"), 60))
        .groupBy("ship_mode")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            1L).otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            0L).otherwise(1L)).as("low_line_count"))
        .orderBy("ship_mode")
    }),

    // TPC-H Q16 (parts/supplier relationship): distinct-supplier count
    // per (brand, type, size) over the lineitem-derived part-supplier
    // pairs, excluding one brand, a type prefix, a size list, and —
    // the NOT IN anti-join — suppliers under a complaints proxy
    // (acctbal below $1000; the schema has no s_comment). The
    // complaint set is key-only and broadcast, so the anti-join never
    // shuffles the pair relation; countDistinct partial-aggregates on
    // (brand,type,size,suppkey) before the final shuffle.
    "sql_tpch_q16" -> ((s, d) => {
      val p = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#13" &&
          !col("p_type").startsWith("PROMO") &&
          col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val complaints = Tables.supplier(s, d)
        .filter(round(col("s_acctbal") * 100).cast("long") < 100000L)
        .select(col("s_suppkey").as("bad_sk"))
      Tables.lineitem(s, d)
        .select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(complaints), col("l_suppkey") === col("bad_sk"),
          "left_anti")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"),
          col("p_type"), col("p_size"))
    }),

    // TPC-H Q20 (potential part promotion): NATION_3 suppliers of
    // 'rod' parts whose all-time shipped centi-qty (the pseudo
    // availqty) exceeds twice what they shipped in 1996 — the nested
    // correlated-aggregate semi-join. The original's
    // availqty > 0.5 * qty_year comparison is cleared of its half
    // (avail > 2 * shipped, integer-exact both engines), and the
    // correlated agg decorrelates into ONE grouped aggregate over the
    // rod-part lines; qualifying supplier keys then semi-join the
    // supplier dim, so nothing wider than keys crosses a shuffle.
    "sql_tpch_q20" -> ((s, d) => {
      val rods = Tables.part(s, d)
        .filter(col("p_name").contains("rod")).select("p_partkey")
      val qualifying = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
          round(col("l_quantity") * 100).cast("long").as("qty_c"),
          (year(col("l_shipdate").cast("date")) === 1996).as("in96"))
        .join(broadcast(rods), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum("qty_c").as("avail_qc"),
          sum(when(col("in96"), col("qty_c")).otherwise(0L)).as("qc96"))
        .filter(col("qc96") > 0L &&
          col("avail_qc") > lit(2L) * col("qc96"))
        .select("l_suppkey").distinct()
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name") === "NATION_3").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(qualifying, col("s_suppkey") === col("l_suppkey"),
          "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // Entity-resolution candidate pairs over the part catalog: block on
    // the head noun (last name token), pair DISTINCT names within each
    // block, match on levenshtein <= 3, and weight each surviving pair
    // by how many concrete row-pairs it would merge (n_a * n_b). The
    // pairwise (quadratic) work runs on the distinct-entity relation —
    // dictionary-bounded at any SF — never on fact rows; the fact table
    // only contributes counts. That canonicalize-then-block shape is
    // what keeps ER feasible at 100 TB: the blocks bound the candidate
    // set, and the edit-distance kernel sees each entity string once.
    "er_blocked_pairs" -> ((s, d) => {
      val names = Tables.part(s, d)
        .select(col("p_name"),
          element_at(split(col("p_name"), " "), -1).as("blk"))
        .groupBy("blk", "p_name").agg(count(lit(1)).as("n"))
      val a = names.select(col("blk"), col("p_name").as("name_a"),
        col("n").as("n_a"))
      val b = names.select(col("blk").as("blk_b"),
        col("p_name").as("name_b"), col("n").as("n_b"))
      a.join(b, col("blk") === col("blk_b") &&
          col("name_a") < col("name_b"))
        .withColumn("dist",
          levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("dist") <= 3)
        .select(col("blk"), col("name_a"), col("name_b"), col("dist"),
          (col("n_a") * col("n_b")).as("pair_weight"))
        .orderBy("blk", "name_a", "name_b")
    }),
  )

  val oracles: Map[String, String] = Map(
    "stats_mad" ->
      """WITH b AS (SELECT l_returnflag AS g, l_extendedprice AS x
                    FROM lineitem),
          r AS (SELECT g, x,
                       row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
                       count(*) OVER (PARTITION BY g) AS n
                FROM b),
          m AS (SELECT g, max(CASE WHEN rn = ceil(0.5 * n) THEN x END)
                         AS med
                FROM r GROUP BY g),
          d AS (SELECT b.g, m.med, abs(b.x - m.med) AS d
                FROM b JOIN m ON b.g = m.g),
          r2 AS (SELECT g, med, d,
                        row_number() OVER (PARTITION BY g ORDER BY d) AS rn,
                        count(*) OVER (PARTITION BY g) AS n
                 FROM d)
         SELECT g AS l_returnflag, round(max(med), 2) AS median,
                round(max(CASE WHEN rn = ceil(0.5 * n) THEN d END), 2)
                  AS mad
         FROM r2 GROUP BY g ORDER BY g""",

    "stats_percentiles" ->
      """WITH r AS (SELECT l_returnflag, l_extendedprice,
                row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice) AS rn,
                count(*) OVER (PARTITION BY l_returnflag) AS n
              FROM lineitem)
         SELECT l_returnflag,
                max(CASE WHEN rn = ceil(0.5 * n) THEN l_extendedprice END) AS p50,
                max(CASE WHEN rn = ceil(0.9 * n) THEN l_extendedprice END) AS p90,
                max(CASE WHEN rn = ceil(0.99 * n) THEN l_extendedprice END) AS p99
         FROM r GROUP BY l_returnflag ORDER BY l_returnflag""",

    "stats_sampled_percentiles" ->
      """WITH li AS (SELECT l_returnflag,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                ('0x' || substring(md5(l_orderkey::VARCHAR || '_' ||
                   l_linenumber::VARCHAR || '_' || 'pctl'), 1, 15))
                  ::BIGINT AS h
              FROM lineitem),
          r AS (SELECT l_returnflag, cents,
                  row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY cents) AS rn,
                  count(*) OVER (PARTITION BY l_returnflag) AS n
                FROM li),
          ex AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_exact,
                   max(CASE WHEN rn = ceil(0.5 * n) THEN cents END)
                     AS p50_exact,
                   max(CASE WHEN rn = ceil(0.9 * n) THEN cents END)
                     AS p90_exact,
                   max(CASE WHEN rn = ceil(0.99 * n) THEN cents END)
                     AS p99_exact
                 FROM r GROUP BY 1),
          r2 AS (SELECT l_returnflag, cents,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY cents) AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
                 FROM li WHERE h % 256 < 16),
          sm AS (SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n_sample,
                   max(CASE WHEN rn = ceil(0.5 * n) THEN cents END)
                     AS p50_sample,
                   max(CASE WHEN rn = ceil(0.9 * n) THEN cents END)
                     AS p90_sample,
                   max(CASE WHEN rn = ceil(0.99 * n) THEN cents END)
                     AS p99_sample
                 FROM r2 GROUP BY 1)
          SELECT e.l_returnflag, n_exact, p50_exact, p90_exact, p99_exact,
                 n_sample, p50_sample, p90_sample, p99_sample,
                 CAST(abs(p50_sample - p50_exact) * 10000 // p50_exact
                   AS BIGINT) AS err50_bp,
                 CAST(abs(p90_sample - p90_exact) * 10000 // p90_exact
                   AS BIGINT) AS err90_bp,
                 CAST(abs(p99_sample - p99_exact) * 10000 // p99_exact
                   AS BIGINT) AS err99_bp
          FROM ex e JOIN sm s ON e.l_returnflag = s.l_returnflag
          ORDER BY e.l_returnflag""",

    "join_broadcast_agg" ->
      """SELECT c_mktsegment, count(*) AS cnt,
                round(sum(o_totalprice), 2) AS total_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "join_multiway_revenue" ->
      """SELECT r_name,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",

    "join_multiway_revenue_bucketed" ->
      """SELECT r_name,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",

    "join_argmin_supplier" ->
      """WITH u AS (
           SELECT l_partkey, l_suppkey,
                  CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                    // CAST(l_quantity AS BIGINT) AS BIGINT) AS unit_cc
           FROM lineitem),
          c AS (SELECT l_partkey, l_suppkey, unit_cc,
                       unit_cc * 1000000 + l_suppkey AS combo
                FROM u)
          SELECT l_partkey,
                 CAST(arg_min(l_suppkey, combo) AS BIGINT) AS best_suppkey,
                 CAST(min(unit_cc) AS BIGINT) AS best_unit_cc,
                 count(*) AS n_offers
          FROM c GROUP BY l_partkey ORDER BY l_partkey""",

    "sql_multiway_revenue" ->
      """SELECT r_name,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",

    "join_bloom_semi" ->
      """WITH pu AS (SELECT DISTINCT user_id FROM events
                     WHERE event_type = 'purchase'
                       AND user_id % 17 = 0),
          bits AS (SELECT DISTINCT
                     ('0x' || substring(md5(r::VARCHAR || ':' ||
                       user_id::VARCHAR), 1, 15))::BIGINT % 2048 AS bit
                   FROM pu, range(0, 4) q(r)),
          cl AS (SELECT event_id, user_id FROM events
                 WHERE event_type = 'click'),
          hp AS (SELECT event_id
                 FROM (SELECT c.event_id, q.r,
                         ('0x' || substring(md5(q.r::VARCHAR || ':' ||
                           c.user_id::VARCHAR), 1, 15))::BIGINT % 2048
                           AS bit
                       FROM cl c, range(0, 4) q(r)) x
                 JOIN bits USING (bit)
                 GROUP BY event_id HAVING count(*) = 4),
          tr AS (SELECT count(*) AS n_true FROM cl
                 WHERE user_id IN (SELECT user_id FROM pu)),
          nb AS (SELECT count(*) AS n_bloom_pass FROM hp),
          nc AS (SELECT count(*) AS n_clicks FROM cl)
          SELECT n_clicks, n_bloom_pass, n_true,
                 n_bloom_pass - n_true AS n_false_pos,
                 CASE WHEN n_clicks - n_true = 0 THEN 0
                 ELSE ((n_bloom_pass - n_true) * 10000)
                      // (n_clicks - n_true) END AS fpr_bp
          FROM nb, nc, tr""",

    "sql_lateral_topn" ->
      """SELECT n.n_name, t.c_custkey, t.acctbal
         FROM nation n,
         LATERAL (SELECT c_custkey, round(c_acctbal, 2) AS acctbal
                  FROM customer
                  WHERE c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_custkey ASC
                  LIMIT 2) t
         ORDER BY n.n_name, t.acctbal DESC, t.c_custkey""",

    "sql_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
                coalesce(l_linestatus, 'ALL') AS status,
                count(*) AS cnt
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY 1, 2""",

    "sql_recursive_rollup" ->
      """WITH RECURSIVE chain AS (
           SELECT user_id AS u, user_id AS anc
           FROM (SELECT DISTINCT user_id FROM events WHERE user_id >= 1)
           UNION ALL
           SELECT u, anc // 2 FROM chain WHERE anc > 1),
         t AS (SELECT user_id AS u, count(*) AS n_ev, sum("value") AS sv
               FROM events WHERE user_id >= 1 GROUP BY user_id)
         SELECT c.anc AS node, count(*) AS n_desc,
                CAST(sum(t.n_ev) AS BIGINT) AS n_events,
                round(sum(t.sv), 2) AS subtree_value
         FROM chain c JOIN t ON c.u = t.u
         GROUP BY c.anc ORDER BY node""",

    "udaf_weighted_mean" ->
      """SELECT l_returnflag,
                round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2)
                  AS wmean_price
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "stats_corr" ->
      """SELECT l_returnflag,
                round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
                round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
                round(regr_slope(l_extendedprice, l_quantity), 2) AS slope_pq
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    // identical doubled tie-averaged ranks (2*rank + ties - 1, exact
    // integers) feed the same rounded corr on both engines
    "stats_spearman" ->
      """WITH r AS (SELECT l_returnflag,
                 2 * rank() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_quantity)
                   + count(*) OVER (PARTITION BY l_returnflag,
                                    l_quantity) - 1 AS r2q,
                 2 * rank() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice)
                   + count(*) OVER (PARTITION BY l_returnflag,
                                    l_extendedprice) - 1 AS r2p
          FROM lineitem)
          SELECT l_returnflag, round(corr(r2q, r2p), 4) AS spearman_qp,
                 count(*) AS n
          FROM r GROUP BY 1 ORDER BY 1""",

    "join_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT)
                      AS n_cust
                    FROM customer GROUP BY 1),
          s AS (SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT)
                  AS n_supp
                FROM supplier WHERE s_nationkey % 3 = 0 GROUP BY 1)
         SELECT CAST(coalesce(c.nk, s.nk) AS BIGINT) AS nationkey,
                coalesce(n_cust, 0) AS n_cust,
                coalesce(n_supp, 0) AS n_supp
         FROM c FULL OUTER JOIN s ON c.nk = s.nk
         ORDER BY nationkey""",

    "stats_percentiles_cont" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_cont,
                round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_cont,
                round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_cont
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    // the ok-flags assert the Spark sketch landed within 2% of the exact
    // percentile — DuckDB states the expected verdict, Spark earns it
    "stats_percentiles_approx" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_cont,
                round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_cont,
                round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_cont,
                CAST(1 AS BIGINT) AS p50_ok,
                CAST(1 AS BIGINT) AS p90_ok,
                CAST(1 AS BIGINT) AS p99_ok
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "stats_welch_ttest" ->
      """WITH a AS (
           SELECT count(*) FILTER (event_type = 'purchase') AS n_p,
                  avg("value") FILTER (event_type = 'purchase') AS m_p,
                  var_samp("value") FILTER (event_type = 'purchase') AS v_p,
                  count(*) FILTER (event_type = 'click') AS n_c,
                  avg("value") FILTER (event_type = 'click') AS m_c,
                  var_samp("value") FILTER (event_type = 'click') AS v_c
           FROM events)
         SELECT CAST(n_p AS BIGINT) AS n_p, CAST(n_c AS BIGINT) AS n_c,
                round(m_p - m_c, 4) AS mean_diff,
                round((m_p - m_c) / sqrt(v_p / n_p + v_c / n_c), 4)
                  AS t_stat,
                round(pow(v_p / n_p + v_c / n_c, 2) /
                      (pow(v_p / n_p, 2) / (n_p - 1) +
                       pow(v_c / n_c, 2) / (n_c - 1)), 2) AS df_welch
         FROM a ORDER BY n_p""",

    "stats_histogram" ->
      """SELECT least(9, floor(o_totalprice / 50000))::BIGINT AS bucket,
                count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price
         FROM orders GROUP BY 1 ORDER BY 1""",

    "join_skew_salted" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum("value"), 2) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "window_ntile" ->
      """SELECT c_custkey, c_mktsegment,
                ntile(4) OVER w AS quartile,
                round(cume_dist() OVER w, 6) AS cd
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal ASC, c_custkey ASC)
         ORDER BY c_custkey""",

    "semi_join_count" ->
      """SELECT c_nationkey, count(*) AS cnt FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_nationkey ORDER BY c_nationkey""",

    "anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_totalprice > 400000)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "window_rank_topn" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "window_running_sum" ->
      """SELECT l_orderkey, l_linenumber,
                round(sum(l_quantity) OVER (PARTITION BY l_orderkey
                  ORDER BY l_linenumber
                  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                  AS running_qty
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "window_lag_gap" ->
      """SELECT o_custkey, o_orderkey,
                CAST(date_diff('day', prev_date, o_orderdate) AS INT) AS gap_days
         FROM (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_date
           FROM orders) t
         WHERE prev_date IS NOT NULL
         ORDER BY o_custkey, o_orderkey""",

    "rollup_count" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
                coalesce(l_linestatus, 'ALL') AS status,
                count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY flag, status""",

    "cube_count" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                coalesce(o_orderpriority, 'ALL') AS priority,
                count(*) AS cnt
         FROM orders
         GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",

    "setop_union" ->
      """SELECT c_nationkey AS nk FROM customer
         UNION
         SELECT s_nationkey AS nk FROM supplier
         ORDER BY nk""",

    "setop_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
         INTERSECT
         SELECT s_nationkey AS nk FROM supplier
         ORDER BY nk""",

    "setop_except" ->
      """SELECT c_custkey AS k FROM customer
         EXCEPT
         SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
         ORDER BY k""",

    "distinct_agg" ->
      """SELECT l_returnflag,
                count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT l_suppkey) AS n_supps,
                count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "stats_agg" ->
      """SELECT l_linestatus,
                round(min(l_extendedprice), 2) AS min_price,
                round(max(l_extendedprice), 2) AS max_price,
                round(avg(l_extendedprice), 2) AS avg_price,
                round(stddev_samp(l_extendedprice), 2) AS sd_price
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",

    "having_filter" ->
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
         GROUP BY o_orderpriority HAVING count(*) > 50
         ORDER BY o_orderpriority""",

    "above_avg_per_group" ->
      """SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
         FROM customer c
         WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                            WHERE c2.c_nationkey = c.c_nationkey)
         ORDER BY c_custkey""",

    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, count(*) AS cnt,
                round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1 ORDER BY hour""",

    "date_filter_agg" ->
      """SELECT o_orderstatus, count(*) AS cnt,
                round(sum(o_totalprice), 2) AS total
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-01-01'
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "orders_open_backlog" ->
      """WITH last AS (SELECT l_orderkey,
                              CAST(max(date_trunc('month', l_shipdate))
                                AS DATE) AS endm
                       FROM lineitem GROUP BY l_orderkey),
          o AS (SELECT o_orderkey,
                       CAST(date_trunc('month', o_orderdate) AS DATE)
                         AS startm
                FROM orders),
          iv AS (SELECT startm, endm FROM o
                 JOIN last ON o_orderkey = l_orderkey),
          del AS (SELECT m, CAST(sum(dl) AS BIGINT) AS delta FROM (
                    SELECT startm AS m, 1 AS dl FROM iv
                    UNION ALL
                    SELECT CAST(endm + INTERVAL 1 MONTH AS DATE), -1
                    FROM iv) u
                  GROUP BY m)
          SELECT CAST(m AS VARCHAR) AS month, delta,
                 CAST(sum(delta) OVER (ORDER BY m
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS open_orders
          FROM del ORDER BY month""",

    "sales_pareto" ->
      """WITH rev AS (SELECT l_partkey,
                             CAST(sum(CAST(round(l_extendedprice *
                               (1.0 - l_discount) * 100) AS BIGINT))
                               AS BIGINT) AS cents
                      FROM lineitem GROUP BY l_partkey),
          t AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM rev),
          c AS (SELECT cents,
                       CAST(sum(cents) OVER (ORDER BY cents DESC,
                           l_partkey ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cum,
                       CAST(row_number() OVER (ORDER BY cents DESC,
                           l_partkey) AS BIGINT) AS rk
                FROM rev),
          p AS (SELECT unnest([5000, 8000, 9500]) AS pct_bp)
          SELECT CAST(p.pct_bp AS BIGINT) AS pct_bp,
                 CAST(min(rk) AS BIGINT) AS n_parts
          FROM c CROSS JOIN t CROSS JOIN p
          WHERE cum * 10000 >= p.pct_bp * t.t
          GROUP BY p.pct_bp ORDER BY pct_bp""",

    "skyline_parts" ->
      """WITH p AS (SELECT p_partkey,
                           CAST(round(p_retailprice * 100) AS BIGINT)
                             AS cents,
                           CAST(p_size AS BIGINT) AS size
                    FROM part)
          SELECT p_partkey, cents, size FROM p a
          WHERE NOT EXISTS (
            SELECT 1 FROM p b
            WHERE b.cents <= a.cents AND b.size <= a.size
              AND (b.cents < a.cents OR b.size < a.size))
          ORDER BY p_partkey""",

    "sql_tpch_q4" ->
      """WITH o AS (SELECT o_orderkey, o_orderdate, o_orderpriority
                    FROM orders
                    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
                      AND CAST(o_orderdate AS DATE) < DATE '1996-04-01')
          SELECT o_orderpriority,
                 CAST(count(*) AS BIGINT) AS order_count
          FROM o
          WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o.o_orderkey
              AND date_diff('day', CAST(o.o_orderdate AS DATE),
                    CAST(l_shipdate AS DATE)) > 90)
          GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "sql_tpch_q5" ->
      """SELECT n_name,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
                  AS BIGINT) AS revenue_cbp
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE c_nationkey = s_nationkey
           AND r_name = 'ASIA'
           AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
           AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
         GROUP BY n_name
         ORDER BY revenue_cbp DESC, n_name""",

    "sql_tpch_q6" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_items,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(round(l_discount * 10000) AS BIGINT))
                  AS BIGINT) AS revenue_cbp
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
           AND l_quantity < 24
           AND CAST(round(l_discount * 10000) AS BIGINT)
             BETWEEN 500 AND 700""",

    // The correlated form stated literally — DuckDB decorrelates it
    // itself; the Spark side registers the explicit rewrite.
    "sql_tpch_q2" ->
      """WITH ps AS (SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                       min((CAST(round(l_extendedprice * 100) AS BIGINT)
                            * 100)
                           // CAST(round(l_quantity * 100) AS BIGINT))
                         AS cost_c
                     FROM lineitem GROUP BY 1, 2),
          eu AS (SELECT partkey, suppkey, cost_c, s_name, n_name,
                        CAST(round(s_acctbal * 100) AS BIGINT)
                          AS acctbal_c
                 FROM ps JOIN supplier ON suppkey = s_suppkey
                         JOIN nation ON s_nationkey = n_nationkey
                         JOIN region ON n_regionkey = r_regionkey
                 WHERE r_name = 'EUROPE')
          SELECT eu.acctbal_c AS s_acctbal_c, eu.s_name, eu.n_name,
                 p.p_partkey
          FROM eu JOIN part p ON eu.partkey = p.p_partkey
          WHERE p.p_size = 15
            AND eu.cost_c = (SELECT min(e2.cost_c) FROM eu e2
                             WHERE e2.partkey = eu.partkey)
          ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey
          LIMIT 100""",

    "sql_tpch_q7" ->
      """WITH n AS (SELECT n_nationkey,
                      CASE WHEN n_nationkey % 2 = 0 THEN 'BLOC_EVEN'
                           ELSE 'BLOC_ODD' END AS bloc
                    FROM nation),
          l AS (SELECT l_orderkey, l_suppkey,
                  CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT)
                    AS l_year,
                  CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
                    AS rev_cbp
                FROM lineitem)
          SELECT ns.bloc AS supp_bloc, nc.bloc AS cust_bloc, l_year,
                 CAST(sum(rev_cbp) AS BIGINT) AS revenue_cbp
          FROM l JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN n nc ON c_nationkey = nc.n_nationkey
                 JOIN n ns ON s_nationkey = ns.n_nationkey
          WHERE ns.bloc <> nc.bloc
          GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "sql_tpch_q8" ->
      """WITH l AS (SELECT l_orderkey, l_partkey, l_suppkey,
                      CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (10000
                           - CAST(round(l_discount * 10000) AS BIGINT))
                        AS rev_cbp
                    FROM lineitem),
          j AS (SELECT year(CAST(o_orderdate AS DATE)) AS o_year,
                       rev_cbp, (ns.n_name = 'NATION_3') AS is_target
                FROM l JOIN part ON l_partkey = p_partkey
                       JOIN orders ON l_orderkey = o_orderkey
                       JOIN customer ON o_custkey = c_custkey
                       JOIN nation nc ON c_nationkey = nc.n_nationkey
                       JOIN region ON nc.n_regionkey = r_regionkey
                       JOIN supplier ON l_suppkey = s_suppkey
                       JOIN nation ns ON s_nationkey = ns.n_nationkey
                WHERE r_name = 'ASIA' AND p_type = 'PROMO')
          SELECT CAST(o_year AS BIGINT) AS o_year,
                 CAST(sum(CASE WHEN is_target THEN rev_cbp ELSE 0 END)
                   AS BIGINT) AS target_cbp,
                 CAST(sum(rev_cbp) AS BIGINT) AS total_cbp,
                 CAST((sum(CASE WHEN is_target THEN rev_cbp ELSE 0 END)
                       * 10000) // sum(rev_cbp) AS BIGINT)
                   AS mkt_share_bp
          FROM j GROUP BY 1 ORDER BY 1""",

    "sql_tpch_q9" ->
      """WITH ps AS (SELECT l_partkey AS ps_pk, l_suppkey AS ps_sk,
                       min((CAST(round(l_extendedprice * 100) AS BIGINT)
                            * 100)
                           // CAST(round(l_quantity * 100) AS BIGINT))
                         AS cost_c
                     FROM lineitem GROUP BY 1, 2),
          l AS (SELECT l_orderkey, l_partkey, l_suppkey,
                  CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
                  CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
                    AS rev_cbp
                FROM lineitem),
          j AS (SELECT ns.n_name AS nation,
                       year(CAST(o_orderdate AS DATE)) AS o_year,
                       rev_cbp - qty_c * cost_c * 100 AS amount_cbp
                FROM l JOIN part ON l_partkey = p_partkey
                       JOIN ps ON l_partkey = ps_pk
                              AND l_suppkey = ps_sk
                       JOIN orders ON l_orderkey = o_orderkey
                       JOIN supplier ON l_suppkey = s_suppkey
                       JOIN nation ns ON s_nationkey = ns.n_nationkey
                WHERE p_name LIKE '%widget%')
          SELECT nation, CAST(o_year AS BIGINT) AS o_year,
                 CAST(sum(amount_cbp) AS BIGINT) AS profit_cbp
          FROM j GROUP BY 1, 2 ORDER BY nation, o_year DESC""",

    "sql_tpch_q10" ->
      """WITH o AS (SELECT o_orderkey, o_custkey FROM orders
                    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
                      AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'),
          l AS (SELECT l_orderkey,
                  CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
                    AS rev_cbp
                FROM lineitem WHERE l_returnflag = 'R'),
          r AS (SELECT o_custkey,
                  CAST(sum(rev_cbp) AS BIGINT) AS revenue_cbp
                FROM l JOIN o ON l_orderkey = o_orderkey
                GROUP BY 1)
          SELECT c_custkey, c_name, revenue_cbp,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
                 n_name
          FROM r JOIN customer ON o_custkey = c_custkey
                 JOIN nation ON c_nationkey = n_nationkey
          ORDER BY revenue_cbp DESC, c_custkey LIMIT 20""",

    "sql_tpch_q14" ->
      """WITH l AS (SELECT l_partkey,
                      CAST(CAST(date_trunc('month', l_shipdate) AS DATE)
                        AS VARCHAR) AS month,
                      CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (10000
                           - CAST(round(l_discount * 10000) AS BIGINT))
                        AS rev_cbp
                    FROM lineitem),
          j AS (SELECT month, rev_cbp,
                       (p_type = 'PROMO') AS is_promo
                FROM l JOIN part ON l_partkey = p_partkey)
          SELECT month,
                 CAST(sum(CASE WHEN is_promo THEN rev_cbp ELSE 0 END)
                   AS BIGINT) AS promo_cbp,
                 CAST(sum(rev_cbp) AS BIGINT) AS total_cbp,
                 CAST((sum(CASE WHEN is_promo THEN rev_cbp ELSE 0 END)
                       * 10000) // sum(rev_cbp) AS BIGINT)
                   AS promo_share_bp
          FROM j GROUP BY month ORDER BY month""",

    // The scalar-MAX subquery stated literally.
    "sql_tpch_q15" ->
      """WITH rev AS (SELECT l_suppkey,
                        CAST(sum(
                          CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (10000 - CAST(round(l_discount * 10000)
                              AS BIGINT))) AS BIGINT) AS total_cbp
                      FROM lineitem
                      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
                        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
                      GROUP BY 1)
          SELECT s_suppkey, s_name, total_cbp
          FROM rev JOIN supplier ON l_suppkey = s_suppkey
          WHERE total_cbp = (SELECT max(total_cbp) FROM rev)
          ORDER BY s_suppkey""",

    "sql_tpch_q19" ->
      """SELECT CAST(sum(
               CAST(round(l_extendedprice * 100) AS BIGINT)
               * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
             AS BIGINT) AS revenue_cbp
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
                AND CAST(round(l_quantity * 100) AS BIGINT)
                  BETWEEN 100 AND 2000)
            OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 25
                AND CAST(round(l_quantity * 100) AS BIGINT)
                  BETWEEN 1000 AND 3500)
            OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 40
                AND CAST(round(l_quantity * 100) AS BIGINT)
                  BETWEEN 2000 AND 5000)""",

    // The double-correlated EXISTS/NOT-EXISTS form stated literally.
    "sql_tpch_q21" ->
      """WITH l AS (SELECT l_orderkey, l_suppkey,
                      (CAST(l_shipdate AS DATE)
                       > CAST(o_orderdate AS DATE)
                         + INTERVAL 60 DAY) AS late
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          lt AS (SELECT DISTINCT l_orderkey, l_suppkey FROM l WHERE late)
          SELECT l1.l_suppkey, CAST(count(*) AS BIGINT) AS numwait
          FROM lt l1
          WHERE EXISTS (SELECT 1 FROM l l2
                        WHERE l2.l_orderkey = l1.l_orderkey
                          AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM lt l3
                            WHERE l3.l_orderkey = l1.l_orderkey
                              AND l3.l_suppkey <> l1.l_suppkey)
          GROUP BY 1 ORDER BY numwait DESC, l_suppkey""",

    // The correlated form stated literally (DuckDB decorrelates).
    "sql_tpch_q17" ->
      """WITH l AS (SELECT l_partkey,
                      CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
                      CAST(round(l_extendedprice * 100) AS BIGINT)
                        AS price_c
                    FROM lineitem),
          lb AS (SELECT l.* FROM l
                 JOIN part ON l_partkey = p_partkey
                 WHERE p_brand = 'Brand#13')
          SELECT CAST(sum(price_c) // 7 AS BIGINT) AS avg_yearly_c
          FROM lb
          WHERE 5 * qty_c * (SELECT count(*) FROM lb x
                             WHERE x.l_partkey = lb.l_partkey)
              < (SELECT sum(qty_c) FROM lb x
                 WHERE x.l_partkey = lb.l_partkey)""",

    "sql_tpch_q22" ->
      """WITH c AS (SELECT c_custkey, n_name,
                      CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c
                    FROM customer JOIN nation ON c_nationkey = n_nationkey
                    WHERE n_name IN ('NATION_1','NATION_3','NATION_5',
                                     'NATION_7','NATION_9')),
          a AS (SELECT CAST(sum(acctbal_c) // count(*) AS BIGINT)
                  AS avg_c
                FROM c WHERE acctbal_c > 0)
          SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
                 CAST(sum(acctbal_c) AS BIGINT) AS totacctbal_c
          FROM c, a
          WHERE acctbal_c > avg_c
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderpriority LIKE '1-%')
          GROUP BY n_name ORDER BY n_name""",

    "sql_tpch_q13" ->
      """WITH oc AS (SELECT c_custkey, count(o_orderkey) AS c_count
                     FROM customer LEFT OUTER JOIN orders
                       ON c_custkey = o_custkey
                      AND o_orderpriority NOT LIKE '1-%'
                     GROUP BY c_custkey)
          SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
          FROM oc GROUP BY c_count
          ORDER BY custdist DESC, c_count DESC""",

    "sql_tpch_q18" ->
      """WITH l AS (SELECT l_orderkey,
                      CAST(round(l_quantity * 100) AS BIGINT) AS qty_c
                    FROM lineitem),
          big AS (SELECT l_orderkey,
                    CAST(sum(qty_c) AS BIGINT) AS sum_qty_c
                  FROM l GROUP BY 1 HAVING sum(qty_c) > 20000)
          SELECT c_name, c_custkey, o_orderkey,
                 CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
                   AS o_orderdate,
                 CAST(round(o_totalprice * 100) AS BIGINT)
                   AS totalprice_c,
                 sum_qty_c
          FROM big JOIN orders ON l_orderkey = o_orderkey
                   JOIN customer ON o_custkey = c_custkey
          ORDER BY totalprice_c DESC, o_orderdate, o_orderkey
          LIMIT 100""",

    "sql_tpch_q11" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
                       min((CAST(round(l_extendedprice * 100) AS BIGINT)
                            * 100)
                           // CAST(round(l_quantity * 100) AS BIGINT))
                         AS cost_c,
                       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                         AS BIGINT) AS avail_qc
                     FROM lineitem GROUP BY 1, 2),
          v AS (SELECT l_partkey, cost_c * avail_qc AS value_x
                FROM ps JOIN supplier ON l_suppkey = s_suppkey
                        JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_3'),
          pp AS (SELECT l_partkey AS p_partkey,
                        sum(value_x) AS value_d
                 FROM v GROUP BY 1)
          SELECT p_partkey, CAST(value_d AS BIGINT) AS value_x
          FROM pp
          WHERE value_d * 10000 > (SELECT sum(value_d) FROM pp)
          ORDER BY value_x DESC, p_partkey""",

    "sql_tpch_q12" ->
      """SELECT l_returnflag AS ship_mode,
                CAST(sum(CASE WHEN o_orderpriority
                                IN ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT)
                  AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority
                                IN ('1-URGENT', '2-HIGH')
                              THEN 0 ELSE 1 END) AS BIGINT)
                  AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_returnflag IN ('A', 'R')
           AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
           AND CAST(l_shipdate AS DATE) >
               CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
         GROUP BY 1 ORDER BY 1""",

    "sql_tpch_q16" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey
                     FROM lineitem),
          ok AS (SELECT l_partkey, l_suppkey FROM ps
                 WHERE l_suppkey NOT IN
                   (SELECT s_suppkey FROM supplier
                    WHERE CAST(round(s_acctbal * 100) AS BIGINT)
                          < 100000))
          SELECT p_brand, p_type, p_size,
                 CAST(count(DISTINCT l_suppkey) AS BIGINT)
                   AS supplier_cnt
          FROM ok JOIN part ON l_partkey = p_partkey
          WHERE p_brand <> 'Brand#13'
            AND p_type NOT LIKE 'PROMO%'
            AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          GROUP BY 1, 2, 3
          ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    "sql_tpch_q20" ->
      """WITH psq AS (
            SELECT l_partkey, l_suppkey,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                     AS BIGINT) AS avail_qc,
                   CAST(sum(CASE WHEN year(CAST(l_shipdate AS DATE))
                                      = 1996
                                 THEN CAST(round(l_quantity * 100)
                                   AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS qc96
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '%rod%'
            GROUP BY 1, 2)
          SELECT s_suppkey, s_name
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3'
            AND s_suppkey IN (SELECT l_suppkey FROM psq
                              WHERE qc96 > 0 AND avail_qc > 2 * qc96)
          ORDER BY s_suppkey""",

    "sql_tpch_q3" ->
      """WITH c AS (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING'),
          o AS (SELECT o_orderkey, o_custkey,
                       CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
                         AS o_orderdate,
                       o_orderpriority
                FROM orders
                WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'),
          l AS (SELECT l_orderkey,
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (10000 - CAST(round(l_discount * 10000)
                             AS BIGINT)) AS rev_cbp
                FROM lineitem
                WHERE CAST(l_shipdate AS DATE) > DATE '1998-01-01')
          SELECT l_orderkey,
                 CAST(sum(rev_cbp) AS BIGINT) AS revenue_cbp,
                 o_orderdate, o_orderpriority
          FROM l JOIN o ON l_orderkey = o_orderkey
                 JOIN c ON o_custkey = c_custkey
          GROUP BY l_orderkey, o_orderdate, o_orderpriority
          ORDER BY revenue_cbp DESC, l_orderkey LIMIT 10""",

    "orders_status_pchart" ->
      """WITH o AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
                      AS m,
                          CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                      AS f
                    FROM orders),
          mo AS (SELECT m, count(*) AS n, CAST(sum(f) AS BIGINT) AS x
                 FROM o GROUP BY m),
          g AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                       CAST(sum(x) AS BIGINT) AS xx FROM mo)
          SELECT CAST(m AS VARCHAR) AS month, n, x,
                 CAST((x * 10000) // n AS BIGINT) AS share_bp,
                 CAST((xx * 10000) // nn AS BIGINT) AS center_bp,
                 CAST(CASE WHEN (CAST(x AS HUGEINT) * nn - n * xx)
                             * (CAST(x AS HUGEINT) * nn - n * xx)
                        > 9 * CAST(xx AS HUGEINT) * (nn - xx) * n
                      THEN 1 ELSE 0 END AS BIGINT) AS ooc
          FROM mo CROSS JOIN g ORDER BY month""",

    "sql_tpch_q1" ->
      """WITH l AS (SELECT l_returnflag, l_linestatus,
                           CAST(round(l_quantity * 100) AS BIGINT)
                             AS qty_c,
                           CAST(round(l_extendedprice * 100) AS BIGINT)
                             AS price_c,
                           CAST(round(l_discount * 10000) AS BIGINT)
                             AS disc_bp,
                           CAST(round(l_tax * 10000) AS BIGINT) AS tax_bp
                    FROM lineitem
                    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'),
          x AS (SELECT *, price_c * (10000 - disc_bp) AS disc_price_cbp,
                       (price_c * (10000 - disc_bp) * (10000 + tax_bp))
                         // 10000 AS charge_cbp
                FROM l)
          SELECT l_returnflag, l_linestatus,
                 CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
                 CAST(sum(price_c) AS BIGINT) AS sum_base_price_c,
                 CAST(sum(disc_price_cbp) AS BIGINT)
                   AS sum_disc_price_cbp,
                 CAST(sum(charge_cbp) AS BIGINT) AS sum_charge_cbp,
                 CAST(count(*) AS BIGINT) AS count_order,
                 CAST(sum(qty_c) // count(*) AS BIGINT) AS avg_qty_c,
                 CAST(sum(price_c) // count(*) AS BIGINT) AS avg_price_c,
                 CAST(sum(disc_bp) // count(*) AS BIGINT) AS avg_disc_bp
          FROM x GROUP BY 1, 2 ORDER BY 1, 2""",

    "er_blocked_pairs" ->
      """WITH names AS (SELECT string_split(p_name, ' ')[-1] AS blk,
                               p_name, count(*) AS n
                        FROM part GROUP BY 1, 2)
          SELECT a.blk, a.p_name AS name_a, b.p_name AS name_b,
                 CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
                 CAST(a.n * b.n AS BIGINT) AS pair_weight
          FROM names a JOIN names b
            ON a.blk = b.blk AND a.p_name < b.p_name
          WHERE levenshtein(a.p_name, b.p_name) <= 3
          ORDER BY a.blk, name_a, name_b""",

    "orders_rfm" ->
      """WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref_date
                      FROM orders),
          cust AS (SELECT o_custkey,
                          max(CAST(o_orderdate AS DATE)) AS last_date,
                          count(*) AS freq,
                          CAST(sum(CAST(round(o_totalprice * 100)
                            AS BIGINT)) AS BIGINT) AS cents
                   FROM orders GROUP BY 1),
          c2 AS (SELECT o_custkey, freq, cents,
                        CAST(date_diff('day', last_date, ref_date)
                          AS BIGINT) AS recency_d
                 FROM cust CROSS JOIN ref),
          q AS (SELECT cents,
                       ntile(4) OVER (ORDER BY recency_d ASC, o_custkey)
                         AS r_q,
                       ntile(4) OVER (ORDER BY freq DESC, o_custkey)
                         AS f_q,
                       ntile(4) OVER (ORDER BY cents DESC, o_custkey)
                         AS m_q
                FROM c2)
          SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
                 CAST(m_q AS BIGINT) AS m_q,
                 count(*) AS n_customers,
                 CAST(sum(cents) AS BIGINT) AS segment_cents
          FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "sql_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
                count(*) FILTER (event_type = 'click') AS click,
                count(*) FILTER (event_type = 'error') AS error,
                count(*) FILTER (event_type = 'purchase') AS purchase,
                count(*) FILTER (event_type = 'signup') AS signup,
                count(*) FILTER (event_type = 'view') AS "view"
         FROM events GROUP BY 1 ORDER BY 1""",

    "orders_ship_lag" ->
      """WITH h AS (SELECT o_orderpriority AS priority,
                           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                             CAST(l_shipdate AS DATE)) AS BIGINT) AS lag_d,
                           count(*) AS cnt
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    GROUP BY 1, 2),
          tot AS (SELECT priority, CAST(sum(cnt) AS BIGINT) AS n,
                         CAST(min(lag_d) AS BIGINT) AS min_lag,
                         CAST(max(lag_d) AS BIGINT) AS max_lag
                  FROM h GROUP BY priority),
          c AS (SELECT priority, lag_d,
                       CAST(sum(cnt) OVER (PARTITION BY priority
                         ORDER BY lag_d ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS BIGINT) AS cum
                FROM h),
          j AS (SELECT c.priority, c.lag_d, c.cum, tot.n
                FROM c JOIN tot ON c.priority = tot.priority),
          p50 AS (SELECT priority, CAST(min(lag_d) AS BIGINT) AS p50_d
                  FROM j WHERE cum * 2 >= n GROUP BY priority),
          p90 AS (SELECT priority, CAST(min(lag_d) AS BIGINT) AS p90_d
                  FROM j WHERE cum * 10 >= n * 9 GROUP BY priority)
          SELECT tot.priority, tot.n, tot.min_lag, p50.p50_d, p90.p90_d,
                 tot.max_lag
          FROM tot JOIN p50 ON tot.priority = p50.priority
                   JOIN p90 ON tot.priority = p90.priority
          ORDER BY tot.priority""",
  )
}
