package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Joins

/** Temporal-join queries (operators.Joins): as-of attribution (backward
  * and forward) and bucketed interval containment, each replayed in DuckDB
  * (ASOF
  * JOIN / inequality join — DuckDB executes the naive form, Spark the
  * scale-shaped one, and the results must hash-match).
  *
  * Output columns avoid raw timestamps: engines serialize timestamp
  * precision differently (ns vs us), so results carry ids and whole-second
  * gaps, both BIGINT on both sides.
  */
object TemporalQueries extends Registry {

  val defs: Map[String, QueryFn] = Map(
    // Purchase attribution: each purchase picks the user's latest click
    // at-or-before it (left-outer: first-touch purchases keep nulls).
    "join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      Joins.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("click_id"))
        .select(col("event_id"), col("user_id"), col("click_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("matched_ts")))
            .as("gap_sec"))
        .orderBy("event_id")
    }),

    // The as-of join through the SQL SURFACE: the union + last_value
    // IGNORE NULLS window formulation (exactly Joins.asOf's plan) in
    // pure Spark SQL text, checked against DuckDB's ranked LEFT-JOIN
    // formulation — three independent formulations of one semantics
    // (window SQL here, composed DataFrame, native Catalyst node) must
    // agree row-for-row.
    "sql_asof_window" -> ((s, d) => {
      graft.core.Views.register(s, d)
      s.sql("""
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT user_id, ts AS cts, event_id AS click_id
                   FROM events WHERE event_type = 'click'),
             u AS (SELECT user_id, cts AS t, 0 AS side, click_id,
                          CAST(NULL AS BIGINT) AS event_id
                   FROM c
                   UNION ALL
                   SELECT user_id, ts AS t, 1 AS side,
                          CAST(NULL AS BIGINT) AS click_id, event_id
                   FROM p),
             m AS (SELECT user_id, t, side, event_id,
                          last_value(click_id) IGNORE NULLS OVER (
                            PARTITION BY user_id
                            ORDER BY t, side, click_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS click_id_m,
                          last_value(CASE WHEN side = 0 THEN t END)
                            IGNORE NULLS OVER (
                            PARTITION BY user_id
                            ORDER BY t, side, click_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS matched_ts
                   FROM u)
        SELECT event_id, user_id, click_id_m AS click_id,
               unix_timestamp(t) - unix_timestamp(matched_ts) AS gap_sec
        FROM m WHERE side = 1 ORDER BY event_id""")
    }),

    // Same attribution but only clicks within the last hour count — the
    // tolerance path (stale matches null out, rows are kept).
    "join_asof_tolerance" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      Joins.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("click_id"), toleranceSec = Some(3600L))
        .select(col("event_id"), col("user_id"), col("click_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("matched_ts")))
            .as("gap_sec"))
        .orderBy("event_id")
    }),

    // Conversion lag: each click picks the user's EARLIEST purchase
    // at-or-after it (forward as-of — next-event attribution).
    // Same attribution through the NATIVE sort-merge as-of operator
    // (plans.AsOfJoin: custom logical node + strategy + exec) — must
    // produce byte-identical results to the composed form above, so the
    // two share one oracle.
    "join_asof_native" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      graft.plans.AsOfNative.join(purchases, clicks, Seq("user_id"),
          "ts", "ts", Seq("click_id"))
        .select(col("event_id"), col("user_id"), col("click_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("matched_ts")))
            .as("gap_sec"))
        .orderBy("event_id")
    }),

    // Same attribution a THIRD way: the broadcast version-array path
    // (streaming.EventTimeOps.asOfEnrich — per-key sorted histories
    // broadcast onto the probe side, per-row array search). Right for
    // dimension-sized right sides; here it triple-checks the as-of
    // semantics through a structurally different plan, same oracle.
    "join_asof_broadcast" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      graft.streaming.EventTimeOps.asOfEnrich(purchases, clicks,
          Seq("user_id"), "ts", "ts", Seq("click_id"))
        .select(col("event_id"), col("user_id"), col("click_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("matched_ts")))
            .as("gap_sec"))
        .orderBy("event_id")
    }),

    // Forward direction through the native operator — shares the
    // composed forward form's oracle.
    "join_asof_native_fwd" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      graft.plans.AsOfNative.join(clicks, purchases, Seq("user_id"),
          "ts", "ts", Seq("purchase_id"), forward = true)
        .select(col("event_id"), col("user_id"), col("purchase_id"),
          (unix_timestamp(col("matched_ts")) - unix_timestamp(col("ts")))
            .as("lag_sec"))
        .orderBy("event_id")
    }),

    "join_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      Joins.asOf(clicks, purchases, Seq("user_id"), "ts", "ts",
          Seq("purchase_id"), forward = true)
        .select(col("event_id"), col("user_id"), col("purchase_id"),
          (unix_timestamp(col("matched_ts")) - unix_timestamp(col("ts")))
            .as("lag_sec"))
        .orderBy("event_id")
    }),

    // NEAREST-direction as-of (pandas merge_asof direction='nearest'):
    // each purchase takes whichever click is closer in time, backward
    // winning exact ties. Composes the backward and forward one-shuffle
    // as-of passes and picks per row via an equi-join on the unique left
    // id — two passes of the audited plan, no new shuffle shape. The
    // oracle ranks the raw candidate join by (gap, side, click_id DESC),
    // which is exactly the composed pick order.
    "join_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val b = Joins.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("click_id"))
        .select(col("event_id"), col("user_id"),
          col("click_id").as("b_click"),
          (unix_micros(col("ts")) - unix_micros(col("matched_ts")))
            .as("b_gap"))
      val f = Joins.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("click_id"), forward = true)
        .select(col("event_id"),
          col("click_id").as("f_click"),
          (unix_micros(col("matched_ts")) - unix_micros(col("ts")))
            .as("f_gap"))
      b.join(f, "event_id")
        .select(col("event_id"), col("user_id"),
          when(col("b_gap").isNotNull &&
              (col("f_gap").isNull || col("b_gap") <= col("f_gap")),
            col("b_click")).otherwise(col("f_click")).as("click_id"),
          when(col("b_gap").isNotNull &&
              (col("f_gap").isNull || col("b_gap") <= col("f_gap")),
            col("b_gap")).otherwise(col("f_gap")).as("gap_us"),
          when(col("b_gap").isNotNull &&
              (col("f_gap").isNull || col("b_gap") <= col("f_gap")), 0L)
            .otherwise(when(col("f_gap").isNotNull, 1L)).as("fwd"))
        .orderBy("event_id")
    }),

    // Repeat-purchase detection: per customer, how many order pairs fall
    // within a 7-day window of each other (point = later order, interval
    // = [order date, +7 days] of the earlier one).
    "join_range" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val windows = o.select(col("o_custkey").as("k"),
        col("o_orderkey").as("base_order"),
        col("o_orderdate").as("w_start"),
        (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("w_end"))
      val pts = o.select(col("o_custkey").as("k"),
        col("o_orderkey").as("next_order"),
        col("o_orderdate").as("next_date"))
      Joins.rangeJoin(pts, "next_date", windows, "w_start", "w_end",
          keys = Seq("k"), bucketSec = 7 * 86400L)
        .filter(col("next_order") =!= col("base_order"))
        .groupBy(col("k").as("o_custkey"))
        .agg(count(lit(1)).as("n_repeat"),
          countDistinct(col("base_order")).as("n_with_repeat"))
        .orderBy("o_custkey")
    }),

    // The attribution REPORT a marketing pipeline actually ships: last
    // click within 30 minutes wins the purchase (Joins.asOf with
    // tolerance — matched-then-out-of-window purchases count as
    // organic, exactly join_asof_tolerance's semantics), then revenue
    // rolls up per purchase day and attribution flag, with the count of
    // DISTINCT winning clicks (a click may win several purchases). One
    // as-of shuffle + one partial aggregation; days x 2 output rows.
    "events_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      Joins.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("click_id"), toleranceSec = Some(1800L))
        .groupBy(to_date(col("ts")).cast("string").as("day"),
          col("click_id").isNotNull.as("attributed"))
        .agg(count(lit(1)).as("n_purchases"),
          sum("cents").as("rev_cc"),
          countDistinct(col("click_id")).as("n_touch_clicks"))
        .orderBy("day", "attributed")
    }),
  )

  /** Deterministic naive as-of: expand all prior clicks per purchase with
    * a LEFT JOIN and keep rank 1 under (ts DESC, click_id DESC) — the
    * same total tie order as the Spark operator's max-payload-struct rule
    * (DuckDB's ASOF JOIN leaves equal-timestamp ties unspecified, so it
    * is not used as an oracle). Unmatched purchases survive as the LEFT
    * JOIN's single all-null match at rank 1. */
  private val asofRanked =
    """WITH p AS (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts, event_id AS click_id FROM events
              WHERE event_type = 'click'),
        m AS (SELECT p.event_id, p.user_id, c.click_id,
                     date_diff('second', c.ts, p.ts) AS gap_sec,
                     row_number() OVER (PARTITION BY p.event_id
                       ORDER BY c.ts DESC, c.click_id DESC) AS rn
              FROM p LEFT JOIN c
                ON p.user_id = c.user_id AND c.ts <= p.ts)"""

  private val asofForwardSql =
    """WITH c AS (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'click'),
        p AS (SELECT user_id, ts, event_id AS purchase_id FROM events
              WHERE event_type = 'purchase'),
        m AS (SELECT c.event_id, c.user_id, p.purchase_id,
                     date_diff('second', c.ts, p.ts) AS lag_sec,
                     row_number() OVER (PARTITION BY c.event_id
                       ORDER BY p.ts ASC, p.purchase_id DESC) AS rn
              FROM c LEFT JOIN p
                ON c.user_id = p.user_id AND p.ts >= c.ts)
        SELECT event_id, user_id, purchase_id, lag_sec
        FROM m WHERE rn = 1 ORDER BY event_id"""

  val oracles: Map[String, String] = Map(
    "join_asof" ->
      s"""$asofRanked
          SELECT event_id, user_id, click_id, gap_sec
          FROM m WHERE rn = 1 ORDER BY event_id""",

    "join_asof_native" ->
      s"""$asofRanked
          SELECT event_id, user_id, click_id, gap_sec
          FROM m WHERE rn = 1 ORDER BY event_id""",

    "sql_asof_window" ->
      s"""$asofRanked
          SELECT event_id, user_id, click_id, gap_sec
          FROM m WHERE rn = 1 ORDER BY event_id""",

    "join_asof_broadcast" ->
      s"""$asofRanked
          SELECT event_id, user_id, click_id, gap_sec
          FROM m WHERE rn = 1 ORDER BY event_id""",

    "join_asof_tolerance" ->
      s"""$asofRanked
          SELECT event_id, user_id,
                 CASE WHEN gap_sec <= 3600 THEN click_id END AS click_id,
                 CASE WHEN gap_sec <= 3600 THEN gap_sec END AS gap_sec
          FROM m WHERE rn = 1 ORDER BY event_id""",

    // Forward mirror of asofRanked: earliest following purchase, ties by
    // largest purchase_id (the operator's max-payload-struct rule).
    "join_asof_forward" -> asofForwardSql,

    // same semantics via the native operator -> same oracle
    "join_asof_native_fwd" -> asofForwardSql,

    // nearest-direction: rank the raw candidate join by exact
    // microsecond gap, then backward-before-forward, then click_id DESC
    // — the same pick order the composed two-pass form resolves to
    "join_asof_nearest" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase'),
          c AS (SELECT user_id, ts AS cts, event_id AS click_id
                FROM events WHERE event_type = 'click'),
          cand AS (SELECT p.event_id, c.click_id,
                          abs(epoch_us(p.ts) - epoch_us(c.cts)) AS gap_us,
                          CASE WHEN c.cts <= p.ts THEN 0 ELSE 1 END AS side
                   FROM p JOIN c ON p.user_id = c.user_id),
          r AS (SELECT event_id, click_id, gap_us, side,
                       row_number() OVER (PARTITION BY event_id
                         ORDER BY gap_us, side, click_id DESC) AS rn
                FROM cand)
          SELECT p.event_id, p.user_id, r.click_id,
                 CAST(r.gap_us AS BIGINT) AS gap_us,
                 CAST(r.side AS BIGINT) AS fwd
          FROM p LEFT JOIN r ON p.event_id = r.event_id AND r.rn = 1
          ORDER BY 1""",

    "join_range" ->
      """SELECT a.o_custkey, count(*) AS n_repeat,
                count(DISTINCT a.o_orderkey) AS n_with_repeat
         FROM orders a JOIN orders b
           ON a.o_custkey = b.o_custkey
          AND b.o_orderkey <> a.o_orderkey
          AND b.o_orderdate BETWEEN a.o_orderdate
                                AND a.o_orderdate + INTERVAL 7 DAY
         GROUP BY 1 ORDER BY 1""",

    "events_attribution" ->
      """WITH p AS (SELECT event_id, user_id, ts,
                           CAST(round("value" * 100) AS BIGINT) AS cents
                    FROM events WHERE event_type = 'purchase'),
          c AS (SELECT user_id, ts AS cts, event_id AS click_id
                FROM events WHERE event_type = 'click'),
          m AS (SELECT p.event_id, p.ts, p.cents, c.click_id,
                       date_diff('second', c.cts, p.ts) AS gap_sec,
                       row_number() OVER (PARTITION BY p.event_id
                         ORDER BY c.cts DESC, c.click_id DESC) AS rn
                FROM p LEFT JOIN c
                  ON p.user_id = c.user_id AND c.cts <= p.ts),
          a AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, cents,
                       CASE WHEN gap_sec <= 1800 THEN click_id END
                         AS click_id
                FROM m WHERE rn = 1)
          SELECT day, click_id IS NOT NULL AS attributed,
                 count(*) AS n_purchases,
                 CAST(sum(cents) AS BIGINT) AS rev_cc,
                 CAST(count(DISTINCT click_id) AS BIGINT) AS n_touch_clicks
          FROM a GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}
