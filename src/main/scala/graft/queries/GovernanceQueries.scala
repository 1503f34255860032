package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Data-governance and audit-statistics queries: k-anonymity profiling,
  * Benford first-digit conformance, time-weighted averages, SCD2 interval
  * construction from change events, and within-group distribution ranks.
  *
  * Scale notes (100 TB): every query here is either a pure two-level
  * partial aggregation (k-anonymity, Benford) or a window partitioned by
  * a bounded key (user_id / type-day) — the same per-key-bounded shape as
  * events_sessionize. Nothing sorts a whole column on one reducer.
  */
object GovernanceQueries extends Registry {

  val defs: Map[String, QueryFn] = Map(

    // k-anonymity audit over quasi-identifier cells
    // (event_type, iso-weekday, hour, value-bucket): per event_type,
    // how close to re-identifiable is the table? Two partial
    // aggregations — rows collapse to cells at the first groupBy, cells
    // collapse to a 5-row profile at the second; only (cell, count)
    // crosses the shuffle.
    "events_k_anonymity" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          (expr("weekday(ts)") + 1).cast("long").as("dow"),
          hour(col("ts")).cast("long").as("hr"),
          floor(col("value") / 10.0).cast("long").as("vb"))
        .groupBy("event_type", "dow", "hr", "vb")
        .agg(count(lit(1)).as("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_cells"),
          min("k").as("min_k"),
          sum(when(col("k") < 5, 1L).otherwise(0L)).as("cells_lt5"),
          sum(when(col("k") < 5, col("k")).otherwise(0L))
            .as("rows_suppressed"))
        .orderBy("event_type")),

    // Benford's-law conformance of lineitem prices: observed
    // first-significant-digit share (integer basis points) vs the
    // Benford expectation. Digit extraction goes through exact integer
    // cents and decimal string length — no floating log on the data
    // path, so both engines bucket identically; log10 appears only in
    // the 9 expectation constants.
    "stats_benford" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(floor(col("l_extendedprice") * 100).cast("long").as("v"))
        .select((col("v") / pow(lit(10.0),
            length(col("v").cast("string")) - 1)).cast("long").as("digit"))
        .groupBy("digit")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("obs_bp", expr("(cnt * 10000) DIV sum(cnt) OVER ()"))
        .select(col("digit"), col("cnt"), col("obs_bp"),
          floor(log10(lit(1.0) + lit(1.0) / col("digit")) * 10000)
            .cast("long").as("benford_bp"))
        .orderBy("digit")),

    // Time-weighted average value per event_type: each event's value
    // holds until the user's next event (piecewise-constant signal), so
    // the mean is duration-weighted, not row-weighted. The window is
    // partitioned by user (bounded per key); the weighted moments then
    // partial-aggregate by type.
    "events_twap" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("dur_sec",
          (unix_timestamp(lead(col("ts"), 1).over(w)) -
            unix_timestamp(col("ts"))).cast("long"))
        .filter(col("dur_sec").isNotNull)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum("dur_sec").as("held_sec"),
          round(sum(col("value") * col("dur_sec")) / sum(col("dur_sec")), 4)
            .as("twap"))
        .orderBy("event_type")
    }),

    // SCD2 validity intervals from the event stream: collapse each
    // user's consecutive same-type runs to state-change rows, then each
    // change holds [its ts, next change ts). The current (open) state
    // carries a NULL valid_to. Classic CDC-to-dimension build; both
    // windows are per-user bounded.
    "cdc_scd2_intervals" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val changes = Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
      val byChange = Window.partitionBy("user_id").orderBy("ts", "event_id")
      changes
        .select(col("user_id"), col("event_type"),
          row_number().over(byChange).cast("long").as("version"),
          unix_timestamp(col("ts")).as("from_sec"),
          unix_timestamp(lead(col("ts"), 1).over(byChange)).as("to_sec"))
        .orderBy("user_id", "version")
    }),

    // Within-group distribution position: each user's daily purchase
    // volume ranked against the same (event_type, day) cohort via
    // percent_rank / cume_dist. Ranking is on exact integer cents (an
    // order-independent integer sum), never on a float sum whose
    // accumulation order could flip near-ties between engines. The
    // window partitions on (type, day) — thousands of small cohorts, no
    // global sort.
    "window_percent_rank" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"),
          col("user_id"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val w = Window.partitionBy("event_type", "day")
        .orderBy("cents", "user_id")
      daily
        .select(col("event_type"), col("day").cast("string").as("day"),
          col("user_id"), col("cents"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cum_dist"))
        .orderBy("event_type", "day", "user_id")
    }),
  )

  val oracles: Map[String, String] = Map(

    "events_k_anonymity" ->
      """WITH cells AS (
           SELECT event_type, isodow(ts) AS dow, hour(ts) AS hr,
                  CAST(floor("value" / 10.0) AS BIGINT) AS vb,
                  count(*) AS k
           FROM events GROUP BY 1, 2, 3, 4)
         SELECT event_type,
                CAST(count(*) AS BIGINT) AS n_cells,
                CAST(min(k) AS BIGINT) AS min_k,
                CAST(count(CASE WHEN k < 5 THEN 1 END) AS BIGINT)
                  AS cells_lt5,
                CAST(coalesce(sum(CASE WHEN k < 5 THEN k END), 0) AS BIGINT)
                  AS rows_suppressed
         FROM cells GROUP BY event_type ORDER BY event_type""",

    "stats_benford" ->
      """WITH v AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
                    FROM lineitem),
           d AS (SELECT CAST(floor(v / power(10,
                          length(CAST(v AS VARCHAR)) - 1)) AS BIGINT) AS digit
                 FROM v),
           c AS (SELECT digit, count(*) AS cnt FROM d GROUP BY digit)
         SELECT digit, cnt,
                CAST(cnt * 10000 // (SELECT sum(cnt) FROM c) AS BIGINT)
                  AS obs_bp,
                CAST(floor(log10(1.0 + 1.0 / digit) * 10000) AS BIGINT)
                  AS benford_bp
         FROM c ORDER BY digit""",

    "events_twap" ->
      """WITH nxt AS (
           SELECT event_type, "value",
                  date_diff('second', ts,
                    lead(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS dur_sec
           FROM events)
         SELECT event_type,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(dur_sec) AS BIGINT) AS held_sec,
                round(sum("value" * dur_sec) / sum(dur_sec), 4) AS twap
         FROM nxt WHERE dur_sec IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",

    "cdc_scd2_intervals" ->
      """WITH marked AS (
           SELECT user_id, event_type, ts, event_id,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev_type
           FROM events),
           changes AS (
             SELECT user_id, event_type, ts, event_id FROM marked
             WHERE prev_type IS NULL OR prev_type <> event_type)
         SELECT user_id, event_type,
                CAST(row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS BIGINT)
                  AS version,
                CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS from_sec,
                CAST(epoch(date_trunc('second',
                  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))
                  AS BIGINT) AS to_sec
         FROM changes ORDER BY user_id, version""",

    "window_percent_rank" ->
      """WITH daily AS (
           SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                  user_id,
                  CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
                    AS cents
           FROM events GROUP BY 1, 2, 3)
         SELECT event_type, day, user_id, cents,
                round(percent_rank() OVER
                  (PARTITION BY event_type, day
                   ORDER BY cents, user_id), 6) AS pct_rank,
                round(cume_dist() OVER
                  (PARTITION BY event_type, day
                   ORDER BY cents, user_id), 6) AS cum_dist
         FROM daily ORDER BY event_type, day, user_id""",
  )
}
