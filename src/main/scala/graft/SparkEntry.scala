package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.TextOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator gets one entry in `queries` (Spark form) and,
  * where ANSI-SQL-expressible, a matching entry in `oracleSql` (DuckDB form).
  * Column names and row-level values must match exactly between the two —
  * aggregates are aliased identically on both sides, double-typed aggregates
  * are rounded on both sides, and every query imposes a deterministic total
  * order.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * WordCount top-5 — the reference's headline app (server/wordCount.go). */
  def entry(spark: SparkSession): DataFrame =
    TextOps.wordCountTopK(
      Tables.documents(spark, "/root/testdata/sf0.001"), "text", 5)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference app parity (SURVEY.md §2.2-2.4) ----
    "wordcount_top5" -> ((s, d) =>
      TextOps.wordCountTopK(Tables.documents(s, d), "text", 5)),

    "grep_filter" -> ((s, d) =>
      TextOps.grep(Tables.documents(s, d), "text", "merge (table|row)")
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")),

    "grep_count" -> ((s, d) =>
      TextOps.grepCount(Tables.documents(s, d), "text", "scan.*join", "source")
        .orderBy("source")),

    "twitter_top5" -> ((s, d) =>
      TextOps.topK(
        TextOps.filterProjectToken(Tables.documents(s, d), "text", "", 2, 2)
          .groupBy("token").agg(count(lit(1)).as("cnt")),
        5, "cnt", "token")),

    "hothttp_top5" -> ((s, d) =>
      TextOps.topK(
        TextOps.filterProjectToken(Tables.documents(s, d), "text", "join", 10, 7)
          .groupBy("token").agg(count(lit(1)).as("cnt")),
        5, "cnt", "token")),

    "topk_global" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .limit(5)),

    // ---- aggregation breadth ----
    "q1_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "wordcount_top5" ->
      """SELECT word, count(*) AS cnt
         FROM (SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                          t -> t <> '')) AS word
               FROM documents) t
         GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 5""",

    "grep_filter" ->
      """SELECT doc_id, source FROM documents
         WHERE regexp_matches(text, 'merge (table|row)')
         ORDER BY doc_id""",

    "grep_count" ->
      """SELECT source, count(*) AS cnt FROM documents
         WHERE regexp_matches(text, 'scan.*join')
         GROUP BY source ORDER BY source""",

    "twitter_top5" ->
      """SELECT token, count(*) AS cnt
         FROM (SELECT toks[2] AS token
               FROM (SELECT list_filter(string_split_regex(trim(text), '\s+'),
                                        t -> t <> '') AS toks
                     FROM documents)
               WHERE len(toks) >= 2)
         GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 5""",

    "hothttp_top5" ->
      """SELECT token, count(*) AS cnt
         FROM (SELECT toks[7] AS token
               FROM (SELECT list_filter(string_split_regex(trim(text), '\s+'),
                                        t -> t <> '') AS toks
                     FROM documents
                     WHERE contains(text, 'join'))
               WHERE len(toks) >= 10)
         GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 5""",

    "topk_global" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
         LIMIT 5""",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_base_price,
                round(avg(l_quantity), 4) AS avg_qty,
                count(*) AS cnt
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
  )
}
