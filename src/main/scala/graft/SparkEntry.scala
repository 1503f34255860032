package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.operators.TextOps
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator gets one entry in `queries` (Spark form) and,
  * where ANSI-SQL-expressible, a matching entry in `oracleSql` (DuckDB form).
  * Column names and row-level values must match exactly between the two —
  * aggregates are aliased identically on both sides, double-typed aggregates
  * are rounded on both sides, and every query imposes a deterministic total
  * order.
  *
  * Queries live in per-domain registries under graft.queries; this object is
  * the thin concatenation the driver reads.
  */
object SparkEntry {

  private val registries: Seq[Registry] = Seq(
    RefQueries,
    RelationalQueries,
    TextQueries,
    DedupQueries,
    AnnQueries,
    MultimodalQueries,
    EventQueries,
    TemporalQueries,
    GraphQueries,
    GovernanceQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * WordCount top-5 — the reference's headline app (server/wordCount.go). */
  def entry(spark: SparkSession): DataFrame =
    TextOps.wordCountTopK(
      Tables.documents(spark, "/root/testdata/sf0.001"), "text", 5)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.flatMap(_.defs).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * falls back to a rows-only check). */
  def oracleSql: Map[String, String] =
    registries.flatMap(_.oracles).toMap
}
