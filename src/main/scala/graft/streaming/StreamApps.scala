package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's three stream topologies ("apps", server/wordCount.go,
  * server/twitter.go, server/hothttp.go + Crane.go:219-232's name registry)
  * as declarative transforms over a single-column `value: string` line
  * stream.
  *
  * Each app is (transform → keyed running count): the reference's
  * `transform` emits 0..n key tuples per line (wordCount.go:75-84,
  * twitter.go:59-67, hothttp.go:59-73) and its sink `join`/`mergeCache`
  * pair is a running `result[key] += count` (wordCount.go:33-74). Here the
  * transform is a Column pipeline and the running count is a streaming
  * `groupBy(key).count()` in complete output mode — Structured Streaming's
  * state store replaces the ack/replay/staging machinery (exactly-once,
  * strictly stronger than the reference's at-least-once XOR acker,
  * acker.go:51-74).
  *
  * The same transforms run identically in batch (the DuckDB-checked
  * `queries` entries in graft.queries.RefQueries use them), which mirrors
  * the reference's own dual-implementation oracle methodology
  * (cs425_mp4.pdf §4).
  */
object StreamApps {

  /** Whitespace tokens, empties dropped (Go strings.Fields semantics,
    * wordCount.go:76) — single definition in TextFunctions. */
  private def words(line: Column): Column =
    graft.functions.TextFunctions.tokens(line)

  /** Each app's transform stage alone — line → 0..n single-column key
    * rows, BEFORE the running count (the reference's `transform` emit,
    * wordCount.go:75-84 / twitter.go:59-67 / hothttp.go:59-73). The
    * aggregated `apps` build on these; the bounded-state top-K path
    * (CraneStream.startTopKBounded) consumes them directly so its
    * per-key state lives in mapGroupsWithState instead of a complete-
    * mode aggregation. */
  val keyedRows: Map[String, DataFrame => DataFrame] = Map(
    "wordCount" -> (lines =>
      lines.select(explode(words(col("value"))).as("word"))),
    "twitter" -> (lines =>
      lines.select(words(col("value")).as("f"))
        .filter(size(col("f")) === 2)
        .select(element_at(col("f"), 2).as("followee"))),
    "hothttp" -> (lines =>
      lines.filter(col("value").contains("200"))
        .select(words(col("value")).as("f"))
        .filter(size(col("f")) >= 10)
        .select(element_at(col("f"), 7).as("resource"))),
  )

  /** wordCount (server/wordCount.go): line → one row per word. */
  def wordCount(lines: DataFrame): DataFrame =
    keyedRows("wordCount")(lines).groupBy("word").count()

  /** twitter (server/twitter.go:59-67): edge line "follower followee" →
    * followee, dropping malformed lines (field count != 2). */
  def twitter(lines: DataFrame): DataFrame =
    keyedRows("twitter")(lines).groupBy("followee").count()

  /** hothttp (server/hothttp.go:59-73): keep lines containing "200" with
    * >= 10 fields, key on field 7 (the requested resource; Go index 6). */
  def hothttp(lines: DataFrame): DataFrame =
    keyedRows("hothttp")(lines).groupBy("resource").count()

  /** Distributed grep (server/querier.go): regex filter + per-file counts;
    * streaming form of the batch S4/T4/A3 operators. */
  def grep(lines: DataFrame, pattern: String): DataFrame =
    lines.filter(col("value").rlike(pattern))

  /** Name → topology registry (the analogue of startApp, Crane.go:219-232;
    * any registered name can be started, failure-detector.go:131-133). */
  val apps: Map[String, DataFrame => DataFrame] = Map(
    "wordCount" -> wordCount,
    "twitter" -> twitter,
    "hothttp" -> hothttp,
  )

  /** Key column per app (first column of the aggregate). */
  def keyCol(app: String): String = app match {
    case "wordCount" => "word"
    case "twitter"   => "followee"
    case "hothttp"   => "resource"
    case other       => sys.error(s"unknown app: $other")
  }

  /** Deterministic top-K of a (key, count) frame: count desc, key asc —
    * the reference sorts only by count (wordCount.go:23-24, ties
    * nondeterministic); we impose a total order (SURVEY.md §7.5). */
  def topK(counts: DataFrame, k: Int): DataFrame = {
    val key = counts.columns.head
    counts.orderBy(desc("count"), asc(key)).limit(k)
  }
}
