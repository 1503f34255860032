package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators. The reference is processing-time only
  * (SURVEY.md §2.5: no event time, windows, or watermarks anywhere), so
  * these are north-star extensions built on Structured Streaming's
  * watermark + state-store machinery — the pieces a training-data
  * ingestion pipeline needs for late-arriving logs.
  */
object EventTimeOps {

  /** Tumbling-window counts per key with a watermark for state eviction:
    * the canonical bounded-state streaming aggregation. Works identically
    * on batch frames (window() is an ordinary grouping expression). */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .count()
      .select(col("w.start").as("window_start"), col(keyCol), col("count"))

  /** Sliding-window counts: like tumbling, but each event lands in every
    * window of length `windowLen` that starts on a `slide` boundary and
    * covers it (windowLen/slide overlapping windows per event — the
    * trailing-rate view a monitor wants). State per key is bounded the
    * same way: windows evict once the watermark passes their end. */
  def slidingCounts(events: DataFrame, tsCol: String, keyCol: String,
                    windowLen: String, slide: String,
                    lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen, slide).as("w"), col(keyCol))
      .count()
      .select(col("w.start").as("window_start"), col(keyCol), col("count"))

  /** Gap-based session aggregates via Spark's NATIVE session_window — the
    * built-in counterpart to [[sessionize]]'s flatMapGroupsWithState
    * formulation. The engine merges overlapping per-event windows into
    * sessions and evicts state once the watermark passes a session's end
    * + gap; state is per open session, never per event. Prefer this form
    * when the output (session extent + count) needs no custom per-group
    * logic — it stays whole-stage-planned and needs no Encoder plumbing;
    * reach for [[sessionize]] only when the session payload does
    * (first/last event attributes, custom merge rules). Works identically
    * on batch frames, which is how the spec cross-checks the two. */
  def sessionWindowCounts(events: DataFrame, tsCol: String, keyCol: String,
                          gap: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .count()
      .select(col(keyCol), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("count").as("n_events"))

  /** Stream-static enrichment: attach dimension columns to a stream by a
    * broadcast equi-join against a static (batch) table. The static side
    * is re-broadcast per micro-batch by Structured Streaming, never
    * shuffled with the stream, and requires no state or watermark — the
    * right way to stamp reference data (user → segment, host → region)
    * onto an unbounded feed. Left-outer so unmatched stream rows pass
    * through with nulls rather than vanishing. */
  def enrich(stream: DataFrame, dim: DataFrame,
             keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Stream-static TEMPORAL enrichment: each streaming row picks the
    * latest version row at-or-before its own event time (slowly-changing
    * dimension stamping — price books, config rollouts, model versions).
    * Structured Streaming cannot run a window/as-of against a static
    * side inside the continuous plan, so the versioned dimension is
    * collapsed to per-key ASCENDING (version_ts, payload) arrays ONCE at
    * plan build (a batch aggregation, dimension-sized), broadcast-joined
    * onto the stream, and each row binary-searches its version with
    * codegen'd array functions — no state store, no watermark, O(log v)
    * per row. Late/early rows resolve against the same frozen dimension,
    * the semantics a reproducible pipeline wants; rebuild the plan to
    * pick up dimension changes.
    *
    * `dimCols` must not collide with stream columns; the matched version
    * timestamp is attached as `matched_<dimTs>` (null when the row
    * precedes every version, matching `Joins.asOf`). */
  def asOfEnrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
                 streamTs: String, dimTs: String,
                 dimCols: Seq[String]): DataFrame = {
    val outTs = s"matched_$dimTs"
    require(!(dimCols :+ outTs).exists(stream.columns.contains),
      s"dim payload/$outTs collide with stream columns")
    // per-key sorted version history: struct ordering is (ts, payload...)
    // so array_sort gives version-ascending
    val hist = dim
      .filter((col(dimTs).isNotNull +: keys.map(col(_).isNotNull))
        .reduce(_ && _))
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(
        struct(col(dimTs).as(outTs) +: dimCols.map(col): _*)))
        .as("__versions"))
    // filter(v.ts <= row.ts) then last element = latest at-or-before;
    // element_at(arr, -1) is null-safe on empty arrays via the guard
    val matched = filter(col("__versions"),
      v => v.getField(outTs) <= col(streamTs))
    val pick = element_at(matched, -1)
    stream.join(broadcast(hist), keys, "left")
      .withColumn("__m",
        when(size(matched) > 0, pick).otherwise(lit(null)))
      .select(stream.columns.map(col) ++
        ((outTs +: dimCols).map(c => col(s"__m.`$c`").as(c))): _*)
  }

  /** Watermarked stream-stream interval join: each left row matches right
    * rows for the same key whose timestamp falls in [left.ts, left.ts +
    * horizon]. Both sides carry watermarks so the join state is evicted
    * once the watermark passes the horizon — bounded state, the only way
    * a stream-stream join survives at scale. (The reference has no joins
    * at all, SURVEY.md §2.9 — this is modern-surface extension.) */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String, horizon: String,
                   lateness: String): DataFrame = {
    val l = left.withWatermark(leftTs, lateness).as("l")
    val r = right.withWatermark(rightTs, lateness).as("r")
    l.join(r,
      expr(s"l.$keyCol = r.$keyCol AND " +
        s"r.$rightTs >= l.$leftTs AND " +
        s"r.$rightTs <= l.$leftTs + interval $horizon"))
  }

  /** Left-outer form of [[intervalJoin]]: left rows that find no right
    * match inside the horizon are still emitted (null right columns) —
    * but only once the watermark passes left.ts + horizon, because
    * until then a match could still arrive. That deferred-null emission
    * is the abandoned-funnel primitive (views that never converted);
    * state stays watermark-bounded exactly as in the inner form. The
    * time-range predicate on BOTH bounds is what lets Spark prove the
    * eviction horizon — an unconstrained outer stream-stream join would
    * be unbounded state and is rejected by the planner. */
  def intervalJoinOuter(left: DataFrame, right: DataFrame, keyCol: String,
                        leftTs: String, rightTs: String, horizon: String,
                        lateness: String): DataFrame = {
    val l = left.withWatermark(leftTs, lateness).as("l")
    val r = right.withWatermark(rightTs, lateness).as("r")
    l.join(r,
      expr(s"l.$keyCol = r.$keyCol AND " +
        s"r.$rightTs >= l.$leftTs AND " +
        s"r.$rightTs <= l.$leftTs + interval $horizon"),
      "leftOuter")
  }

  /** Streaming exact dedup: drop rows whose key was already seen, with
    * state bounded by the watermark (dropDuplicatesWithinWatermark — the
    * seen-keys store evicts once keys age past the lateness horizon).
    * The streaming form of Dedup.exactGroups for an unbounded ingest
    * feed: key on a content fingerprint (TextFunctions.fingerprint) to
    * dedup documents as they arrive. */
  def streamDedup(rows: DataFrame, keyCols: Seq[String], tsCol: String,
                  lateness: String): DataFrame =
    rows.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming corpus ingest: the batch corpus-prep gates in streaming
    * form — quality/language filters as map-only codegen'd expressions
    * (no state), then exactly-once content dedup with watermark-bounded
    * state ([[streamDedup]] on the text fingerprint). Emits accepted,
    * first-seen documents; the same composition as the batch
    * `pipeline_corpus_prep` front half, so batch and stream answer the
    * same question (asserted batch-vs-stream in StreamingSpec). At
    * scale the dedup state store holds 16-byte digests for one lateness
    * horizon, never document bodies. */
  def corpusIngest(docs: DataFrame, tsCol: String, textCol: String,
                   lateness: String): DataFrame = {
    val TF = graft.functions.TextFunctions
    val gated = docs.filter(
      TF.qualityScore(col(textCol)) >= 0.63 &&
        TF.langId(col(textCol)) === "en")
      .withColumn("fp", TF.fingerprint(col(textCol)))
    streamDedup(gated, Seq("fp"), tsCol, lateness)
  }

  /** Incremental corpus ingest against an EXISTING corpus: the
    * [[corpusIngest]] gates + in-stream dedup, then a stream-static
    * LEFT ANTI join against the historical corpus's fingerprint
    * relation — a new document identical to one already in the corpus
    * never reaches the sink. This is the streaming form of
    * `Dedup.incremental` (new-batch-vs-corpus), and the shape matters
    * at 100 TB: the static side is the (16-byte fp) projection of the
    * corpus, NOT the corpus — Spark re-plans the static side per
    * micro-batch, so the anti join stays a digest-only hash join and
    * document bodies appear on neither side of the shuffle. */
  def corpusIngestIncremental(docs: DataFrame, corpusFps: DataFrame,
                              tsCol: String, textCol: String,
                              lateness: String): DataFrame =
    corpusIngest(docs, tsCol, textCol, lateness)
      .join(corpusFps.select(col("fp")), Seq("fp"), "left_anti")

  final case class Ev(user_id: Long, ts: Timestamp)

  final case class SessionState(start: Long, end: Long, n: Long)

  final case class PendingSessions(sessions: List[SessionState])

  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long)

  /** Event-time sessionization with a gap timeout, via
    * flatMapGroupsWithState (the reference has no analogue; this is the
    * `KeyValueGroupedDataset` custom-state path).
    *
    * A session is emitted ONLY once the watermark passes its end + gap —
    * never merely because a later in-batch event exceeded the gap. An
    * out-of-order event still inside the lateness horizon can therefore
    * always merge into (or bridge) pending sessions, and the append-mode
    * sink sees each final session exactly once, with correct extents, for
    * any arrival order the watermark admits.
    *
    * State per key is the list of pending (start, end, count) intervals —
    * never the events. Pending sessions older than watermark - gap are
    * flushed every invocation, so the list is bounded by the lateness
    * horizon divided by the gap: O(lateness/gap) per key.
    */
  def sessionize(events: Dataset[Ev], gapMs: Long, lateness: String)
                (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(sessionFn(gapMs))
  }

  private def sessionFn(gapMs: Long)(
      userId: Long, evs: Iterator[Ev],
      state: GroupState[PendingSessions]): Iterator[Session] = {
    def emit(s: SessionState) =
      Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n)

    val wm = state.getCurrentWatermarkMs()
    val pending = state.getOption.map(_.sessions).getOrElse(Nil)
    // each event is a singleton interval; an interval sweep then merges
    // everything within the gap, letting one late event bridge two
    // previously-separate pending sessions
    val singles = evs.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1L))
    val merged = (pending ++ singles)
      .sortBy(s => (s.start, s.end))
      .foldLeft(List.empty[SessionState]) { (acc, s) =>
        acc match {
          case h :: t if s.start - h.end <= gapMs =>
            SessionState(h.start, math.max(h.end, s.end), h.n + s.n) :: t
          case _ => s :: acc
        }
      }
      .reverse
    // finality = the watermark has passed end + gap: no admissible event
    // can extend these anymore
    val (closed, open) = merged.partition(_.end + gapMs < wm)
    if (open.isEmpty) state.remove()
    else {
      state.update(PendingSessions(open))
      // wake when the earliest pending session becomes final (timeout
      // timestamps must sit strictly beyond the current watermark)
      state.setTimeoutTimestamp(math.max(open.map(_.end).min + gapMs, wm + 1))
    }
    closed.map(emit).iterator
  }
}
