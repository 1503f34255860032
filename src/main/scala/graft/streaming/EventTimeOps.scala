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

  final case class Ev(user_id: Long, ts: Timestamp)

  final case class SessionState(start: Long, end: Long, n: Long)

  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long)

  /** Event-time sessionization with a gap timeout, via
    * flatMapGroupsWithState (the reference has no analogue; this is the
    * `KeyValueGroupedDataset` custom-state path). A session closes when
    * the watermark passes its end + gap; closed sessions are emitted in
    * append mode, so downstream sinks see each session exactly once.
    *
    * State per key is O(open sessions) = O(1): only the current session's
    * (start, end, count) is held, never the events — the 100 TB-friendly
    * shape.
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
      state: GroupState[SessionState]): Iterator[Session] = {
    def emit(s: SessionState) =
      Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n)

    if (evs.isEmpty) {
      // watermark passed the registered timeout: close the open session
      val out = state.getOption.map(emit).iterator
      state.remove()
      out
    } else {
      val sorted = evs.map(_.ts.getTime).toArray.sorted
      var closed = List.empty[Session]
      var cur = state.getOption.getOrElse {
        SessionState(sorted.head, sorted.head, 0)
      }
      for (t <- sorted) {
        if (t - cur.end > gapMs) { // gap exceeded: close, start fresh
          closed ::= emit(cur)
          cur = SessionState(t, t, 1)
        } else {
          cur = SessionState(math.min(cur.start, t), math.max(cur.end, t),
            cur.n + 1)
        }
      }
      state.update(cur)
      state.setTimeoutTimestamp(cur.end + gapMs)
      closed.reverseIterator
    }
  }
}
