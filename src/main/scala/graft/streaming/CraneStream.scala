package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.VersionedStore

/** End-to-end streaming lifecycle: source → app transform → running
  * aggregate → periodic versioned top-K snapshot. This is the Spark
  * rebuild of `start <app> <file> [period sendPeriod]`
  * (client.go:286-291 → Crane.StartApp, SURVEY.md §3.1):
  *
  *  - the rate-limited spout (Crane.go:63-99: one line per SendPeriod)
  *    becomes a file/socket/rate source with a processing-time trigger;
  *  - the XOR-acker + replay machinery (acker.go, Crane.go:106-128) is
  *    subsumed by checkpointed offsets + state store (exactly-once);
  *  - the 10 s snapshot ticker (Crane.go:30,193-204) becomes
  *    Trigger.ProcessingTime(period);
  *  - writeToSDFS's versioned top-5 put (wordCount.go:99-137) becomes a
  *    foreachBatch write of the top-K into a VersionedStore, one version
  *    per micro-batch (batchId as the version — deterministic across
  *    restarts, unlike wall-clock; SURVEY.md §7.5).
  */
object CraneStream {

  /** The built-in RocksDB state store provider — the 100 TB streaming
    * story. The default (HDFS-backed) provider keeps EVERY key's state
    * on the executor heap between checkpoints, so running counts or
    * open sessions over a high-cardinality key space are memory-bound;
    * RocksDB keeps state on local disk behind a bounded block cache,
    * so state size is disk-bound and the executor heap holds only the
    * working set. Provider choice is recorded in the checkpoint and
    * must stay consistent across restarts of the same query — the
    * stateful entry points below pin it BEFORE start so a restarted
    * query always reopens the same store format. */
  // the provider class is private[spark]; its FQCN is the public
  // configuration surface (Structured Streaming programming guide)
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Pin the session's streaming state store to RocksDB (see
    * [[RocksDbProvider]]); applies to queries STARTED after this call. */
  def useRocksDbStateStore(spark: SparkSession): Unit =
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", RocksDbProvider)

  /** Start a query under the RocksDB provider WITHOUT leaking the
    * session-global conf to queries started later: the provider class
    * is one of the confs Spark captures into the query's offset
    * metadata at first start (and reapplies on every restart from that
    * checkpoint), so the started query keeps RocksDB for life while
    * the session conf reverts for everyone else.
    *
    * The set/start/restore window mutates SESSION-global state, so
    * concurrent `start`s on the same session could capture the wrong
    * provider into a checkpoint for life; the lock serializes every
    * graft entry point that starts a stateful query. (A query started
    * concurrently by code OUTSIDE this object during the window is
    * still exposed — callers sharing a session with foreign streaming
    * code should pin the provider explicitly via
    * [[useRocksDbStateStore]] instead.) */
  private val startLock = new Object
  private def startOnRocksDb(spark: SparkSession)
                            (start: => StreamingQuery): StreamingQuery =
    startLock.synchronized {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, RocksDbProvider)
      try start
      finally prior match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }

  /** Unbounded line stream from files appearing under `dir`
    * (the spout's file source, S1). */
  def fileLines(spark: SparkSession, dir: String,
                maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir).withColumnRenamed("text", "value")

  /** TCP line stream (S5, the comparison apps' socketTextStream). */
  def socketLines(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** Rate-limited replay of a static file's lines — the spout's emit loop
    * (Crane.go:63-99: one line per SendPeriod, line number = messageId).
    * Line i is released when the rate stream reaches sequence number i, so
    * `linesPerSecond` plays the role of 1/SendPeriod and the bench can
    * sweep emit rates like cs425_mp4.pdf Fig. 2A. Implemented as a
    * stream-static broadcast join: the static side is the indexed file,
    * the stream side is Spark's rate source (offset-tracked, replayable —
    * the replay map is subsumed by source offsets). */
  def replayLines(spark: SparkSession, path: String,
                  linesPerSecond: Int): DataFrame = {
    import spark.implicits._
    val indexed = spark.read.textFile(path).rdd.zipWithIndex()
      .map { case (l, i) => (i, l) }.toDF("idx", "value")
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", linesPerSecond).load()
      .withColumnRenamed("value", "seq")
    rate.join(org.apache.spark.sql.functions.broadcast(indexed),
        col("seq") === col("idx"))
      .select(col("value"))
  }

  /** Start an app: running counts in complete mode, top-K snapshot written
    * as a new store version every trigger. Returns the running query.
    *
    * @param lines   streaming single-column `value: string` frame
    * @param app     registered app name (StreamApps.apps)
    * @param store   versioned snapshot sink (the SDFS-put analogue)
    * @param k       snapshot size (reference: 5)
    * @param period  snapshot period (reference Period default 10 s)
    */
  def start(lines: DataFrame, app: String, store: VersionedStore,
            checkpointDir: String, k: Int = 5,
            period: String = "10 seconds"): StreamingQuery = {
    val counts = StreamApps.apps(app)(lines)
    counts.writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(period))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val top = StreamApps.topK(batch, k)
        store.putVersion(s"${app}_result", batchId, top)
        ()
      }
      .start()
  }

  /** The scale path for large key spaces (SURVEY.md §7.5): complete mode
    * re-emits EVERY key each trigger — fine for a top-5 demo, fatal when
    * the running state is billions of keys. Update mode emits only keys
    * whose count changed; the sink merges them into the previous snapshot
    * version (changed keys replace their old rows) and writes the merged
    * state as version = batchId.
    *
    * Idempotent across restarts: a replayed batch merges against the
    * newest version STRICTLY BELOW its own batchId and overwrites its own
    * version, so re-execution produces identical output. Per-trigger cost
    * is O(changed keys + snapshot rewrite); at scale the rewrite becomes a
    * partitioned upsert (merge-on-write on the key's hash bucket), which
    * this structure maps onto directly.
    */
  def startUpdateMode(lines: DataFrame, app: String, store: VersionedStore,
                      checkpointDir: String,
                      period: String = "10 seconds"): StreamingQuery = {
    val counts = StreamApps.apps(app)(lines)
    val key = StreamApps.keyCol(app)
    val name = s"${app}_counts"
    // update mode exists FOR high-cardinality key spaces — pair it with
    // the disk-backed store or the state itself becomes the memory bound
    startOnRocksDb(lines.sparkSession) {
    counts.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(period))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // the merge references `batch` twice (anti-join + union); persist
        // so the stateful scan behind it executes once per trigger — the
        // documented foreachBatch pattern, and required under RocksDB's
        // exclusive per-instance acquire (a re-executed state scan would
        // contend for the same store within the trigger)
        batch.persist()
        try {
          val prior = store.versions(spark, name).filter(_ < batchId)
          val merged =
            if (prior.isEmpty) batch
            else {
              val prev = spark.read.parquet(
                s"${store.root}/$name/version=${prior.last}")
              prev.join(batch, Seq(key), "left_anti").unionByName(batch)
            }
          store.putVersion(name, batchId, merged)
        } finally batch.unpersist()
        ()
      }
      .start()
    }
  }

  /** Bounded-SNAPSHOT top-K for high-cardinality key spaces (SURVEY §7.5's
    * noted hard part; VERDICT r5 item 8) — the third point on the state/
    * output trade-off:
    *
    *  - `start` (complete mode): snapshot work is O(all keys) EVERY
    *    trigger — the aggregation re-emits the entire key space and
    *    topK re-sorts it;
    *  - `startUpdateMode`: triggers emit only changed keys, but the
    *    merge-on-write snapshot still carries every key ever seen;
    *  - this: per-key running counts live in `mapGroupsWithState` (the
    *    same keyed state the aggregation would hold, checkpointed the
    *    same way), triggers emit only changed (key, count) pairs, and
    *    the sink keeps a K-ROW snapshot — per-trigger sink work is
    *    O(changed + K) and stored bytes are O(K), independent of key
    *    cardinality.
    *
    * Exactness under the bounded snapshot relies on counts being
    * MONOTONE non-decreasing: the new top-K can only contain rows from
    * (previous top-K ∪ this trigger's changed keys) — an unchanged key
    * outside the old top-K was already beaten by all K of its rows and
    * nothing shrank. The same argument is why the candidate union below
    * never needs the full key space. Idempotent across restarts like
    * `startUpdateMode`: a replayed batch merges against the newest
    * version strictly below its own batchId and overwrites its own.
    */
  def startTopKBounded(lines: DataFrame, app: String, store: VersionedStore,
                       checkpointDir: String, k: Int = 5,
                       period: String = "10 seconds"): StreamingQuery = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark0 = lines.sparkSession
    import spark0.implicits._
    val key = StreamApps.keyCol(app)
    val name = s"${app}_topk"
    val updates = StreamApps.keyedRows(app)(lines)
      .select(col(key).cast("string")).as[String]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (String, Long)](GroupStateTimeout.NoTimeout) {
        (word, rows, state) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (word, n)
      }
    startOnRocksDb(spark0) {
    updates.toDF(key, "count").writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(period))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // persist: see startUpdateMode — one execution of the keyed-state
        // scan per trigger, mandatory under the RocksDB provider
        batch.persist()
        try {
          val prior = store.versions(spark, name).filter(_ < batchId)
          val candidates =
            if (prior.isEmpty) batch
            else {
              val prev = spark.read.parquet(
                s"${store.root}/$name/version=${prior.last}")
              // changed keys win on collision (their counts are newer)
              prev.join(batch, Seq(key), "left_anti").unionByName(batch)
            }
          store.putVersion(name, batchId, StreamApps.topK(candidates, k))
        } finally batch.unpersist()
        ()
      }
      .start()
    }
  }
}
