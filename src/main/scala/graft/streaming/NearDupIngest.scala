package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup
import graft.sources.VersionedStore

/** Streaming NEAR-dup corpus ingest with a MAINTAINED banded-MinHash
  * index — the piece [[EventTimeOps.corpusIngestIncremental]] lacked:
  * that topology dedups arriving docs against a STATIC fingerprint
  * relation, so two near-identical docs arriving in different triggers
  * both pass (the index goes stale until a batch rebuild). Here every
  * trigger appends the accepted survivors' band signatures to a
  * PERSISTED, versioned band relation (the [[graft.sources
  * .AnnIndexStore]] pattern applied to the dedup index), so a later doc
  * collides with earlier STREAMED docs, not just the offline corpus.
  *
  * Exactly-once: the band/docs versions are keyed by the checkpointed
  * micro-batch id (version = 1 + batchId; the offline corpus's bands
  * seed version 0), and a replayed batch recomputes from versions
  * BEFORE its own and overwrites itself — the same idempotent-version
  * contract as AnnIndexStore.foldBatch. One stream (one checkpoint)
  * owns a store name.
  *
  * Scale shape: per trigger the new docs' band rows (docs × bands,
  * ~16-per-doc strings) hash-join the persisted relation on (band,
  * sig) — never document bodies; the persisted relation is re-written
  * per version (snapshot semantics, see AnnIndexStore's scale note —
  * delta versions + compaction are the sub-second-trigger variant).
  * Within one trigger the same banding dedups the batch against itself
  * (smallest doc_id survives a collision group), so trigger size only
  * affects which doc of a near-dup pair wins, never whether one does.
  */
object NearDupIngest {

  private def bandsName(name: String) = s"${name}_bands"
  private def docsName(name: String) = s"${name}_docs"

  /** Seed version 0 of the band index from the OFFLINE corpus (no-op if
    * the store already has versions — restart safety). Returns the
    * seeded/existing newest version. */
  def seed(spark: SparkSession, store: VersionedStore, name: String,
           corpus: DataFrame, idCol: String, textCol: String,
           n: Int = 3, numPerms: Int = 32, rowsPerBand: Int = 4): Long = {
    val vs = store.versions(spark, bandsName(name))
    if (vs.nonEmpty) vs.last
    else {
      store.putVersion(bandsName(name), 0L,
        Dedup.minhashBandRelation(corpus, idCol, textCol, n, numPerms,
          rowsPerBand))
      0L
    }
  }

  /** foreachBatch body: drop batch docs that band-collide with the
    * persisted index (offline corpus + every earlier ACCEPTED streamed
    * doc) or with a smaller-id doc in the same batch, then write
    * version 1+batchId: the accepted docs as a delta relation and the
    * band index as a snapshot including their signatures. */
  def ingestBatch(store: VersionedStore, name: String, idCol: String,
                  textCol: String, n: Int = 3, numPerms: Int = 32,
                  rowsPerBand: Int = 4)
                 (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val v = 1L + batchId
    val newBands = Dedup.minhashBandRelation(batch, idCol, textCol, n,
      numPerms, rowsPerBand)
      // consumed 3x below (persisted join, in-batch self-join, append)
      .localCheckpoint(true)
    val prev = store.versions(spark, bandsName(name)).filter(_ < v)
      .lastOption
    val persisted = prev.map(store.getVersion(spark, bandsName(name), _))
    // collide vs the PERSISTED index (offline corpus + earlier triggers)
    val hitPersisted = persisted.fold(newBands.limit(0)) { p =>
      newBands.join(p.select("band", "sig").distinct(), Seq("band", "sig"))
    }.select("doc_id").distinct()
    // collide INSIDE the batch: of a colliding pair the smallest doc_id
    // survives (the batch form's doc_a < doc_b canonical-winner rule)
    val afterPersisted = newBands
      .join(hitPersisted, Seq("doc_id"), "left_anti")
    val hitInBatch = afterPersisted.as("a")
      .join(afterPersisted.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") > col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id")).distinct()
    val acceptedBands = afterPersisted
      .join(hitInBatch, Seq("doc_id"), "left_anti")
    // anti-join on the REJECTED ids, not semi-join on the banded ids: a
    // doc shorter than the shingle width has no band rows, cannot
    // collide, and must be accepted (the batch path's nsh > 0 gate)
    val rejected = hitPersisted.unionByName(hitInBatch).distinct()
      .withColumnRenamed("doc_id", idCol)
    val acceptedDocs = batch.join(rejected, Seq(idCol), "left_anti")
    store.putVersion(docsName(name), v, acceptedDocs)
    store.putVersion(bandsName(name), v,
      persisted.fold(acceptedBands)(_ unionByName acceptedBands))
  }

  /** Wire [[EventTimeOps.corpusIngestIncremental]]'s gated, exact-
    * deduped survivor stream into the maintained near-dup index:
    * quality/language gates + exact-fp dedup (in-stream and vs the
    * offline corpus) run in the streaming graph; the band-collision
    * filter and index append run per trigger in [[ingestBatch]].
    * Call [[seed]] first. */
  def start(docs: DataFrame, corpusFps: DataFrame, store: VersionedStore,
            name: String, tsCol: String, idCol: String, textCol: String,
            checkpointDir: String, lateness: String, n: Int = 3,
            numPerms: Int = 32, rowsPerBand: Int = 4): StreamingQuery =
    EventTimeOps.corpusIngestIncremental(docs, corpusFps, tsCol, textCol,
        lateness)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(store, name, idCol, textCol, n, numPerms,
          rowsPerBand)(batch, batchId)
      }
      .start()

  /** Staleness audit over the maintained index: compare the newest
    * persisted band relation against a FRESH recompute over the given
    * corpus (offline docs ∪ accepted streamed docs). One row:
    * (n_persisted, n_fresh, n_missing, n_extra) — (0, 0) missing/extra
    * means the incremental maintenance reproduced the batch rebuild
    * exactly; anything else is the staleness a rebuild would repair. */
  def stalenessAudit(spark: SparkSession, store: VersionedStore,
                     name: String, corpus: DataFrame, idCol: String,
                     textCol: String, n: Int = 3, numPerms: Int = 32,
                     rowsPerBand: Int = 4): DataFrame = {
    val persisted = store.get(spark, bandsName(name))
    val fresh = Dedup.minhashBandRelation(corpus, idCol, textCol, n,
      numPerms, rowsPerBand)
    val key = Seq("doc_id", "band", "sig")
    persisted.agg(count(lit(1)).as("n_persisted"))
      .crossJoin(fresh.agg(count(lit(1)).as("n_fresh")))
      .crossJoin(fresh.join(persisted, key, "left_anti")
        .agg(count(lit(1)).as("n_missing")))
      .crossJoin(persisted.join(fresh, key, "left_anti")
        .agg(count(lit(1)).as("n_extra")))
  }

  /** All accepted streamed docs so far: the union of the per-trigger
    * delta relations. */
  def acceptedDocs(spark: SparkSession, store: VersionedStore,
                   name: String): DataFrame = {
    val vs = store.versions(spark, docsName(name))
    require(vs.nonEmpty, s"no accepted-doc versions under $name")
    store.getVersions(spark, name = docsName(name), n = vs.length)
      .drop("version")
  }
}
