package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.core.Tables
import graft.operators.Ann
import graft.streaming.AnnIngest

/** ANN index lifecycle (AnnIndexStore over VersionedStore): build once,
  * persist versioned, load, serve; streaming assignments fold into new
  * exactly-once versions that serve identically to the batch index. */
class AnnIndexSpec extends SparkSpec {

  private def tmpStore(tag: String) = VersionedStore(
    java.nio.file.Files.createTempDirectory(s"ann_idx_$tag").toString)

  private def topkRows(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("persist -> load -> serve reproduces the inline det-IVF top-k " +
      "bit-for-bit") {
    val embs = Tables.embeddings(spark, sfDir)
    val store = tmpStore("serve")
    val built = Ann.buildDetIvfIndex(embs, "vec_id", "embedding", "label")
    val v = AnnIndexStore.persist(spark, store, "ivf", built)
    v shouldBe 0L
    AnnIndexStore.versions(spark, store, "ivf") shouldBe Seq(0L)
    val loaded = AnnIndexStore.load(spark, store, "ivf")
    val served = topkRows(Ann.ivfIndexTopK(loaded, embs, "vec_id",
      "embedding", col("id") % 50 === 0, k = 5))
    val inline = topkRows(Ann.ivfDetTopK(embs, "vec_id", "embedding",
      "label", col("id") % 50 === 0, k = 5))
    served shouldBe inline
    // the loaded routing table IS the batch home-cell relation
    val home = loaded.home.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Ann.ivfDetHomeCells(embs, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    home shouldBe batch
  }

  test("IVF-PQ: persist all four artifacts -> load -> serve reproduces " +
      "the inline det chain bit-for-bit; prunePq retains") {
    val embs = Tables.embeddings(spark, sfDir)
    val store = tmpStore("pq")
    val built = Ann.buildDetIvfPqIndex(embs, "vec_id", "embedding",
      "label")
    AnnIndexStore.persistPq(spark, store, "ivfpq", built) shouldBe 0L
    AnnIndexStore.persistPq(spark, store, "ivfpq", built) shouldBe 1L
    AnnIndexStore.prunePq(spark, store, "ivfpq", keep = 1)
    AnnIndexStore.versionsPq(spark, store, "ivfpq") shouldBe Seq(1L)
    val loaded = AnnIndexStore.loadPq(spark, store, "ivfpq")
    val served = topkRows(Ann.ivfPqIndexTopK(loaded, embs, "vec_id",
      "embedding", col("id") % 50 === 0, k = 5))
    val inline = topkRows(Ann.ivfPqDetTopK(embs, "vec_id", "embedding",
      "label", col("id") % 50 === 0, k = 5))
    served shouldBe inline
    // codes really are the compact payload: one row per vector, 8
    // codewords each
    loaded.codes.count() shouldBe embs.count()
    loaded.codes.selectExpr("max(size(codes))").collect()
      .head.getInt(0) shouldBe 8
  }

  test("SQ8: persist both artifacts -> load -> serve reproduces the " +
      "inline det chain bit-for-bit; pruneSq8 retains") {
    val embs = Tables.embeddings(spark, sfDir)
    val store = tmpStore("sq8")
    val built = Ann.buildSq8Index(embs, "vec_id", "embedding")
    AnnIndexStore.persistSq8(spark, store, "sq8", built) shouldBe 0L
    AnnIndexStore.persistSq8(spark, store, "sq8", built) shouldBe 1L
    AnnIndexStore.pruneSq8(spark, store, "sq8", keep = 1)
    AnnIndexStore.versionsSq8(spark, store, "sq8") shouldBe Seq(1L)
    val loaded = AnnIndexStore.loadSq8(spark, store, "sq8")
    val served = topkRows(Ann.sq8IndexTopK(loaded, embs, "vec_id",
      "embedding", col("id") % 50 === 0, k = 5))
    val inline = topkRows(Ann.sq8DetTopK(embs, "vec_id", "embedding",
      col("id") % 50 === 0, k = 5))
    served shouldBe inline
    // the trained quantizer is corpus-size-free (one row per
    // dimension) and codes are the byte-per-coordinate payload
    loaded.ranges.count() shouldBe 64L
    loaded.codes.count() shouldBe embs.count()
    val codeBounds = loaded.codes
      .selectExpr("min(array_min(codes))", "max(array_max(codes))")
      .collect().head
    assert(codeBounds.getLong(0) >= 0L && codeBounds.getLong(1) <= 255L,
      s"SQ8 codes outside [0, 255]: $codeBounds")
  }

  test("versions auto-increment; load pins the newest complete one; " +
      "prune keeps the newest K") {
    val embs = Tables.embeddings(spark, sfDir)
    val store = tmpStore("vers")
    val built = Ann.buildDetIvfIndex(embs, "vec_id", "embedding", "label")
    AnnIndexStore.persist(spark, store, "ivf", built) shouldBe 0L
    AnnIndexStore.persist(spark, store, "ivf", built) shouldBe 1L
    AnnIndexStore.persist(spark, store, "ivf", built) shouldBe 2L
    AnnIndexStore.versions(spark, store, "ivf") shouldBe Seq(0L, 1L, 2L)
    AnnIndexStore.prune(spark, store, "ivf", keep = 2)
    AnnIndexStore.versions(spark, store, "ivf") shouldBe Seq(1L, 2L)
    // a version missing one half is invisible (two-file commit safety)
    store.putVersion("ivf_home", 9L, built.home)
    AnnIndexStore.versions(spark, store, "ivf") shouldBe Seq(1L, 2L)
    val loaded = AnnIndexStore.load(spark, store, "ivf")
    loaded.home.count() shouldBe built.home.count()
  }

  test("commit marker: a version directory without its marker (a " +
      "writer died mid-write) is invisible and unreadable") {
    val embs = Tables.embeddings(spark, sfDir)
    val store = tmpStore("marker")
    val built = Ann.buildDetIvfIndex(embs, "vec_id", "embedding", "label")
    store.putVersion("x", 0L, built.home)
    store.versions(spark, "x") shouldBe Seq(0L)
    // simulate the in-flight window: the directory exists, the data and
    // marker do not
    new java.io.File(s"${store.root}/x/version=1").mkdirs() shouldBe true
    store.versions(spark, "x") shouldBe Seq(0L)
    intercept[IllegalArgumentException](store.getVersion(spark, "x", 1L))
  }

  test("a reader pinned to version 0 is unaffected by a newer version " +
      "landing underneath it (consistent-snapshot serve)") {
    val embs = Tables.embeddings(spark, sfDir)
    val store = tmpStore("pin")
    val built = Ann.buildDetIvfIndex(embs, "vec_id", "embedding", "label")
    AnnIndexStore.persistVersion(store, "ivf", 0L, built)
    val pinned = AnnIndexStore.loadVersion(spark, store, "ivf", 0L)
    val before = topkRows(Ann.ivfIndexTopK(pinned, embs, "vec_id",
      "embedding", col("id") % 50 === 0, k = 5))
    // a decoy newer version lands mid-stream: EMPTY routing table — a
    // reader that leaked to the newest version would return zero rows
    AnnIndexStore.persistVersion(store, "ivf", 1L,
      Ann.IvfIndexRelations(built.centroids, built.home.limit(0)))
    // re-executing the pinned handle re-reads version 0's files only
    topkRows(Ann.ivfIndexTopK(pinned, embs, "vec_id", "embedding",
      col("id") % 50 === 0, k = 5)) shouldBe before
    // while an unpinned newest-version reader does see the new version
    AnnIndexStore.load(spark, store, "ivf").home.count() shouldBe 0L
    before shouldBe topkRows(Ann.ivfDetTopK(embs, "vec_id", "embedding",
      "label", col("id") % 50 === 0, k = 5))
  }

  test("delta maintenance: chain reads equal the snapshot fold at " +
      "every version; compaction preserves the view and drops covered " +
      "deltas; the compacted chain serves identically") {
    val embs = Tables.embeddings(spark, sfDir)
    val store = tmpStore("delta")
    val built = Ann.buildDetIvfIndex(embs, "vec_id", "embedding", "label")
    def homeSet(r: Ann.IvfIndexRelations) =
      r.home.collect().map(x => x.getLong(0) -> x.getLong(1)).toSet
    def batch(b: Long) = built.home.filter(col("cell") % 3 === b)
      .select(col("id").as("vec_id"), col("cell"))
    // the same three "triggers" fed to both maintenance modes
    (0L until 3L).foreach { b =>
      AnnIndexStore.foldBatch(store, "snap", built.centroids,
        baseVersion = -1L)(batch(b), b)
      AnnIndexStore.foldBatchDelta(store, "dlt", built.centroids,
        baseVersion = -1L)(batch(b), b)
    }
    (0L until 3L).foreach { v =>
      homeSet(AnnIndexStore.loadDeltaChain(spark, store, "dlt", v)) shouldBe
        homeSet(AnnIndexStore.loadVersion(spark, store, "snap", v))
    }
    // compact versions 0-1; version-2 delta stays; view unchanged
    AnnIndexStore.compact(spark, store, "dlt", upTo = 1L)
    AnnIndexStore.versions(spark, store, "dlt") shouldBe Seq(1L)
    AnnIndexStore.deltaVersions(spark, store, "dlt") shouldBe Seq(2L)
    homeSet(AnnIndexStore.loadChain(spark, store, "dlt")) shouldBe
      homeSet(AnnIndexStore.loadVersion(spark, store, "snap", 2L))
    // full compaction: pure snapshot read, still the same view
    AnnIndexStore.compact(spark, store, "dlt", upTo = 2L)
    AnnIndexStore.deltaVersions(spark, store, "dlt") shouldBe empty
    homeSet(AnnIndexStore.loadChain(spark, store, "dlt")) shouldBe
      homeSet(AnnIndexStore.load(spark, store, "snap"))
    // and the compacted chain SERVES identically to the inline chain
    topkRows(Ann.ivfIndexTopK(AnnIndexStore.loadChain(spark, store,
      "dlt"), embs, "vec_id", "embedding", col("id") % 50 === 0,
      k = 5)) shouldBe
      topkRows(Ann.ivfDetTopK(embs, "vec_id", "embedding", "label",
        col("id") % 50 === 0, k = 5))
  }

  test("IVF-PQ delta maintenance: chain reads equal the snapshot fold " +
      "at every version; compaction preserves the view, drops covered " +
      "deltas, and the compacted chain serves identically") {
    val embs = Tables.embeddings(spark, sfDir)
    val store = tmpStore("pqdelta")
    val built = Ann.buildDetIvfPqIndex(embs, "vec_id", "embedding",
      "label")
    val full = built.home
      .join(built.codes.withColumnRenamed("id", "cid"),
        col("id") === col("cid"))
      .select(col("id").as("vec_id"), col("cell"), col("codes"))
      .localCheckpoint(true)
    def batch(b: Long) = full.filter(col("vec_id") % 3 === b)
    def view(r: Ann.IvfPqIndexRelations) =
      (r.home.collect().map(x => x.getLong(0) -> x.getLong(1)).toSet,
       r.codes.collect()
         .map(x => x.getLong(0) -> x.getSeq[Long](1).toList).toSet)
    // the same three "triggers" fed to both maintenance modes
    (0L until 3L).foreach { b =>
      AnnIndexStore.foldBatchPq(store, "snap", built.centroids,
        built.codebook, baseVersion = -1L)(batch(b), b)
      AnnIndexStore.foldBatchDeltaPq(store, "dlt", built.centroids,
        built.codebook, baseVersion = -1L)(batch(b), b)
    }
    (0L until 3L).foreach { v =>
      view(AnnIndexStore.loadDeltaChainPq(spark, store, "dlt", v)) shouldBe
        view(loadPqVersion(store, "snap", v))
    }
    // compact versions 0-1; version-2 deltas stay; view unchanged
    AnnIndexStore.compactPq(spark, store, "dlt", upTo = 1L)
    AnnIndexStore.versionsPq(spark, store, "dlt") shouldBe Seq(1L)
    AnnIndexStore.deltaVersionsPq(spark, store, "dlt") shouldBe Seq(2L)
    view(AnnIndexStore.loadChainPq(spark, store, "dlt")) shouldBe
      view(loadPqVersion(store, "snap", 2L))
    // full compaction: pure snapshot read, still the same view, and the
    // compacted chain SERVES identically to the inline det chain
    AnnIndexStore.compactPq(spark, store, "dlt", upTo = 2L)
    AnnIndexStore.deltaVersionsPq(spark, store, "dlt") shouldBe empty
    view(AnnIndexStore.loadChainPq(spark, store, "dlt")) shouldBe
      view(AnnIndexStore.loadPq(spark, store, "snap"))
    topkRows(Ann.ivfPqIndexTopK(AnnIndexStore.loadChainPq(spark, store,
      "dlt"), embs, "vec_id", "embedding", col("id") % 50 === 0,
      k = 5)) shouldBe
      topkRows(Ann.ivfPqDetTopK(embs, "vec_id", "embedding", "label",
        col("id") % 50 === 0, k = 5))
  }

  private def loadPqVersion(store: VersionedStore, name: String,
                            v: Long): Ann.IvfPqIndexRelations =
    Ann.IvfPqIndexRelations(
      store.getVersion(spark, s"${name}_centroids", v),
      store.getVersion(spark, s"${name}_home", v),
      store.getVersion(spark, s"${name}_codebook", v),
      store.getVersion(spark, s"${name}_pqcodes", v))

  test("SQ8 delta maintenance: chain reads equal the snapshot fold at " +
      "every version; compaction preserves the view, drops covered " +
      "deltas, and the compacted chain serves identically") {
    val embs = Tables.embeddings(spark, sfDir)
    val store = tmpStore("sq8delta")
    val built = Ann.buildSq8Index(embs, "vec_id", "embedding")
    val full = built.codes
      .select(col("id").as("vec_id"), col("codes")).localCheckpoint(true)
    def batch(b: Long) = full.filter(col("vec_id") % 3 === b)
    def codeSet(r: Ann.Sq8IndexRelations) = r.codes.collect()
      .map(x => x.getLong(0) -> x.getSeq[Long](1).toList).toSet
    (0L until 3L).foreach { b =>
      AnnIndexStore.foldBatchSq8(store, "snap", built.ranges,
        baseVersion = -1L)(batch(b), b)
      AnnIndexStore.foldBatchDeltaSq8(store, "dlt", built.ranges,
        baseVersion = -1L)(batch(b), b)
    }
    (0L until 3L).foreach { v =>
      codeSet(AnnIndexStore.loadDeltaChainSq8(spark, store, "dlt", v)) shouldBe
        codeSet(Ann.Sq8IndexRelations(
          store.getVersion(spark, "snap_ranges", v),
          store.getVersion(spark, "snap_sq8codes", v)))
    }
    AnnIndexStore.compactSq8(spark, store, "dlt", upTo = 1L)
    AnnIndexStore.versionsSq8(spark, store, "dlt") shouldBe Seq(1L)
    AnnIndexStore.deltaVersionsSq8(spark, store, "dlt") shouldBe Seq(2L)
    codeSet(AnnIndexStore.loadChainSq8(spark, store, "dlt")) shouldBe
      codeSet(AnnIndexStore.loadSq8(spark, store, "snap"))
    AnnIndexStore.compactSq8(spark, store, "dlt", upTo = 2L)
    AnnIndexStore.deltaVersionsSq8(spark, store, "dlt") shouldBe empty
    topkRows(Ann.sq8IndexTopK(AnnIndexStore.loadChainSq8(spark, store,
      "dlt"), embs, "vec_id", "embedding", col("id") % 50 === 0,
      k = 5)) shouldBe
      topkRows(Ann.sq8DetTopK(embs, "vec_id", "embedding",
        col("id") % 50 === 0, k = 5))
  }

  test("streaming delta ingest with periodic compaction: the " +
      "reconstruction fan-in stays bounded (<= compactEvery + 1 " +
      "parts), and serving right after a MID-STREAM compaction equals " +
      "the batch index over the same ingested rows") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val embs = Tables.embeddings(spark, sfDir)
    val built = Ann.buildDetIvfIndex(embs, "vec_id", "embedding", "label")
    val store = tmpStore("foldcompact")
    val plane = Ann.detIvfCentroidPlaneOf(built.centroids)
    val rows = embs.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val parts = rows.grouped(rows.length / 5 + 1).toSeq // 5 triggers
    val compactEvery = 2
    def ts(i: Int) = new Timestamp(86400000L + i * 1000L)
    def fanIn(): Int = {
      val vs = DeltaChain.versions(spark, store, "ivfc_home",
        "ivfc_home_delta")
      DeltaChain.readParts(spark, store, "ivfc_home",
        "ivfc_home_delta", vs.last).length
    }
    def servedEqualsBatchOver(ids: Set[Long]): Unit = {
      val chain = AnnIndexStore.loadChain(spark, store, "ivfc")
      val restricted = Ann.IvfIndexRelations(built.centroids,
        built.home.filter(col("id").isInCollection(ids)))
      topkRows(Ann.ivfIndexTopK(chain, embs, "vec_id", "embedding",
        col("id") % 50 === 0, k = 5)) shouldBe
        topkRows(Ann.ivfIndexTopK(restricted, embs, "vec_id",
          "embedding", col("id") % 50 === 0, k = 5))
    }
    val in = MemoryStream[AnnIngest.VecIn]
    val ckpt = java.nio.file.Files.createTempDirectory("ann_foldc_ck")
    val q = AnnIngest.startFoldDelta(in.toDS(), plane, store, "ivfc",
      built.centroids, ckpt.toString, lateness = "10 minutes",
      compactEvery = compactEvery)
    try {
      var off = 0
      parts.zipWithIndex.foreach { case (part, b) =>
        in.addData(part.zipWithIndex.map { case ((id, v), i) =>
          AnnIngest.VecIn(id, ts(off + i), v) }.toSeq)
        q.processAllAvailable()
        off += part.length
        // the invariant compaction buys: bounded reconstruction fan-in
        // after EVERY trigger, however the engine slices micro-batches
        // (watermark-advance triggers interleave empty batches)
        fanIn() should be <= (compactEvery + 1)
        // and at every point mid-stream — including right after a
        // compaction — the chain serves exactly what a batch index
        // over the so-far-ingested rows serves
        servedEqualsBatchOver(parts.take(b + 1).flatten.map(_._1).toSet)
      }
    } finally q.stop()
    // compactions landed mid-stream: snapshots exist and the trailing
    // delta count is bounded by the compaction period
    AnnIndexStore.versions(spark, store, "ivfc") should not be empty
    AnnIndexStore.deltaVersions(spark, store, "ivfc").size should
      be <= compactEvery
    // fully ingested: the chain serves identically to the inline index
    topkRows(Ann.ivfIndexTopK(AnnIndexStore.loadChain(spark, store,
      "ivfc"), embs, "vec_id", "embedding", col("id") % 50 === 0,
      k = 5)) shouldBe
      topkRows(Ann.ivfDetTopK(embs, "vec_id", "embedding", "label",
        col("id") % 50 === 0, k = 5))
  }

  test("a re-ingested id with a CHANGED payload reads latest-version-" +
      "wins: chain reads, compaction, and post-compaction deltas all " +
      "keep exactly one (the newest) row per id") {
    import spark.implicits._
    val store = tmpStore("reingest")
    val cent = spark.range(4)
      .selectExpr("id AS cell", "id % 2 AS dim", "id * 10 AS ci")
    def homeDf(pairs: (Long, Long)*) =
      pairs.toSeq.toDF("vec_id", "cell")
    def homes() = AnnIndexStore.loadChain(spark, store, "r").home
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    // trigger 0: ids 0..9; trigger 1 RE-INGESTS id 3 into a new cell
    // (legal beyond the streaming lateness horizon — the watermark
    // dedup only suppresses replays inside it)
    AnnIndexStore.foldBatchDelta(store, "r", cent, baseVersion = -1L)(
      homeDf((0L until 10L).map(i => (i, i % 4)): _*), 0L)
    AnnIndexStore.foldBatchDelta(store, "r", cent, baseVersion = -1L)(
      homeDf((3L, 2L)), 1L)
    homes().length shouldBe 10 // one row per id, not distinct()'s 11
    homes().toMap.apply(3L) shouldBe 2L // the newer assignment won
    // compaction bakes the WINNER into the snapshot, not both rows
    AnnIndexStore.compact(spark, store, "r", upTo = 1L)
    homes().length shouldBe 10
    homes().toMap.apply(3L) shouldBe 2L
    // a post-compaction delta supersedes the snapshot row too
    AnnIndexStore.foldBatchDelta(store, "r", cent, baseVersion = -1L)(
      homeDf((3L, 0L)), 2L)
    homes().length shouldBe 10
    homes().toMap.apply(3L) shouldBe 0L
    // same contract on the IVF-PQ code chain: the re-encoded codes win
    def codesDf(rows: (Long, Seq[Long])*) =
      rows.toSeq.toDF("vec_id", "codes")
        .withColumn("cell", col("vec_id") % 4)
        .select("vec_id", "cell", "codes")
    val cb = spark.range(8).selectExpr("id % 4 AS cw", "id DIV 4 AS j",
      "id % 2 AS dim", "id AS ci")
    AnnIndexStore.foldBatchDeltaPq(store, "rpq", cent, cb,
      baseVersion = -1L)(codesDf((1L, Seq(1L, 2L)), (2L, Seq(3L, 4L))),
      0L)
    AnnIndexStore.foldBatchDeltaPq(store, "rpq", cent, cb,
      baseVersion = -1L)(codesDf((1L, Seq(2L, 1L))), 1L)
    val pq = AnnIndexStore.loadChainPq(spark, store, "rpq")
    val codeRows = pq.codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toSeq
    codeRows.length shouldBe 2
    codeRows.toMap.apply(1L) shouldBe List(2L, 1L)
  }

  test("SNAPSHOT-mode folds apply the same latest-wins contract: an id " +
      "re-ingested with a changed payload keeps only the batch's row " +
      "in all three families") {
    import spark.implicits._
    val store = tmpStore("reingest_snap")
    val cent = spark.range(4)
      .selectExpr("id AS cell", "id % 2 AS dim", "id * 10 AS ci")
    def homeDf(pairs: (Long, Long)*) =
      pairs.toSeq.toDF("vec_id", "cell")
    // IVF: trigger 1 re-routes id 3 — the full-snapshot rewrite must
    // carry the NEW row only (distinct() kept both, giving one
    // candidate two TopK slots through its stale routing row)
    AnnIndexStore.foldBatch(store, "s", cent, baseVersion = -1L)(
      homeDf((0L until 10L).map(i => (i, i % 4)): _*), 0L)
    AnnIndexStore.foldBatch(store, "s", cent, baseVersion = -1L)(
      homeDf((3L, 2L)), 1L)
    val sHome = AnnIndexStore.load(spark, store, "s").home.collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    sHome.length shouldBe 10
    sHome.toMap.apply(3L) shouldBe 2L
    // IVF-PQ: both per-vector relations (routing AND codes) supersede
    val cb = spark.range(8).selectExpr("id % 4 AS cw", "id DIV 4 AS j",
      "id % 2 AS dim", "id AS ci")
    def pqBatch(rows: (Long, Long, Seq[Long])*) =
      rows.toSeq.toDF("vec_id", "cell", "codes")
    AnnIndexStore.foldBatchPq(store, "spq", cent, cb, baseVersion = -1L)(
      pqBatch((1L, 1L, Seq(1L, 2L)), (2L, 2L, Seq(3L, 4L))), 0L)
    AnnIndexStore.foldBatchPq(store, "spq", cent, cb, baseVersion = -1L)(
      pqBatch((1L, 3L, Seq(2L, 1L))), 1L)
    val spq = AnnIndexStore.loadPq(spark, store, "spq")
    val spqHome = spq.home.collect().map(r => r.getLong(0) -> r.getLong(1))
    spqHome.length shouldBe 2
    spqHome.toMap.apply(1L) shouldBe 3L
    val spqCodes = spq.codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList)
    spqCodes.length shouldBe 2
    spqCodes.toMap.apply(1L) shouldBe List(2L, 1L)
    // SQ8: re-encoded byte codes win
    val ranges = spark.range(2)
      .selectExpr("id AS dim", "0L AS lo", "100L AS scl")
    def sq8Batch(rows: (Long, Seq[Long])*) =
      rows.toSeq.toDF("vec_id", "codes")
    AnnIndexStore.foldBatchSq8(store, "ssq", ranges, baseVersion = -1L)(
      sq8Batch((1L, Seq(10L, 20L)), (2L, Seq(30L, 40L))), 0L)
    AnnIndexStore.foldBatchSq8(store, "ssq", ranges, baseVersion = -1L)(
      sq8Batch((1L, Seq(20L, 10L))), 1L)
    val ssq = AnnIndexStore.loadSq8(spark, store, "ssq").codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList)
    ssq.length shouldBe 2
    ssq.toMap.apply(1L) shouldBe List(20L, 10L)
  }

  test("one store name can serve the PQ and SQ8 families side by side: " +
      "family-distinct base names keep the version sets disjoint") {
    import spark.implicits._
    val store = tmpStore("famsplit")
    val cent = spark.range(4)
      .selectExpr("id AS cell", "id % 2 AS dim", "id * 10 AS ci")
    val cb = spark.range(8).selectExpr("id % 4 AS cw", "id DIV 4 AS j",
      "id % 2 AS dim", "id AS ci")
    val ranges = spark.range(2)
      .selectExpr("id AS dim", "0L AS lo", "100L AS scl")
    // the SAME index name for both families — before the r15 base-name
    // split, both snapshot code relations were "<name>_codes" and the
    // SQ8 version listing would see the PQ write (and vice versa)
    AnnIndexStore.foldBatchPq(store, "ix", cent, cb, baseVersion = -1L)(
      Seq((1L, 1L, Seq(1L, 2L))).toDF("vec_id", "cell", "codes"), 0L)
    AnnIndexStore.versionsSq8(spark, store, "ix") shouldBe empty
    AnnIndexStore.foldBatchSq8(store, "ix", ranges, baseVersion = -1L)(
      Seq((7L, Seq(10L, 20L))).toDF("vec_id", "codes"), 0L)
    // each family reads back ONLY its own codes
    val pqCodes = AnnIndexStore.loadPq(spark, store, "ix").codes
      .collect().map(_.getLong(0)).toSet
    val sqCodes = AnnIndexStore.loadSq8(spark, store, "ix").codes
      .collect().map(_.getLong(0)).toSet
    pqCodes shouldBe Set(1L)
    sqCodes shouldBe Set(7L)
  }

  test("streaming assignments fold into exactly-once index versions " +
      "and the folded newest version serves identically to the batch " +
      "index") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val embs = Tables.embeddings(spark, sfDir)
    val built = Ann.buildDetIvfIndex(embs, "vec_id", "embedding", "label")
    // the ingest plane comes from the PERSISTED quantizer relation —
    // the load-once, ship-as-metadata path (never rebuilt per batch)
    val store = tmpStore("fold")
    val plane = Ann.detIvfCentroidPlaneOf(built.centroids)
    val rows = embs.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val (half1, half2) = rows.splitAt(rows.length / 2)
    def ts(i: Int) = new Timestamp(86400000L + i * 1000L)

    val in = MemoryStream[AnnIngest.VecIn]
    val ckpt = java.nio.file.Files.createTempDirectory("ann_fold_ck")
    val q = AnnIngest.assignCells(in.toDS(), plane, lateness = "10 minutes")
      .toDF().writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        AnnIndexStore.foldBatch(store, "ivf", built.centroids,
          baseVersion = -1L)(batch, batchId)
      }
      .start()
    try {
      in.addData(half1.zipWithIndex.map { case ((id, v), i) =>
        AnnIngest.VecIn(id, ts(i), v) }.toSeq)
      q.processAllAvailable()
      val midVersions = AnnIndexStore.versions(spark, store, "ivf")
      midVersions should not be empty
      // second batch arrives WITH a re-delivery of a first-half id —
      // the folded relation must still hold exactly one row per vector
      in.addData((half2 :+ half1.head).zipWithIndex.map { case ((id, v), i) =>
        AnnIngest.VecIn(id, ts(half1.length + i), v) }.toSeq)
      q.processAllAvailable()
      AnnIndexStore.versions(spark, store, "ivf").size should be >
        midVersions.size
    } finally q.stop()

    val folded = AnnIndexStore.load(spark, store, "ivf")
    val foldedHome = folded.home.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchHome = Ann.ivfDetHomeCells(embs, "vec_id", "embedding",
      "label").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    foldedHome.size shouldBe rows.length // exactly once per vector
    foldedHome shouldBe batchHome
    // and the folded version SERVES: same top-k as the inline chain
    val served = topkRows(Ann.ivfIndexTopK(folded, embs, "vec_id",
      "embedding", col("id") % 50 === 0, k = 5))
    val inline = topkRows(Ann.ivfDetTopK(embs, "vec_id", "embedding",
      "label", col("id") % 50 === 0, k = 5))
    served shouldBe inline
  }
}
