package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Ann, Dedup, Graph}
import graft.plans.AsOfNative

/** Second-decade scale evidence for the DETERMINISTIC index families —
  * the registered 100 TB defaults: det-MinHash, det-SimHash, det-LSH
  * kNN graph, det-IVF, det-PQ, det-IVF-PQ, det-LSH cosine pairs, plus
  * the native as-of join as the event-family representative. Each op
  * runs at three rungs a decade apart (base sf0.1 → ×10 → ×100:
  * 5k/50k/500k docs, 2k/20k/200k vecs, 100k/1M/10M events), so the
  * ladder yields TWO per-decade exponents — a trend, not a point.
  * Synthetic copy construction matches [[ScaleTrend]]'s (suffix-disjoint
  * token spaces, per-copy direction perturbation, disjoint user spaces)
  * so output growth models a grown corpus, not result-size explosion.
  *
  * Methodology mirrors Bench/ScaleTrend: one warmup pass absorbs
  * codegen/JIT, each measurement clears caches and GCs first, count()
  * forces execution. Writes the markdown table to /tmp/scale_deep.md.
  */
object ScaleTrendDeep {

  private def timed(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  /** Bench's host-drift sentinel (fixed 400M-step xorshift64 loop,
    * one core): timed at run start and end and RECORDED in the JSON
    * artifact, so cross-round comparison of deep-rung numbers can
    * divide out host speed the same way the official bench records
    * do. */
  private var sentinelSink = 0L
  private def sentinel(): Double = {
    def loop(n: Long): Long = {
      var s = 88172645463325252L
      var i = 0L
      while (i < n) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        i += 1
      }
      s
    }
    sentinelSink ^= loop(50000000L)
    val t0 = System.nanoTime()
    sentinelSink ^= loop(400000000L)
    (System.nanoTime() - t0) / 1e9
  }

  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the 100M+-pair ADC sorts of the DECADE3 rungs need far more
    // (smaller) shuffle partitions than threads, or single-partition
    // sorts GC-stall the shared local-mode JVM past the heartbeat
    // timeout (round-12 close, SCALE_r12.md appendix) — overridable
    // without a code change
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf01 = "/root/testdata/sf0.1"

    /** n suffix-disjoint copies of the sf0.1 documents. The copy offset
      * is 100M, NOT 10M: pipeline_media_prep internally offsets its PNG
      * copy ids by 10M, so a 10M ladder offset would collide copy i's
      * PNG ids with copy i+1's PGM ids and break media_id uniqueness. */
    def docsNx(n: Int): DataFrame = (0 until n).map { i =>
      val base = Tables.documents(spark, sf01).select("doc_id", "text")
      if (i == 0) base
      else base.select(
        (col("doc_id") + i * 100000000L).as("doc_id"),
        array_join(
          transform(split(col("text"), "\\s+"), t => concat(t, lit(s"_$i"))),
          " ").as("text"))
    }.reduce(_ unionByName _)

    /** n direction-perturbed copies of the sf0.1 embeddings (label kept
      * for the det-IVF cell structure; copies reuse the base labels, so
      * cells grow in membership like a real corpus). */
    def embNx(n: Int): DataFrame = (0 until n).map { i =>
      val base = Tables.embeddings(spark, sf01)
        .select("vec_id", "embedding", "label")
      if (i == 0) base
      else base.select(
        (col("vec_id") + i * 10000000L).as("vec_id"),
        transform(col("embedding"),
          (x, j) => x + ((lit(i) * 31 + j) % 7).cast("float") * lit(0.03f)
            - lit(0.09f)).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)

    /** n disjoint-user copies of the sf0.1 events. */
    def eventsNx(n: Int): DataFrame = (0 until n).map { i =>
      val base = Tables.events(spark, sf01)
        .select("event_id", "user_id", "ts", "event_type")
      if (i == 0) base
      else base.select(
        (col("event_id") + i * 1000000000L).as("event_id"),
        (col("user_id") + i * 1000000000L).as("user_id"),
        col("ts"), col("event_type"))
    }.reduce(_ unionByName _)

    /** n-node path graph: the adversarial case for min-label
      * propagation (diameter = n-1, one round per hop — structurally
      * excluded from this ladder), and exactly the shape two-star's
      * logarithmic round bound is for: each large-star round halves
      * every remaining distance to the component minimum. */
    def chainPairs(n: Long): DataFrame =
      spark.range(n - 1)
        .select(col("id").as("a"), (col("id") + 1).as("b"))

    val chainInputs = Seq(
      ("chain_10k", chainPairs(10000L)),
      ("chain_100k", chainPairs(100000L)),
      ("chain_1m", chainPairs(1000000L)))

    /** Synthetic uniform-attachment graph with GROWING node count — the
      * registered graph family runs on the fixed 25-node nation graph
      * (its edges scale, its vertex set doesn't), so this rung is the
      * evidence the graph OPERATORS scale in |V|: every node i >= 1
      * drops 3 md5-derived edges onto earlier nodes (connected by
      * construction, ~log-distributed in-degrees, O(log n) diameter —
      * the shape a web/citation corpus takes). Generated in-plan from
      * range(): no parquet materialization, the operators' shuffles
      * dominate. */
    def graphEdges(n: Long): DataFrame =
      spark.range(1L, n)
        .select(col("id"), explode(sequence(lit(0), lit(2))).as("j"))
        .select(col("id").as("src"),
          (conv(substring(md5(concat(col("id").cast("string"), lit(":"),
            col("j").cast("string"))), 1, 15), 16, 10).cast("long")
            % col("id")).as("dst"))

    val graphInputs = Seq(
      ("graph_100k", graphEdges(100000L)),
      ("graph_1m", graphEdges(1000000L)),
      ("graph_10m", graphEdges(10000000L)))

    val docInputs = Seq(
      ("docs_5k", docsNx(1)), ("docs_50k", docsNx(10)),
      ("docs_500k", docsNx(100)))
    val embInputs = Seq(
      ("emb_2k", embNx(1)), ("emb_20k", embNx(10)),
      ("emb_200k", embNx(100)))
    val evInputs = Seq(
      ("events_100k", eventsNx(1)), ("events_1m", eventsNx(10)),
      ("events_10m", eventsNx(100)))

    // the registered det defaults, parameterized exactly as the registry
    // registers them (bits from the corpus-sized integer autoBits;
    // queries = id % 50 == 0)
    def minhashDet(d: DataFrame) =
      Dedup.minhashDetPairs(d, "doc_id", "text", n = 3, numPerms = 16,
        rowsPerBand = 4)
    def simhashDet(d: DataFrame) =
      Dedup.simhashMd5Pairs(d, "doc_id", "text", maxHamming = 3)
    def knnDet(e: DataFrame) =
      Ann.knnGraphLshDet(e, "vec_id", "embedding", k = 5,
        bits = Ann.autoBitsExact(e.count()))
    def ivfDet(e: DataFrame) =
      Ann.ivfDetTopK(e, "vec_id", "embedding", "label",
        col("id") % 50 === 0, k = 5)
    def pqDet(e: DataFrame) =
      Ann.pqDetTopK(e, "vec_id", "embedding", col("id") % 50 === 0, k = 5)
    def ivfPqDet(e: DataFrame) =
      Ann.ivfPqDetTopK(e, "vec_id", "embedding", "label",
        col("id") % 50 === 0, k = 5)
    def ivfPqResDet(e: DataFrame) =
      Ann.ivfPqResidualDetTopK(e, "vec_id", "embedding", "label",
        col("id") % 50 === 0, k = 5)
    def cosLshDet(e: DataFrame) =
      Ann.cosinePairsLshDet(e, "vec_id", "embedding", threshold = 0.2,
        bits = Ann.autoBitsExact(e.count()))
    def purchases(ev: DataFrame) = ev
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    def clicks(ev: DataFrame) = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    def asofNative(ev: DataFrame) =
      AsOfNative.join(purchases(ev), clicks(ev), Seq("user_id"), "ts", "ts",
        Seq("click_id"))

    // subset filter for iterating on one family without the full
    // ~20-minute ladder (comma-separated op-name prefixes); applied to
    // warmups too — warming an op the timed loop skips is pure waste
    // in subset iteration runs
    val deepOnly = sys.env.get("SPARK_GRAFT_DEEP_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    def wanted(opName: String): Boolean =
      deepOnly.forall(_.exists(opName.startsWith))

    // warmup: smallest rung through every SELECTED op once (codegen/JIT)
    val wd = docInputs.head._2.limit(200)
    val we = embInputs.head._2.limit(200)
    val wv = evInputs.head._2.limit(500)
    Seq[(String, () => DataFrame)](
      ("dedup_minhash_det", () => minhashDet(wd)),
      ("dedup_simhash", () => simhashDet(wd)),
      ("ann_knn_graph(det)", () => knnDet(we)),
      ("ann_ivf_det_topk", () => ivfDet(we)),
      ("ann_pq_det_topk", () => pqDet(we)),
      ("ann_ivf_pq_det_topk", () => ivfPqDet(we)),
      ("ann_ivf_pq_residual_det_topk", () => ivfPqResDet(we)),
      ("dedup_embedding_cosine(lsh)", () => cosLshDet(we)),
      ("join_asof_native", () => asofNative(wv)),
      ("components_twostar(chain)",
        () => Dedup.componentsTwoStar(chainPairs(100L), "a", "b")),
      ("graph_pagerank(synth)",
        () => Graph.pagerankInt(graphEdges(500L), "src", "dst", iters = 5)),
      ("graph_components(synth)",
        () => Dedup.componentsTwoStar(graphEdges(500L), "src", "dst")),
      ("graph_triangles(synth)",
        () => Graph.triangles(graphEdges(500L), "src", "dst")))
      .foreach { case (n, df) =>
        if (wanted(n)) try df().count() catch { case _: Throwable => () } }

    val ops: Seq[(String, Seq[(String, DataFrame)], DataFrame => DataFrame)] =
      Seq(
        ("dedup_minhash_det", docInputs, minhashDet),
        ("dedup_simhash", docInputs, simhashDet),
        ("ann_knn_graph(det)", embInputs, knnDet),
        ("ann_ivf_det_topk", embInputs, ivfDet),
        ("ann_pq_det_topk", embInputs, pqDet),
        ("ann_ivf_pq_det_topk", embInputs, ivfPqDet),
        ("ann_ivf_pq_residual_det_topk", embInputs, ivfPqResDet),
        ("dedup_embedding_cosine(lsh)", embInputs, cosLshDet),
        ("join_asof_native", evInputs, asofNative),
        ("components_twostar(chain)", chainInputs,
          d => Dedup.componentsTwoStar(d, "a", "b")),
        ("graph_pagerank(synth)", graphInputs,
          e => Graph.pagerankInt(e, "src", "dst", iters = 5)),
        ("graph_components(synth)", graphInputs,
          e => Dedup.componentsTwoStar(e, "src", "dst")),
        ("graph_triangles(synth)", graphInputs,
          e => Graph.triangles(e, "src", "dst")))

    /** Materialize a synthetic corpus dir once per GENERATION FORMULA:
      * the `_DONE` marker stores `params` (every formula input — copy
      * count, id offsets, suffix scheme version), and a marker whose
      * content does not match triggers a rebuild. A bare existence
      * check silently reused corpora built under a superseded formula
      * (the r9 docsNx offset change 10M→100M would have kept serving
      * any pre-change dir). Pre-params empty markers mismatch ""≠params
      * and rebuild exactly once. */
    def materializedDir(dir: String, params: String)
                       (build: String => Unit): String = {
      val marker = java.nio.file.Paths.get(dir, "_DONE")
      val current =
        try java.nio.file.Files.exists(marker) &&
          new String(java.nio.file.Files.readAllBytes(marker),
            java.nio.charset.StandardCharsets.UTF_8) == params
        catch { case _: Throwable => false }
      if (!current) {
        build(dir)
        java.nio.file.Files.write(marker, params.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      }
      dir
    }

    /** Facts-family second decade: a ×n sfDir where the FACT tables
      * (orders, lineitem) get n orderkey-shifted copies — transaction
      * history grows — while every dimension table is copied verbatim
      * (dims do not grow 10× when facts do; that is the realistic
      * 100 TB shape AND what keeps the broadcast sides broadcastable).
      * The REGISTERED TPC-H queries then run unchanged over the dir,
      * so the ladder times the exact registered plans. Materialized
      * once under /tmp and reused across runs. */
    def factsDir(n: Int): String =
      materializedDir(s"/tmp/graft_deep_facts_${n}x",
        s"facts:n=$n:keyOff=1000000000:src=$sf01:v=1") { dir =>
        Seq("region", "nation", "customer", "supplier", "part")
          .foreach { t =>
            spark.read.parquet(s"$sf01/$t.parquet")
              .write.mode("overwrite").parquet(s"$dir/$t.parquet")
          }
        def copies(base: DataFrame, key: String): DataFrame =
          (0 until n).map { i =>
            if (i == 0) base
            else base.withColumn(key, col(key) + i * 1000000000L)
          }.reduce(_ unionByName _)
        copies(spark.read.parquet(s"$sf01/orders.parquet"), "o_orderkey")
          .write.mode("overwrite").parquet(s"$dir/orders.parquet")
        copies(spark.read.parquet(s"$sf01/lineitem.parquet"), "l_orderkey")
          .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      }

    val sentinelStart = sentinel()
    // (rung, config, rows, nlist, subcells, write3Sec, serveSec,
    //  serveRows, probedPairs, queries) per delta-served measurement —
    // emitted as the machine-readable deep-rung record (r14 verdict
    // #2: the 2M write/serve numbers must live in a committed JSON,
    // not NOTES prose)
    val deltaRecords = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long, Long, Int, Double, Double, Long,
        Long, Long)]
    val sb = new StringBuilder
    sb.append("| operator | input | rows in | secs | rows out |\n")
    sb.append("|---|---|---:|---:|---:|\n")
    for ((opName, inputs, op) <- ops if wanted(opName);
         (label, in) <- inputs) {
      spark.catalog.clearCache()
      System.gc()
      val nIn = in.count()
      val (secs, nOut) = timed(op(in).count())
      val row = f"| $opName | $label | $nIn | $secs%.2f | $nOut |"
      println(row)
      sb.append(row).append('\n')
    }

    /** Run REGISTERED queries unchanged over a pair of sfDir rungs:
      * warm each shape once at the smallest SF, then time each
      * (query, rung) with caches cleared. `rungs` is by-name so a
      * DEEP_ONLY run that skips the family never materializes its
      * synthetic dir. */
    def runRegisteredRungs(queries: Seq[String],
                           rungs: => Seq[(String, String)],
                           inputTable: String): Unit =
      if (queries.exists(wanted)) {
        // warm only the shapes the timed loop will run: the warmup's
        // cost is per-query codegen, wasted on DEEP_ONLY-excluded ones
        queries.filter(wanted).foreach { q =>
          try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
          catch { case _: Throwable => () }
        }
        val materialized = rungs
        for (q <- queries if wanted(q);
             (label, dir) <- materialized) {
          spark.catalog.clearCache()
          System.gc()
          val nIn = spark.read.parquet(s"$dir/$inputTable.parquet").count()
          val (secs, nOut) = timed(SparkEntry.queries(q)(spark, dir).count())
          val row = f"| $q | $label | $nIn | $secs%.2f | $nOut |"
          println(row)
          sb.append(row).append('\n')
        }
      }

    // the 5 heaviest registered TPC-H shapes over the facts ladder
    // (each derives its partsupp from lineitem, so the 6M rung
    // exercises the derived-relation aggregation, the multi-join, and
    // the decimal accumulations at 10× the fact volume)
    val tpchDeep = Seq("sql_tpch_q21", "sql_tpch_q9", "sql_tpch_q2",
      "sql_tpch_q11", "sql_tpch_q18")
    runRegisteredRungs(tpchDeep,
      Seq(("facts_600k", sf01), ("facts_6m", factsDir(10))), "lineitem")
    /** Media-family second rung: a ×n documents dir (suffix-disjoint
      * copies, id-offset so the generation arithmetic yields new dims /
      * tones / frame counts per copy) over which the REGISTERED media
      * content queries run unchanged — encode + real container decode
      * are both in the timed path, exactly as a corpus read would be. */
    def mediaDir(n: Int): String =
      materializedDir(s"/tmp/graft_deep_media_${n}x",
        s"docsNx:n=$n:idOff=100000000:suffix=_i:src=$sf01:v=2") { dir =>
        docsNx(n).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
    val mediaDeep = Seq("media_video_frames", "media_audio_features",
      "media_scene_cuts", "pipeline_media_prep", "media_color_stats")
    runRegisteredRungs(mediaDeep,
      Seq(("media_5k", sf01), ("media_50k", mediaDir(10))), "documents")

    // the registered banded-Hamming retrieval over a x10 document
    // corpus (the media dir IS a x10 documents dir): signature build is
    // one kernel pass per doc, candidates only from band collisions,
    // rerank k-bounded — the binary-code analogue of the det-LSH rung
    runRegisteredRungs(Seq("ann_hamming_lsh_topk"),
      Seq(("docs_5k", sf01), ("docs_50k", mediaDir(10))), "documents")

    /** THIRD decade for the document dedup family: 5,000,000 documents
      * (SPARK_GRAFT_DEEP_DECADE3=1 — off by default, the rung is
      * minutes). Built in two materialized levels so no plan ever
      * unions 1,000 relations: docsNx(100) (a 100-way union, same as
      * the 500k rung) is written to parquet once, then the 5M corpus is
      * a 10-way union over THAT parquet with a second-level disjoint
      * token suffix and id offset — growth stays corpus-like (new
      * vocabulary, new ids), reads stream from disk instead of holding
      * 5M documents in one in-memory plan. */
    if (sys.env.get("SPARK_GRAFT_DEEP_DECADE3").contains("1")) {
      val d500k = materializedDir("/tmp/graft_deep_docs_100x",
        s"docsNx:n=100:idOff=100000000:suffix=_i:src=$sf01:v=2") { dir =>
        docsNx(100).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      def docs5m: DataFrame = (0 until 10).map { i =>
        val base = spark.read.parquet(s"$d500k/documents.parquet")
        if (i == 0) base
        else base.select(
          (col("doc_id") + i * 100000000000L).as("doc_id"),
          array_join(
            transform(split(col("text"), "\\s+"),
              t => concat(t, lit(s"_d$i"))), " ").as("text"))
      }.reduce(_ unionByName _)
      for ((opName, op) <- Seq[(String, DataFrame => DataFrame)](
             ("dedup_minhash_det", minhashDet), ("dedup_simhash", simhashDet))
           if wanted(opName)) {
        spark.catalog.clearCache()
        System.gc()
        val in = docs5m
        val nIn = in.count()
        val (secs, nOut) = timed(op(in).count())
        val row = f"| $opName | docs_5m | $nIn | $secs%.2f | $nOut |"
        println(row)
        sb.append(row).append('\n')
      }

      // temporal family third decade: 100,000,000 events through the
      // native as-of join — same two-level construction (10M-event
      // parquet rung, then a 10-way disjoint-user union over it)
      lazy val e10m = materializedDir("/tmp/graft_deep_events_100x",
        s"eventsNx:n=100:idOff=1000000000:src=$sf01:v=1") { dir =>
        eventsNx(100).write.mode("overwrite").parquet(s"$dir/events.parquet")
      }
      def events100m: DataFrame = (0 until 10).map { i =>
        val base = spark.read.parquet(s"$e10m/events.parquet")
        if (i == 0) base
        else base.select(
          (col("event_id") + i * 1000000000000L).as("event_id"),
          (col("user_id") + i * 1000000000000L).as("user_id"),
          col("ts"), col("event_type"))
      }.reduce(_ unionByName _)
      if (wanted("join_asof_native")) {
        spark.catalog.clearCache()
        System.gc()
        val evIn = events100m
        val nEvIn = evIn.count()
        val (evSecs, nEvOut) = timed(asofNative(evIn).count())
        val evRow = f"| join_asof_native | events_100m | $nEvIn | $evSecs%.2f | $nEvOut |"
        println(evRow)
        sb.append(evRow).append('\n')
      }

      // embeddings family third decade: 2,000,000 vectors through the
      // det-IVF index (output-bounded: queries x k rows; the
      // pair-emitting ops are excluded by design — their OUTPUT would
      // be the decade's cost, not the plan's). Query set stays the
      // ladder convention (id % 50 == 0, so 40k queries — per-query
      // cost is the honest read, as in the 200k-rung analysis).
      if (wanted("ann_ivf_det_topk") ||
          wanted("ann_ivf_pq_residual_det_topk") ||
          wanted("ann_ivf_delta_served")) {
        val m200k = materializedDir("/tmp/graft_deep_emb_100x",
          s"embNx:n=100:idOff=10000000:perturb=31-7-0.03:src=$sf01:v=1") {
          dir =>
            embNx(100).write.mode("overwrite")
              .parquet(s"$dir/embeddings.parquet")
        }
        def emb2m: DataFrame = (0 until 10).map { i =>
          val base = spark.read.parquet(s"$m200k/embeddings.parquet")
          if (i == 0) base
          else base.select(
            (col("vec_id") + i * 1000000000000L).as("vec_id"),
            transform(col("embedding"),
              (x, j) => x + ((lit(i) * 17 + j) % 5).cast("float") * lit(0.02f)
                - lit(0.04f)).as("embedding"),
            col("label"))
        }.reduce(_ unionByName _)
        if (wanted("ann_ivf_det_topk")) {
          spark.catalog.clearCache()
          System.gc()
          val emIn = emb2m
          val nEmIn = emIn.count()
          // production axis: the query COUNT stays fixed while the corpus
          // grows a decade (id % 500 at 2M ≈ the 4k queries id % 50 gave
          // at 200k), per the 200k-rung per-query analysis — scaling the
          // query set WITH the corpus would measure two axes at once
          val (emSecs, nEmOut) = timed(
            Ann.ivfDetTopK(emIn, "vec_id", "embedding", "label",
              col("id") % 500 === 0, k = 5).count())
          val emRow = f"| ann_ivf_det_topk | emb_2m(4k queries) | $nEmIn | $emSecs%.2f | $nEmOut |"
          println(emRow)
          sb.append(emRow).append('\n')
        }
        // residual IVF-PQ decade parity (r10 verdict #6): the residual
        // ladder previously stopped at 200k while plain det-IVF reached
        // 2M. Same constant-query axis: a 200k rung at id % 50 (4k
        // queries) anchors the decade, then 2M at id % 500 (4k queries)
        // — exponent reads corpus growth alone.
        if (wanted("ann_ivf_pq_residual_det_topk")) {
          def resRung(label: String, e: DataFrame, mod: Int): Unit = {
            spark.catalog.clearCache()
            System.gc()
            val nIn = e.count()
            val (secs, nOut) = timed(
              Ann.ivfPqResidualDetTopK(e, "vec_id", "embedding", "label",
                col("id") % mod === 0, k = 5).count())
            val row = f"| ann_ivf_pq_residual_det_topk | $label | $nIn | $secs%.2f | $nOut |"
            println(row)
            sb.append(row).append('\n')
          }
          resRung("emb_200k(4k queries)",
            spark.read.parquet(s"$m200k/embeddings.parquet"), 50)
          resRung("emb_2m(4k queries)", emb2m, 500)
        }
        // DELTA-SERVED decade (r12 directive 6; r14 verdict #1-#3):
        // the O(batch) maintenance contract measured at depth — (a)
        // per-trigger delta write over a 200k-row vs 2M-row routing
        // table (expected ~flat: the write is O(batch), independent
        // of the index), (b) chain serve (snapshot ∪ 3 trailing
        // deltas) on the constant ~4k-query axis. Each rung runs
        // under BOTH quantizer configs: "fixed" (label-only cells —
        // the r14 configuration whose serve measured SUPERLINEAR,
        // exponent 1.26, because cells fatten ∝ n) and "sqrt_policy"
        // (Ann.autoSubcellsExact — nlist ~ √n, so per-query probed
        // rows grow ~√n). Probed-pair volume is measured directly
        // (ivfIndexCandidates.count) — the policy's controlled
        // quantity. Index build + base snapshot are setup, not timed
        // — the lifecycle exists to amortize them.
        if (wanted("ann_ivf_delta_served")) {
          for (policy <- Seq(false, true)) {
            val config = if (policy) "sqrt_policy" else "fixed"
            def deltaRung(label: String, eIn: DataFrame,
                          mod: Int): Unit = {
              spark.catalog.clearCache()
              System.gc()
              // a real corpus at this size is many files/partitions;
              // the synthetic rung is a union over ONE part file, so
              // without this the broadcast candidate join's ~1000x
              // fan-out lands on a single task (first cut ran the 2M
              // serve on one core for 40+ min — exactly the layout
              // defect the ladder exists to surface)
              val e = eIn.repartition(64).localCheckpoint(true)
              val nIn = e.count()
              val sub =
                if (policy) Ann.autoSubcellsExact(nIn,
                  e.select("label").distinct().count())
                else 1
              val built = Ann.buildDetIvfIndex(e, "vec_id", "embedding",
                "label", subcells = sub)
              val nlist = built.centroids.select("cell").distinct()
                .count()
              val store = graft.sources.VersionedStore(java.nio.file
                .Files.createTempDirectory(s"deep_dlt_$label").toString)
              graft.sources.AnnIndexStore.persistVersion(store, "m", 0L,
                built)
              val batch = built.home.limit(1000)
                .select(col("id").as("vec_id"), col("cell"))
                .localCheckpoint(true)
              val (wSecs, _) = timed {
                (0 until 3).foreach { b =>
                  graft.sources.AnnIndexStore.foldBatchDelta(store, "m",
                    built.centroids, baseVersion = 0L)(batch, b.toLong)
                }
                3L
              }
              val wRow = f"| ann_ivf_delta_write3(1k-row triggers," +
                f"$config) | $label | $nIn | $wSecs%.2f | 3 |"
              println(wRow); sb.append(wRow).append('\n')
              val chain = graft.sources.AnnIndexStore
                .loadChain(spark, store, "m")
              val (sSecs, nOut) = timed(
                Ann.ivfIndexTopK(chain, e, "vec_id", "embedding",
                  col("id") % mod === 0, k = 5).count())
              val sRow = f"| ann_ivf_delta_served(4k queries,$config) " +
                f"| $label | $nIn | $sSecs%.2f | $nOut |"
              println(sRow); sb.append(sRow).append('\n')
              // probed-pair volume (the quantity the policy controls;
              // measured outside the serve timing): fixed ~ q·n/nlist
              // with nlist constant → ∝ n; policy → ~ q·√n
              val probed = Ann.ivfIndexCandidates(chain, e, "vec_id",
                "embedding", col("id") % mod === 0, nprobe = 2).count()
              deltaRecords.append((label, config, nIn, nlist, sub,
                wSecs, sSecs, nOut, probed, nIn / mod))
              // free this rung's checkpoint blocks before the next
              // config×rung pair builds its own copy of the corpus —
              // stacked retained checkpoints were part of the 8g-heap
              // OOM at the 2M serve
              e.unpersist(blocking = true)
            }
            deltaRung("emb_200k",
              spark.read.parquet(s"$m200k/embeddings.parquet"), 50)
            deltaRung("emb_2m", emb2m, 500)
          }
        }
        // the INLINE policy twin at the same two rungs: the full
        // train+add+serve chain under the √n quantizer, next to the
        // plain ann_ivf_det_topk rows above — the inline evidence that
        // the policy, not the lifecycle plumbing, is what changes the
        // slope
        if (wanted("ann_ivf_nlist_det_topk")) {
          def nlistRung(label: String, eIn: DataFrame, mod: Int): Unit = {
            spark.catalog.clearCache()
            System.gc()
            val e = eIn.repartition(64).localCheckpoint(true)
            val nIn = e.count()
            val sub = Ann.autoSubcellsExact(nIn,
              e.select("label").distinct().count())
            val (secs, nOut) = timed(
              Ann.ivfDetTopK(e, "vec_id", "embedding", "label",
                col("id") % mod === 0, k = 5, subcells = sub).count())
            val row = f"| ann_ivf_nlist_det_topk | $label($sub sub) " +
              f"| $nIn | $secs%.2f | $nOut |"
            println(row); sb.append(row).append('\n')
            e.unpersist(blocking = true)
          }
          nlistRung("emb_200k(4k queries)",
            spark.read.parquet(s"$m200k/embeddings.parquet"), 50)
          nlistRung("emb_2m(4k queries)", emb2m, 500)
        }
      }

      // facts family third decade: 60,000,000 lineitem rows through the
      // five heaviest REGISTERED TPC-H shapes — facts get 100
      // orderkey-shifted copies while every dimension stays verbatim
      // (broadcastable at EVERY decade, the realistic 100 TB shape), so
      // the ladder times the registered plans' joins/aggregations at
      // three decades: 600k → 6M → 60M
      runRegisteredRungs(tpchDeep,
        Seq(("facts_60m", factsDir(100))), "lineitem")
    }

    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/scale_deep.md"),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // machine-readable deep-rung record: per-phase seconds, probed
    // pairs, and fitted per-config exponents over the rung pairs —
    // committed as scaletrend_deep_r{N}.json so a fix's before/after
    // diffs two JSONs, not prose
    val sentinelEnd = sentinel()
    if (sentinelSink == 42L) System.err.println("[deep] sentinel sink")
    if (deltaRecords.nonEmpty) {
      val recJson = deltaRecords.map { case (rung, config, n, nlist,
          sub, w, s, sr, pp, q) =>
        s"""{"rung":"$rung","config":"$config","rows":$n,""" +
          s""""nlist":$nlist,"subcells":$sub,"write3_sec":${num(w)},""" +
          s""""serve_sec":${num(s)},"serve_rows":$sr,""" +
          s""""probed_pairs":$pp,"queries":$q}"""
      }.mkString("[", ",", "]")
      val exps = deltaRecords.groupBy(_._2).collect {
        case (config, rs) if rs.length >= 2 =>
          val lo = rs.minBy(_._3); val hi = rs.maxBy(_._3)
          val dn = math.log(hi._3.toDouble / lo._3)
          val se = math.log(hi._7 / lo._7) / dn
          val pe = math.log(hi._9.toDouble / lo._9) / dn
          s""""$config":{"serve_exponent":${num(se)},""" +
            s""""probed_pairs_exponent":${num(pe)}}"""
      }.mkString("{", ",", "}")
      val line = s"""{"metric":"scaletrend_deep","delta_serve":""" +
        recJson + s""","exponents":$exps,"sentinel_sec":""" +
        s"""[${num(sentinelStart)},${num(sentinelEnd)}]}"""
      println(line)
      java.nio.file.Files.write(
        java.nio.file.Paths.get("/tmp/scale_deep.json"),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
