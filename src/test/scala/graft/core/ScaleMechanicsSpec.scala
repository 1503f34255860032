package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The shuffle-avoidance mechanics the 100 TB design leans on, asserted
  * against actual physical plans rather than taken on faith:
  *
  *  - bucketed tables joined on the bucket key need NO shuffle exchange
  *    (co-located join — at scale this is the difference between a
  *    terabyte-scale exchange and none);
  *  - partition pruning: a filter on the partition column reaches the
  *    scan, reading only matching directories;
  *  - filter pushdown: predicates reach the parquet reader.
  */
class ScaleMechanicsSpec extends SparkSpec {

  test("bucketed join on the bucket key plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("wh").toString
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    orders.write.format("parquet").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").option("path", s"$wh/orders_b")
      .saveAsTable("orders_b")
    lineitem.write.format("parquet").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").option("path", s"$wh/lineitem_b")
      .saveAsTable("lineitem_b")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce ShuffleExchange on either side
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey") &&
        !joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join still shuffles:\n$plan")
      // and it still computes the right thing
      val expected = orders.join(lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      got.keySet shouldBe expected.keySet
      got.foreach { case (k, v) => v shouldBe expected(k) +- 1e-6 }
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partition pruning: filter on partition column limits the scan") {
    val out = Files.createTempDirectory("part").toString
    Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").parquet(s"$out/events_p")
    val df = spark.read.parquet(s"$out/events_p")
    val days = df.select("day").distinct().count()
    val one = df.filter(col("day") === df.select(min("day")).head().getDate(0))
    val scan = one.queryExecution.executedPlan.toString
    assert(days > 1)
    assert(scan.contains("PartitionFilters"), scan)
    // pruned scan reads fewer files than the full table
    val prunedFiles = one.select(input_file_name()).distinct().count()
    val allFiles = df.select(input_file_name()).distinct().count()
    assert(prunedFiles < allFiles,
      s"pruning read $prunedFiles of $allFiles files")
  }

  test("join_partition_pruned plans DYNAMIC partition pruning") {
    // the registered query's exact shape: the pruning day set is a
    // runtime relation, so the fact scan must carry a dynamicpruning
    // PartitionFilter (not a literal one) — the subquery reuses the
    // join's broadcast exchange
    val df = graft.queries.EventQueries.defs("join_partition_pruned")(
      spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(4000))
    // and it must still produce the flat-table answer
    val flat = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
      .withColumn("cents", round(col("value") * 100).cast("long"))
    val hot = flat.filter(col("event_type") === "purchase")
      .groupBy("day").agg(sum("cents").as("rev"))
      .orderBy(col("rev").desc, col("day")).limit(5).select("day")
    val want = flat.join(hot, "day").groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("rev_cc"))
      .orderBy("event_type").collect().toSeq
    df.collect().toSeq shouldBe want
  }

  test("predicate pushdown reaches the parquet scan") {
    val q = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"),
      plan)
    // column pruning: the scan schema carries only the two needed columns
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>")
      || plan.contains("ReadSchema: struct<l_orderkey:int,l_quantity:double>"),
      plan)
  }

  test("asof query pushes its event_type filter into both parquet scans") {
    val df = graft.queries.TemporalQueries.defs("join_asof")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // both union legs scan events with their type filter pushed down, so
    // a 100 TB events table reads only the two relevant row groups
    assert(plan.contains("EqualTo(event_type,purchase)"), plan)
    assert(plan.contains("EqualTo(event_type,click)"), plan)
  }

  test("embedding cosine pairs plan has no cartesian / nested-loop join") {
    val q = graft.operators.Dedup.embeddingCosinePairs(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding", threshold = 0.2)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join is not block-structured:\n$plan")
  }

  test("jaccard verify stage shuffles no shingle arrays") {
    // every exchange in the plan must carry scalar columns only: the
    // array<string> shingle sets stay pinned to their scan-side stages
    // (AQE off so the exchange tree is walkable pre-execution)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = graft.operators.Dedup.ngramJaccardPairs(
        Tables.documents(spark, sfDir), "doc_id", "text", n = 3, threshold = 0.8)
      val exchanges = q.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty)
      exchanges.foreach { e =>
        val arrays = e.output.filter(
          _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
        assert(arrays.isEmpty, s"array columns cross a shuffle: $arrays")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("quantizeInt8 plans zero shuffles (pure per-row map)") {
    val q = graft.operators.Ann.quantizeInt8(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding")
    val exchanges = q.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // spread() may repartition the single input file; beyond that the
    // quantization itself must add no exchange keyed on data columns
    assert(exchanges.forall(
      _.outputPartitioning.toString.contains("RoundRobin")),
      s"quantization introduced a keyed shuffle:\n${q.queryExecution}")
  }

  test("weightedMix broadcasts the per-stratum rates onto the corpus") {
    val q = graft.operators.Sampling.weightedMix(
      Tables.documents(spark, sfDir), "doc_id", "lang",
      Map("en" -> 5000, "es" -> 5000), budgetNum = 1, budgetDen = 2)
    val plan = q.queryExecution.executedPlan.toString
    // the corpus-side join against the tiny rate table must be broadcast:
    // no shuffle of the documents on lang
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"rates joined by shuffle instead of broadcast:\n$plan")
  }

  test("passage dedup shuffles digests, never passage text") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = graft.operators.Dedup.passageRetention(
        Tables.documents(spark, sfDir), "doc_id", "text", 32)
      val exchanges = q.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty)
      exchanges.foreach { e =>
        assert(!e.output.exists(_.name == "chunk_text"),
          s"passage text crosses a shuffle: ${e.output}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("topk-per-group aggregator plans partial aggregation, no window") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = graft.queries.EventQueries
        .defs("events_topk_per_user")(spark, sfDir)
      val plan = q.queryExecution.executedPlan
      // the whole point: NO WindowExec (a window would sort every event
      // per user); the TopK buffer must ride the normal two-phase
      // aggregate (partial ObjectHashAggregate/SortAggregate before the
      // exchange, final after)
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"window sneaked in:\n$plan")
      val keyed = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.toString.contains("hashpartitioning") => e
      }
      assert(keyed.size == 1, s"expected 1 keyed shuffle, got:\n$plan")
      // partial side: the exchange carries (group key, serialized TopK
      // buffer) — k-bounded rows — never the raw (score, event_id) events
      val names = keyed.head.output.map(_.name)
      assert(names.length == 2 && !names.contains("event_id") &&
        !names.contains("score"),
        s"raw events cross the aggregate exchange: $names")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("pii scrub is map-only: no keyed shuffle, regex reaches codegen") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = graft.queries.TextQueries.defs("text_pii_scrub")(spark, sfDir)
      val keyed = q.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.toString.contains("hashpartitioning") => e
      }
      assert(keyed.isEmpty, s"scrub should not shuffle by key:\n" +
        q.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("incremental dedup shuffles digests and counts, never text") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = graft.queries.DedupQueries
        .defs("dedup_incremental")(spark, sfDir)
      val exchanges = q.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty)
      exchanges.foreach { e =>
        assert(!e.output.exists(_.name == "text"),
          s"document bodies cross a shuffle: ${e.output}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("weighted top-k plans as TakeOrdered, not a global sort") {
    val q = graft.operators.Sampling.weightedTopK(
      Tables.documents(spark, sfDir), "doc_id", "n_chars", k = 50)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n$plan")
  }

  test("bucketed fact copies: two concurrent sessions build without " +
      "contention (nonced table names)") {
    // the round-11 flake: two bench JVMs sharing one spark-warehouse
    // raced the DROP + directory-delete + CTAS sequence. Nonced names
    // make each writer's sequence private; two fresh sessions building
    // CONCURRENTLY into the shared warehouse exercise exactly that
    // (same pid, distinct session nonce — the cross-JVM case differs
    // only by which nonce component varies).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val s2 = spark.newSession()
    val s3 = spark.newSession()
    val f2 = Future(Bucketed.lineitemOrders(s2, sfDir))
    val f3 = Future(Bucketed.lineitemOrders(s3, sfDir))
    val (l2, o2) = Await.result(f2, 180.seconds)
    val (l3, o3) = Await.result(f3, 180.seconds)
    l2.count() shouldBe l3.count()
    o2.count() shouldBe o3.count()
    l2.count() shouldBe Tables.lineitem(spark, sfDir).count()
  }

  test("registered bucketed revenue query joins facts without exchange") {
    // the REGISTERED query surface, not a throwaway table: the 5-way
    // revenue join through core.Bucketed's co-bucketed fact copies must
    // plan the lineitem-orders sort-merge join with no shuffle and no
    // sort on either fact side, and still match the flat-table twin
    val q = graft.queries.RelationalQueries
      .defs("join_multiway_revenue_bucketed")(spark, sfDir)
    q.count() // finalize the adaptive plan
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed fact join still shuffles:\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"scan is not bucket-aware:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)
    val flat = graft.queries.RelationalQueries
      .defs("join_multiway_revenue")(spark, sfDir)
    q.collect().map(_.toString).toSeq shouldBe
      flat.collect().map(_.toString).toSeq
  }

  test("knnGraphLsh dedups candidates on bare ids; vectors cross at most " +
      "the two join-back shuffles") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = graft.operators.Ann.knnGraphLsh(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding", k = 5)
      val plan = q.queryExecution.executedPlan
      assert(!plan.toString.contains("CartesianProduct") &&
        !plan.toString.contains("BroadcastNestedLoopJoin"), plan.toString)
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // the candidate self-join + pair distinct must run on scalar
      // columns only; vectors may be shuffled only to join back onto the
      // DEDUPED pair list (once per side)
      val withArrays = exchanges.filter(_.output.exists(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
      assert(withArrays.size <= 2,
        s"vectors cross ${withArrays.size} shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("shared-run detection shuffles positions, never document text") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = graft.operators.Dedup.sharedRunPairs(
        Tables.documents(spark, sfDir), "doc_id", "text", n = 8)
      // spread() may round-robin the single local input file (a no-op at
      // real scale); every KEYED shuffle must carry positions/ids only
      val keyed = q.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.toString.contains("hashpartitioning") => e
      }
      assert(keyed.nonEmpty)
      keyed.foreach { e =>
        assert(!e.output.exists(_.name == "text"),
          s"document bodies cross a keyed shuffle: ${e.output}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // at 100 TB a selective dimension filter should reach the fact scan
    // as a runtime bloom filter even when the dim is too big to
    // broadcast — Catalyst injects might_contain over a bloom_filter_agg
    // of the dim keys. Local thresholds are tuned so the tiny test
    // tables qualify; the mechanism is identical at scale.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, sfDir)
      val dim = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val q = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") ||
        plan.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter injected:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("CDC chunk dedup shuffles tokens and digests, never assembled text") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = graft.operators.Dedup.cdcRetention(
        Tables.documents(spark, sfDir), "doc_id", "text", divisor = 8)
      // spread() may round-robin the single local input file (a no-op at
      // real scale); every KEYED shuffle must carry tokens/digests only
      val exchanges = q.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.toString.contains("hashpartitioning")
              || e.outputPartitioning.toString.contains("rangepartitioning")
          => e
      }
      assert(exchanges.nonEmpty)
      exchanges.foreach { e =>
        assert(!e.output.exists(a =>
            a.name == "text" || a.name == "chunk_text"),
          s"document/chunk bodies cross a shuffle: ${e.output}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("SQL surface: registered views answer the flagship query") {
    Views.register(spark, sfDir)
    val rows = spark.sql(
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
      .collect()
    rows.length should be > 0
  }

  test("postings build: no collect_list; posting samples stay k-bounded " +
      "through the term shuffle") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = graft.queries.TextQueries.defs("text_postings")(spark, sfDir)
      val plan = q.queryExecution.executedPlan
      // an unbounded collect would make a stop-word's full posting list
      // one aggregation buffer; the min-k TopK buffer is the point
      assert(!plan.toString.contains("collect_list"),
        s"unbounded collect in the postings plan:\n$plan")
      // the PAIR exchange (term, doc_id) is the index build itself and
      // is bounded by distinct pairs; the claim is about the TERM-only
      // exchange: it must carry partial buffers (term, counts, TopK
      // buf), never a doc_id fanned out per posting
      val termOnly = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.toString.contains("hashpartitioning") &&
              e.outputPartitioning.toString.contains("term") &&
              !e.outputPartitioning.toString.contains("doc_id") => e
      }
      assert(termOnly.nonEmpty, s"expected a term-only exchange:\n$plan")
      termOnly.foreach { e =>
        assert(!e.output.exists(_.name == "doc_id"),
          s"raw postings cross the term shuffle: ${e.output}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("byte-CDC: chunk bodies never exist; only doc ids, fps and " +
      "counts cross shuffles") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = graft.queries.DedupQueries.defs("dedup_cdc_bytes")(spark, sfDir)
      // spread()'s round-robin repartition of the raw docs is the local
      // parallelism shim (no-op at real scale) and legitimately carries
      // text; every KEYED exchange must carry only ids, fps and counts
      val keyed = q.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.toString.contains("hashpartitioning") => e
      }
      assert(keyed.nonEmpty)
      keyed.foreach { e =>
        assert(!e.output.exists(a => a.name == "text" || a.name == "codes"),
          s"document bodies / code arrays cross a keyed shuffle: ${e.output}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
