package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Joins.asOf / Joins.rangeJoin: results must equal the naive
  * theta-join formulations, and the plans must NOT be the naive
  * theta-join plans (no nested-loop / cartesian over the full space). */
class JoinsSpec extends SparkSpec {

  private lazy val ev = Tables.events(spark, sfDir)
  private lazy val purchases = ev.filter(col("event_type") === "purchase")
    .select("event_id", "user_id", "ts")
  private lazy val clicks = ev.filter(col("event_type") === "click")
    .select(col("user_id"), col("ts"), col("event_id").as("click_id"))

  /** Naive backward as-of: expand all prior clicks, keep the latest. */
  private def naiveAsOf() = {
    val matches = purchases.as("p")
      .join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") && col("p.ts") >= col("c.ts"),
        "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy("p.event_id")
          .orderBy(col("c.ts").desc_nulls_last, col("c.click_id").desc)))
      .filter(col("rn") === 1)
    matches.select(col("p.event_id"), col("c.click_id"))
  }

  test("asOf equals the naive latest-prior-match join") {
    val got = Joins.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id"))
      .select("event_id", "click_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val want = naiveAsOf().collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    got.size shouldBe purchases.count()
    got shouldBe want
  }

  test("asOf tolerance nulls out stale matches but keeps every left row") {
    val tol = 3600L
    val df = Joins.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
      Seq("click_id"), toleranceSec = Some(tol))
    df.count() shouldBe purchases.count()
    // every surviving match is within tolerance...
    df.filter(col("click_id").isNotNull)
      .filter(unix_timestamp(col("ts")) -
        unix_timestamp(col("matched_ts")) > tol)
      .count() shouldBe 0L
    // ...and tolerance only ever *removes* matches relative to unbounded
    val unbounded = Joins.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id"))
      .filter(col("click_id").isNotNull).count()
    df.filter(col("click_id").isNotNull).count() should be <= unbounded
  }

  test("asOf forward picks the earliest following row; tolerance bounds it") {
    import spark.implicits._
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05")))
      .toDF("id", "ts")
    val right = Seq(3, 7, 9).map(s =>
        (1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$s"), s.toLong))
      .toDF("id", "ts", "payload")
    val fwd = Joins.asOf(left, right, Seq("id"), "ts", "ts", Seq("payload"),
      forward = true)
    fwd.head().getAs[Long]("payload") shouldBe 7L // earliest at-or-after 5
    val tol = Joins.asOf(left, right, Seq("id"), "ts", "ts", Seq("payload"),
      toleranceSec = Some(1L), forward = true)
    tol.count() shouldBe 1L // left row kept...
    assert(tol.head().isNullAt(tol.head().fieldIndex("payload")),
      "gap 2s > tolerance 1s must null the match")
    val sim = Joins.asOf(left, right.withColumn("ts",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:05"))),
      Seq("id"), "ts", "ts", Seq("payload"), forward = true)
    sim.head().getAs[Long]("payload") shouldBe 9L // >= includes equal ts;
    // equal-ts ties resolve to the largest payload struct, as documented
  }

  test("asOf tieBreak picks the largest tie-break among equal-ts rows") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("id", "sec")
      .select(col("id"), timestamp_seconds(col("sec")).as("ts"))
    // three right rows at the SAME (key, ts); priority decides the winner
    val right = Seq((10L, 3L), (20L, 9L), (30L, 5L)).map { case (p, pr) =>
        (1L, 100L, p, pr)
      }.toDF("id", "sec", "payload", "priority")
      .select(col("id"), timestamp_seconds(col("sec")).as("ts"),
        col("payload"), col("priority"))
    val got = Joins.asOf(left, right, Seq("id"), "ts", "ts",
      Seq("payload", "priority"), tieBreak = Seq("priority"))
    got.head().getAs[Long]("payload") shouldBe 20L // priority 9 wins
    // tieBreak not in rightCols is rejected up front
    an[IllegalArgumentException] should be thrownBy
      Joins.asOf(left, right, Seq("id"), "ts", "ts", Seq("payload"),
        tieBreak = Seq("priority"))
  }

  test("asOf ties beyond an explicit tieBreak resolve by payload order") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("id", "sec")
      .select(col("id"), timestamp_seconds(col("sec")).as("ts"))
    // all three right rows tie on (key, ts, priority): the full-struct
    // backstop must deterministically pick the largest payload, however
    // the rows are partitioned
    val rows = Seq((10L, 5L), (30L, 5L), (20L, 5L)).map { case (p, pr) =>
      (1L, 100L, p, pr)
    }
    for (parts <- Seq(1, 3)) {
      val right = spark.createDataFrame(rows).repartition(parts)
        .toDF("id", "sec", "payload", "priority")
        .select(col("id"), timestamp_seconds(col("sec")).as("ts"),
          col("payload"), col("priority"))
      val got = Joins.asOf(left, right, Seq("id"), "ts", "ts",
        Seq("payload", "priority"), tieBreak = Seq("priority"))
      got.head().getAs[Long]("payload") shouldBe 30L
    }
  }

  test("asOf rejects a map-typed payload unless a tieBreak is given") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("id", "sec")
      .select(col("id"), timestamp_seconds(col("sec")).as("ts"))
    val right = Seq((1L, 90L, 7L)).toDF("id", "sec", "payload")
      .select(col("id"), timestamp_seconds(col("sec")).as("ts"),
        map(lit("k"), col("payload")).as("m"), col("payload"))
    // maps have no total order: default full-struct tie-break must refuse
    an[IllegalArgumentException] should be thrownBy
      Joins.asOf(left, right, Seq("id"), "ts", "ts", Seq("m", "payload"))
    // with an explicit orderable tieBreak the same payload works
    val got = Joins.asOf(left, right, Seq("id"), "ts", "ts",
      Seq("m", "payload"), tieBreak = Seq("payload"))
    got.head().getAs[Long]("payload") shouldBe 7L
  }

  test("asOf with an empty right side keeps all left rows unmatched") {
    val none = clicks.filter(lit(false))
    val df = Joins.asOf(purchases, none, Seq("user_id"), "ts", "ts",
      Seq("click_id"))
    df.count() shouldBe purchases.count()
    df.filter(col("click_id").isNotNull).count() shouldBe 0L
  }

  test("asOf matches an exactly-simultaneous right row (>=, not >)") {
    import spark.implicits._
    val l = Seq((1L, 100L), (2L, 50L)).toDF("id", "sec")
      .select(col("id"), lit("k").as("key"),
        timestamp_seconds(col("sec")).as("ts"))
    val r = Seq((10L, 100L), (20L, 60L)).toDF("rid", "sec")
      .select(col("rid"), lit("k").as("key"),
        timestamp_seconds(col("sec")).as("rts"))
    val got = Joins.asOf(l, r, Seq("key"), "ts", "rts", Seq("rid"))
      .select("id", "rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    got shouldBe Map(1L -> 10L, 2L -> -1L)
  }

  test("asOf ignores right rows with null timestamps or null keys") {
    import spark.implicits._
    val l = Seq((1L, "k", 100L)).toDF("id", "key", "sec")
      .select(col("id"), col("key"), timestamp_seconds(col("sec")).as("ts"))
    // a null-ts and a null-key right row: SQL comparison semantics say
    // neither can ever be a prior match
    val r = Seq((10L, Some("k"), None: Option[Long]),
        (20L, None, Some(50L)))
      .toDF("rid", "key", "sec")
      .select(col("rid"), col("key"), timestamp_seconds(col("sec")).as("rts"))
    val got = Joins.asOf(l, r, Seq("key"), "ts", "rts", Seq("rid"))
    got.count() shouldBe 1L
    got.filter(col("rid").isNotNull).count() shouldBe 0L
  }

  test("asOf plans one shuffle and no nested-loop join") {
    val plan = Joins.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
      Seq("click_id")).queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    // the only exchange is the window's partition-by-key shuffle
    "Exchange".r.findAllIn(plan).size shouldBe 1
  }

  private lazy val orders = Tables.orders(spark, sfDir)
  private lazy val windows = orders.select(col("o_custkey").as("k"),
    col("o_orderkey").as("base_order"), col("o_orderdate").as("w_start"),
    (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("w_end"))
  private lazy val pts = orders.select(col("o_custkey").as("k"),
    col("o_orderkey").as("next_order"), col("o_orderdate").as("next_date"))

  test("rangeJoin equals the naive BETWEEN join") {
    val got = Joins.rangeJoin(pts, "next_date", windows,
        "w_start", "w_end", keys = Seq("k"), bucketSec = 7 * 86400L)
      .select("base_order", "next_order")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = windows.join(pts, Seq("k"))
      .filter(col("next_date") >= col("w_start") &&
        col("next_date") <= col("w_end"))
      .select("base_order", "next_order")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe want
    got.size should be > 0
  }

  test("keyless rangeJoin still plans an equi-join on buckets") {
    // without extra keys the naive form is a pure inequality join —
    // Spark would pick BroadcastNestedLoopJoin; bucketing must not
    val df = Joins.rangeJoin(
      pts.drop("k"), "next_date",
      windows.drop("k"), "w_start", "w_end",
      keys = Nil, bucketSec = 7 * 86400L)
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    // and it computes containment correctly
    val want = windows.drop("k").crossJoin(pts.drop("k"))
      .filter(col("next_date") >= col("w_start") &&
        col("next_date") <= col("w_end")).count()
    df.count() shouldBe want
  }

  test("saltedJoin is row-identical to the plain join") {
    val facts = ev.select(col("user_id"), col("event_id"))
    val dim = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val salted = Joins.saltedJoin(facts, dim, Seq("user_id"), salts = 8)
      .collect().map(r => (r.getLong(1), r.getString(2))).sorted
    val plain = facts.join(dim, "user_id")
      .collect().map(r => (r.getLong(1), r.getString(2))).sorted
    salted shouldBe plain
    salted.length should be > 0
  }

  test("saltedJoin plans an equi-join that includes the salt key") {
    val facts = ev.select(col("user_id"), col("event_id"))
    val dim = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plan = Joins.saltedJoin(facts, dim, Seq("user_id"), salts = 8)
      .queryExecution.executedPlan.toString
    plan should include("__salt")
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("rangeJoin rejects colliding non-key columns") {
    an[IllegalArgumentException] should be thrownBy
      Joins.rangeJoin(pts, "next_date",
        pts.withColumnRenamed("next_order", "w_end"), "next_date", "w_end")
  }

  test("AQE splits a skewed shuffle join at runtime (skew=true in the " +
      "executed plan)") {
    // saltedJoin is the EXPLICIT skew mitigation; this pins the RUNTIME
    // one — AQE re-planning a hot key's oversized shuffle partition
    // into parallel splits — so both layers of the 100 TB skew story
    // are exercised, not just configured. Thresholds are lowered to
    // make a 200k-row local skew observable; the assertion is on the
    // executed plan, after adaptive re-optimization.
    val s = spark
    import s.implicits._
    val conf = s.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k =>
      k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 95% of left rows share key 0; every key has one dim match
      val left = s.range(200000).select(
        when($"id" < 190000L, 0L).otherwise($"id" % 50).as("k"),
        $"id".as("payload"))
      val right = s.range(50).select($"id".as("k"), ($"id" * 7).as("dim"))
      val joined = left.join(right, "k")
      // collect(), not count(): count() builds a separate aggregate
      // QueryExecution, leaving THIS one un-executed (isFinalPlan=false,
      // no adaptive re-plan to inspect)
      joined.collect().length shouldBe 200000
      // assert on the plan TREE (SortMergeJoinExec.isSkewJoin), not the
      // "skew=true" string rendering, which is Spark-version-specific
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // query stages (ResultQueryStage, ShuffleQueryStage) are leaf
      // wrappers — recurse through their materialized plans explicitly
      def findSmj(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.joins.SortMergeJoinExec] =
        p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            findSmj(q.plan)
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
            j +: j.children.flatMap(findSmj)
          case other => other.children.flatMap(findSmj)
        }
      val smjs = findSmj(finalPlan)
      assert(smjs.nonEmpty, s"expected a sort-merge join:\n$finalPlan")
      assert(smjs.exists(_.isSkewJoin),
        s"AQE did not mark the join as a skew join:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
