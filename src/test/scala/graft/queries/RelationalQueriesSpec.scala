package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Bounds for the queries whose engine-internal sketches have no DuckDB
  * oracle (driver checks rows only). */
class RelationalQueriesSpec extends SparkSpec {

  test("WeightedMean udaf registers for SQL and matches composed built-ins") {
    import org.apache.spark.sql.functions._
    spark.udf.register("weighted_mean",
      udaf(graft.functions.CraneAggregators.WeightedMean))
    graft.core.Views.register(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT l_returnflag,
                weighted_mean(l_extendedprice, l_quantity) AS w
         FROM lineitem GROUP BY 1 ORDER BY 1""")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val composed = graft.core.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg((sum(col("l_extendedprice") * col("l_quantity")) /
        sum(col("l_quantity"))).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    viaSql.keySet shouldBe composed.keySet
    viaSql.foreach { case (k, v) => v shouldBe composed(k) +- 1e-6 }
  }

  test("approx percentiles land within tolerance; sketch raw within 1%") {
    // the query's ok-flags carry the 2% sketch-vs-exact verdict (the
    // oracle asserts them); the spec additionally keeps the tighter 1%
    // raw-sketch bound against the exact discrete percentiles
    val exact = RelationalQueries.defs("stats_percentiles")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val graduated =
      RelationalQueries.defs("stats_percentiles_approx")(spark, sfDir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    graduated.keySet shouldBe exact.keySet
    graduated.values.foreach(_ shouldBe ((1L, 1L, 1L)))
    val raw = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("p"))
      .collect().map(r => r.getString(0) -> {
        val p = r.getSeq[Double](1); (p(0), p(1), p(2)) }).toMap
    for ((flag, (a50, a90, a99)) <- raw) {
      val (e50, e90, e99) = exact(flag)
      math.abs(a50 - e50) / e50 should be < 0.01
      math.abs(a90 - e90) / e90 should be < 0.01
      math.abs(a99 - e99) / e99 should be < 0.01
    }
  }

  test("TPC-H exhibit plans: broadcasts in place, no nested-loop joins") {
    // the plan shapes the scale story claims: Q3/Q5 broadcast their
    // dims and never fall to a cartesian/nested-loop; the skyline and
    // the pareto sweep are histogram windows + joins, not quadratic
    // NOT-EXISTS anti-joins
    for (name <- Seq("sql_tpch_q3", "sql_tpch_q5", "sql_tpch_q4",
        "sql_tpch_q2", "sql_tpch_q13", "sql_tpch_q18", "sql_tpch_q17",
        "sql_tpch_q7", "sql_tpch_q10", "sql_tpch_q14", "sql_tpch_q19",
        "sql_tpch_q21", "sql_tpch_q8", "sql_tpch_q9",
        "sql_tpch_q12", "sql_tpch_q16", "sql_tpch_q20",
        "skyline_parts")) {
      val plan = RelationalQueries.defs(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), s"$name:\n$plan")
    }
    // Q13's semantics hinge on the predicate living IN the outer join:
    // the plan must keep a LeftOuter join (a WHERE would let Spark
    // reduce it to inner and silently drop zero-order customers)
    val q13 = RelationalQueries.defs("sql_tpch_q13")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(q13.contains("LeftOuter"), q13)
    // sales_pareto's one nested-loop is the 1-row scalar total
    // attached via crossJoin(broadcast(...)) — allowed; what must NOT
    // appear is an unbroadcast cartesian, and the value-histogram
    // windows must be there (one global over the bucket rollup, one
    // partitioned by bucket)
    val pareto = RelationalQueries.defs("sales_pareto")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!pareto.contains("CartesianProduct"), pareto)
    assert(pareto.contains("windowspecdefinition(bucket"), pareto)
    for (name <- Seq("sql_tpch_q3", "sql_tpch_q5", "sql_tpch_q2",
        "sql_tpch_q18", "sql_tpch_q7", "sql_tpch_q10",
        "sql_tpch_q14", "sql_tpch_q16", "sql_tpch_q20")) {
      val plan = RelationalQueries.defs(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$name:\n$plan")
    }
    // Q11's scalar-fraction HAVING must attach the grand total as a
    // 1-row broadcast (crossJoin(broadcast)) — allowed nested-loop —
    // and never recompute it per group; Q16's NOT IN complaint set
    // must plan as a broadcast anti-join, not a shuffled one
    val q11 = RelationalQueries.defs("sql_tpch_q11")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!q11.contains("CartesianProduct"), q11)
    val q16 = RelationalQueries.defs("sql_tpch_q16")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(q16.contains("LeftAnti"), q16)
  }
}
