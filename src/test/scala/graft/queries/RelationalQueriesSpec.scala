package graft.queries

import graft.SparkSpec

/** Bounds for the queries whose engine-internal sketches have no DuckDB
  * oracle (driver checks rows only). */
class RelationalQueriesSpec extends SparkSpec {

  test("approx percentiles land within 1% of the exact discrete ones") {
    val exact = RelationalQueries.defs("stats_percentiles")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = RelationalQueries.defs("stats_percentiles_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    approx.keySet shouldBe exact.keySet
    for ((flag, (a50, a90, a99)) <- approx) {
      val (e50, e90, e99) = exact(flag)
      math.abs(a50 - e50) / e50 should be < 0.01
      math.abs(a90 - e90) / e90 should be < 0.01
      math.abs(a99 - e99) / e99 should be < 0.01
    }
  }
}
