package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class EventQueriesSpec extends SparkSpec {

  test("approx distinct users within 5% of exact per event type") {
    val approx = EventQueries.defs("events_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n <= 0.05,
        s"$k: approx $a vs exact $n")
    }
  }

  test("salted aggregation equals the direct group-by") {
    val salted = EventQueries.defs("events_salted_agg")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val direct = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    salted shouldBe direct
  }
}
