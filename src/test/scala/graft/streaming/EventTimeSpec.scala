package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Event-time streaming: watermarked tumbling windows and
  * flatMapGroupsWithState sessionization. */
class EventTimeSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("tumblingCounts aggregates per window+key (batch parity)") {
    import spark.implicits._
    val df = Seq(
      (ts(1), "a"), (ts(2), "a"), (ts(3), "b"),  // window [0,60)
      (ts(61), "a")                              // window [60,120)
    ).toDF("ts", "k")
    val got = EventTimeOps.tumblingCounts(df, "ts", "k", "1 hour", "10 minutes")
      .orderBy("window_start", "k").collect()
      .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2)))
    got.toSeq shouldBe Seq((0L, "a", 2L), (0L, "b", 1L), (60L, "a", 1L))
  }

  test("tumblingCounts streams with watermark eviction") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String)]
    val q = EventTimeOps.tumblingCounts(in.toDF()
        .withColumnRenamed("_1", "ts").withColumnRenamed("_2", "k"),
      "ts", "k", "1 hour", "10 minutes")
      .writeStream.outputMode("update").format("memory")
      .queryName("tumbling").start()
    try {
      in.addData((ts(1), "a"), (ts(2), "a"))
      q.processAllAvailable()
      in.addData((ts(61), "a"))
      q.processAllAvailable()
      val rows = spark.table("tumbling").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2)))
        .toSet
      rows should contain((0L, "a", 2L))
      rows should contain((60L, "a", 1L))
    } finally q.stop()
  }

  test("slidingCounts lands each event in windowLen/slide windows") {
    import spark.implicits._
    val df = Seq((ts(65), "a")).toDF("ts", "k")
    val got = EventTimeOps.slidingCounts(df, "ts", "k",
        "1 hour", "30 minutes", "10 minutes")
      .orderBy("window_start").collect()
      .map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(2)))
    // minute 65 is covered by windows starting at 30 and 60
    got.toSeq shouldBe Seq((30L, 1L), (60L, 1L))
  }

  test("sessionWindowCounts merges overlapping gaps (batch parity)") {
    import spark.implicits._
    // user a: events at 1, 20, 90 with a 30-minute gap -> sessions
    // [1, 20+30) (merged: 20-1 < 30) and [90, 120); user b: one session
    val df = Seq(
      (ts(1), "a"), (ts(20), "a"), (ts(90), "a"), (ts(5), "b")
    ).toDF("ts", "k")
    val got = EventTimeOps.sessionWindowCounts(df, "ts", "k",
        "30 minutes", "10 minutes")
      .orderBy("k", "session_start").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 60000,
        r.getTimestamp(2).getTime / 60000, r.getLong(3)))
    got.toSeq shouldBe Seq(
      ("a", 1L, 50L, 2L), ("a", 90L, 120L, 1L), ("b", 5L, 35L, 1L))
  }

  test("sessionWindowCounts agrees with the lag/cumsum sessionization") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // microsecond-exact gap: session_window merges iff the next event is
    // STRICTLY before prev + gap, at full timestamp precision (a
    // seconds-truncating unix_timestamp comparison would disagree on
    // sub-second boundary gaps)
    val gapUs = 1800L * 1000000L
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"))
    val w = Window.partitionBy("user_id").orderBy("ts")
    val want = ev
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_session", when(col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) >= gapUs,
        1L).otherwise(0L))
      .withColumn("session_id", sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"), count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "n_events")
    val got = EventTimeOps.sessionWindowCounts(
      ev, "ts", "user_id", "30 minutes", "10 minutes")
      .select("user_id", "session_start", "n_events")
    got.exceptAll(want).count() shouldBe 0L
    want.exceptAll(got).count() shouldBe 0L
  }

  test("sessionWindowCounts streams and emits merged sessions") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String)]
    val q = EventTimeOps.sessionWindowCounts(in.toDF()
        .withColumnRenamed("_1", "ts").withColumnRenamed("_2", "k"),
      "ts", "k", "30 minutes", "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("native_sessions").start()
    try {
      in.addData((ts(100), "u"), (ts(105), "u"))
      q.processAllAvailable()
      // append mode: nothing emits until the watermark passes end + gap
      in.addData((ts(1000), "u"))
      q.processAllAvailable()
      in.addData((ts(2000), "u"))
      q.processAllAvailable()
      val rows = spark.table("native_sessions").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / 60000,
          r.getTimestamp(2).getTime / 60000, r.getLong(3)))
        .toSet
      rows should contain(("u", 100L, 135L, 2L))
    } finally q.stop()
  }

  test("asOfEnrich stamps the latest at-or-before version; batch parity") {
    import spark.implicits._
    // price book: key a changes at t=10 and t=30 (tie at 10: p=5 beats
    // p=4 — max payload, same rule as Joins.asOf); key b never versioned
    val dim = Seq(("a", ts(10), 4L), ("a", ts(10), 5L), ("a", ts(30), 9L))
      .toDF("k", "vts", "price")
    val stream = Seq(("a", ts(5), 1L), ("a", ts(10), 2L), ("a", ts(20), 3L),
      ("a", ts(40), 4L), ("b", ts(20), 5L)).toDF("k", "ts", "row_id")
    val got = EventTimeOps.asOfEnrich(stream, dim, Seq("k"), "ts", "vts",
        Seq("price"))
      .select("row_id", "price").as[(Long, Option[Long])].collect().toMap
    got shouldBe Map(1L -> None, 2L -> Some(5L), 3L -> Some(5L),
      4L -> Some(9L), 5L -> None)
    // identical to the batch as-of operator on the same inputs
    val viaAsOf = graft.operators.Joins.asOf(stream, dim, Seq("k"),
        "ts", "vts", Seq("price"))
      .select("row_id", "price").as[(Long, Option[Long])].collect().toMap
    viaAsOf shouldBe got
  }

  test("asOfEnrich streams without a state store") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dim = Seq(("a", ts(10), 5L)).toDF("k", "vts", "price")
    val in = MemoryStream[(Timestamp, String)]
    val q = EventTimeOps.asOfEnrich(in.toDF()
          .withColumnRenamed("_1", "ts").withColumnRenamed("_2", "k"),
        dim, Seq("k"), "ts", "vts", Seq("price"))
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_enriched").start()
    try {
      in.addData((ts(5), "a"), (ts(15), "a"), (ts(15), "z"))
      q.processAllAvailable()
      val rows = spark.table("asof_enriched").collect()
        .map(r => (r.getAs[Timestamp]("ts").getTime / 60000L,
          r.getAs[String]("k"),
          Option(r.getAs[java.lang.Long]("price")).map(_.toLong))).toSet
      rows shouldBe Set((5L, "a", None), (15L, "a", Some(5L)),
        (15L, "z", None))
    } finally q.stop()
  }

  test("enrich stamps static dimension columns onto a stream, broadcast") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dim = Seq(("a", "alpha"), ("b", "beta")).toDF("k", "segment")
    val in = MemoryStream[(Timestamp, String)]
    val q = EventTimeOps.enrich(in.toDF()
          .withColumnRenamed("_1", "ts").withColumnRenamed("_2", "k"),
        dim, Seq("k"))
      .writeStream.outputMode("append").format("memory")
      .queryName("enriched").start()
    try {
      in.addData((ts(1), "a"), (ts(2), "z")) // z has no dimension row
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getAs[String]("k"), Option(r.getAs[String]("segment"))))
        .toSet
      rows shouldBe Set(("a", Some("alpha")), ("z", None))
    } finally q.stop()
    // the static side must join as a broadcast, not a shuffle

    val batchPlan = EventTimeOps.enrich(
      Seq((ts(1), "a")).toDF("ts", "k"), dim, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(batchPlan.contains("BroadcastHashJoin"),
      s"expected broadcast enrichment, got:\n$batchPlan")
  }

  test("sessionize emits a session once the watermark passes its gap") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val in = MemoryStream[EventTimeOps.Ev]
    val q = EventTimeOps.sessionize(in.toDS(), gapMs = 30 * 60000L,
        lateness = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    try {
      // session: user 1, events at minute 100 and 105 (offset from epoch 0
      // — an event timestamp equal to the initial watermark is dropped)
      in.addData(EventTimeOps.Ev(1L, ts(100)), EventTimeOps.Ev(1L, ts(105)))
      q.processAllAvailable()
      // far-future event pushes the watermark beyond session end + gap
      in.addData(EventTimeOps.Ev(2L, ts(340)))
      q.processAllAvailable()
      // one more batch so the timeout fires after the watermark update
      in.addData(EventTimeOps.Ev(2L, ts(341)))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[EventTimeOps.Session].collect()
      val s1 = sessions.filter(_.user_id == 1L)
      s1.length shouldBe 1
      s1.head.n_events shouldBe 2L
      s1.head.session_start shouldBe ts(100)
      s1.head.session_end shouldBe ts(105)
    } finally q.stop()
  }

  test("sessionize merges an out-of-order event into pending sessions") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val in = MemoryStream[EventTimeOps.Ev]
    val q = EventTimeOps.sessionize(in.toDS(), gapMs = 30 * 60000L,
        lateness = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions3").start()
    try {
      // gaps 105->140 exceed 30m, so these look like two sessions...
      in.addData(EventTimeOps.Ev(1L, ts(100)), EventTimeOps.Ev(1L, ts(105)),
        EventTimeOps.Ev(1L, ts(140)))
      q.processAllAvailable()
      // ...until a late event at 132 (admissible: watermark is 130)
      // bridges them: gaps 105->132->140 are all within 30m
      in.addData(EventTimeOps.Ev(1L, ts(132)))
      q.processAllAvailable()
      // advance the watermark past 140+30, then trigger the timeout batch
      in.addData(EventTimeOps.Ev(2L, ts(300)))
      q.processAllAvailable()
      in.addData(EventTimeOps.Ev(2L, ts(301)))
      q.processAllAvailable()
      val s1 = spark.table("sessions3").as[EventTimeOps.Session].collect()
        .filter(_.user_id == 1L)
      s1.length shouldBe 1 // ONE session, not a split with wrong extents
      s1.head.n_events shouldBe 4L
      s1.head.session_start shouldBe ts(100)
      s1.head.session_end shouldBe ts(140)
    } finally q.stop()
  }

  test("streamDedup drops duplicate keys arriving within the watermark") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(String, Timestamp)]
    val q = EventTimeOps.streamDedup(
        in.toDF().toDF("fp", "ts"), Seq("fp"), "ts", "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup").start()
    try {
      in.addData(("a", ts(100)), ("a", ts(101)), ("b", ts(102)))
      q.processAllAvailable()
      in.addData(("a", ts(103)), ("c", ts(104))) // "a" still within watermark
      q.processAllAvailable()
      val keys = spark.table("sdedup").collect().map(_.getString(0)).toSeq
      keys.sorted shouldBe Seq("a", "b", "c") // each key exactly once
    } finally q.stop()
  }

  test("intervalJoin matches right rows within the horizon per key") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = EventTimeOps.intervalJoin(
      views.toDF().toDF("user_id", "view_ts"),
      clicks.toDF().toDF("user_id", "click_ts"),
      "user_id", "view_ts", "click_ts",
      horizon = "10 minutes", lateness = "5 minutes")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("vc").start()
    try {
      views.addData((1L, ts(100)), (2L, ts(100)))
      clicks.addData((1L, ts(105)), // within horizon -> match
        (2L, ts(115)),              // 15 min after view -> no match
        (1L, ts(95)))               // before the view -> no match
      q.processAllAvailable()
      val got = spark.table("vc").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000,
          r.getTimestamp(3).getTime / 60000)).toSet
      got shouldBe Set((1L, 100L, 105L))
    } finally q.stop()
  }

  test("intervalJoinOuter emits unmatched lefts after the horizon") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = EventTimeOps.intervalJoinOuter(
      views.toDF().toDF("user_id", "view_ts"),
      clicks.toDF().toDF("user_id", "click_ts"),
      "user_id", "view_ts", "click_ts",
      horizon = "10 minutes", lateness = "5 minutes")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("vco").start()
    try {
      views.addData((1L, ts(100)), (2L, ts(100)))
      clicks.addData((1L, ts(105))) // user 1 converts; user 2 never does
      q.processAllAvailable()
      // push both watermarks far past view_ts + horizon + lateness so
      // the unmatched left row's null emission is forced
      views.addData((9L, ts(200)))
      clicks.addData((9L, ts(200)))
      q.processAllAvailable()
      val got = spark.table("vco").collect()
        .filter(r => r.getLong(0) <= 2L)
        .map(r => (r.getLong(0),
          Option(r.getTimestamp(3)).map(_.getTime / 60000))).toSet
      got shouldBe Set((1L, Some(105L)), (2L, None))
    } finally q.stop()
  }

  test("sessionize splits on gap within a single batch") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val in = MemoryStream[EventTimeOps.Ev]
    val q = EventTimeOps.sessionize(in.toDS(), gapMs = 30 * 60000L,
        lateness = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions2").start()
    try {
      // two bursts 2h apart in one batch -> two pending sessions in state;
      // the first emits only when the batch's watermark update (to
      // 225 - 10 lateness = 215 > 105+30) triggers the engine's no-data
      // batch — finality comes from the watermark, not from the in-batch
      // gap. The second burst (ends 225) stays open.
      in.addData(EventTimeOps.Ev(1L, ts(100)), EventTimeOps.Ev(1L, ts(105)),
        EventTimeOps.Ev(1L, ts(225)))
      q.processAllAvailable()
      in.addData(EventTimeOps.Ev(2L, ts(226)))
      q.processAllAvailable()
      val sessions = spark.table("sessions2").as[EventTimeOps.Session].collect()
      sessions.length shouldBe 1
      sessions.head.n_events shouldBe 2L
      sessions.head.session_start shouldBe ts(100)
      sessions.head.session_end shouldBe ts(105)
    } finally q.stop()
  }
}
