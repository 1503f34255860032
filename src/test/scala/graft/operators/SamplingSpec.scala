package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SamplingSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sfDir)
  private lazy val total = events.count()

  test("bernoulli keeps roughly frac256/256 of rows, deterministically") {
    val n1 = Sampling.bernoulli(events, "event_id", 64).count()
    val n2 = Sampling.bernoulli(events, "event_id", 64).count()
    n1 shouldBe n2 // same rows every run
    val frac = n1.toDouble / total
    assert(frac > 0.15 && frac < 0.35, s"25% target, got $frac")
  }

  test("frac256 edge cases: 0 keeps nothing, 256 keeps everything") {
    Sampling.bernoulli(events, "event_id", 0).count() shouldBe 0L
    Sampling.bernoulli(events, "event_id", 256).count() shouldBe total
  }

  test("disjoint salts give (near-)independent samples") {
    val a = Sampling.bernoulli(events, "event_id", 64, salt = "a")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.bernoulli(events, "event_id", 64, salt = "b")
      .select("event_id").collect().map(_.getLong(0)).toSet
    // overlap should be ~ |a|*|b|/total, far from identical
    assert(a != b)
    val expected = a.size.toDouble * b.size / total
    assert(math.abs((a intersect b).size - expected) < expected,
      s"overlap ${(a intersect b).size} vs expected ~$expected")
  }

  test("entity-keyed sampling keeps all of an entity's rows together") {
    val sampled = Sampling.bernoulli(events, "user_id", 64)
    val sampledUsers = sampled.select("user_id").distinct()
      .collect().map(_.getLong(0)).toSet
    // every row of every sampled user survives
    val expectedRows = events
      .filter(col("user_id").isInCollection(sampledUsers)).count()
    sampled.count() shouldBe expectedRows
  }

  test("exactPerStratum returns exactly n per stratum, layout-independent") {
    val docs = Tables.documents(spark, sfDir)
    val n = 30
    val kept = Sampling.exactPerStratum(docs, "doc_id", "lang", n)
    val perLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, t) =>
      perLang(lang) shouldBe math.min(n.toLong, t) }
    val again = Sampling.exactPerStratum(docs.repartition(7), "doc_id",
      "lang", n)
    kept.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      again.select("doc_id").collect().map(_.getLong(0)).toSet
    Sampling.exactPerStratum(docs, "doc_id", "lang", 0).count() shouldBe 0L
  }

  test("weightedMix applies integer per-stratum rates; weight-0 dropped") {
    val docs = Tables.documents(spark, sfDir)
    val weights = Map("en" -> 4000, "es" -> 2500, "de" -> 2000, "fr" -> 1000)
    val kept = Sampling.weightedMix(docs, "doc_id", "lang", weights,
      budgetNum = 4, budgetDen = 10)
    // zh has no weight entry -> weight 0 -> dropped entirely
    kept.filter(col("lang") === "zh").count() shouldBe 0L
    // layout-independent membership
    val keptShuffled = Sampling.weightedMix(docs.repartition(7), "doc_id",
      "lang", weights, budgetNum = 4, budgetDen = 10)
    kept.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      keptShuffled.select("doc_id").collect().map(_.getLong(0)).toSet
    // replay the documented rate formula through the bernoulli primitive
    val budget = docs.count() * 4 / 10
    docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).foreach { case (lang, n) =>
        val f = math.min(256L,
          256L * budget * weights.getOrElse(lang, 0) / (10000L * n)).toInt
        kept.filter(col("lang") === lang).count() shouldBe
          Sampling.bernoulli(docs.filter(col("lang") === lang), "doc_id", f)
            .count()
      }
  }

  test("weightedMix caps rates at keep-everything when the budget allows") {
    val docs = Tables.documents(spark, sfDir)
    // budget = 10x the corpus with full weight on one stratum: that
    // stratum's rate saturates at 256 (keep all), others drop to 0
    val kept = Sampling.weightedMix(docs, "doc_id", "lang",
      Map("fr" -> 10000), budgetNum = 10, budgetDen = 1)
    kept.count() shouldBe docs.filter(col("lang") === "fr").count()
    // empty input stays empty rather than erroring
    Sampling.weightedMix(docs.limit(0), "doc_id", "lang",
      Map("fr" -> 10000), budgetNum = 1, budgetDen = 2).count() shouldBe 0L
  }

  test("weightedTopK: k rows, scores in (0,1], weight dominates, stable") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => (i, 1L)) :+ (999L, 1000000L)
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedTopK(df, "id", "w", k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    got.length shouldBe 10
    got.foreach { case (_, s) => assert(s > 0.0 && s <= 1.0) }
    // u^(1/1e6) ~ 1 for any u: the heavy row must rank first
    got.head._1 shouldBe 999L
    // layout-independent selection
    val again = Sampling.weightedTopK(df.repartition(7), "id", "w", 10)
      .collect().map(_.getLong(0)).toSet
    again shouldBe got.map(_._1).toSet
  }

  test("stratified honors per-stratum fractions") {
    val s = Sampling.stratified(events, "event_id", "event_type",
      fractions = Map("click" -> 0, "view" -> 256), default256 = 64)
    val byType = s.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.get("click") shouldBe None // fraction 0
    byType("view") shouldBe
      events.filter(col("event_type") === "view").count() // fraction 1
  }
}
