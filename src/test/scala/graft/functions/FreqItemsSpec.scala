package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.CraneAggregators.{FreqItemsMG, MGBuf}

/** CraneAggregators.FreqItemsMG — the Misra-Gries heavy-hitters sketch.
  *
  * Contract under test: (1) the algebraic guarantee — every key with
  * true frequency > n/(k+1) survives in the summary, for both the
  * streaming `reduce` path and the mergeable-summaries `merge` path;
  * (2) bounded state (never more than k counters); (3) the registered
  * sketch+recount queries equal their exact GROUP BY/HAVING twins.
  */
class FreqItemsSpec extends SparkSpec {

  private def runReduce(agg: FreqItemsMG, xs: Seq[Long]): MGBuf =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("guarantee: keys above n/(k+1) survive reduce on adversarial order") {
    val k = 4
    val agg = new FreqItemsMG(k)
    // 100 occurrences of key 1 (50%), 60 of key 2 (30%), singletons pad
    // to n=200; threshold n/(k+1) = 40. Interleave singletons to force
    // constant decrement pressure.
    val heavy = Seq.fill(100)(1L) ++ Seq.fill(60)(2L)
    val noise = (1000L until 1040L)
    val stream = heavy.zipAll(noise, -1L, -1L)
      .flatMap { case (a, b) => Seq(a, b) }.filter(_ != -1L)
    val buf = runReduce(agg, stream)
    buf.counts.size should be <= k
    buf.counts.keySet should contain allOf (1L, 2L)
  }

  test("guarantee survives merge of per-partition summaries") {
    val k = 9
    val agg = new FreqItemsMG(k)
    // key 7 holds 20% across four partitions that each also carry
    // distinct noise; threshold n/(k+1) = 10% — 7 must survive the
    // merge tree no matter how partials combine
    val parts = (0 until 4).map { p =>
      val noise = (100L * p until 100L * p + 40L)
      runReduce(agg, Seq.fill(10)(7L) ++ noise)
    }
    val merged = parts.reduce(agg.merge)
    merged.counts.size should be <= k
    merged.counts.keySet should contain (7L)
    // and the left/right fold orders agree on the guarantee too
    val mergedR = parts.reverse.reduce(agg.merge)
    mergedR.counts.keySet should contain (7L)
  }

  test("state never exceeds k counters under a uniform stream") {
    val agg = new FreqItemsMG(3)
    val buf = runReduce(agg, (0L until 1000L))
    buf.counts.size should be <= 3
  }

  test("registered sketch+recount queries equal the exact relation") {
    // events_freq_items and corpus_heavy_tokens both promise output
    // IDENTICAL to the exact GROUP BY/HAVING — re-derive both exactly
    val ev = graft.core.Tables.events(spark, sfDir)
    val n = ev.count()
    val exactUsers = ev.groupBy("user_id").count()
      .filter(col("count") * 200 > n)
      .select(col("user_id"), col("count").as("cnt"))
      .orderBy("user_id").collect().toSeq
    graft.queries.EventQueries.defs("events_freq_items")(spark, sfDir)
      .collect().toSeq shouldBe exactUsers

    val terms = graft.core.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("term"))
    val nt = terms.count()
    val exactTerms = terms.groupBy("term").count()
      .filter(col("count") * 1000 > nt)
      .select(col("term"), col("count").as("cnt"))
      .orderBy("term").collect().toSeq
    graft.queries.TextQueries.defs("corpus_heavy_tokens")(spark, sfDir)
      .collect().toSeq shouldBe exactTerms
  }
}
