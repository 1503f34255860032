package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.{HashExprs, TextFunctions => TF}

/** Binary-code (Hamming) ANN: the banded pigeonhole path against the
  * exact scan, over md5-60 SimHash codes of the sf0.001 documents —
  * the same signature relation the registered ann_hamming_* queries
  * retrieve over. */
class HammingAnnSpec extends SparkSpec {

  private lazy val codes = Tables.documents(spark, sfDir)
    .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
    .filter(org.apache.spark.sql.functions.size(col("toks")) > 0)
    .select(col("doc_id"), HashExprs.simhash_md5_60(col("toks")).as("sig"))
    .cache()

  private lazy val sigOf: Map[Long, Long] = codes.collect()
    .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def collected(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  private lazy val brute =
    collected(Ann.hammingTopK(codes, "doc_id", "sig", k = 5))
  private lazy val banded =
    collected(Ann.hammingBandedTopK(codes, "doc_id", "sig", k = 5))

  test("brute: hamming values are true popcounts and ranking is the " +
       "(hamming, id) total order") {
    assert(brute.nonEmpty)
    brute.foreach { case (q, _, c, h) =>
      h shouldBe java.lang.Long.bitCount(sigOf(q) ^ sigOf(c)).toLong
      q should not be c
    }
    brute.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.map(_._2) shouldBe (1L to sorted.length).toArray
      // non-decreasing hamming down the ranking, ids ascending on ties
      sorted.sliding(2).foreach {
        case Array((_, _, c1, h1), (_, _, c2, h2)) =>
          assert(h1 < h2 || (h1 == h2 && c1 < c2))
        case _ => ()
      }
    }
  }

  test("banded: every brute top-5 entry within Hamming 3 is recovered " +
       "(the 4x15-bit pigeonhole guarantee), and nothing ranks wrongly") {
    val bandedSet = banded.map(t => (t._1, t._3)).toSet
    // pigeonhole: candidates include ALL docs within hamming <= 3 of the
    // query, so any global top-5 entry at hamming <= 3 must survive the
    // k-bounded rerank (anything that could displace it in the banded
    // ranking would also displace it in the global one)
    brute.filter(_._4 <= 3).foreach { case (q, _, c, h) =>
      assert(bandedSet.contains((q, c)),
        s"brute neighbor ($q, $c) at hamming $h missing from banded top-5")
    }
    banded.foreach { case (q, _, c, h) =>
      h shouldBe java.lang.Long.bitCount(sigOf(q) ^ sigOf(c)).toLong
    }
    // banded is a k-bounded subset ranking: per query at most 5 rows,
    // ranks contiguous from 1
    banded.groupBy(_._1).foreach { case (_, rows) =>
      rows.length should be <= 5
      rows.map(_._2).sorted shouldBe (1L to rows.length).toArray
    }
    // and the fixture actually exercises recovery (some hamming <= 3
    // neighbors exist — otherwise this test is vacuous)
    assert(brute.exists(_._4 <= 3),
      "fixture has no hamming <= 3 neighbor pairs; pigeonhole test vacuous")
  }

  test("banded plan shape: equi-join on (band, bv), never a nested " +
       "loop or cartesian; the brute form is nested-loop by design") {
    // the 100 TB contract: candidate generation must be a hash/merge
    // join on the band keys (shuffle volume = band collisions), not an
    // all-pairs comparison — a regression to a nested loop here is the
    // exact quadratic shape the banded path exists to avoid
    val bandedPlan = Ann.hammingBandedTopK(codes, "doc_id", "sig", k = 5)
      .queryExecution.executedPlan.toString
    assert(!bandedPlan.contains("BroadcastNestedLoopJoin") &&
      !bandedPlan.contains("CartesianProduct"),
      s"banded Hamming plan degenerated to all-pairs:\n$bandedPlan")
    assert(bandedPlan.contains("Join"), s"no join found:\n$bandedPlan")
    // the exact scan is DECLARED all-pairs (quad-gated in Bench): its
    // non-equi self-join has no key to hash on
    val brutePlan = Ann.hammingTopK(codes, "doc_id", "sig", k = 5)
      .queryExecution.executedPlan.toString
    assert(brutePlan.contains("BroadcastNestedLoopJoin") ||
      brutePlan.contains("CartesianProduct"),
      s"expected the declared all-pairs shape:\n$brutePlan")
  }

  test("band geometry widens the guarantee: 8x7-bit bands recover " +
       "every brute entry within Hamming 7 and recall at least the " +
       "4x15 configuration") {
    val fine = collected(Ann.hammingBandedTopK(codes, "doc_id", "sig",
      k = 5, bandBits = 7, nBands = 8))
    val fineSet = fine.map(t => (t._1, t._3)).toSet
    // pigeonhole at radius nBands-1 = 7 (same argument as the 4x15 test)
    brute.filter(_._4 <= 7).foreach { case (q, _, c, h) =>
      assert(fineSet.contains((q, c)),
        s"brute neighbor ($q, $c) at hamming $h missing from 8x7 top-5")
    }
    // a finer banding can only widen the candidate set per band
    // collision radius, so brute-top-5 recall must not drop
    val bandedSet = banded.map(t => (t._1, t._3)).toSet
    val recOf = (s: Set[(Long, Long)]) =>
      brute.count(r => s.contains((r._1, r._3)))
    assert(recOf(fineSet) >= recOf(bandedSet),
      s"8x7 recall ${recOf(fineSet)} below 4x15 ${recOf(bandedSet)}")
  }
}
