package graft.operators

import graft.SparkSpec

/** Connected-components label propagation over near-dup pairs. */
class ComponentsSpec extends SparkSpec {

  private def comps(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.components(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chains collapse to the minimum id (multi-hop propagation)") {
    // 1-2, 2-3, 3-4 is one component even though 1 and 4 never pair
    comps(Seq((1L, 2L), (2L, 3L), (3L, 4L))) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L)
  }

  test("disjoint clusters keep distinct representatives") {
    comps(Seq((5L, 9L), (2L, 7L), (7L, 3L))) shouldBe
      Map(5L -> 5L, 9L -> 5L, 2L -> 2L, 7L -> 2L, 3L -> 2L)
  }

  test("every pair's endpoints land in the same component") {
    val pairs = Seq((1L, 2L), (4L, 6L), (6L, 8L), (2L, 9L), (10L, 11L))
    val m = comps(pairs)
    pairs.foreach { case (a, b) => m(a) shouldBe m(b) }
  }

  private def twoStar(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.componentsTwoStar(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two-star matches propagation on a deep chain (diameter 60 > " +
      "propagation's default round budget)") {
    // a 61-node path: min-label propagation advances one hop per round
    // and would need 60 rounds; the star contraction collapses it in a
    // logarithmic handful. Descending ids exercise the non-trivial
    // orientation.
    val pairs = (1L to 60L).map(i => (100L - i, 101L - i))
    twoStar(pairs) shouldBe (40L to 100L).map(_ -> 40L).toMap
  }

  test("default entry point survives diameter > maxIter via the " +
      "two-star fallback") {
    import spark.implicits._
    // a 61-node path with maxIter 10: propagation cannot converge, so
    // components() must log and hand the pair relation to the star
    // contraction instead of throwing — callers stay diameter-robust
    val pairs = (1L to 60L).map(i => (100L - i, 101L - i))
    val got = Dedup.components(pairs.toDF("a", "b"), "a", "b", maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe (40L to 100L).map(_ -> 40L).toMap
  }

  test("two-star matches propagation on mixed clusters, self-pairs " +
      "and duplicates") {
    val pairs = Seq((1L, 2L), (2L, 1L), (4L, 6L), (6L, 8L), (2L, 9L),
      (10L, 11L), (12L, 12L), (8L, 4L))
    twoStar(pairs) shouldBe comps(pairs)
  }

  test("two-star matches propagation on a pseudo-random graph") {
    // deterministic LCG pairs over 200 ids: plenty of merges, several
    // components, no dependence on java.util.Random defaults
    var x = 7L
    def next(): Long = { x = (x * 1103515245L + 12345L) % 997L; x % 200L }
    val pairs = Seq.fill(150)((next(), next())).filter(p => p._1 != p._2)
    twoStar(pairs) shouldBe comps(pairs)
  }
}
