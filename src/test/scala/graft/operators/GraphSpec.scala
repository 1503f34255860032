package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Graph.degrees / Graph.pagerankInt / Graph.triangles on hand-computable
  * graphs exercising the awkward shapes: a dangling node (in-edges only),
  * a duplicate edge, a self-loop, and a reverse edge. PageRank is checked
  * against an in-memory integer simulation implementing the documented
  * fixed-point arithmetic — the operator's claim is bit-identical
  * determinism, so the test demands exact equality, not tolerance.
  */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  // 4 is dangling (no out-edges), 1->2 is duplicated, 5->5 is a self-loop
  private lazy val edges = Seq(
    (1L, 2L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (5L, 5L), (3L, 4L)
  ).toDF("src", "dst")

  test("degrees counts parallel edges by default") {
    val got = Graph.degrees(edges, "src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got shouldBe Array(
      (1L, 3L, 1L), (2L, 1L, 2L), (3L, 2L, 1L), (4L, 0L, 2L), (5L, 1L, 1L))
  }

  test("degrees with distinctEdges counts neighbors on the simple graph") {
    val got = Graph.degrees(edges, "src", "dst", distinctEdges = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got shouldBe Array(
      (1L, 2L, 1L), (2L, 1L, 1L), (3L, 2L, 1L), (4L, 0L, 2L), (5L, 1L, 1L))
  }

  /** Reference simulation of the documented fixed-point PageRank: distinct
    * edges, rank in micro-units, integer truncating division everywhere. */
  private def simulate(es: Set[(Long, Long)], iters: Int,
                       dampBp: Long): Map[Long, Long] = {
    val nodes = es.flatMap(e => Seq(e._1, e._2))
    val scale = 1000000L
    val base = scale * (10000 - dampBp) / 10000
    val outDeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    var rank = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((s, d) <- es) contrib(d) += rank(s) / outDeg(s)
      rank = nodes.map { n =>
        val c = contrib(n)
        n -> (base + (c / 10000) * dampBp + ((c % 10000) * dampBp) / 10000)
      }.toMap
    }
    rank
  }

  test("pagerankInt matches the integer simulation exactly") {
    val distinctEdges = Set(
      (1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (5L, 5L), (3L, 4L))
    for (iters <- Seq(1, 4)) {
      val want = simulate(distinctEdges, iters, 8500L)
      val got = Graph.pagerankInt(edges, "src", "dst", iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe want
    }
  }

  /** The mass-conserving variant's simulation: per round, the summed
    * rank of out-degree-0 nodes splits as dsum / n_nodes (truncating)
    * into every node's contribution before damping. */
  private def simulateDangling(es: Set[(Long, Long)], iters: Int,
                               dampBp: Long): Map[Long, Long] = {
    val nodes = es.flatMap(e => Seq(e._1, e._2))
    val scale = 1000000L
    val base = scale * (10000 - dampBp) / 10000
    val outDeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    var rank = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((s, d) <- es) contrib(d) += rank(s) / outDeg(s)
      val dsum = nodes.toSeq.filterNot(outDeg.contains).map(rank).sum
      val share = dsum / nodes.size
      rank = nodes.map { n =>
        val c = contrib(n) + share
        n -> (base + (c / 10000) * dampBp + ((c % 10000) * dampBp) / 10000)
      }.toMap
    }
    rank
  }

  test("pagerankInt with dangling redistribution matches the simulation") {
    val distinctEdges = Set(
      (1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (5L, 5L), (3L, 4L))
    for (iters <- Seq(1, 4)) {
      val want = simulateDangling(distinctEdges, iters, 8500L)
      val got = Graph.pagerankInt(edges, "src", "dst", iters,
          redistributeDangling = true).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe want
    }
    // node 4 is dangling, so redistribution must actually move mass:
    // the two variants may not agree
    val plain = Graph.pagerankInt(edges, "src", "dst", 4).collect()
      .map(r => r.getLong(1)).sum
    val conserving = Graph.pagerankInt(edges, "src", "dst", 4,
        redistributeDangling = true).collect().map(r => r.getLong(1)).sum
    conserving should be > plain
  }

  test("personalizedPagerankInt matches its integer simulation exactly") {
    import spark.implicits._
    // node 6 is a non-seed SOURCE (out-edge only, no in-edges): its rank
    // must decay to exactly 0 — restart mass lands only on seeds
    val distinctEdges = Set(
      (1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (5L, 5L), (3L, 4L),
      (6L, 2L))
    val pprEdges = distinctEdges.toSeq.toDF("src", "dst")
    val seedSet = Set(1L, 5L)
    def simulatePpr(es: Set[(Long, Long)], iters: Int,
                    dampBp: Long): Map[Long, Long] = {
      val nodes = es.flatMap(e => Seq(e._1, e._2))
      val scale = 1000000L
      val base = scale * (10000 - dampBp) / 10000
      val outDeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
      var rank = nodes.map(n =>
        n -> (if (seedSet(n)) scale else 0L)).toMap
      for (_ <- 1 to iters) {
        val contrib = scala.collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        for ((s, d) <- es) contrib(d) += rank(s) / outDeg(s)
        rank = nodes.map { n =>
          val c = contrib(n)
          val b = if (seedSet(n)) base else 0L
          n -> (b + (c / 10000) * dampBp + ((c % 10000) * dampBp) / 10000)
        }.toMap
      }
      rank
    }
    val seeds = seedSet.toSeq.toDF("node")
    for (iters <- Seq(1, 4)) {
      val want = simulatePpr(distinctEdges, iters, 8500L)
      val got = Graph.personalizedPagerankInt(pprEdges, "src", "dst",
        seeds, iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe want
      // the claimed invariant, now genuinely falsifiable: the source
      // non-seed (node 6) gets no restart mass and no inflow — rank 0
      got(6L) shouldBe 0L
    }
  }

  test("pagerankInt output is ordered by node and mass-plausible") {
    val pr = Graph.pagerankInt(edges, "src", "dst", 4).collect()
    pr.map(_.getLong(0)) shouldBe pr.map(_.getLong(0)).sorted
    // total mass can only leak (dangling nodes + DIV truncation), never grow
    pr.map(_.getLong(1)).sum should be <= 5L * 1000000L
    all(pr.map(_.getLong(1))) should be >= 150000L // the undamped base
  }

  test("damping reduction is bit-identical to the naive product form") {
    // the overflow-safe form (reduce csum by 10000 BEFORE multiplying)
    // must equal dampBp*csum DIV 10000 computed without overflow
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000; dampBp <- Seq(0L, 1L, 8500L, 10000L)) {
      val c = rnd.nextLong(Long.MaxValue)
      val reduced = (c / 10000) * dampBp + ((c % 10000) * dampBp) / 10000
      val exact = (BigInt(dampBp) * BigInt(c) / 10000).toLong
      reduced shouldBe exact
    }
    // and it survives a csum that overflows the naive Long product
    val big = 1000000000000000L // 1e15: 10000x it exceeds Long.MaxValue
    val viaSpark = spark.range(1).select(
      expr(s"(CAST($big AS BIGINT) DIV 10000) * 8500 + " +
        s"((CAST($big AS BIGINT) % 10000) * 8500) DIV 10000").as("r"))
      .head.getLong(0)
    viaSpark shouldBe 850000000000000L
  }

  test("triangles enumerates each triangle once, id-sorted") {
    // triangles {1,2,3} and {2,3,4}; 2->1 reverses an existing edge,
    // 3->3 self-loops, 1->2 repeats, 4->5 closes nothing
    val e = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 3L), (1L, 2L),
      (2L, 4L), (4L, 3L), (4L, 5L)
    ).toDF("src", "dst")
    val got = Graph.triangles(e, "src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got shouldBe Array((1L, 2L, 3L), (2L, 3L, 4L))
  }

  test("triangles on a hubbed graph (degree orientation stays correct)") {
    // star hub 0 -> 1..5 plus rim edge 1-2: exactly one triangle {0,1,2}
    val e = ((1L to 5L).map(i => (0L, i)) :+ (2L, 1L)).toDF("src", "dst")
    val got = Graph.triangles(e, "src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got shouldBe Array((0L, 1L, 2L))
  }

  test("bfsHops: undirected shortest hops; unreachable nodes absent") {
    // chain 0-1-2-3 plus shortcut 0-2 (directed 2->0: undirected walk
    // must still use it), duplicate edge, and an isolated pair 8-9
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (2L, 0L), (0L, 1L),
      (8L, 9L)).toDF("src", "dst")
    val got = Graph.bfsHops(e, "src", "dst", source = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    got shouldBe Array((0L, 0L), (1L, 1L), (2L, 1L), (3L, 2L))
    // source with no edges at all: just itself at hop 0
    val lone = Graph.bfsHops(e, "src", "dst", source = 42L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    lone shouldBe Array((42L, 0L))
    // diameter overflow fails loudly rather than truncating silently
    val chain = (0L until 5L).map(i => (i, i + 1)).toDF("src", "dst")
    an[IllegalStateException] should be thrownBy
      Graph.bfsHops(chain, "src", "dst", source = 0L, maxHops = 2)
  }

  test("kcoreFixed peels transitively, not just one pass") {
    // K4 on {0,1,2,3}; 4 hangs off 3, 5 hangs off 4: one pass drops 5,
    // the NEXT pass drops 4 (its degree only falls below 2 after 5
    // goes) — a single-round cut would keep node 4.
    val e = (for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (a, b)).toDF("src", "dst")
      .union(Seq((3L, 4L), (4L, 5L)).toDF("src", "dst"))
    val got = Graph.kcoreFixed(e, "src", "dst", k = 2, rounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got shouldBe Array((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L))
    // k above the max degree empties the graph entirely
    Graph.kcoreFixed(e, "src", "dst", k = 10, rounds = 8)
      .collect() shouldBe empty
  }

  /** Reference simulation of integer HITS: per round authorities sum hub
    * scores over in-edges then L1-renormalize to 1e6 (truncating), hubs
    * sum the NEW authority scores over out-edges and renormalize. */
  private def simulateHits(es: Set[(Long, Long)],
                           iters: Int): Map[Long, (Long, Long)] = {
    val nodes = es.flatMap(e => Seq(e._1, e._2))
    val scale = 1000000L
    def renorm(raw: Map[Long, Long]): Map[Long, Long] = {
      val s = raw.values.sum
      nodes.map(n => n -> raw.getOrElse(n, 0L) * scale / s).toMap
    }
    var hub = nodes.map(_ -> scale).toMap
    var auth = hub
    for (_ <- 1 to iters) {
      auth = renorm(es.groupBy(_._2).map { case (n, g) =>
        n -> g.toSeq.map(e => hub(e._1)).sum })
      hub = renorm(es.groupBy(_._1).map { case (n, g) =>
        n -> g.toSeq.map(e => auth(e._2)).sum })
    }
    nodes.map(n => n -> (hub(n), auth(n))).toMap
  }

  test("hitsInt matches the integer simulation exactly") {
    val distinctEdges = Set(
      (1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (5L, 5L), (3L, 4L))
    for (iters <- Seq(1, 3)) {
      val want = simulateHits(distinctEdges, iters)
      val got = Graph.hitsInt(edges, "src", "dst", iters).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      got shouldBe want
    }
    // dangling node 4 (no out-edges) must hold hub 0; L1 mass of each
    // score vector stays within truncation slack of the 1e6 seed
    val fin = Graph.hitsInt(edges, "src", "dst", 3).collect()
    fin.find(_.getLong(0) == 4L).get.getLong(1) shouldBe 0L
    val hubs = fin.map(_.getLong(1)).sum
    val auths = fin.map(_.getLong(2)).sum
    hubs should (be >= 1000000L - fin.length.toLong and be <= 1000000L)
    auths should (be >= 1000000L - fin.length.toLong and be <= 1000000L)
  }

  test("lpaFixed separates two triangles joined by a bridge") {
    import spark.implicits._
    // two triangle communities {1,2,3} and {10,11,12} with bridge 3-10;
    // expected labels hand-traced through the documented synchronous
    // min-tie-break schedule for 4 rounds: the bridge does not bleed
    // one community's label into the other
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L)).toDF("src", "dst")
    val got = Graph.lpaFixed(es, "src", "dst", rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L)
  }
}
