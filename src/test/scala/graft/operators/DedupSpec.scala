package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Dedup operator properties on the sf0.001 documents table. The
  * approximate operators (MinHash-LSH, SimHash) are validated against the
  * exact ones: LSH output must be a subset of the exact Jaccard relation
  * (precision 1 by construction — candidates are re-verified) with high
  * recall; SimHash banding is exhaustive for Hamming <= 3 by pigeonhole. */
class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir).cache()

  test("exactGroups partitions the corpus: group sizes sum to row count") {
    val total = docs.count()
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
    groups.agg(sum("n_dups")).head().getLong(0) shouldBe total
  }

  test("exactStats distinct count equals number of exact groups") {
    val nGroups = Dedup.exactGroups(docs, "doc_id", "text").count()
    val stats = Dedup.exactStats(docs, "text").head()
    stats.getLong(0) shouldBe docs.count()
    stats.getLong(1) shouldBe nGroups
  }

  test("sharedRunPairs finds offset runs with exact lengths and counts") {
    import spark.implicits._
    // doc 1 and doc 2 share the 9-token run "a..i" at DIFFERENT offsets
    // (0 vs 1) — an aligned fixed-window pass would miss it; doc 2 and
    // doc 4 share two separate 8-token runs on different diagonals;
    // doc 3 shares nothing 8 tokens long
    val d = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x a b c d e f g h i y"),
      (3L, "a b c d e f g q r s t u v w"),
      (4L, "a b c d e f g h z p q r s t u v w x1 x2 q w e")
    ).toDF("doc_id", "text")
    val got = Dedup.sharedRunPairs(d, "doc_id", "text", n = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 1-2: run a..i = 9 tokens, one island (diag -1)
    // 1-4: run a..h = 8 tokens (doc 1 pos 0, doc 4 pos 0), one island
    // 2-4: run a..h = 8 tokens (offset 1 vs 0), one island
    got.toSeq shouldBe Seq(
      (1L, 2L, 9L, 1L), (1L, 4L, 8L, 1L), (2L, 4L, 8L, 1L))
  }

  test("sharedRunPairs counts two disjoint runs separately") {
    import spark.implicits._
    // the pair shares runs r1 (8 tokens) and r2 (9 tokens) separated by
    // different junk — two islands on two diagonals, max_run = 9
    val d = Seq(
      (1L, "a b c d e f g h JUNK1 m n o p q r s t u"),
      (2L, "a b c d e f g h DIFFERENT m n o p q r s t u TAIL")
    ).toDF("doc_id", "text")
    val got = Dedup.sharedRunPairs(d, "doc_id", "text", n = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.toSeq shouldBe Seq((1L, 2L, 9L, 2L))
  }

  test("incrementalExact flags exactly the docs already in the corpus") {
    import spark.implicits._
    // corpus holds "alpha beta" twice (ids 1, 3) and "gamma delta" once
    val corpus = Seq((1L, "alpha beta"), (2L, "Gamma  delta"),
      (3L, "alpha beta")).toDF("doc_id", "text")
    // new batch: a normalization-equal dup (x2 in corpus), a fresh doc,
    // and a case/whitespace variant of the single corpus doc
    val newBatch = Seq((10L, "ALPHA   beta"), (11L, "fresh text"),
      (12L, "gamma delta")).toDF("doc_id", "text")
    val got = Dedup.incrementalExact(newBatch, corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    got shouldBe Array((10L, 1, 2L), (11L, 0, 0L), (12L, 1, 1L))
  }

  test("passageRetention keeps only the first occurrence of each window") {
    import spark.implicits._
    val w32a = (1 to 32).map(i => s"a$i").mkString(" ")
    val w32b = (1 to 32).map(i => s"b$i").mkString(" ")
    val crafted = Seq(
      (1L, s"$w32a $w32b"), // two unique passages
      (2L, w32a),           // exact copy of doc 1's first passage
      (3L, "unique words only")
    ).toDF("doc_id", "text")
    val r = Dedup.passageRetention(crafted, "doc_id", "text", 32)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
      .toMap
    r(1L) shouldBe ((2L, 2L))
    r(2L) shouldBe ((1L, 0L)) // its only passage already seen in doc 1
    r(3L) shouldBe ((1L, 1L))
  }

  test("passageRetention: empty and whitespace-only docs produce no rows") {
    import spark.implicits._
    val crafted = Seq((1L, ""), (2L, "   "), (3L, "one real doc"))
      .toDF("doc_id", "text")
    val r = Dedup.passageRetention(crafted, "doc_id", "text", 32)
    r.count() shouldBe 1L
    r.head().getLong(0) shouldBe 3L
  }

  test("minhash-LSH pairs are a subset of exact Jaccard pairs, recall >= 0.8") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH emitted a pair below the exact threshold")
    if (exact.nonEmpty)
      assert(lsh.size.toDouble / exact.size >= 0.8,
        s"LSH recall ${lsh.size}/${exact.size} below 0.8")
  }

  test("deterministic minhash: exact dups fully matched, estimates track Jaccard") {
    import spark.implicits._
    val det = Dedup.minhashDetPairs(docs, "doc_id", "text",
      n = 3, numPerms = 16, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // identical shingle sets => identical signatures => all 4 bands hit
    // and a 10000 bp estimate; every same-text pair must surface
    val sameText = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().groupBy(_._2).values.filter(_.length >= 2)
      .flatMap(g => g.map(_._1).sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    sameText.foreach { p =>
      det.get(p) match {
        case Some((bands, est)) =>
          bands shouldBe 4L
          est shouldBe 10000L
        case None => fail(s"exact-dup pair $p missing from det minhash")
      }
    }
    // candidates with a high estimate must be real near-dups: spot-check
    // that >= 9000 bp estimates correspond to >= 0.5 true Jaccard (the
    // estimator has 16-perm variance; this is a sanity bound, the oracle
    // pins the exact arithmetic)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    det.filter(_._2._2 >= 9000).keys.foreach { p =>
      assert(exact.contains(p),
        s"pair $p estimated >= 0.9 but true Jaccard < 0.5")
    }
    // determinism: a second run yields the identical relation
    val again = Dedup.minhashDetPairs(docs, "doc_id", "text",
      n = 3, numPerms = 16, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    again shouldBe det
  }

  test("simhash finds all exact-duplicate pairs (Hamming 0)") {
    import spark.implicits._
    val dupIds = Dedup.exactGroups(docs, "doc_id", "text")
      .filter($"n_dups" >= 2)
    val nDupGroups = dupIds.count()
    if (nDupGroups > 0) {
      val zero = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      assert(zero.count() > 0, "exact duplicates exist but SimHash found none")
    }
  }

  test("md5-simhash kernel path drops token-less docs like the relational twin") {
    import spark.implicits._
    // the kernel would otherwise sign empty docs as 0 and pair them at
    // Hamming 0, while the explode-based twin (and the shared oracle)
    // yields them no rows at all
    val crafted = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, ""), (4L, "   ")).toDF("doc_id", "text")
    val kernel = Dedup.simhashMd5Pairs(crafted, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rel = Dedup.simhashDetPairs(crafted, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    kernel shouldBe rel
    kernel shouldBe Set((1L, 2L))
  }

  test("deterministic simhash: exact dups at Hamming 0; relation reproducible") {
    import spark.implicits._
    val det = Dedup.simhashDetPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // identical text => identical frequency-weighted votes => identical
    // signature: every same-text pair must surface at Hamming 0
    val sameText = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().groupBy(_._2).values.filter(_.length >= 2)
      .flatMap(g => g.map(_._1).sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    sameText.foreach { p =>
      det.get(p) match {
        case Some(h) => h shouldBe 0L
        case None => fail(s"exact-dup pair $p missing from det simhash")
      }
    }
    val again = Dedup.simhashDetPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    again shouldBe det
  }

  test("contaminatedDocs flags exactly the docs sharing an 8-gram with eval") {
    import graft.functions.{TextFunctions => TF}
    val eval = docs.filter(col("doc_id") % 10 === 0)
    val cand = docs.filter(col("doc_id") % 10 =!= 0)
    val got = Dedup.contaminatedDocs(cand, eval, "doc_id", "text", 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // brute force: materialize gram sets and intersect locally
    val evalGrams = eval
      .select(explode(TF.shingles(col("text"), 8)).as("g"))
      .collect().map(_.getString(0)).toSet
    val want = cand
      .select(col("doc_id"), TF.shingles(col("text"), 8).as("g"))
      .collect()
      .filter(_.getSeq[String](1).exists(evalGrams.contains))
      .map(_.getLong(0)).toSet
    got shouldBe want
    got should not be empty
    // eval ids never leak into the flagged set
    got.exists(_ % 10 == 0) shouldBe false
  }

  test("embedding cosine pairs are symmetric-free and above threshold") {
    val embs = Tables.embeddings(spark, sfDir)
    val pairs = Dedup.embeddingCosinePairs(embs, "vec_id", "embedding", 0.5)
      .collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not canonically ordered")
      assert(r.getDouble(2) >= 0.5 - 1e-4)
    }
  }

  test("semdedup: every keep/drop decision matches the upper-triangular rule") {
    val eps = 0.2
    val embs = Tables.embeddings(spark, sfDir)
    val flags = Dedup.semdedupFlags(embs, "vec_id", "embedding", eps)
    val rows = flags.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(4)))
    // ranks are a contiguous 1..m permutation inside every cell
    rows.groupBy(_._2).values.foreach { cell =>
      cell.map(_._3).sorted.toSeq shouldBe (1L to cell.length)
    }
    // pairwise sims via the SAME codegen kernel the operator uses, so the
    // spec's rule replay cannot drift from the operator by a float ulp
    val withCell = embs.select(col("vec_id"), col("embedding"))
      .join(flags.select(col("vec_id"), col("cell"), col("rnk")), "vec_id")
    val sims = withCell.as("a").join(withCell.as("b"),
        col("a.cell") === col("b.cell") && col("a.rnk") < col("b.rnk"))
      .select(col("a.vec_id"), col("b.vec_id"),
        graft.functions.HashExprs.cosine_sim(
          col("a.embedding").cast("array<double>"),
          col("b.embedding").cast("array<double>")).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expectedDrops = sims.filter(_._3 >= eps).map(_._2).toSet
    val gotDrops = rows.filter(!_._4).map(_._1).toSet
    gotDrops shouldBe expectedDrops
    // the operator actually prunes something on this corpus, and keeps
    // the prototypical rank-1 member of every cell
    gotDrops should not be empty
    rows.filter(_._3 == 1L).foreach { r => assert(r._4, s"rank-1 dropped: $r") }
  }

  test("semdedupDet: keep/drop decisions match the upper-triangular rule in basis points") {
    // the det twin's contract, re-derived like the k-means variant
    // above but with the integer-bp comparison the operator (and its
    // oracle) actually use
    val eps = 0.2
    val embs = Tables.embeddings(spark, sfDir)
    val flags = Dedup.semdedupDetFlags(embs, "vec_id", "embedding", eps)
    val rows = flags.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    rows.groupBy(_._2).values.foreach { cell =>
      cell.map(_._3).sorted.toSeq shouldBe (1L to cell.length)
    }
    val withCell = embs.select(col("vec_id"), col("embedding"))
      .join(flags.select(col("vec_id"), col("cell"), col("rnk")), "vec_id")
    val sims = withCell.as("a").join(withCell.as("b"),
        col("a.cell") === col("b.cell") && col("a.rnk") < col("b.rnk"))
      .select(col("b.vec_id"),
        round(graft.functions.HashExprs.cosine_sim(
          col("a.embedding").cast("array<double>"),
          col("b.embedding").cast("array<double>")) * 10000)
          .cast("long").as("sim_bp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectedDrops = sims.filter(_._2 >= 2000L).map(_._1).toSet
    val gotDrops = rows.filter(_._4 == 0L).map(_._1).toSet
    gotDrops shouldBe expectedDrops
    rows.filter(_._3 == 1L).foreach(r =>
      assert(r._4 == 1L, s"rank-1 dropped: $r"))
  }

  test("containment: full containment detected; relation matches brute force") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val crafted = Seq(
      (1L, base),                                     // contained in 2
      (2L, s"$base iota kappa " * 3),                 // the container
      (3L, "totally different words here entirely")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(crafted, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 1 ⊂ 2 fully (cont 10000); 2 ⊄ 1 (2 has many shingles 1 lacks)
    got.map(p => (p._1, p._2)) should contain((1L, 2L))
    got.find(p => p._1 == 1L && p._2 == 2L).get._3 shouldBe 10000L
    got.map(p => (p._1, p._2)) should not contain ((2L, 1L))

    // real corpus: exact equality with the all-pairs brute force
    import graft.functions.{TextFunctions => TF}
    val sets = docs
      .select(col("doc_id"), TF.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .filter(_._2.nonEmpty)
    val brute = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia != ib
      inter = (sa & sb).size.toLong
      if inter * 10000 >= sa.size.toLong * 8000
    } yield (ia, ib, 10000L * inter / sa.size)).toSet
    val real = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    real shouldBe brute
    // and it strictly contains both directions of every Jaccard pair
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val realPairs = real.map(p => (p._1, p._2))
    jac.foreach { case (a, b) =>
      realPairs should contain(a -> b)
      realPairs should contain(b -> a)
    }
  }

  test("overlapMatrix: symmetric, diagonal-dominant, brute-force exact") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "a b c d e f"),   // 5-grams: "a b c d e", "b c d e f"
      ("s1", "a b c d e g"),   // adds "a b c d e" (dup) + "b c d e g"
      ("s2", "a b c d e f"),   // shares both of doc 1's grams
      ("s3", "x y z w v u")    // disjoint
    ).toDF("source", "text")
    val m = Dedup.overlapMatrix(docs, "text", "source", n = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val asMap = m.map { case (a, b, c) => (a, b) -> c }.toMap
    // brute: s1 grams {abcde, bcdef, bcdeg}, s2 {abcde, bcdef}, s3 {xyzwv, yzwvu}
    asMap shouldBe Map(
      ("s1", "s1") -> 3L, ("s1", "s2") -> 2L, ("s2", "s1") -> 2L,
      ("s2", "s2") -> 2L, ("s3", "s3") -> 2L)
    // invariants that must hold on any input
    asMap.foreach { case ((a, b), c) =>
      asMap((b, a)) shouldBe c
      c should be <= math.min(asMap((a, a)), asMap((b, b)))
    }
  }

  test("CDC chunks: identical docs chunk identically; a prefix insertion " +
      "perturbs only the leading chunk") {
    import spark.implicits._
    // 200 DISTINCT tokens: no chunk text can recur, so chunk-sequence
    // comparisons are unambiguous
    val body = (0 until 200).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, body),
      (2L, body),              // byte-identical
      (3L, "inserted " + body) // one-token prefix edit
    ).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs, "doc_id", "text", divisor = 8)
      .collect().map(r => (r.getLong(0), r.getString(3)))
    val byDoc = chunks.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    // identical content => identical chunk sequence
    byDoc(1L) shouldBe byDoc(2L)
    // sanity: chunking is non-trivial (several chunks, not one giant)
    val base = byDoc(1L)
    base.length should be > 5
    // shift-robustness: the edit stays confined BEFORE doc 1's first
    // boundary — everything from that boundary on is byte-identical
    // (fixed windows would shift and rewrite every window instead).
    // Depending on whether the first body token is itself a boundary,
    // doc 3 has the same chunk count (edit merged into chunk 0) or one
    // more (the inserted token forms its own leading chunk).
    val shifted = byDoc(3L)
    shifted.length should (be (base.length) or be (base.length + 1))
    shifted.takeRight(base.length - 1) shouldBe base.tail
    shifted.head should include ("inserted")
  }

  test("CDC retention: an exact duplicate doc keeps no chunk") {
    import spark.implicits._
    val body = (0 until 120).map(i => s"w$i").mkString(" ")
    val docs = Seq((10L, body), (20L, body)).toDF("doc_id", "text")
    val r = Dedup.cdcRetention(docs, "doc_id", "text", divisor = 8)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val m = r.map { case (id, n, k) => id -> ((n, k)) }.toMap
    // doc 10 is first everywhere (distinct tokens => no internal dups);
    // doc 20's chunks are all corpus-level duplicates
    m(10L)._1 shouldBe m(10L)._2
    m(20L)._2 shouldBe 0L
    m(10L)._1 shouldBe m(20L)._1 // same content => same chunk count
  }

  test("byte-level CDC: duplicates keep nothing; a prefix edit costs at " +
      "most the leading chunks; chunks partition the code points") {
    import spark.implicits._
    val body = (0 until 200).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, body),
      (2L, body),               // byte-identical duplicate
      (3L, "zqxj " + body)      // prefix insertion shifts every byte
    ).toDF("doc_id", "text")
    val r = Dedup.cdcBytesRetention(docs, "doc_id", "text",
        w = 16, divisor = 64)
      .collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(4)))).toMap
    val (n1, k1, cp1) = r(1L)
    n1 should be > 5L            // non-trivial chunking
    k1 shouldBe n1               // doc 1 is globally first everywhere
    r(2L)._2 shouldBe 0L         // exact duplicate: zero kept chunks
    r(2L)._1 shouldBe n1
    // the rolling window re-synchronizes w code points past the edit,
    // so only chunks touching the insertion differ — a fixed-width
    // chunker would rewrite every chunk after the shift instead
    r(3L)._2 should be <= 2L
    // chunks partition the canonical text exactly
    cp1 shouldBe body.codePoints().count()
    r(3L)._3 shouldBe ("zqxj " + body).codePoints().count()
  }
}
