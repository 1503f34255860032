package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.{TextFunctions => TF}

/** Corpus.chunk / Corpus.tfidf invariants on sf0.001 documents. */
class CorpusSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("chunk: stride-aligned windows reconstruct the token stream") {
    val chunked = Corpus.chunk(docs, "doc_id", "text",
      chunkTokens = 8, overlap = 2)
    // taking the first `stride` tokens of every chunk (all of the last)
    // and concatenating in chunk order must equal the original tokens
    val stride = 6
    val rebuilt = chunked
      .withColumn("toks", split(col("chunk_text"), " "))
      .withColumn("maxc", max("chunk_id")
        .over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .withColumn("kept", when(col("chunk_id") === col("maxc"), col("toks"))
        .otherwise(slice(col("toks"), 1, stride)))
      .groupBy("doc_id")
      .agg(flatten(array_sort(collect_list(struct(col("chunk_id"),
        col("kept"))))("kept")).as("rebuilt"))
    val orig = docs.select(col("doc_id"), TF.tokens(col("text")).as("orig"))
      .filter(org.apache.spark.sql.functions.size(col("orig")) > 0)
    val joined = rebuilt.join(orig, "doc_id")
    joined.count() shouldBe orig.count()
    joined.filter(col("rebuilt") =!= col("orig")).count() shouldBe 0L
  }

  test("shuffleOrder: a reproducible, layout-independent permutation") {
    val a = Corpus.shuffleOrder(docs, "doc_id", seed = 42L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // positions are exactly 1..N and follow the (skey, id) sort order
    a.map(_._1).toSeq shouldBe (1L to a.length)
    a.map(r => (r._3, r._2)).toSeq shouldBe
      a.map(r => (r._3, r._2)).sorted.toSeq
    // physical layout must not leak into positions
    val b = Corpus.shuffleOrder(docs.repartition(7), "doc_id", 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    b.toSeq shouldBe a.toSeq
    // a different seed produces a genuinely different order
    val c = Corpus.shuffleOrder(docs, "doc_id", seed = 7L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    c.toSeq should not be a.map(r => (r._1, r._2)).toSeq
  }

  test("vocab: contiguous ids, frequency-ordered, counts total the corpus") {
    val v = Corpus.vocab(docs, "text").collect()
    v.map(_.getLong(0)).toSeq shouldBe (1L to v.length)
    // ids ascend as ctf descends (ties broken by term)
    v.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) > b.getLong(2) ||
        (a.getLong(2) == b.getLong(2) && a.getString(1) < b.getString(1)))
    }
    val totalToks = docs.select(sum(TF.tokenCount(col("text"))))
      .head().getLong(0)
    v.map(_.getLong(2)).sum shouldBe totalToks
  }

  test("encode: round-trips through the vocab; OOV maps to 0") {
    val fullVocab = Corpus.vocab(docs, "text")
    val full = Corpus.encode(docs, "doc_id", "text", fullVocab)
    // full vocabulary -> zero OOV, token counts match the tokenizer
    full.filter(col("n_oov") =!= 0L).count() shouldBe 0L
    val id2term = fullVocab.collect()
      .map(r => r.getLong(0).toString -> r.getString(1)).toMap
    val decoded = full.collect().map { r =>
      r.getLong(0) -> r.getString(3).split(" ").map(id2term).mkString(" ")
    }.toMap
    val orig = docs.select(col("doc_id"),
        array_join(TF.tokens(col("text")), " ").as("t"))
      .filter(col("t") =!= "")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    decoded shouldBe orig
    // truncated vocabulary: every dropped token becomes id 0, and
    // n_tokens is unchanged
    val cut = fullVocab.filter(col("token_id") <= 5)
    val enc5 = Corpus.encode(docs, "doc_id", "text", cut)
    enc5.filter(col("n_oov") === 0L).count() should be < full.count()
    enc5.select(sum("n_tokens")).head().getLong(0) shouldBe
      full.select(sum("n_tokens")).head().getLong(0)
    val keptIds = (1 to 5).map(_.toString).toSet + "0"
    enc5.collect().foreach { r =>
      val ids = r.getString(3).split(" ")
      assert(ids.forall(keptIds.contains), s"unexpected id in ${r}")
      ids.count(_ == "0") shouldBe r.getLong(2)
    }
  }

  test("shardExpr is layout-independent, in range, and balanced") {
    val n = 16
    val assign = docs.select(col("doc_id"),
      Corpus.shardExpr(col("doc_id"), n).as("shard"))
    val reassign = docs.repartition(11).select(col("doc_id"),
      Corpus.shardExpr(col("doc_id"), n).as("shard"))
    assign.except(reassign).count() shouldBe 0L
    val byShard = assign.groupBy("shard").count().collect()
    byShard.map(_.getInt(0)).foreach(s => assert(s >= 0 && s < n))
    byShard.length shouldBe n // no empty shard at 500 docs / 16 shards
    val mean = docs.count().toDouble / n
    assert(byShard.map(_.getLong(1)).max <= 3 * mean,
      "hash sharding should not skew 3x beyond the mean")
  }

  test("chunk: sizes and overlap behave as declared") {
    val chunked = Corpus.chunk(docs, "doc_id", "text",
      chunkTokens = 8, overlap = 2).cache()
    try {
      // every chunk's reported n_tokens matches its text
      chunked.filter(org.apache.spark.sql.functions
          .size(split(col("chunk_text"), " ")) =!= col("n_tokens"))
        .count() shouldBe 0L
      // only the last chunk of a doc may be shorter than chunkTokens
      val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      chunked.withColumn("maxc", max("chunk_id").over(w))
        .filter(col("chunk_id") < col("maxc") && col("n_tokens") =!= 8)
        .count() shouldBe 0L
      // a doc with fewer tokens than a chunk yields exactly one chunk
      val short = Corpus.chunk(
        docs.limit(1).select(col("doc_id"), lit("a b c").as("text")),
        "doc_id", "text", chunkTokens = 8, overlap = 2)
      short.count() shouldBe 1L
      short.head().getAs[Long]("n_tokens") shouldBe 3L
    } finally chunked.unpersist()
  }

  test("pack: bin assignment equals a sequential concat-and-cut walk") {
    val ctx = 500
    val withTok = docs.select(col("source"), col("doc_id"),
      TF.tokenCount(col("text")).cast("long").as("ntok"))
    val got = Corpus.pack(withTok, "source", Seq("doc_id"), "ntok", ctx)
      .select("source", "doc_id", "ntok", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sequential reference walk per source in doc order
    val want = got.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).toSeq.map { case (s, id, ntok, _) =>
        val bin = cum / ctx; cum += ntok; (s, id, bin)
      }
    }.toSet
    got.map(r => (r._1, r._2, r._4)).toSet shouldBe want
    got.map(_._4).max should be > 0L // multiple bins actually exercised
  }

  test("tfidf: df counts docs containing the term; df=N zeroes the score") {
    val scored = Corpus.tfidf(docs, "doc_id", "text").cache()
    try {
      val n = docs.count()
      // recompute df independently per term and compare
      val indep = docs
        .select(col("doc_id"), explode(array_distinct(
          TF.tokens(col("text")))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("df2"))
      scored.select("term", "df").distinct()
        .join(indep, "term")
        .filter(col("df") =!= col("df2")).count() shouldBe 0L
      // ubiquitous terms score exactly zero
      scored.filter(col("df") === n && col("tfidf") =!= 0.0)
        .count() shouldBe 0L
      // and no score is negative (df <= N always)
      scored.filter(col("tfidf") < 0.0).count() shouldBe 0L
    } finally scored.unpersist()
  }

  test("latestSnapshot equals the window formulation, plans no window") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
    val got = Corpus.latestSnapshot(ev, Seq("user_id"),
      Seq("ts_us", "event_id"), Seq("event_type", "value"))
    val want = ev
      .withColumn("rn", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("ts_us").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select("user_id", "ts_us", "event_id", "event_type", "value")
    got.exceptAll(want).count() shouldBe 0L
    want.exceptAll(got).count() shouldBe 0L
    // one row per key, and the scale claim: an aggregate, not a sort
    got.count() shouldBe ev.select("user_id").distinct().count()
    val plan = got.queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should include regex "(?i)aggregate"
  }

  test("latestSnapshot keeps the max version even when rows arrive late") {
    import spark.implicits._
    // key 1: version (2, 1) beats (2, 0) and (1, 9); key 2: single row
    val updates = Seq(
      (1L, 2L, 0L, "a"), (1L, 1L, 9L, "b"), (1L, 2L, 1L, "c"),
      (2L, 5L, 0L, "d")
    ).toDF("k", "v1", "v2", "payload").repartition(3)
    val got = Corpus.latestSnapshot(updates, Seq("k"), Seq("v1", "v2"),
        Seq("payload")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(3)))
    got shouldBe Array((1L, "c"), (2L, "d"))
  }

  test("pmiBigrams: hand-computed counts and independence scores") {
    import spark.implicits._
    // corpus "a b a b" + "b a": uni a:3 b:3 (n=6); bi ab:2 ba:2 (n=4)
    // pmi(a,b) = ln(2*6*6 / (4*3*3)) = ln 2
    val docs = Seq("a b a b", "b a").toDF("text")
    val got = Corpus.pmiBigrams(docs, "text", minCount = 1L).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    got.keySet shouldBe Set(("a", "b"), ("b", "a"))
    got(("a", "b")) shouldBe ((2L, 3L, 3L, 0.693147))
    got(("b", "a")) shouldBe ((2L, 3L, 3L, 0.693147))
    // minCount prunes the tail
    Corpus.pmiBigrams(docs, "text", minCount = 3L).count() shouldBe 0L
  }

  test("bigramSurprisal: hand-computed integer bit costs") {
    import spark.implicits._
    // corpus: "a b a b" + "a c" -> V = 3 (a, b, c)
    // bigram instances: ab, ba, ab, ac; c1(a)=3, c1(b)=1
    // bits(ab) = floor(log2((3+3) / (2+1))) = floor(log2 2) = 1
    // bits(ba) = floor(log2((1+3) / (1+1))) = 1
    // bits(ac) = floor(log2((3+3) / (1+1))) = floor(log2 3) = 1
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "x")).toDF("id", "text")
    val got = Corpus.bigramSurprisal(docs, "id", "text").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // doc 3 has no bigrams -> absent; doc 1: 3 instances (ab, ba, ab) =
    // 3 bits; doc 2: 1 instance (ac) = 1 bit
    got.keySet shouldBe Set(1L, 2L)
    got(1L) shouldBe ((3L, 3L, 1.0))
    got(2L) shouldBe ((1L, 1L, 1.0))
  }

  test("deflateRatio: repetitive text compresses, high-entropy doesn't") {
    import spark.implicits._
    val repetitive = "spark " * 400
    // deterministic pseudo-noise: md5 hex chunks (high-entropy for zlib)
    val noisy = (0 until 150).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).mkString
    val docs = Seq((1L, repetitive), (2L, noisy), (3L, ""))
      .toDF("id", "text")
    val got = Corpus.deflateRatio(docs, "id", "text").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    got(1L)._1 shouldBe repetitive.length.toLong
    assert(got(1L)._3 < 0.05, s"repetitive ratio ${got(1L)._3}")
    assert(got(2L)._3 > 0.4, s"noisy ratio ${got(2L)._3}")
    // empty doc: 0 raw bytes, ratio = deflate_bytes / max(raw,1) finite
    got(3L)._1 shouldBe 0L
    assert(got(3L)._3 >= 0.0)
    // determinism across layouts
    val again = Corpus.deflateRatio(docs.repartition(5), "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    again shouldBe got.map { case (k, v) => (k, v._2) }
  }

  test("deflate generation-time truth fixture: covers every document " +
      "at all three SFs and matches a live recompute") {
    import org.apache.spark.sql.functions.{col, md5}
    val truthPath = sys.env.getOrElse("GRAFT_DEFLATE_TRUTH",
      new java.io.File("data/deflate/expected.parquet").getAbsolutePath)
    val truth = spark.read.parquet(truthPath)
    // coverage: a regenerated corpus (different texts) must fail HERE
    // with a regen hint, before the oracle join silently drops rows
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val missing = graft.core.Tables
        .documents(spark, s"/root/testdata/$sf")
        .select(md5(col("text")).as("text_md5"))
        .join(truth, Seq("text_md5"), "left_anti")
        .count()
      assert(missing == 0L, s"$sf: $missing documents not in the " +
        "deflate truth fixture — TESTDATA changed; re-run " +
        "`sbt \"runMain graft.tools.GenDeflateTruth\"`")
    }
    // freshness: the ENGINE path (reused Deflater, reset/finish loop)
    // must agree with the fixture's independent single-shot
    // DeflaterOutputStream path on the full sf0.001 corpus — the same
    // parity the DuckDB oracle checks, failing fast in sbt test
    val docs = graft.core.Tables.documents(spark, sfDir)
    val live = Corpus.deflateRatio(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), md5(col("text")).as("text_md5")),
        "doc_id")
    val drift = live.join(truth.withColumnRenamed("deflate_bytes",
        "expected_bytes").select("text_md5", "expected_bytes"),
        "text_md5")
      .filter(col("deflate_bytes") =!= col("expected_bytes"))
      .count()
    drift shouldBe 0L
  }

  test("bm25Retrieve: no broadcast hint on corpus-proportional relations") {
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, LogicalPlan, ResolvedHint}
    val out = Corpus.bm25TopK(docs, "doc_id", "text", k = 3)
    // The document-frequency relation (vocabulary-sized) and the query
    // term set (a fixed fraction of the corpus in the RAG shape) both
    // grow with the data: a plan-time broadcast hint on either is a
    // driver OOM at 100x. Only a provably 1-row relation (the global
    // corpus-stats aggregate) may carry a hint; everything else is
    // AQE's measured runtime decision.
    def oneRow(p: LogicalPlan): Boolean = p match {
      case a: Aggregate => a.groupingExpressions.isEmpty
      case _ if p.children.length == 1 => oneRow(p.children.head)
      case _ => false
    }
    out.queryExecution.analyzed.foreach {
      case h: ResolvedHint =>
        assert(oneRow(h.child),
          s"broadcast hint on a corpus-proportional relation:\n$h")
      case _ =>
    }
    // at this (tiny) scale the runtime still picks broadcast joins for
    // the small sides — dropping the hint costs nothing where it was safe
    val rows = out.collect()
    assert(rows.nonEmpty)
    val executed = out.queryExecution.executedPlan.toString
    assert(executed.contains("BroadcastHashJoin"),
      s"expected runtime broadcast at test scale:\n$executed")
    // rank column is a dense 1..k prefix per query
    val perQuery = rows.groupBy(_.getLong(0))
    perQuery.values.foreach { rs =>
      rs.map(_.getInt(1)).sorted.toSeq shouldBe (1 to rs.length)
    }
  }

  test("scriptProfile: hand-crafted mixed-script string classifies " +
      "every codepoint into the right class") {
    import spark.implicits._
    // "ab 你好 Ж ا 3!" — 2 Latin, 2 CJK, 1 Cyrillic, 1 Arabic, 1 digit,
    // 4 spaces, 1 other
    val s = "ab 你好 Ж ا 3!"
    val df = Seq((1L, s)).toDF("doc_id", "text")
    val row = Corpus.scriptProfile(df, "doc_id", "text").collect().head
    (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4),
      row.getLong(5), row.getLong(6), row.getLong(7)) shouldBe
      ((2L, 1L, 2L, 1L, 1L, 4L, 1L))
    // class-range BOUNDARIES: first/last codepoint of each range is in,
    // the neighbors just outside are 'other'
    val edges = "一鿿Ѐӿ؀ۿ" // all in
    val outside = "䷿ꀀϿԀ׿܀" // all out
    val r2 = Corpus.scriptProfile(
      Seq((1L, edges + outside)).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    (r2.getLong(3), r2.getLong(4), r2.getLong(5), r2.getLong(7)) shouldBe
      ((2L, 2L, 2L, 6L))
  }

  test("withScriptSuffix: suffix class counts follow the generation " +
      "arithmetic and the profile recovers them") {
    import spark.implicits._
    val docs = Seq((9L, "hello world"), (10L, "x2!"), (0L, "z"))
      .toDF("doc_id", "text")
    val mixed = Corpus.withScriptSuffix(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // id=0: every modulus is 0 — suffix is the lone space
    mixed(0L) shouldBe "z "
    // id=9: 9%5=4 CJK, 9%7=2 Cyrillic, 9%3=0 Arabic, 9%4=1 digit
    val m9 = mixed(9L)
    assert(m9.startsWith("hello world "))
    m9.length shouldBe "hello world ".length + 4 + 2 + 0 + 1
    val prof = Corpus.scriptProfile(
        Corpus.withScriptSuffix(docs, "doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val p9 = prof(9L)
    (p9.getLong(3), p9.getLong(4), p9.getLong(5)) shouldBe ((4L, 2L, 0L))
    p9.getLong(2) shouldBe 1L // the one suffix digit; "hello world" has none
    val p10 = prof(10L)
    // id=10: text digit '2' + 10%4=2 suffix digits
    p10.getLong(2) shouldBe 3L
    (p10.getLong(3), p10.getLong(4), p10.getLong(5)) shouldBe ((0L, 3L, 1L))
  }

  test("withCombiningSuffix + nfcAudit: composed-pair arithmetic holds " +
      "and precomposed runs survive NFC untouched") {
    import spark.implicits._
    // id=5: 5%3=2 e+U+0301 pairs, 5%2=1 o+U+0308 pair, 5%4=1 U+00E9;
    // id=0: bare trailing space; id=4: 4%3=1, 4%2=0, 4%4=0
    val docs = Seq((5L, "abc"), (0L, "xy"), (4L, "q"))
      .toDF("doc_id", "text")
    val suffixed = Corpus.withCombiningSuffix(docs, "doc_id", "text")
    val byId = suffixed.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    byId(0L) shouldBe "xy "
    byId(5L) shouldBe "abc e\u0301e\u0301o\u0308\u00e9"
    byId(4L) shouldBe "q e\u0301"
    val rows = Corpus.nfcAudit(suffixed, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // id=5: len = 3 + 1 + 2*2 + 2*1 + 1 = 11; NFC composes 3 pairs
    rows(5L) shouldBe ((11L, 8L, 3L))
    rows(0L) shouldBe ((3L, 3L, 0L))
    // id=4: "q " + one decomposed pair
    rows(4L) shouldBe ((4L, 3L, 1L))
  }

  test("unicodeTokenProfile: hand-crafted multilingual tokens classify " +
      "and count by script of the first code point") {
    import spark.implicits._
    // tokens of doc 1: hello / U+4E16U+754C (cjk) / ok / 42x (digit-led)
    // / U+0410U+0431U+0432 (cyrillic); punctuation splits tokens
    val docs = Seq(
      (1L, "hello \u4e16\u754c, ok 42x \u0410\u0431\u0432!"),
      (2L, "plain text")).toDF("doc_id", "text")
    val prof = Corpus.unicodeTokenProfile(docs, "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    prof("latin") shouldBe ((4L, 16L)) // hello ok plain text
    prof("cjk") shouldBe ((1L, 2L))
    prof("digit") shouldBe ((1L, 3L)) // "42x" counts whole-token chars
    prof("cyrillic") shouldBe ((1L, 3L))
    prof.get("other") shouldBe None
  }
}
