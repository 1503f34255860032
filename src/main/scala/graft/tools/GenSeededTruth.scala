package graft.tools

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.SparkSession

/** Generation-time ground truth for the two SEEDED approximate queries
  * (`dedup_semantic`, `media_near_dup`) — the r11 deflate pattern
  * (tools/GenDeflateTruth) applied to seeded geometry: their quantizer
  * state (k-means cells, Gaussian hyperplanes) is engine-internal, so
  * no closed-form SQL replay exists — but with a FIXED seed the output
  * is a pure function of the corpus, so the expected rows are pinned
  * ONCE beside the corpora they were computed from and the DuckDB
  * oracle joins the fixture by content digest. Staleness is
  * self-announcing, exactly like the deflate fixture: a regenerated
  * corpus changes the digests, the oracle join drops rows, and the
  * row-count check fails visibly instead of comparing stale truth.
  *
  * Independence from the operators under test: the assignment /
  * within-cell ranking / eps-drop stages (semdedup) and the bucket /
  * candidate-pair / cosine-verify stages (near-dup) are reimplemented
  * here as plain driver-side loops over collected rows — a drift in
  * either the DataFrame pipeline or this walk breaks parity loudly.
  * Two pieces are intentionally SHARED with the engine, with their
  * determinism pinned elsewhere: `Ann.kmeans` (determinism asserted in
  * AnnSpec) and `Multimodal.extractFeatures` (feature arithmetic
  * hash-verified through media_near_dup_det's closed-form oracle).
  * The seeded hyperplanes are re-derived here from the same
  * `new Random(seed)` Gaussian stream the engine documents.
  *
  * Keying:
  *   - semdedup rows key on md5 of the embedding's micro-unit CSV
  *     (floor(x·10⁶ + 0.5) per coordinate) — vectors are unique within
  *     and disjoint across the driver SFs, so one fixture serves all
  *     three;
  *   - near-dup PAIRS key on (corpus_md5, id_a, id_b) with corpus_md5 =
  *     md5 of the comma-joined per-document md5(text) in doc_id order —
  *     media payloads are NOT unique (byte-identical dupes are part of
  *     the corpus design), so pairs key on ids within a corpus
  *     fingerprint instead of content digests.
  *
  * Re-run after any TESTDATA regeneration:
  *
  *   sbt "runMain graft.tools.GenSeededTruth"
  */
object GenSeededTruth {

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  private def md5hex(s: String): String = md5hex(s.getBytes("UTF-8"))

  /** Spark round(col, 4) on DoubleType: HALF_UP over
    * BigDecimal.valueOf's canonical decimal form. */
  private def round4(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP).doubleValue()

  /** Plain replica of HashExprs.CosineSim's evaluation order; NaN-free
    * inputs assumed (the fixture corpora). Returns None where the
    * expression returns null (zero norms). */
  private def cosine(a: Array[Double], b: Array[Double]): Option[Double] = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) None
    else Some(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Plain replica of Ann.planes: seeded Gaussian hyperplanes. */
  private def planes(nPlanes: Int, dim: Int,
                     seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Plain replica of HashExprs.hyperplaneKernel. */
  private def bucketOf(v: Array[Double],
                       ps: Array[Array[Double]]): Int = {
    var bucket = 0
    var b = 0
    while (b < ps.length) {
      val p = ps(b)
      var dot = 0.0
      val n = math.min(v.length, p.length)
      var i = 0
      while (i < n) { dot += v(i) * p(i); i += 1 }
      if (dot >= 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  /** Expected `dedup_semantic` rows for one corpus: (emb_md5, cell,
    * rnk, cent_sim, keep) — the plain-loop walk of
    * Dedup.semdedupFlags(eps = 0.2) with its defaults. */
  private def semdedupTruth(rows: Array[(Long, Array[Double])])
      : Seq[(String, Int, Long, Double, Boolean)] = {
    val eps = 0.2
    val n = rows.length
    val k = math.max(4, math.min(4096, math.ceil(n / 128.0).toInt))
    val sampleN = math.min(math.max(2000, 4 * k), 65536)
    // sample order: md5("42:<id>") hex ascending, then id
    val sample = rows
      .sortBy { case (id, _) => (md5hex(s"42:$id"), id) }
      .take(sampleN).map(_._2)
    val cents = graft.operators.Ann.kmeans(sample,
      math.min(k, sample.length), iters = 10, seed = 42L)
    // nearest centroid by L2^2, ties to the smallest cell index (the
    // array_sort-over-(d, cell)-structs selection)
    def assign(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        var d = 0.0; var i = 0
        val ct = cents(c)
        while (i < v.length) { val t = v(i) - ct(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    val assigned = rows.map { case (id, v) =>
      val cell = assign(v)
      (id, v, cell, cosine(v, cents(cell)).getOrElse(Double.NaN))
    }
    val ranked = assigned.groupBy(_._3).iterator.flatMap {
      case (_, cellRows) =>
        cellRows.sortBy { case (id, _, _, sim) => (-sim, id) }
          .zipWithIndex
          .map { case ((id, v, cell, sim), i) =>
            (id, v, cell, sim, (i + 1).toLong) }
    }.toArray
    val dropped = scala.collection.mutable.Set.empty[Long]
    ranked.groupBy(_._3).values.foreach { cellRows =>
      val byRank = cellRows.sortBy(_._5)
      for (i <- byRank.indices; j <- (i + 1) until byRank.length)
        if (cosine(byRank(i)._2, byRank(j)._2).exists(_ >= eps))
          dropped += byRank(j)._1
    }
    val digest = rows.map { case (id, v) =>
      id -> md5hex(v.map(x =>
        math.floor(x * 1000000.0 + 0.5).toLong).mkString(","))
    }.toMap
    require(digest.values.toSet.size == rows.length,
      "embedding digests must be unique within the corpus — the " +
        "fixture join would fan out otherwise")
    ranked.map { case (id, _, cell, sim, rnk) =>
      (digest(id), cell, rnk, round4(sim), !dropped.contains(id))
    }.toSeq
  }

  /** Expected `media_near_dup` rows for one corpus: (id_a, id_b, sim) —
    * the plain-loop walk of Ann.cosinePairsLsh(threshold = 0.95,
    * tables = 16, seed = 42) over the extracted media features. */
  private def nearDupTruth(feats: Array[(Long, Array[Double])],
                           bits: Int): Seq[(Long, Long, Double)] = {
    val dim = feats.headOption.map(_._2.length).getOrElse(1)
    val pairs = scala.collection.mutable.Set.empty[(Long, Long)]
    (0 until 16).foreach { t =>
      val ps = planes(bits, dim, 42L + t)
      feats.map { case (id, v) => (bucketOf(v, ps), id) }
        .groupBy(_._1).values.foreach { bucketRows =>
          val ids = bucketRows.map(_._2).sorted
          for (i <- ids.indices; j <- (i + 1) until ids.length)
            pairs += ((ids(i), ids(j)))
        }
    }
    val byId = feats.toMap
    pairs.iterator.flatMap { case (a, b) =>
      cosine(byId(a), byId(b)).filter(_ >= 0.95)
        .map(sim => (a, b, round4(sim)))
    }.toSeq.sortBy(p => (p._1, p._2))
  }

  def main(args: Array[String]): Unit = {
    val semOut =
      if (args.length > 0) args(0) else "data/semdedup/expected.parquet"
    val ndOut =
      if (args.length > 1) args(1) else "data/medianeardup/expected.parquet"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(sf => s"/root/testdata/$sf")
      .filter(d => new java.io.File(s"$d/embeddings.parquet").exists())

    val semRows = sfs.flatMap { d =>
      val rows = graft.core.Tables.embeddings(spark, d)
        .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
        .as[(Long, Array[Double])].collect()
      semdedupTruth(rows)
    }
    // digests are disjoint across the driver SFs (asserted): one flat
    // fixture keyed by emb_md5 serves all three
    require(semRows.map(_._1).toSet.size == semRows.length,
      "embedding digests collide ACROSS corpora — key the fixture by " +
        "(corpus, digest) before regenerating")
    semRows.toDF("emb_md5", "cell", "rnk", "cent_sim", "keep")
      .coalesce(1).write.mode("overwrite").parquet(semOut)

    val ndRows = sfs.flatMap { d =>
      val docs = graft.core.Tables.documents(spark, d)
      val corpusMd5 = md5hex(
        docs.selectExpr("doc_id", "md5(CAST(text AS BINARY)) AS h")
          .as[(Long, String)].collect().sortBy(_._1)
          .map(_._2).mkString(","))
      implicit val sp: SparkSession = spark
      val feats = graft.operators.Multimodal.extractFeatures(
          graft.operators.Multimodal.asMedia(
            graft.operators.Multimodal.mediaFromDocuments(docs)))
        .toDF()
        .selectExpr("media_id", "CAST(feature AS array<double>) AS v")
        .as[(Long, Array[Double])].collect()
      val bits = graft.operators.Ann.autoBits(docs.count(),
        targetBucket = 16)
      nearDupTruth(feats, bits).map { case (a, b, sim) =>
        (corpusMd5, a, b, sim) }
    }
    ndRows.toDF("corpus_md5", "id_a", "id_b", "sim")
      .coalesce(1).write.mode("overwrite").parquet(ndOut)

    println(s"[gen-seeded-truth] semdedup rows=${semRows.length} -> " +
      s"$semOut; near-dup pairs=${ndRows.length} -> $ndOut")
    spark.stop()
  }
}
