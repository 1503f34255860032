package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc phase timer for optimization work: times labeled sub-plans of
  * a hot query with the noop sink (guide §1.4), so the cost of a
  * composite pipeline can be attributed to its stages. Bench-shaped
  * session (local[32], 32 shuffle partitions, AQE).
  *
  * `runMain graft.tools.TimeParts <probe> [sfDir]` — probes are
  * hand-maintained below; this is a dev tool, not a driver surface. */
object TimeParts {
  def main(args: Array[String]): Unit = {
    val probe = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    def time(label: String)(df: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val d = df
      d.write.format("noop").mode("overwrite").save()
      println(f"[parts] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      d
    }
    import org.apache.spark.sql.functions._
    probe match {
      case "knncomp" =>
        val c = graft.core.Tables.embeddings(spark, dir)
        val bits = graft.operators.Ann.autoBitsExact(c.count())
        // twice: cold then steady
        for (i <- 1 to 2) {
          val g = time(s"knnGraphLshDet($i)") {
            graft.operators.Ann.knnGraphLshDet(c, "vec_id", "embedding",
              k = 5, bits = bits, totalOrder = false)
          }
          val edges = g.filter(col("sim_bp") >= 2000)
            .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
          val chk = time(s"edges checkpoint($i)") {
            edges.localCheckpoint(true)
          }
          time(s"components($i)") {
            graft.operators.Dedup.components(chk, "src", "dst")
          }
        }
      case "dedupchain" =>
        val docs = graft.core.Tables.documents(spark, dir)
        for (i <- 1 to 2) {
          val idx = time(s"shingleIndex($i)") {
            graft.operators.Dedup.shingleIndex(docs, "doc_id", "text", 3)
          }.localCheckpoint(true)
          val pre = time(s"shinglePrefix($i)") {
            graft.operators.Dedup.shinglePrefix(idx, 8000)
          }.localCheckpoint(true)
          val pairs = time(s"jaccardPairsIdx($i)") {
            graft.operators.Dedup.ngramJaccardPairsIdx(idx, 8000,
              prebuiltPrefix = Some(pre))
          }.localCheckpoint(true)
          time(s"components($i)") {
            graft.operators.Dedup.components(pairs, "doc_a", "doc_b")
          }
          time(s"containment($i)") {
            graft.operators.Dedup.containmentPairsIdx(idx,
              thresholdBp = 8000, prebuiltPrefix = Some(pre))
          }
        }
      case "containment" =>
        val docs = graft.core.Tables.documents(spark, dir)
        val idx = graft.operators.Dedup
          .shingleIndex(docs, "doc_id", "text", 3).localCheckpoint(true)
        val pre = graft.operators.Dedup
          .shinglePrefix(idx, 8000).localCheckpoint(true)
        println(s"[parts] idx rows ${idx.count()}  prefix rows ${pre.count()}")
        for (i <- 1 to 2) {
          val cand = time(s"candidates($i)") {
            pre.as("a")
              .join(idx.select(col("doc_id"), col("shingle")).as("b"),
                col("a.shingle") === col("b.shingle") &&
                  col("a.doc_id") =!= col("b.doc_id"))
              .select(col("a.doc_id").as("doc_a"),
                col("b.doc_id").as("doc_b"))
              .distinct()
          }
          val chk = cand.localCheckpoint(true)
          println(s"[parts] candidates ${chk.count()}")
          time(s"verify($i)") {
            val sizes = idx.select("doc_id", "nsh").distinct()
            chk
              .join(idx.select(col("doc_id").as("doc_a"), col("shingle")),
                "doc_a")
              .join(idx.select(col("doc_id").as("doc_b"), col("shingle")),
                Seq("doc_b", "shingle"))
              .groupBy("doc_a", "doc_b")
              .agg(count(lit(1)).as("inter"))
              .join(sizes.select(col("doc_id").as("doc_a"),
                col("nsh").as("na")), "doc_a")
              .filter(col("inter") * 10000 >= col("na") * 8000)
          }
        }
      case "contfan" =>
        val docs = graft.core.Tables.documents(spark, dir)
        val idx = graft.operators.Dedup
          .shingleIndex(docs, "doc_id", "text", 3).localCheckpoint(true)
        val pre = graft.operators.Dedup
          .shinglePrefix(idx, 8000).localCheckpoint(true)
        val cand = pre.as("a")
          .join(idx.select(col("doc_id"), col("shingle")).as("b"),
            col("a.shingle") === col("b.shingle") &&
              col("a.doc_id") =!= col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct().localCheckpoint(true)
        val fan = cand.join(
          idx.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
          .localCheckpoint(true)
        println(s"[parts] fanout rows ${fan.count()}")
        val matches = fan.join(
          idx.select(col("doc_id").as("doc_b"), col("shingle")),
          Seq("doc_b", "shingle")).localCheckpoint(true)
        println(s"[parts] match rows ${matches.count()}")
        for (i <- 1 to 2) {
          time(s"fanjoin($i)") {
            cand.join(idx.select(col("doc_id").as("doc_a"),
              col("shingle")), "doc_a")
          }
          time(s"matchjoin($i)") {
            fan.join(idx.select(col("doc_id").as("doc_b"),
              col("shingle")), Seq("doc_b", "shingle"))
          }
          time(s"agg($i)") {
            matches.groupBy("doc_a", "doc_b")
              .agg(count(lit(1)).as("inter"))
          }
        }
      case "jacfan" =>
        val docs = graft.core.Tables.documents(spark, dir)
        val idx = graft.operators.Dedup
          .shingleIndex(docs, "doc_id", "text", 3).localCheckpoint(true)
        val pre = graft.operators.Dedup
          .shinglePrefix(idx, 8000).localCheckpoint(true)
        val cand = pre.as("a")
          .join(pre.as("b"),
            col("a.shingle") === col("b.shingle") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct().localCheckpoint(true)
        println(s"[parts] jac candidates ${cand.count()}")
        val fan = cand.join(
          idx.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
          .localCheckpoint(true)
        println(s"[parts] jac fanout rows ${fan.count()}")
        for (i <- 1 to 2) {
          time(s"jac candidates($i)") {
            pre.as("a").join(pre.as("b"),
              col("a.shingle") === col("b.shingle") &&
                col("a.doc_id") < col("b.doc_id"))
              .select(col("a.doc_id").as("doc_a"),
                col("b.doc_id").as("doc_b")).distinct()
          }
          time(s"jac verify($i)") {
            val sizes = idx.select("doc_id", "nsh").distinct()
            cand
              .join(idx.select(col("doc_id").as("doc_a"), col("shingle")),
                "doc_a")
              .join(idx.select(col("doc_id").as("doc_b"), col("shingle")),
                Seq("doc_b", "shingle"))
              .groupBy("doc_a", "doc_b")
              .agg(count(lit(1)).as("inter"))
              .join(sizes.select(col("doc_id").as("doc_a"),
                col("nsh").as("na")), "doc_a")
              .join(sizes.select(col("doc_id").as("doc_b"),
                col("nsh").as("nb")), "doc_b")
          }
        }
      case "winnow" =>
        import org.apache.spark.sql.expressions.Window
        val K = 5
        val docs = graft.core.Tables.documents(spark, dir)
        for (i <- 1 to 2) {
          time(s"hashed-lambda($i)") {
            docs.select(col("doc_id"), graft.functions.TextFunctions
              .tokens(col("text")).as("toks"))
              .filter(expr(s"size(toks) >= $K"))
              .select(col("doc_id"), posexplode(expr(
                s"""transform(sequence(1, size(toks) - ${K - 1}),
                    i -> CAST(conv(substring(md5(concat_ws(' ',
                      slice(toks, i, $K))), 1, 15), 16, 10) AS BIGINT))"""))
                .as(Seq("pos", "h")))
          }
          time(s"hashed-window($i)") {
            val w0 = Window.partitionBy("doc_id").orderBy("p")
            docs.select(col("doc_id"), graft.functions.TextFunctions
              .tokens(col("text")).as("toks"))
              .filter(expr(s"size(toks) >= $K"))
              .select(col("doc_id"), posexplode(col("toks"))
                .as(Seq("p", "tok")))
              .select(col("doc_id"), col("p").as("pos"),
                concat_ws(" ", col("tok"),
                  lead(col("tok"), 1).over(w0),
                  lead(col("tok"), 2).over(w0),
                  lead(col("tok"), 3).over(w0),
                  lead(col("tok"), 4).over(w0)).as("g"),
                lead(col("tok"), 4).over(w0).as("g4"))
              .filter(col("g4").isNotNull)
              .select(col("doc_id"), col("pos"),
                expr("CAST(conv(substring(md5(g), 1, 15), 16, 10) " +
                  "AS BIGINT)").as("h"))
          }
        }
      case "probe" =>
        val e = graft.core.Tables.embeddings(spark, dir)
        val tri = time("covTri") {
          graft.operators.Ann.covarianceTri(e, "vec_id", "embedding")
        }.localCheckpoint(true)
        for (i <- 1 to 3) {
          time(s"linearProbe($i)") {
            graft.operators.Ann.linearProbe(
              e.withColumn("y", when(col("label") === 0, 1L)
                .otherwise(-1L)),
              "vec_id", "embedding", "y", iters = 8, covTri = Some(tri))
          }
        }
      case "lshdet" =>
        val e = graft.core.Tables.embeddings(spark, dir)
        val bits = graft.operators.Ann.autoBitsExact(e.count())
        val v = e.select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("v"))
        val buckets = v.filter(size(col("v")) > 0)
          .select(col("id"), col("v"),
            posexplode(graft.functions.HashExprs
              .det_lsh_buckets(col("v"), bits, 16))
              .as(Seq("t", "bucket")))
          .localCheckpoint(true)
        val pairRows = buckets.as("a").join(buckets.as("b"),
            Seq("t", "bucket"))
          .filter(col("a.id") < col("b.id"))
        println(s"[parts] bucket-pair rows ${pairRows.count()}")
        println(s"[parts] distinct pairs ${pairRows
          .select(col("a.id"), col("b.id")).distinct().count()}")
      case "annpq" =>
        val e0 = graft.core.Tables.embeddings(spark, dir)
        println(s"[parts] n_emb ${e0.count()}")
        val e = e0.select(col("vec_id").as("id"),
          col("label").cast("long").as("label"),
          col("embedding").cast("array<double>").as("v"))
        val qp = col("id") % 50 === 0 && col("id") < 2000
        for (i <- 1 to 2) {
          time(s"centroid agg($i)") {
            e.select(col("id"), col("label"),
                posexplode(col("v")).as(Seq("dim", "x")))
              .withColumn("xi",
                floor(col("x") * 1000000.0 + 0.5).cast("long"))
              .groupBy("label", "dim")
              .agg(expr("CAST((2 * (sum(xi) + 2000000 * count(1)) + " +
                "count(1)) DIV (2 * count(1)) - 2000000 AS BIGINT)")
                .as("ci"))
          }
          time(s"pq codebook($i)") {
            graft.operators.Ann.detPqCodebook(e.select("id", "v"), 16)
          }
          time(s"ivfDetHomeCells($i)") {
            graft.operators.Ann.ivfDetHomeCells(e0, "vec_id",
              "embedding", "label")
          }
          time(s"pqDetTopK($i)") {
            graft.operators.Ann.pqDetTopK(e0, "vec_id", "embedding",
              qp, k = 5)
          }
          time(s"ivfDetTopK($i)") {
            graft.operators.Ann.ivfDetTopK(e0, "vec_id", "embedding",
              "label", qp, k = 5)
          }
          time(s"ivfPqDetTopK($i)") {
            graft.operators.Ann.ivfPqDetTopK(e0, "vec_id", "embedding",
              "label", qp, k = 5)
          }
          time(s"sq8DetTopK($i)") {
            graft.operators.Ann.sq8DetTopK(e0, "vec_id", "embedding",
              qp, k = 5)
          }
        }
      case other =>
        System.err.println(s"unknown probe $other")
    }
    spark.stop()
  }
}
