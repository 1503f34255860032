package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Multimodal plumbing tests: the codec bodies are stubs, but schema,
  * encoders, partition-batched execution, and determinism are real. */
class MultimodalSpec extends SparkSpec {

  private implicit lazy val s: org.apache.spark.sql.SparkSession = spark
  private lazy val media =
    Multimodal.asMedia(
      Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir))).cache()

  test("media table: one row per document, three kinds, non-empty payloads") {
    val docs = Tables.documents(spark, sfDir).count()
    media.count() shouldBe docs
    media.toDF().select("kind").distinct().count() shouldBe 3
    media.filter(m => m.bytes.isEmpty).count() shouldBe 0
  }

  test("decode is deterministic and covers every row") {
    val a = Multimodal.decode(media).collect().sortBy(_.media_id)
    val b = Multimodal.decode(media).collect().sortBy(_.media_id)
    a.map(_.mean_intensity).toSeq shouldBe b.map(_.mean_intensity).toSeq
    a.length shouldBe media.count()
    a.foreach { d =>
      assert(d.mean_intensity >= 0.0 && d.mean_intensity <= 1.0)
      assert(d.n_pixels > 0)
    }
  }

  test("media near-dup: identical payloads pair at sim 1.0, others below") {
    import spark.implicits._
    // two byte-identical payloads (ids 1, 2), one different (id 3):
    // the LSH-bucketed cosine pairs must contain exactly (1, 2) at 1.0
    // at a 0.95 threshold — identical features collide in every table
    // (guaranteed recall for exact dups), and the exact cosine verify
    // admits no false positives
    val rows = Seq(
      Multimodal.Media(1L, "image", "same content bytes".getBytes, 4, 4, 0, 0L),
      Multimodal.Media(2L, "image", "same content bytes".getBytes, 4, 4, 0, 0L),
      Multimodal.Media(3L, "image", "completely different".getBytes, 4, 4, 0, 0L)
    ).toDS()
    val feats = Multimodal.extractFeatures(rows, dim = 16)
      .toDF().withColumnRenamed("feature", "embedding")
    val pairs = graft.operators.Ann.cosinePairsLsh(
        feats, "media_id", "embedding", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    pairs.toSeq shouldBe Seq((1L, 2L, 1.0))
    // and the LSH relation is a subset of the exact block-pair relation
    val exact = Dedup.embeddingCosinePairs(
        feats, "media_id", "embedding", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    pairs.toSet.subsetOf(exact.toSet) shouldBe true
  }

  test("features: fixed dim, deterministic, distinct content differs") {
    val f = Multimodal.extractFeatures(media, dim = 16).collect()
    f.foreach(_.feature.length shouldBe 16)
    val byId = f.map(x => x.media_id -> x.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect()
    f2.foreach(x => x.feature.toSeq shouldBe byId(x.media_id))
    // not all identical (hash actually varies with content)
    f.map(_.feature.toSeq).distinct.length should be > 1
  }

  test("resizeMeta caps the long side, preserves small items") {
    val r = Multimodal.resizeMeta(media, maxSide = 256).collect()
    val orig = media.collect().map(m => m.media_id -> m).toMap
    r.foreach { m =>
      assert(math.max(m.width, m.height) <= 256)
      val o = orig(m.media_id)
      if (math.max(o.width, o.height) <= 256) {
        m.width shouldBe o.width; m.height shouldBe o.height
      }
    }
  }

  test("sampleFrames: only videos, <= n frames, in-range timestamps") {
    val frames = Multimodal.sampleFrames(media, n = 8).collect()
    val vids = media.filter(_.kind == "video").collect()
      .map(m => m.media_id -> m).toMap
    frames.groupBy(_.media_id).foreach { case (id, fs) =>
      assert(vids.contains(id), s"frames for non-video $id")
      assert(fs.length <= 8 && fs.nonEmpty)
      fs.foreach { fr =>
        assert(fr.frame_ms >= 0 && fr.frame_ms < vids(id).duration_ms)
        assert(fr.frame_bytes.nonEmpty)
      }
    }
    frames.map(_.media_id).distinct.length shouldBe vids.size
  }

  test("features compose with ANN: k neighbors per query id") {
    val feats = Multimodal.extractFeatures(media).toDF()
      .withColumnRenamed("feature", "embedding")
    val res = Ann.bruteForceTopK(feats,
      feats.filter(col("media_id") % 100 === 0), "media_id", "embedding", 3)
    res.groupBy("query_id").count().collect().foreach(_.getLong(1) shouldBe 3L)
  }
}
