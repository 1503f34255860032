package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Ann, Multimodal}

/** Multimodal queries (operators.Multimodal). The media table is derived
  * deterministically from documents (payload = UTF-8 text bytes, metadata
  * arithmetic on doc_id), so metadata-level ops are replayed exactly in
  * DuckDB via the same CTE. Ops whose output depends on the stubbed codec
  * (decode, features) are rows-only, with determinism asserted in
  * ScalaTest.
  */
object MultimodalQueries extends Registry {

  private def media(s: org.apache.spark.sql.SparkSession, d: String) =
    Multimodal.mediaFromDocuments(Tables.documents(s, d))

  val defs: Map[String, QueryFn] = Map(
    "media_stats" -> ((s, d) =>
      media(s, d).groupBy("kind")
        .agg(count(lit(1)).as("n"),
          sum(length(col("bytes"))).as("total_bytes"),
          sum(col("width").cast("long")).as("sum_w"),
          sum(col("height").cast("long")).as("sum_h"))
        .orderBy("kind")),

    "media_resize_meta" -> ((s, d) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      Multimodal.resizeMeta(Multimodal.asMedia(media(s, d)), maxSide = 256)
        .toDF().select("media_id", "width", "height")
        .orderBy("media_id")
    }),

    "media_frame_sample" -> ((s, d) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      Multimodal.sampleFrames(Multimodal.asMedia(media(s, d)), n = 8)
        .toDF().select("media_id", "frame_idx", "frame_ms")
        .orderBy("media_id", "frame_idx")
    }),

    "media_decode_stats" -> ((s, d) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      Multimodal.decode(Multimodal.asMedia(media(s, d)))
        .toDF().select(col("media_id"), col("kind"), col("n_pixels"),
          round(col("mean_intensity"), 4).as("mean_intensity"))
        .orderBy("media_id")
    }),

    "media_features_knn" -> ((s, d) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      val feats = Multimodal.extractFeatures(Multimodal.asMedia(media(s, d)))
        .toDF().withColumnRenamed("feature", "embedding")
      Ann.bruteForceTopK(feats,
        feats.filter(col("media_id") % 100 === 0), "media_id", "embedding", 3)
    }),

    // Training-shard manifest for the media corpus: content-hash shard
    // assignment (Corpus.shardExpr) audited per (kind, shard) — item
    // count, payload bytes, total duration. The export step a
    // multimodal training job reads to schedule shard fetches; at 100 TB
    // payloads contribute only their octet length to the rollup (the
    // binary column itself never joins or shuffles by key). Oracle
    // replays the md5 shard arithmetic exactly.
    "media_shard_manifest" -> ((s, d) =>
      media(s, d)
        .withColumn("shard",
          graft.operators.Corpus.shardExpr(col("media_id"), 8))
        .groupBy("kind", "shard")
        .agg(count(lit(1)).as("n_items"),
          sum(length(col("bytes"))).cast("long").as("total_bytes"),
          sum("duration_ms").as("total_ms"))
        .orderBy("kind", "shard")),

    // Perceptual near-dup detection across modalities: the image/audio
    // dedup pass — feature-space cosine pairs over the extracted media
    // features via LSH buckets (Ann.cosinePairsLsh), the scale path: at
    // 100 TB you never run exact all-pairs over media features. Emitted
    // sims are true cosines (subset of the exact relation), and
    // byte-identical payloads produce identical stub features that land
    // in the same bucket of every table — exact duplicates are never
    // missed, which MultimodalSpec pins. Rows-only (stub codec); the
    // composition shows the dedup and multimodal families interlock.
    "media_near_dup" -> ((s, d) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      val feats = Multimodal.extractFeatures(Multimodal.asMedia(media(s, d)))
        .toDF().withColumnRenamed("feature", "embedding")
      // bits scale with the corpus (targetBucket 16: at a 0.95 cosine
      // threshold per-plane agreement is ~0.9, so even 12+ bits keep
      // per-pair recall >= 0.99 over 16 tables) — bucket work stays
      // constant as the table grows; the count is a metadata read
      graft.operators.Ann.cosinePairsLsh(
        feats, "media_id", "embedding", threshold = 0.95,
        bits = graft.operators.Ann.autoBits(media(s, d).count(),
          targetBucket = 16))
    }),
  )

  /** DuckDB replay of mediaFromDocuments (metadata columns only). */
  private val mediaCte =
    """media AS (
         SELECT doc_id AS media_id,
                (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
                encode(text) AS bytes,
                CAST(doc_id % 640 + 16 AS INT) AS width,
                CAST(doc_id % 480 + 16 AS INT) AS height,
                doc_id % 30000 + 1000 AS duration_ms
         FROM documents)"""

  val oracles: Map[String, String] = Map(
    "media_stats" ->
      s"""WITH $mediaCte
          SELECT kind, count(*) AS n,
                 CAST(sum(octet_length(bytes)) AS BIGINT) AS total_bytes,
                 CAST(sum(width::BIGINT) AS BIGINT) AS sum_w,
                 CAST(sum(height::BIGINT) AS BIGINT) AS sum_h
          FROM media GROUP BY kind ORDER BY kind""",

    "media_resize_meta" ->
      s"""WITH $mediaCte
          SELECT media_id,
                 CASE WHEN greatest(width, height) <= 256 THEN width
                      ELSE greatest(1, CAST(floor(width *
                        (256.0 / greatest(width, height))) AS INT)) END AS width,
                 CASE WHEN greatest(width, height) <= 256 THEN height
                      ELSE greatest(1, CAST(floor(height *
                        (256.0 / greatest(width, height))) AS INT)) END AS height
          FROM media ORDER BY media_id""",

    "media_frame_sample" ->
      s"""WITH $mediaCte,
          v AS (SELECT media_id, duration_ms,
                       least(8, greatest(1, duration_ms // 1000)) AS k
                FROM media WHERE kind = 'video'),
          f AS (SELECT media_id, duration_ms, k, unnest(range(0, k)) AS i FROM v)
          SELECT media_id, i AS frame_idx, i * duration_ms // k AS frame_ms
          FROM f ORDER BY media_id, frame_idx""",

    "media_shard_manifest" ->
      s"""WITH $mediaCte
          SELECT kind,
                 CAST(('0x' || substring(md5(media_id::VARCHAR || 'graft'),
                                         1, 4))::BIGINT % 8 AS INT) AS shard,
                 count(*) AS n_items,
                 CAST(sum(octet_length(bytes)) AS BIGINT) AS total_bytes,
                 CAST(sum(duration_ms) AS BIGINT) AS total_ms
          FROM media GROUP BY 1, 2 ORDER BY 1, 2""",

    // media_decode_stats / media_features_knn / media_near_dup:
    // stub-codec-derived — rows only; determinism, shape, and the
    // LSH-subset property asserted in MultimodalSpec.
  )
}
