package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for the training-data
  * pipeline: media is an opaque `binary` payload plus a typed metadata
  * struct; per-item compute (decode, feature-extract, resize, frame-sample)
  * runs as batched per-partition kernels over a typed `Dataset` —
  * `mapPartitions` with case-class Encoders, the JVM analogue of a
  * vectorized batch UDF: one iterator per partition, no per-row lambda
  * dispatch into the planner, and partition size (not row count) bounds
  * executor memory.
  *
  * ==STUBBED DECODERS==
  * This container has no image/audio codecs, so `FakeCodec` stands in for
  * the real decode step: it derives deterministic "content" from the bytes
  * (seeded by a rolling hash). The Spark-side plumbing — schema, encoder
  * shapes, partitioning, batch iteration — is real and tested; swapping in
  * a real codec changes only the marked function bodies.
  *
  * Scale notes: payloads never participate in a shuffle key; anything
  * grouped/joined first projects to (id, meta/features). Feature vectors
  * feed directly into [[Ann]] / [[Dedup.embeddingCosinePairs]].
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata. */
  final case class Media(media_id: Long, kind: String, bytes: Array[Byte],
                         width: Int, height: Int, sample_rate: Int,
                         duration_ms: Long)

  final case class Decoded(media_id: Long, kind: String, n_pixels: Long,
                           mean_intensity: Double)

  final case class Features(media_id: Long, feature: Array[Float])

  final case class Frame(media_id: Long, frame_idx: Long, frame_ms: Long,
                         frame_bytes: Array[Byte])

  // ---------------------------------------------------------------- stubs

  /** Deterministic stand-ins for real codecs (STUB — see class doc). */
  private[operators] object FakeCodec {
    /** FNV-1a 64-bit over the payload: the deterministic "decode seed". */
    def contentHash(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
      }
      h
    }

    /** STUB decode: pretends the payload decodes to width*height pixels
      * whose mean intensity is hash-derived. A real impl would call an
      * image codec here. */
    def decode(m: Media): Decoded = {
      val h = contentHash(m.bytes)
      Decoded(m.media_id, m.kind, m.width.toLong * m.height,
        ((h >>> 8) % 256).toDouble / 255.0)
    }

    /** STUB feature extractor: bytes → dim-d unit-ish float vector seeded
      * by the content hash (a real impl would run a vision/audio model). */
    def features(m: Media, dim: Int): Features = {
      var h = contentHash(m.bytes)
      val v = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        // xorshift64* sequence from the content hash
        h ^= h >>> 12; h ^= h << 25; h ^= h >>> 27
        v(i) = ((h * 0x2545F4914F6CDD1DL) >>> 40).toFloat / (1L << 24) - 0.5f
        i += 1
      }
      Features(m.media_id, v)
    }
  }

  // ------------------------------------------------------------ operators

  /** Bind the untyped frame to the typed media schema. */
  def asMedia(df: DataFrame)(implicit spark: SparkSession): Dataset[Media] = {
    import spark.implicits._
    df.as[Media]
  }

  /** Batched decode over partitions (STUB body, real plumbing). */
  def decode(media: Dataset[Media])(implicit spark: SparkSession): Dataset[Decoded] = {
    import spark.implicits._
    media.mapPartitions(_.map(FakeCodec.decode))
  }

  /** Batched feature extraction; output feeds Ann/Dedup embedding ops. */
  def extractFeatures(media: Dataset[Media], dim: Int = 64)
                     (implicit spark: SparkSession): Dataset[Features] = {
    import spark.implicits._
    media.mapPartitions(_.map(FakeCodec.features(_, dim)))
  }

  /** Metadata-level resize: rescales dimensions, payload untouched (a real
    * impl would re-encode in the same mapPartitions pass). */
  def resizeMeta(media: Dataset[Media], maxSide: Int)
                (implicit spark: SparkSession): Dataset[Media] = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val side = math.max(m.width, m.height)
      if (side <= maxSide || side == 0) m
      else {
        val scale = maxSide.toDouble / side
        m.copy(width = math.max(1, (m.width * scale).toInt),
          height = math.max(1, (m.height * scale).toInt))
      }
    })
  }

  /** Sample up to `n` evenly-spaced frames per video (explode: 1 → n rows).
    * Frame timestamps are pure arithmetic on duration; frame payloads are
    * STUB slices of the source bytes. */
  def sampleFrames(media: Dataset[Media], n: Int)
                  (implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val k = math.min(n.toLong, math.max(1L, m.duration_ms / 1000L))
      (0L until k).map { i =>
        val ms = if (k == 1) 0L else i * m.duration_ms / k
        val sliceLen = math.max(1, m.bytes.length / k.toInt)
        // clamp so every frame carries >= 1 byte even when the payload is
        // shorter than k (late frames would otherwise get empty slices)
        val from = math.min(math.max(0, m.bytes.length - 1), i.toInt * sliceLen)
        val until = math.max(from + 1, math.min(m.bytes.length, from + sliceLen))
        Frame(m.media_id, i, ms, java.util.Arrays.copyOfRange(m.bytes, from, until))
      }
    }
  }

  // ------------------------------------------------- synthetic media table

  /** Deterministic media table derived from the documents table (the
    * harness ships no real media): payload = UTF-8 bytes of the text,
    * kind/dimensions are arithmetic on doc_id — reproducible in SQL, so
    * metadata-level queries stay oracle-checkable. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (col("doc_id") % 640 + 16).cast("int").as("width"),
      (col("doc_id") % 480 + 16).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, lit(16000)).otherwise(lit(0))
        .cast("int").as("sample_rate"),
      (col("doc_id") % 30000 + 1000).as("duration_ms"))
}
