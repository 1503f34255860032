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
  * ==Codecs==
  * Image and audio payloads are REAL containers decoded by the real
  * pure-JVM parsers in [[MediaCodec]] (binary PGM; RIFF/WAVE PCM16 mono):
  * the decoder trusts only the bytes — header dims, chunk walk — so a
  * parse bug changes the emitted statistics and fails the DuckDB oracle.
  * Video has no dependency-free pure-JVM codec, so video payloads stay
  * opaque byte blobs: `decode` emits the byte length with a -1 sentinel
  * for the content stats (the dead-letter row a real pipeline would
  * route to a codec-equipped stage), and `extractFeatures` falls back to
  * a raw-byte histogram — which is also what a dedup pass genuinely does
  * with undecodable blobs (byte-level identity still holds).
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

  /** Decoded content statistics. `n_units` = pixels (image), samples
    * (audio), or raw bytes (video — no codec, sum/mean are -1).
    * `sum_units` sums pixel values 0..255 / offset samples 0..4095;
    * `mean_mu` is the mean unit in integer micro-units (floor). */
  final case class Decoded(media_id: Long, kind: String, n_units: Long,
                           sum_units: Long, mean_mu: Long)

  final case class Features(media_id: Long, feature: Array[Float])

  final case class Frame(media_id: Long, frame_idx: Long, frame_ms: Long,
                         frame_bytes: Array[Byte])

  /** Per-frame content statistics from a REAL multi-frame decode. */
  final case class FrameStats(media_id: Long, frame_idx: Long, width: Int,
                              height: Int, n_pix: Long, sum_pix: Long,
                              mean_mu: Long)

  /** Per-window audio features from a REAL PCM decode: integer signal
    * energy (sum of squared signed samples) and zero-crossing count. */
  final case class AudioWindow(media_id: Long, win_idx: Long, n_samp: Long,
                               energy: Long, crossings: Long)

  /** Per-channel content statistics from a REAL color decode: channel
    * sums over the raster and integer micro-unit channel means. */
  final case class ColorStats(media_id: Long, width: Int, height: Int,
                              n_pix: Long, sum_r: Long, sum_g: Long,
                              sum_b: Long, mean_r_mu: Long, mean_g_mu: Long,
                              mean_b_mu: Long)

  /** One-pass content profile: decode stats + content fingerprint from
    * a single parse of the payload (see [[contentProfile]]). */
  final case class ContentProfile(media_id: Long, kind: String,
                                  content_fp: String, n_units: Long,
                                  sum_units: Long, mean_mu: Long)

  /** Adjacent-frame difference from a REAL multi-frame decode:
    * `abs_diff` = Σ|p_j(i) − p_{j−1}(i)| over the raster, `diff_mu` the
    * per-pixel mean in integer micro-units, `is_cut` the thresholded
    * scene-cut verdict (cross-multiplied, no division rounding). */
  final case class FrameDiff(media_id: Long, frame_idx: Long, n_pix: Long,
                             abs_diff: Long, diff_mu: Long, is_cut: Int)

  /** Internal generator row (public: Spark's generated projections need
    * constructor access to Encoder target classes). */
  final case class GenMeta(media_id: Long, kind: String,
                           text: String, width: Int, height: Int,
                           sample_rate: Int, duration_ms: Long)

  // -------------------------------------------------------- unit decoding

  /** Decode a payload to its content "units": pixel values (image),
    * offset samples 0..4095 (audio), or null for kinds with no codec.
    * Shared by [[decode]] and [[extractFeatures]] so stats and features
    * can never disagree about what the bytes contain. */
  private def decodeUnits(m: Media): Array[Int] = m.kind match {
    case "image" =>
      // container-sniffing decode: PGM via the byte-arithmetic parser,
      // PNG/JPEG via the JDK ImageIO readers — same strict seam
      val (w, h, pix) = MediaCodec.decodeImage(m.bytes)
      val units = new Array[Int](w * h)
      var i = 0
      while (i < units.length) { units(i) = pix(i) & 0xff; i += 1 }
      units
    case "audio" =>
      val (_, smp) = MediaCodec.decodeWavPcm16(m.bytes)
      val units = new Array[Int](smp.length)
      var i = 0
      // offset to unsigned 0..4095 (synthetic samples span -2048..2047)
      // so downstream sums/means stay non-negative — integer division
      // then floors identically in Spark and DuckDB
      while (i < units.length) { units(i) = smp(i) + 2048; i += 1 }
      units
    case _ => null
  }

  // ------------------------------------------------------------ operators

  /** Bind the untyped frame to the typed media schema. */
  def asMedia(df: DataFrame)(implicit spark: SparkSession): Dataset[Media] = {
    import spark.implicits._
    df.as[Media]
  }

  /** Batched REAL decode over partitions: parse the container from its
    * bytes and aggregate content stats. Malformed image/audio payloads
    * throw ([[MediaFormatException]]) — decode is a correctness gate;
    * route known-undecodable kinds (video here) to the sentinel row
    * instead. */
  def decode(media: Dataset[Media])(implicit spark: SparkSession): Dataset[Decoded] = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val units = decodeUnits(m)
      if (units == null)
        Decoded(m.media_id, m.kind, m.bytes.length.toLong, -1L, -1L)
      else {
        var sum = 0L
        var i = 0
        while (i < units.length) { sum += units(i); i += 1 }
        Decoded(m.media_id, m.kind, units.length.toLong, sum,
          sum * 1000000L / units.length)
      }
    })
  }

  /** Batched feature extraction: a `dim`-sample DOWNSAMPLED, DC-removed
    * content profile over the DECODED units — resample the signal to
    * `dim` slices (slice of unit i is `i·dim/n`) and remove the mean,
    * the classic perceptual-fingerprint recipe (pHash-style "shrink,
    * then drop the DC term"): identical content yields identical
    * features regardless of container framing, while near-uniform but
    * differently-phased content decorrelates (a plain histogram would
    * call ALL smooth signals alike). Everything is integer arithmetic —
    * c[j] = dim·(sum of units in slice j) − (total unit sum) — with
    * magnitudes < 2^24, so the Float components are exact and the
    * DuckDB oracle replays them from the generation formulas.
    * Payloads that do not parse (and kinds with no codec) profile the
    * raw bytes instead, so dedup over features still sees
    * byte-identical blobs as identical. Output feeds Ann/Dedup
    * embedding ops. */
  def extractFeatures(media: Dataset[Media], dim: Int = 64)
                     (implicit spark: SparkSession): Dataset[Features] = {
    require(dim > 0, s"dim $dim must be positive")
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val decoded =
        try decodeUnits(m)
        catch { case _: MediaFormatException => null }
      val units =
        if (decoded != null) decoded
        else {
          val raw = new Array[Int](m.bytes.length)
          var i = 0
          while (i < raw.length) { raw(i) = m.bytes(i) & 0xff; i += 1 }
          raw
        }
      val n = units.length
      val slice = new Array[Long](dim)
      var total = 0L
      var i = 0
      while (i < n) {
        slice((i.toLong * dim / n).toInt) += units(i)
        total += units(i)
        i += 1
      }
      val v = new Array[Float](dim)
      var j = 0
      while (j < dim) {
        v(j) = (dim.toLong * slice(j) - total).toFloat
        j += 1
      }
      Features(m.media_id, v)
    })
  }

  /** Content-identity fingerprint: md5 over the DECODED content (dims +
    * pixel/sample units), not the container bytes — the same raster
    * stored as a PGM master and its PNG export fingerprints EQUAL, so
    * exact dedup survives lossless container migration/re-encoding.
    * Raw-byte fingerprints (the [[Dedup]] text path) would call those
    * distinct. Kinds with no codec fall back to the raw payload bytes
    * (byte-identity still dedups). Only the 16-byte digest leaves the
    * kernel — downstream grouping shuffles digests, never payloads. */
  def contentFingerprint(media: Dataset[Media])
                        (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val (fp, _, _, _) = digestAndStats(m)
      (m.media_id, m.kind, fp)
    }).toDF("media_id", "kind", "content_fp")
  }

  /** One decode pass producing the content digest AND the content stats
    * — the single definition of content identity shared by
    * [[contentFingerprint]] and [[contentProfile]], so the two
    * operators cannot drift. Returns (fp, n_units, sum_units) with
    * sum = -1 for kinds with no codec. The payload streams straight
    * into the digest — no per-row decimal String materialization (a
    * megapixel image would otherwise allocate MBs of transient garbage
    * to feed a 16-byte MD5); the stat accumulation rides the same pass
    * at the cost of one integer add per unit. */
  /** Returns (digest, n_units, sum_units, hasCodec). `hasCodec` is the
    * explicit "a decoder ran" flag: the old `sum < 0` convention would
    * misread a real audio payload whose mean sample sits below -2048
    * (total Σ(s+2048) < 0) as "no codec", silently zapping its mean —
    * a boolean cannot collide with any legal sum. */
  private def digestAndStats(m: Media): (String, Long, Long, Boolean) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def i32(v: Int): Unit = {
      md.update((v >> 24).toByte); md.update((v >> 16).toByte)
      md.update((v >> 8).toByte); md.update(v.toByte)
    }
    var n = 0L
    var sum = -1L
    var hasCodec = true
    m.kind match {
      case "image" =>
        val (w, h, pix) = MediaCodec.decodeImage(m.bytes)
        md.update('I'.toByte); i32(w); i32(h); md.update(pix)
        n = pix.length.toLong
        sum = 0L
        var i = 0
        while (i < pix.length) { sum += (pix(i) & 0xff); i += 1 }
      case "audio" =>
        val (rate, smp) = MediaCodec.decodeWavPcm16(m.bytes)
        md.update('A'.toByte); i32(rate); i32(smp.length)
        // stream the samples into the digest through a fixed chunk —
        // a whole-array ByteBuffer would allocate a second full copy
        // of the payload per row; byte order is big-endian per sample,
        // bit-identical to the historical ByteBuffer.putShort layout
        val chunk = new Array[Byte](8192)
        sum = 0L
        var i = 0
        var c = 0
        while (i < smp.length) {
          val s = smp(i)
          chunk(c) = (s >> 8).toByte
          chunk(c + 1) = s.toByte
          c += 2
          if (c == chunk.length) { md.update(chunk, 0, c); c = 0 }
          // offset to 0..4095 exactly as decodeUnits does
          sum += s + 2048
          i += 1
        }
        if (c > 0) md.update(chunk, 0, c)
        n = smp.length.toLong
      case _ =>
        md.update(m.bytes)
        n = m.bytes.length.toLong
        hasCodec = false
    }
    (md.digest().map("%02x".format(_)).mkString, n, sum, hasCodec)
  }

  /** CONTENT resize for image payloads: decode the container
    * ([[MediaCodec.decodeImage]] — PGM/PNG/JPEG), nearest-neighbor
    * resample so the long side is <= `maxSide`, and re-encode in the
    * SAME container the payload arrived in. All index math is integer
    * floor division (src = dst·srcDim/dstDim), so the resampled raster
    * is deterministic and — for the lossless containers — replayable
    * closed-form by the DuckDB oracle. Non-image rows and already-small
    * images pass through untouched. The real thumbnailing kernel of a
    * multimodal ingest pipeline: payload bytes stay inside the
    * partition-batched kernel, never in a shuffle key. */
  def resizeContent(media: Dataset[Media], maxSide: Int)
                   (implicit spark: SparkSession): Dataset[Media] = {
    require(maxSide > 0, s"maxSide $maxSide must be positive")
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      if (m.kind != "image") m
      else {
        val (w, h, pix) = MediaCodec.decodeImage(m.bytes)
        val side = math.max(w, h)
        // pass-through rows still get the DECODED dims stamped: every
        // row this operator emits reports what its bytes actually say,
        // never a (possibly inflated) upstream metadata claim — so a
        // consumer checking width <= maxSide sees the truth either way
        if (side <= maxSide) m.copy(width = w, height = h)
        else {
          val ow = math.max(1, w * maxSide / side)
          val oh = math.max(1, h * maxSide / side)
          val out = new Array[Byte](ow * oh)
          var y = 0
          var i = 0
          while (y < oh) {
            val sy = y * h / oh
            var x = 0
            while (x < ow) {
              out(i) = pix(sy * w + x * w / ow)
              i += 1
              x += 1
            }
            y += 1
          }
          val bytes = MediaCodec.sniffImageFormat(m.bytes) match {
            case "png" => MediaCodec.encodePng(ow, oh, out)
            case "jpeg" => MediaCodec.encodeJpeg(ow, oh, out)
            case _ => MediaCodec.encodePgm(ow, oh, out)
          }
          m.copy(bytes = bytes, width = ow, height = oh)
        }
      }
    })
  }

  /** Metadata-level resize: rescales dimensions, payload untouched (the
    * content form above re-encodes; this one is the cheap planning pass
    * a pipeline runs to SIZE the real resize). */
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
    * byte slices of the (opaque — no video codec) source payload. */
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

  /** CONTENT frame sampling over a REAL multi-frame container: decode
    * the P5 stream ([[MediaCodec.decodePgmStream]] — per-frame header +
    * raster walk), take up to `n` evenly-spaced frames by stream
    * position (`p_j = j·f/k`, the same floor spacing [[sampleFrames]]
    * uses on timestamps), and aggregate each sampled frame's pixel
    * stats. This is [[sampleFrames]]'s metadata arithmetic made real:
    * the frame boundaries come from parsed headers, so an off-by-one in
    * the stream walk shifts every downstream stat and fails the oracle.
    * Non-video rows are filtered; a video payload that is not a P5
    * stream throws [[MediaFormatException]] — an undecodable frame
    * source is a data bug, not a shrug. */
  def sampleFramesContent(media: Dataset[Media], n: Int)
                         (implicit spark: SparkSession): Dataset[FrameStats] = {
    require(n > 0, s"n $n must be positive")
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions(_.flatMap { m =>
      val frames = MediaCodec.decodePgmStream(m.bytes)
      val f = frames.length
      val k = math.min(n, f)
      (0 until k).map { j =>
        val p = j * f / k
        val (w, h, pix) = frames(p)
        var sum = 0L
        var i = 0
        while (i < pix.length) { sum += pix(i) & 0xff; i += 1 }
        FrameStats(m.media_id, p.toLong, w, h, pix.length.toLong, sum,
          sum * 1000000L / pix.length)
      }
    })
  }

  /** Windowed audio feature extraction over the REAL PCM decode: frame
    * the signed sample stream into fixed `win`-sample windows
    * (`win_idx = i / win`, tail window partial) and emit per window the
    * integer signal energy (sum of squared samples — exact in Long:
    * 2048² per sample) and the zero-crossing count (sign flips between
    * ADJACENT samples within the window; the boundary pair belongs to
    * neither window, so windows are independently recomputable). The
    * classic cheap audio featurization (energy ≈ loudness, crossings ≈
    * dominant frequency) with every value integer-exact, so the DuckDB
    * oracle replays it from the generation formulas. Non-audio rows are
    * filtered; a malformed WAV throws [[MediaFormatException]]. */
  def audioFeatures(media: Dataset[Media], win: Int = 256)
                   (implicit spark: SparkSession): Dataset[AudioWindow] = {
    require(win > 0, s"win $win must be positive")
    import spark.implicits._
    media.filter(_.kind == "audio").mapPartitions(_.flatMap { m =>
      val (_, smp) = MediaCodec.decodeWavPcm16(m.bytes)
      val out = Seq.newBuilder[AudioWindow]
      var start = 0
      while (start < smp.length) {
        val end = math.min(start + win, smp.length)
        var energy = 0L
        var crossings = 0L
        var i = start
        while (i < end) {
          val s = smp(i).toLong
          energy += s * s
          if (i > start && ((smp(i) >= 0) != (smp(i - 1) >= 0))) crossings += 1
          i += 1
        }
        out += AudioWindow(m.media_id, (start / win).toLong,
          (end - start).toLong, energy, crossings)
        start = end
      }
      out.result()
    })
  }

  /** One-decode-pass content profile: stats AND fingerprint from a
    * single parse. The media-prep pipeline needs both a quality gate
    * (stats) and a dedup key (fingerprint); running [[decode]] then
    * [[contentFingerprint]] would decode every payload twice and —
    * worse — force a payload-carrying join to line the two up. This
    * kernel emits `(id, kind, content_fp, n_units, sum_units, mean_mu)`
    * in one partition-local pass, after which the pipeline is pure
    * column algebra: the binary column never appears downstream.
    * Digest and stats both come from [[digestAndStats]] — the single
    * definition of content identity [[contentFingerprint]] also uses,
    * so the two operators cannot disagree. */
  def contentProfile(media: Dataset[Media])
                    (implicit spark: SparkSession): Dataset[ContentProfile] = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val (fp, n, sum, hasCodec) = digestAndStats(m)
      // mean_mu is computed whenever a codec ran — matching decode()'s
      // unconditional sum*1e6/n — and -1 marks ONLY the no-codec case
      ContentProfile(m.media_id, m.kind, fp, n, sum,
        if (hasCodec && n > 0) sum * 1000000L / n else -1L)
    })
  }

  /** Decode-parity audit row: `n_units` from the decoded bytes,
    * `luma_match` = 1 iff the pipeline GRAY decode reproduced the
    * independent reference read pixel-for-pixel, `rgb_match` = 1 iff
    * the pipeline COLOR decode matched its reference AND its per-pixel
    * 601 luma agrees with the gray path (the two pipeline decodes of
    * one payload cannot drift apart). */
  final case class DecodeAudit(media_id: Long, n_units: Long,
                               luma_match: Int, rgb_match: Int)

  /** JDK-independent decode audit for the LOSSY image containers: lossy
    * DCT output has no closed-form SQL replay, so instead of pinning
    * one JDK's decoded sums as oracle literals (which drift on any
    * other JDK), audit the PIPELINE decode path
    * ([[MediaCodec.decodeImage]]: sniff → ImageIO → bulk-row luma)
    * against an INDEPENDENT reference read of the same payload — a raw
    * `ImageIO.read` plus its own per-pixel 601 luma loop, deliberately
    * sharing no code with the seam under test. A bug anywhere in the
    * pipeline path (sniffing, stream handling, row stride, the luma
    * arithmetic) breaks pixel parity and fails the hash; on a different
    * JDK both sides decode through that JDK's DCT and still agree, so
    * the oracle (`n_units` closed-form, `luma_match` = 1) holds on ANY
    * JDK. Covers every image row at every SF — strictly wider than the
    * fixture-literal oracle it replaces. */
  def decodeParityAudit(media: Dataset[Media])
                       (implicit spark: SparkSession): Dataset[DecodeAudit] = {
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions(_.map { m =>
      val (w, h, pix) = MediaCodec.decodeImage(m.bytes)
      val (wc, hc, rgb) = MediaCodec.decodeImageRgb(m.bytes)
      // reference read: raw JDK ImageIO + independent per-pixel loops
      // (deliberately slow and trivially correct; this is an audit,
      // not the hot path)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.bytes))
      if (img == null)
        throw new MediaFormatException(
          s"media ${m.media_id}: reference reader rejected payload")
      // single-band rasters MUST be read as raw samples: getRGB runs
      // the CS_GRAY→sRGB colorspace conversion (not identity), so the
      // reference uses per-pixel Raster.getSample — a different API
      // path than the pipeline's bulk fetches
      val gray = img.getColorModel.getNumComponents == 1
      val raster = img.getRaster
      var lumaOk = img.getWidth == w && img.getHeight == h
      var rgbOk = wc == w && hc == h
      if (lumaOk && rgbOk) {
        var y = 0
        var i = 0
        while ((lumaOk || rgbOk) && y < h) {
          var x = 0
          while ((lumaOk || rgbOk) && x < w) {
            val refRgb =
              if (gray) {
                val g = raster.getSample(x, y, 0) & 0xff
                (g << 16) | (g << 8) | g
              } else img.getRGB(x, y) & 0xffffff
            val refLum =
              if (gray) refRgb & 0xff
              else (299 * ((refRgb >> 16) & 0xff)
                + 587 * ((refRgb >> 8) & 0xff)
                + 114 * (refRgb & 0xff) + 500) / 1000
            if (lumaOk) lumaOk = (pix(i) & 0xff) == refLum
            if (rgbOk) {
              val p = rgb(i)
              // reference parity AND cross-path consistency: the gray
              // pipeline value must be the 601 luma of the color
              // pipeline value for the SAME pixel
              rgbOk = p == refRgb &&
                (pix(i) & 0xff) == (299 * ((p >> 16) & 0xff)
                  + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff) + 500) / 1000
            }
            i += 1
            x += 1
          }
          y += 1
        }
      }
      DecodeAudit(m.media_id, w.toLong * h, if (lumaOk) 1 else 0,
        if (rgbOk) 1 else 0)
    })
  }

  /** Per-channel (RGB) content stats over the image rows — the
    * color-aware decode gate a real image corpus needs (channel
    * imbalance screens, tint detection, per-channel normalization
    * constants). Decodes through [[MediaCodec.decodeImageRgb]]: PNG/JPEG
    * surface the channels the container actually carries, PGM replicates
    * its gray value (gray g IS rgb(g,g,g)), so one operator covers a
    * mixed-container corpus. All sums are integer-exact; means are
    * integer micro-units (floor), so a lossless container's stats replay
    * closed-form in the DuckDB oracle. Non-image rows are excluded by
    * definition — channels of a WAV are not a thing this operator should
    * invent. */
  def colorStats(media: Dataset[Media])
                (implicit spark: SparkSession): Dataset[ColorStats] = {
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions(_.map { m =>
      val (w, h, rgb) = MediaCodec.decodeImageRgb(m.bytes)
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < rgb.length) {
        val p = rgb(i)
        sr += (p >> 16) & 0xff
        sg += (p >> 8) & 0xff
        sb += p & 0xff
        i += 1
      }
      val n = rgb.length.toLong
      ColorStats(m.media_id, w, h, n, sr, sg, sb,
        sr * 1000000L / n, sg * 1000000L / n, sb * 1000000L / n)
    })
  }

  /** Temporal frame-difference analysis — the scene-cut primitive — over
    * the REAL multi-frame decode: for every adjacent frame pair (j−1, j)
    * emit the total absolute pixel difference and a thresholded cut
    * verdict (`diff_mu ≥ cutMu`, decided by cross-multiplication
    * `abs_diff·10⁶ ≥ cutMu·n_pix` so no division rounding is in the
    * decision path). All arithmetic is integer-exact, so the DuckDB
    * oracle replays the diffs from the generation formulas — a one-byte
    * slip in the stream walk shifts a frame boundary and every diff
    * after it. Adjacent frames with different dimensions fail loudly:
    * a raster-size change mid-stream is a data bug in this corpus, not
    * a resolution switch to paper over. */
  def frameDiffs(media: Dataset[Media], cutMu: Long)
                (implicit spark: SparkSession): Dataset[FrameDiff] = {
    // diff_mu is bounded by 255e6, so any larger threshold means "never
    // cut" — and bounding it keeps the cross-multiplication cutMu·n_pix
    // inside Long for every raster a 2 GiB payload can hold
    require(cutMu >= 0 && cutMu <= 256000000L,
      s"cutMu $cutMu outside [0, 256e6] (diff_mu is bounded by 255e6)")
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions(_.flatMap { m =>
      val frames = MediaCodec.decodePgmStream(m.bytes)
      (1 until frames.length).iterator.map { j =>
        val (w0, h0, p0) = frames(j - 1)
        val (w1, h1, p1) = frames(j)
        if (w0 != w1 || h0 != h1)
          throw new MediaFormatException(
            s"media ${m.media_id}: frame $j dims ${w1}x$h1 differ from " +
              s"${w0}x$h0 — diff undefined across a raster-size change")
        var d = 0L
        var i = 0
        while (i < p0.length) {
          d += math.abs((p1(i) & 0xff) - (p0(i) & 0xff)); i += 1
        }
        val n = p0.length.toLong
        FrameDiff(m.media_id, j.toLong, n, d, d * 1000000L / n,
          if (d * 1000000L >= cutMu * n) 1 else 0)
      }
    })
  }

  // ------------------------------------------------- synthetic media table

  /** Deterministic media table derived from the documents table (the
    * harness ships no real media files): image payloads are REAL binary
    * PGM thumbnails (dims `id%64+16 × id%48+16`, pixels
    * `(id%256 + 7i) mod 256`), audio payloads are REAL 16 kHz PCM16 WAVs
    * (`id%2000+500` samples, sample_i = `(id%256·17 + 13i) mod 4096 −
    * 2048`), video payloads are the UTF-8 text bytes (no codec — opaque
    * blob by design). All generation arithmetic is closed-form on
    * media_id, so the DuckDB oracle can recompute payload lengths AND
    * per-unit content ground truth without parsing a byte — the Scala
    * decode path must round-trip encode→bytes→parse exactly to match.
    * The metadata width/height stay the (larger) claimed dims: decode
    * reports what the BYTES say, which is the point.
    *
    * `imageFormat` picks the image CONTAINER — "pgm" (default), "png",
    * "jpeg", or "png_rgb" — over the SAME closed-form raster ("png_rgb"
    * swaps in a TRUE-COLOR raster: R_i = (s+7i) mod 256 — the gray
    * formula — G_i = (s+11i+3) mod 256, B_i = (s+5i+1) mod 256, still
    * closed-form per channel): PNG is lossless, so
    * its decode stats replay from the identical formulas (the
    * container changes, the ground truth doesn't); JPEG is lossy, so
    * its decoded stats are JDK-decoder outputs, oracle-checked against
    * pre-extracted literals instead.
    *
    * `videoFormat` picks the video payload: "text" (default — opaque
    * UTF-8 blob, the historical shape every byte-level oracle replays)
    * or "pgmstream" — a REAL multi-frame netpbm P5 stream
    * (`id%12+2` frames of `id%32+8 × id%24+8`, frame j pixel i =
    * `(id%256 + 31j + 7i) mod 256`), closed-form like everything else,
    * so content frame sampling is oracle-checkable end to end. */
  def mediaFromDocuments(docs: DataFrame,
                         imageFormat: String = "pgm",
                         videoFormat: String = "text"): DataFrame = {
    require(Set("pgm", "png", "jpeg", "png_rgb", "jpeg_rgb")
      .contains(imageFormat), s"unsupported imageFormat $imageFormat")
    require(Set("text", "pgmstream").contains(videoFormat),
      s"unsupported videoFormat $videoFormat")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text"),
      (col("doc_id") % 640 + 16).cast("int").as("width"),
      (col("doc_id") % 480 + 16).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, lit(16000)).otherwise(lit(0))
        .cast("int").as("sample_rate"),
      (col("doc_id") % 30000 + 1000).as("duration_ms"))
      .as[GenMeta]
      .mapPartitions(_.map { g =>
        val bytes = g.kind match {
          case "image" =>
            val pw = (g.media_id % 64 + 16).toInt
            val ph = (g.media_id % 48 + 16).toInt
            val seed = (g.media_id % 256).toInt
            val pix = new Array[Byte](pw * ph)
            var i = 0
            while (i < pix.length) {
              pix(i) = ((seed + 7 * i) % 256).toByte; i += 1
            }
            imageFormat match {
              case "png" => MediaCodec.encodePng(pw, ph, pix)
              case "jpeg" => MediaCodec.encodeJpeg(pw, ph, pix)
              case "png_rgb" | "jpeg_rgb" =>
                // TRUE-COLOR payloads: R keeps the gray formula, G and B
                // get their own closed-form ramps — genuinely distinct
                // per channel (a tinted corpus, not gray replicated
                // three times). PNG true-color replays per unit in SQL;
                // color JPEG is lossy, checked by the parity audit.
                val rgb = new Array[Int](pw * ph)
                var j = 0
                while (j < rgb.length) {
                  val r = (seed + 7 * j) % 256
                  val gc = (seed + 11 * j + 3) % 256
                  val b = (seed + 5 * j + 1) % 256
                  rgb(j) = (r << 16) | (gc << 8) | b
                  j += 1
                }
                if (imageFormat == "jpeg_rgb")
                  MediaCodec.encodeJpegRgb(pw, ph, rgb)
                else MediaCodec.encodePngRgb(pw, ph, rgb)
              case _ => MediaCodec.encodePgm(pw, ph, pix)
            }
          case "audio" =>
            val n = (g.media_id % 2000 + 500).toInt
            val t = (g.media_id % 256).toInt * 17
            val smp = new Array[Short](n)
            var i = 0
            while (i < n) {
              smp(i) = (((t + 13 * i) % 4096) - 2048).toShort; i += 1
            }
            MediaCodec.encodeWavPcm16(g.sample_rate, smp)
          case _ if videoFormat == "pgmstream" =>
            val f = (g.media_id % 12 + 2).toInt
            val fw = (g.media_id % 32 + 8).toInt
            val fh = (g.media_id % 24 + 8).toInt
            val seed = (g.media_id % 256).toInt
            MediaCodec.encodePgmStream((0 until f).map { j =>
              val pix = new Array[Byte](fw * fh)
              var i = 0
              while (i < pix.length) {
                pix(i) = ((seed + 31 * j + 7 * i) % 256).toByte; i += 1
              }
              (fw, fh, pix)
            })
          case _ =>
            g.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        Media(g.media_id, g.kind, bytes, g.width, g.height,
          g.sample_rate, g.duration_ms)
      })
      .toDF()
  }
}
