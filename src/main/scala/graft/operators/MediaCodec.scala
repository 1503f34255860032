package graft.operators

/** Raised when a payload does not parse as the claimed container. */
final class MediaFormatException(msg: String) extends RuntimeException(msg)

/** Dependency-free, pure-JVM media codecs. Two container families:
  *
  *  - byte-arithmetic parsers written here from the public specs —
  *    binary PGM (netpbm "P5") for single-channel images and RIFF/WAVE
  *    PCM16 mono for audio (magic, ASCII dims/maxval with '#' comments,
  *    chunk id + little-endian size, word-aligned chunk walk);
  *  - the real-corpus containers PNG and JPEG, decoded by the JDK's own
  *    `javax.imageio` readers (pure JDK, no new dependency) behind the
  *    same strict seam: [[decodeImage]] sniffs the container magic and
  *    routes to the right decoder, and ANYTHING unrecognized or
  *    malformed throws [[MediaFormatException]].
  *
  * These are REAL encoders/decoders — the decoder trusts only the bytes
  * (header dims, chunk walk, entropy-coded scan), never row metadata —
  * so the decode → stats path in [[Multimodal]] is verifiable
  * end-to-end: a parse bug changes the emitted statistics and fails the
  * DuckDB oracle.
  */
object MediaCodec {

  // ImageIO's default InputStream wrapper spools through a temp FILE per
  // image — per-row disk I/O inside an executor mapPartitions kernel.
  // Force the in-memory stream implementation once, JVM-wide.
  javax.imageio.ImageIO.setUseCache(false)

  // ------------------------------------------------------------- PGM (P5)

  /** Encode an 8-bit grayscale raster as binary PGM. */
  def encodePgm(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"raster ${pixels.length} != $width x $height")
    val header = s"P5\n$width $height\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, pixels.length)
    out
  }

  /** Decode binary PGM: returns (width, height, raster). Accepts '#'
    * comments and any whitespace mix in the header; only maxval 255
    * (1 byte/pixel) is supported. Throws [[MediaFormatException]] on
    * anything malformed — decode is a correctness gate, not a guess. */
  def decodePgm(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, pix, next) = parsePgmAt(bytes, 0)
    // the strict-gate contract decodePgmStream enforces applies here
    // too: trailing bytes after the raster mean this is NOT a single
    // image (a mis-kinded multi-frame stream, or appended garbage) —
    // silently decoding frame 0 would emit wrong stats and collapse
    // byte-distinct payloads to one content fingerprint
    if (next != bytes.length)
      throw new MediaFormatException(
        s"PGM: ${bytes.length - next} trailing bytes after the raster " +
          "(multi-image payload? decode it as a stream)")
    (w, h, pix)
  }

  /** Parse one P5 image starting at `start`; returns (w, h, raster,
    * position of the first byte AFTER the raster) — the primitive the
    * multi-image stream decoder walks with. */
  private def parsePgmAt(bytes: Array[Byte],
                         start: Int): (Int, Int, Array[Byte], Int) = {
    def fail(m: String): Nothing = throw new MediaFormatException(s"PGM: $m")
    if (bytes.length < start + 2 || bytes(start) != 'P' ||
        bytes(start + 1) != '5')
      fail(s"missing P5 magic at offset $start")
    var pos = start + 2
    def skipWs(): Unit = {
      var done = false
      while (!done && pos < bytes.length) {
        val b = bytes(pos)
        if (b == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else if (b == ' ' || b == '\n' || b == '\r' || b == '\t') pos += 1
        else done = true
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > (1 << 24)) fail("header dimension out of range")
        pos += 1
        any = true
      }
      if (!any) fail("expected integer in header")
      v
    }
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    if (maxval != 255) fail(s"unsupported maxval $maxval")
    // exactly one whitespace byte separates maxval from raster — and it
    // must BE whitespace: consuming an arbitrary byte here would shift
    // the raster by one and emit wrong pixel stats instead of failing
    if (pos >= bytes.length ||
        !(bytes(pos) == ' ' || bytes(pos) == '\n' ||
          bytes(pos) == '\r' || bytes(pos) == '\t'))
      fail("maxval not followed by a whitespace separator")
    pos += 1
    if (w <= 0 || h <= 0) fail(s"degenerate dims ${w}x$h")
    if (bytes.length - pos < w.toLong * h) fail("truncated raster")
    (w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h),
      pos + w * h)
  }

  // ------------------------------------------- PGM stream (multi-image P5)

  /** Encode a frame sequence as a netpbm P5 STREAM — the public netpbm
    * convention that "a file may contain more than one image"
    * (concatenated rasters, each with its own header). The poor man's
    * video container: real enough that frame extraction must walk real
    * per-frame headers, dependency-free enough to decode anywhere. */
  def encodePgmStream(frames: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
    require(frames.nonEmpty, "a PGM stream needs at least one frame")
    val encoded = frames.map { case (w, h, pix) => encodePgm(w, h, pix) }
    val out = new Array[Byte](encoded.map(_.length).sum)
    var off = 0
    encoded.foreach { e =>
      System.arraycopy(e, 0, out, off, e.length); off += e.length
    }
    out
  }

  /** Decode a P5 stream to its frame sequence: strict header+raster walk
    * per frame until the payload is exhausted. Trailing garbage, a
    * truncated raster, or a malformed header anywhere in the stream
    * throws [[MediaFormatException]] — a frame boundary off by one byte
    * must fail loudly, not resynchronize silently. */
  def decodePgmStream(bytes: Array[Byte]): IndexedSeq[(Int, Int, Array[Byte])] = {
    if (bytes.isEmpty)
      throw new MediaFormatException("PGM stream: empty payload")
    // IndexedSeq: consumers walk adjacent frame pairs positionally — a
    // linked Seq would make that walk quadratic in frame count
    val frames = Vector.newBuilder[(Int, Int, Array[Byte])]
    var pos = 0
    var n = 0
    while (pos < bytes.length) {
      val (w, h, pix, next) = parsePgmAt(bytes, pos)
      frames += ((w, h, pix))
      pos = next
      n += 1
      if (n > (1 << 20))
        throw new MediaFormatException("PGM stream: frame count out of range")
    }
    frames.result()
  }

  // ------------------------------------------- PNG / JPEG (JDK ImageIO)

  /** Sniff the image container from its magic bytes: "pgm" (netpbm P5),
    * "png" (8-byte PNG signature), or "jpeg" (SOI + marker prefix).
    * Throws [[MediaFormatException]] for anything else — an image column
    * holding an unknown container is a data bug, not a shrug. */
  def sniffImageFormat(bytes: Array[Byte]): String = {
    def at(i: Int, v: Int): Boolean =
      i < bytes.length && (bytes(i) & 0xff) == v
    if (at(0, 'P') && at(1, '5')) "pgm"
    else if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G') &&
             at(4, 0x0d) && at(5, 0x0a) && at(6, 0x1a) && at(7, 0x0a)) "png"
    else if (at(0, 0xff) && at(1, 0xd8) && at(2, 0xff)) "jpeg"
    else throw new MediaFormatException(
      s"unrecognized image container (${bytes.length} bytes, " +
        bytes.take(4).map(b => f"${b & 0xff}%02x").mkString(" ") + " …)")
  }

  /** Encode an 8-bit grayscale raster as PNG via the JDK encoder
    * (lossless: [[decodeImage]] round-trips it to the same raster). */
  def encodePng(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"raster ${pixels.length} != $width x $height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, pixels)
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "png", bos))
      throw new MediaFormatException("PNG: no JDK encoder registered")
    bos.toByteArray
  }

  /** Encode a packed-RGB raster (0xRRGGBB per pixel) as PNG via the JDK
    * encoder. PNG true-color is lossless, and the JDK writer embeds no
    * ICC profile for a plain TYPE_INT_RGB image, so
    * [[decodeImageRgb]] round-trips the exact channel values. */
  def encodePngRgb(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height,
      s"raster ${rgb.length} != $width x $height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, rgb, 0, width)
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "png", bos))
      throw new MediaFormatException("PNG: no JDK encoder registered")
    bos.toByteArray
  }

  /** Encode an 8-bit grayscale raster as baseline JPEG at the given
    * quality (lossy: decode approximates the input raster). */
  def encodeJpeg(width: Int, height: Int, pixels: Array[Byte],
                 quality: Float = 0.9f): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"raster ${pixels.length} != $width x $height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, pixels)
    writeJpeg(img, quality)
  }

  /** Encode a packed-RGB raster as baseline color JPEG (YCbCr DCT —
    * lossy in every channel; decode approximates the input). */
  def encodeJpegRgb(width: Int, height: Int, rgb: Array[Int],
                    quality: Float = 0.9f): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height,
      s"raster ${rgb.length} != $width x $height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, rgb, 0, width)
    writeJpeg(img, quality)
  }

  private def writeJpeg(img: java.awt.image.BufferedImage,
                        quality: Float): Array[Byte] = {
    require(quality > 0f && quality <= 1f, s"quality $quality")
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg")
    if (!writers.hasNext)
      throw new MediaFormatException("JPEG: no JDK encoder registered")
    val writer = writers.next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode ANY supported image container to (width, height, 8-bit
    * grayscale raster): PGM through the byte-arithmetic parser above,
    * PNG/JPEG through the JDK `javax.imageio` readers. Non-gray decodes
    * are collapsed to luma with the fixed integer ITU-R 601 weights
    * (299·R + 587·G + 114·B, rounded) so the raster is deterministic —
    * no platform color-management path touches the values. Unknown
    * containers and malformed payloads throw [[MediaFormatException]]:
    * decode is a correctness gate, not a guess. */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Byte]) =
    sniffImageFormat(bytes) match {
      case "pgm" => decodePgm(bytes)
      case fmt =>
        imageioDecode(fmt, bytes) { img =>
          val w = img.getWidth
          val h = img.getHeight
          val out = new Array[Byte](w * h)
          if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
            img.getRaster.getDataElements(0, 0, w, h, out)
          } else {
            // bulk row fetch: per-pixel getRGB(x, y) dispatches through
            // the ColorModel once per pixel — an order of magnitude
            // slower in the executor hot path than pulling a row at a
            // time into a reused buffer (identical ARGB values)
            val row = new Array[Int](w)
            var y = 0
            var i = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, row, 0, w)
              var x = 0
              while (x < w) {
                val rgb = row(x)
                val lum = (299 * ((rgb >> 16) & 0xff)
                  + 587 * ((rgb >> 8) & 0xff)
                  + 114 * (rgb & 0xff) + 500) / 1000
                out(i) = lum.toByte
                i += 1
                x += 1
              }
              y += 1
            }
          }
          (w, h, out)
        }
    }

  /** Decode ANY supported image container to its PER-CHANNEL content:
    * (width, height, packed 0xRRGGBB per pixel). PGM is single-channel
    * by definition — its gray value is replicated into all three
    * channels (the color-space identity: gray g IS rgb(g,g,g)) — while
    * PNG/JPEG surface the channels the JDK reader decoded, with the
    * alpha byte masked off. The color-aware sibling of [[decodeImage]]:
    * same strict sniffing seam, same typed failure contract. */
  def decodeImageRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) =
    sniffImageFormat(bytes) match {
      case "pgm" =>
        val (w, h, pix) = decodePgm(bytes)
        val out = new Array[Int](pix.length)
        var i = 0
        while (i < pix.length) {
          val g = pix(i) & 0xff
          out(i) = (g << 16) | (g << 8) | g
          i += 1
        }
        (w, h, out)
      case fmt =>
        imageioDecode(fmt, bytes) { img =>
          val w = img.getWidth
          val h = img.getHeight
          val out = new Array[Int](w * h)
          if (img.getColorModel.getNumComponents == 1) {
            // single-band rasters replicate the RAW sample, matching
            // the PGM branch and decodeImage's raster read — getRGB
            // would run the CS_GRAY→sRGB colorspace conversion and
            // hand back g' != g
            val raster = img.getRaster
            var y = 0
            var i = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val g = raster.getSample(x, y, 0) & 0xff
                out(i) = (g << 16) | (g << 8) | g
                i += 1
                x += 1
              }
              y += 1
            }
          } else {
            img.getRGB(0, 0, w, h, out, 0, w)
            var i = 0
            while (i < out.length) { out(i) &= 0xffffff; i += 1 }
          }
          (w, h, out)
        }
    }

  /** Shared ImageIO read + dims gate + NonFatal barrier for the
    * PNG/JPEG decode paths: JDK ImageIO readers surface many malformed
    * payloads as RuntimeExceptions (ArrayIndexOutOfBounds,
    * NegativeArraySize, CMMException, ...), not just IIOException —
    * every one of them is "the bytes are not a valid image" and must
    * exit through the typed seam, never as an opaque executor crash. */
  private def imageioDecode[A](fmt: String, bytes: Array[Byte])
                              (extract: java.awt.image.BufferedImage => A): A =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null)
        throw new MediaFormatException(
          s"$fmt: JDK reader rejected payload")
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0 || w.toLong * h > (1L << 28))
        throw new MediaFormatException(s"$fmt: bad dims ${w}x$h")
      extract(img)
    } catch {
      case m: MediaFormatException => throw m
      case e if scala.util.control.NonFatal(e) =>
        throw new MediaFormatException(
          s"$fmt: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  // ------------------------------------------------- WAV (RIFF PCM16 mono)

  /** Encode mono 16-bit PCM as a canonical 44-byte-header WAV. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, "sampleRate must be positive")
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // audio format: integer PCM
      .putShort(1) // channels: mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { out.putShort(samples(i)); i += 1 }
    out.array()
  }

  /** Decode a mono PCM16 WAV: returns (sampleRate, samples). A real
    * chunk walk — unknown chunks (LIST, fact, …) are skipped with RIFF
    * word alignment; requires format 1 (PCM), 1 channel, 16 bits.
    * Throws [[MediaFormatException]] on malformed input. */
  def decodeWavPcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
    def fail(m: String): Nothing = throw new MediaFormatException(s"WAV: $m")
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int): String =
      if (o + 4 <= bytes.length) new String(bytes, o, 4, "US-ASCII") else ""
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
      fail("missing RIFF/WAVE header")
    var pos = 12
    var rate = -1
    var data: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = tag(pos)
      val sz = u32(pos + 4)
      val body = pos + 8
      if (body + sz > bytes.length) fail(s"chunk $id overruns payload")
      if (id == "fmt ") {
        if (sz < 16) fail("fmt chunk too short")
        if (u16(body) != 1) fail(s"unsupported audio format ${u16(body)}")
        if (u16(body + 2) != 1) fail(s"expected mono, got ${u16(body + 2)}")
        if (u16(body + 14) != 16) fail(s"expected 16-bit, got ${u16(body + 14)}")
        rate = u32(body + 4).toInt
      } else if (id == "data") {
        val n = (sz / 2).toInt
        // zero samples would make every downstream content stat a
        // division by zero — reject at the gate, like any other
        // undecodable payload
        if (n == 0) fail("zero-sample data chunk")
        val smp = new Array[Short](n)
        var i = 0
        while (i < n) { smp(i) = u16(body + 2 * i).toShort; i += 1 }
        data = smp
      }
      pos = body + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    if (rate <= 0) fail("no fmt chunk")
    if (data == null) fail("no data chunk")
    (rate, data)
  }
}
