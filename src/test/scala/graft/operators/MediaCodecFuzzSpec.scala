package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Deterministic byte-level fuzz of every decoder entry point.
  *
  * The codecs' contract is "decode is a correctness gate": a payload
  * either parses, or exits through the TYPED seam
  * ([[MediaFormatException]]) so the pipeline can route it — never an
  * untyped ArrayIndexOutOfBounds/NegativeArraySize/NumberFormat crash
  * that kills an executor task with no actionable cause. This suite
  * proves that property exhaustively at small payload size: every
  * truncation prefix and every single-byte mutation (three values per
  * position) of a valid payload must decode cleanly or throw
  * MediaFormatException. No randomness — the mutation lattice is the
  * whole (small) space, so a failure is a repro, not a flake.
  */
class MediaCodecFuzzSpec extends AnyFunSuite with Matchers {

  /** Run a decode over every truncation and 1-byte mutation of `valid`;
    * fail on any throwable that is not MediaFormatException. */
  private def fuzz(name: String, valid: Array[Byte])
                  (decode: Array[Byte] => Any): Unit = {
    def attempt(label: String, payload: Array[Byte]): Unit =
      try { decode(payload); () }
      catch {
        case _: MediaFormatException => ()
        case t: Throwable =>
          fail(s"$name/$label: decode escaped the typed seam with " +
            s"${t.getClass.getName}: ${t.getMessage}")
      }
    for (len <- 0 to valid.length)
      attempt(s"truncate@$len", valid.take(len))
    for (i <- valid.indices;
         v <- Seq(0x00, 0xff, (valid(i) ^ 0x40) & 0xff)) {
      val mutated = valid.clone()
      mutated(i) = v.toByte
      attempt(s"mutate@$i=$v", mutated)
    }
  }

  private val raster =
    Array.tabulate[Byte](6)(i => ((i * 37 + 11) % 256).toByte)

  test("PGM single-image decode: typed failure or success, exhaustively") {
    fuzz("pgm", MediaCodec.encodePgm(3, 2, raster))(MediaCodec.decodePgm)
  }

  test("PGM stream decode: typed failure or success, exhaustively") {
    val stream = MediaCodec.encodePgmStream(Seq(
      (3, 2, raster), (2, 3, raster), (1, 6, raster)))
    fuzz("pgmstream", stream)(MediaCodec.decodePgmStream)
  }

  test("WAV decode: typed failure or success, exhaustively") {
    val smp = Array.tabulate[Short](7)(i => (i * 531 - 1700).toShort)
    fuzz("wav", MediaCodec.encodeWavPcm16(16000, smp))(
      MediaCodec.decodeWavPcm16)
  }

  test("PNG decode through the sniffing seam: typed failure or success") {
    fuzz("png", MediaCodec.encodePng(3, 2, raster))(MediaCodec.decodeImage)
  }

  test("JPEG decode through the sniffing seam: typed failure or success") {
    fuzz("jpeg", MediaCodec.encodeJpeg(3, 2, raster))(MediaCodec.decodeImage)
  }

  private val rgbRaster =
    Array.tabulate(6)(i => ((i * 37 + 11) % 256) << 16 |
      ((i * 53 + 5) % 256) << 8 | ((i * 29 + 2) % 256))

  test("true-color PNG through the RGB decode path: typed failure or " +
      "success") {
    fuzz("png_rgb", MediaCodec.encodePngRgb(3, 2, rgbRaster))(
      MediaCodec.decodeImageRgb)
  }

  test("color JPEG through both decode paths: typed failure or success") {
    val enc = MediaCodec.encodeJpegRgb(3, 2, rgbRaster)
    fuzz("jpeg_rgb/gray", enc)(MediaCodec.decodeImage)
    fuzz("jpeg_rgb/color", enc)(MediaCodec.decodeImageRgb)
  }
}
