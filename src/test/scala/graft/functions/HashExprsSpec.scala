package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HashExprs.HyperplaneBucket — the one-pass sign-bit LSH kernel. The
  * contract: bit b set iff the array-order dot with plane b is >= 0,
  * byte-identical to the higher-order-function formulation it replaced
  * (aggregate over zip_with per plane), for every row.
  */
class HashExprsSpec extends SparkSpec {

  test("hyperplane bucket equals the composed HOF formulation per row") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val planes = Array.fill(6)(Array.fill(8)(rnd.nextGaussian()))
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian()))).toDF("id", "v")
      .withColumn("v", col("v").cast("array<double>"))
    val hof = planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(zip_with(col("v"), typedLit(p.toSeq),
        (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    val rows = vecs.select(col("id"),
        HashExprs.hyperplane_bucket(col("v"), planes).as("kernel"),
        hof.as("composed"))
      .collect()
    rows.length shouldBe 200
    rows.foreach(r => r.getInt(1) shouldBe r.getInt(2))
    // and buckets are non-degenerate (random data spreads over >1 bucket)
    rows.map(_.getInt(1)).distinct.length should be > 1
  }

  test("hyperplane bucket codegen matches interpreted eval") {
    import spark.implicits._
    val planes = Array(Array(1.0, -1.0), Array(0.5, 0.5))
    val df = Seq((1L, Seq(2.0, 1.0)), (2L, Seq(-1.0, -3.0)),
      (3L, Seq(1.0, 2.0))).toDF("id", "v")
    val got = df.select(col("id"),
        HashExprs.hyperplane_bucket(col("v"), planes).as("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // row 1: dots (1.0, 1.5) -> bits 0,1 -> 3; row 2: (2.0, -2.0) -> 1;
    // row 3: (-1.0, 1.5) -> 2
    got shouldBe Map(1L -> 3, 2L -> 1, 3L -> 2)
  }

  test("rolling chunk bounds equal the naive per-window re-fold") {
    // independent reimplementation: fold each w-slice from scratch —
    // the O(n*w) form the oracle uses; the kernel's Rabin pop/push
    // must agree at every position, including multi-code-point chars
    val w = 5; val p = 257L; val m = 1000000007L; val d = 4L
    def naive(s: String): Seq[Int] = {
      val cps = s.codePoints().toArray
      (w to cps.length).flatMap { end =>
        val h = cps.slice(end - w, end)
          .foldLeft(0L)((a, c) => (a * p + c) % m)
        if (end < cps.length && h % d == 0L) Some(end) else None
      }
    }
    val rnd = new scala.util.Random(11)
    // whole code points, not chars: indexing a String would split the
    // emoji's surrogate pair and feed the kernel malformed UTF-16
    val alphabet = Vector("a", "b", "c", " ", "d", "e", "f", "é", "中",
      "😀", " ")
    val samples = (0 until 50).map(_ =>
      (0 until (w + rnd.nextInt(60))).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString) :+
      "" :+ "ab" // shorter than the window -> no boundaries
    samples.foreach { s =>
      val got = HashExprs
        .rollingBoundsKernel(
          org.apache.spark.unsafe.types.UTF8String.fromString(s),
          w, p, m, d)
        .toIntArray().toSeq
      got shouldBe naive(s)
    }
    // the fixture actually produced some boundaries somewhere
    samples.map(naive(_).length).sum should be > 0
  }

  test("code points + rolling bounds: codegen matches interpreted") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "café au lait 中文 mix"), (3L, "")).toDF("id", "t")
    val viaDf = df.select(col("id"),
        HashExprs.code_points(col("t")).as("cp"),
        HashExprs.rolling_chunk_bounds(col("t"), 5, 257L, 1000000007L, 4L)
          .as("b"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getSeq[Int](2))))
      .toMap
    df.collect().foreach { r =>
      val s = org.apache.spark.unsafe.types.UTF8String.fromString(
        r.getString(1))
      val (cp, b) = (viaDf(r.getLong(0))._1, viaDf(r.getLong(0))._2)
      cp shouldBe HashExprs.codePointsKernel(s).toIntArray().toSeq
      b shouldBe HashExprs
        .rollingBoundsKernel(s, 5, 257L, 1000000007L, 4L)
        .toIntArray().toSeq
    }
    viaDf(2L)._1.take(4) shouldBe Seq('c'.toInt, 'a'.toInt, 'f'.toInt, 0xe9)
  }

  test("nfc_normalize: composes decomposed pairs, leaves NFC text " +
       "untouched, codegen matches the kernel") {
    import spark.implicits._
    val decomposed = "cafe\u0301 o\u0308 plain"
    val composed = "caf\u00e9 \u00f6 plain"
    val df = Seq((1L, decomposed), (2L, composed), (3L, "ascii only"),
      (4L, "")).toDF("id", "t")
    val got = df.select(col("id"),
        HashExprs.nfc_normalize(col("t")).as("n"),
        org.apache.spark.sql.functions.length(col("t")).as("len"),
        org.apache.spark.sql.functions.length(
          HashExprs.nfc_normalize(col("t"))).as("nlen"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    got(1L)._1 shouldBe composed
    got(2L)._1 shouldBe composed // idempotent on already-NFC text
    got(3L)._1 shouldBe "ascii only"
    got(4L)._1 shouldBe ""
    // two combining pairs composed: length drops by exactly 2
    (got(1L)._2 - got(1L)._3) shouldBe 2
    (got(2L)._2 - got(2L)._3) shouldBe 0
    // kernel agrees with the DataFrame (codegen) path
    import org.apache.spark.unsafe.types.UTF8String
    HashExprs.nfcKernel(UTF8String.fromString(decomposed)).toString shouldBe
      composed
  }

  test("adcKernel validates every codeword's [1, m] range — a corrupt " +
      "code in a NON-LAST subspace fails loudly instead of reading the " +
      "next subspace's LUT block") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(xs: Long*) = new GenericArrayData(xs.toArray)
    // 2 subspaces, m = 3: lut blocks [10,20,30] (j=0) and [40,50,60] (j=1)
    val lut = arr(10L, 20L, 30L, 40L, 50L, 60L)
    HashExprs.adcKernel(arr(2L, 3L), lut) shouldBe (20L + 60L)
    // codes[0] = 4 lands INSIDE j=1's block (global index 3 < nl) — the
    // whole-LUT bounds check accepted it and silently summed 40
    val e1 = intercept[IllegalArgumentException] {
      HashExprs.adcKernel(arr(4L, 1L), lut)
    }
    e1.getMessage should include("outside [1, 3]")
    // zero/negative codewords fail too (1-based convention)
    intercept[IllegalArgumentException] {
      HashExprs.adcKernel(arr(0L, 1L), lut)
    }
    // last-subspace overflow still caught
    intercept[IllegalArgumentException] {
      HashExprs.adcKernel(arr(1L, 4L), lut)
    }
  }
}
