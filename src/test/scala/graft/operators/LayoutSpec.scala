package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Layout.zorder2 / Layout.zorderStats: bit-exactness against a naive
  * per-bit interleave, and the data-skipping property the curve exists
  * for — bounded per-file envelopes in BOTH dimensions. */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  /** Naive reference: interleave bit i of a at 2i, bit i of b at 2i+1. */
  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zorder2 equals the per-bit interleave on boundary + random input") {
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L),
      (65535L, 0L), (0L, 65535L), (70000L, 3L)) ++ // masks to low 16 bits
      Seq.fill(200)((rnd.nextLong(65536), rnd.nextLong(65536)))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorder2(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      z shouldBe mortonRef(a & 0xFFFFL, b & 0xFFFFL)
    }
  }

  test("zorder2 is monotone-compatible with curve locality (prefix nests)") {
    // two points sharing high bits of both dims share the z-key prefix:
    // the property file-range assignment relies on
    val z1 = mortonRef(0x1234L, 0x00FFL)
    val z2 = mortonRef(0x1235L, 0x00FEL) // differ only in low 2x2 bits
    (z1 >> 4) shouldBe (z2 >> 4)
  }

  test("zorderStats: counts total, envelopes bound, both dims constrained") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id").as("u"),
        floor(col("value")).cast("long").as("vbin"))
    val stats = Layout.zorderStats(ev, "u", "vbin", files = 64).collect()
    stats.map(_.getLong(1)).sum shouldBe ev.count()
    stats.length should be > 8 // rows actually spread across files
    all(stats.map(_.getLong(0))) should (be >= 0L and be < 64L)
    stats.foreach { r =>
      r.getLong(2) should be <= r.getLong(3) // min_a <= max_a
      r.getLong(4) should be <= r.getLong(5)
    }
    // the point of z-order: the SECOND dimension is also constrained —
    // files must not each span the whole vbin domain (a 1-D sort by u
    // would leave min_b..max_b ~ full range in every file)
    val bSpan = stats.map(r => r.getLong(5) - r.getLong(4))
    val domain = ev.agg(max("vbin") - org.apache.spark.sql.functions
      .min("vbin")).head.getLong(0)
    bSpan.count(_ <= domain / 2) should be >= stats.length / 2
    an[IllegalArgumentException] should be thrownBy
      Layout.zorderStats(ev, "u", "vbin", files = 0)
  }
}
