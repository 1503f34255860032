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
}
