package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import graft.functions.{TextFunctions => TF}

/** Dev-only stage profiler for the dedup hotspots (not part of the
  * library surface; run by hand while tuning). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    time("warmup")(docs.count())

    val n = 3; val threshold = 0.8
    val sets = docs.select(col("doc_id"),
        TF.shingles(col("text"), n).as("sh"))
      .withColumn("nsh", size(col("sh")).cast("long"))
      .filter(col("nsh") > 0)
    val inv = sets.select(col("doc_id"), col("nsh"),
      explode(col("sh")).as("shingle"))
    time("inv")(inv.count())
    val freq = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
    time("freq")(freq.count())
    val w = Window.partitionBy("doc_id").orderBy(col("df").asc, col("shingle").asc)
    val ranked = inv.join(freq, "shingle").withColumn("pos", row_number().over(w))
    time("ranked")(ranked.count())
    val prefix = ranked
      .filter(col("pos") <= col("nsh") - ceil(col("nsh") * threshold) + 1)
      .select("doc_id", "shingle")
    time("prefix")(prefix.count())
    val joined = prefix.as("a").join(prefix.as("b"),
      col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
    time("self-join raw")(joined.count())
    val candidates = joined
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("candidates distinct")(candidates.count())
    val verified = candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("nsh").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        col("nsh").as("nb")), "doc_b")
    time("verify joins only")(verified.count())
    val full = verified
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("union_sz", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * 10000 >= col("union_sz") * 8000)
    time("verify + intersect")(full.count())
    spark.stop()
  }
}
