package graft.tools
import org.apache.spark.sql.SparkSession
import graft.core.Tables
import graft.operators.Dedup

/** Dev-only timing for the components pipeline (not library surface). */
object CompProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    time("warmup")(docs.count())
    def pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
    time("ngram_jaccard alone")(pairs.count())
    time("components")(Dedup.components(pairs, "doc_a", "doc_b").count())
    time("components again")(Dedup.components(pairs, "doc_a", "doc_b").count())
    spark.stop()
  }
}
