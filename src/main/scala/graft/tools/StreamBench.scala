package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{CraneStream, StreamApps}
import graft.sources.VersionedStore

/** Streaming drain benchmark — the rebuild's counterpart to the
  * reference's headline measurement (cs425_mp4.pdf Fig. 2A: total time to
  * stream the Shakespeare corpus through wordCount; Crane ≈ 190-900 s,
  * Spark Streaming ≈ 140-1080 s depending on emit rate, 10 VMs, 2018).
  *
  * Feeds N copies of the reference's own 2,309-line sample through the
  * complete-mode wordCount topology with per-trigger top-5 snapshots,
  * unthrottled (the reference's spout rate limit is an input knob, not an
  * engine property), and reports lines/second end-to-end including
  * snapshot writes.
  *
  * Usage: runMain graft.tools.StreamBench [copies]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 40
    val src = "/root/reference/spark-streaming/data/shakespear"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val lines = Files.readAllLines(java.nio.file.Paths.get(src))
      .toArray(Array.empty[String])
    val tmp = Files.createTempDirectory("streambench").toString
    val store = VersionedStore(s"$tmp/store")

    val in = MemoryStream[String]
    val q = CraneStream.start(in.toDF(), "wordCount", store,
      checkpointDir = s"$tmp/ckpt", k = 5, period = "0 seconds")
    val total = copies.toLong * lines.length
    val t0 = System.nanoTime()
    try {
      var i = 0
      while (i < copies) { in.addData(lines.toSeq); i += 1 }
      q.processAllAvailable()
    } finally q.stop()
    val sec = (System.nanoTime() - t0) / 1e9
    val top = store.get(spark, "wordCount_result").collect()
      .map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(",")
    println(f"""{"metric":"stream_lines_per_sec","value":${total / sec}%.0f,"lines":$total,"sec":$sec%.2f,"top5":"$top"}""")
    spark.stop()
  }
}
