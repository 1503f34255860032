package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.CraneStream
import graft.sources.VersionedStore

/** Streaming drain benchmark — the rebuild's counterpart to the
  * reference's headline measurement (cs425_mp4.pdf Fig. 2A-2F: total
  * time to stream each corpus through wordCount / twitter / hothttp;
  * Crane ≈ 190-900 s, Spark Streaming ≈ 140-1080 s depending on emit
  * rate, 10 VMs, 2018).
  *
  * Benches ALL THREE reference topologies over the reference's own
  * corpora (shakespear → wordCount, twitter edges → twitter, the
  * Calgary HTTP log → hothttp), each through the complete-mode
  * topology with per-trigger top-5 snapshots, plus the bounded-state
  * top-K path (mapGroupsWithState + K-row snapshot — the
  * high-cardinality mode) on the wordCount corpus. Unthrottled (the
  * reference's spout rate limit is an input knob, not an engine
  * property); reports lines/second end-to-end including snapshot
  * writes.
  *
  * One JSON line on stdout: `value` stays the wordCount complete-mode
  * rate (the long-tracked NOTES band), `apps` carries every mode.
  *
  * Usage: runMain graft.tools.StreamBench [copies]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 40
    val data = "/root/reference/spark-streaming/data"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def corpus(name: String): Array[String] =
      Files.readAllLines(java.nio.file.Paths.get(s"$data/$name"))
        .toArray(Array.empty[String])

    /** Drain `copies` replays of `lines` through one started query;
      * returns (lines/sec, total lines). */
    def drain(lines: Array[String], nCopies: Int,
              startQ: MemoryStream[String] =>
                org.apache.spark.sql.streaming.StreamingQuery)
        : (Double, Long) = {
      val in = MemoryStream[String]
      val q = startQ(in)
      val total = nCopies.toLong * lines.length
      val t0 = System.nanoTime()
      try {
        var i = 0
        while (i < nCopies) { in.addData(lines.toSeq); i += 1 }
        q.processAllAvailable()
      } finally q.stop()
      (total / ((System.nanoTime() - t0) / 1e9), total)
    }

    val runs = Seq(
      // (label, app, corpus file, bounded-top-K instead of complete)
      ("wordCount", "wordCount", "shakespear", false),
      ("twitter", "twitter", "twitter", false),
      ("hothttp", "hothttp", "calgary", false),
      ("wordCount_topk_bounded", "wordCount", "shakespear", true),
    )
    val results = runs.map { case (label, app, file, bounded) =>
      val lines = corpus(file)
      // hold total drained lines roughly comparable across corpora
      val nCopies = math.max(1, (copies.toLong * 2309 / lines.length).toInt)
      val tmp = Files.createTempDirectory(s"streambench_$label").toString
      val store = VersionedStore(s"$tmp/store")
      val (rate, total) = drain(lines, nCopies, in =>
        if (bounded)
          CraneStream.startTopKBounded(in.toDF(), app, store,
            checkpointDir = s"$tmp/ckpt", k = 5, period = "0 seconds")
        else
          CraneStream.start(in.toDF(), app, store,
            checkpointDir = s"$tmp/ckpt", k = 5, period = "0 seconds"))
      val suffix = if (bounded) "topk" else "result"
      val top = store.get(spark, s"${app}_$suffix").collect()
        .map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(",")
      (label, rate, total, top)
    }
    val apps = results
      .map { case (label, rate, total, _) =>
        f""""$label":{"lines_per_sec":$rate%.0f,"lines":$total}""" }
      .mkString(",")
    val (_, wcRate, wcTotal, wcTop) = results.find(_._1 == "wordCount").get
    println(f"""{"metric":"stream_lines_per_sec","value":$wcRate%.0f,"lines":$wcTotal,"apps":{$apps},"top5":"$wcTop"}""")
    spark.stop()
  }
}
