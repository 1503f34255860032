package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.streaming.CraneStream

/** Emit-rate sweep over the rate-limited replay spout — the rebuild's
  * counterpart of the reference's Fig. 2A methodology (cs425_mp4.pdf:
  * stream the corpus at fixed emit rates, measure total drain time; the
  * reference's total time GROWS superlinearly as rate rises past ~150
  * lines/s because the engine falls behind). Here the expectation is the
  * opposite: drain time ≈ lines/rate (the source rate limit, not the
  * engine, is the bottleneck), with a constant startup overhead.
  *
  * For each rate R: replay the first R*15 lines of the reference's
  * Shakespeare sample at R lines/s and measure wall-clock until every
  * line has reached the sink. Prints one JSON line per rate.
  *
  * Usage: runMain graft.tools.RateSweep [rate1 rate2 ...] (default
  * 50 100 200 400)
  */
object RateSweep {
  def main(args: Array[String]): Unit = {
    val rates = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(50, 100, 200, 400)
    val src = "/root/reference/spark-streaming/data/shakespear"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = Files.readAllLines(Paths.get(src)).toArray(Array.empty[String])
    rates.foreach { rate =>
      val take = math.min(rate * 15, all.length)
      val tmp = Files.createTempDirectory("ratesweep")
      val f = tmp.resolve("lines.txt")
      Files.write(f, String.join("\n", all.take(take): _*).getBytes)
      // expected count from the same reader replayLines uses: a corpus
      // slice ending in an empty line writes a trailing newline, which the
      // text source does not count as a line
      val n = spark.read.textFile(f.toString).count()
      val name = s"sweep_$rate"
      val q = CraneStream.replayLines(spark, f.toString, linesPerSecond = rate)
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      val t0 = System.nanoTime()
      try {
        val deadline = System.currentTimeMillis() + (n / rate + 60) * 1000L
        var c = 0L
        while (c < n && System.currentTimeMillis() < deadline) {
          Thread.sleep(100)
          c = spark.table(name).count()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val ideal = n.toDouble / rate
        require(c == n, s"rate sweep at $rate drained only $c of $n lines")
        println(f"""{"metric":"replay_drain","rate_lps":$rate,"lines":$n,"sec":$sec%.2f,"ideal_sec":$ideal%.2f,"overhead_sec":${sec - ideal}%.2f}""")
      } finally q.stop()
    }
    spark.stop()
  }
}
