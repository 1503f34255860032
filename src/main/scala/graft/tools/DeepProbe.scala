package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Throwaway profiler for the deep-rung chain serve: reproduces the
  * ScaleTrendDeep 200k fixed rung and prints per-stage wall/CPU/spill
  * so the serve's cost distribution is visible. */
object DeepProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        stages.append((i.stageId,
          i.name.split('\n').head.take(60),
          i.completionTime.getOrElse(0L) -
            i.submissionTime.getOrElse(0L),
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.memoryBytesSpilled / 1048576, m.jvmGCTime))
      }
    })
    val e = spark.read.parquet("/tmp/graft_deep_emb_100x/embeddings.parquet")
      .repartition(64).localCheckpoint(true)
    val built = graft.operators.Ann.buildDetIvfIndex(e, "vec_id",
      "embedding", "label")
    val store = graft.sources.VersionedStore(java.nio.file.Files
      .createTempDirectory("deep_probe").toString)
    graft.sources.AnnIndexStore.persistVersion(store, "m", 0L, built)
    val batch = built.home.limit(1000)
      .select(col("id").as("vec_id"), col("cell")).localCheckpoint(true)
    (0 until 3).foreach { b =>
      graft.sources.AnnIndexStore.foldBatchDelta(store, "m",
        built.centroids, baseVersion = 0L)(batch, b.toLong)
    }
    val chain = graft.sources.AnnIndexStore.loadChain(spark, store, "m")
    stages.clear()
    val t0 = System.nanoTime()
    val df = graft.operators.Ann.ivfIndexTopK(chain, e, "vec_id",
      "embedding", col("id") % 50 === 0, k = 5)
    val n = df.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"SERVE_SECS=$secs%.2f rows=$n")
    val pairs = graft.operators.Ann.ivfIndexCandidates(chain, e,
      "vec_id", "embedding", col("id") % 50 === 0, nprobe = 2).count()
    println(s"PROBED_PAIRS=$pairs")
    val hist = chain.home.groupBy("cell").count()
      .orderBy(col("count").desc).collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
    println(s"CELL_HIST=$hist")
    println("stageId | name | wall_ms | runSum_ms | cpuSum_ms | spill_MB | gc_ms")
    stages.sortBy(-_._3).take(20).foreach { case (id, nm, w, r, c, s, g) =>
      println(f"$id%7d | $nm%-60s | $w%8d | $r%9d | $c%9d | $s%8d | $g%6d")
    }
    spark.stop()
  }
}
