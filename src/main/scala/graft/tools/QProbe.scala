package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only steady-state query timer: runs each named registered query
  * `reps` times in one bench-shaped session and prints every timing plus
  * the min — the A/B harness for plan-boundary experiments where the
  * shared host's ±30% drift swamps single-shot subset benches.
  *
  * `runMain graft.tools.QProbe <q1,q2,...> [reps] [sfDir]` */
object QProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 1) args(1).toInt else 3
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    graft.core.Tables.names.foreach { n =>
      try graft.core.Tables.load(spark, dir, n).count()
      catch { case _: Throwable => () }
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        System.gc(); Thread.sleep(150)
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qprobe] $name%-35s min ${ts.min}%6.2f  " +
        ts.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
