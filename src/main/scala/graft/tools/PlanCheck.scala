package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: prints the executed plan of one registered
  * query (AQE-final) plus its Exchange count — the .explain feedback
  * loop for plan-shape work, runnable as
  * `runMain graft.tools.PlanCheck <query> [sfDir]`. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println(s"EXCHANGES=${"Exchange".r.findAllIn(plan).length}")
    println(plan)
    spark.stop()
  }
}
