package graft.core

import org.apache.spark.sql.SparkSession

/** SQL surface: register every test table as a temp view so the full
  * engine is reachable through `spark.sql(...)` — the query language the
  * reference never had (SURVEY.md §2.9: "no parser, no query language").
  * Catalyst plans SQL and DataFrame identically, so every oracle-checked
  * operator is equally available to SQL users. */
object Views {
  def register(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }
}
