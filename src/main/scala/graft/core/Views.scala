package graft.core

import org.apache.spark.sql.SparkSession

/** SQL surface: register every test table as a temp view so the full
  * engine is reachable through `spark.sql(...)` — the query language the
  * reference never had (SURVEY.md §2.9: "no parser, no query language").
  * Catalyst plans SQL and DataFrame identically, so every oracle-checked
  * operator is equally available to SQL users. */
object Views {
  /** Views go through the per-table loaders, NOT raw Tables.load, so SQL
    * users see the same semantics as every DataFrame query — in particular
    * events.ts arrives as a proper timestamp (Tables.events converts the
    * INT64-nanos parquet column), not a raw Long. */
  def register(spark: SparkSession, dir: String): Unit =
    Tables.loaders.foreach { case (n, load) =>
      load(spark, dir).createOrReplaceTempView(n)
    }
}
