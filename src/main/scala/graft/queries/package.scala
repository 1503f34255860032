package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A named query: Spark form + optional DuckDB oracle SQL. */
  type QueryFn = (SparkSession, String) => DataFrame

  /** Domain registries implement this; SparkEntry concatenates them. */
  trait Registry {
    def defs: Map[String, QueryFn]
    def oracles: Map[String, String]
  }
}
