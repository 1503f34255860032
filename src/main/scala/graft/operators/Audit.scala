package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pre-flight data audits: the distribution diagnostics you run BEFORE
  * committing a 100 TB job to a plan — most importantly key skew, the
  * single most common cause of a job that works at 1 TB and dies at 100
  * (one reducer owns the hot key's partition while a thousand idle).
  */
object Audit {

  /** Key-skew summary for a prospective join/aggregation key: one row of
    * integer diagnostics over the per-key count distribution.
    *
    *  - n_keys, n_rows, max_cnt: cardinality, volume, heaviest key
    *  - p50/p90/p99_cnt: discrete per-key-count percentiles (value at
    *    rank ceil(p*n_keys), never interpolated — integer-exact)
    *  - max_share_bp: the heaviest key's share of all rows in basis
    *    points; >> 10000/partitions means that key pins one reducer and
    *    the plan needs salting ([[Joins.saltedJoin]]) or AQE skew splits
    *
    * Scale shape: the percentile is NOT a global sort of per-key counts.
    * Counts reduce to their value histogram first (distinct count values,
    * typically a few thousand regardless of key cardinality); the rank
    * scan is a cumulative window over that bounded histogram, and the
    * corpus totals arrive as a broadcast 1-row aggregate. Everything is
    * integer arithmetic, so the audit replays exactly in any engine. */
  def keySkew(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keySkew needs at least one key column")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val hist = counts.groupBy("cnt").agg(count(lit(1)).as("nk"))
    val cum = hist.withColumn("ck", sum("nk").over(
      Window.orderBy("cnt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = counts.agg(count(lit(1)).as("n_keys"),
      sum("cnt").as("n_rows"), max("cnt").as("max_cnt"))
    def pctl(p: Double) =
      min(when(col("ck") >= ceil(col("n_keys") * p), col("cnt")))
    cum.crossJoin(broadcast(tot))
      .agg(max("n_keys").as("n_keys"), max("n_rows").as("n_rows"),
        max("max_cnt").as("max_cnt"),
        pctl(0.5).as("p50_cnt"), pctl(0.9).as("p90_cnt"),
        pctl(0.99).as("p99_cnt"))
      .withColumn("max_share_bp", expr("max_cnt * 10000 DIV n_rows"))
  }
}
