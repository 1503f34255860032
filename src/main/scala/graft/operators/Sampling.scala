package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` depends on partition layout — rerun the job with a
  * different file split and you hold out different rows, which is fatal
  * for auditable train/eval splits. These operators decide membership
  * from a content hash of a key column: reproducible across runs, cluster
  * layouts, and engines (md5 hex is portable, so the DuckDB oracle can
  * replay the exact sample).
  *
  * Granularity is the key column: sample by row id for row sampling, by
  * user/document id for entity-level holdouts (all of an entity's rows
  * stay together — the leakage-safe split).
  *
  * Fractions are multiples of 1/256 (two hex chars of the digest compared
  * lexicographically against a threshold byte).
  */
object Sampling {

  /** Threshold string for frac256/256: two lowercase hex chars, or "g"
    * (lexicographically above every hex pair) for keep-everything —
    * f"%02x" of 256 would be the 3-char "100", which compares BELOW "17"
    * and would silently keep ~6.6%. */
  private def thresholdLit(frac256: Int): Column = {
    require(frac256 >= 0 && frac256 <= 256, s"frac256 out of range: $frac256")
    lit(if (frac256 == 256) "g" else f"$frac256%02x")
  }

  /** The single hash recipe (also mirrored by the SQL oracles): first two
    * hex chars of md5(key || salt) compared against a threshold. */
  private def hashPrefix(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt)).cast("binary")), 1, 2)

  /** Keep ~frac256/256 of rows, keyed on `key`, salted. */
  def keepExpr(key: Column, frac256: Int, salt: String): Column =
    hashPrefix(key, salt) < thresholdLit(frac256)

  /** Bernoulli sample: keep ~frac256/256 of rows. */
  def bernoulli(df: DataFrame, keyCol: String, frac256: Int,
                salt: String = "graft"): DataFrame =
    df.filter(keepExpr(col(keyCol), frac256, salt))

  /** Stratified sample: per-stratum fraction (frac256 map), default for
    * unlisted strata. */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 fractions: Map[String, Int], default256: Int,
                 salt: String = "graft"): DataFrame = {
    val threshold = fractions.foldLeft(thresholdLit(default256)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, thresholdLit(f)).otherwise(acc)
    }
    df.filter(hashPrefix(col(keyCol), salt) < threshold)
  }

  /** Exactly-n-per-stratum deterministic sample: rank rows inside each
    * stratum by content hash (then key, for a total order) and keep the
    * first n. Same cross-engine reproducibility as `bernoulli`, but with
    * a GUARANTEED sample size — the "give me exactly 10k eval docs per
    * domain" ask that a fraction can only approximate. One shuffle keyed
    * by the stratum; the rank is a window sort, so a stratum sorts within
    * one reducer — fine up to tens of millions of rows per stratum; past
    * that, pre-filter with `bernoulli` at a few times the target rate
    * first so the window only ranks a small superset. */
  def exactPerStratum(df: DataFrame, keyCol: String, strataCol: String,
                      n: Int, salt: String = "graft"): DataFrame = {
    require(n >= 0, "sample size must be non-negative")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(md5(concat(col(keyCol).cast("string"), lit(salt))
        .cast("binary")).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis 2006): each row draws u in (0,1] from a content hash (so
    * every engine and every run draws the SAME u) and is keyed by
    * u^(1/w); the global top-k under that key is a weighted sample — a
    * row with twice the weight has exactly twice the inclusion odds in
    * the limit. The quality-weighted corpus subset selector.
    *
    * Scale shape: the key is a map-only expression; top-k is
    * orderBy+limit, which Spark plans as TakeOrderedAndProject — each
    * partition keeps a k-row heap and only k rows per partition reach
    * the driver-side merge. No full sort, no global shuffle. The key is
    * ROUNDED to 6 decimals before ranking (ties broken by id) so the
    * selection boundary never hangs on a last-ulp pow() difference
    * between engines. */
  def weightedTopK(df: DataFrame, keyCol: String, weightCol: String,
                   k: Int, salt: String = "wtk"): DataFrame = {
    require(k > 0, "sample size must be positive")
    val u = (conv(substring(md5(concat(col(keyCol).cast("string"),
      lit(salt)).cast("binary")), 1, 8), 16, 10).cast("double") + 1.0) /
      4294967297.0
    df.select(col(keyCol), col(weightCol),
        round(pow(u, lit(1.0) /
          greatest(col(weightCol).cast("double"), lit(1.0))), 6)
          .as("score"))
      .orderBy(col("score").desc, col(keyCol).asc)
      .limit(k)
  }

  /** Domain-mix sampling: down-sample each stratum so the kept corpus
    * approaches target mix weights (basis points) under a document budget
    * expressed as a fraction of the corpus (budget = total * budgetNum
    * DIV budgetDen, so one definition holds at every scale factor).
    *
    * Per-stratum keep rate, all integer arithmetic so engines agree
    * exactly: frac256_s = min(256, (256 * budget * w_s) DIV (10000 * n_s)).
    * Membership then follows the same content-hash rule as `bernoulli`.
    *
    * Two jobs: per-stratum counts + the corpus total (a few rows,
    * broadcast back onto the data), then a stateless map-only filter —
    * the shape that survives 100 TB. Strata absent from `weightsBp` get
    * weight 0 (dropped).
    */
  def weightedMix(df: DataFrame, keyCol: String, strataCol: String,
                  weightsBp: Map[String, Int], budgetNum: Long,
                  budgetDen: Long, salt: String = "graft"): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0, "bad budget fraction")
    require(weightsBp.values.forall(w => w >= 0 && w <= 10000),
      "weights are basis points in [0, 10000]")
    val rates = df.groupBy(strataCol).agg(count(lit(1)).as("__n"))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("__total"))))
      .withColumn("__w", weightsBp.foldLeft(lit(0L)) {
        case (acc, (s, bp)) =>
          when(col(strataCol) === s, lit(bp.toLong)).otherwise(acc)
      })
      .withColumn("__frac256", least(lit(256L), expr(
        s"(256 * ((__total * $budgetNum) DIV $budgetDen) * __w) " +
          "DIV (10000 * __n)")))
      .withColumn("__thr", when(col("__frac256") >= 256, lit("g"))
        .otherwise(format_string("%02x", col("__frac256"))))
      .select(col(strataCol), col("__thr"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(hashPrefix(col(keyCol), salt) < col("__thr"))
      .drop("__thr")
  }
}
