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
}
