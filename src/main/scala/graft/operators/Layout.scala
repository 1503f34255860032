package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order (Morton) clustering keys and the
  * file-level min/max skipping index they produce.
  *
  * At 100 TB the scan you never run is the cheapest: laying files out
  * along a space-filling curve bounds EVERY dimension's (min, max) range
  * per file, so a predicate on either dimension prunes files from the
  * manifest before the scan starts — the multi-dimensional analogue of
  * sorting by one column, which bounds only that column. The curve key is
  * pure integer bit-twiddling (the classic mask-spread sequence), so it
  * is a codegen'd Column expression here and replays bit-identically in
  * any engine with shifts and masks.
  */
object Layout {

  /** Spread the low 16 bits of `x` so bit i lands at position 2i (the
    * standard 4-step mask sequence). */
  private def spread16(x: Column): Column = {
    val x0 = x.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 2-D Morton key interleaving the low 16 bits of `a` (even bit
    * positions) and `b` (odd positions): a 32-bit Z-curve address.
    * Inputs are masked to 16 bits — quantize wider domains to 0..65535
    * upstream (range-rank or fixed-width bucketing), which is also what
    * keeps the curve locality meaningful. */
  def zorder2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** The skipping index a Z-ordered write produces: rows are assigned to
    * `files` target files by contiguous equal-width Z-key ranges over the
    * OBSERVED curve span (file_id = z * files DIV (max_z + 1); a fixed
    * 32-bit shift would dump every row into file 0 whenever the data
    * occupies fewer bits than the full curve), and each file reports its
    * row count and its (min, max) envelope in BOTH source dimensions.
    * Bounded envelopes on every dimension at once — not just the leading
    * sort column — are the artifact that lets a scan planner prune files
    * for predicates on either column. The max-z normalizer reaches rows
    * as a broadcast 1-row aggregate; equal-width ranges keep assignment
    * integer-exact and engine-portable (equal-depth needs a global sort).
    *
    * Output: (file_id, n_rows, min_a, max_a, min_b, max_b), ordered. */
  def zorderStats(df: DataFrame, aCol: String, bCol: String,
                  files: Int): DataFrame = {
    require(files > 0 && files <= 65536, s"files out of range: $files")
    val z = df.select(col(aCol).as("a"), col(bCol).as("b"))
      .withColumn("zk", zorder2(col("a"), col("b")))
    val zMax = z.agg(max("zk").as("zmax"))
    z.crossJoin(broadcast(zMax))
      .withColumn("file_id", expr(s"zk * $files DIV (zmax + 1)"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("a").as("min_a"), max("a").as("max_a"),
        min("b").as("min_b"), max("b").as("max_b"))
      .orderBy("file_id")
  }
}
