package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no built-in operator for: backward as-of join
  * and interval (range) containment join. Both are re-expressed as plans
  * Catalyst already executes well — a single partition-sort pass for as-of,
  * a hash equi-join for range — instead of the inequality theta-joins a
  * naive formulation produces (which Spark can only run as a broadcast
  * nested-loop or cartesian product, the classic 100 TB scale-killer).
  */
object Joins {

  /** Orderable under SQL sort semantics: maps (and anything containing
    * one) have no total order and fail in analysis if sorted on. */
  private def isOrderable(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => isOrderable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => isOrderable(a.elementType)
      case _ => true
    }

  /** Backward as-of join: every left row picks the single right row with
    * the greatest right timestamp <= its own timestamp, among rows with
    * equal `keys` (left-outer: left rows with no prior right row keep
    * nulls). The standard time-series primitive — trade enrichment with
    * latest quote, event attribution to latest preceding touchpoint.
    *
    * Execution shape: union both sides tagged, then one window pass per
    * key ordered by (ts, side) carrying the last non-null right payload
    * forward — right rows sort before left rows at equal timestamps, so
    * an exactly-simultaneous right row is matched (>=, not >). That is
    * ONE shuffle on `keys` + ONE sort, the same cost as a sort-merge
    * join, with no range-condition blowup: the naive
    * `right.ts <= left.ts` theta-join materializes every prior right row
    * per left row before taking the max. At 100 TB a hot key serializes
    * into one sorted partition — mitigate upstream by splitting the key
    * range into coarse time chunks and as-of joining chunk-by-chunk with
    * the previous chunk's tail carried over.
    *
    * Ties among right rows with identical (keys, ts): pass `tieBreak`
    * (right column names) and the row with the LARGEST tie-break value
    * wins, deterministically. When the right payload struct is orderable,
    * the full struct is always appended as the FINAL tie key — so rows
    * still tying on (keys, ts, tieBreak...) resolve by total payload
    * order instead of partition order, and determinism holds whenever it
    * is achievable. Without `tieBreak` the struct is the only tie-break
    * (back-compat), which then REQUIRES every rightCol to be an orderable
    * type — a map-typed payload column is rejected up front with
    * instructions, instead of failing in analysis; with an explicit
    * `tieBreak` a non-orderable payload is accepted and ties beyond the
    * given columns are the one remaining nondeterminism (keep
    * (keys, rightTs, tieBreak...) unique on the right side then).
    *
    * @param rightCols right columns to attach (must not collide with left
    *                  column names); the matched right timestamp is always
    *                  attached as `matched_<rightTs>`
    * @param toleranceSec match only if the time gap (left.ts - right.ts
    *                     backward, right.ts - left.ts forward) <= tolerance
    *                     (in whole seconds); farther matches become nulls
    * @param forward      match the EARLIEST right row with ts >= left.ts
    *                     instead (next-event attribution); same one-shuffle
    *                     plan, window order reversed
    * @param tieBreak     right columns breaking equal-timestamp ties
    *                     (largest wins); must be a subset of rightCols
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightCols: Seq[String],
           toleranceSec: Option[Long] = None,
           forward: Boolean = false,
           tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "asOf needs at least one equality key")
    require(tieBreak.forall(rightCols.contains),
      s"tieBreak ${tieBreak.mkString(",")} must be a subset of rightCols")
    val leftCols = left.columns.toSeq
    val outTs = s"matched_$rightTs"
    require(!(rightCols :+ outTs).exists(leftCols.contains),
      s"right payload/$outTs collide with left columns")

    val rStruct = struct(
      col(rightTs).as(outTs) +: rightCols.map(col): _*)
    val lStruct = struct(leftCols.map(col): _*)
    val rStructType = right.select(rStruct.as("s")).schema("s").dataType
    val lStructType = left.select(lStruct.as("s")).schema("s").dataType

    // SQL join semantics for nulls: a right row with a null timestamp or
    // null key can never be "the latest prior match" (it would otherwise
    // sort first and leak its payload into unmatched left rows), so it is
    // dropped up front; left rows with null keys/timestamps are kept and
    // simply match nothing.
    val rClean = right.filter(
      (col(rightTs).isNotNull +: keys.map(col(_).isNotNull))
        .reduce(_ && _))
    val rTagged = rClean.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__t"), lit(0).as("__side"),
        rStruct.as("__r"), lit(null).cast(lStructType).as("__l")): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__t"), lit(1).as("__side"),
        lit(null).cast(rStructType).as("__r"), lStruct.as("__l")): _*)

    // forward = walk time in reverse: right rows still sort before left
    // rows at equal timestamps (__side asc), so ts == left.ts matches in
    // both directions
    val tOrder = if (forward) col("__t").desc else col("__t").asc
    // equal-(keys, ts) right rows: order so the winner (last non-null in
    // window order) is the largest tie-break — explicit columns if given,
    // else the whole payload struct, which must then be orderable
    val tieOrder =
      if (tieBreak.nonEmpty) {
        val explicit = tieBreak.map(c => col("__r").getField(c).asc)
        // full-struct backstop: rows tying on every explicit key still
        // resolve deterministically whenever the payload has a total order
        if (isOrderable(rStructType)) explicit :+ col("__r").asc
        else explicit
      } else {
        require(isOrderable(rStructType),
          "rightCols contain a non-orderable type (e.g. map); pass an " +
            "explicit tieBreak column to asOf")
        Seq(col("__r").asc)
      }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((tOrder +: col("__side").asc +: tieOrder): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rTagged.union(lTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = toleranceSec match {
      case Some(tol) =>
        val gap =
          if (forward) unix_timestamp(col(s"__m.$outTs")) -
            unix_timestamp(col("__t"))
          else unix_timestamp(col("__t")) -
            unix_timestamp(col(s"__m.$outTs"))
        carried.withColumn("__m", when(gap <= tol, col("__m")))
      case None => carried
    }
    bounded.select(
      leftCols.map(c => col(s"__l.`$c`").as(c)) ++
        ((outTs +: rightCols).map(c => col(s"__m.`$c`").as(c))): _*)
  }

  /** Skew-resistant equi-join: the big (skewed) side gets a deterministic
    * salt derived from its own row content, the small side is replicated
    * across all `salts` values, and the join key becomes (keys..., salt).
    * A key owning 30% of the big side — which would pin one reducer at
    * 100 TB — now spreads over `salts` reducers; the result is row-for-row
    * identical to the unsalted join because each big row carries exactly
    * one salt and every (key, salt) slot holds the full small-side payload
    * for that key. Cost: the small side shuffles `salts` times over — keep
    * it the dimension side. (AQE's skew-join split handles sort-merge
    * skew at runtime; explicit salting is the portable form that also
    * covers aggregations and bucketed layouts.) */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val dup = big.columns.toSet.intersect(small.columns.toSet) -- keys
    require(dup.isEmpty, s"overlapping non-key columns: ${dup.mkString(",")}")
    val b = big.withColumn("__salt",
      pmod(hash(struct(big.columns.map(col): _*)), lit(salts)))
    val sm = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(sm, keys :+ "__salt").drop("__salt")
  }

  /** Interval containment join: each point row joined to every interval
    * row whose [start, end] (inclusive) contains its timestamp, with
    * optional extra equality keys.
    *
    * Execution shape: both sides are mapped to fixed-width time buckets —
    * an interval explodes into every bucket it overlaps, a point into the
    * one bucket holding it — and the join becomes a plain hash equi-join
    * on (bucket, keys...) with a residual containment filter. A naive
    * `t BETWEEN start AND end` join has no equi-condition, so Spark plans
    * a broadcast nested-loop over the full cross space; here shuffle
    * volume is |points| + |intervals| x avg-buckets-per-interval, and
    * every executor gets a bounded hash-join task. Pick `bucketSec` near
    * the typical interval length: much smaller multiplies interval
    * replication, much larger multiplies false candidates for the
    * residual filter to discard.
    *
    * Point and interval column names must be disjoint (rename upstream).
    */
  def rangeJoin(points: DataFrame, pointTs: String,
                intervals: DataFrame, startCol: String, endCol: String,
                keys: Seq[String] = Nil, bucketSec: Long = 86400L): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val dup = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys
    require(dup.isEmpty, s"overlapping non-key columns: ${dup.mkString(",")}")
    val pb = points.withColumn("__b",
      expr(s"unix_timestamp(`$pointTs`) DIV $bucketSec"))
    val ib = intervals.withColumn("__b", explode(sequence(
      expr(s"unix_timestamp(`$startCol`) DIV $bucketSec"),
      expr(s"unix_timestamp(`$endCol`) DIV $bucketSec"))))
    pb.join(ib, "__b" +: keys)
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__b")
  }
}
