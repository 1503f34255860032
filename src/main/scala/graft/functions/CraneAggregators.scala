package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's user-defined-operator surface is the App interface
  * (reference `Crane.go:179-188`): implement `transform` (per-tuple) and
  * `join` (keyed accumulate, merged across nodes by `mergeCache`). The
  * Spark-native analogue of the join/mergeCache pair is
  * `Aggregator[IN, BUF, OUT]` — `reduce` plays `join`, `merge` plays
  * `mergeCache` — registered through `functions.udaf`, which makes the
  * accumulator map-side partial like every built-in aggregate (only BUF
  * values cross the shuffle, the property the reference gets from running
  * `join` on each worker before the sink merge).
  */
object CraneAggregators {

  /** Weighted-mean accumulator: BUF carries (Σ w·x, Σ w). */
  final case class WSum(wx: Double, w: Double)

  object WeightedMean extends Aggregator[(Double, Double), WSum, Double] {
    override def zero: WSum = WSum(0.0, 0.0)
    override def reduce(b: WSum, in: (Double, Double)): WSum =
      WSum(b.wx + in._1 * in._2, b.w + in._2)
    override def merge(a: WSum, b: WSum): WSum =
      WSum(a.wx + b.wx, a.w + b.w)
    override def finish(b: WSum): Double =
      if (b.w == 0.0) Double.NaN else b.wx / b.w
    override def bufferEncoder: Encoder[WSum] = Encoders.product
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
