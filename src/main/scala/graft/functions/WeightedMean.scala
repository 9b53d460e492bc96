package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Demonstrative typed `Aggregator` (SURVEY §2.10): the reference needs no
  * custom aggregates (all built-ins), but the engine exposes the extension
  * point — this is the shape any user-defined aggregate takes.
  *
  * Weighted mean with map-side partial aggregation: `reduce` folds rows
  * into (Σwx, Σw) per partition, `merge` combines partials — the same
  * partial/final split Catalyst gives built-in aggregates, so it scales
  * like sum()/avg() (one shuffle of 2-double buffers, not rows).
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  // (value, weight) → accumulate (Σ value*weight, Σ weight)
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
