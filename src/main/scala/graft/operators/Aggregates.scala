package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Custom typed aggregations (SURVEY §2.B `agg_custom_typed`).
  *
  * A typed `Aggregator[IN, BUF, OUT]` participates in Spark's normal
  * partial-aggregation pipeline (map-side `reduce`, shuffle of the small
  * buffer, `merge` on the reduce side) — so it scales like any built-in
  * aggregate: no row explosion, buffer bytes only on the wire.
  */
object Aggregates {

  /** Quantity-weighted mean price: sum(w*x)/sum(w), tracked in a single
    * (sum, weight) buffer. Merge is associative+commutative so partial
    * aggregation is safe under any partitioning.
    */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaDouble)
    override def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
  }

  /** `weighted_mean(value, weight)` as a DataFrame-usable UDAF. */
  val weightedMean: UserDefinedFunction = udaf(WeightedMean)
}
