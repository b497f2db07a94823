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

  /** Count-Min point-frequency estimates for every distinct value of
    * `valueCol` (non-null rows only): one sketch per `shards` hash shard
    * of the input built by Spark's own `count_min_sketch` aggregate
    * (partial aggregation = map-side mergeability), merged DRIVER-side —
    * O(sketch bytes), never the rows. Fixed seed + commutative counter
    * merges ⇒ deterministic across partitionings and merge orders (the
    * shard split exists to PROVE mergeability; AggregatesSpec pins
    * shard-merged == one global sketch). Backs `agg_countmin`.
    */
  def countMinEstimates(df: org.apache.spark.sql.DataFrame, valueCol: String,
      shardCol: String, shards: Int = 8, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42,
      maxValues: Int = 100000): Seq[(String, Long)] = {
    import org.apache.spark.sql.functions.{col, expr, lit, pmod}
    val s = df.sparkSession
    import s.implicits._
    // STRING-only by contract (r12 review): the sketch hashes typed
    // values, so enumerating a casted representation would point-query
    // with the WRONG type and silently return 0s — refuse loudly instead
    require(df.schema(valueCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"countMinEstimates: $valueCol is ${df.schema(valueCol).dataType}; " +
        "this helper enumerates string values — query the sketch " +
        "directly for non-string columns")
    val ev = df.filter(col(valueCol).isNotNull)
    val sketches = ev
      .groupBy(pmod(col(shardCol), lit(shards)).as("__shard"))
      .agg(expr(s"count_min_sketch($valueCol, ${eps}d, ${confidence}d, $seed)")
        .as("cms"))
      .select(col("cms")).collect()
    // point-query enumeration is driver-side BY DESIGN (the sketch is the
    // distributed object; queries are O(1) lookups) — guard the value
    // domain so a high-cardinality column fails loudly instead of
    // collecting an unbounded distinct set (r12 scale-hardening; the
    // IVF-centroid / prefix-sum-index legitimacy class is domain-BOUNDED
    // collects only)
    val values = ev.select(col(valueCol)).distinct()
      .limit(maxValues + 1)
      .as[String].collect().sorted.toSeq
    require(values.size <= maxValues,
      s"countMinEstimates: > $maxValues distinct $valueCol values — " +
        "point-querying every value no longer makes sense at this " +
        "cardinality; query the sketch directly for the keys you need")
    if (sketches.isEmpty) values.map(v => (v, 0L))
    else {
      val merged = sketches.map(r =>
        org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0))))
        .reduce { (a, b) => a.mergeInPlace(b); a }
      values.map(v => (v, merged.estimateCount(v)))
    }
  }
}
