package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY §2.B window block). */
object Windows {

  /** Globally-ordered running sum WITHOUT a single-partition window.
    *
    * `sum().over(Window.orderBy(...))` with no partition key collapses the
    * whole dataset onto ONE task — fine at sf0.01, fatal at 100 TB. This
    * two-pass formulation keeps every stage distributed:
    *
    *   1. bucket rows by a coarse range key derived from the order column
    *      (here: caller-supplied `bucket` expression, e.g. `year(date)`);
    *   2. aggregate per-bucket sums (tiny: one row per bucket) and take a
    *      running total over buckets — the only global window, but over
    *      #buckets rows, not #data rows;
    *   3. broadcast-join the bucket offsets back and run the intra-bucket
    *      running sum partitioned BY bucket.
    *
    * Result is identical to the naive global window for any total order
    * (bucket asc, then `orderCols` within bucket).
    */
  def distributedRunningSum(
      df: DataFrame, value: Column, bucket: Column,
      orderCols: Seq[Column], out: String): DataFrame = {
    val withB = df.withColumn("__bkt", bucket)
    val offsets = withB.groupBy(col("__bkt")).agg(sum(value).as("__bsum"))
      .withColumn("__offset",
        coalesce(sum(col("__bsum")).over(
          Window.orderBy(col("__bkt")).rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      .select(col("__bkt"), col("__offset"))
    val intra = Window.partitionBy(col("__bkt")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe join key: a null bucket is its own group under the naive
    // window, but a plain equi-join would silently DROP those rows
    withB.alias("l")
      .join(broadcast(offsets).alias("o"), col("l.__bkt") <=> col("o.__bkt"))
      .select(col("l.*"), col("o.__offset"))
      .withColumn(out, col("__offset") + sum(value).over(intra))
      .drop("__bkt", "__offset")
  }

  /** Partition-scoped EXCLUSIVE prefix sum (sum of strictly-preceding
    * rows) without one-task-per-scope windows.
    *
    * `sum().over(Window.partitionBy(scope).orderBy(...))` puts each
    * scope's ENTIRE data on one task — fatal when a scope is large and
    * there are few of them (e.g. 5 languages over a 100 TB corpus). Same
    * two-pass shape as [[distributedRunningSum]], but every stage is
    * scoped: rows bucket by `(scope, bucket)`; per-bucket sums take their
    * running offset under a window partitioned by scope over #buckets
    * rows (never global, never the data); offsets broadcast back and the
    * intra-bucket exclusive sum runs partitioned by `(scope, bucket)`.
    * Callers pick `bucket` so one bucket ≈ one task's worth of rows.
    *
    * Exact for integral `value` columns (long accumulation end to end).
    */
  def partitionedPrefixSum(
      df: DataFrame, value: Column, partitionCols: Seq[String],
      bucket: Column, orderCols: Seq[Column], out: String): DataFrame = {
    val pcols = partitionCols.map(col)
    val withB = df.withColumn("__bkt", bucket)
    val offsets = withB.groupBy(pcols :+ col("__bkt"): _*)
      .agg(sum(value).as("__bsum"))
      .withColumn("__offset",
        coalesce(sum(col("__bsum")).over(
          Window.partitionBy(pcols: _*).orderBy(col("__bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(pcols :+ col("__bkt") :+ col("__offset"): _*)
    val intra = Window.partitionBy(pcols :+ col("__bkt"): _*)
      .orderBy(orderCols: _*).rowsBetween(Window.unboundedPreceding, -1)
    // null-safe join keys: a null scope (or bucket) forms its own window
    // partition under the naive form, but a plain equi-join back to the
    // offsets would silently DROP those rows from the output
    val joinCond = (partitionCols :+ "__bkt")
      .map(c => col(s"l.$c") <=> col(s"o.$c")).reduce(_ && _)
    withB.alias("l")
      .join(broadcast(offsets).alias("o"), joinCond)
      .select(col("l.*"), col("o.__offset"))
      .withColumn(out,
        col("__offset") + coalesce(sum(value).over(intra), lit(0L)))
      .drop("__bkt", "__offset")
  }
}
