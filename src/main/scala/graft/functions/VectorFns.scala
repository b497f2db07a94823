package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns.
  *
  * Built from higher-order functions (`zip_with`/`aggregate`/`transform`)
  * which Catalyst evaluates without serialization boundaries — no UDF, no
  * Row copying, stays inside codegen'd stages. All arithmetic is promoted
  * to DOUBLE before folding so results are reproducible against the DuckDB
  * oracle (float32 folds are not).
  */
object VectorFns {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit LSH bucket over the first `bits` dimensions: vectors that are
    * near-duplicates (cosine → 1) agree on almost all signs, so they land in
    * the same bucket with high probability. Bucketing turns an O(n²)
    * all-pairs similarity scan into per-bucket scans — the 100 TB path.
    */
  def signBucket(a: Column, bits: Int): Column =
    concat((1 to bits).map(i =>
      when(element_at(a, i) >= 0f, lit("1")).otherwise(lit("0"))): _*)
}
