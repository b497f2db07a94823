package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns.
  *
  * The kernel is the native codegen'd [[DotProduct]] expression (one JVM
  * loop per pair, no allocation) — the higher-order-function form it
  * replaced interpreted its lambdas per element and showed up hot in
  * pairwise similarity BENCH. All arithmetic is promoted to DOUBLE inside
  * the fold, accumulated left-to-right, so results are reproducible
  * against the DuckDB oracle (float32 folds are not).
  */
object VectorFns {

  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  def norm(a: Column): Column = sqrt(DotProduct(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit LSH bucket over the first `bits` dimensions: vectors that are
    * near-duplicates (cosine → 1) agree on almost all signs, so they land in
    * the same bucket with high probability. Bucketing turns an O(n²)
    * all-pairs similarity scan into per-bucket scans — the 100 TB path.
    */
  def signBucket(a: Column, bits: Int): Column =
    // try_element_at, not element_at: ANSI mode throws on an index past the
    // array's end, while the DuckDB twin's list index reads NULL there — a
    // sub-`bits`-dim vector must bucket as '0' on both engines, not crash.
    concat((1 to bits).map(i =>
      when(try_element_at(a, lit(i)) >= 0f, lit("1")).otherwise(lit("0"))): _*)

  /** DuckDB twin of [[signBucket]]: the CASE-expression chain for the same
    * n-bit bucket. Oracle SQL builds its block key from this helper with the
    * SAME `bits` argument as the Spark side, so the two engines cannot
    * silently diverge on bit count (they used to duplicate the expansion by
    * hand in three SQL strings).
    */
  def signBucketSql(arrayCol: String, bits: Int): String =
    (1 to bits).map(i =>
      s"CASE WHEN $arrayCol[$i] >= 0 THEN '1' ELSE '0' END").mkString(", ")
}
