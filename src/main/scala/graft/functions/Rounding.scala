package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-portable decimal rounding.
  *
  * Spark's `round` converts the double to its shortest decimal string and
  * applies HALF_UP; DuckDB rounds the binary double directly — on .5
  * boundaries they disagree (4.725 → 4.73 in Spark, 4.72 in DuckDB).
  * `floor(x*10^n + 0.5)/10^n` in plain IEEE double ops is bit-identical
  * in every engine, so hash-compared results use this instead.
  *
  * Non-finite guard: Spark's `floor` returns LONG, so a bare
  * `floor(NaN·p + 0.5)/p` silently becomes 0.0 and ±Inf becomes
  * ±Long.MaxValue/p — masking poisoned floats (a NaN embedding would
  * score similarity 0.0 instead of NaN). DuckDB's DOUBLE `floor`
  * propagates them. The `when` branch keeps NaN/±Inf flowing through
  * unchanged on both engines; for finite values the arithmetic is
  * untouched.
  */
object Rounding {
  def roundTo(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    when(isnan(c) || c === Double.PositiveInfinity ||
      c === Double.NegativeInfinity, c)
      .otherwise(floor(c * p + 0.5) / p)
  }
}
