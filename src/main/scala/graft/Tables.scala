package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided parquet tables (TESTDATA.md / FIXTURES.md).
  *
  * All access goes through `spark.read.parquet` so Catalyst sees a plain
  * parquet relation: column pruning and predicate pushdown reach the scan
  * (verify with `.explain` → `ReadSchema` / `PushedFilters`).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright. Sessions set `spark.sql.legacy.parquet.nanosAsLong`,
    * so `ts` arrives as nano-epoch LongType; convert back to a timestamp
    * with integer `div` (a double division would lose precision above
    * 2^53 ns). No-op when the file has micro/milli timestamps.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(apply(s, d, "events"))

  /** Normalize `ts` to a session-TZ TIMESTAMP regardless of how the
    * fixture was written: nano-epoch LONG (TIMESTAMP(NANOS) files read
    * under `nanosAsLong`) → integer-`div` µs conversion; TIMESTAMP_NTZ
    * (µs-naive files, the r10 testdata regen) → cast, which under the
    * pinned UTC session timezone keeps the micros bit-identical while
    * giving every downstream time function (`unix_micros`, `window`,
    * as-of bands) the TIMESTAMP type it expects. No-op when `ts` is
    * already LTZ. Shared by the batch reader and streaming file sources
    * (stream_upsert) so the normalization contract lives in ONE place — a
    * drifted copy would break the µs tie-breaking the DuckDB oracles
    * compare against.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
