package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond plain `Dataset.join`.
  *
  * The reference engine (d1eg0/kafka-to-parquet, /root/reference/src/main.rs)
  * has no joins at all; this module is part of the SURVEY §2.B extension
  * surface. Everything here compiles to stock Catalyst operators — no custom
  * strategies — so AQE/broadcast/skew handling apply unchanged at cluster
  * scale.
  */
object Joins {

  /** Point-in-time (AS-OF) join: for every left row, attach the payload of
    * the latest right row with the same key whose time is <= the left time.
    *
    * Spark has no native ASOF join. The naive formulation — a range
    * self-join (`l.key = r.key && r.t <= l.t` + max) — explodes to
    * O(|matches|) rows before aggregating, which is fatal at 100 TB.
    * Instead we union both sides (one column-aligned pass, no row
    * multiplication), shuffle ONCE on the key, and take a running
    * `last(payload, ignoreNulls)` over an ordered window. Cost is a single
    * shuffle + per-partition sort: the same lower bound a native
    * sort-merge ASOF implementation would have.
    *
    * Tie-breaking is deterministic: right rows at the same timestamp sort
    * before left rows (so an equal-timestamp right row IS matched), and
    * among equal-timestamp right rows the greatest `rightTiebreak` wins.
    *
    * Output: all left columns + every right payload column prefixed
    * `asof_`; unmatched left rows keep nulls.
    */
  def asof(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightTiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(_ == rightKey)
    val rSchema = right.schema
    val lSchema = left.schema
    val tbType = rSchema(rightTiebreak).dataType

    val l2 = left.select(
      (Seq(col(leftKey).as("__k"), col(leftTime).cast("timestamp").as("__t"),
           lit(1).as("__is_l"), lit(null).cast(tbType).as("__tb")) ++
        leftCols.map(col) ++
        rightPayload.map(c => lit(null).cast(rSchema(c).dataType).as(s"__r_$c"))): _*)
    val r2 = right.select(
      (Seq(col(rightKey).as("__k"), col(rightTime).cast("timestamp").as("__t"),
           lit(0).as("__is_l"), col(rightTiebreak).as("__tb")) ++
        leftCols.map(c => lit(null).cast(lSchema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as(s"__r_$c"))): _*)

    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__is_l"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = rightPayload.foldLeft(l2.unionByName(r2)) { (df, c) =>
      df.withColumn(s"__m_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    matched.filter(col("__is_l") === 1)
      .select(leftCols.map(col) ++ rightPayload.map(c => col(s"__m_$c").as(s"asof_$c")): _*)
  }

  /** Skew-resistant equi-join: salt the skewed (left) side into
    * `saltFactor` sub-keys and replicate the right side once per salt, so
    * one hot key spreads over `saltFactor` reducers instead of melting a
    * single task. Deterministic (salt = hash of the whole left row), so
    * results are reproducible run-to-run.
    *
    * AQE's skew-join handling covers sort-merge joins at runtime; this is
    * the explicit form for when the skew is known ahead of time, the join
    * is not SMJ, or AQE is off. Cost: right side inflated ×saltFactor —
    * use for moderate saltFactor on a side that is small-ish but too big
    * to broadcast.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    // Salt = hash of the key plus every hashable non-key column as a row
    // discriminator: rows sharing a hot key must spread across salts (a
    // key-only hash is constant per key and spreads nothing). MapType is
    // unhashable in Spark, so map columns are excluded rather than failing
    // the whole join.
    val discrim = left.schema.fields
      .filterNot(f => f.name == leftKey ||
        f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toIndexedSeq
    val lSalted = left.withColumn("__lsalt",
      pmod(hash((col(leftKey) +: discrim): _*), lit(saltFactor)))
    val rSalted = right.withColumn("__rsalt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    // Keys resolved against their own frames: with the common same-name
    // key (k = k) an unqualified col(k) would be ambiguous; the two salt
    // columns are named apart so neither resolution nor the final drop
    // can grab the wrong one.
    lSalted.join(rSalted,
        lSalted(leftKey) === rSalted(rightKey) &&
          col("__lsalt") === col("__rsalt"))
      .drop("__lsalt", "__rsalt")
  }

  /** Banded range join as an EQUI-join: all (left, right) pairs with
    * `|leftVal - rightVal| <= band`, without a nested-loop join.
    *
    * A broadcast NLJ (what Catalyst picks for a raw theta predicate) is
    * right only while one side fits in a broadcast; when both sides are
    * fact-sized the band structure makes the predicate bucketizable:
    * left rows get bucket `floor(x/W)` with W = band, right rows are
    * replicated to buckets `floor(r/W) - 1 .. + 1` — exactly the buckets
    * a within-band left value can land in, since `floor((r ± W)/W)` =
    * `floor(r/W) ± 1` — and the exact band predicate runs per bucket.
    * Catalyst plans a shuffled hash / sort-merge join on the bucket key
    * (or broadcasts the replicated side while it stays small): pair work
    * is O(rows-per-bucket²) per bucket, never O(|L|·|R|). A matching pair
    * meets in exactly one bucket (bucket(left) is unique and the right
    * replication covers it once), so no post-join dedup is needed.
    *
    * W is the cost knob: it must equal `band` for the ±1 cover to be
    * exact, so callers size `band` (or pre-scale the value column) to
    * keep per-bucket populations bounded — a band much wider than the
    * value domain degenerates to one giant bucket.
    *
    * Output: all left columns + all right columns (bucket plumbing
    * dropped).
    */
  def bandedRangeJoin(left: DataFrame, right: DataFrame,
      leftVal: String, rightVal: String, band: Double): DataFrame = {
    require(band > 0.0, s"band must be > 0, got $band")
    val l = left.withColumn("__bkt", floor(col(leftVal) / band).cast("long"))
    val r = right
      .withColumn("__off", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("__bkt",
        floor(col(rightVal) / band).cast("long") + col("__off"))
      .drop("__off")
    l.join(r, Seq("__bkt"))
      .filter(abs(col(leftVal) - col(rightVal)) <= band)
      .drop("__bkt")
  }
}
