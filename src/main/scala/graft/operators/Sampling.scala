package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data pipelines.
  *
  * Membership is decided by a hash of the row's ID, not by `rand()`:
  * `sampleBy`'s per-partition RNG changes the sample whenever the input
  * layout changes (different split sizes, different cluster), while a
  * content-hash sample is a pure function of the data — re-runs,
  * repartitioning, and scale-out all keep the exact same rows, which is
  * what dataset reproducibility (and incremental rebuilds) require.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Keep a row iff `pmod(xxhash64(id, seed), 1e6) < fraction(stratum) *
    * 1e6` — per-stratum Bernoulli sampling with layout-independent
    * membership. Strata absent from `fractions` are dropped (fraction 0).
    */
  def stratifiedById(df: DataFrame, stratumCol: String, idCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1]: $fractions")
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(
      pmod(xxhash64(col(idCol), lit(seed)), lit(Buckets)).cast("double") <
        frac * Buckets.toDouble)
  }
}
