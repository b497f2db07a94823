package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Decade probe for `bandAggJoin`'s opt-in MEASURE percentiles (r12):
  * the `join_range_agg` shape (part prices probing lineitem extended
  * prices at ±5.00) run three ways — count/sum only, + exact KEY
  * percentiles, + t-digest MEASURE percentiles — min-of-3 each, so the
  * digest tree's build (per-cent typed Aggregator + driver merge) and
  * per-probe O(log d) merge cost are measured against the same baseline
  * the r11 skew-decade artifacts used.
  *
  * Usage: BandPctProbe <sfDir>; prints one JSON line.
  */
object BandPctProbe {
  def main(args: Array[String]): Unit = {
    JvmGuard.assertSparkModuleAccess()
    val dir = args.headOption.getOrElse("/tmp/graft_sf1skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(keyP: Seq[Double], msrP: Seq[Double]): Double = {
      val times = (1 to 3).map { _ =>
        val p = spark.read.parquet(s"$dir/part.parquet")
          .select(col("p_brand"), col("p_retailprice"))
        val l = spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_extendedprice"))
        val t0 = System.nanoTime()
        Joins.bandAggJoin(p, "p_retailprice", l, "l_extendedprice",
            "l_extendedprice", 5.0, keyPercentiles = keyP,
            measurePercentiles = msrP)
          .agg(sum(col("band_n"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      math.floor(times.min * 1000) / 1000
    }

    val base = run(Nil, Nil)
    val keyPct = run(Seq(0.5), Nil)
    val msrPct = run(Nil, Seq(0.5, 0.9))
    println(s"""{"metric":"band_pct_probe","dir":"$dir","base_sec":$base,""" +
      s""""key_pct_sec":$keyPct,"msr_pct_sec":$msrPct}""")
    spark.stop()
  }
}
