package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.catalog.{FunctionQueries, LlmQueries, RelationalQueries, StreamingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the four query catalogs (relational, scalar functions,
  * streaming, LLM-pipeline) into the single `queries`/`oracleSql` surface
  * the driver's Verify/Bench mains consume. Every key in `oracleSql` has a
  * matching key in `queries` with identical output column names (the
  * driver's hash compare sorts columns by name).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-style pricing summary (SURVEY §7.1 minimum slice).
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ FunctionQueries.queries ++
      StreamingQueries.queries ++ LlmQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (hash-function-dependent, approximate, or gap-sessionized) → driver
    * records a rows-only check; unit suites carry their correctness.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ FunctionQueries.oracle ++
      StreamingQueries.oracle ++ LlmQueries.oracle

  /** Exact-SQL counterparts + relative tolerance for the APPROX queries
    * (VERDICT r8 item 7): keys deliberately absent from [[oracleSql]]
    * because their output is sketch-dependent (HLL, t-digest), but whose
    * values are checkable against the exact aggregate within a band.
    * Verify dumps this as `tolerance_oracle.json` next to
    * `oracle_sql.json`; the adoption contract for a checker (implemented
    * in tools/check_oracle.py as the driver-side reference): sort
    * columns by name, zip rows in query order, non-numeric values must
    * be equal, numeric values pass when
    * |spark − exact| <= tolerance · max(|exact|, 1). The same ±5% bands
    * are unit-asserted in AggregatesSpec, so this hook adds a
    * driver-visible check, not the only check.
    */
  def toleranceOracle: Map[String, (String, Double)] = Map(
    "agg_approx_distinct" -> ((
      """SELECT l_returnflag,
                CAST(count(DISTINCT l_orderkey) AS BIGINT) AS approx_orders
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""", 0.05)),
    "agg_approx_percentile" -> ((
      """SELECT l_returnflag,
                quantile_cont(l_extendedprice, 0.5) AS p50_approx,
                quantile_cont(l_extendedprice, 0.9) AS p90_approx
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""", 0.05)),
    "agg_hll_partitioned" -> ((
      """SELECT l_returnflag,
                CAST(count(DISTINCT l_orderkey) AS BIGINT) AS est_orders
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""", 0.05)),
    "agg_countmin" -> ((
      """SELECT event_type, CAST(count(*) AS BIGINT) AS est_n
         FROM events WHERE event_type IS NOT NULL
         GROUP BY event_type ORDER BY event_type""", 0.05)),
  )
}
