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

  /** Exact-SQL counterparts + relative tolerance for sketch-valued
    * queries the hash oracle cannot cover (VERDICT r8 item 7; checker
    * contract in tools/check_oracle.py: sort columns by name, zip rows
    * in query order, non-numeric equal, numeric pass when
    * |spark − exact| <= tolerance · max(|exact|, 1)).
    *
    * EMPTY since r12: the four former entries (agg_approx_distinct,
    * agg_approx_percentile, agg_hll_partitioned, agg_countmin) now hash
    * their EXACT aggregate plus an in-query `tol_ok` verdict over the
    * sketch estimate, so they live in [[oracleSql]] and the driver's own
    * hash compare pins the ±5% band (VERDICT r11 item 2). The hook and
    * checker stay for any future query whose estimate cannot ride the
    * in-query-verdict pattern.
    */
  def toleranceOracle: Map[String, (String, Double)] = Map()
}
