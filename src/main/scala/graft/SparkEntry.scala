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
}
