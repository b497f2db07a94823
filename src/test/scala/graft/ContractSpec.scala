package graft

/** Driver-contract invariants: every oracle key has a query, the entry
  * query returns rows, and names stay collision-free across catalogs.
  */
class ContractSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("catalog names are collision-free") {
    val cats = Seq(
      catalog.RelationalQueries.queries, catalog.FunctionQueries.queries,
      catalog.StreamingQueries.queries, catalog.LlmQueries.queries)
    val total = cats.map(_.size).sum
    assert(SparkEntry.queries.size == total,
      "a query key is shadowed across catalogs")
  }

  test("entry (t1 smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL mentions every output column name of its spark twin") {
    // cheap guard against the rename-in-one-place bug the driver's
    // sorted-column hash compare would flag late
    val skip = Set("llm_dedup_ngram") // alias appears via subquery projection
    for ((name, fn) <- SparkEntry.queries if SparkEntry.oracleSql.contains(name)
         if !skip(name)) {
      val sql = SparkEntry.oracleSql(name).toLowerCase
      val cols = fn(spark, sfDir).schema.fieldNames
      val missing = cols.filterNot(c => sql.contains(c.toLowerCase))
      assert(missing.isEmpty, s"$name: oracle SQL lacks columns ${missing.toSeq}")
    }
  }
}
