package graft.catalog

import java.nio.file.Files

import scala.sys.process._

import org.apache.spark.sql.functions.col

import graft.{SparkSpec, Tables}
import graft.operators.Dedup

/** Oracle audit for `llm_dedup_fuzzy_keep`: the MinHash pair stage is
  * hash-dependent and declared rows-only, but the composition downstream of
  * it — connected components → drop non-minimum ids → per-lang survivor
  * stats — is portable SQL. This spec dumps the kernel's ACTUAL pair set,
  * replays the composition with DuckDB's recursive CTE
  * (tools/fuzzy_keep_oracle.py), and asserts the per-lang stats match, so
  * the composition is checked against an independent engine rather than
  * only planted-dup assertions. Cancels (not fails) where python3/duckdb —
  * driver-side tooling, never a library dep — are unavailable.
  */
class FuzzyKeepOracleSpec extends SparkSpec {

  test("fuzzy_keep: CC -> survivors composition matches DuckDB over the kernel's pairs") {
    // Try: a missing python3 binary makes .! throw IOException before
    // the exit code is seen — that's "tooling unavailable", not a failure
    assume(scala.util.Try(Seq("python3", "-c", "import duckdb").!).getOrElse(1) == 0,
      "python3+duckdb (driver-side tooling) unavailable")

    val docs = Tables.documents(spark, sfDir)
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.5)
    val tmp = graft.util.Scratch.fresh("fuzzy_keep_oracle")
    Files.createDirectories(java.nio.file.Paths.get(tmp))
    val pairsDir = s"$tmp/pairs"
    pairs.write.parquet(pairsDir)
    assert(spark.read.parquet(pairsDir).count() > 0,
      "no MinHash pairs at sf0.001 — the composition check would be vacuous")

    val outCsv = s"$tmp/oracle.csv"
    val rc = Seq("python3", "tools/fuzzy_keep_oracle.py",
      pairsDir, s"$sfDir/documents.parquet", outCsv).!
    assert(rc == 0, "fuzzy_keep_oracle.py failed")

    val oracle = scala.util.Using.resource(scala.io.Source.fromFile(outCsv)) { src =>
      src.getLines().drop(1)
        .map(_.split(",") match {
          case Array(lang, n, chars) => (lang, n.toLong, chars.toLong)
        }).toSeq
    }
    val got = LlmQueries.queries("llm_dedup_fuzzy_keep")(spark, sfDir)
      .select(col("lang"), col("n_kept"), col("kept_chars"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == oracle, s"spark=$got oracle=$oracle")
  }
}
