package graft.operators

import graft.SparkSpec

/** Edge-case coverage for the text-analysis kernels; bulk correctness is
  * carried by the DuckDB oracle over the documents table.
  */
class TextAnalysisSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("repetitionRatio: null and empty text yield 0 grams, ratio 0.0") {
    val out = TextAnalysis
      .repetitionRatio(docs(1L -> null, 2L -> "", 3L -> "a a a a"))
      .orderBy("doc_id")
      .collect()
    assert(out(0) === Row(1L, 0, 0.0)) // null text: 0 grams, not -1
    assert(out(1) === Row(2L, 0, 0.0)) // "" splits to [""] -> 0 grams
    assert(out(2) === Row(3L, 3, 0.6667)) // grams {a a}x3 -> 1 - 1/3
  }

  test("repetitionRatio: trailing empty tokens are kept (split limit -1)") {
    // "x x " -> tokens [x, x, ""] -> grams ["x x", "x "] -> 2 distinct of 2
    val out = TextAnalysis.repetitionRatio(docs(1L -> "x x ")).collect()
    assert(out(0) === Row(1L, 2, 0.0))
  }

  test("qualityFilter: each gate rejects independently, survivor passes all three") {
    import spark.implicits._
    // 25 stop-words out of 50 tokens -> quality = 0.5*1.0 + 0.5*0.5 = 0.75
    val good = (("the " * 25) + ("x " * 25)).trim
    // quality high but Spanish stop-words dominate -> predicted 'es' != 'en'
    val wrongLang = (("el " * 25) + ("x " * 25)).trim
    // only 5 tokens -> fails the [10, 1000] token band (quality would pass)
    val short = "the the the a a"
    // 50 tokens, zero stop-words -> quality = 0.5*1.0 + 0 = 0.5 boundary
    val boundary = ("x " * 50).trim
    val in = Seq(
      (1L, good, "en"), (2L, wrongLang, "en"), (3L, short, "en"),
      (4L, boundary, "en"))
      .toDF("doc_id", "text", "lang")
    val kept = TextAnalysis.qualityFilter(in, 0.5, 10, 1000)
      .select("doc_id").as[Long].collect().toSet
    // boundary: quality == 0.5 passes (>=) but predicts 'unknown' != 'en'
    assert(kept === Set(1L))
    // relax the lang gate by recording what the argmax predicts
    val in2 = Seq((2L, wrongLang, "es"), (4L, boundary, "unknown"))
      .toDF("doc_id", "text", "lang")
    val kept2 = TextAnalysis.qualityFilter(in2, 0.5, 10, 1000)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 === Set(2L, 4L))
  }

  test("fingerprint: null text is NULL, empty text fingerprints to 0") {
    // null ≠ empty: a null payload has NO fingerprint (the SQL twin's
    // fold over NULL is NULL); an empty one legitimately hashes to 0.
    // Conflating them would collide distinct documents in a manifest.
    val out = TextAnalysis
      .fingerprint(docs(1L -> null, 2L -> "ab", 3L -> ""))
      .orderBy("doc_id")
      .collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    // 'a'*1 + 'b'*2 = 97 + 196
    assert(out(1).getLong(1) === 293L)
    assert(out(2).getLong(1) === 0L)
    assert(out(2).getInt(2) === 0)
  }
}
