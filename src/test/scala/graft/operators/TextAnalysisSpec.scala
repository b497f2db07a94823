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

  test("piiScrub: planted PII is counted and redacted, near-misses survive") {
    import spark.implicits._
    val rows = Seq(
      (1L, "en", "mail bob.smith+x@example-mail.com today"),
      (2L, "en", "hosts 10.0.255.7 and 192.168.1.1 up"),
      (3L, "de", "call +4915123456789 or +123456789 now"),
      (4L, "es", "a@b.co near 1.2.3.4 twice a@b.co end"),
      // near-misses: no-TLD email, 3-octet ip, unprefixed digits
      (5L, "en", "not user@localhost nor 1.2.3 nor 123456789"),
      (6L, "en", null)
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.piiScrub(rows).orderBy("doc_id").collect()
    def r(i: Int) = (out(i).getInt(2), out(i).getInt(3), out(i).getInt(4),
      out(i).getString(6))
    assert(r(0) == ((1, 0, 0, "mail <EMAIL> today")))
    assert(r(1) == ((0, 2, 0, "hosts <IP> and <IP> up")))
    // greedy 12-digit cap: +4915123456789 loses 12 digits, the 13th stays
    assert(r(2) == ((0, 0, 2, "call <PHONE>9 or <PHONE> now")))
    assert(r(3) == ((2, 1, 0, "<EMAIL> near <IP> twice <EMAIL> end")))
    assert(r(4) == ((0, 0, 0, "not user@localhost nor 1.2.3 nor 123456789")))
    assert(out(5).isNullAt(2) && out(5).isNullAt(6),
      "null text must stay null, not count as zero PII")
    // chars_removed = length delta, spot-checked on the email row
    assert(out(0).getInt(5) ==
      "mail bob.smith+x@example-mail.com today".length -
        "mail <EMAIL> today".length)
  }

  test("gopherFlags: each rule flips independently; null text fails all") {
    import spark.implicits._
    val wc50 = Seq.fill(50)("the").mkString(" ") // 50 tokens, all stopwords
    val rows = Seq(
      (1L, "en", wc50),                          // wc ok, stop ok, mean len 3.0
      (2L, "en", "short text only"),             // wc fail (3 tokens)
      (3L, "en", Seq.fill(60)("zz").mkString(" ")), // mean len 2 -> mwl fail
      (4L, "en", null)
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.gopherFlags(rows).orderBy("doc_id").collect()
    def f(i: Int) = (out(i).getBoolean(2), out(i).getBoolean(3),
      out(i).getBoolean(4))
    assert(f(0) == ((true, true, true)))   // "the"*50: mean len exactly 3.0
    assert(f(1) == ((false, true, false))) // 3 toks; 13 alpha / 3 = 4.3 ok
    assert(f(2) == ((true, false, false)))
    assert(f(3) == ((false, false, false)), "null text must fail every rule")
  }

  test("chunkWindows: stride overlap, short tail kept, null text dropped") {
    import spark.implicits._
    val text70 = (1 to 70).map(i => "w" + i).mkString(" ")
    val rows = Seq((1L, "en", text70), (2L, "en", "one two"),
      (3L, "en", null)).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.chunkWindows(rows, chunkLen = 32, stride = 24)
      .orderBy("doc_id", "start").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    // doc 1: starts 0,24,48 -> sizes 32,32,22 (tail kept, not dropped)
    // doc 2: start 0 -> size 2; doc 3: filtered out entirely
    assert(out.toSeq == Seq((1L, 0, 32), (1L, 24, 32), (1L, 48, 22),
      (2L, 0, 2)))
  }

  test("qualityClassifier: hand-computed score, feature union, null/empty text") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = Seq(
      (1L, Some("es"), "a b a"),   // feats = {a, b, a b, b a} (raw-order distinct union)
      (2L, Some("es"), null.asInstanceOf[String]), // null text -> no row
      (3L, None: Option[String], ""),              // "" -> one feature: ""
      (4L, Some("zh"), "solo"))                    // 1 token -> no bigrams
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.qualityClassifier(d)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L), "null text must drop")
    // independent reimplementation of the weight contract
    def w(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val dg = md.digest(f.getBytes("UTF-8"))
      var h = 0L; var i = 0
      while (i < 8) { h |= (dg(i) & 0xffL) << (8 * i); i += 1 }
      (h >>> 1) % 2001L - 1000L
    }
    val feats1 = Seq("a", "b", "a b", "b a")
    val exp1 = math.floor(1000.0 * feats1.map(w).sum / feats1.size).toLong
    assert(out(0).getLong(2) === exp1, "doc 1 score")
    assert(out(1).getLong(2) === 1000L * w(""),
      "empty text scores its one feature (x1000 milli-units)")
    assert(out(1).isNullAt(1), "null lang rides through")
    assert(out(2).getLong(2) === 1000L * w("solo"), "single token: no bigrams")
  }

  test("qualityClassifier: a null doc_id rides through scored (ADVICE r13)") {
    // the SQL twin scores every non-null-TEXT document regardless of id;
    // the old non-nullable Long encoder would have thrown on the null
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = TextAnalysis.qualityClassifier(
      Seq((Option.empty[Long], Option("en"), "x y"),
          (Some(2L), Option("en"), "x y")).toDF("doc_id", "lang", "text"))
      .orderBy(col("doc_id").asc_nulls_first).collect()
    assert(out.length == 2, "null-id row must be scored, not dropped")
    assert(out(0).isNullAt(0), "id stays null")
    assert(out(0).getLong(2) == out(1).getLong(2), "same text, same score")
  }

  test("qualityClassifier: trailing empty tokens are features (split limit -1)") {
    // "x " -> tokens [x, ""] -> feats {x, "", "x "} — the string_split
    // parity rule every text kernel follows
    import spark.implicits._
    val out = TextAnalysis.qualityClassifier(
      Seq((1L, Option("en"), "x ")).toDF("doc_id", "lang", "text")).collect()
    def w(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val dg = md.digest(f.getBytes("UTF-8"))
      var h = 0L; var i = 0
      while (i < 8) { h |= (dg(i) & 0xffL) << (8 * i); i += 1 }
      (h >>> 1) % 2001L - 1000L
    }
    val feats = Seq("x", "", "x ")
    assert(out(0).getLong(2) ===
      math.floor(1000.0 * feats.map(w).sum / feats.size).toLong)
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
