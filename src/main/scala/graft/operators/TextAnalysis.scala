package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (SURVEY §2.B).
  * All pure column expressions — whole-stage-codegen friendly, no UDFs,
  * embarrassingly parallel (per-row, no shuffle until the final agg).
  */
object TextAnalysis {

  // private[graft]: LlmQueries builds the DuckDB IN-lists from these same
  // values, so the Spark exprs and the SQL twins cannot drift apart.
  private[graft] val StopEn = Seq("the", "a", "of", "and", "to", "in", "is")
  private[graft] val StopEs = Seq("el", "la", "de", "que", "y", "en", "un")
  private[graft] val StopDe = Seq("der", "die", "das", "und", "ist", "ein", "zu")

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Heuristic language ID: stop-word hit counts per candidate language,
    * argmax with ties resolved en > es > de > unknown. (A production
    * n-gram model is the same shape: per-row feature extraction + argmax —
    * deterministic, no shuffle.)
    */
  def langId(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val en = countIn(toks, StopEn); val es = countIn(toks, StopEs)
    val de = countIn(toks, StopDe)
    docs.select(col("doc_id"),
      en.cast("int").as("en_hits"), es.cast("int").as("es_hits"),
      de.cast("int").as("de_hits"),
      when(en === 0 && es === 0 && de === 0, "unknown")
        .when(en >= es && en >= de, "en")
        .when(es >= de, "es")
        .otherwise("de").as("predicted_lang"))
  }

  /** Quality scoring: token count, mean token length, stop-word ratio,
    * alpha-character ratio, and a bounded composite score. Rounding uses
    * the IEEE-portable floor form (graft.functions.Rounding) so results
    * hash-match the SQL oracle on .5 boundaries.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    import graft.functions.Rounding.roundTo
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val alphaLen = length(regexp_replace(col("text"), "[^a-z]", ""))
    val stop = countIn(toks, StopEn)
    docs.select(col("doc_id"),
      nTok.cast("int").as("n_tokens"),
      roundTo(alphaLen.cast("double") / nTok.cast("double"), 2).as("avg_tok_len"),
      roundTo(stop.cast("double") / nTok.cast("double"), 4).as("stop_ratio"),
      // nullif: an EMPTY text has length 0, and x/0 throws under ANSI
      // while DuckDB emits NaN — both engines agree on NULL instead
      roundTo(alphaLen.cast("double") /
        nullif(length(col("text")), lit(0)).cast("double"), 4).as("alpha_ratio"),
      roundTo(least(nTok.cast("double") / 50.0, lit(1.0)) * 0.5 +
        (stop.cast("double") / nTok.cast("double")) * 0.5, 4).as("quality"))
  }

  /** One-pass C4-style quality gate: the composite quality score, the
    * stop-word-argmax predicted language and the token count are computed
    * INLINE in a single projection (no scan-per-signal + join — at 100 TB
    * re-reading the corpus once per filter signal is the difference
    * between one pass and four), then rows are kept when
    * quality >= minQuality, the predicted language agrees with the
    * recorded one, and the token count is inside [minTok, maxTok].
    * Pure map: embarrassingly parallel, no shuffle, whole-stage codegen.
    * The score/argmax expressions are the same ones behind
    * [[qualityScore]]/[[langId]] (oracle-verified per-row); this composes
    * them into the keep/drop decision a curation pipeline actually ships.
    */
  def qualityFilter(docs: DataFrame, minQuality: Double,
                    minTok: Int, maxTok: Int): DataFrame = {
    import graft.functions.Rounding.roundTo
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val en = countIn(toks, StopEn); val es = countIn(toks, StopEs)
    val de = countIn(toks, StopDe)
    val quality = roundTo(least(nTok.cast("double") / 50.0, lit(1.0)) * 0.5 +
      (en.cast("double") / nTok.cast("double")) * 0.5, 4)
    val predicted = when(en === 0 && es === 0 && de === 0, "unknown")
      .when(en >= es && en >= de, "en")
      .when(es >= de, "es")
      .otherwise("de")
    docs
      .withColumn("n_tokens", nTok.cast("int"))
      .withColumn("quality", quality)
      .withColumn("predicted_lang", predicted)
      .filter(col("quality") >= minQuality &&
        col("predicted_lang") === col("lang") &&
        col("n_tokens").between(minTok, maxTok))
  }

  // Gopher-style rule thresholds, shared with the SQL twin via LlmQueries
  // (Rae et al. 2021 §A1.1 shape, bands adapted to the synthetic corpus).
  private[graft] val GopherMinTokens = 50
  private[graft] val GopherMaxTokens = 100000
  private[graft] val GopherMinMeanLen = 3.0
  private[graft] val GopherMaxMeanLen = 10.0
  private[graft] val GopherMinStopHits = 2

  /** Gopher-style per-rule quality flags: one boolean per rule per doc —
    * word-count band, mean-word-length band, minimum stop-word hits, and
    * a max duplicate-2-gram fraction is covered by [[repetitionRatio]]
    * (kept separate: it is a measured kernel, these are pure codegen
    * columns). Null text fails every rule. Downstream aggregates the
    * flags into per-rule drop rates — the diagnostic a curation run
    * reports before committing to a filter.
    */
  def gopherFlags(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val meanLen = length(regexp_replace(col("text"), "[^a-z]", ""))
      .cast("double") / nTok.cast("double")
    val stop = countIn(toks, StopEn)
    def flag(c: Column) = coalesce(c, lit(false))
    docs.select(col("doc_id"), col("lang"),
      flag(nTok.between(GopherMinTokens, GopherMaxTokens)).as("ok_word_count"),
      flag(meanLen.between(GopherMinMeanLen, GopherMaxMeanLen)).as("ok_mean_word_len"),
      flag(stop >= GopherMinStopHits).as("ok_stop_hits"))
  }

  // PII patterns, shared with the SQL twin. Restricted to syntax that
  // Java regex and RE2 (DuckDB) interpret identically: character classes,
  // bounded repetition, no backrefs/lookaround.
  private[graft] val PiiEmail = "[a-z0-9._%+-]+@[a-z0-9-]+\\.[a-z]{2,}"
  private[graft] val PiiIpv4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  private[graft] val PiiPhone = "\\+[0-9]{7,12}"

  /** PII scrub: count and redact emails, IPv4s, and international phone
    * numbers. IP redaction runs FIRST so an IP is never half-eaten by the
    * email pattern's domain tail; each class gets a typed placeholder.
    * Counts are taken on the original text, per class, before any
    * replacement. Pure map — codegen regex per row, no shuffle; at 100 TB
    * this is the same single-pass-over-bytes any scrubber pays.
    */
  def piiScrub(docs: DataFrame): DataFrame = {
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), PiiIpv4, "<IP>"),
        PiiEmail, "<EMAIL>"),
      PiiPhone, "<PHONE>")
    docs.select(col("doc_id"), col("lang"),
      regexp_count(col("text"), lit(PiiEmail)).cast("int").as("n_emails"),
      regexp_count(col("text"), lit(PiiIpv4)).cast("int").as("n_ips"),
      regexp_count(col("text"), lit(PiiPhone)).cast("int").as("n_phones"),
      (length(col("text")) - length(scrubbed)).cast("int").as("chars_removed"),
      scrubbed.as("scrubbed"))
  }

  /** Overlapping token-window chunking: split each doc into windows of
    * `chunkLen` whitespace tokens starting every `stride` tokens (the
    * training-data chunk-with-overlap shape; stride < chunkLen overlaps
    * adjacent chunks by chunkLen - stride tokens). Emits one row per
    * chunk with its token count (the tail chunk is short, never dropped).
    * Pure map + explode: no shuffle, output fan-out is ceil(n/stride)
    * rows per doc — bounded, not quadratic.
    */
  def chunkWindows(docs: DataFrame, chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen >= 1 && stride >= 1,
      s"chunkLen/stride must be >= 1, got $chunkLen/$stride")
    val nTok = size(split(col("text"), " "))
    docs.filter(col("text").isNotNull)
      .withColumn("__n", nTok)
      .withColumn("start",
        explode(sequence(lit(0), col("__n") - 1, lit(stride))))
      .select(col("doc_id"), col("lang"), col("start"),
        least(lit(chunkLen), col("__n") - col("start")).cast("int")
          .as("chunk_tokens"))
  }

  /** Token counting two ways: whitespace split and a BPE-ish regex
    * (letter runs | digit runs | single punctuation), the standard
    * pre-tokenizer shape.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("int").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .cast("int").as("bpe_tokens"))

  /** Deterministic position-weighted document fingerprint:
    * sum over chars of code(c_i) * ((i-1) mod 64 + 1) — an order-sensitive
    * rolling-hash-style signature.
    *
    * Per-partition kernel: the HOF fold (`aggregate(transform(sequence))`)
    * evaluates an interpreted lambda + substr allocation PER CHARACTER —
    * ~1.5 ms/doc, 7 s for a 5 k-doc scan — while this loop is one charAt
    * per character. Identical to the SQL twin for the (all-ASCII/BMP)
    * corpus: charAt == codepoint there. Pure map, no shuffle.
    */
  /** Duplicated word-2-gram fraction per doc (Gopher-style repetition
    * signal): 1 - distinct_grams/total_grams.
    *
    * Per-partition kernel (same rationale as [[fingerprint]]): the HOF
    * form — `transform(sequence(...))` building a gram STRING per element
    * through interpreted `element_at`/`concat_ws`, then `array_distinct`
    * — measured 8.4 s for the 5 k-doc sf0.1 scan; this loop is one split
    * plus a hash-set insert per gram. Exact same distinct-string
    * semantics; the rounding replicates Rounding.roundTo bit-for-bit
    * (floor(x*1e4+0.5)/1e4 in IEEE doubles). Pure map, no shuffle.
    */
  def repetitionRatio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val seen = new java.util.HashSet[String]()
        it.map { case (id, text) =>
          // limit -1: keep trailing empty tokens, matching the oracle's
          // string_split (Java's split(char) silently drops them)
          val toks = if (text == null) Array.empty[String] else text.split(" ", -1)
          // null text has zero grams, not -1 (empty array minus one)
          val n = math.max(toks.length - 1, 0)
          val ratio = if (n > 0) {
            seen.clear()
            var i = 0
            while (i < n) {
              seen.add(toks(i) + " " + toks(i + 1))
              i += 1
            }
            val raw = 1.0 - seen.size.toDouble / n.toDouble
            math.floor(raw * 10000.0 + 0.5) / 10000.0
          } else 0.0
          (id, n, ratio)
        }
      }
      .toDF("doc_id", "n_grams", "rep_ratio")
  }

  /** fastText-style linear quality scorer over HASHED unigram+bigram
    * features with deterministic pseudo-random weights — the shape of the
    * model-based quality filters real pipelines run corpus-wide (CCNet's
    * fastText langid/quality stage), reduced to an engine-reproducible
    * kernel so the whole scorer is hash-oracled rather than rows-only:
    *
    *   features(doc) = distinct(tokens ++ adjacent-bigrams)     (raw order)
    *   w(f)          = (md5_first8_le(f) >>> 1) % 2001 - 1000   (∈ [-1000,1000])
    *   score_milli   = floor(1000 · Σ w(f) / |features|)        (BIGINT)
    *   keep          = score_milli >= 0                         (integer-exact)
    *
    * The token hash is the simhash recipe (first 8 md5 digest bytes,
    * little-endian = DuckDB `md5_number_upper`; `>>> 1` makes the modulus
    * operand non-negative in BOTH engines — DuckDB's UBIGINT vs the JVM's
    * signed `%` would otherwise disagree on sign). Tokenization is
    * `split(text, ' ', -1)` = DuckDB `string_split`, empties kept. A
    * compiled per-partition kernel (one MessageDigest per partition), not
    * an HOF fold — the BPE/winnowing lesson: nested HOF lambdas run
    * interpreted and re-evaluate inlined inputs per element. Pure map +
    * one small aggregate shuffle downstream: linear in executors at
    * 100 TB. Null text → no row (unscorable, the SQL twin's WHERE); a
    * null doc_id rides through scored (Option id — ADVICE r13: the
    * non-nullable Long encoder would have thrown, and the SQL twin
    * scores every non-null-text document regardless of id).
    */
  def qualityClassifier(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("lang"), col("text"))
      .as[(Option[Long], Option[String], String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, lang, text) =>
          if (text == null) None
          else Some((id, lang, scoreMilliOf(md, text)))
        }
      }
      .toDF("doc_id", "lang", "score_milli")
  }

  /** One document's score under the hashed-feature linear model — the
    * [[qualityClassifier]] kernel body, factored out so the composed
    * corpus-build stage ([[CorpusBuild]]) scores with the SAME weights
    * instead of a drift-prone copy. Caller owns the MessageDigest (one
    * per partition, not per row).
    */
  private[operators] def scoreMilliOf(
      md: java.security.MessageDigest, text: String): Long = {
    def w(f: String): Long = {
      val d = md.digest(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var i = 0
      while (i < 8) { h |= (d(i) & 0xffL) << (8 * i); i += 1 }
      (h >>> 1) % 2001L - 1000L
    }
    val toks = text.split(" ", -1)
    val feats = new java.util.LinkedHashSet[String]
    var i = 0
    while (i < toks.length) { feats.add(toks(i)); i += 1 }
    i = 0
    while (i < toks.length - 1) {
      feats.add(toks(i) + " " + toks(i + 1)); i += 1
    }
    var sum = 0L
    val fit = feats.iterator()
    while (fit.hasNext) sum += w(fit.next())
    math.floor(1000.0 * sum / feats.size).toLong
  }

  /** [[qualityClassifier]] with the document carried through — doc_id,
    * lang, source, text, score_milli — so a composed pipeline can gate
    * and keep working on the SAME pass instead of scoring into a
    * side-frame and joining the corpus back on id (the join would drop
    * null-id rows and re-shuffle document bodies). Same kernel, same
    * null-text drop (unscorable → no row).
    */
  def scoredDocs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("lang"), col("source"),
        col("text"))
      .as[(Option[Long], Option[String], Option[String], String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, lang, source, text) =>
          if (text == null) None
          else Some((id, lang, source, text, scoreMilliOf(md, text)))
        }
      }
      .toDF("doc_id", "lang", "source", "text", "score_milli")
  }

  def fingerprint(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          // null text -> null fingerprint (not the 0 an empty text hashes
          // to): the SQL twin's fold over NULL is NULL, and a conflated
          // null/empty would collide distinct documents in a manifest
          if (text == null) (id, None: Option[Long], None: Option[Int])
          else {
            var sum = 0L
            var i = 0
            while (i < text.length) {
              sum += text.charAt(i).toLong * ((i % 64) + 1)
              i += 1
            }
            (id, Some(sum), Some(text.length))
          }
        }
      }
      .toDF("doc_id", "fingerprint", "n_chars_obs")
  }
}
