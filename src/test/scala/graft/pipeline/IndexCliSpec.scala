package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.CorpusIngest

/** The admin CLI over the index lifecycle: flag parsing (loud on every
  * malformed shape) and an end-to-end drive of each verb against a
  * scratch manifest through [[IndexCli.run]].
  */
class IndexCliSpec extends SparkSpec {
  import spark.implicits._

  test("parse: every verb and every malformed shape") {
    import IndexCli._
    assert(parse(Array("manifest", "stats", "/x")) == Right(Stats("manifest", "/x")))
    assert(parse(Array("fuzzy", "compact", "/x", "--up-to", "3")) ==
      Right(Compact("fuzzy", "/x", 3L)))
    assert(parse(Array("manifest", "retract", "/x", "--ids", "1,2,3")) ==
      Right(Retract("manifest", "/x", Seq(1L, 2L, 3L), None)))
    assert(parse(Array("manifest", "retract", "/x", "--ids-parquet", "/p")) ==
      Right(Retract("manifest", "/x", Nil, Some("/p"))))
    assert(parse(Array("embed", "stats", "/y")) == Right(Stats("embed", "/y")))
    assert(parse(Array("fuzzy", "expire", "/x", "--older-than", "7")) ==
      Right(Expire("fuzzy", "/x", 7L)))
    assert(parse(Array("manifest", "merge", "/a", "/b", "/d")) ==
      Right(Merge("manifest", "/a", "/b", "/d")))
    // malformed
    assert(parse(Array("nope", "stats", "/x")).isLeft)
    assert(parse(Array("manifest", "stats")).isLeft)
    assert(parse(Array("manifest", "compact", "/x", "--up-to", "x")).isLeft)
    assert(parse(Array("manifest", "retract", "/x", "--ids", "1,a")).isLeft)
    assert(parse(Array("manifest", "retract", "/x", "--ids", "")).isLeft)
    assert(parse(Array("manifest", "expire", "/x")).isLeft)
    assert(parse(Array("manifest", "merge", "/a", "/b")).isLeft)
  }

  test("end-to-end: stats, retract, expire, compact, merge against a scratch manifest") {
    val base = graft.util.Scratch.fresh("index_cli")
    val mkDocs = (off: Long, pad: String) =>
      Seq((1L + off, s"some document text one $pad", "en"),
        (2L + off, s"another document body two $pad", "de"))
        .toDF("doc_id", "text", "lang")
    CorpusIngest.ingestBatch(mkDocs(0L, "b0"), 0L, s"$base/m")
    CorpusIngest.ingestBatch(mkDocs(10L, "b1"), 1L, s"$base/m")
    CorpusIngest.ingestBatch(mkDocs(20L, "b2"), 2L, s"$base/m")

    val stats = IndexCli.run(spark, IndexCli.Stats("manifest", s"$base/m"))
    assert(stats.contains("rows=6"), stats)

    val ret = IndexCli.run(spark,
      IndexCli.Retract("manifest", s"$base/m", Seq(1L), None))
    assert(ret.contains("rows=1"), ret)

    val exp = IndexCli.run(spark, IndexCli.Expire("manifest", s"$base/m", 0L))
    assert(exp.contains("rows=1"), exp) // doc 2 (doc 1 already retracted)

    IndexCli.run(spark, IndexCli.Compact("manifest", s"$base/m", 1L))

    CorpusIngest.ingestBatch(mkDocs(30L, "b0"), 0L, s"$base/m2")
    val mg = IndexCli.run(spark,
      IndexCli.Merge("manifest", s"$base/m", s"$base/m2", s"$base/dst"))
    assert(mg.contains("rows=6"), mg) // 4 surviving + 2 from m2

    // ids-parquet path
    Seq(11L).toDF("doc_id").write.parquet(s"$base/ids")
    val ret2 = IndexCli.run(spark,
      IndexCli.Retract("manifest", s"$base/dst", Nil, Some(s"$base/ids")))
    assert(ret2.contains("rows=1"), ret2)
  }

  test("fuzzy/embed stats reconcile an on-disk index the catalog has never seen") {
    // ADVICE r12: the CLI's real deployment path is a FRESH SparkSession
    // whose catalog has no entry for the index tables — stats must
    // register them from disk (reconcile) before s.table, not assume the
    // ingest ran in the same session. Simulated here by dropping the
    // catalog entries after ingest.
    import graft.streaming.{EmbedIngest, FuzzyIngest}
    val base = graft.util.Scratch.fresh("index_cli_fresh")
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    FuzzyIngest.ingestBatch(
      Seq((1L, text, "en")).toDF("doc_id", "text", "lang"), 0L, s"$base/f")
    def unit(i: Int): Array[Float] = { val v = Array.fill(8)(0.0f); v(i) = 1.0f; v }
    EmbedIngest.ingestBatch(
      Seq((1L, unit(0), 0)).toDF("vec_id", "embedding", "label"), 0L, s"$base/e")
    Seq(FuzzyIngest.idxTable(spark, s"$base/f"),
        EmbedIngest.idxTable(spark, s"$base/e"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    val fs = IndexCli.run(spark, IndexCli.Stats("fuzzy", s"$base/f"))
    assert(fs.contains("sigs=1"), fs)
    val es = IndexCli.run(spark, IndexCli.Stats("embed", s"$base/e"))
    assert(es.contains("vecs=1"), es)
    // and a MISSING index fails the documented way (require message),
    // not with a raw AnalysisException from s.table
    val e = intercept[IllegalArgumentException] {
      IndexCli.run(spark, IndexCli.Stats("fuzzy", s"$base/nothing"))
    }
    assert(e.getMessage.contains("no fuzzy index"), e.getMessage)
  }

  test("embed kind routes to EmbedIngest") {
    import graft.streaming.EmbedIngest
    val base = graft.util.Scratch.fresh("index_cli_embed")
    def unit(i: Int): Array[Float] = { val v = Array.fill(8)(0.0f); v(i) = 1.0f; v }
    EmbedIngest.ingestBatch(
      Seq((1L, unit(0), 0), (2L, unit(1), 1)).toDF("vec_id", "embedding", "label"),
      0L, s"$base/e")
    EmbedIngest.ingestBatch(
      Seq((3L, unit(2), 2)).toDF("vec_id", "embedding", "label"), 1L, s"$base/e")
    val stats = IndexCli.run(spark, IndexCli.Stats("embed", s"$base/e"))
    assert(stats.contains("vecs=3"), stats)
    val ret = IndexCli.run(spark,
      IndexCli.Retract("embed", s"$base/e", Seq(1L), None))
    assert(ret.contains("vecs=1"), ret)
    val exp = IndexCli.run(spark, IndexCli.Expire("embed", s"$base/e", 0L))
    assert(exp.contains("vecs=1"), exp)
  }
}
