package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{CorpusIngest, EmbedIngest, FuzzyIngest}

/** Admin CLI for the persistent dedup indexes — the operational face of
  * the lifecycle verbs (ingest runs under [[PipelineCli]] / the
  * streaming entry points; this tool covers everything else an operator
  * does to a live index). Deliberately SEPARATE from [[PipelineCli]],
  * whose flag surface mirrors the reference's clap definition exactly
  * and must stay fidelity-clean.
  *
  * {{{
  * IndexCli manifest stats   <dir>
  * IndexCli manifest compact <dir> --up-to <batch>
  * IndexCli manifest retract <dir> --ids <id,id,...> | --ids-parquet <path>
  * IndexCli manifest expire  <dir> --older-than <batch>
  * IndexCli manifest merge   <aDir> <bDir> <dstDir>
  * IndexCli fuzzy    <same verbs>
  * IndexCli embed    <same verbs>
  * }}}
  *
  * Exit codes: 0 ok, 2 usage error, 1 operation failure (e.g. newest
  * batch guard, missing index) — the require() message is printed.
  */
object IndexCli {

  val Kinds = Set("manifest", "fuzzy", "embed")

  val usage: String =
    """usage: IndexCli <manifest|fuzzy|embed> <verb> <args>
      |  stats   <dir>
      |  compact <dir> --up-to <batch>
      |  retract <dir> --ids <id,id,...> | --ids-parquet <path>
      |  expire  <dir> --older-than <batch>
      |  merge   <aDir> <bDir> <dstDir>""".stripMargin

  sealed trait Cmd { def kind: String }
  case class Stats(kind: String, dir: String) extends Cmd
  case class Compact(kind: String, dir: String, upTo: Long) extends Cmd
  case class Retract(kind: String, dir: String, ids: Seq[Long],
      idsParquet: Option[String]) extends Cmd
  case class Expire(kind: String, dir: String, olderThan: Long) extends Cmd
  case class Merge(kind: String, a: String, b: String, dst: String) extends Cmd

  def parse(args: Array[String]): Either[String, Cmd] = {
    def long(flag: String, v: String): Either[String, Long] =
      v.toLongOption.toRight(s"$flag must be an integer, got: $v")
    args.toList match {
      case kind :: rest if Kinds(kind) =>
        rest match {
          case "stats" :: dir :: Nil => Right(Stats(kind, dir))
          case "compact" :: dir :: "--up-to" :: v :: Nil =>
            long("--up-to", v).map(Compact(kind, dir, _))
          case "retract" :: dir :: "--ids" :: v :: Nil =>
            val ids = v.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
            if (ids.isEmpty) Left("--ids: empty id list")
            else if (ids.exists(_.toLongOption.isEmpty))
              Left(s"--ids: non-integer id in: $v")
            else Right(Retract(kind, dir, ids.map(_.toLong), None))
          case "retract" :: dir :: "--ids-parquet" :: p :: Nil =>
            Right(Retract(kind, dir, Nil, Some(p)))
          case "expire" :: dir :: "--older-than" :: v :: Nil =>
            long("--older-than", v).map(Expire(kind, dir, _))
          case "merge" :: a :: b :: dst :: Nil => Right(Merge(kind, a, b, dst))
          case other => Left(s"bad $kind invocation: ${other.mkString(" ")}")
        }
      case other => Left("first argument must be manifest|fuzzy|embed, got: " +
        other.headOption.getOrElse("<none>"))
    }
  }

  /** Runs the command; returns the one-line human summary it printed. */
  def run(s: SparkSession, cmd: Cmd): String = {
    import s.implicits._
    def idsFrame(ids: Seq[Long], parquet: Option[String],
        idCol: String): DataFrame =
      parquet match {
        case Some(p) => s.read.parquet(p).select(col(idCol))
        case None => ids.toDF(idCol)
      }
    def perBatch(df: DataFrame): String =
      df.groupBy(col("batch")).agg(count(lit(1)).as("n"))
        .orderBy(col("batch")).collect()
        .map(r => s"${r.get(0)}:${r.getLong(1)}").mkString(" ")
    val line = cmd match {
      case Stats("manifest", dir) =>
        val m = CorpusIngest.manifest(s, dir)
        s"manifest $dir rows=${m.count()} first_batch[${perBatch(m)}]"
      // reconcile BEFORE s.table (ADVICE r12): the band tables exist only
      // in the catalog after a reconcile registers them from disk — in the
      // CLI's fresh-session deployment path a bare s.table would throw
      // TABLE_OR_VIEW_NOT_FOUND even though the index is on disk
      case Stats("fuzzy", dir) =>
        require(FuzzyIngest.reconcile(s, dir), s"no fuzzy index at $dir")
        val idx = FuzzyIngest.index(s, dir)
        val bands = FuzzyIngest.bands(s, dir).count()
        s"fuzzy $dir sigs=${idx.count()} bands=$bands first_batch[${perBatch(idx)}]"
      case Stats(_, dir) =>
        require(EmbedIngest.reconcile(s, dir), s"no embed index at $dir")
        val idx = EmbedIngest.index(s, dir)
        val bands = EmbedIngest.bands(s, dir).count()
        s"embed $dir vecs=${idx.count()} bands=$bands first_batch[${perBatch(idx)}]"
      case Compact("manifest", dir, upTo) =>
        CorpusIngest.compact(s, dir, upTo); s"manifest $dir compacted upTo=$upTo"
      case Compact("fuzzy", dir, upTo) =>
        FuzzyIngest.compact(s, dir, upTo); s"fuzzy $dir compacted upTo=$upTo"
      case Compact(_, dir, upTo) =>
        EmbedIngest.compact(s, dir, upTo); s"embed $dir compacted upTo=$upTo"
      case Retract("manifest", dir, ids, pq) =>
        val n = CorpusIngest.retract(s, dir, idsFrame(ids, pq, "doc_id"))
        s"manifest $dir retracted rows=$n"
      case Retract("fuzzy", dir, ids, pq) =>
        val n = FuzzyIngest.retract(s, dir, idsFrame(ids, pq, "doc_id"))
        s"fuzzy $dir retracted sigs=$n"
      case Retract(_, dir, ids, pq) =>
        val n = EmbedIngest.retract(s, dir, idsFrame(ids, pq, "vec_id"))
        s"embed $dir retracted vecs=$n"
      case Expire("manifest", dir, older) =>
        val n = CorpusIngest.expire(s, dir, older)
        s"manifest $dir expired rows=$n olderThan=$older"
      case Expire("fuzzy", dir, older) =>
        val n = FuzzyIngest.expire(s, dir, older)
        s"fuzzy $dir expired sigs=$n olderThan=$older"
      case Expire(_, dir, older) =>
        val n = EmbedIngest.expire(s, dir, older)
        s"embed $dir expired vecs=$n olderThan=$older"
      case Merge("manifest", a, b, dst) =>
        val n = CorpusIngest.merge(s, a, b, dst)
        s"manifest merged $a + $b -> $dst rows=$n"
      case Merge("fuzzy", a, b, dst) =>
        val n = FuzzyIngest.merge(s, a, b, dst)
        s"fuzzy merged $a + $b -> $dst sigs=$n"
      case Merge(_, a, b, dst) =>
        val n = EmbedIngest.merge(s, a, b, dst)
        s"embed merged $a + $b -> $dst vecs=$n"
    }
    println(line)
    line
  }

  def main(args: Array[String]): Unit =
    parse(args) match {
      case Left(err) =>
        System.err.println(s"error: $err")
        System.err.println(usage)
        sys.exit(2)
      case Right(cmd) =>
        graft.JvmGuard.assertSparkModuleAccess()
        val spark = SparkSession.builder()
          .appName("graft-index-admin")
          .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
          .getOrCreate()
        // NonFatal, not just IllegalArgumentException (ADVICE r12):
        // documented operation failures also surface as
        // IllegalStateException (writer-lease conflict) and
        // AnalysisException (missing tables) — all must honor the
        // 'exit 1 with the message printed' contract, not stack-trace out
        try run(spark, cmd)
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"error: ${e.getMessage}")
            sys.exit(1)
        } finally spark.stop()
    }
}
