package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** AVRO deserialization for Kafka-shaped `value` columns under the PUBLIC
  * Confluent wire format — the reference's own declared to-do
  * (`/root/reference/README.md:21`: "Deserialisation with AVRO schema
  * registry is not supported"), shipped here to out-do its surface.
  *
  * Wire format (public spec): 1 magic byte `0x00`, a 4-byte big-endian
  * schema id, then the Avro binary body. The registry is stubbed as a
  * schema-by-id FILE map ([[Registry.fromDir]]: `<id>.avsc` Avro schema
  * JSON files in a directory) — the lookup surface of a real registry
  * without its HTTP server, which a zero-egress sandbox cannot host.
  *
  * Built directly on avro-core (`org.apache.avro`, shipped in
  * `/opt/spark/jars`) because the `spark-avro` external module is not in
  * the sandbox: [[decode]]/[[encode]] are per-partition compiled kernels
  * (reader/writer instances cached per writer-schema id inside the
  * partition, decoder/encoder objects reused) — a pure map, no shuffle,
  * linear in executors at any scale.
  *
  * Schema EVOLUTION is real Avro semantics, not a stub: each record is
  * decoded with `GenericDatumReader(writerSchema(per-record id),
  * readerSchema)`, so v1-written records resolve against a v2 reader
  * (added-with-default / dropped fields) exactly as the Avro spec
  * defines — spec-asserted in AvroWireSpec.
  *
  * Malformed input (null/short payload, wrong magic, unknown id, torn
  * body) decodes to a NULL struct rather than failing the batch — the
  * same poison-pill tolerance the reference applies to invalid UTF-8
  * (`main.rs:240-247`: invalid bytes → `""`), lifted to records.
  *
  * Supported Avro subset (mapped in [[sparkType]]): boolean/int/long/
  * float/double/string/bytes, `union[null, T]` as nullable T,
  * MULTI-branch unions (numeric promotion pairs int|long → long and
  * float|double → double; anything else as a struct of nullable
  * `memberN` fields, one per non-null branch — spark-avro's convention;
  * encode-side branch choice follows Avro's own runtime resolveUnion, so
  * branches must be runtime-distinguishable, the Avro rule), arrays and
  * string-keyed maps of those, enums (as strings), fixed (as bytes),
  * `duration` (fixed-12 → a months/days/millis struct), uuid
  * (canonicalized lowercase string; malformed → null field), records
  * nested to any depth, and the common logical types — decimal (over
  * bytes or fixed), date, timestamp-millis/micros,
  * local-timestamp-millis/micros. Anything outside throws at
  * schema-translation time with the unsupported type named.
  */
object AvroWire {

  /** Confluent wire-format magic byte. */
  val Magic: Byte = 0x00

  /** Schema-by-id registry stub. Schemas travel as JSON strings (parsed
    * lazily per executor — `Schema` caches poorly across serialization).
    */
  final case class Registry(byId: Map[Int, String]) extends Serializable {
    @transient private lazy val parsed: mutable.Map[Int, Schema] =
      mutable.Map.empty
    def schema(id: Int): Option[Schema] = synchronized {
      byId.get(id).map(json =>
        parsed.getOrElseUpdate(id, new Schema.Parser().parse(json)))
    }
  }

  object Registry {
    /** Load `<id>.avsc` files from a directory via the path's own Hadoop
      * filesystem (works for local scratch and object stores alike).
      */
    def fromDir(s: SparkSession, dir: String): Registry = {
      val p = new Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val entries = fs.listStatus(p).toSeq
        .filter(_.getPath.getName.endsWith(".avsc"))
        .map { st =>
          val id = st.getPath.getName.stripSuffix(".avsc").toInt
          val in = fs.open(st.getPath)
          val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
          id -> json
        }
      Registry(entries.toMap)
    }

    /** Write a schema into a file-map registry dir (test/pipeline setup). */
    def register(s: SparkSession, dir: String, id: Int, schemaJson: String): Unit = {
      val p = new Path(dir, s"$id.avsc")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      try out.write(schemaJson.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Avro `duration` is a 12-byte fixed carrying three little-endian
    * uint32s; Avro-Java has no LogicalTypes class for it, so it is
    * detected by the raw schema property.
    */
  private def isDuration(s: Schema): Boolean =
    s.getType == Schema.Type.FIXED && s.getFixedSize == 12 &&
      "duration" == s.getProp("logicalType")

  /** Spark shape of a duration: Spark has no interval COLUMN type, so the
    * three spec components travel as a struct (unsigned-int values that
    * exceed Int.MaxValue — 24 billion years of months — are out of scope).
    */
  val DurationStruct: StructType = StructType(Seq(
    StructField("months", IntegerType, nullable = true),
    StructField("days", IntegerType, nullable = true),
    StructField("millis", IntegerType, nullable = true)))

  private def unionBranches(s: Schema): Seq[Schema] =
    s.getTypes.asScala.filter(_.getType != Schema.Type.NULL).toSeq

  /** Multi-branch unions map like spark-avro's convention: the two
    * numeric-promotion pairs collapse to the wider type; anything else
    * becomes a struct with one nullable `memberN` field per non-null
    * branch (exactly one is set per value).
    */
  private def unionShape(branches: Seq[Schema]): Either[DataType, Unit] = {
    val ts = branches.map(_.getType).toSet
    if (ts == Set(Schema.Type.INT, Schema.Type.LONG)) Left(LongType)
    else if (ts == Set(Schema.Type.FLOAT, Schema.Type.DOUBLE)) Left(DoubleType)
    else Right(())
  }

  /** Spark type for the supported Avro subset; throws naming the
    * unsupported type otherwise. Logical types take precedence over
    * their carrier primitive (a decimal is a decimal, not bytes).
    */
  def sparkType(avro: Schema): DataType = avro.getLogicalType match {
    case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
    case _: LogicalTypes.Date => DateType
    case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
      TimestampType
    case _: LogicalTypes.LocalTimestampMillis | _: LogicalTypes.LocalTimestampMicros =>
      TimestampNTZType
    case _ => avro.getType match {
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT => IntegerType
      case Schema.Type.LONG => LongType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING => StringType
      case Schema.Type.BYTES => BinaryType
      case Schema.Type.ENUM => StringType
      case Schema.Type.FIXED =>
        if (isDuration(avro)) DurationStruct else BinaryType
      case Schema.Type.ARRAY => ArrayType(sparkType(avro.getElementType))
      case Schema.Type.MAP => MapType(StringType, sparkType(avro.getValueType))
      case Schema.Type.UNION =>
        val nonNull = unionBranches(avro)
        if (nonNull.size == 1) sparkType(nonNull.head)
        else unionShape(nonNull) match {
          case Left(promoted) => promoted
          case Right(()) => StructType(nonNull.zipWithIndex.map {
            case (b, i) => StructField(s"member$i", sparkType(b), nullable = true)
          })
        }
      case Schema.Type.RECORD => StructType(avro.getFields.asScala.toSeq.map(f =>
        StructField(f.name, sparkType(f.schema), nullable = true)))
      case other => throw new IllegalArgumentException(
        s"unsupported Avro type $other in $avro")
    }
  }

  private def nonNullBranch(s: Schema): Schema = s.getType match {
    case Schema.Type.UNION =>
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    case _ => s
  }

  private def bufBytes(b: ByteBuffer): Array[Byte] = {
    val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
  }

  /** Avro datum → Spark external value (Utf8 → String, ByteBuffer →
    * Array[Byte], record → Row, enum → String, map → Map, logical
    * decimal/date/timestamp → BigDecimal/Date/Timestamp). Logical types
    * are dispatched on the SCHEMA first — a decimal's carrier ByteBuffer
    * must become a BigDecimal, not raw bytes.
    */
  private def toSpark(datum: Any, schema: Schema): Any = {
    if (datum == null) return null
    if (schema.getType == Schema.Type.UNION) {
      val branches = unionBranches(schema)
      if (branches.size > 1) return unionShape(branches) match {
        case Left(LongType) => datum.asInstanceOf[Number].longValue
        case Left(_) => datum.asInstanceOf[Number].doubleValue
        case Right(()) =>
          // which branch this datum took (Avro's own runtime resolution),
          // mapped to its member slot among the non-null branches
          val branch = schema.getTypes.get(
            GenericData.get().resolveUnion(schema, datum))
          val slot = branches.indexOf(branch)
          Row.fromSeq(branches.indices.map(i =>
            if (i == slot) toSpark(datum, branch) else null))
      }
    }
    val rs = nonNullBranch(schema)
    if (isDuration(rs)) {
      val b = datum.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes()
      def le(o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
      return Row(le(0), le(4), le(8))
    }
    rs.getLogicalType match {
      case _: LogicalTypes.Uuid =>
        // canonical lowercase form; a malformed uuid is a poison FIELD
        try java.util.UUID.fromString(datum.toString).toString
        catch { case _: IllegalArgumentException => null }
      case d: LogicalTypes.Decimal =>
        val unscaled = datum match {
          case b: ByteBuffer => bufBytes(b)
          case f: org.apache.avro.generic.GenericFixed => f.bytes()
        }
        new java.math.BigDecimal(new java.math.BigInteger(unscaled), d.getScale)
      case _: LogicalTypes.Date =>
        java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(datum.asInstanceOf[Int].toLong))
      case _: LogicalTypes.TimestampMillis =>
        new java.sql.Timestamp(datum.asInstanceOf[Long])
      case _: LogicalTypes.TimestampMicros =>
        val micros = datum.asInstanceOf[Long]
        val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        t
      case _: LogicalTypes.LocalTimestampMillis =>
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(datum.asInstanceOf[Long], 1000L),
          (Math.floorMod(datum.asInstanceOf[Long], 1000L) * 1000000L).toInt,
          java.time.ZoneOffset.UTC)
      case _: LogicalTypes.LocalTimestampMicros =>
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(datum.asInstanceOf[Long], 1000000L),
          (Math.floorMod(datum.asInstanceOf[Long], 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case _ => datum match {
        case r: GenericRecord =>
          Row.fromSeq(rs.getFields.asScala.toSeq.map(f =>
            toSpark(r.get(f.pos), f.schema)))
        case u: org.apache.avro.util.Utf8 => u.toString
        case e: org.apache.avro.generic.GenericEnumSymbol[_] => e.toString
        case s: CharSequence => s.toString
        case f: org.apache.avro.generic.GenericFixed => f.bytes().clone()
        case b: ByteBuffer => bufBytes(b)
        case l: java.util.List[_] =>
          val el = rs.getElementType
          l.asScala.toSeq.map(toSpark(_, el))
        case m: java.util.Map[_, _] =>
          val vt = rs.getValueType
          m.asScala.map { case (k, v) => k.toString -> toSpark(v, vt) }.toMap
        case other => other
      }
    }
  }

  /** Spark external value → Avro datum for [[encode]]. Mirrors
    * [[toSpark]]'s logical-type dispatch; decimal encodes over BYTES
    * (decimal-over-fixed is decode-only — the registry schemas this
    * library writes use the bytes carrier).
    */
  private def toAvro(value: Any, schema: Schema): Any = {
    if (value == null) return null
    if (schema.getType == Schema.Type.UNION) {
      val branches = unionBranches(schema)
      if (branches.size > 1) return unionShape(branches) match {
        case Left(LongType) => java.lang.Long.valueOf(
          value.asInstanceOf[Number].longValue)
        case Left(_) => java.lang.Double.valueOf(
          value.asInstanceOf[Number].doubleValue)
        case Right(()) =>
          // struct-of-members: the single set member picks the branch; the
          // converted datum's runtime type then drives Avro's own
          // resolveUnion at write time
          val row = value.asInstanceOf[Row]
          val slot = branches.indices.find(i => !row.isNullAt(i))
          slot.map(i => toAvro(row.get(i), branches(i))).orNull
      }
    }
    val rs = nonNullBranch(schema)
    if (isDuration(rs)) {
      val row = value.asInstanceOf[Row]
      val b = new Array[Byte](12)
      def le(o: Int, v: Int): Unit = {
        b(o) = v.toByte; b(o + 1) = (v >>> 8).toByte
        b(o + 2) = (v >>> 16).toByte; b(o + 3) = (v >>> 24).toByte
      }
      def cmp(i: Int): Int = if (row.isNullAt(i)) 0 else row.getInt(i)
      le(0, cmp(0)); le(4, cmp(1)); le(8, cmp(2))
      return new GenericData.Fixed(rs, b)
    }
    rs.getLogicalType match {
      case _: LogicalTypes.Uuid =>
        java.util.UUID.fromString(value.toString).toString
      case d: LogicalTypes.Decimal =>
        val bd = value.asInstanceOf[java.math.BigDecimal].setScale(d.getScale)
        ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      case _: LogicalTypes.Date =>
        val epochDay = value match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay
          case d: java.time.LocalDate => d.toEpochDay
        }
        java.lang.Integer.valueOf(epochDay.toInt)
      case _: LogicalTypes.TimestampMillis =>
        val millis = value match {
          case t: java.sql.Timestamp => t.getTime
          case i: java.time.Instant => i.toEpochMilli
        }
        java.lang.Long.valueOf(millis)
      case _: LogicalTypes.TimestampMicros =>
        val micros = value match {
          case t: java.sql.Timestamp =>
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          case i: java.time.Instant =>
            i.getEpochSecond * 1000000L + i.getNano / 1000L
        }
        java.lang.Long.valueOf(micros)
      case _: LogicalTypes.LocalTimestampMillis =>
        val ldt = value.asInstanceOf[java.time.LocalDateTime]
        java.lang.Long.valueOf(
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000L +
            ldt.getNano / 1000000L)
      case _: LogicalTypes.LocalTimestampMicros =>
        val ldt = value.asInstanceOf[java.time.LocalDateTime]
        java.lang.Long.valueOf(
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            ldt.getNano / 1000L)
      case _ => value match {
        case r: Row =>
          val rec = new GenericData.Record(rs)
          rs.getFields.asScala.foreach(f =>
            rec.put(f.pos, toAvro(r.get(f.pos), f.schema)))
          rec
        case b: Array[Byte] if rs.getType == Schema.Type.FIXED =>
          new GenericData.Fixed(rs, b)
        case b: Array[Byte] => ByteBuffer.wrap(b)
        case s: String if rs.getType == Schema.Type.ENUM =>
          new GenericData.EnumSymbol(rs, s)
        case sq: scala.collection.Seq[_] =>
          val el = rs.getElementType
          sq.map(toAvro(_, el)).asJava
        case m: scala.collection.Map[_, _] =>
          val vt = rs.getValueType
          m.map { case (k, v) => k.toString -> toAvro(v, vt) }.toMap.asJava
        case f: Float => java.lang.Float.valueOf(f)
        case other => other
      }
    }
  }

  /** Decode a Confluent-framed binary column against `readerSchemaId`'s
    * schema: appends a struct column `outCol` (the deserialized record;
    * NULL for malformed/unknown input). Per-record writer schemas are
    * resolved by their framed id — Avro schema evolution.
    */
  def decode(df: DataFrame, binCol: String, registry: Registry,
      readerSchemaId: Int, outCol: String = "avro"): DataFrame = {
    val readerJson = registry.byId.getOrElse(readerSchemaId,
      throw new IllegalArgumentException(s"reader schema id $readerSchemaId not in registry"))
    val readerStruct =
      sparkType(new Schema.Parser().parse(readerJson)) match {
        case st: StructType => st
        case other => throw new IllegalArgumentException(
          s"reader schema must be a record, mapped to $other")
      }
    val inSchema = df.schema
    val binIdx = inSchema.fieldIndex(binCol)
    val outSchema = StructType(inSchema.fields :+
      StructField(outCol, readerStruct, nullable = true))
    df.mapPartitions { it =>
      val reg = registry
      val reader = new Schema.Parser().parse(readerJson)
      val readers = mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
      var decoder: org.apache.avro.io.BinaryDecoder = null
      it.map { row =>
        val bytes = row.get(binIdx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        val decoded: Any =
          if (bytes == null || bytes.length < 5 || bytes(0) != Magic) null
          else {
            val id = ((bytes(1) & 0xFF) << 24) | ((bytes(2) & 0xFF) << 16) |
              ((bytes(3) & 0xFF) << 8) | (bytes(4) & 0xFF)
            reg.schema(id) match {
              case None => null
              case Some(writer) =>
                try {
                  val r = readers.getOrElseUpdate(id,
                    new GenericDatumReader[GenericRecord](writer, reader))
                  decoder = DecoderFactory.get()
                    .binaryDecoder(bytes, 5, bytes.length - 5, decoder)
                  toSpark(r.read(null, decoder), reader)
                } catch { case scala.util.control.NonFatal(_) => null }
            }
          }
        Row.fromSeq(row.toSeq :+ decoded)
      }
    }(Encoders.row(outSchema))
  }

  /** Encode the named columns as a Confluent-framed binary column
    * `outCol` under `schemaId`'s record schema (fields are matched by
    * name against the DataFrame's columns).
    */
  def encode(df: DataFrame, registry: Registry, schemaId: Int,
      outCol: String = "value"): DataFrame = {
    val json = registry.byId.getOrElse(schemaId,
      throw new IllegalArgumentException(s"schema id $schemaId not in registry"))
    val schema0 = new Schema.Parser().parse(json)
    val fieldCols = schema0.getFields.asScala.toSeq.map(_.name)
    val inSchema = df.schema
    val idxs = fieldCols.map(inSchema.fieldIndex)
    val outSchema = StructType(inSchema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    df.mapPartitions { it =>
      val schema = new Schema.Parser().parse(json)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val bos = new ByteArrayOutputStream()
      var encoder: org.apache.avro.io.BinaryEncoder = null
      it.map { row =>
        val rec = new GenericData.Record(schema)
        schema.getFields.asScala.zip(idxs).foreach { case (f, i) =>
          rec.put(f.pos, toAvro(row.get(i), f.schema))
        }
        bos.reset()
        bos.write(Magic)
        bos.write((schemaId >>> 24) & 0xFF); bos.write((schemaId >>> 16) & 0xFF)
        bos.write((schemaId >>> 8) & 0xFF); bos.write(schemaId & 0xFF)
        encoder = EncoderFactory.get().directBinaryEncoder(bos, encoder)
        writer.write(rec, encoder)
        encoder.flush()
        Row.fromSeq(row.toSeq :+ bos.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  /** Avro record-schema JSON for a Spark schema subset — the helper that
    * keeps query/spec schemas single-sourced.
    */
  def avroSchemaJson(name: String, st: StructType): String = {
    var nested = 0 // Avro record names must be unique within a schema
    def typ(dt: DataType, nullable: Boolean): String = {
      val base = dt match {
        case BooleanType => "\"boolean\""
        case IntegerType => "\"int\""
        case LongType => "\"long\""
        case FloatType => "\"float\""
        case DoubleType => "\"double\""
        case StringType => "\"string\""
        case BinaryType => "\"bytes\""
        case d: DecimalType =>
          s"""{"type":"bytes","logicalType":"decimal","precision":${d.precision},"scale":${d.scale}}"""
        case DateType => """{"type":"int","logicalType":"date"}"""
        case TimestampType =>
          """{"type":"long","logicalType":"timestamp-micros"}"""
        case TimestampNTZType =>
          """{"type":"long","logicalType":"local-timestamp-micros"}"""
        case ArrayType(el, elNullable) =>
          s"""{"type":"array","items":${typ(el, elNullable)}}"""
        case MapType(StringType, v, vNullable) =>
          s"""{"type":"map","values":${typ(v, vNullable)}}"""
        case nestedSt: StructType =>
          nested += 1
          record(s"${name}_n$nested", nestedSt)
        case other => throw new IllegalArgumentException(
          s"unsupported Spark type for Avro mapping: $other")
      }
      if (nullable) s"""["null",$base]""" else base
    }
    def record(recName: String, rst: StructType): String = {
      val fields = rst.fields.map(f =>
        s"""{"name":"${f.name}","type":${typ(f.dataType, f.nullable)}${
          if (f.nullable) ",\"default\":null" else ""}}""").mkString(",")
      s"""{"type":"record","name":"$recName","fields":[$fields]}"""
    }
    record(name, st)
  }
}
