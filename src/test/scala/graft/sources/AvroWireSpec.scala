package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Confluent-wire AVRO leg (r11 — the reference's own declared to-do):
  * framing, registry lookup, schema evolution, poison-pill tolerance,
  * and the streaming pipeline composition.
  */
class AvroWireSpec extends SparkSpec {
  import spark.implicits._

  private val v1Json =
    """{"type":"record","name":"ev","fields":[
         {"name":"id","type":"long"},
         {"name":"name","type":["null","string"],"default":null}]}"""
  private val v2Json =
    """{"type":"record","name":"ev","fields":[
         {"name":"id","type":"long"},
         {"name":"name","type":["null","string"],"default":null},
         {"name":"score","type":["null","double"],"default":null}]}"""

  private def freshRegistry(schemas: (Int, String)*): AvroWire.Registry = {
    val dir = graft.util.Scratch.fresh("avro_registry_" + schemas.map(_._1).mkString("_"))
    schemas.foreach { case (id, json) =>
      AvroWire.Registry.register(spark, dir, id, json)
    }
    AvroWire.Registry.fromDir(spark, dir)
  }

  test("avro->spark type mapping covers the subset; unsupported types throw by name") {
    val st = AvroWire.sparkType(new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
           {"name":"b","type":"boolean"},{"name":"i","type":"int"},
           {"name":"l","type":"long"},{"name":"f","type":"float"},
           {"name":"d","type":"double"},{"name":"s","type":"string"},
           {"name":"y","type":"bytes"},
           {"name":"ns","type":["null","string"]},
           {"name":"a","type":{"type":"array","items":"long"}}]}"""))
    assert(st === StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("y", BinaryType), StructField("ns", StringType),
      StructField("a", ArrayType(LongType)))))
    // multi-branch unions joined the subset in the r11 extension:
    // numeric-promotion pairs collapse, everything else is member-struct
    assert(AvroWire.sparkType(new org.apache.avro.Schema.Parser().parse(
      """["int","long"]""")) === LongType)
    assert(AvroWire.sparkType(new org.apache.avro.Schema.Parser().parse(
      """["null","float","double"]""")) === DoubleType)
    assert(AvroWire.sparkType(new org.apache.avro.Schema.Parser().parse(
      """["int","string"]""")) === StructType(Seq(
      StructField("member0", IntegerType), StructField("member1", StringType))))
    // a genuinely unmapped type still throws by name
    val e = intercept[IllegalArgumentException](
      AvroWire.sparkType(new org.apache.avro.Schema.Parser().parse(
        """"null"""")))
    assert(e.getMessage.toLowerCase.contains("null"))
  }

  test("extended subset mapping: map/enum/fixed/nested record/logical types") {
    val st = AvroWire.sparkType(new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
           {"name":"m","type":{"type":"map","values":"long"}},
           {"name":"e","type":{"type":"enum","name":"col","symbols":["RED","BLUE"]}},
           {"name":"x","type":{"type":"fixed","name":"f16","size":16}},
           {"name":"n","type":{"type":"record","name":"inner","fields":[
             {"name":"a","type":"int"}]}},
           {"name":"dec","type":{"type":"bytes","logicalType":"decimal","precision":15,"scale":2}},
           {"name":"day","type":{"type":"int","logicalType":"date"}},
           {"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}},
           {"name":"lts","type":{"type":"long","logicalType":"local-timestamp-micros"}}]}"""))
    assert(st === StructType(Seq(
      StructField("m", MapType(StringType, LongType)),
      StructField("e", StringType),
      StructField("x", BinaryType),
      StructField("n", StructType(Seq(StructField("a", IntegerType)))),
      StructField("dec", DecimalType(15, 2)),
      StructField("day", DateType),
      StructField("ts", TimestampType),
      StructField("lts", TimestampNTZType))))
  }

  test("roundtrip: map, nested struct, decimal, date, ntz timestamp survive the wire") {
    val src = Seq(
      (1L, Map("a" -> 1L, "b" -> 2L), ("x", 7),
        new java.math.BigDecimal("12345.67"),
        java.sql.Date.valueOf("1997-03-14"),
        java.time.LocalDateTime.parse("1997-03-14T12:34:56.123456")),
      (2L, Map.empty[String, Long], ("y", -1),
        new java.math.BigDecimal("-0.05"),
        java.sql.Date.valueOf("1969-12-31"), // pre-epoch: negative epochDay
        java.time.LocalDateTime.parse("1969-12-31T23:59:59.000001")))
      .toDF("id", "m", "n", "dec", "day", "lts")
      .withColumn("dec", col("dec").cast("decimal(15,2)"))
    val reg = freshRegistry(9 -> AvroWire.avroSchemaJson("wide", src.schema))
    val back = AvroWire.decode(
        AvroWire.encode(src, reg, 9).select(col("value")), "value", reg, 9)
      .select(col("avro.*"))
    // decode maps every level nullable (Avro union semantics)
    assert(back.schema === StructType(Seq(
      StructField("id", LongType),
      StructField("m", MapType(StringType, LongType)),
      StructField("n", StructType(Seq(
        StructField("_1", StringType), StructField("_2", IntegerType)))),
      StructField("dec", DecimalType(15, 2)),
      StructField("day", DateType),
      StructField("lts", TimestampNTZType))))
    val rows = back.collect().map(r => (r.getLong(0), r.getMap[String, Long](1).toMap,
      r.getStruct(2), r.getDecimal(3), r.getDate(4).toString,
      r.getAs[java.time.LocalDateTime](5))).toSet
    assert(rows === Set(
      (1L, Map("a" -> 1L, "b" -> 2L), Row("x", 7),
        new java.math.BigDecimal("12345.67"), "1997-03-14",
        java.time.LocalDateTime.parse("1997-03-14T12:34:56.123456")),
      (2L, Map.empty[String, Long], Row("y", -1),
        new java.math.BigDecimal("-0.05"), "1969-12-31",
        java.time.LocalDateTime.parse("1969-12-31T23:59:59.000001"))))
  }

  test("decode-only carriers: enum and decimal-over-fixed resolve from a foreign writer") {
    // a record only an external producer would write: enum symbol + a
    // decimal carried over FIXED(4) — encode it with avro-core directly
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val json =
      """{"type":"record","name":"ext","fields":[
           {"name":"c","type":{"type":"enum","name":"col","symbols":["RED","BLUE"]}},
           {"name":"p","type":{"type":"fixed","name":"d4","size":4,
             "logicalType":"decimal","precision":7,"scale":3}}]}"""
    val schema = new org.apache.avro.Schema.Parser().parse(json)
    val rec = new GenericData.Record(schema)
    rec.put("c", new GenericData.EnumSymbol(schema.getField("c").schema(), "BLUE"))
    // unscaled 1234567 → 1234.567 at scale 3, big-endian sign-extended to 4 bytes
    val unscaled = java.math.BigInteger.valueOf(1234567L).toByteArray
    val padded = new Array[Byte](4)
    System.arraycopy(unscaled, 0, padded, 4 - unscaled.length, unscaled.length)
    rec.put("p", new GenericData.Fixed(schema.getField("p").schema(), padded))
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(0x00); bos.write(0); bos.write(0); bos.write(0); bos.write(5)
    val enc = org.apache.avro.io.EncoderFactory.get().directBinaryEncoder(bos, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    val reg = freshRegistry(5 -> json)
    val out = AvroWire.decode(
        Seq(Tuple1(bos.toByteArray)).toDF("value"), "value", reg, 5)
      .select(col("avro.c"), col("avro.p")).collect().head
    assert(out.getString(0) === "BLUE")
    assert(out.getDecimal(1) === new java.math.BigDecimal("1234.567"))
  }

  test("multi-branch unions: member-struct and numeric promotion roundtrip") {
    val json =
      """{"type":"record","name":"mb","fields":[
           {"name":"u","type":["null","string","long"],"default":null},
           {"name":"p","type":["int","long"]},
           {"name":"q","type":["null","float","double"],"default":null}]}"""
    val reg = freshRegistry(9 -> json)
    // u: string branch / null / long branch; p promotes to long; q to double
    val src = Seq(
      (1L, Some("txt"), None: Option[Long], 5L, Some(1.5)),
      (2L, None, Some(42L), 7L, None),
      (3L, None, None, 8L, Some(2.25))
    ).toDF("row_id", "m0", "m1", "p", "q")
      .select(col("row_id"),
        when(col("m0").isNotNull || col("m1").isNotNull,
          struct(col("m0").as("member0"), col("m1").as("member1"))).as("u"),
        col("p"), col("q"))
    val framed = AvroWire.encode(src, reg, 9)
      .select(col("row_id"), col("value"))
    val back = AvroWire.decode(framed, "value", reg, 9)
      .select(col("row_id"), col("avro.u.member0"), col("avro.u.member1"),
        col("avro.p"), col("avro.q"))
      .as[(Long, Option[String], Option[Long], Long, Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(back(1L) === ((Some("txt"), None, 5L, Some(1.5))))
    assert(back(2L) === ((None, Some(42L), 7L, None)))
    assert(back(3L) === ((None, None, 8L, Some(2.25))))
  }

  test("duration fixed-12 roundtrips as months/days/millis, little-endian on the wire") {
    val json =
      """{"type":"record","name":"dr","fields":[
           {"name":"d","type":{"type":"fixed","name":"dur12","size":12,"logicalType":"duration"}}]}"""
    assert(AvroWire.sparkType(new org.apache.avro.Schema.Parser().parse(json))
      === StructType(Seq(StructField("d", AvroWire.DurationStruct))))
    val reg = freshRegistry(11 -> json)
    val src = spark.sql(
      "SELECT named_struct('months', 14, 'days', 3, 'millis', 16909060) AS d")
    val framed = AvroWire.encode(src, reg, 11).select(col("value"))
    // wire bytes after the 5-byte frame ARE the fixed: three LE uint32s
    // (16909060 = 0x01020304 → bytes 04 03 02 01)
    val raw = framed.as[Array[Byte]].head().drop(5)
    assert(raw.toSeq === Seq[Byte](14, 0, 0, 0, 3, 0, 0, 0, 4, 3, 2, 1))
    val out = AvroWire.decode(framed, "value", reg, 11)
      .select(col("avro.d.months"), col("avro.d.days"), col("avro.d.millis"))
      .as[(Int, Int, Int)].head()
    assert(out === ((14, 3, 16909060)))
  }

  test("uuid canonicalizes to lowercase; a malformed uuid nulls the FIELD only") {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val json =
      """{"type":"record","name":"uu","fields":[
           {"name":"id","type":"long"},
           {"name":"g","type":{"type":"string","logicalType":"uuid"}}]}"""
    val reg = freshRegistry(13 -> json)
    val up = "123E4567-E89B-12D3-A456-426614174000"
    val rt = AvroWire.decode(
        AvroWire.encode(Seq((7L, up)).toDF("id", "g"), reg, 13)
          .select(col("value")), "value", reg, 13)
      .select(col("avro.id"), col("avro.g")).as[(Long, String)].head()
    assert(rt === ((7L, up.toLowerCase)))
    // foreign writer emits a non-uuid string: the field nulls, the record survives
    val schema = new org.apache.avro.Schema.Parser().parse(json)
    val rec = new GenericData.Record(schema)
    rec.put("id", java.lang.Long.valueOf(8L))
    rec.put("g", "not-a-uuid")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(0x00); bos.write(0); bos.write(0); bos.write(0); bos.write(13)
    val enc = org.apache.avro.io.EncoderFactory.get().directBinaryEncoder(bos, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    val bad = AvroWire.decode(
        Seq(Tuple1(bos.toByteArray)).toDF("value"), "value", reg, 13)
      .select(col("avro.id"), col("avro.g").isNull).as[(Long, Boolean)].head()
    assert(bad === ((8L, true)))
  }

  test("encode->decode identity roundtrip, nulls through the union branch") {
    val reg = freshRegistry(1 -> v1Json)
    val src = Seq((1L, Some("alpha")), (2L, None), (3L, Some("gamma")))
      .toDF("id", "name")
    val framed = AvroWire.encode(src, reg, 1).select(col("value"))
    val back = AvroWire.decode(framed, "value", reg, 1)
      .select(col("avro.id").as("id"), col("avro.name").as("name"))
      .as[(Long, Option[String])].collect().toSet
    assert(back === Set((1L, Some("alpha")), (2L, None), (3L, Some("gamma"))))
    // frame shape: magic 0x00 + big-endian id 1
    val bytes = framed.as[Array[Byte]].head()
    assert(bytes(0) === 0x00.toByte)
    assert(Seq(bytes(1), bytes(2), bytes(3), bytes(4)) ===
      Seq(0x00.toByte, 0x00.toByte, 0x00.toByte, 0x01.toByte))
  }

  test("schema evolution: v1-written records resolve against the v2 reader (default fills)") {
    val reg = freshRegistry(1 -> v1Json, 2 -> v2Json)
    val v1rows = AvroWire.encode(
      Seq((10L, Some("old"))).toDF("id", "name"), reg, 1).select(col("value"))
    val v2rows = AvroWire.encode(
      Seq((20L, Some("new"), Some(0.5))).toDF("id", "name", "score"), reg, 2)
      .select(col("value"))
    // one topic, two writer generations, ONE reader schema (v2)
    val decoded = AvroWire.decode(v1rows.union(v2rows), "value", reg, 2)
      .select(col("avro.id"), col("avro.name"), col("avro.score"))
      .as[(Long, Option[String], Option[Double])].collect().toSet
    assert(decoded === Set((10L, Some("old"), None), (20L, Some("new"), Some(0.5))))
  }

  test("poison pills decode to a NULL struct, never fail the batch") {
    val reg = freshRegistry(1 -> v1Json)
    val good = AvroWire.encode(Seq((1L, Some("ok"))).toDF("id", "name"), reg, 1)
      .select(col("value")).as[Array[Byte]].head()
    val pills: Seq[(String, Array[Byte])] = Seq(
      "null" -> null,
      "short" -> Array[Byte](0x00, 0x00),
      "bad-magic" -> (Array[Byte](0x01) ++ good.drop(1)),
      "unknown-id" -> (Array[Byte](0x00, 0x00, 0x00, 0x00, 0x63) ++ good.drop(5)),
      "torn-body" -> good.dropRight(math.max(1, good.length - 6)))
    val df = (pills.map(_._2) :+ good).zipWithIndex
      .map { case (b, i) => (i.toLong, b) }.toDF("row_id", "value")
    val out = AvroWire.decode(df, "value", reg, 1)
      .select(col("row_id"), col("avro").isNull.as("bad"))
      .as[(Long, Boolean)].collect().toMap
    pills.indices.foreach(i => assert(out(i.toLong), s"pill '${pills(i)._1}' must decode NULL"))
    assert(!out(pills.length.toLong), "the well-formed record must decode")
  }

  test("streaming leg: framed payloads through the pipeline sink decode losslessly") {
    // file stream of framed payloads → decode inside the stream → parquet
    // sink: the composition KafkaPipeline would run with an AVRO topic
    val base = graft.util.Scratch.fresh("avro_stream")
    val reg = freshRegistry(1 -> v1Json)
    val src = Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
      .toDF("id", "name")
    AvroWire.encode(src, reg, 1).select(col("value"))
      .coalesce(1).write.parquet(s"$base/in")
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("value", BinaryType))))
      .parquet(s"$base/in")
    val decoded = AvroWire.decode(stream, "value", reg, 1)
      .select(col("avro.id").as("id"), col("avro.name").as("name"))
    val q = decoded.writeStream
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val back = spark.read.parquet(s"$base/out")
      .as[(Long, Option[String])].collect().toSet
    assert(back === Set((1L, Some("a")), (2L, None), (3L, Some("c"))))
  }
}
