package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Aggregates, Joins, Windows}
import graft.sources.AvroWire

/** SURVEY §2.B blocks: scans/sinks, filters/projections, joins,
  * aggregations, window functions, sorts/limits, set operations.
  *
  * Contract (SURVEY §2.B determinism rules): every oracle query and its
  * Spark twin have identical column names, a total ORDER BY over the
  * output, doubles rounded via `round(_, 2..4)`, counts as BIGINT, and
  * NULLS FIRST ordering (Spark's asc default) spelled explicitly in the
  * DuckDB SQL.
  */
object RelationalQueries {
  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    // ---- scans / sinks -------------------------------------------------
    "scan_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),

    "scan_filter_pushdown" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.06))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("l_extendedprice"),
          round(col("l_discount"), 2).as("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "sink_roundtrip" -> ((s, d) => {
      val tmp = graft.util.Scratch.fresh("sink_roundtrip")
      Tables.lineitem(s, d)
        .filter(col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"))
        .write.mode("overwrite").parquet(tmp)
      s.read.parquet(tmp)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Text-format roundtrip (.text = the raw-corpus interchange format:
    // one string per line). A line file can represent neither NULL nor a
    // string containing a line separator (the write would split one
    // document into several lines and silently corrupt the roundtrip),
    // so BOTH are excluded before the write — excluding (not masking) is
    // the honest contract, mirrored in the oracle. Read-back aggregates
    // by first character so the hash covers the full byte content (sum
    // of lengths) and the empty-line case (empty string groups under '').
    "sink_roundtrip_text" -> ((s, d) => {
      val tmp = graft.util.Scratch.fresh("sink_roundtrip_text")
      Tables.documents(s, d)
        .filter(col("text").isNotNull && !col("text").rlike("[\\r\\n]"))
        .select(col("text"))
        .write.mode("overwrite").text(tmp)
      s.read.text(tmp)
        .select(length(col("value")).as("len"),
          substring(col("value"), 1, 1).as("c1"))
        .groupBy(col("c1"))
        .agg(count(lit(1)).as("n"), sum(col("len")).as("sum_len"))
        .orderBy(col("c1"))
    }),

    // CSV round-trip: schema-on-read with an explicit StructType (CSV has
    // no embedded types); kept to exactly-representable columns.
    "sink_roundtrip_csv" -> ((s, d) => {
      val tmp = graft.util.Scratch.fresh("sink_roundtrip_csv")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
        .write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.option("header", "true")
        .schema("o_orderkey BIGINT, o_orderstatus STRING, o_orderpriority STRING")
        .csv(tmp)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    }),

    // JSON-lines round-trip (the interchange format of most LLM data
    // pipelines): long/string columns only — doubles round-trip lossily.
    "sink_roundtrip_json" -> ((s, d) => {
      val tmp = graft.util.Scratch.fresh("sink_roundtrip_json")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").json(tmp)
      s.read.schema("doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT")
        .json(tmp)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"), col("source"))
    }),

    // ORC round-trip: the third columnar format (fully typed like parquet,
    // no schema-on-read needed). Same write→read→aggregate shape as
    // sink_roundtrip so the oracle is the plain aggregate over the source.
    // XML round-trip over Spark 4's NATIVE xml datasource (the format
    // config/feed-style corpora still arrive in): write rowTag-framed
    // records, read them back with an explicit schema (XML infers
    // strings otherwise), aggregate — schema + escaping + framing all
    // on the line. Same aggregate contract as the csv twin.
    "sink_roundtrip_xml" -> ((s, d) => {
      val tmp = graft.util.Scratch.fresh("sink_roundtrip_xml")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
        .write.mode("overwrite")
        .option("rootTag", "orders").option("rowTag", "order")
        .format("xml").save(tmp)
      s.read.option("rowTag", "order")
        .schema("o_orderkey BIGINT, o_orderstatus STRING, o_orderpriority STRING")
        .format("xml").load(tmp)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    }),

    "sink_roundtrip_orc" -> ((s, d) => {
      val tmp = graft.util.Scratch.fresh("sink_roundtrip_orc")
      Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"))
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          (sum(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long")) / 100.0)
            .as("sum_price"))
        .orderBy(col("l_linestatus"))
    }),

    // AVRO round-trip under the public Confluent wire format (r11 —
    // the reference's own declared to-do, README.md:21): rows → framed
    // binary payloads (magic + 4-byte schema id + avro body) via a
    // schema-by-id file registry → parquet at rest (the topic dump) →
    // per-record decode against the reader schema. Identity roundtrip ⇒
    // the oracle is a plain SELECT of the source columns — encode,
    // registry lookup, framing, and decode are all on the hashed path.
    // Null text exercises the [null,string] union branch.
    "sink_roundtrip_avro" -> ((s, d) => {
      val base = graft.util.Scratch.fresh("sink_roundtrip_avro")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"))
      val reg0 = s"$base/registry"
      AvroWire.Registry.register(s, reg0, 1,
        AvroWire.avroSchemaJson("doc", docs.schema))
      val reg = AvroWire.Registry.fromDir(s, reg0)
      AvroWire.encode(docs, reg, 1).select(col("value"))
        .write.mode("overwrite").parquet(s"$base/topic")
      AvroWire.decode(s.read.parquet(s"$base/topic"), "value", reg, 1)
        .select(col("avro.doc_id").as("doc_id"),
          col("avro.text").as("text"), col("avro.lang").as("lang"))
        .orderBy(col("doc_id"))
    }),

    // AVRO logical-type round-trip (r11): decimal-over-bytes, date, and
    // timestamp-micros through the same wire framing — the typed-payload
    // half of the registry surface (a real topic's records carry money
    // and event times, not just strings). Identity roundtrip through the
    // TYPED carriers (any scale drift, tz shift, or precision loss in the
    // decimal/timestamp/date mapping changes the values); the FINAL
    // projection then normalizes to the surface's hash-stable convention
    // (double 2dp / epoch-micros BIGINT / date-as-string) because this is
    // the only query whose raw output would carry DECIMAL/TIMESTAMP/DATE
    // columns into the driver's hasher (VERDICT r11 item 1: the r11 red
    // row was representational — value-for-value identical in DuckDB).
    "sink_roundtrip_avro_logical" -> ((s, d) => {
      val base = graft.util.Scratch.fresh("sink_roundtrip_avro_logical")
      val src = Tables.orders(s, d).select(
        col("o_orderkey"),
        // cents-exact before the decimal cast: the decimal(15,2) carrier
        // then roundtrips a value with no ties at scale 2, so the DuckDB
        // twin (floor-cents on the raw double) is bit-identical
        (floor(col("o_totalprice") * 100.0 + 0.5).cast("long") / 100.0)
          .cast("decimal(15,2)").as("price"),
        col("o_orderdate").as("ts"),
        col("o_orderdate").cast("date").as("day"))
      val reg0 = s"$base/registry"
      AvroWire.Registry.register(s, reg0, 7,
        AvroWire.avroSchemaJson("order", src.schema))
      val reg = AvroWire.Registry.fromDir(s, reg0)
      AvroWire.encode(src, reg, 7).select(col("value"))
        .write.mode("overwrite").parquet(s"$base/topic")
      AvroWire.decode(s.read.parquet(s"$base/topic"), "value", reg, 7)
        .select(col("avro.o_orderkey").as("o_orderkey"),
          graft.functions.Rounding.roundTo(col("avro.price").cast("double"), 2)
            .as("price"),
          unix_micros(col("avro.ts").cast("timestamp")).as("ts_us"),
          col("avro.day").cast("string").as("day"))
        .orderBy(col("o_orderkey"))
    }),

    // Schema evolution read: two parquet generations (v=2 adds
    // o_totalprice), merged with mergeSchema — rows from the old
    // generation surface the new column as NULL, and the generation
    // directory becomes a readable partition column. The lakehouse
    // reality check: a 100 TB table is never written by one schema.
    "scan_schema_merge" -> ((s, d) => {
      val tmp = graft.util.Scratch.fresh("scan_schema_merge")
      val o = Tables.orders(s, d)
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .write.parquet(s"$tmp/v=1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .write.parquet(s"$tmp/v=2")
      s.read.option("mergeSchema", "true").parquet(tmp)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          count(col("o_totalprice")).as("n_priced"),
          (sum(floor(coalesce(col("o_totalprice"), lit(0.0)) * 100.0 + 0.5)
            .cast("long")) / 100.0).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // ---- filters / projections ----------------------------------------
    "filter_compound" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(((col("o_orderstatus") === "F" && col("o_totalprice") > 200000.0) ||
          (col("o_orderpriority").isin("1-URGENT", "2-HIGH") && !(col("o_orderstatus") === "O"))) &&
          nullif(col("o_orderstatus"), lit("X")).isNotNull)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    "project_computed" -> ((s, d) =>
      Tables.lineitem(s, d)
        .withColumn("revenue",
          graft.functions.Rounding.roundTo(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2))
        .withColumn("charge",
          graft.functions.Rounding.roundTo(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 2))
        .withColumn("qty_band",
          when(col("l_quantity") < 10, "low").when(col("l_quantity") < 25, "mid").otherwise("high"))
        .select(col("l_orderkey"), col("l_linenumber"), col("revenue"), col("charge"), col("qty_band"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // ---- joins ---------------------------------------------------------
    "join_inner_equi" -> ((s, d) =>
      Tables.orders(s, d).join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    "join_broadcast" -> ((s, d) =>
      Tables.nation(s, d).join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"), "inner")
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
        .orderBy(col("n_nationkey"))),

    "join_left_outer" -> ((s, d) =>
      Tables.customer(s, d).join(
          Tables.orders(s, d).filter(col("o_totalprice") > 450000.0),
          col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("c_custkey"), col("o_orderkey"))),

    "join_full_outer" -> ((s, d) =>
      Tables.customer(s, d).filter(col("c_acctbal") < 0.0).join(
          Tables.orders(s, d).filter(col("o_totalprice") > 450000.0),
          col("c_custkey") === col("o_custkey"), "full")
        .select(col("c_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("c_custkey"), col("o_orderkey"))),

    "join_semi" -> ((s, d) =>
      Tables.customer(s, d).join(
          Tables.orders(s, d).filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    "join_anti" -> ((s, d) =>
      Tables.customer(s, d).join(
          Tables.orders(s, d).filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    // Non-equi band join: genuinely theta — planned as a broadcast
    // nested-loop join (supplier side is tiny). Aggregated output keeps
    // the verified surface small while still exercising the theta path.
    "join_theta_range" -> ((s, d) =>
      Tables.part(s, d).join(broadcast(Tables.supplier(s, d)),
          col("s_acctbal").between(col("p_retailprice") - 500.0, col("p_retailprice") + 500.0))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), round(avg(col("s_acctbal")), 2).as("avg_acctbal"))
        .orderBy(col("p_brand"))),

    // Banded range join, bucketized — the 100 TB scale path for bounded-band
    // theta joins (see Joins.bandedRangeJoin for the bucket-cover proof).
    // join_theta_range's BroadcastNestedLoopJoin is right only while one
    // side fits in a broadcast; here pair work is per-bucket, never
    // O(|L|·|R|). Cent-unit integer price sums keep the avg
    // order-independent. Band 5.0: part prices span only ~[900, 1000], so a
    // wide band over that narrow domain degenerates to a handful of giant
    // buckets (±50 measured 8.7 s at sf0.1 on ~9M true pairs); the band is
    // the bucket-width knob and a caller sizes it to the match volume they
    // actually want.
    "join_range_bucketed" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .select(col("l_extendedprice"))
        .withColumn("cents",
          floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"))
      val p = Tables.part(s, d).select(col("p_brand"), col("p_retailprice"))
      Joins.bandedRangeJoin(l, p, "l_extendedprice", "p_retailprice", 5.0)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          graft.functions.Rounding.roundTo(
            sum(col("cents")).cast("double") / 100.0 /
              count(lit(1)).cast("double"), 2).as("avg_price"))
        .orderBy(col("p_brand"))
    }),

    // Aggregate-pushdown band join (r11) — the scale path when the consumer
    // of a banded range join only wants per-group aggregates, which is the
    // shape of BOTH range-join keys above. Pair enumeration (the ×100-per-
    // decade output term both scale decades adjudicated on the pair forms)
    // is skipped entirely: a domain-bounded per-cent prefix-sum index
    // answers each part row with two binary searches — O(|L| + |P| log D)
    // where the pair forms are O(pairs). Band semantics are the exact cent
    // lattice (|l_cents - p_cents| <= 500), stated identically in the
    // oracle, so no float-boundary ambiguity exists on either side. See
    // Joins.bandAggJoin for the 100 TB cost argument.
    "join_range_agg" -> ((s, d) => {
      val p = Tables.part(s, d).select(col("p_brand"), col("p_retailprice"))
      val l = Tables.lineitem(s, d).select(col("l_extendedprice"))
      Joins.bandAggJoin(p, "p_retailprice", l, "l_extendedprice",
          "l_extendedprice", 5.0)
        .groupBy(col("p_brand"))
        .agg(sum(col("band_n")).as("n"),
          graft.functions.Rounding.roundTo(
            sum(col("band_sum_cents")).cast("double") / 100.0 /
              sum(col("band_n")).cast("double"), 2).as("avg_price"),
          // segment-tree min/max over the same index (r11): min/max
          // ignore the NULL no-match rows, same as SQL over the pairs
          (min(col("band_min_cents")).cast("double") / 100.0).as("min_price"),
          (max(col("band_max_cents")).cast("double") / 100.0).as("max_price"))
        .where(col("n") > 0)
        .orderBy(col("p_brand"))
    }),

    // Two-level skew salting driven by the skew profile: ONLY keys at/above
    // the hot threshold are salted (broadcast hot-key probe, no extra
    // shuffle); cold keys join plain. Right-side inflation is
    // |hot-key right rows|×(factor−1), not join_salted's |right|×factor —
    // the form that survives a fact-sized right side at 100 TB. Same
    // result set as the plain join, verified by the oracle; the inflation
    // contract is unit-asserted in JoinsSpec.
    "join_salted_hotkey" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val hot = Joins.profileHotKeys(ev, "user_id", minCount = 60L)
      Joins.hotKeySaltedJoin(ev, Tables.customer(s, d),
          "user_id", "c_custkey", saltFactor = 8, hotKeys = hot)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          (sum(floor(col("value") * 100.0 + 0.5).cast("long")) / 100.0)
            .as("sum_value"))
        .orderBy(col("c_mktsegment"))
    }),

    // The explicit skew-salting path (AQE handles SMJ skew at runtime;
    // this is the ahead-of-time form) — same result set as the plain join,
    // verified by the oracle.
    "join_salted" -> ((s, d) =>
      Joins.saltedEquiJoin(Tables.orders(s, d), Tables.customer(s, d),
        "o_custkey", "c_custkey", saltFactor = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          (sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")) / 100.0)
            .as("sum_price"))
        .orderBy(col("c_mktsegment"))),

    // Null-safe equi-join (<=>): NULL keys pair with NULL keys instead of
    // silently dropping — nullif('de') manufactures NULLs on BOTH sides so
    // the query is non-trivially different from a plain join. <=> is a
    // first-class equi-join key for Catalyst (SMJ/SHJ, no nested loop);
    // both sides pre-aggregate to |distinct langs| rows before joining.
    "join_null_safe" -> ((s, d) => {
      def keyed(c: org.apache.spark.sql.Column) =
        when(c === "de", lit(null).cast("string")).otherwise(c)
      val l = Tables.documents(s, d)
        .groupBy(keyed(col("lang")).as("lk"))
        .agg(count(lit(1)).as("n_docs"))
      val r = Tables.documents(s, d)
        .groupBy(keyed(col("lang")).as("rk"))
        .agg(min(col("doc_id")).as("min_doc"))
      l.join(r, col("lk") <=> col("rk"))
        .select(col("lk").as("lang_key"), col("n_docs"), col("min_doc"))
        .orderBy(col("lang_key"))
    }),

    // Time-series gap fill: per event_type, an hourly spine spanning the
    // type's observed range (explode(sequence)) left-joined to the hourly
    // counts, missing hours zero-filled. The spine is |types × hours| —
    // tiny next to the fact aggregate, so it broadcasts; the only
    // fact-sized shuffle is the hourly count itself.
    "time_gapfill" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hr"))
      val counts = ev.groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("cnt"))
      val spine = ev.groupBy(col("event_type"))
        .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"), lit(3600L))).as("hr"))
      spine.join(counts, Seq("event_type", "hr"), "left")
        .select(col("event_type"), col("hr"),
          coalesce(col("cnt"), lit(0L)).as("n"))
        .orderBy(col("event_type"), col("hr"))
    }),

    // OHLC-style time-series downsampling: per (event_type, hour) the
    // open/close/min/max value + row count. Open/close are argmin/argmax
    // by the fully-deterministic (ts, event_id) order, expressed as two
    // row_number windows SHARING one (event_type, hour) exchange (they
    // differ only in sort direction), collapsed by a same-key aggregate —
    // the resample-before-ship step of a metrics pipeline, one data
    // shuffle end to end.
    "time_downsample" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hr"),
        col("value"), col("ts"), col("event_id"))
      val byHr = Window.partitionBy(col("event_type"), col("hr"))
      val asc = byHr.orderBy(col("ts"), col("event_id"))
      val dsc = byHr.orderBy(col("ts").desc, col("event_id").desc)
      def r2(c: org.apache.spark.sql.Column) =
        graft.functions.Rounding.roundTo(c, 2)
      ev.withColumn("rn1", row_number().over(asc))
        .withColumn("rn2", row_number().over(dsc))
        .groupBy(col("event_type"), col("hr"))
        .agg(r2(min(when(col("rn1") === 1, col("value")))).as("open"),
          r2(min(when(col("rn2") === 1, col("value")))).as("close"),
          r2(min(col("value"))).as("lo"),
          r2(max(col("value"))).as("hi"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("hr"))
    }),

    // Batch sessionization (gaps-and-islands): per user, a >30-min gap
    // starts a new session; session id = running count of gap flags; the
    // per-session rows collapse to a session-size histogram. Windows are
    // partitioned by user_id — high-cardinality, so every task holds a few
    // users' small event lists (the skewed-single-hot-user corpus would
    // switch the running count to Windows.partitionedPrefixSum, same shape
    // as llm_ccnet_buckets' rank). Two window passes share ONE (user_id)
    // exchange+sort; then one partial-agg shuffle per groupBy. unix_ts
    // truncates to whole seconds on both engines (floor for the positive
    // epochs in play — the DuckDB twin floors epoch() explicitly).
    "time_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("sec"), col("event_id"))
      val sess = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("sec"))
        .withColumn("new_sess",
          when(col("sec") - lag(col("sec"), 1).over(byUser) <= 1800L, 0L)
            .otherwise(1L)) // first-in-partition (null lag) opens a session
        .withColumn("sid", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("sec")) - min(col("sec"))).as("dur_s"))
      sess.groupBy(col("n_events"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("dur_s")).as("sum_dur_s"),
          min(col("user_id")).as("min_user"))
        .orderBy(col("n_events"))
    }),

    // Co-located join over bucketed tables: both sides pre-hash-partitioned
    // on custkey at write time, so the sort-merge join has NO exchange
    // (plan-asserted in BucketingSpec) — the pay-the-shuffle-once layout.
    "join_bucketed" -> ((s, d) => {
      val s2 = graft.sources.Bucketing.bucketedSession(s)
      graft.sources.Bucketing.ensure(s2, d)
      val o = s2.table(graft.sources.Bucketing.OrdersTable)
      val c = s2.table(graft.sources.Bucketing.CustomerTable)
      o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          (sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")) / 100.0)
            .as("sum_price"))
        .orderBy(col("c_mktsegment"))
    }),

    // Bucket-pruning point lookup: an equality filter on the bucket column
    // resolves to ONE bucket at planning time (SelectedBucketsCount: 1 out
    // of 8, plan-asserted in BucketingSpec) — at 100 TB a keyed lookup
    // reads 1/n-th of the table's files, no shuffle, no full scan.
    "scan_bucket_prune" -> ((s, d) => {
      val s2 = graft.sources.Bucketing.bucketedSession(s)
      graft.sources.Bucketing.ensure(s2, d)
      s2.table(graft.sources.Bucketing.OrdersTable)
        .filter(col("o_custkey") === 37L)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Partition-pruning scan: a filter on the Hive-partition column
    // resolves to ONE directory at planning time (PartitionFilters in the
    // scan node, asserted by PartitionedSpec) — the other ~4/5 of the
    // table's files are never even listed. The directory-layout twin of
    // scan_bucket_prune's hash-bucket pruning.
    "scan_partition_prune" -> ((s, d) =>
      graft.sources.Partitioned.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          (sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")) / 100.0)
            .as("sum_price"))
        .orderBy(col("o_orderstatus"))),

    // Z-ORDER clustering (r13): lineitem rewritten on the Morton curve of
    // (l_orderkey, l_partkey), then a TWO-dimensional box predicate over
    // the rewritten layout — the Delta/Iceberg OPTIMIZE ZORDER technique,
    // here as pure Column bitwise codegen. The oracled result is layout-
    // independent (the box aggregate over lineitem); the SCALE claim —
    // the z-layout bounds BOTH columns per file so the box prunes on both
    // where a single-column sort prunes on one — is pinned by ZOrderSpec,
    // which reads per-file min/max back and counts slice intersections.
    // Box bounds derive from the data's own min/max (middle quartiles),
    // reproduced verbatim in the DuckDB twin.
    "scan_zorder_prune" -> ((s, d) => {
      val base = graft.util.Scratch.fresh("zorder")
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_partkey"), col("l_returnflag"), col("l_quantity"))
      val (xlo, xhi, ylo, yhi) = graft.operators.ZOrder.writeZOrdered(
        li, "l_orderkey", "l_partkey", nFiles = 16, s"$base/t")
      def boxLo(lo: Long, hi: Long) = lo + math.floor((hi - lo) / 4.0).toLong
      def boxHi(lo: Long, hi: Long) = lo + math.floor((hi - lo) / 2.0).toLong
      s.read.parquet(s"$base/t")
        .filter(col("l_orderkey").between(boxLo(xlo, xhi), boxHi(xlo, xhi)) &&
          col("l_partkey").between(boxLo(ylo, yhi), boxHi(ylo, yhi)))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Dynamic partition pruning: the fact side is the priority-partitioned
    // orders layout, the dim side a 5-row broadcast filtered to tier='hot'.
    // Catalyst plans a DynamicPruningExpression on the fact scan's
    // PartitionFilters (asserted in PartitionedSpec) that REUSES the dim's
    // broadcast to decide, at runtime, which priority directories to read
    // — here 2 of 5. At 100 TB this is the star-schema workhorse: the
    // fact table is pruned by a predicate that only exists on the dim.
    "join_dpp" -> ((s, d) => {
      val fact = graft.sources.Partitioned.orders(s, d)
      val dim = broadcast(graft.sources.Partitioned.priorityDim(s)
        .filter(col("tier") === "hot"))
      fact.join(dim, Seq("o_orderpriority"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          (sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")) / 100.0)
            .as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // Runtime bloom-filter semi-join reduction: the selective dim filter
    // (one brand of 25, ~4% of part at every SF) is turned into a bloom
    // filter that pre-filters lineitem BEFORE its shuffle — at 100 TB the
    // fact side's exchange shrinks ~10× for rows that would fail the join
    // anyway. Planned by InjectRuntimeFilter when the join shuffles (a
    // broadcast join gets the same effect from the hash relation itself),
    // so broadcasting is disabled and the thresholds that gate the rule at
    // petabyte sizes are lowered — in a DEDICATED child session: session
    // conf is planning-time state, and mutating the shared session would
    // perturb every other query's plan. Plan-asserted in JoinsSpec.
    "join_bloom_filtered" -> ((s, d) => {
      val s2 = s.newSession()
      s2.conf.set("spark.sql.shuffle.partitions",
        s.conf.get("spark.sql.shuffle.partitions"))
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.lineitem(s2, d)
        .join(Tables.part(s2, d).filter(col("p_brand") === "Brand#13"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_size"))
        .agg(count(lit(1)).as("n"),
          (sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
            .cast("long")) / 100.0).as("revenue"))
        .orderBy(col("p_size"))
    }),

    "join_asof" -> ((s, d) =>
      Joins.asof(
        Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts")),
        "user_id", "ts",
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderdate"),
          col("o_orderkey"), col("o_totalprice")),
        "o_custkey", "o_orderdate", "o_orderkey")
        .select(col("event_id"), col("user_id"),
          col("asof_o_orderkey").as("o_orderkey"),
          round(col("asof_o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("event_id"))),

    // Forward as-of: each order matched to the EARLIEST event of the
    // same user at-or-after the order date (merge_asof
    // direction='forward') — same single-shuffle union+window shape as
    // join_asof, descending time order. Payload columns are the
    // never-null (event_id, epoch-seconds) pair: the union+window form
    // matches payloads independently under ignoreNulls, so a NULLABLE
    // payload could pair one event's id with another's value — picking
    // null-free payloads is part of the operator's contract.
    "join_asof_forward" -> ((s, d) =>
      Joins.asofForward(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate")),
        "o_custkey", "o_orderdate",
        Tables.events(s, d).select(col("user_id"), col("ts"),
          col("event_id"), unix_timestamp(col("ts")).as("ets")),
        "user_id", "ts", "event_id")
        .select(col("o_orderkey"), col("o_custkey"),
          col("asof_event_id").as("next_event_id"),
          col("asof_ets").as("next_event_epoch"))
        .orderBy(col("o_orderkey"))),

    "join_multiway" -> ((s, d) =>
      Tables.region(s, d)
        .join(Tables.nation(s, d), col("r_regionkey") === col("n_regionkey"))
        .join(Tables.customer(s, d), col("n_nationkey") === col("c_nationkey"))
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("r_name"), col("n_name"))),

    // ---- aggregations --------------------------------------------------
    "agg_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          round(avg(col("l_discount")), 2).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "agg_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy(col("l_returnflag"))),

    // approx: HLL++ at rsd 0.02 — the DEFAULT rsd (0.05) measured 8.6%
    // off exact on one sf0.01 group, outside the declared ±5% band; 2%
    // target keeps real error well inside it for ~4x sketch memory
    // (still KB-scale, mergeable map-side). r12 (VERDICT item 2): the
    // hashed output carries the EXACT count plus `tol_ok`, the in-query
    // |approx − exact| ≤ 5%·max(|exact|,1) verdict — the driver's hash
    // compare now pins the sketch's band directly (a regressed sketch
    // flips tol_ok → red row) instead of a declared rows-only check.
    // exact and approx in SEPARATE aggregations joined on the 3-row
    // group key: mixing countDistinct with another aggregate in one agg
    // forces an Expand plan (every row duplicated per distinct spec) —
    // measured 3.3s vs 1.25s for this split shape at sf0.1
    "agg_approx_distinct" -> ((s, d) => {
      val approx = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.02)
          .as("__approx"))
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"))
        .join(broadcast(approx), "l_returnflag")
        .select(col("l_returnflag"), col("n_orders"),
          (abs(col("__approx") - col("n_orders")) <=
            lit(0.05) * greatest(abs(col("n_orders")), lit(1)))
            .cast("long").as("tol_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // The two-level MERGEABLE-sketch pattern a 100 TB rollup actually
    // ships: partial Datasketches-HLL sketches built per fine partition
    // (here (returnflag, linestatus) standing in for e.g. per-day
    // shards), PERSISTED as binary, and re-merged later by a coarser
    // consumer with hll_union_agg — distinct-count re-aggregation
    // without rereading the fact table, which COUNT(DISTINCT) can never
    // do (it is not algebraic). lgK=14 keeps the ~±1.6% HLL band well
    // inside the declared ±5% band. r12 (VERDICT item 2): hashed output =
    // exact count + in-query `tol_ok` verdict over the merged-sketch
    // estimate (the 3-row exact side broadcast-joins onto the estimate);
    // merge-consistency (union of partials ≈ direct per-group sketch)
    // stays unit-asserted in AggregatesSpec.
    "agg_hll_partitioned" -> ((s, d) => {
      val est = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(hll_sketch_agg(col("l_orderkey"), lit(14)).as("sk"))
        .groupBy(col("l_returnflag"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("__est"))
      val exact = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"))
      est.join(broadcast(exact), "l_returnflag")
        .select(col("l_returnflag"), col("n_orders"),
          (abs(col("__est") - col("n_orders")) <=
            lit(0.05) * greatest(abs(col("n_orders")), lit(1)))
            .cast("long").as("tol_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // Count-Min point-frequency sketch (r11): one sketch per shard of the
    // stream built by Spark's own count_min_sketch aggregate (partial
    // aggregation = the map-side mergeability a 1000-executor count
    // relies on), merged DRIVER-side — O(sketch bytes), the HLL/IVF
    // legitimacy class, never the rows — and point-queried per event
    // type. CMS never underestimates and overcounts by at most eps·N
    // w.p. `confidence` (both unit-asserted in AggregatesSpec). Fixed
    // seed + commutative counter merges ⇒ deterministic across
    // partitionings and merge orders. r12 (VERDICT item 2): hashed
    // output = exact per-type count + in-query `tol_ok` verdict over the
    // merged-sketch point estimate (eps·N ≈ 0.1% of rows ≪ the 5% band).
    "agg_countmin" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val estimates =
        Aggregates.countMinEstimates(ev, "event_type", "user_id")
      val exact = ev.filter(col("event_type").isNotNull)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      exact.join(broadcast(estimates.toDF("event_type", "__est")), "event_type")
        .select(col("event_type"), col("n"),
          (abs(col("__est") - col("n")) <=
            lit(0.05) * greatest(abs(col("n")), lit(1)))
            .cast("long").as("tol_ok"))
        .orderBy(col("event_type"))
    }),

    "agg_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
        .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))),

    "agg_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
        .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))),

    "agg_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem_gs")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(1) AS n,
               cast(grouping(l_returnflag) AS int) AS g_rf,
               cast(grouping(l_linestatus) AS int) AS g_ls
        FROM graft_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
      """)
    }),

    // Exact percentiles (interpolated, matching SQL quantile_cont). Exact
    // percentile buffers each group's values — fine for bounded group
    // counts; the unbounded-cardinality scale path is approx_percentile
    // (t-digest sketch, mergeable map-side).
    // Join-key skew profile — the diagnostic a pipeline runs BEFORE
    // choosing a salt factor or trusting AQE's skew threshold: per-key
    // row counts reduced to distributional stats in two grouped passes
    // (key counts = one map-side-combinable shuffle on the key; the
    // 1-row summary aggregates the tiny counts frame). skew = max/avg in
    // exact integer counts, floor-rounded once.
    "agg_skew_profile" -> ((s, d) => {
      val counts = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
      counts.agg(
          count(lit(1)).as("n_keys"),
          max(col("c")).as("max_rows"),
          graft.functions.Rounding.roundTo(expr("percentile(c, 0.5)"), 2)
            .as("p50_rows"),
          graft.functions.Rounding.roundTo(expr("percentile(c, 0.99)"), 2)
            .as("p99_rows"),
          graft.functions.Rounding.roundTo(
            max(col("c")).cast("double") * count(lit(1)).cast("double") /
              sum(col("c")).cast("double"), 4).as("skew_ratio"))
        .orderBy(col("n_keys"))
    }),

    // Deterministic per-group mode (most frequent value, ties broken by
    // min value): two-level shape — the groupBy first shrinks the data to
    // |groups × distinct values| rows, so the row_number window runs over
    // a tiny aggregate, never the fact table. The 100 TB form of "mode".
    "agg_mode" -> ((s, d) => {
      val counts = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(desc("n"), col("o_orderstatus"))
      counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_orderpriority"),
          col("o_orderstatus").as("mode_status"), col("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // grouping()/grouping-id disambiguation over CUBE: a NULL in a cube
    // output row is ambiguous — is it the subtotal row, or a group whose
    // KEY is genuinely NULL? grouping(col) answers authoritatively (1 =
    // this row aggregates over that column). Any pipeline that feeds
    // cube/rollup output downstream needs this; the '<total>' labels are
    // display-only, the g_* flags are the contract. Same one-Expand
    // aggregate plan as agg_cube.
    "agg_grouping_id" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          count(lit(1)).as("n"),
          sum(expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"))
            .as("cents"))
        .select(col("g_rf"), col("g_ls"),
          (col("g_rf") * 2 + col("g_ls")).as("gid"),
          coalesce(col("l_returnflag"), lit("<total>")).as("rf"),
          coalesce(col("l_linestatus"), lit("<total>")).as("ls"),
          col("n"), col("cents"))
        .orderBy(col("g_rf"), col("g_ls"), col("rf"), col("ls"))),

    // Conditional aggregation via the SQL FILTER clause — one grouped
    // pass computing differently-predicated aggregates side by side (the
    // report-query staple that otherwise becomes N scans or N CASE
    // expressions). Catalyst folds each FILTER into its aggregate's
    // update path: still one scan, one map-side-combinable shuffle.
    // Money sums in exact cent bigints; the P-status avg is NULL for
    // groups with no such rows in both engines.
    "agg_filter_clause" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          expr("count(*) FILTER (WHERE o_orderstatus = 'F')").as("n_f"),
          expr("""sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  FILTER (WHERE o_orderstatus = 'O')""").as("cents_o"),
          graft.functions.Rounding.roundTo(
            expr("avg(o_totalprice) FILTER (WHERE o_orderstatus = 'P')"), 2)
            .as("avg_p"))
        .orderBy(col("o_orderpriority"))),

    // Ordered distinct string aggregation (LISTAGG/string_agg): the
    // sorted-distinct form is order-independent, so the result is
    // identical however Spark partitions the input — the only listagg
    // variant that is safely comparable across engines.
    "agg_string_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
            .as("statuses"),
          countDistinct(col("o_orderstatus")).as("n_status"))
        .orderBy(col("o_orderpriority"))),

    "agg_median" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          graft.functions.Rounding.roundTo(expr("percentile(l_quantity, 0.5)"), 2).as("med_qty"),
          graft.functions.Rounding.roundTo(expr("percentile(l_extendedprice, 0.9)"), 2).as("p90_price"),
          graft.functions.Rounding.roundTo(expr("percentile(l_discount, 0.25)"), 4).as("q1_disc"))
        .orderBy(col("l_returnflag"))),

    "agg_custom_typed" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(Aggregates.weightedMean(col("l_extendedprice"), col("l_quantity")), 2)
          .as("wavg_price"))
        .orderBy(col("l_returnflag"))),

    // Statistical aggregates (single-pass merge-able moments — map-side
    // combinable, so 100 TB-safe). Engines' merge orders differ in the
    // ~1e-10 tails; 4-decimal portable rounding absorbs that.
    "agg_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          graft.functions.Rounding.roundTo(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          graft.functions.Rounding.roundTo(var_samp(col("l_quantity")), 4).as("var_qty"),
          graft.functions.Rounding.roundTo(
            corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          graft.functions.Rounding.roundTo(
            covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qp"))
        .orderBy(col("l_returnflag"))),

    // Per-group linear regression (trend detection over event streams):
    // regr_slope/intercept/r2 are single-pass merge-able moment
    // aggregates — map-side combinable, 100 TB-safe like agg_stats. The
    // regressor is DAYS since a fixed epoch (2024-01-01): centering keeps
    // the moments well-conditioned (raw epoch-seconds x would make the
    // slope ~1e-7 and amplify cross-engine accumulation drift); 4-dp
    // portable rounding absorbs the ~1e-10 merge-order tails.
    "agg_regression" -> ((s, d) => {
      val x = (unix_micros(col("ts")) / 1e6 - lit(1704067200L)) / 86400.0
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          graft.functions.Rounding.roundTo(regr_slope(col("value"), x), 4).as("slope"),
          graft.functions.Rounding.roundTo(regr_intercept(col("value"), x), 4).as("icept"),
          graft.functions.Rounding.roundTo(regr_r2(col("value"), x), 4).as("r2"))
        .orderBy(col("event_type"))
    }),

    // Fixed-width histogram (the data-profiling staple): bucket =
    // floor(price/10000) — identical IEEE double division + floor in both
    // engines, so no width_bucket dialect drift. One map-side-combinable
    // groupBy; min/max of doubles are order-independent and the money sum
    // uses exact cent-unit bigints.
    "agg_histogram" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(floor(col("l_extendedprice") / 10000.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          (sum(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long")) / 100.0)
            .as("sum_price"))
        .orderBy(col("bucket"))),

    // Pivot (long→wide): one column per l_linestatus value. Values are
    // listed explicitly — an unlisted-values pivot would scan once just to
    // discover the columns.
    "agg_pivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2))
        .orderBy(col("l_returnflag"))),

    // Approximate percentiles: the unbounded-cardinality scale path for
    // agg_median (GK summary, mergeable map-side — bounded memory per
    // group where exact percentile buffers every value). r12 (VERDICT
    // item 2): hashed output = exact percentiles (agg_median convention)
    // + in-query `tol_ok` verdict on the GK estimates — the deterministic
    // rank bound N/accuracy ≈ 20 ranks leaves the 5% value band huge
    // margin, and a regressed sketch flips tol_ok → red driver row.
    // (measured r12: splitting the GK and exact aggs into two scans +
    // broadcast join saved only 0.3s of 3.0 locally — inside variance —
    // while doubling the 100 TB scan cost; the single-scan form stays.
    // No Expand risk here: none of the three aggregates is DISTINCT.)
    "agg_approx_percentile" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 1000)")
            .as("__ap"),
          expr("percentile(l_extendedprice, 0.5)").as("__e50"),
          expr("percentile(l_extendedprice, 0.9)").as("__e90"))
        .select(col("l_returnflag"),
          graft.functions.Rounding.roundTo(col("__e50"), 2).as("p50_price"),
          graft.functions.Rounding.roundTo(col("__e90"), 2).as("p90_price"),
          ((abs(col("__ap").getItem(0) - col("__e50")) <=
              lit(0.05) * greatest(abs(col("__e50")), lit(1))) &&
            (abs(col("__ap").getItem(1) - col("__e90")) <=
              lit(0.05) * greatest(abs(col("__e90")), lit(1))))
            .cast("long").as("tol_ok"))
        .orderBy(col("l_returnflag"))),

    // Ordered-funnel depth per user (the product-analytics windowFunnel):
    // ONE grouped pass computes each user's earliest view/click/purchase
    // times via conditional min — no self-joins, no per-stage scans —
    // then depth = how far the strictly-ordered chain got. Conditional
    // partial_min is map-side combinable, so the shuffle carries one row
    // per (map partition, user).
    "agg_funnel" -> ((s, d) => {
      val stage = Tables.events(s, d).groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      val depth = when(col("t_view").isNull, 0)
        .when(col("t_click").isNull || !(col("t_click") > col("t_view")), 1)
        .when(col("t_purchase").isNull || !(col("t_purchase") > col("t_click")), 2)
        .otherwise(3)
      stage.select(depth.cast("int").as("funnel_depth"))
        .groupBy(col("funnel_depth"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("funnel_depth"))
    }),

    // ---- window functions ----------------------------------------------
    "window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("rnk"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_custkey"), col("rnk"), col("o_orderkey"))
    }),

    // Forward-fill (LOCF — last observation carried forward): nulls
    // replaced by the latest non-null value in event order via
    // last(..., ignoreNulls) over an unbounded-preceding frame — the
    // gap-repair pass of any sensor/metrics pipeline. Nulls are
    // manufactured deterministically (event_id % 7) since the generator
    // emits none; leading nulls (no prior observation) surface as the
    // -1 sentinel so the hash compare covers them too. One window
    // exchange on user_id, nothing else.
    "window_fill_forward" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("v", when(col("event_id") % 7 === 0, lit(null))
          .otherwise(col("value")))
        .select(col("event_id"), col("user_id"),
          graft.functions.Rounding.roundTo(
            coalesce(last(col("v"), ignoreNulls = true).over(w), lit(-1.0)), 2)
            .as("filled"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Relative-position window functions: percent_rank + cume_dist over a
    // fully-deterministic ORDER BY (unique (qty, orderkey, linenumber)
    // tiebreak, so the fractions are reproducible run-to-run). Exact
    // rationals in IEEE doubles; floor-rounded to 6 dp for the oracle.
    "window_percent_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"),
          graft.functions.Rounding.roundTo(percent_rank().over(w), 6).as("pr"),
          graft.functions.Rounding.roundTo(cume_dist().over(w), 6).as("cd"))
        .orderBy(col("l_returnflag"), col("pr"), col("l_orderkey"),
          col("l_linenumber"))
    }),

    "window_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_value", lead(col("value"), 1).over(w))
        .select(col("event_id"), col("user_id"),
          round(col("value"), 2).as("value"),
          round(col("value") - col("prev_value"), 2).as("delta_prev"),
          round(col("next_value"), 2).as("next_value"))
        .orderBy(col("event_id"))
    }),

    "window_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          graft.functions.Rounding.roundTo(avg(col("value")).over(w), 2).as("mov_avg"))
        .orderBy(col("event_id"))
    }),

    "window_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          graft.functions.Rounding.roundTo(percent_rank().over(w), 4).as("pct_rank"),
          graft.functions.Rounding.roundTo(cume_dist().over(w), 4).as("cume"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Distributed running sum: bucketed two-pass instead of the
    // single-partition global window (see Windows.distributedRunningSum).
    "window_running_sum" -> ((s, d) =>
      Windows.distributedRunningSum(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice")),
        col("o_totalprice"), year(col("o_orderdate")),
        Seq(col("o_orderdate"), col("o_orderkey")), "running")
        .select(col("o_orderkey"), round(col("running"), 2).as("running"))
        .orderBy(col("o_orderkey"))),

    // RANGE frame (trailing 7 days by order date, peers share the frame)
    // + frame-navigation functions over an unbounded ROWS frame. Frame
    // sums use cent-scaled integers: a double sum's value depends on
    // intra-frame order, which ties make nondeterministic.
    "window_range_frame" -> ((s, d) => {
      val days = datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
      val wRange = Window.partitionBy(col("o_custkey")).orderBy(days)
        .rangeBetween(-7, Window.currentRow)
      val wFull = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .filter(col("o_custkey") <= 200)
        .select(col("o_orderkey"), col("o_custkey"),
          (sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")).over(wRange) / 100.0)
            .as("trail7_price"),
          first(col("o_orderkey")).over(wFull).as("first_ok"),
          last(col("o_orderkey")).over(wFull).as("last_ok"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_ok"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- sorts / limits / set ops ---------------------------------------
    "sort_limit_topk" -> ((s, d) =>
      Tables.lineitem(s, d)
        .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        .limit(10)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("l_extendedprice"))),

    "set_union_all" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      li.filter(col("l_linenumber") % 2 === 1)
        .unionAll(li.filter(col("l_linenumber") % 2 === 0))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    "set_union_distinct" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_returnflag"), col("l_linestatus"))
      li.filter(col("l_returnflag") =!= "N").union(li.filter(col("l_returnflag") =!= "A"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "set_intersect" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_partkey").as("partkey"))
        .intersect(Tables.part(s, d).filter(col("p_size") > 25)
          .select(col("p_partkey").as("partkey")))
        .orderBy(col("partkey"))),

    "set_except" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_partkey").as("partkey"))
        .except(Tables.part(s, d).filter(col("p_size") > 25)
          .select(col("p_partkey").as("partkey")))
        .orderBy(col("partkey"))),

    // Bag semantics: EXCEPT ALL keeps multiplicity (n_left - n_right per
    // value), unlike the set-semantics except above.
    "set_except_all" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_partkey").as("partkey"))
        .exceptAll(Tables.part(s, d).filter(col("p_size") > 25)
          .select(col("p_partkey").as("partkey")))
        .orderBy(col("partkey"))),

    // Explicit cartesian product (tiny dimension × tiny dimension) — the
    // one join shape that must NEVER appear against a fact table; here it
    // is the declared semantics.
    "join_cross" -> ((s, d) =>
      Tables.region(s, d).crossJoin(
          Tables.nation(s, d).select(col("n_nationkey"), col("n_name")))
        .select(col("r_regionkey"), col("r_name"), col("n_nationkey"), col("n_name"))
        .orderBy(col("r_regionkey"), col("n_nationkey"))),

    // Array aggregation: collect_set sorted for a deterministic, portable
    // output. Serialized to comma-joined STRING because the driver's hash
    // comparator cannot hash list-typed cells (pandas "unhashable
    // numpy.ndarray"); the array-typed form stays covered by
    // RelationalQueriesSpec.
    "agg_collect_set" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          array_join(sort_array(collect_set(col("l_linestatus"))), ",").as("statuses"),
          // sort NUMERICALLY first, stringify only for the join (lexical
          // "10" < "2" would diverge from DuckDB's numeric list_sort)
          array_join(
            transform(sort_array(collect_set(col("l_linenumber"))), _.cast("string")),
            ",").as("linenos"))
        .orderBy(col("l_returnflag")))
  )

  val oracle: Map[String, String] = Map(
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_quantity""",

    "scan_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice,
                round(l_discount, 2) AS l_discount
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.02 AND 0.06
         ORDER BY l_orderkey, l_linenumber""",

    "sink_roundtrip" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem WHERE l_quantity < 10
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "sink_roundtrip_csv" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
         FROM orders GROUP BY o_orderstatus, o_orderpriority
         ORDER BY o_orderstatus, o_orderpriority""",

    // the roundtrip is the query's subject; the oracle checks the
    // aggregate against the source rows (csv-twin contract)
    "sink_roundtrip_xml" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
         FROM orders GROUP BY o_orderstatus, o_orderpriority
         ORDER BY o_orderstatus, o_orderpriority""",

    "sink_roundtrip_text" ->
      """SELECT substring(text, 1, 1) AS c1, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(length(text)) AS BIGINT) AS sum_len
         FROM documents
         WHERE text IS NOT NULL AND NOT regexp_matches(text, '[\r\n]')
         GROUP BY 1 ORDER BY c1""",

    "sink_roundtrip_json" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY lang, source
         ORDER BY lang NULLS FIRST, source NULLS FIRST""",

    "filter_compound" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority, round(o_totalprice, 2) AS o_totalprice
         FROM orders
         WHERE ((o_orderstatus = 'F' AND o_totalprice > 200000.0)
                OR (o_orderpriority IN ('1-URGENT', '2-HIGH') AND NOT (o_orderstatus = 'O')))
           AND nullif(o_orderstatus, 'X') IS NOT NULL
         ORDER BY o_orderkey""",

    "project_computed" ->
      """SELECT l_orderkey, l_linenumber,
                floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) / 100.0 AS revenue,
                floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100.0 + 0.5) / 100.0 AS charge,
                CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 25 THEN 'mid' ELSE 'high' END AS qty_band
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "join_inner_equi" ->
      """SELECT o_orderkey, c_custkey, c_name, round(o_totalprice, 2) AS o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",

    "join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
         FROM nation JOIN region ON n_regionkey = r_regionkey
         ORDER BY n_nationkey""",

    "join_left_outer" ->
      """SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 2) AS o_totalprice
         FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000.0) o
           ON c_custkey = o_custkey
         ORDER BY c_custkey, o_orderkey NULLS FIRST""",

    "join_full_outer" ->
      """SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
         FROM (SELECT * FROM customer WHERE c_acctbal < 0.0) c
         FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 450000.0) o
           ON c_custkey = o_custkey
         ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""",

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
         ORDER BY c_custkey""",

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
         ORDER BY c_custkey""",

    "join_theta_range" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n, round(avg(s_acctbal), 2) AS avg_acctbal
         FROM part JOIN supplier
           ON s_acctbal BETWEEN p_retailprice - 500.0 AND p_retailprice + 500.0
         GROUP BY p_brand ORDER BY p_brand""",

    // bucketing is semantics-preserving, so the oracle is the plain band
    // join; the cent-unit avg reproduces the Spark side's exact-integer mean
    "join_range_bucketed" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
                floor(CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
                      / 100.0 / CAST(count(*) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS avg_price
         FROM lineitem JOIN part
           ON abs(l_extendedprice - p_retailprice) <= 5.0
         GROUP BY p_brand ORDER BY p_brand""",

    // the pushdown's contract is the exact cent lattice; the twin states
    // the same integer predicate, so both engines agree bit-for-bit at
    // band boundaries (no double-subtraction rounding on either side)
    "join_range_agg" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
                floor(CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
                      / 100.0 / CAST(count(*) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS avg_price,
                CAST(min(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS min_price,
                CAST(max(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS max_price
         FROM lineitem JOIN part
           ON abs(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                - CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)) <= 500
         GROUP BY p_brand ORDER BY p_brand""",

    "join_asof" ->
      """WITH u AS (
           SELECT o_custkey AS k, o_orderdate AS t, 0 AS is_l, o_orderkey AS tb,
                  NULL::BIGINT AS event_id, o_orderkey, o_totalprice
           FROM orders
           UNION ALL
           SELECT user_id, ts, 1, NULL, event_id, NULL, NULL FROM events
         ), m AS (
           SELECT *,
                  last_value(o_orderkey IGNORE NULLS) OVER win AS mk,
                  last_value(o_totalprice IGNORE NULLS) OVER win AS mp
           FROM u
           WINDOW win AS (PARTITION BY k ORDER BY t, is_l, tb NULLS FIRST
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         )
         SELECT event_id, k AS user_id, mk AS o_orderkey, round(mp, 2) AS o_totalprice
         FROM m WHERE is_l = 1 ORDER BY event_id""",

    // forward mirror: DESCENDING time, rights still before lefts at an
    // equal timestamp, smallest tiebreak last (wins)
    "join_asof_forward" ->
      """WITH u AS (
           SELECT user_id AS k, CAST(ts AS TIMESTAMP) AS t, 0 AS is_l,
                  event_id AS tb, event_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS ets,
                  NULL::BIGINT AS o_orderkey, NULL::BIGINT AS o_custkey
           FROM events
           UNION ALL
           SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP), 1, NULL, NULL,
                  NULL, o_orderkey, o_custkey
           FROM orders
         ), m AS (
           SELECT *,
                  last_value(event_id IGNORE NULLS) OVER win AS me,
                  last_value(ets IGNORE NULLS) OVER win AS mets
           FROM u
           WINDOW win AS (PARTITION BY k ORDER BY t DESC, is_l,
                            tb DESC NULLS LAST
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         )
         SELECT o_orderkey, o_custkey, me AS next_event_id,
                mets AS next_event_epoch
         FROM m WHERE is_l = 1 ORDER BY o_orderkey""",

    "join_multiway" ->
      """SELECT r_name, n_name,
                round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
                CAST(count(*) AS BIGINT) AS n
         FROM region
           JOIN nation ON r_regionkey = n_regionkey
           JOIN customer ON n_nationkey = c_nationkey
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",

    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_base_price,
                round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
                round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
                round(avg(l_quantity), 2) AS avg_qty,
                round(avg(l_extendedprice), 2) AS avg_price,
                round(avg(l_discount), 2) AS avg_disc,
                CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-31'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "agg_distinct" ->
      """SELECT l_returnflag,
                CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
                CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty, CAST(count(*) AS BIGINT) AS n,
                CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
                CAST(GROUPING(l_linestatus) AS INT) AS g_ls
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty, CAST(count(*) AS BIGINT) AS n,
                CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
                CAST(GROUPING(l_linestatus) AS INT) AS g_ls
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "agg_grouping_id" ->
      """SELECT CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
                CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
                CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                  AS INT) AS gid,
                coalesce(l_returnflag, '<total>') AS rf,
                coalesce(l_linestatus, '<total>') AS ls,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY g_rf, g_ls, rf, ls""",

    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty, CAST(count(*) AS BIGINT) AS n,
                CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
                CAST(GROUPING(l_linestatus) AS INT) AS g_ls
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "agg_stats" ->
      """SELECT l_returnflag,
                floor(stddev_samp(l_quantity) * 10000.0 + 0.5) / 10000.0 AS sd_qty,
                floor(var_samp(l_quantity) * 10000.0 + 0.5) / 10000.0 AS var_qty,
                floor(corr(l_quantity, l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS corr_qp,
                floor(covar_samp(l_quantity, l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS covar_qp
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_regression" ->
      """SELECT event_type,
                floor(regr_slope(value, (epoch_us(ts)/1e6 - 1704067200)/86400.0)
                      * 10000.0 + 0.5)/10000.0 AS slope,
                floor(regr_intercept(value, (epoch_us(ts)/1e6 - 1704067200)/86400.0)
                      * 10000.0 + 0.5)/10000.0 AS icept,
                floor(regr_r2(value, (epoch_us(ts)/1e6 - 1704067200)/86400.0)
                      * 10000.0 + 0.5)/10000.0 AS r2
         FROM events GROUP BY event_type ORDER BY event_type""",

    "agg_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 10000.0) AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n,
                min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
                sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_price
         FROM lineitem GROUP BY bucket ORDER BY bucket""",

    "agg_pivot" ->
      """SELECT l_returnflag,
                round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F",
                round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O"
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "window_range_frame" ->
      """SELECT o_orderkey, o_custkey,
                sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  OVER (PARTITION BY o_custkey
                        ORDER BY date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
                        RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) / 100.0 AS trail7_price,
                first_value(o_orderkey) OVER wfull AS first_ok,
                last_value(o_orderkey) OVER wfull AS last_ok,
                nth_value(o_orderkey, 2) OVER wfull AS second_ok
         FROM orders WHERE o_custkey <= 200
         WINDOW wfull AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_orderkey""",

    "join_salted" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
                sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // hot-key-only salting is semantics-preserving: the oracle is the
    // plain inner join
    "join_salted_hotkey" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
                sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "join_bucketed" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
                sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "scan_bucket_prune" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders WHERE o_custkey = 37 ORDER BY o_orderkey""",

    "scan_partition_prune" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
                sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_price
         FROM orders WHERE o_orderpriority = '1-URGENT'
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // layout-independent twin of the z-ordered box scan: same
    // middle-quartile bounds derived from the data's own min/max with the
    // same floor-over-double arithmetic (exact below 2^53 in both engines)
    "scan_zorder_prune" ->
      """WITH b AS (SELECT min(l_orderkey) AS xlo, max(l_orderkey) AS xhi,
                           min(l_partkey) AS ylo, max(l_partkey) AS yhi
                    FROM lineitem)
         SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(l_quantity) AS BIGINT) AS sum_qty
         FROM lineitem, b
         WHERE l_orderkey BETWEEN xlo + CAST(floor((xhi - xlo) / 4.0) AS BIGINT)
                              AND xlo + CAST(floor((xhi - xlo) / 2.0) AS BIGINT)
           AND l_partkey BETWEEN ylo + CAST(floor((yhi - ylo) / 4.0) AS BIGINT)
                             AND ylo + CAST(floor((yhi - ylo) / 2.0) AS BIGINT)
         GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST""",

    "join_dpp" ->
      s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_price
          FROM orders JOIN ${graft.sources.Partitioned.priorityTiersSql}
               USING (o_orderpriority)
          WHERE tier = 'hot'
          GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // bloom filtering is semantics-preserving — the oracle is the plain
    // filtered join
    "join_bloom_filtered" ->
      """SELECT p_size, CAST(count(*) AS BIGINT) AS n,
                sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) / 100.0 AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand = 'Brand#13'
         GROUP BY p_size ORDER BY p_size""",

    // epoch_us not needed: DuckDB reads the TIMESTAMP(NANOS) parquet as
    // µs-truncated TIMESTAMP, exactly matching Tables.events' `div 1000`.
    "agg_funnel" ->
      """WITH f AS (
           SELECT user_id,
                  min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                  min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                  min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
           FROM events GROUP BY user_id)
         SELECT CAST(CASE WHEN t_view IS NULL THEN 0
                          WHEN t_click IS NULL OR NOT (t_click > t_view) THEN 1
                          WHEN t_purchase IS NULL OR NOT (t_purchase > t_click) THEN 2
                          ELSE 3 END AS INT) AS funnel_depth,
                CAST(count(*) AS BIGINT) AS n_users
         FROM f GROUP BY 1 ORDER BY 1""",

    // old-generation rows (even keys) have no o_totalprice → NULL, folded
    // as 0 in the cent-scaled sum, invisible to n_priced
    "scan_schema_merge" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
                CAST(count(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS BIGINT) AS n_priced,
                sum(CAST(floor(CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice ELSE 0.0 END
                               * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_price
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "sink_roundtrip_orc" ->
      """SELECT l_linestatus, CAST(count(*) AS BIGINT) AS n,
                round(sum(l_quantity), 2) AS sum_qty,
                sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_price
         FROM lineitem WHERE l_quantity >= 45
         GROUP BY l_linestatus ORDER BY l_linestatus""",

    // identity roundtrip through the Confluent wire format: any loss or
    // reorder in encode/frame/decode breaks the hash against the raw table
    "sink_roundtrip_avro" ->
      "SELECT doc_id, text, lang FROM documents ORDER BY doc_id",

    // typed identity roundtrip: decimal/date/timestamp survive the Avro
    // logical-type carriers bit-exactly; the final projection normalizes
    // to the surface's hash-stable convention (double 2dp / epoch-micros
    // / date-as-string) so the driver hasher sees no typed columns
    "sink_roundtrip_avro_logical" ->
      """SELECT o_orderkey,
                CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) / 100.0 AS price,
                epoch_us(o_orderdate) AS ts_us,
                CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day
         FROM orders ORDER BY o_orderkey""",

    "agg_skew_profile" ->
      """WITH counts AS (
           SELECT l_orderkey, CAST(count(*) AS BIGINT) AS c
           FROM lineitem GROUP BY l_orderkey
         )
         SELECT CAST(count(*) AS BIGINT) AS n_keys,
                max(c) AS max_rows,
                floor(quantile_cont(c, 0.5) * 100.0 + 0.5) / 100.0 AS p50_rows,
                floor(quantile_cont(c, 0.99) * 100.0 + 0.5) / 100.0 AS p99_rows,
                floor(CAST(max(c) AS DOUBLE) * CAST(count(*) AS DOUBLE)
                      / CAST(sum(c) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS skew_ratio
         FROM counts ORDER BY n_keys""",

    "agg_median" ->
      """SELECT l_returnflag,
                floor(quantile_cont(l_quantity, 0.5) * 100.0 + 0.5) / 100.0 AS med_qty,
                floor(quantile_cont(l_extendedprice, 0.9) * 100.0 + 0.5) / 100.0 AS p90_price,
                floor(quantile_cont(l_discount, 0.25) * 10000.0 + 0.5) / 10000.0 AS q1_disc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // sketch queries (r12): the hashed surface is the EXACT aggregate
    // plus the Spark-side tolerance verdict — the oracle asserts the
    // verdict is 1, so a regressed sketch reddens the driver row
    "agg_approx_distinct" ->
      """SELECT l_returnflag,
                CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
                CAST(1 AS BIGINT) AS tol_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_hll_partitioned" ->
      """SELECT l_returnflag,
                CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
                CAST(1 AS BIGINT) AS tol_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_countmin" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                CAST(1 AS BIGINT) AS tol_ok
         FROM events WHERE event_type IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",

    "agg_approx_percentile" ->
      """SELECT l_returnflag,
                floor(quantile_cont(l_extendedprice, 0.5) * 100.0 + 0.5) / 100.0 AS p50_price,
                floor(quantile_cont(l_extendedprice, 0.9) * 100.0 + 0.5) / 100.0 AS p90_price,
                CAST(1 AS BIGINT) AS tol_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_custom_typed" ->
      """SELECT l_returnflag,
                round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS wavg_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "window_rank" ->
      """SELECT o_custkey, CAST(rnk AS INT) AS rnk, o_orderkey, round(o_totalprice, 2) AS o_totalprice
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                      rank() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rnk
               FROM orders)
         WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""",

    "window_percent_rank" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
                floor(percent_rank() OVER win * 1000000.0 + 0.5) / 1000000.0 AS pr,
                floor(cume_dist() OVER win * 1000000.0 + 0.5) / 1000000.0 AS cd
         FROM lineitem WHERE l_orderkey <= 2000
         WINDOW win AS (PARTITION BY l_returnflag
                        ORDER BY l_quantity, l_orderkey, l_linenumber)
         ORDER BY l_returnflag, pr, l_orderkey, l_linenumber""",

    "agg_mode" ->
      """SELECT o_orderpriority, o_orderstatus AS mode_status, n
         FROM (SELECT o_orderpriority, o_orderstatus,
                      CAST(count(*) AS BIGINT) AS n,
                      row_number() OVER (PARTITION BY o_orderpriority
                                         ORDER BY count(*) DESC, o_orderstatus) AS rn
               FROM orders GROUP BY o_orderpriority, o_orderstatus)
         WHERE rn = 1 ORDER BY o_orderpriority""",

    "agg_string_agg" ->
      """SELECT o_orderpriority,
                string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
                  AS statuses,
                CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_status
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "agg_filter_clause" ->
      """SELECT o_orderpriority,
                CAST(count(*) AS BIGINT) AS n,
                CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
                  AS n_f,
                CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                     FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS cents_o,
                floor(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'P')
                      * 100.0 + 0.5) / 100.0 AS avg_p
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "window_fill_forward" ->
      """WITH e AS (
           SELECT event_id, user_id, ts,
                  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
           FROM events
         )
         SELECT event_id, user_id,
                floor(coalesce(last_value(v IGNORE NULLS) OVER w, -1.0)
                      * 100.0 + 0.5) / 100.0 AS filled
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",

    "join_null_safe" ->
      """WITH l AS (
           SELECT nullif(lang, 'de') AS lk, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY 1
         ), r AS (
           SELECT nullif(lang, 'de') AS rk, min(doc_id) AS min_doc
           FROM documents GROUP BY 1
         )
         SELECT l.lk AS lang_key, n_docs, min_doc
         FROM l JOIN r ON l.lk IS NOT DISTINCT FROM r.rk
         ORDER BY lang_key NULLS FIRST""",

    // spine: range(h0, h1+1, 3600) == Spark's inclusive sequence(h0, h1)
    "time_gapfill" ->
      """WITH e AS (
           SELECT event_type,
                  CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hr
           FROM events
         ), c AS (
           SELECT event_type, hr, CAST(count(*) AS BIGINT) AS cnt
           FROM e GROUP BY event_type, hr
         ), sp AS (
           SELECT event_type, unnest(range(min(hr), max(hr) + 1, 3600)) AS hr
           FROM e GROUP BY event_type
         )
         SELECT sp.event_type, CAST(sp.hr AS BIGINT) AS hr,
                coalesce(cnt, 0) AS n
         FROM sp LEFT JOIN c ON sp.event_type = c.event_type AND sp.hr = c.hr
         ORDER BY sp.event_type, sp.hr""",

    "time_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS sec
           FROM events
         ), f AS (
           SELECT user_id, event_id, sec,
                  CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id
                                                 ORDER BY sec, event_id)
                            <= 1800 THEN 0 ELSE 1 END AS new_sess
           FROM e
         ), s AS (
           SELECT user_id,
                  sum(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY sec, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid,
                  sec
           FROM f
         ), g AS (
           SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
                  max(sec) - min(sec) AS dur_s
           FROM s GROUP BY user_id, sid
         )
         SELECT n_events, CAST(count(*) AS BIGINT) AS n_sessions,
                CAST(sum(dur_s) AS BIGINT) AS sum_dur_s,
                CAST(min(user_id) AS BIGINT) AS min_user
         FROM g GROUP BY n_events ORDER BY n_events""",

    "time_downsample" ->
      """WITH e AS (
           SELECT event_type,
                  CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hr,
                  value,
                  row_number() OVER (PARTITION BY event_type,
                                       date_trunc('hour', ts)
                                     ORDER BY ts, event_id) AS rn1,
                  row_number() OVER (PARTITION BY event_type,
                                       date_trunc('hour', ts)
                                     ORDER BY ts DESC, event_id DESC) AS rn2
           FROM events
         )
         SELECT event_type, hr,
                floor(min(CASE WHEN rn1 = 1 THEN value END) * 100.0 + 0.5)
                  / 100.0 AS open,
                floor(min(CASE WHEN rn2 = 1 THEN value END) * 100.0 + 0.5)
                  / 100.0 AS close,
                floor(min(value) * 100.0 + 0.5) / 100.0 AS lo,
                floor(max(value) * 100.0 + 0.5) / 100.0 AS hi,
                CAST(count(*) AS BIGINT) AS n
         FROM e GROUP BY event_type, hr ORDER BY event_type, hr""",

    "window_lag_lead" ->
      """SELECT event_id, user_id, round(value, 2) AS value,
                round(value - lag(value, 1) OVER win, 2) AS delta_prev,
                round(lead(value, 1) OVER win, 2) AS next_value
         FROM events
         WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY event_id""",

    "window_moving_avg" ->
      """SELECT event_id, user_id,
                floor(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100.0 + 0.5) / 100.0 AS mov_avg
         FROM events ORDER BY event_id""",

    "window_ntile" ->
      """SELECT o_custkey, o_orderkey,
                CAST(ntile(4) OVER win AS INT) AS quartile,
                floor(percent_rank() OVER win * 10000.0 + 0.5) / 10000.0 AS pct_rank,
                floor(cume_dist() OVER win * 10000.0 + 0.5) / 10000.0 AS cume
         FROM orders WHERE o_custkey <= 100
         WINDOW win AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",

    "window_running_sum" ->
      """SELECT o_orderkey,
                round(sum(o_totalprice) OVER (ORDER BY o_orderdate, o_orderkey
                                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
         FROM orders ORDER BY o_orderkey""",

    "sort_limit_topk" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
         FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""",

    "set_union_all" ->
      """SELECT * FROM (
           SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_linenumber % 2 = 1
           UNION ALL
           SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_linenumber % 2 = 0)
         ORDER BY l_orderkey, l_linenumber, l_quantity""",

    "set_union_distinct" ->
      """SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_returnflag <> 'N'
         UNION
         SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_returnflag <> 'A'
         ORDER BY l_returnflag, l_linestatus""",

    "set_intersect" ->
      """SELECT l_partkey AS partkey FROM lineitem
         INTERSECT
         SELECT p_partkey AS partkey FROM part WHERE p_size > 25
         ORDER BY partkey""",

    "set_except" ->
      """SELECT l_partkey AS partkey FROM lineitem
         EXCEPT
         SELECT p_partkey AS partkey FROM part WHERE p_size > 25
         ORDER BY partkey""",

    "set_except_all" ->
      """SELECT l_partkey AS partkey FROM lineitem
         EXCEPT ALL
         SELECT p_partkey AS partkey FROM part WHERE p_size > 25
         ORDER BY partkey""",

    "join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
         FROM region CROSS JOIN (SELECT n_nationkey, n_name FROM nation)
         ORDER BY r_regionkey, n_nationkey""",

    "agg_collect_set" ->
      """SELECT l_returnflag,
                array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
                array_to_string(list_sort(list(DISTINCT l_linenumber)), ',') AS linenos
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
