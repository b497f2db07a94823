package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Join operators beyond plain `Dataset.join`.
  *
  * The reference engine (d1eg0/kafka-to-parquet, /root/reference/src/main.rs)
  * has no joins at all; this module is part of the SURVEY §2.B extension
  * surface. Everything here compiles to stock Catalyst operators — no custom
  * strategies — so AQE/broadcast/skew handling apply unchanged at cluster
  * scale.
  */
object Joins {

  /** Point-in-time (AS-OF) join: for every left row, attach the payload of
    * the latest right row with the same key whose time is <= the left time.
    *
    * Spark has no native ASOF join. The naive formulation — a range
    * self-join (`l.key = r.key && r.t <= l.t` + max) — explodes to
    * O(|matches|) rows before aggregating, which is fatal at 100 TB.
    * Instead we union both sides (one column-aligned pass, no row
    * multiplication), shuffle ONCE on the key, and take a running
    * `last(payload, ignoreNulls)` over an ordered window. Cost is a single
    * shuffle + per-partition sort: the same lower bound a native
    * sort-merge ASOF implementation would have.
    *
    * Tie-breaking is deterministic: right rows at the same timestamp sort
    * before left rows (so an equal-timestamp right row IS matched), and
    * among equal-timestamp right rows the greatest `rightTiebreak` wins.
    *
    * Output: all left columns + every right payload column prefixed
    * `asof_`; unmatched left rows keep nulls.
    */
  def asof(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightTiebreak: String): DataFrame =
    asofImpl(left, leftKey, leftTime, right, rightKey, rightTime,
      rightTiebreak, forward = false)

  /** Forward point-in-time join (`merge_asof direction='forward'`): for
    * every left row, attach the payload of the EARLIEST right row with
    * the same key whose time is >= the left time — "the next reading
    * after the request", the mirror of [[asof]]'s "latest state before".
    * Same single-shuffle union+window shape; the window simply runs in
    * descending time order, so the running `last(payload, ignoreNulls)`
    * at a left row is the smallest right time at-or-after it.
    * Tie-breaking mirrors [[asof]]: an equal-timestamp right row IS
    * matched, and among equal-timestamp right rows the SMALLEST
    * `rightTiebreak` wins (the natural "first next" reading).
    */
  def asofForward(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightTiebreak: String): DataFrame =
    asofImpl(left, leftKey, leftTime, right, rightKey, rightTime,
      rightTiebreak, forward = true)

  private def asofImpl(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightTiebreak: String, forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(_ == rightKey)
    val rSchema = right.schema
    val lSchema = left.schema
    val tbType = rSchema(rightTiebreak).dataType

    val l2 = left.select(
      (Seq(col(leftKey).as("__k"), col(leftTime).cast("timestamp").as("__t"),
           lit(1).as("__is_l"), lit(null).cast(tbType).as("__tb")) ++
        leftCols.map(col) ++
        rightPayload.map(c => lit(null).cast(rSchema(c).dataType).as(s"__r_$c"))): _*)
    val r2 = right.select(
      (Seq(col(rightKey).as("__k"), col(rightTime).cast("timestamp").as("__t"),
           lit(0).as("__is_l"), col(rightTiebreak).as("__tb")) ++
        leftCols.map(c => lit(null).cast(lSchema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as(s"__r_$c"))): _*)

    // Backward: ascending time, rights before lefts at equal t, greatest
    // tiebreak last (wins). Forward: DESCENDING time — the running last()
    // then holds the smallest right time at-or-after the left row —
    // rights still first at equal t, smallest tiebreak last (wins).
    val w = Window.partitionBy("__k")
      .orderBy(
        (if (forward) Seq(col("__t").desc, col("__is_l"), col("__tb").desc)
         else Seq(col("__t"), col("__is_l"), col("__tb"))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = rightPayload.foldLeft(l2.unionByName(r2)) { (df, c) =>
      df.withColumn(s"__m_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    matched.filter(col("__is_l") === 1)
      .select(leftCols.map(col) ++ rightPayload.map(c => col(s"__m_$c").as(s"asof_$c")): _*)
  }

  /** Skew-resistant equi-join: salt the skewed (left) side into
    * `saltFactor` sub-keys and replicate the right side once per salt, so
    * one hot key spreads over `saltFactor` reducers instead of melting a
    * single task. Deterministic (salt = hash of the whole left row), so
    * results are reproducible run-to-run.
    *
    * AQE's skew-join handling covers sort-merge joins at runtime; this is
    * the explicit form for when the skew is known ahead of time, the join
    * is not SMJ, or AQE is off. Cost: right side inflated ×saltFactor —
    * use for moderate saltFactor on a side that is small-ish but too big
    * to broadcast.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val lSalted = left.withColumn("__lsalt",
      pmod(hash(rowDiscriminators(left, leftKey): _*), lit(saltFactor)))
    val rSalted = right.withColumn("__rsalt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    // Keys resolved against their own frames: with the common same-name
    // key (k = k) an unqualified col(k) would be ambiguous; the two salt
    // columns are named apart so neither resolution nor the final drop
    // can grab the wrong one.
    lSalted.join(rSalted,
        lSalted(leftKey) === rSalted(rightKey) &&
          col("__lsalt") === col("__rsalt"))
      .drop("__lsalt", "__rsalt")
  }

  /** Salt-hash input shared by both salting paths: the key plus every
    * hashable non-key column as a row discriminator — rows sharing a hot
    * key must spread across salts (a key-only hash is constant per key
    * and spreads nothing). MapType is unhashable in Spark, so map columns
    * are excluded rather than failing the whole join.
    *
    * Caveat (ADVICE r8): rows that are EXACT duplicates across every
    * hashable column hash identically, so a hot key whose rows are all
    * copies of one row still lands on a single salt — deliberate, because
    * the alternative (a rand()/monotonic-id salt component) makes the
    * join nondeterministic under retries and replays (a re-executed task
    * re-salts its rows differently, breaking exactly-once sinks and
    * hash-compared results). A corpus whose hot keys are pure duplicate
    * rows should dedup-then-join (the copies carry no information the
    * join can use) rather than trade away determinism.
    */
  private def rowDiscriminators(df: DataFrame, key: String): Seq[Column] =
    col(key) +: df.schema.fields
      .filterNot(f => f.name == key ||
        f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toIndexedSeq

  /** Left-side key histogram restricted to keys at/above `minCount` —
    * the skew profile that feeds [[hotKeySaltedJoin]]. One partial-agg
    * shuffle over the key column only; by definition of skew the result
    * is a handful of keys, safe to broadcast.
    */
  def profileHotKeys(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount)
      .select(col(key))

  /** Two-level skew join: salt ONLY the hot keys, join the cold keys
    * plain. [[saltedEquiJoin]] replicates the ENTIRE right side
    * ×saltFactor — fine for a smallish right side, fatal when the right
    * side is fact-sized; here right-side inflation is limited to the hot
    * keys' rows: |right| + |hot-key right rows|×(saltFactor-1).
    *
    * `hotKeys` is a one-column DataFrame of the key values to salt —
    * typically [[profileHotKeys]] on the skewed side (the same scan the
    * `agg_skew_profile` diagnostic runs), or a known-hot list. It is
    * broadcast: both sides tag rows hot/cold with a broadcast probe (no
    * shuffle), hot left rows get a deterministic row-hash salt in
    * [0, saltFactor), hot right rows replicate once per salt, and cold
    * rows on both sides carry salt 0. One equi-join on (key, salt) —
    * a single shuffle whose hottest reducer now holds 1/saltFactor of the
    * hottest key.
    *
    * Skew-split contract: the hot-side salt is the deterministic row hash
    * of [[rowDiscriminators]], so a hot key whose rows are EXACT
    * duplicates of one row still lands on a single salt — see the caveat
    * there for why that trade (determinism under task retries vs spreading
    * informationless copies) is deliberate, and dedup-then-join when hot
    * keys are pure duplicates.
    */
  def hotKeySaltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltFactor: Int,
      hotKeys: DataFrame): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require(hotKeys.columns.length == 1,
      s"hotKeys must be a single key column, got ${hotKeys.columns.mkString(",")}")
    val hk = broadcast(
      hotKeys.select(col(hotKeys.columns.head).as("__hot")).distinct())
    val l = left.join(hk, col(leftKey) === col("__hot"), "left")
      .withColumn("__lsalt",
        when(col("__hot").isNotNull,
          pmod(hash(rowDiscriminators(left, leftKey): _*), lit(saltFactor)))
          .otherwise(lit(0)))
      .drop("__hot")
    val r = replicateHotRight(right, rightKey, saltFactor, hk)
    l.join(r,
        l(leftKey) === r(rightKey) && col("__lsalt") === col("__rsalt"))
      .drop("__lsalt", "__rsalt")
  }

  /** The right leg of [[hotKeySaltedJoin]], exposed so tests can assert
    * the inflation contract: output rows = |right| + |hot-key right
    * rows|×(saltFactor-1). `hk` is a broadcast one-column frame named
    * `__hot`.
    */
  private[graft] def replicateHotRight(right: DataFrame, rightKey: String,
      saltFactor: Int, hk: DataFrame): DataFrame =
    right.join(hk, col(rightKey) === col("__hot"), "left")
      .withColumn("__rsalt",
        explode(when(col("__hot").isNotNull,
          sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(sequence(lit(0), lit(0)))))
      .drop("__hot")

  /** Banded range join as an EQUI-join: all (left, right) pairs with
    * `|leftVal - rightVal| <= band`, without a nested-loop join.
    *
    * A broadcast NLJ (what Catalyst picks for a raw theta predicate) is
    * right only while one side fits in a broadcast; when both sides are
    * fact-sized the band structure makes the predicate bucketizable:
    * left rows get bucket `floor(x/W)`, right rows are replicated to
    * buckets `floor(r/W) - m-2 .. + m+2` with `m = ceil(band/W)` — in
    * real arithmetic the buckets a within-band left value can land in are
    * `floor(r/W) ± m` (x ∈ [r-band, r+band] ⇒ x/W ∈ [r/W - m, r/W + m]
    * ⇒ floor ∈ [floor(r/W)-m, floor(r/W)+m]) — and the exact band
    * predicate runs per bucket. The extra ±2 absorbs floating-point
    * rounding: `floor(x/W)` computes in double ulps, so near an integer
    * boundary a value passing the exact band filter can land one bucket
    * away from its real-arithmetic bucket — and the LEFT and RIGHT
    * floors can each round once, in OPPOSITE directions, compounding to
    * two buckets of drift; two guard buckets per side cover one rounding
    * error on each floor, at ~4/(2m+1) extra replication.
    * Catalyst plans a shuffled hash / sort-merge join on the bucket key
    * (or broadcasts the replicated side while it stays small): pair work
    * is O(rows-per-bucket²) per bucket, never O(|L|·|R|). A matching pair
    * meets in exactly one bucket (bucket(left) is unique and the right
    * replication offsets are distinct), so no post-join dedup is needed.
    *
    * `bucketWidth` (default = band) is the cost knob, now independent of
    * the band: replication factor is `2*ceil(band/W) + 5`, per-bucket
    * population shrinks with W — size W so buckets stay balanced without
    * bending the band semantics. A band much wider than the value domain
    * still degenerates to one giant bucket; shrink W below band to split
    * it (at the replication cost above).
    *
    * Output: all left columns + all right columns (bucket plumbing
    * dropped).
    */
  def bandedRangeJoin(left: DataFrame, right: DataFrame,
      leftVal: String, rightVal: String, band: Double,
      bucketWidth: Double = Double.NaN): DataFrame = {
    require(band > 0.0, s"band must be > 0, got $band")
    val w = if (bucketWidth.isNaN) band else bucketWidth
    require(w > 0.0, s"bucketWidth must be > 0, got $w")
    val m = math.ceil(band / w).toLong
    require(2 * m + 5 <= 1001,
      s"bucketWidth=$w replicates the right side ${2 * m + 5}x for band=$band; " +
        "widen bucketWidth (replication factor = 2*ceil(band/bucketWidth)+5)")
    val l = left.withColumn("__bkt", floor(col(leftVal) / w).cast("long"))
    val r = right
      .withColumn("__off", explode(sequence(lit(-m - 2L), lit(m + 2L))))
      .withColumn("__bkt",
        floor(col(rightVal) / w).cast("long") + col("__off"))
      .drop("__off")
    l.join(r, Seq("__bkt"))
      .filter(abs(col(leftVal) - col(rightVal)) <= band)
      .drop("__bkt")
  }

  /** Aggregate-pushdown band join: for every probe row, the COUNT and SUM
    * of a build-side measure over all build rows within `band` of the
    * probe value — WITHOUT enumerating the matching pairs.
    *
    * [[bandedRangeJoin]] is the right operator when the caller needs the
    * pairs themselves; when the caller only aggregates them (n / sum /
    * avg per probe group — the shape of every range-join query in this
    * catalog), pair enumeration is pure waste, and it is what made the
    * band joins the output-bound entries of the scale decades: the true
    * pair count grows ×100 per ×10 data decade under a fixed band over a
    * fixed value domain (BENCH_decade2_r10.json adjudication; 1.59/1.57
    * exponents under skew in BENCH_skew_decade_r11.json). This operator
    * computes the same aggregates in O(|build| + |probe|·log D):
    *
    *  1. quantize both sides to the cent lattice (`floor(x·100 + 0.5)`,
    *     exact for 2-decimal money columns); the band becomes the EXACT
    *     integer predicate |b_cents − p_cents| <= band·100 — no
    *     float-boundary ambiguity, and the oracle twin states the same
    *     lattice predicate;
    *  2. filter the build side to the probe min/max ± band (the filter is
    *     on the RAW column, so it pushes to the parquet scan) and
    *     partial-aggregate per cent value — one map-side-combined shuffle
    *     whose output is bounded by the value DOMAIN (D distinct cents),
    *     not by the data volume;
    *  3. prefix-sum the per-cent frame into three sorted arrays on the
    *     driver (domain-bounded collect, same legitimacy class as the IVF
    *     centroid collect), broadcast them, and answer every probe row
    *     with two binary searches: n = cum(c+W) − cum(c−W−1).
    *
    * At 100 TB the build side costs one shuffle of a domain-bounded frame
    * and the probe side a shuffle-free mapPartitions — exponent ~1 in
    * both inputs where the pair join is pair-bound. The driver index
    * holds at most the whole domain at 24 bytes/cent; the
    * `maxIndexCents` guard (default 8M cents = an $80k span) throws with
    * a pointer back to [[bandedRangeJoin]] rather than silently
    * collecting an unbounded frame.
    *
    * Output: all probe columns + `band_n` (match count) +
    * `band_sum_cents` (sum of `measureCol` in cents over the matches;
    * build rows with a NULL measure count toward `band_n` but add 0) +
    * `band_min_cents`/`band_max_cents` (min/max of the measure over the
    * matches, SQL semantics: NULL measures are ignored, and the columns
    * are NULL when no match carries a non-null measure). Min/max ride a
    * SEGMENT TREE over the same sorted per-cent index — a band is a
    * CONTIGUOUS range of index positions, so range-min/max is two
    * O(log d) descents per probe row at O(d) extra driver/broadcast
    * memory (the "different index shape" the prefix sums can't answer;
    * for percentiles of an ARBITRARY measure see `measurePercentiles`).
    * Probe rows with no match keep band_n = 0 — callers reproducing
    * inner-join semantics filter `band_n > 0`; probe rows with a NULL
    * value match nothing (join semantics).
    *
    * `keyPercentiles`: EXACT percentiles of the JOIN KEY over the band
    * matches (the "median competitor price within ±band" shape, where
    * the measure IS the key) — answerable from the same per-cent count
    * prefix sums with one extra binary search each: the p-th percentile
    * is the smallest cent whose cumulative in-band count reaches
    * ⌈p·n⌉ (the classic lower/"disc" quantile — an element of the data,
    * no interpolation; p must be in (0, 1]). Adds one nullable
    * `band_key_p<percent>` LongType column (cents) per requested p,
    * NULL when the band is empty. Per-probe cost O(log d) per
    * percentile, no extra index memory.
    *
    * `measurePercentiles` (r12, VERDICT r11 item 7): APPROXIMATE
    * percentiles of the MEASURE over the band matches — the last shape
    * the pair forms could answer and this join couldn't. One mergeable
    * fixed-size [[TDigest]] per populated cent (built executor-side in
    * the same groupBy, only sketch bytes reach the driver), stacked into
    * the same position segment tree; a probe merges O(log d) node
    * digests and reads its quantiles. Adds one nullable
    * `band_msr_p<percent>` DoubleType column (measure units, 4dp) per
    * requested p; NULL when no match carries a non-null measure.
    * Rank error is hard-bounded by the k0 scale (≤ W/(2·100) = 0.5% of
    * the band population per digest, ~log d times that after merges —
    * tolerance-tested, not hash-oracled, and deliberately OPT-IN: digest
    * results are approximate-stable, not bit-deterministic across
    * partitionings). Memory: O(d·compression) driver/broadcast doubles,
    * guarded by `maxDigestCents` (default 16384 populated cents ≈ 100 MB
    * worst case) — raise it consciously or pre-bucket the domain.
    */
  def bandAggJoin(probe: DataFrame, probeCol: String,
      build: DataFrame, buildCol: String, measureCol: String,
      band: Double, maxIndexCents: Long = 8000000L,
      keyPercentiles: Seq[Double] = Nil,
      measurePercentiles: Seq[Double] = Nil,
      maxDigestCents: Int = 16384): DataFrame = {
    require(keyPercentiles.forall(p => p > 0.0 && p <= 1.0),
      s"keyPercentiles must be in (0, 1], got $keyPercentiles")
    require(measurePercentiles.forall(p => p >= 0.0 && p <= 1.0),
      s"measurePercentiles must be in [0, 1], got $measurePercentiles")
    require(band > 0.0, s"band must be > 0, got $band")
    val bandC = math.round(band * 100.0)
    def cents(c: Column): Column = floor(c * 100.0 + 0.5).cast("long")

    val pctNames = keyPercentiles.map(p =>
      s"band_key_p${math.round(p * 100)}")
    val msrNames = measurePercentiles.map(p =>
      s"band_msr_p${math.round(p * 100)}")
    val outSchema = StructType(probe.schema.fields :+
      StructField("band_n", LongType, nullable = false) :+
      StructField("band_sum_cents", LongType, nullable = false) :+
      StructField("band_min_cents", LongType, nullable = true) :+
      StructField("band_max_cents", LongType, nullable = true) :++
      pctNames.map(StructField(_, LongType, nullable = true)) :++
      msrNames.map(StructField(_, DoubleType, nullable = true)))
    // domain bounds over FINITE probe values only: a NaN/±Inf probe row
    // matches nothing (kernel guard below) and must not widen — or, for
    // Inf, infinitely blow — the index domain
    val probeD = col(probeCol).cast("double")
    val finiteProbe = when(isnan(probeD) ||
      probeD === Double.PositiveInfinity ||
      probeD === Double.NegativeInfinity, lit(null))
      .otherwise(col(probeCol))
    val bounds = probe
      .agg(min(cents(finiteProbe)), max(cents(finiteProbe))).head()
    if (bounds.isNullAt(0)) {
      // no finite probe value ⇒ no index to build, but preserve the probe
      // rows exactly as the kernel's per-row non-finite path would
      // (band_n=0, sum=0, NULL min/max/percentiles) — ADVICE r11: the
      // former empty-frame return dropped rows that a probe side with at
      // least one finite value would have kept
      val nNulls = keyPercentiles.length + measurePercentiles.length
      return probe.mapPartitions { it =>
        it.map(r => Row.fromSeq(r.toSeq :+ 0L :+ 0L :+ null :+ null :++
          Seq.fill(nNulls)(null)))
      }(Encoders.row(outSchema))
    }
    val loC = bounds.getLong(0) - bandC
    val hiC = bounds.getLong(1) + bandC
    require(hiC - loC + 1 <= maxIndexCents,
      s"band domain spans ${hiC - loC + 1} cents > maxIndexCents=" +
        s"$maxIndexCents; the prefix-sum index would not be domain-small " +
        "— use bandedRangeJoin + groupBy for this shape")

    // Per-cent partial aggregate of the build side, domain-filtered. The
    // raw-column range filter (±1 cent slack for the quantization) is the
    // one that reaches PushedFilters; the exact lattice bound re-checks.
    val msrEnabled = measurePercentiles.nonEmpty
    // digest input: non-finite measures are EXCLUDED like NULLs (r12
    // review: one NaN would poison the merged centroid means and make
    // every covering probe's band_msr_p* NaN; Inf would destroy the
    // interpolation ends)
    val msrD = col(measureCol).cast("double")
    val finiteMsr = when(isnan(msrD) ||
      msrD === Double.PositiveInfinity ||
      msrD === Double.NegativeInfinity, lit(null)).otherwise(msrD)
    val perCentBase = build
      .filter(col(buildCol) >= (loC.toDouble - 1.0) / 100.0 &&
        col(buildCol) <= (hiC.toDouble + 1.0) / 100.0)
      .select(cents(col(buildCol)).as("__c"),
        coalesce(cents(col(measureCol)), lit(0L)).as("__m"),
        cents(col(measureCol)).as("__mn"), // nullable: min/max ignore nulls
        finiteMsr.as("__v"))
      .filter(col("__c").between(loC, hiC))
      .groupBy(col("__c"))
    val aggCols = Seq(count(lit(1)).as("__n"), sum(col("__m")).as("__s"),
      min(col("__mn")).as("__min"), max(col("__mn")).as("__max")) ++
      (if (msrEnabled) Seq(TDigest.digestUdaf(col("__v")).as("__dig")) else Nil)
    val perCent = perCentBase
      .agg(aggCols.head, aggCols.tail: _*)
      .collect()
      .sortBy(_.getLong(0))

    val d = perCent.length
    val cs = new Array[Long](d)
    val cumN = new Array[Long](d + 1)
    val cumS = new Array[Long](d + 1)
    // iterative segment trees over index POSITIONS (a cent band is a
    // contiguous position range of the sorted cs). Sentinels double as
    // the all-NULL-measure group value; a query returning a sentinel
    // means "no non-null measure in range" -> NULL out.
    var size = 1
    while (size < math.max(d, 1)) size <<= 1
    val segMin = Array.fill(2 * size)(Long.MaxValue)
    val segMax = Array.fill(2 * size)(Long.MinValue)
    var i = 0
    while (i < d) {
      cs(i) = perCent(i).getLong(0)
      cumN(i + 1) = cumN(i) + perCent(i).getLong(1)
      cumS(i + 1) = cumS(i) + perCent(i).getLong(2)
      if (!perCent(i).isNullAt(3)) {
        segMin(size + i) = perCent(i).getLong(3)
        segMax(size + i) = perCent(i).getLong(4)
      }
      i += 1
    }
    i = size - 1
    while (i >= 1) {
      segMin(i) = math.min(segMin(2 * i), segMin(2 * i + 1))
      segMax(i) = math.max(segMax(2 * i), segMax(2 * i + 1))
      i -= 1
    }
    // measure-percentile digest tree: same position layout as segMin/Max,
    // one fixed-size mergeable digest per node (opt-in; guarded memory)
    val segDig: Array[TDigest.Digest] =
      if (!msrEnabled) null
      else {
        require(d <= maxDigestCents,
          s"measurePercentiles: $d populated cents > maxDigestCents=" +
            s"$maxDigestCents (≈${2L * size * TDigest.Compression * 32 / (1 << 20)} MB " +
            "of digest tree); raise the guard consciously or pre-bucket")
        val a = Array.fill(2 * size)(TDigest.empty)
        var j = 0
        while (j < d) {
          a(size + j) = TDigest.deserialize(perCent(j).getAs[Array[Byte]](5))
          j += 1
        }
        j = size - 1
        while (j >= 1) { a(j) = TDigest.merge(a(2 * j), a(2 * j + 1)); j -= 1 }
        a
      }
    val bc = probe.sparkSession.sparkContext
      .broadcast((cs, cumN, cumS, segMin, segMax))
    val bcDig =
      if (msrEnabled) probe.sparkSession.sparkContext.broadcast(segDig) else null
    val probeIdx = probe.schema.fieldIndex(probeCol)
    val ps = keyPercentiles.toArray
    val msrPs = measurePercentiles.toArray
    probe.mapPartitions { it =>
      val (cs, cumN, cumS, segMin, segMax) = bc.value
      val size = segMin.length / 2
      // insertion point: number of index cents <= x
      def upTo(x: Long): Int = {
        var lo = 0
        var hi = cs.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (cs(mid) <= x) lo = mid + 1 else hi = mid
        }
        lo
      }
      // range min/max over positions [l, r) via the standard iterative
      // bottom-up walk; sentinel result = no non-null measure in range
      def rangeMinMax(l: Int, r: Int): (Long, Long) = {
        var lo = l + size; var hi = r + size
        var mn = Long.MaxValue; var mx = Long.MinValue
        while (lo < hi) {
          if ((lo & 1) == 1) { mn = math.min(mn, segMin(lo))
            mx = math.max(mx, segMax(lo)); lo += 1 }
          if ((hi & 1) == 1) { hi -= 1; mn = math.min(mn, segMin(hi))
            mx = math.max(mx, segMax(hi)) }
          lo >>= 1; hi >>= 1
        }
        (mn, mx)
      }
      // range digest merge over positions [l, r): the same walk, merging
      // O(log d) fixed-size node digests (only when msrPs requested)
      val dig = if (bcDig == null) null else bcDig.value
      def rangeDigest(l: Int, r: Int): TDigest.Digest = {
        var lo = l + size; var hi = r + size
        var acc = TDigest.empty
        while (lo < hi) {
          if ((lo & 1) == 1) { acc = TDigest.merge(acc, dig(lo)); lo += 1 }
          if ((hi & 1) == 1) { hi -= 1; acc = TDigest.merge(acc, dig(hi)) }
          lo >>= 1; hi >>= 1
        }
        acc
      }
      it.map { r =>
        val v = r.get(probeIdx)
        val dv =
          if (v == null) Double.NaN else v.asInstanceOf[Number].doubleValue
        // null/NaN/±Inf probes match nothing — the SQL band predicate is
        // false for all of them (NaN.toLong would quantize to lattice 0
        // and spuriously match otherwise)
        if (java.lang.Double.isNaN(dv) || java.lang.Double.isInfinite(dv))
          Row.fromSeq(r.toSeq :+ 0L :+ 0L :+ null :+ null :++
            ps.map(_ => null) :++ msrPs.map(_ => null))
        else {
          val c = math.floor(dv * 100.0 + 0.5).toLong
          val hiI = upTo(c + bandC)
          val loI = upTo(c - bandC - 1)
          val n = cumN(hiI) - cumN(loI)
          val (mn, mx) =
            if (loI < hiI) rangeMinMax(loI, hiI)
            else (Long.MaxValue, Long.MinValue)
          // p-th key percentile: smallest index cent whose cumulative
          // in-band count reaches ceil(p*n) — binary search over cumN
          // positions in [loI, hiI)
          val pcts = ps.map { p =>
            if (n == 0) null
            else {
              val target = cumN(loI) + math.ceil(p * n).toLong
              var lo = loI; var hi = hiI - 1
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (cumN(mid + 1) >= target) hi = mid else lo = mid + 1
              }
              java.lang.Long.valueOf(cs(lo))
            }
          }
          val msrPcts: Seq[Any] =
            if (msrPs.isEmpty) Nil
            else if (loI >= hiI) msrPs.toSeq.map(_ => null)
            else {
              val dgt = rangeDigest(loI, hiI)
              if (dgt.isEmpty) msrPs.toSeq.map(_ => null)
              else msrPs.toSeq.map { p =>
                val q = TDigest.quantile(dgt, p)
                java.lang.Double.valueOf(math.floor(q * 10000.0 + 0.5) / 10000.0)
              }
            }
          Row.fromSeq(r.toSeq :+ n :+
            (cumS(hiI) - cumS(loI)) :+
            (if (mn == Long.MaxValue) null else java.lang.Long.valueOf(mn)) :+
            (if (mx == Long.MinValue) null else java.lang.Long.valueOf(mx)) :++
            pcts :++ msrPcts)
        }
      }
    }(Encoders.row(outSchema))
  }
}
