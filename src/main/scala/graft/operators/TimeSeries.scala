package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.roundHalfUp

/** Time-series ETL operators (SURVEY.md §2 A3-A12) — the reference
  * processor's semantics (Pennsieve/processor-EDF) re-expressed as
  * distributed Spark plans over the `events` sample stream
  * (channel ≈ event_type / user_id, sample ≈ (ts, value)).
  *
  * Time convention: `events.ts` arrives as int64 nanos
  * (nanosAsLong=true); all operators work in integer µs-since-epoch
  * (`ts div 1000`) — the reference's time unit
  * (reference: processor/base_processor/timeseries/utils.py:64-74) —
  * with integer arithmetic only, so results are bit-exact across engines.
  *
  * Scale notes: every per-channel operator is a single hash-partition by
  * its channel key followed by in-partition window/aggregation work; at
  * 100 TB the channel key would be (file_id, channel) with millions of
  * groups, which partitions evenly. No driver-side loops or collects.
  *
  * Channel-key parameterization: each ordered-window operator has a
  * `(events: DataFrame, …, keys: Seq[String])` overload taking a
  * caller-supplied input and composite channel key — the `Tables` form
  * defaults to `keys = Seq("event_type")` (the driver schema's channel
  * stand-in, cardinality 5 in testdata) purely for the oracle harness.
  * Ordered-window parallelism is bounded by the key cardinality (each
  * key's partition is one task's sort), so at 100 TB callers MUST pass
  * the high-cardinality natural key — e.g. the (`file`, `channel`) pair
  * the A1 EDF reader produces (reference semantics are per-channel,
  * base_processor/timeseries/base.py:322-342) — and parallelism then
  * scales with #files × #channels instead of capping at #channels.
  * The required input columns per overload are documented inline
  * (`ts` int64 ns + the keys, plus `event_id`/`value` where used).
  */
object TimeSeries {

  /** µs since epoch from the int64-ns ts column (integer division — no FP). */
  private def tsUs: Column = expr("ts div 1000")

  /** One hour in µs — the hour-of-day grid [[tsSeasonal]] phases against. */
  private val HourUs: Long = 3600L * 1000000

  /** A3: digital→physical calibration.
    *
    * Exactly the reference transform (processor/edf_processor/edf.py:14-18):
    * bit = (pmax-pmin)/(dmax-dmin); off = pmax/bit - dmax; phys = bit*(off+digital).
    * Pure codegen'd Column arithmetic; constants fold at plan time.
    */
  def calibrate(t: Tables,
                pmin: Double = -500.0, pmax: Double = 500.0,
                dmin: Double = -32768.0, dmax: Double = 32767.0): DataFrame = {
    val bit = (lit(pmax) - lit(pmin)) / (lit(dmax) - lit(dmin))
    val off = lit(pmax) / bit - lit(dmax)
    t.events
      .select(col("event_id"), col("value").as("digital"),
        roundHalfUp(bit * (off + col("value")), 6).as("physical"))
  }

  /** A4: contiguous timestamp synthesis — the reference's linspace-per-chunk
    * (base_processor/timeseries/base.py:357-372) as a distributed
    * `sequence` + `explode`: each channel row expands to its sample
    * timestamps with integer µs steps. No driver loop; expansion happens
    * on executors and parallelizes by channel.
    */
  def tsExpand(t: Tables, periodUs: Long = 100000L): DataFrame =
    t.events
      .groupBy(col("user_id"))
      .agg(min(tsUs).as("start_us"), count(lit(1)).as("n"))
      .select(col("user_id"), col("start_us"),
        explode(sequence(lit(0L), col("n") - 1)).as("k"))
      .select(col("user_id"), col("k"),
        (col("start_us") + col("k") * periodUs).as("ts_us"))

  /** A5: gap sessionization → contiguous chunks, the reference's
    * discontinuous_chunks (base.py:322-342): boundary where Δts exceeds
    * the gap threshold (reference: 2× sampling period). One shuffle by
    * channel; chunk ids via running sum of boundary flags.
    */
  def tsGapChunks(t: Tables, gapUs: Long = 2L * 3600 * 1000000,
                  keys: Seq[String] = Seq("event_type")): DataFrame =
    tsGapChunks(t.events, gapUs, keys)

  /** Caller-key variant — `events` needs `ts` (int64 ns), `event_id`,
    * and the `keys` columns (composite channel key, e.g. file+channel).
    */
  def tsGapChunks(events: DataFrame, gapUs: Long, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("us"), col("event_id"))
    events
      .select(kc :+ col("event_id") :+ tsUs.as("us"): _*)
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("chunk_id", sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(kc :+ col("chunk_id"): _*)
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"), count(lit(1)).as("n_samples"))
  }

  /** B33: distributed interval-overlap join — which intervals of relation
    * A temporally intersect which intervals of B. The driver instance
    * joins the gap chunks (A5) of DIFFERENT channels: "when channel X
    * was recording, what was channel Y doing" — the concurrent-recording
    * audit an EDF session review starts with, and the general operator
    * behind annotation×chunk and session×outage joins.
    *
    * Spark has no native interval join (a plain range predicate plans a
    * cross product); the scale shape is GRID CELLS: each interval
    * explodes to the `cellUs` cells it touches, candidates equi-join on
    * the cell (hash join, never a cross product; both sides read ONE
    * repartition via ReuseExchange), the exact closed-interval predicate
    * filters the survivors, and distinct() retires the multi-cell
    * duplicates. Completeness: two intersecting intervals share the cell
    * containing any intersection point. `maxCells` refuses an interval
    * spanning too many cells BEFORE the explode (remedy: raise cellUs)
    * — the gate runs on the interval-cardinality relation, not the
    * corpus. Overlap arithmetic is pure integer µs.
    */
  def chunkOverlaps(t: Tables, gapUs: Long = 2L * 3600 * 1000000,
                    cellUs: Long = 86400L * 1000000, maxCells: Int = 4096): DataFrame = {
    val chunks = tsGapChunks(t, gapUs)
      .select(col("event_type"), col("chunk_id"), col("start_us"), col("end_us"))
    intervalJoin(chunks, cellUs, maxCells)
  }

  /** The generic kernel of [[chunkOverlaps]]: self-join a keyed interval
    * relation (`key`, `chunk_id`, `start_us`, `end_us`) across DIFFERENT
    * keys (key_a < key_b). Closed-interval semantics: [s1,e1] and
    * [s2,e2] overlap iff s1 ≤ e2 ∧ s2 ≤ e1; overlap_us = min(e1,e2) −
    * max(s1,s2) (0 = they touch at one sample instant).
    */
  private[graft] def intervalJoin(intervals: DataFrame, cellUs: Long, maxCells: Int): DataFrame = {
    require(cellUs > 0, s"intervalJoin: cellUs must be positive, got $cellUs")
    val span = expr(s"(end_us div ${cellUs}L) - (start_us div ${cellUs}L) + 1")
    val widest = intervals.agg(max(span).as("mx")).collect().head
    if (!widest.isNullAt(0))
      require(widest.getLong(0) <= maxCells,
        s"intervalJoin: an interval touches ${widest.getLong(0)} grid cells (> maxCells=$maxCells); " +
          s"raise cellUs (currently $cellUs) so long intervals explode to fewer cells")
    val cells = intervals.withColumn("cell",
      explode(expr(s"sequence(start_us div ${cellUs}L, end_us div ${cellUs}L)")))
    val parted = cells.repartition(col("cell"))
    val a = parted.select(col("cell"), col("event_type").as("type_a"), col("chunk_id").as("chunk_a"),
      col("start_us").as("sa"), col("end_us").as("ea"))
    val b = parted.select(col("cell").as("cell_b"), col("event_type").as("type_b"), col("chunk_id").as("chunk_b"),
      col("start_us").as("sb"), col("end_us").as("eb"))
    a.join(b, col("cell") === col("cell_b") && col("type_a") < col("type_b") &&
        col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select(col("type_a"), col("chunk_a"), col("type_b"), col("chunk_b"),
        (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb"))).as("overlap_us"))
      .distinct()
  }

  /** A6: per-channel stats + rate inference.
    *
    * Rate inference is the reference's `1e6 / mode(Δts)`
    * (timeseries/utils.py:14-32), with Δ bucketed to whole seconds and the
    * mode tie-broken (count desc, Δ asc) so it is deterministic. Two
    * aggregations + a broadcast-sized join on the channel key.
    */
  def tsChannelStats(t: Tables, keys: Seq[String] = Seq("event_type")): DataFrame =
    tsChannelStats(t.events, keys)

  /** Caller-key variant — `events` needs `ts` (int64 ns), `event_id`,
    * `value`, and the `keys` columns.
    */
  def tsChannelStats(events: DataFrame, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("us"), col("event_id"))
    val base = events.select(kc ++ Seq(col("event_id"), col("value"), tsUs.as("us")): _*)
    val stats = base.groupBy(kc: _*).agg(
      min(col("us")).as("start_us"), max(col("us")).as("end_us"),
      count(lit(1)).as("num_values"),
      roundHalfUp(avg(col("value")), 4).as("avg_value"),
      roundHalfUp(stddev_samp(col("value")), 4).as("stddev_value"))
    val diffs = base
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .withColumn("diff_s", expr("(us - prev_us) div 1000000"))
      .filter(col("diff_s") > 0)
      .groupBy(kc :+ col("diff_s"): _*).agg(count(lit(1)).as("cnt"))
    val modeW = Window.partitionBy(kc: _*).orderBy(col("cnt").desc, col("diff_s").asc)
    val mode = diffs.withColumn("rk", row_number().over(modeW)).filter(col("rk") === 1)
      .select(kc ++ Seq(col("diff_s").as("mode_period_s"),
        roundHalfUp(lit(1.0) / col("diff_s"), 6).as("rate_hz")): _*)
    stats.join(mode, keys)
  }

  /** A7: downsampling resample to fixed buckets — partial aggregation
    * happens map-side; bucket key is integer µs so results are exact.
    */
  def tsResample(t: Tables, bucketUs: Long = 3600L * 1000000): DataFrame =
    t.events
      .select(col("event_type"), col("value"), tsUs.as("us"))
      .withColumn("bucket_us", expr(s"(us div ${bucketUs}L) * ${bucketUs}L"))
      .groupBy(col("event_type"), col("bucket_us"))
      // half-up rounding on BOTH engines (SURVEY §6): the data's limited
      // decimal precision makes exact .5 rounding boundaries common, and
      // Spark round (HALF_UP) vs DuckDB round (half-even) disagree there
      .agg(count(lit(1)).as("n"), roundHalfUp(avg(col("value")), 4).as("avg_value"),
        roundHalfUp(min(col("value")), 2).as("min_value"), roundHalfUp(max(col("value")), 2).as("max_value"))

  /** A8: threshold-crossing spike detection (the reference's UNIT/spike
    * surface, base.py:98-119): spike where prev < θ ≤ current, per channel.
    */
  def tsSpike(t: Tables, threshold: Double = 180.0,
              keys: Seq[String] = Seq("event_type")): DataFrame =
    tsSpike(t.events, threshold, keys)

  /** Caller-key variant — `events` needs `ts` (int64 ns), `event_id`,
    * `value`, and the `keys` columns.
    */
  def tsSpike(events: DataFrame, threshold: Double, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("us"), col("event_id"))
    events
      .select(kc ++ Seq(col("event_id"), col("value"), tsUs.as("us")): _*)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .filter(col("prev_value") < threshold && col("value") >= threshold)
      .select(kc ++ Seq(col("event_id"), col("us").as("ts_us"), col("value")): _*)
  }

  /** A8b: spike waveform extraction — the reference's UNIT spike payload
    * (base.py:98-119: spike = timestamp + surrounding waveform): each
    * threshold crossing carries the ±2 neighboring sample values, via the
    * same ordered window (no second scan). Window edges yield nulls.
    */
  def tsSpikeWaveforms(t: Tables, threshold: Double = 180.0,
                       keys: Seq[String] = Seq("event_type")): DataFrame =
    tsSpikeWaveforms(t.events, threshold, keys)

  /** Caller-key variant — `events` needs `ts` (int64 ns), `event_id`,
    * `value`, and the `keys` columns.
    */
  def tsSpikeWaveforms(events: DataFrame, threshold: Double, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("us"), col("event_id"))
    events
      .select(kc ++ Seq(col("event_id"), col("value"), tsUs.as("us")): _*)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("w_m2", lag(col("value"), 2).over(w))
      .withColumn("w_p1", lead(col("value"), 1).over(w))
      .withColumn("w_p2", lead(col("value"), 2).over(w))
      .filter(col("prev_value") < threshold && col("value") >= threshold)
      .select(kc ++ Seq(col("event_id"), col("us").as("ts_us"),
        col("w_m2"), col("prev_value").as("w_m1"), col("value").as("w_0"),
        col("w_p1"), col("w_p2")): _*)
  }

  /** A9: as-of join — each purchase gets the latest click at-or-before it
    * per user. Implemented as union + single ordered window pass per key
    * (no per-key collect, no range cross-product): clicks sort before
    * purchases at equal timestamps (side 0 < 1), matching ASOF `>=`.
    * One shuffle on user_id; scales as sort-within-partition.
    */
  def tsAsof(t: Tables): DataFrame = {
    val base = t.events.select(col("event_type"), col("event_id"), col("user_id"), col("value"), tsUs.as("us"))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"),
        col("us").as("c_us"), col("value").as("c_val"))
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), lit(1).as("side"),
        col("event_id"), col("value"),
        lit(null).cast("long").as("c_us"), lit(null).cast("double").as("c_val"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionAll(purchases)
      .withColumn("last_click_us", last(col("c_us"), ignoreNulls = true).over(w))
      .withColumn("last_click_val", last(col("c_val"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("us").as("p_us"), col("value"),
        col("last_click_us"), col("last_click_val"))
  }

  /** A9 (native path): the same as-of join through the custom
    * AsOfJoinPlan/AsOfJoinExec operator (graft.plans) — one exchange + sort
    * per side, then a streaming O(1)-state merge per partition. Output and
    * oracle identical to [[tsAsof]].
    */
  def tsAsofNative(t: Tables): DataFrame = {
    val base = t.events.select(col("event_type"), col("event_id"), col("user_id"), col("value"), tsUs.as("us"))
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us").as("p_us"), col("value"))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id").as("r_user_id"), col("us").as("last_click_us"), col("value").as("last_click_val"))
    graft.plans.AsOf.join(purchases, clicks, "user_id", "r_user_id", "p_us", "last_click_us")
      .select(col("event_id"), col("user_id"), col("p_us"), col("value"),
        col("last_click_us"), col("last_click_val"))
  }

  /** A10: typed annotation extraction from JSON props (the TAL-annotation
    * analogue, reference edf.py:62-70) — codegen'd JSON path, no UDF.
    */
  def tsAnnotations(t: Tables, minK: Long = 50L): DataFrame =
    t.events
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k") >= minK)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** A11: fuzzy channel matching — the reference's append-mode match
    * (base.py:178-221): same name and rate within 2 %
    * (`abs(1 - r1/r2) < 0.02`). Both sides aggregate to channel
    * cardinality, so the join is broadcast-sized at any scale.
    */
  def channelMatch(t: Tables): DataFrame = {
    def half(parity: Int) = t.events
      .filter(col("event_id") % 2 === parity)
      .groupBy(col("event_type"))
      .agg(min(tsUs).as("start_us"), max(tsUs).as("end_us"), count(lit(1)).as("n"))
      .filter(col("end_us") > col("start_us")) // rate undefined on zero span
      .select(col("event_type"),
        (col("n") * lit(3600.0 * 1000000) / (col("end_us") - col("start_us"))).as("rate"))
    val a = half(0).select(col("event_type"), col("rate").as("rate_a"))
    val b = half(1).select(col("event_type").as("event_type_b"), col("rate").as("rate_b"))
    a.join(broadcast(b),
        col("event_type") === col("event_type_b") &&
          abs(lit(1.0) - col("rate_a") / col("rate_b")) < 0.02)
      .select(col("event_type"), roundHalfUp(col("rate_a"), 6).as("rate_a"), roundHalfUp(col("rate_b"), 6).as("rate_b"))
  }

  /** A5b: the same sessionization through Spark's built-in
    * `session_window` (merging-sessions aggregation — the engine-native
    * path, also usable unchanged under Structured Streaming). Session end
    * = last event + gap; a gap of exactly `gapUs` starts a new session.
    */
  def tsSessionWindow(t: Tables, gapUs: Long = 2L * 3600 * 1000000,
                      keys: Seq[String] = Seq("event_type")): DataFrame =
    tsSessionWindow(t.events, gapUs, keys)

  /** Caller-key variant — `events` needs `ts` (int64 ns) and the `keys`
    * columns.
    */
  def tsSessionWindow(events: DataFrame, gapUs: Long, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    events
      .select(kc :+ tsUs.as("us"): _*)
      .withColumn("tsx", expr("timestamp_micros(us)"))
      .groupBy(session_window(col("tsx"), s"$gapUs microseconds") +: kc: _*)
      .agg(count(lit(1)).as("n"))
      .select(kc ++ Seq(
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n")): _*)
  }

  /** A15: moving-window smoothing — rolling mean/min/max over the last
    * `window` samples per channel (one ordered pass, no extra shuffle
    * beyond the channel partition).
    */
  def tsMoving(t: Tables, window: Int = 5,
               keys: Seq[String] = Seq("event_type")): DataFrame =
    tsMoving(t.events, window, keys)

  /** Caller-key variant — `events` needs `ts` (int64 ns), `event_id`,
    * `value`, and the `keys` columns.
    */
  def tsMoving(events: DataFrame, window: Int, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("us"), col("event_id"))
      .rowsBetween(-(window - 1), 0)
    events
      .select(kc ++ Seq(col("event_id"), col("value"), tsUs.as("us")): _*)
      .withColumn("mov_avg", roundHalfUp(avg(col("value")).over(w), 4))
      .withColumn("mov_min", min(col("value")).over(w))
      .withColumn("mov_max", max(col("value")).over(w))
      .select(kc ++ Seq(col("event_id"), col("us").as("ts_us"),
        col("mov_avg"), col("mov_min"), col("mov_max")): _*)
  }

  /** A16: cross-channel correlation — sample correlation of hourly means
    * between every channel pair, via a bucket-aligned self-join (channel
    * cardinality rows; never a sample-level cross product).
    */
  def tsCorr(t: Tables, bucketUs: Long = 3600L * 1000000): DataFrame = {
    val hourly = t.events
      .select(col("event_type"), col("value"), tsUs.as("us"))
      .withColumn("bucket_us", expr(s"(us div ${bucketUs}L) * ${bucketUs}L"))
      .groupBy(col("event_type"), col("bucket_us"))
      .agg(avg(col("value")).as("v"))
    val a = hourly.select(col("bucket_us"), col("event_type").as("type_a"), col("v").as("va"))
    val b = hourly.select(col("bucket_us").as("bb"), col("event_type").as("type_b"), col("v").as("vb"))
    a.join(b, col("bucket_us") === col("bb") && col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(round(corr(col("va"), col("vb")), 4).as("corr"), count(lit(1)).as("n_buckets"))
  }

  /** A16b: LAGGED cross-correlation — [[tsCorr]] swept over a window of
    * bucket lags (does channel A lead or lag channel B, the classic
    * lead-lag screen): corr(A(t), B(t + lag·bucket)) for every channel
    * pair and lag in [-maxLag, maxLag]. One lag explode on the
    * bucket-mean relation (channels × buckets rows, tiny vs the raw
    * stream) and one shifted-key join — the raw events aggregate ONCE,
    * never once per lag.
    */
  def tsXcorrLag(t: Tables, bucketUs: Long = 3600L * 1000000, maxLag: Int = 3): DataFrame = {
    val hourly = t.events
      .select(col("event_type"), col("value"), tsUs.as("us"))
      .withColumn("bucket_us", expr(s"(us div ${bucketUs}L) * ${bucketUs}L"))
      .groupBy(col("event_type"), col("bucket_us"))
      .agg(avg(col("value")).as("v"))
    val a = hourly.select(
      explode(array((-maxLag to maxLag).map(l => lit(l.toLong)): _*)).as("lag"),
      col("event_type").as("type_a"), col("bucket_us"), col("v").as("va"))
    val b = hourly.select(col("bucket_us").as("bb"), col("event_type").as("type_b"), col("v").as("vb"))
    a.join(b, col("bucket_us") + col("lag") * lit(bucketUs) === col("bb") &&
        col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"), col("lag"))
      .agg(roundHalfUp(corr(col("va"), col("vb")), 4).as("xcorr"), count(lit(1)).as("n_buckets"))
  }

  /** A17: gap-filling linear interpolation — resample to a dense hourly
    * grid per channel and linearly interpolate missing buckets between
    * the nearest observed neighbors (reference-domain gap repair).
    * Grid synthesis is `sequence`+`explode` per channel; fills come from
    * one ignore-nulls window pass in each direction.
    */
  def tsInterp(t: Tables, bucketUs: Long = 3600L * 1000000,
               keys: Seq[String] = Seq("event_type")): DataFrame =
    tsInterp(t.events, bucketUs, keys)

  /** Caller-key variant — `events` needs `ts` (int64 ns), `value`, and
    * the `keys` columns.
    */
  def tsInterp(events: DataFrame, bucketUs: Long, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val hourly = events
      .select(kc ++ Seq(col("value"), tsUs.as("us")): _*)
      .withColumn("bucket_us", expr(s"(us div ${bucketUs}L) * ${bucketUs}L"))
      .groupBy(kc :+ col("bucket_us"): _*)
      .agg(roundHalfUp(avg(col("value")), 4).as("v"))
    val grid = hourly.groupBy(kc: _*)
      .agg(min(col("bucket_us")).as("lo"), max(col("bucket_us")).as("hi"))
      .select(kc :+
        explode(sequence(col("lo"), col("hi"), lit(bucketUs))).as("bucket_us"): _*)
    val wAsc = Window.partitionBy(kc: _*).orderBy(col("bucket_us"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wDesc = Window.partitionBy(kc: _*).orderBy(col("bucket_us"))
      .rowsBetween(0, Window.unboundedFollowing)
    grid.join(hourly, keys :+ "bucket_us", "left")
      .withColumn("prev_v", last(col("v"), ignoreNulls = true).over(wAsc))
      .withColumn("prev_b", last(when(col("v").isNotNull, col("bucket_us")), ignoreNulls = true).over(wAsc))
      .withColumn("next_v", first(col("v"), ignoreNulls = true).over(wDesc))
      .withColumn("next_b", first(when(col("v").isNotNull, col("bucket_us")), ignoreNulls = true).over(wDesc))
      .withColumn("v_filled", when(col("v").isNotNull, col("v"))
        .when(col("prev_v").isNull, col("next_v"))
        .when(col("next_v").isNull, col("prev_v"))
        .otherwise(roundHalfUp(col("prev_v") +
          (col("next_v") - col("prev_v")) *
            ((col("bucket_us") - col("prev_b")).cast("double") / (col("next_b") - col("prev_b"))), 4)))
      .withColumn("was_gap", col("v").isNull)
      .select(kc ++ Seq(col("bucket_us"), col("v_filled"), col("was_gap")): _*)
  }

  /** A18: spectral band power via single-bin DFT (Goertzel-style) — the
    * band-power analytic of the reference's EEG domain, computed as two
    * codegen'd trig aggregates per frequency: amplitude(f) =
    * 2·√(C² + S²)/n with C = Σ v·cos(2πf·t), S = Σ v·sin(2πf·t), t
    * relative to the channel start. Channel starts come from a
    * channel-cardinality pre-aggregate joined back broadcast; the main
    * pass is one map-side-combined aggregation — no window, no sort.
    * Amplitude (not raw power) keeps the output O(signal) so cross-engine
    * FP noise stays far below the rounding grain.
    */
  def tsBandpower(t: Tables,
                  freqs: Seq[(String, Double)] = Seq("day" -> 1.0 / 86400, "hour" -> 1.0 / 3600)): DataFrame = {
    val starts = t.events.groupBy(col("event_type")).agg(min(tsUs).as("start_us"))
    val base = t.events
      .select(col("event_type"), col("value"), tsUs.as("us"))
      .join(broadcast(starts), Seq("event_type"))
      .withColumn("tsec", (col("us") - col("start_us")).cast("double") / 1e6)
    val aggs = freqs.flatMap { case (name, f) =>
      val omega = lit(2.0 * math.Pi * f)
      Seq(
        sum(col("value") * cos(omega * col("tsec"))).as(s"c_$name"),
        sum(col("value") * sin(omega * col("tsec"))).as(s"s_$name"))
    } :+ count(lit(1)).as("n")
    val amps = freqs.map { case (name, _) =>
      roundHalfUp(lit(2.0) * sqrt(col(s"c_$name") * col(s"c_$name") + col(s"s_$name") * col(s"s_$name"))
        / col("n"), 4).as(s"amp_$name")
    }
    base.groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .select((col("event_type") +: col("n") +: amps): _*)
  }

  /** A18b: k-bin harmonic spectrum — [[tsBandpower]] generalized to a
    * ladder of `nBins` harmonics of one base period (f_k = k/periodS):
    * all 2k trig sums run in the SAME single map-side-combined
    * aggregation pass (adding a bin adds two sum buffers, not a scan),
    * then unpivot to long (channel, bin, amp) — the featurization shape.
    * ω is built as `(2·π)·(k/periodS)` in BOTH engines so the doubles
    * are bit-identical and the 4-dp rounding can't straddle a boundary.
    */
  def tsSpectrum(t: Tables, periodS: Double = 86400.0, nBins: Int = 6): DataFrame = {
    val starts = t.events.groupBy(col("event_type")).agg(min(tsUs).as("start_us"))
    val base = t.events
      .select(col("event_type"), col("value"), tsUs.as("us"))
      .join(broadcast(starts), Seq("event_type"))
      .withColumn("tsec", (col("us") - col("start_us")).cast("double") / 1e6)
    val aggs = (1 to nBins).flatMap { k =>
      val omega = lit(2.0 * math.Pi * (k / periodS))
      Seq(
        sum(col("value") * cos(omega * col("tsec"))).as(s"c_$k"),
        sum(col("value") * sin(omega * col("tsec"))).as(s"s_$k"))
    } :+ count(lit(1)).as("n")
    val amps = (1 to nBins).map { k =>
      roundHalfUp(lit(2.0) * sqrt(col(s"c_$k") * col(s"c_$k") + col(s"s_$k") * col(s"s_$k"))
        / col("n"), 4).as(s"amp_$k")
    }
    val stackArgs = (1 to nBins).map(k => s"${k}L, amp_$k").mkString(", ")
    base.groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .select((col("event_type") +: col("n") +: amps): _*)
      .select(col("event_type"), col("n"),
        expr(s"stack($nBins, $stackArgs) AS (bin, amp)"))
      .select(col("event_type"), col("bin"), col("n"), col("amp"))
  }

  /** A19: statistical outlier detection — |z-score| ≥ z against per-channel
    * mean/stddev (the global-stats complement of the threshold spike
    * detector A8). Stats aggregate to channel cardinality and join back
    * broadcast; the scoring pass is narrow.
    */
  def tsOutlier(t: Tables, z: Double = 3.0): DataFrame = {
    val stats = t.events.groupBy(col("event_type"))
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sigma"))
    t.events
      .select(col("event_type"), col("event_id"), col("value"), tsUs.as("us"))
      .join(broadcast(stats), Seq("event_type"))
      // select on the ROUNDED z — mu/sigma summation order is
      // engine-dependent, so an unrounded >= threshold could flip
      // boundary rows between engines; the displayed value and the
      // selection predicate must agree
      .withColumn("zscore", roundHalfUp((col("value") - col("mu")) / col("sigma"), 3))
      .filter(abs(col("zscore")) >= z)
      .select(col("event_type"), col("event_id"), col("us").as("ts_us"), col("value"),
        col("zscore"))
  }

  /** A20: per-channel value histogram with fixed-width buckets (clamped to
    * [0, nBuckets-1]) — the distribution profile behind calibration QC.
    * Integer bucket arithmetic on identical expressions is bit-exact in
    * any engine; one map-side-combined aggregation.
    */
  def tsHistogram(t: Tables, lo: Double = 0.0, width: Double = 20.0, nBuckets: Int = 20): DataFrame =
    t.events
      .select(col("event_type"), col("value"))
      .withColumn("bucket",
        least(lit(nBuckets - 1L), greatest(lit(0L), floor((col("value") - lo) / width).cast("long"))))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        roundHalfUp(min(col("value")), 2).as("min_value"), roundHalfUp(max(col("value")), 2).as("max_value"))

  /** A24: seasonal profile + strongest seasonal anomaly — per channel and
    * hour-of-day phase: the phase mean ("what does 3am normally look
    * like") and the largest absolute deviation of any single hourly
    * bucket from its phase mean ("the 3am that wasn't"). The diurnal
    * baseline every monitoring pipeline fits before alerting; A19/A21
    * flag pointwise outliers, this flags the hour that breaks its
    * phase.
    *
    * Determinism discipline: values ride as INTEGER CENTS (the corpus
    * grid; B30's trick), so every sum is an exact long under any
    * aggregation order — double sums of corpus-sized groups drift in
    * the last ulps and flip the 4 dp round (observed at sf0.01 before
    * this). The phase mean is ONE fixed-order expression over exact
    * longs ((ps/pc)/100), never an average of bucket averages, and the
    * deviation subtracts two such deterministic doubles — bit-identical
    * cross-engine before the shared 4 dp round.
    *
    * Scale shape: one corpus pass → (channel, bucket) partial sums,
    * map-side combinable; phase stats collapse to channel×24; the
    * deviation join is a broadcast of that tiny relation. Nothing is
    * ever corpus-sized after the first aggregation.
    */
  def tsSeasonal(t: Tables, bucketUs: Long = 3600L * 1000000): DataFrame = {
    val buckets = t.events
      .select(col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"), tsUs.as("us"))
      .withColumn("bucket_us", expr(s"(us div ${bucketUs}L) * ${bucketUs}L"))
      .groupBy(col("event_type"), col("bucket_us"))
      .agg(sum(col("cents")).as("s"), count(lit(1)).as("c"))
      // hour-of-day derives from the BUCKET START, not the bucket index:
      // (bucket_us div bucketUs) % 24 is only an hour when bucketUs is
      // exactly one hour — any other width silently turns "hod" into a
      // bucket-index phase that no longer matches the documented
      // hour-of-day semantics (r13 advice)
      .withColumn("hod", expr(s"(bucket_us div ${HourUs}L) % 24"))
    val phase = buckets.groupBy(col("event_type"), col("hod"))
      .agg(sum(col("s")).as("ps"), sum(col("c")).as("pc"),
        count(lit(1)).as("n_buckets"))
      .withColumn("phase_mean", (col("ps").cast("double") / col("pc")) / lit(100.0))
    buckets.join(broadcast(phase), Seq("event_type", "hod"))
      .withColumn("dev",
        abs((col("s").cast("double") / col("c")) / lit(100.0) - col("phase_mean")))
      .groupBy(col("event_type"), col("hod"))
      .agg(max(col("n_buckets")).as("n_buckets"), max(col("pc")).as("n_events"),
        roundHalfUp(max(col("phase_mean")), 4).as("phase_mean"),
        roundHalfUp(max(col("dev")), 4).as("max_dev"))
      .orderBy(col("event_type"), col("hod"))
  }

  /** A25: OHLC bar downsampling — the market-data shape of resampling:
    * per channel and bucket, the opening value (first by (ts, event_id)),
    * high, low, close (last), and the event count. A7's value-resample
    * keeps means; this keeps the four order-statistics a charting or
    * feature pipeline wants, with the (ts, event_id) tie rule making
    * first/last exact rather than "whichever task won".
    *
    * One map-side-combinable aggregation: open/close ride Spark's
    * lexicographic struct min/max ((us, event_id, value) — unique key
    * prefix, so the value never participates in the comparison), high/
    * low are plain min/max. The oracle mirrors first/last with
    * min_by/max_by over a zero-padded fixed-width string key — same
    * total order, different engine mechanics.
    */
  def tsOhlc(t: Tables, bucketUs: Long = 3600L * 1000000): DataFrame =
    t.events
      .select(col("event_type"), col("event_id"), col("value"), tsUs.as("us"))
      .withColumn("bucket_us", expr(s"(us div ${bucketUs}L) * ${bucketUs}L"))
      .groupBy(col("event_type"), col("bucket_us"))
      .agg(
        min(struct(col("us"), col("event_id"), col("value"))).getField("value").as("open"),
        roundHalfUp(max(col("value")), 2).as("high"),
        roundHalfUp(min(col("value")), 2).as("low"),
        max(struct(col("us"), col("event_id"), col("value"))).getField("value").as("close"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("bucket_us"),
        roundHalfUp(col("open"), 2).as("open"), col("high"), col("low"),
        roundHalfUp(col("close"), 2).as("close"), col("n"))

  /** A26: spectrogram — the k-bin harmonic spectrum of [[tsSpectrum]]
    * computed PER TIME WINDOW (STFT shape): per channel and fixed-width
    * window, amplitude of harmonics f_k = k/windowS with phase measured
    * from the WINDOW START. The time-resolved featurization an EEG
    * pipeline runs where [[tsSpectrum]] gives one global answer —
    * band-power-over-time is the canonical spectrogram view.
    *
    * Spark-first shape: the window start is pure integer bucket
    * arithmetic ((us div windowUs)·windowUs), so unlike [[tsSpectrum]]
    * there is NO channel-start pre-aggregate and NO join at all — all
    * 2k trig sums of every (channel, window) cell ride ONE map-side-
    * combinable aggregation over a single narrow scan, then unpivot to
    * long (channel, window, bin, amp). Adding a bin adds two sum
    * buffers; adding a window adds a group, never a pass. ω is built as
    * (2·π)·(k/windowS) in both engines so the doubles are bit-identical
    * under the 4-dp round.
    */
  def tsSpectrogram(t: Tables, windowUs: Long = 21600L * 1000000, nBins: Int = 4): DataFrame = {
    val winS = windowUs / 1e6
    val base = t.events
      .select(col("event_type"), col("value"), tsUs.as("us"))
      .withColumn("win_us", expr(s"(us div ${windowUs}L) * ${windowUs}L"))
      .withColumn("tsec", (col("us") - col("win_us")).cast("double") / 1e6)
    val aggs = (1 to nBins).flatMap { k =>
      val omega = lit(2.0 * math.Pi * (k / winS))
      Seq(
        sum(col("value") * cos(omega * col("tsec"))).as(s"c_$k"),
        sum(col("value") * sin(omega * col("tsec"))).as(s"s_$k"))
    } :+ count(lit(1)).as("n")
    val amps = (1 to nBins).map { k =>
      roundHalfUp(lit(2.0) * sqrt(col(s"c_$k") * col(s"c_$k") + col(s"s_$k") * col(s"s_$k"))
        / col("n"), 4).as(s"amp_$k")
    }
    val stackArgs = (1 to nBins).map(k => s"${k}L, amp_$k").mkString(", ")
    base.groupBy(col("event_type"), col("win_us"))
      .agg(aggs.head, aggs.tail: _*)
      .select((col("event_type") +: col("win_us") +: col("n") +: amps): _*)
      .select(col("event_type"), col("win_us"), col("n"),
        expr(s"stack($nBins, $stackArgs) AS (bin, amp)"))
      .select(col("event_type"), col("win_us"), col("bin"), col("n"), col("amp"))
  }

  /** A30: Welch PSD (Welch 1967) — the averaged-periodogram spectral
    * estimate: per-segment demeaned, Hann-tapered windows at 50 %
    * overlap, each COMPLETE window's periodogram
    * P_k = (C_k² + S_k²)/Σw² at harmonics f_k = k/windowS, averaged per
    * channel. THE standard consistent PSD estimator — a single
    * periodogram ([[tsSpectrum]]) has variance that never shrinks with
    * record length; Welch trades resolution for variance, the taper
    * kills boxcar leakage, the demeaning keeps DC out of bin 1 (a
    * Hann-tapered constant otherwise leaks there — the taper's
    * transform is nonzero at ±1 bin), and edge windows are discarded
    * exactly as the classic method discards the record tail.
    *
    * Spark-first shape: 50 % overlap means each sample belongs to
    * EXACTLY two windows (offset 0 and W/2) — a 2-row explode, not a
    * per-window pass; window starts are integer bucket arithmetic per
    * offset. All 4k+3 taper/trig sums of every (channel, window) cell
    * ride ONE map-side-combinable aggregation (demeaning folds in
    * afterwards via the Σw·cos cross terms — never a second corpus
    * pass); the completeness filter joins the channel-cardinality span
    * relation BROADCAST against the tiny window relation; the final
    * average is an aggregation over channels × windows rows. ω and the
    * Hann weight are built from the same literal expressions in both
    * engines.
    */
  def tsWelch(t: Tables, windowUs: Long = 21600L * 1000000, nBins: Int = 4): DataFrame = {
    val stackArgs = (1 to nBins).map { k =>
      val c = s"(cv_$k - (sv / n) * c0_$k)"
      val s = s"(sv_$k - (sv / n) * s0_$k)"
      s"${k}L, ($c * $c + $s * $s) / w2"
    }.mkString(", ")
    welchWindows(t, windowUs, nBins)
      .select(col("event_type"), expr(s"stack($nBins, $stackArgs) AS (bin, p)"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n_windows"), roundHalfUp(sum(col("p")) / count(lit(1)), 4).as("psd"))
  }

  /** Shared Welch window engine for [[tsWelch]]/[[tsCoherence]]: the
    * COMPLETE (channel, window) cells with their raw taper/trig sums
    * (cv_k/c0_k/sv_k/s0_k per bin, w2, sv, n — demeaning cross terms
    * included so callers fold the segment mean in without a second
    * corpus pass).
    */
  private def welchWindows(t: Tables, windowUs: Long, nBins: Int): DataFrame = {
    require(windowUs % 2 == 0, "windowUs must be even (50% overlap offset = windowUs/2)")
    val winS = windowUs / 1e6
    val half = windowUs / 2
    val base = t.events
      .select(col("event_type"), col("value"), tsUs.as("us"))
      .select(col("event_type"), col("value"), col("us"),
        // offset grid built from (us + half) so the dividend stays
        // non-negative for any us ≥ −half: Spark's trunc-div and the
        // oracle's floor-div agree, and the stream-start straddling
        // window (win_us = −half) comes out correctly in both engines
        explode(array(
          expr(s"(us div ${windowUs}L) * ${windowUs}L"),
          expr(s"((us + ${half}L) div ${windowUs}L) * ${windowUs}L - ${half}L"))).as("win_us"))
      .withColumn("tsec", (col("us") - col("win_us")).cast("double") / 1e6)
      .withColumn("w", lit(0.5) - lit(0.5) * cos(lit(2.0 * math.Pi) * col("tsec") / winS))
    // per-segment DEMEANING (scipy's detrend='constant') without a second
    // corpus pass: Σw(v−m)cos = Σwv·cos − m·Σw·cos, so the taper-mean
    // cross terms ride the SAME aggregation and the mean folds in after.
    // Without it a Hann-tapered constant leaks its DC into bin 1 (the
    // taper's transform is nonzero at ±1 bin) — caught by the spec.
    val aggs = (1 to nBins).flatMap { k =>
      val omega = lit(2.0 * math.Pi * (k / winS))
      Seq(
        sum(col("w") * col("value") * cos(omega * col("tsec"))).as(s"cv_$k"),
        sum(col("w") * cos(omega * col("tsec"))).as(s"c0_$k"),
        sum(col("w") * col("value") * sin(omega * col("tsec"))).as(s"sv_$k"),
        sum(col("w") * sin(omega * col("tsec"))).as(s"s0_$k"))
    } ++ Seq(sum(col("w") * col("w")).as("w2"),
      sum(col("value")).as("sv"), count(lit(1)).as("n"))
    val perWin = base.groupBy(col("event_type"), col("win_us"))
      .agg(aggs.head, aggs.tail: _*)
    // Welch discards the record tail: only windows fully inside the
    // channel's observed span count (edge windows are half-empty boxcars
    // whose artifacts swamp every bin). The span relation is
    // channel-cardinality and joins broadcast against the WINDOW
    // relation (channels × windows), never the corpus.
    val spans = t.events
      .select(col("event_type"), tsUs.as("us"))
      .groupBy(col("event_type"))
      .agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
    perWin.join(broadcast(spans), Seq("event_type"))
      .filter(col("win_us") >= col("mn") && col("win_us") + windowUs <= col("mx") + 1)
  }

  /** A32: magnitude-squared coherence (the Welch cross-spectral form) —
    * per channel pair and harmonic bin, |Σ_w X_w·conj(Y_w)|² /
    * (Σ_w|X_w|² · Σ_w|Y_w|²) over the windows BOTH channels completed:
    * the frequency-resolved coupling measure EEG connectivity analysis
    * is built on (A16's correlation collapses the spectrum to one
    * number; coherence asks "coupled IN WHICH BAND", and is invariant
    * to a constant phase lag — a delayed copy still scores 1).
    *
    * Built on [[welchWindows]]'s demeaned per-window spectra: the
    * cross-spectrum self-join runs on the channels × windows relation —
    * tiny, and never the corpus; one (pair, bin) aggregation after it.
    * Determinism: the complex products are fixed-order double algebra
    * over identically-built window sums; the 4-dp round absorbs
    * window-order summation drift; single-window pairs score a
    * degenerate 1 and filter OUT (coherence needs averaging to mean
    * anything — n_windows ≥ 2 enforced identically in both engines).
    */
  def tsCoherence(t: Tables, windowUs: Long = 21600L * 1000000, nBins: Int = 4): DataFrame = {
    val ww = welchWindows(t, windowUs, nBins)
    val stackArgs = (1 to nBins).map { k =>
      s"${k}L, cv_$k - (sv / n) * c0_$k, sv_$k - (sv / n) * s0_$k"
    }.mkString(", ")
    val spectra = ww.select(col("event_type"), col("win_us"),
      expr(s"stack($nBins, $stackArgs) AS (bin, c, s)"))
    val a = spectra.select(col("win_us"), col("bin"), col("event_type").as("type_a"),
      col("c").as("ca"), col("s").as("sa"))
    val b = spectra.select(col("win_us").as("wb"), col("bin").as("binb"),
      col("event_type").as("type_b"), col("c").as("cb"), col("s").as("sb"))
    a.join(b, col("win_us") === col("wb") && col("bin") === col("binb") &&
        col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"), col("bin"))
      .agg(count(lit(1)).as("n_windows"),
        sum(col("ca") * col("cb") + col("sa") * col("sb")).as("xre"),
        sum(col("sa") * col("cb") - col("ca") * col("sb")).as("xim"),
        sum(col("ca") * col("ca") + col("sa") * col("sa")).as("pxx"),
        sum(col("cb") * col("cb") + col("sb") * col("sb")).as("pyy"))
      .filter(col("n_windows") >= 2 && col("pxx") > 0.0 && col("pyy") > 0.0)
      .select(col("type_a"), col("type_b"), col("bin"), col("n_windows"),
        roundHalfUp((col("xre") * col("xre") + col("xim") * col("xim")) /
          (col("pxx") * col("pyy")), 4).as("coherence"))
  }

  /** A27: Hjorth parameters (Hjorth 1970) — activity (variance),
    * mobility (√(var(Δx)/var(x))) and complexity (√(var(Δ²x)/var(Δx))
    * / mobility) per channel: the three time-domain EEG descriptors
    * every clinical/sleep pipeline computes next to band power, and the
    * signal-shape audit (mobility ≈ dominant frequency, complexity ≈
    * bandwidth) that needs no FFT.
    *
    * Determinism discipline: values ride as integer cents and every
    * variance derives from EXACT sums — Σc as a long-safe decimal, Σc²
    * in decimal(38,0) (cents² would overflow int64 at ~10⁹ rows ×
    * 4-digit values; decimal addition is exact and order-independent at
    * any scale) — then var = (Q − S²/n)/n is ONE fixed-order double
    * expression over exact inputs, bit-identical cross-engine. A
    * float-sum variance over a corpus-sized group is not reproducible
    * even run-to-run; this is, under any partitioning.
    *
    * Scale shape: one channel-keyed exchange serves the two chained lag
    * windows AND the final aggregation (same partitioning — Catalyst
    * adds no second exchange); the result is channel-cardinality.
    */
  def tsHjorth(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("us"), col("event_id"))
    val cents = floor(col("value") * 100.0 + 0.5).cast("long")
    def exactSums(x: Column, p: String): Seq[Column] = Seq(
      count(x).as(s"n_$p"),
      sum(x.cast("decimal(38,0)")).as(s"s_$p"),
      sum(x.cast("decimal(19,0)") * x.cast("decimal(19,0)")).as(s"q_$p"))
    // population variance from exact sums — fixed-order double arithmetic
    def varOf(p: String): Column =
      (col(s"q_$p").cast("double") -
        col(s"s_$p").cast("double") * col(s"s_$p").cast("double") / col(s"n_$p")) / col(s"n_$p")
    t.events
      .select(col("event_type"), col("event_id"), tsUs.as("us"), cents.as("c"))
      .withColumn("d1", col("c") - lag(col("c"), 1).over(w))
      .withColumn("d2", col("d1") - lag(col("d1"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(exactSums(col("c"), "0").head,
        (exactSums(col("c"), "0").tail ++ exactSums(col("d1"), "1") ++ exactSums(col("d2"), "2")): _*)
      .select(col("event_type"), col("n_0").as("n"),
        roundHalfUp(varOf("0") / 10000.0, 4).as("activity"),
        roundHalfUp(sqrt(varOf("1") / varOf("0")), 4).as("mobility"),
        roundHalfUp(sqrt(varOf("2") / varOf("1")) / sqrt(varOf("1") / varOf("0")), 4).as("complexity"))
  }

  /** A28: epoch featurization — per channel and fixed-width epoch, the
    * time-domain feature row sleep-staging / seizure-detection pipelines
    * extract before any model: sample count, mean, RMS, line length
    * (Σ|Δx| — THE classic seizure-onset feature) and turning-point count
    * (slope sign changes — local-extrema density, the nonparametric
    * complexity signal next to [[tsHjorth]]'s variance ratios).
    *
    * Everything distributed is EXACT INTEGER arithmetic on cents: sums
    * and Σc² as decimals (order-independent), |Δc| an exact long, a
    * turning point the integer test d·d_prev < 0 — no float compare can
    * flip a row between engines; doubles appear only in the final
    * per-epoch division/√, fixed-order under the 4-dp round.
    *
    * Scale shape: ONE channel-keyed exchange serves the epoch-scoped lag
    * windows and the (channel, epoch) aggregation (hash(event_type)
    * satisfies the (event_type, epoch) clustering requirement — local
    * sort, no second exchange); output is epoch-cardinality.
    */
  def tsEpochFeatures(t: Tables, epochUs: Long = 3600L * 1000000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"), col("epoch_us"))
      .orderBy(col("us"), col("event_id"))
    val cents = floor(col("value") * 100.0 + 0.5).cast("long")
    t.events
      .select(col("event_type"), col("event_id"), tsUs.as("us"), cents.as("c"))
      .withColumn("epoch_us", expr(s"(us div ${epochUs}L) * ${epochUs}L"))
      .withColumn("d", col("c") - lag(col("c"), 1).over(w))
      .withColumn("turn", (col("d") * lag(col("d"), 1).over(w)) < 0L)
      .groupBy(col("event_type"), col("epoch_us"))
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast("decimal(38,0)")).as("s"),
        sum(col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)")).as("q"),
        coalesce(sum(abs(col("d"))), lit(0L)).as("ll"),
        coalesce(sum(when(col("turn"), 1L).otherwise(0L)), lit(0L)).as("n_turns"))
      .select(col("event_type"), col("epoch_us"), col("n"),
        roundHalfUp(col("s").cast("double") / col("n") / 100.0, 4).as("mean"),
        roundHalfUp(sqrt(col("q").cast("double") / col("n")) / 100.0, 4).as("rms"),
        roundHalfUp(col("ll").cast("double") / 100.0, 4).as("line_length"),
        col("n_turns"))
  }

  /** A34: epoch artifact rejection — the EEG preprocessing gate run
    * BEFORE any feature extraction (A26-A28): an epoch is rejected when
    * any sample exceeds the amplitude ceiling OR any within-epoch step
    * exceeds the gradient ceiling (electrode pops, movement, clipping).
    * Emits the per-epoch QC row (counts + verdict) a pipeline joins
    * against its feature relation to drop contaminated epochs.
    *
    * All tests are EXACT integer comparisons on cents (amplitude) and
    * Δcents (gradient) — thresholds scale to the cent grid, so no float
    * compare can flip a verdict between engines. Same single-exchange
    * shape as A28: the epoch-scoped lag and the (channel, epoch)
    * aggregation share one channel-keyed clustering.
    */
  def tsArtifacts(t: Tables, epochUs: Long = 3600L * 1000000,
                  ampMax: Double = 150.0, gradMax: Double = 100.0): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("epoch_us"))
      .orderBy(col("us"), col("event_id"))
    val ampC = math.floor(ampMax * 100.0 + 0.5).toLong
    val gradC = math.floor(gradMax * 100.0 + 0.5).toLong
    t.events
      .select(col("event_type"), col("event_id"), tsUs.as("us"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("c"))
      .withColumn("epoch_us", expr(s"(us div ${epochUs}L) * ${epochUs}L"))
      .withColumn("d", col("c") - lag(col("c"), 1).over(w))
      .groupBy(col("event_type"), col("epoch_us"))
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("c")) > ampC, 1L).otherwise(0L)).as("n_amp"),
        coalesce(sum(when(abs(col("d")) > gradC, 1L).otherwise(0L)), lit(0L)).as("n_grad"))
      .withColumn("rejected", col("n_amp") > 0 || col("n_grad") > 0)
  }

  /** A21: robust outlier detection via MAD (median absolute deviation) —
    * the resistant complement of the z-score detector A19: median and MAD
    * are unaffected by the very outliers being hunted, so a few extreme
    * samples can't inflate sigma and mask each other.
    *
    * robust z = 0.6745·(v − median)/MAD (Iglewicz–Hoaglin); flag
    * |z| ≥ cutoff (3.5 is their recommended default). Medians are EXACT,
    * via the bucketed histogram-select pipeline (Analytics.exactQuantiles
    * — two narrow passes, never a per-group sort), and both median
    * relations are channel-cardinality literals folded back into the row
    * expressions; the scoring pass is a single narrow scan. Selection
    * happens on the ROUNDED score so boundary rows can't flip between
    * engines.
    */
  def madOutlier(t: Tables, cutoff: Double = 3.5): DataFrame =
    madOutlierEvents(t.events, cutoff)

  /** Literal-fold scoring ships the per-channel medians inside every
    * task's serialized plan — above this many channels they ride a
    * broadcast join instead (once per executor, and no multi-MB task
    * binaries). TimeSeriesSpec asserts path parity and runs the join
    * path at 10k channels.
    */
  private[graft] val maxLiteralChannels: Int = 16384

  private[graft] def madOutlierEvents(events: DataFrame, cutoff: Double,
      maxLitKeys: Int = maxLiteralChannels): DataFrame = {
    // medians are CHANNEL-CARDINALITY — computed eagerly and folded back
    // as ONE literal map Column each (a non-primitive Literal codegens
    // as a single reference object — plan size O(1) in channel count),
    // so neither quantile pipeline nor the scoring pass carries a join:
    // the MAD pipeline is a 2-column narrow scan and the final scoring
    // pass is a single zero-shuffle codegen scan. Above `maxLitKeys`
    // channels the medians ride broadcast joins instead — same rows
    // (missing/<=0 MAD keys null out and filter away in the literal
    // path; the inner joins drop them identically).
    val med: Array[(String, Double)] = Analytics.exactQuantiles(
      events.select(col("event_type"), col("value")), "event_type",
      Seq("value" -> Seq("med" -> 0.5)))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    if (med.length <= maxLitKeys) {
      val medOf = element_at(typedLit(med.toMap), col("event_type"))
      val mad: Array[(String, Double)] = Analytics.exactQuantiles(
        events.select(col("event_type"), abs(col("value") - medOf).as("adev")),
        "event_type", Seq("adev" -> Seq("mad" -> 0.5)))
        .collect().map(r => r.getString(0) -> r.getDouble(1))
      val madOf = element_at(typedLit(mad.filter(_._2 > 0).toMap), col("event_type"))
      events
        .select(col("event_type"), col("event_id"), col("value"), tsUs.as("us"))
        .withColumn("robust_z", roundHalfUp(lit(0.6745) * (col("value") - medOf) / madOf, 3))
        .filter(abs(col("robust_z")) >= cutoff)
        .select(col("event_type"), col("event_id"), col("us").as("ts_us"), col("value"),
          col("robust_z"))
    } else {
      val spark = events.sparkSession
      import spark.implicits._
      val medDf = med.toSeq.toDF("event_type", "_med")
      val mad: Array[(String, Double)] = Analytics.exactQuantiles(
        events.join(broadcast(medDf), Seq("event_type"))
          .select(col("event_type"), abs(col("value") - col("_med")).as("adev")),
        "event_type", Seq("adev" -> Seq("mad" -> 0.5)))
        .collect().map(r => r.getString(0) -> r.getDouble(1))
      val madDf = mad.filter(_._2 > 0).toSeq.toDF("event_type", "_mad")
      events
        .select(col("event_type"), col("event_id"), col("value"), tsUs.as("us"))
        .join(broadcast(medDf), Seq("event_type"))
        .join(broadcast(madDf), Seq("event_type"))
        .withColumn("robust_z",
          roundHalfUp(lit(0.6745) * (col("value") - col("_med")) / col("_mad"), 3))
        .filter(abs(col("robust_z")) >= cutoff)
        .select(col("event_type"), col("event_id"), col("us").as("ts_us"), col("value"),
          col("robust_z"))
    }
  }

  /** A22: trailing time-window aggregation — for every sample, the count
    * and mean of all samples in the preceding `horizonUs` µs of the same
    * channel (a RANGE window frame: the frame is defined by the TIME
    * axis, not a row count, so irregular sampling is handled correctly).
    *
    * Determinism: a sliding-frame float sum is engine-dependent (Spark
    * folds left-to-right; other engines use segment trees — different
    * association, different last-ulp, and .5-boundary rounding flips).
    * So the frame aggregates integer CENTS (`floor(value·100 + 0.5)` is
    * bit-exact per row, and integer sums are order-independent); the
    * single final division is then bit-identical everywhere. One shuffle
    * by channel.
    */
  def tsWeighted(t: Tables, horizonUs: Long = 600L * 1000000,
                 keys: Seq[String] = Seq("event_type")): DataFrame =
    tsWeighted(t.events, horizonUs, keys)

  /** Caller-key variant — `events` needs `ts` (int64 ns), `event_id`,
    * `value`, and the `keys` columns.
    */
  def tsWeighted(events: DataFrame, horizonUs: Long, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("us"))
      .rangeBetween(-horizonUs, 0)
    events
      .select(kc ++ Seq(col("event_id"), col("value"), tsUs.as("us")): _*)
      .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
      .withColumn("n_trailing", count(lit(1)).over(w))
      .withColumn("avg_trailing",
        roundHalfUp(sum(col("cents")).over(w) / (col("n_trailing") * 100.0), 4))
      .select(kc ++ Seq(col("event_id"), col("us").as("ts_us"),
        col("n_trailing"), col("avg_trailing")): _*)
  }

  /** A23: LTTB downsampling (largest-triangle-three-buckets) — the
    * standard visualization decimator: keep, per bucket, the point that
    * forms the largest triangle with its neighbor buckets, preserving
    * visual extremes that plain bucket averaging (A7) flattens.
    *
    * This is the PARALLEL variant: triangle anchors are the neighbor
    * buckets' MEANS (classic LTTB anchors on the previously SELECTED
    * point, a sequential dependency that cannot distribute); first and
    * last buckets keep their first/last points. Buckets are equal-count
    * via row_number, so selection is rank-deterministic.
    *
    * Determinism: bucket means are computed from integer sums (µs
    * rebased to the channel start so ~2^40-scale sums stay far inside
    * double-exact range even with millions of samples per bucket, and
    * value in cents) — order-independent, so the area comparison sees
    * bit-identical doubles in every engine. Ties: max area, then
    * earliest sample. Shape: one shuffle by channel for ranking, one
    * channel×nBuckets-sized mean relation broadcast back, narrow scoring.
    */
  def lttb(t: Tables, nBuckets: Int = 20,
           keys: Seq[String] = Seq("event_type")): DataFrame =
    lttb(t.events, nBuckets, keys)

  /** Caller-key variant — `events` needs `ts` (int64 ns), `event_id`,
    * `value`, and the `keys` columns. The anchor relation stays
    * broadcast-sized as long as #keys × nBuckets fits the broadcast
    * threshold; past that, drop the hint and it becomes a co-partitioned
    * join on (keys, bucket).
    */
  def lttb(events: DataFrame, nBuckets: Int, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("us"), col("event_id"))
    val base = events
      .select(kc ++ Seq(col("event_id"), col("value"), tsUs.as("us")): _*)
      .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
      .withColumn("rn", row_number().over(w).cast("long") - 1L)
      .withColumn("n", count(lit(1)).over(Window.partitionBy(kc: _*)))
      .withColumn("us0", min(col("us")).over(Window.partitionBy(kc: _*)))
      .withColumn("bucket", expr(s"(rn * ${nBuckets}L) div n"))
      .withColumn("x", (col("us") - col("us0")).cast("double"))
      .withColumn("y", col("cents") / 100.0)
    val means = base.groupBy(kc :+ col("bucket"): _*)
      .agg(sum(col("us") - col("us0")).as("sx"), sum(col("cents")).as("sy"),
        count(lit(1)).as("bn"))
      .select(kc ++ Seq(col("bucket"),
        (col("sx") / col("bn")).as("mx"), (col("sy") / (col("bn") * 100.0)).as("my")): _*)
    val wb = Window.partitionBy(kc: _*).orderBy(col("bucket"))
    val anchors = means
      .withColumn("px", lag(col("mx"), 1).over(wb)).withColumn("py", lag(col("my"), 1).over(wb))
      .withColumn("nx", lead(col("mx"), 1).over(wb)).withColumn("ny", lead(col("my"), 1).over(wb))
      .select(kc ++ Seq(col("bucket"), col("px"), col("py"), col("nx"), col("ny")): _*)
    val area = abs((col("px") - col("nx")) * (col("y") - col("py")) -
      (col("px") - col("x")) * (col("py") - col("ny")))
    val pick = Window.partitionBy(kc :+ col("bucket"): _*).orderBy(
      // interior buckets: max triangle area; first/last buckets: the
      // boundary point itself (area is null there — order by rank)
      when(col("px").isNull, col("rn")).otherwise(-lit(1)).asc,
      when(col("nx").isNull, -col("rn")).otherwise(-lit(1)).asc,
      area.desc, col("us").asc, col("event_id").asc)
    base.join(broadcast(anchors), keys :+ "bucket")
      .withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .select(kc ++ Seq(col("bucket"), col("us").as("ts_us"), col("value")): _*)
  }

  /** A29: common-average re-referencing (CAR) — the standard EEG montage
    * transform: every channel's signal is re-expressed relative to the
    * average of ALL channels at the same instant, cancelling the shared
    * reference-electrode drift that otherwise dominates every channel.
    * The reference's physical-value pipeline stops at per-channel
    * calibration (edf.py:14-18); CAR is the first cross-channel montage
    * step every clinical reading pipeline applies after it.
    *
    * Instants are the `bucketUs` resample grid (channels need a common
    * time base before any cross-channel arithmetic — A7's grid), and the
    * common reference is the bucket's GRAND mean (Σ all cents / Σ all
    * samples). On an equal-rate grid (A4/A7 output — every channel
    * contributes the same count per bucket) this IS the textbook
    * equal-channel-weight CAR; on ragged input it is the sample-weighted
    * form. The grand mean is the form whose arithmetic stays EXACT:
    * an equal-weight mean of per-channel means would sum k doubles in
    * engine-dependent order, while Σcents/Σn and s_c/n_c are exact longs
    * and the re-reference is ONE fixed-order double expression —
    * bit-identical cross-engine under the 4-dp round.
    *
    * Scale shape: the corpus collapses map-side to (channel, bucket)
    * partial sums; the cross-channel totals are a window over the
    * already-collapsed relation partitioned by bucket (one small
    * exchange, never corpus-sized) — NO join anywhere. At 100 TB the
    * bucket key would be (file, bucket) and the window's partition
    * count scales with recording hours, not samples.
    */
  def tsCar(t: Tables, bucketUs: Long = 3600L * 1000000): DataFrame = {
    val wb = Window.partitionBy(col("bucket_us"))
    t.events
      .select(col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"), tsUs.as("us"))
      .withColumn("bucket_us", expr(s"(us div ${bucketUs}L) * ${bucketUs}L"))
      .groupBy(col("event_type"), col("bucket_us"))
      .agg(sum(col("cents")).as("s"), count(lit(1)).as("c"))
      .withColumn("s_all", sum(col("s")).over(wb))
      .withColumn("c_all", sum(col("c")).over(wb))
      .withColumn("n_channels", count(lit(1)).over(wb))
      .select(col("event_type"), col("bucket_us"), col("c").as("n"), col("n_channels"),
        roundHalfUp((col("s").cast("double") / col("c")) / 100.0, 4).as("v_mean"),
        roundHalfUp((col("s").cast("double") / col("c")) / 100.0 -
          (col("s_all").cast("double") / col("c_all")) / 100.0, 4).as("v_car"))
  }

  /** The regression time origin for [[tsDetrend]] — 2024-01-01T00:00Z.
    * Rebasing to a FIXED epoch (not the channel min) keeps the plan
    * join-free, and expressing t in integer SECONDS keeps Σt² inside
    * decimal(38,0) headroom at any corpus size (µs² would overflow at
    * ~10¹² rows; s² leaves 11 orders of magnitude to spare).
    */
  private val DetrendEpochUs: Long = 1704067200000000L

  /** A31: per-channel linear detrend — the least-squares line v ≈ a + b·t
    * fitted to each channel, reported as the channel mean, the slope per
    * day, and the residual RMS (how much signal is left once the trend
    * is removed). The de-drifting step every long-recording pipeline
    * runs before spectral or amplitude analysis (a slow electrode drift
    * otherwise leaks into every band), and the QC number ("is this
    * channel drifting?") next to A6's rate stats.
    *
    * Determinism discipline: t rides as integer seconds from a fixed
    * epoch and v as integer cents, so ALL five regression sums (Σt, Σt²,
    * Σv, Σv², Σtv) are exact decimals under any aggregation order; the
    * slope/intercept/SSE then derive from the centered-moment identities
    * (Sxx, Sxy, Syy; SSE = Syy − Sxy²/Sxx) as ONE fixed-order double
    * expression each — bit-identical cross-engine. A float-sum
    * regression over a corpus-sized group is not even run-stable.
    *
    * Scale shape: ONE map-side-combinable aggregation over a narrow
    * scan; output is channel-cardinality. No window, no join, no second
    * pass. A zero-variance time axis (single instant) yields NULL slope
    * and rms rather than a cross-engine NaN coin flip.
    */
  def tsDetrend(t: Tables): DataFrame = {
    val sxx = col("stt").cast("double") -
      col("st").cast("double") * col("st").cast("double") / col("n")
    val sxy = col("stc").cast("double") -
      col("st").cast("double") * col("sc").cast("double") / col("n")
    val syy = col("scc").cast("double") -
      col("sc").cast("double") * col("sc").cast("double") / col("n")
    t.events
      .select(col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("c"),
        // divide BEFORE subtracting the epoch: µs-since-1970 is always
        // positive, where Spark's trunc-div and the oracle's floor-div
        // agree; a pre-1704067200 row would otherwise floor/trunc apart
        expr(s"(ts div 1000) div 1000000 - ${DetrendEpochUs / 1000000}L").as("t"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("t").cast("decimal(38,0)")).as("st"),
        sum(col("t").cast("decimal(19,0)") * col("t").cast("decimal(19,0)")).as("stt"),
        sum(col("c").cast("decimal(38,0)")).as("sc"),
        sum(col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)")).as("scc"),
        sum(col("t").cast("decimal(19,0)") * col("c").cast("decimal(19,0)")).as("stc"))
      .select(col("event_type"), col("n"),
        roundHalfUp(col("sc").cast("double") / col("n") / 100.0, 4).as("mean"),
        when(sxx === 0.0, lit(null).cast("double"))
          .otherwise(roundHalfUp(sxy / sxx * 86400.0 / 100.0, 4)).as("slope_per_day"),
        when(sxx === 0.0, lit(null).cast("double"))
          .otherwise(roundHalfUp(sqrt((syy - sxy * sxy / sxx) / col("n")) / 100.0, 4))
          .as("resid_rms"))
  }

  /** Windowed-sinc bandpass taps for [[tsFir]] (Hamming window, odd
    * length, symmetric): h[m] = (2·hi·sinc(2·hi·m) − 2·lo·sinc(2·lo·m))
    * · (0.54 + 0.46·cos(2π·m/(n−1))), m ∈ [−M, M]. lo/hi are in
    * cycles/sample of the resample grid. Computed ONCE driver-side and
    * embedded as the SAME double literals in the Spark plan and the
    * oracle SQL — the filter design needs no cross-engine math at all.
    */
  private[graft] def firTaps(lo: Double, hi: Double, n: Int): Seq[Double] = {
    require(n % 2 == 1 && n > 1, "tap count must be odd")
    require(0.0 <= lo && lo < hi && hi < 0.5, "0 <= lo < hi < 0.5 cycles/sample (lo = 0 -> lowpass)")
    val m0 = n / 2
    def sinc(x: Double): Double = if (x == 0.0) 1.0 else math.sin(math.Pi * x) / (math.Pi * x)
    (-m0 to m0).map { m =>
      val ideal = 2.0 * hi * sinc(2.0 * hi * m) - 2.0 * lo * sinc(2.0 * lo * m)
      val window = 0.54 + 0.46 * math.cos(2.0 * math.Pi * m / (n - 1))
      ideal * window
    }
  }

  /** A33: FIR bandpass filtering — the actual filtering primitive under
    * every band-limited EEG view (A18 measures band power; this RETURNS
    * the band-limited signal): a windowed-sinc bandpass convolved over
    * each channel's resample-grid sequence (A7's grid gives the uniform
    * sampling FIR assumes; gaps in the grid are skipped — A17 is the
    * gap-filler when continuity matters). Emits only rows with full tap
    * support (the first n−1 grid points per channel warm the delay
    * line), exactly like scipy 'valid' mode.
    *
    * Determinism: grid values are (Σcents/n)/100 — exact-long-derived
    * doubles; taps are driver-computed literals shared VERBATIM with the
    * oracle; the convolution is one left-associated multiply-add chain —
    * bit-identical cross-engine, no rounding needed until the output.
    *
    * Scale shape: the corpus collapses map-side to the (channel, bucket)
    * grid FIRST; the n−1 lag windows and their ordering ride ONE
    * channel-keyed exchange of that collapsed relation. At 100 TB the
    * FIR runs on recording-hours-sized data, never samples.
    */
  def tsFir(t: Tables, bucketUs: Long = 3600L * 1000000,
            lo: Double = 0.1, hi: Double = 0.3, nTaps: Int = 21): DataFrame = {
    val taps = firTaps(lo, hi, nTaps)
    val grid = t.events
      .select(col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"), tsUs.as("us"))
      .withColumn("bucket_us", expr(s"(us div ${bucketUs}L) * ${bucketUs}L"))
      .groupBy(col("event_type"), col("bucket_us"))
      .agg(sum(col("cents")).as("s"), count(lit(1)).as("c"))
      .select(col("event_type"), col("bucket_us"),
        ((col("s").cast("double") / col("c")) / 100.0).as("v"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket_us"))
    // taps are time-reversed onto the lag chain: y[k] = Σ_j h[j]·x[k−j]
    val conv = taps.zipWithIndex.map { case (h, j) =>
      if (j == 0) lit(h) * col("v") else lit(h) * lag(col("v"), j).over(w)
    }.reduce(_ + _)
    grid
      .withColumn("oldest", lag(col("v"), nTaps - 1).over(w))
      .withColumn("y", conv)
      .filter(col("oldest").isNotNull)
      .select(col("event_type"), col("bucket_us"),
        roundHalfUp(col("v"), 4).as("v"), roundHalfUp(col("y"), 4).as("filtered"))
  }

  /** A35: band-limited burst detection — the sleep-spindle/seizure-burst
    * composition every clinical pipeline runs: bandpass ([[tsFir]]) →
    * rectified moving-average envelope → threshold with a minimum
    * duration. Emits one row per detected burst (channel, start, end,
    * length, peak envelope). A8 flags threshold CROSSINGS of the raw
    * signal; this finds sustained oscillatory EVENTS in a band.
    *
    * Determinism: the band signal is [[tsFir]]'s 4-dp-rounded output
    * (bit-identical cross-engine), the envelope is a fixed ±`envHalf`
    * row frame rounded before the threshold compare (boundary rows
    * can't flip, A19's discipline), and burst assembly is pure integer
    * gap-chunking (A5's run trick) with an exact length gate.
    *
    * Scale shape: everything downstream of the grid collapse runs on
    * the (channel, bucket) relation under ONE channel-keyed exchange —
    * the FIR lag chain, the envelope frame, and the run-id windows all
    * share the same clustering.
    */
  def tsBursts(t: Tables, bucketUs: Long = 3600L * 1000000,
               lo: Double = 0.1, hi: Double = 0.3, nTaps: Int = 21,
               envHalf: Int = 2, theta: Double = 2.0, minBuckets: Long = 3L): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket_us"))
    val q = tsFir(t, bucketUs, lo, hi, nTaps)
      .withColumn("env", roundHalfUp(avg(abs(col("filtered"))).over(
        w.rowsBetween(-envHalf, envHalf)), 4))
      .filter(col("env") >= theta)
    q.withColumn("prev", lag(col("bucket_us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("bucket_us") - col("prev") > bucketUs, 1L).otherwise(0L))
      .withColumn("burst_id", sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("event_type"), col("burst_id"))
      .agg(min(col("bucket_us")).as("start_us"),
        (max(col("bucket_us")) + bucketUs).as("end_us"),
        count(lit(1)).as("n_buckets"), max(col("env")).as("peak_env"))
      .filter(col("n_buckets") >= minBuckets)
      .select(col("event_type"), col("start_us"), col("end_us"),
        col("n_buckets"), col("peak_env"))
  }

  /** A37: anti-aliased decimation — keep every `n`-th grid point AFTER a
    * windowed-sinc lowpass at the new Nyquist (hi = 1/(2n)): the correct
    * downsampling primitive where a naive stride ALIASES (any content
    * above 1/(2n) cycles/sample folds back into the kept band and
    * corrupts it — the spec plants exactly that tone and measures the
    * difference). A7's bucket-mean resample is the amplitude-preserving
    * aggregate; this is the DSP-correct rate reduction for downstream
    * spectral work.
    *
    * Composition: [[tsFir]] with lo = 0 (lowpass taps — same shared
    * literal-tap determinism), then a row_number stride on the filtered
    * grid sequence — pure integer selection, same single channel-keyed
    * exchange. The phase is anchored to each channel's first
    * full-support grid point (rank 1 kept), deterministic under the
    * (bucket_us) order.
    */
  def tsDecimate(t: Tables, bucketUs: Long = 3600L * 1000000,
                 n: Int = 4, nTaps: Int = 21): DataFrame = {
    require(n >= 2, s"decimation factor must be >= 2, got $n")
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket_us"))
    tsFir(t, bucketUs, lo = 0.0, hi = 1.0 / (2 * n), nTaps = nTaps)
      .withColumn("rn", row_number().over(w))
      .filter((col("rn") - 1) % n === 0)
      .select(col("event_type"), col("bucket_us"), col("filtered").as("value"))
  }

  /** A12: fixed-size chunking — the reference's 30 M-sample chunker
    * (base.py:357-372) as row_number bucketing per channel.
    */
  def tsChunker(t: Tables, chunkSize: Long = 500L,
                keys: Seq[String] = Seq("event_type")): DataFrame =
    tsChunker(t.events, chunkSize, keys)

  /** Caller-key variant — `events` needs `ts` (int64 ns), `event_id`,
    * and the `keys` columns.
    */
  def tsChunker(events: DataFrame, chunkSize: Long, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("us"), col("event_id"))
    events
      .select(kc ++ Seq(col("event_id"), tsUs.as("us")): _*)
      .withColumn("rn", row_number().over(w).cast("long") - 1L)
      .withColumn("chunk_id", expr(s"rn div ${chunkSize}L"))
      .groupBy(kc :+ col("chunk_id"): _*)
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"), count(lit(1)).as("n_samples"))
  }
}
