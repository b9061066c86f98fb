package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream product analytics (SURVEY.md §2 B15-B16) — the classic
  * per-user behavioral queries a training-telemetry pipeline runs over the
  * same event stream the time-series operators process: ordered funnels
  * and cohort retention.
  *
  * Scale shape: both operators reduce the event stream to user-cardinality
  * relations FIRST (per-user minima / distinct activity days) and join
  * only those — at 100 TB the joins shuffle per-user rows, never raw
  * events, and every aggregation is map-side combinable.
  */
object EventAnalytics {

  /** µs since epoch from the int64-ns ts column (integer division — no FP). */
  private def tsUs: Column = expr("ts div 1000")

  /** B15: ordered funnel — users who did stage 1, then stage 2 AFTER
    * their first stage-1 event, then stage 3 after that, unbounded
    * horizon. Emits one row per stage with the surviving user count.
    *
    * Each stage is `min(ts)` over the stage's events joined to the
    * previous stage's per-user completion time — the join inputs are the
    * type-filtered event subsets (filter pushed to the scan) and the
    * user-cardinality completion relation, so no stage ever re-shuffles
    * the full stream.
    */
  def funnel(t: Tables, stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = t.events.select(col("user_id"), col("event_type"), tsUs.as("us"))
    completionChain(ev, stages).zip(stages).zipWithIndex.map { case ((df, name), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("long").as("stage"),
          lit(name).as("stage_name"), col("n_users"))
    }.reduce(_.unionAll(_))
  }

  /** B15's earliest-completion chain: element i = (user_id, t) for users
    * who reached stage i in order, t = their earliest in-order completion
    * time. Each stage joins the type-filtered event subset (filter pushed
    * to the scan) against the user-cardinality previous-stage relation —
    * the full stream is never re-shuffled. Shared by funnel / funnelLatency.
    */
  private def completionChain(ev: DataFrame, stages: Seq[String]): Seq[DataFrame] = {
    val first = ev.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("us")).as("t"))
    stages.tail.scanLeft(first) { (prev, stage) =>
      ev.filter(col("event_type") === stage)
        .join(prev.withColumnRenamed("t", "t_prev"), Seq("user_id"))
        .filter(col("us") > col("t_prev"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t"))
    }
  }

  /** B27: funnel conversion latency — for each adjacent stage pair of the
    * B15 earliest-completion chain, the time-to-convert distribution over
    * converting users: count, mean, and exact interpolated p50/p90 of
    * `t_to − t_from` in µs. The question product analytics asks right
    * after "how many converted" is "how long did it take" — and tail
    * percentiles, not means, are what reveal a stuck cohort.
    *
    * Scale shape: the chain relations are user-cardinality, so every join
    * here shuffles per-user rows, never raw events. The mean is summed in
    * INT64 (exact, order-independent — a float sum over a billion users
    * is not reproducible run-to-run) and divided once at the end. The
    * percentiles reuse [[Analytics.exactQuantiles]]'s two-pass bucketed
    * rank selection, so pooled-per-transition quantiles never materialize
    * a per-group value map (Spark's `percentile`) or cap parallelism at
    * the transition count (a per-group sort window).
    */
  def funnelLatency(t: Tables, stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.size >= 2, "funnelLatency needs at least two stages")
    val ev = t.events.select(col("user_id"), col("event_type"), tsUs.as("us"))
    val lat = completionChain(ev, stages).zip(stages).zipWithIndex.sliding(2).map {
      case Seq(((a, na), i), ((b, nb), _)) =>
        a.select(col("user_id"), col("t").as("t_from"))
          .join(b.select(col("user_id"), col("t").as("t_to")), Seq("user_id"))
          .select(lit(i + 1).cast("long").as("stage"),
            lit(s"$na>$nb").as("transition"),
            (col("t_to") - col("t_from")).as("lat_us"))
    }.reduce(_.unionAll(_))
      // persist: the transition-latency relation feeds the mean rollup
      // AND both scans of the quantile kernel (three reads of the full
      // per-stage join chain otherwise). User-cardinality × 3 narrow
      // columns, LRU-evictable.
      .persist()
    val stats = lat.groupBy(col("stage"), col("transition"))
      .agg(count(lit(1)).as("n_users"), sum(col("lat_us")).as("sum_lat"))
      .select(col("stage"), col("transition"), col("n_users"),
        graft.functions.roundHalfUp(
          col("sum_lat").cast("double") / col("n_users").cast("double"), 4).as("mean_us"))
    val quants = Analytics.exactQuantiles(
      lat.select(col("transition"), col("lat_us").cast("double").as("lat_us")),
      "transition", Seq("lat_us" -> Seq("p50_us" -> 0.5, "p90_us" -> 0.9)))
    stats.join(quants, Seq("transition"))
      .select(col("stage"), col("transition"), col("n_users"),
        col("mean_us"), col("p50_us"), col("p90_us"))
      .orderBy(col("stage"))
  }

  /** B22: time-constrained funnel (the windowFunnel analytic): users who
    * completed stage 1, then each later stage in order, ALL within
    * `windowUs` of their FIRST stage-1 event. The chain is the
    * earliest-completion chain anchored at min(stage-1 ts) — fully
    * deterministic, and expressible identically in SQL (the oracle's
    * CTEs mirror each scanLeft step), unlike "best chain over any
    * anchor" semantics which need per-user backtracking.
    *
    * Same scale shape as B15: each stage joins the type-filtered event
    * subset (filter pushed to scan) against the user-cardinality
    * previous-stage relation — the full stream is never re-shuffled,
    * and no per-user event collection exists anywhere, so a power user
    * with millions of events costs map-side partial min, not memory.
    */
  def windowFunnel(t: Tables, stages: Seq[String] = Seq("view", "click", "purchase"),
                   windowUs: Long = 6L * 3600L * 1000000L): DataFrame = {
    require(stages.nonEmpty, "windowFunnel needs at least one stage")
    val ev = t.events.select(col("user_id"), col("event_type"), tsUs.as("us"))
    val first = ev.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("us")).as("t"))
      .withColumn("t0", col("t"))
    val completed = stages.tail.scanLeft(first) { (prev, stage) =>
      ev.filter(col("event_type") === stage)
        .join(prev.select(col("user_id"), col("t").as("t_prev"), col("t0")), Seq("user_id"))
        .filter(col("us") > col("t_prev") && col("us") <= col("t0") + windowUs)
        .groupBy(col("user_id"))
        .agg(min(col("us")).as("t"), min(col("t0")).as("t0"))
    }
    completed.zip(stages).zipWithIndex.map { case ((df, name), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("long").as("stage"),
          lit(name).as("stage_name"), col("n_users"))
    }.reduce(_.unionAll(_))
  }

  /** B16: cohort retention — cohort = a user's first active day; one row
    * per (cohort day, day offset) with the count of users active again
    * that day. Day arithmetic is integer µs (86400000000 per day), exact
    * in every engine.
    *
    * Two aggregations: distinct (user, day) activity, then the
    * user-cardinality first-day relation joins back — the count never
    * needs countDistinct because (user, day) is already unique.
    */
  def retention(t: Tables): DataFrame = {
    val dayUs = 86400000000L
    val days = t.events
      .select(col("user_id"), (tsUs / dayUs).cast("long").as("day"))
      .distinct()
    val cohort = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** B17: per-user sessionization — split each user's event stream at
    * idle gaps > `gapUs` µs; one output row per session with its span,
    * event count and distinct-type count. The behavioral twin of the
    * channel sessionizer A5, keyed by user instead of channel.
    *
    * One shuffle by user_id: the gap-flag window, the running-sum window
    * and the final aggregation all share that partitioning, so Catalyst
    * plans a single Exchange for the whole pipeline.
    */
  def userSessions(t: Tables, gapUs: Long = 1800L * 1000000): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    t.events
      .select(col("user_id"), col("event_id"), col("event_type"), tsUs.as("us"))
      .withColumn("brk",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs || lag(col("us"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(w))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"), countDistinct(col("event_type")).as("n_types"))
  }

  /** B18: changelog compaction (CDC latest-wins upsert) — reduce an
    * append-only event log to the newest row per (user, type) key, with
    * the version count per key.
    *
    * The latest row is `max(struct(us, event_id, value))` — struct
    * comparison is lexicographic, (us, event_id) is unique per row, so
    * value never participates in ordering; the aggregate is map-side
    * combinable, so compaction costs ONE shuffle of key-cardinality
    * partial states instead of the full-log window sort the row_number
    * formulation would plan. At 100 TB that is the difference between
    * shuffling keys and shuffling the entire changelog.
    */
  def latestState(t: Tables): DataFrame =
    t.events
      .select(col("user_id"), col("event_type"), tsUs.as("us"), col("event_id"), col("value"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(struct(col("us"), col("event_id"), col("value"))).as("r"),
        count(lit(1)).as("n_versions"))
      .select(col("user_id"), col("event_type"), col("r.us").as("ts_us"),
        col("r.event_id").as("event_id"), col("r.value").as("value"), col("n_versions"))

  /** B32: SCD2 dimension build — turn the (user, event_type) changelog
    * into type-2 slowly-changing-dimension rows: consecutive SAME-value
    * events collapse (a heartbeat is not a change), each surviving change
    * opens a validity interval [valid_from, valid_to) closed by the next
    * change, the open interval is the current row, versions number the
    * change history. [[latestState]] answers "what is the state now";
    * this materializes "what was the state at ANY time" — the standard
    * warehouse dimension the as-of join (A9) then probes.
    *
    * Scale shape: ONE (user, event_type)-keyed exchange serves all three
    * window passes (change-detect lag, interval lead, version
    * row_number share the same partitioning and order; the filter
    * between them preserves clustering, so Catalyst plans no second
    * exchange) — the B17 sessionization price, nothing more. No join,
    * no corpus-sized aggregation. Change detection compares raw doubles
    * for exact equality — both engines read identical parquet bits, so
    * the collapse can never diverge.
    */
  def scd2Build(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    t.events
      .select(col("user_id"), col("event_type"), col("event_id"), tsUs.as("us"), col("value"))
      .withColumn("pv", lag(col("value"), 1).over(w))
      .filter(col("pv").isNull || col("pv") =!= col("value"))
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col("user_id"), col("event_type"), col("value"),
        col("us").as("valid_from_us"), col("valid_to_us"), col("version"),
        col("valid_to_us").isNull.as("is_current"))
  }

  /** B38: rolling active users — per day, the distinct users active that
    * day (DAU) and in the trailing `windowDays` window (WAU): the
    * engagement ratio every product dashboard leads with, and the
    * within-SQL-reach rolling-distinct that usually gets mis-built as
    * COUNT(DISTINCT) OVER RANGE (which most engines refuse or compute
    * quadratically).
    *
    * Scale shape: the stream collapses FIRST to distinct (user, day) —
    * map-side combinable, user-days ≪ events; the rolling window is a
    * bounded explode of that collapsed relation (each user-day feeds its
    * `windowDays` target days) followed by a distinct + count — corpus
    * cost is user-days × window, never events × window, and every
    * aggregation combines map-side. Pure integer day arithmetic.
    */
  def rollingActives(t: Tables, windowDays: Int = 7): DataFrame = {
    val dayUs = 86400L * 1000000
    val userDays = t.events
      .select(col("user_id"), expr(s"((ts div 1000) div ${dayUs}L) * ${dayUs}L").as("day_us"))
      .distinct()
    val dau = userDays.groupBy(col("day_us")).agg(count(lit(1)).as("dau"))
    val wau = userDays
      .select(col("user_id"), explode(sequence(lit(0), lit(windowDays - 1))).as("k"),
        col("day_us"))
      .select(col("user_id"), (col("day_us") + col("k") * dayUs).as("day_us"))
      .distinct()
      .groupBy(col("day_us")).agg(count(lit(1)).as(s"active_${windowDays}d"))
    // only OBSERVED days report (a user-day projects activity onto
    // future days the stream may not reach; inner join drops them)
    dau.join(wau, Seq("day_us"))
  }

  /** B37: clamped running balance — per user, the event-ordered balance
    * b_i = max(0, b_{i−1} + Δ_i): credits add, debits subtract, and the
    * floor at zero makes the recurrence NON-ASSOCIATIVE — the
    * inventory/prepaid-credit semantics (stock can't go negative; the
    * shortfall is lost, not borrowed) that NO window function can
    * express: max(0,·) between every step breaks the prefix-sum algebra
    * a running-total window relies on, so this is the documented
    * last-resort pattern done right — secondary sort + one sequential
    * in-partition scan.
    *
    * Scale shape: ONE hash exchange on the key and an in-partition sort
    * ((user, us, event_id) — the same price every sessionization pays);
    * the scan carries O(1) state per key and streams the iterator (never
    * materializes a group). Parallelism = key cardinality, exactly like
    * B17. All arithmetic is exact integer cents; the clamp is an integer
    * compare — bit-reproducible under any partitioning.
    *
    * The oracle cannot mirror the plan (SQL has no ordered fold) — it
    * unrolls the recurrence as a RECURSIVE CTE stepping row-rank joins,
    * an INDEPENDENT algorithm held to the same fixpoint.
    */
  def runningBalance(t: Tables,
                     creditTypes: Seq[String] = Seq("purchase", "signup"),
                     debitTypes: Seq[String] = Seq("click", "error")): DataFrame = {
    require(creditTypes.intersect(debitTypes).isEmpty, "credit/debit types must be disjoint")
    val spark = t.events.sparkSession
    import spark.implicits._
    t.events.filter(col("event_type").isin(creditTypes ++ debitTypes: _*))
      .select(col("user_id"), col("event_id"), tsUs.as("us"),
        (when(col("event_type").isin(creditTypes: _*), lit(1L)).otherwise(lit(-1L)) *
          floor(col("value") * 100.0 + 0.5).cast("long")).as("delta"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("us"), col("event_id"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        var started = false; var cur = 0L; var bal = 0L
        it.map { case (u, eid, us, d) =>
          if (!started || u != cur) { started = true; cur = u; bal = 0L }
          val raw = bal + d
          val clamped = raw < 0L
          bal = if (clamped) 0L else raw
          (u, eid, us, d, bal, clamped)
        }
      }
      .toDF("user_id", "event_id", "ts_us", "delta_cents", "balance_cents", "clamped")
  }

  /** B36: point-in-time-correct feature join — every fact event joined to
    * the dimension state that was CURRENT at the fact's own timestamp
    * (here: each purchase sees the buyer's click-stream state as of the
    * purchase instant). THE feature-store correctness primitive: training
    * a model on "state now" instead of "state then" is label leakage, and
    * this join is how a training-set builder avoids it. Composes [[scd2Build]]
    * (the versioned dimension) with an interval-containment probe;
    * A9's as-of join answers the same question stream-to-stream, this is
    * the fact-to-dimension form.
    *
    * Scale shape: a plain HASH equi-join on the entity key with the
    * interval predicate as the join residual — SCD2 intervals partition
    * time per key, so each fact matches EXACTLY one dimension row (or
    * none before the first state): multiplicity 1 by construction, never
    * an explosion. Facts before any state survive the left join with
    * NULL state. All interval arithmetic is integer µs.
    */
  def pitJoin(t: Tables, stateType: String = "click",
              factType: String = "purchase"): DataFrame = {
    val dim = scd2Build(t).filter(col("event_type") === stateType)
      .select(col("user_id").as("d_user"), col("value").as("state_value"),
        col("valid_from_us"), col("valid_to_us"), col("version").as("state_version"))
    val facts = t.events.filter(col("event_type") === factType)
      .select(col("event_id"), col("user_id"), tsUs.as("ts_us"), col("value"))
    facts.join(dim, col("user_id") === col("d_user") &&
        col("valid_from_us") <= col("ts_us") &&
        (col("valid_to_us").isNull || col("ts_us") < col("valid_to_us")), "left")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
        col("state_value"), col("state_version"),
        (col("ts_us") - col("valid_from_us")).as("state_age_us"))
  }

  /** B35: conversion attribution — credit every conversion event to the
    * touch events that preceded it, under the two standard marketing
    * models at once: LAST touch (the touch nearest before the
    * conversion) and FIRST touch (the earliest touch inside the
    * lookback). One row per (model, touch_type) with the conversion
    * count and exact revenue; conversions with no in-window touch credit
    * `(none)`. The revenue-assignment question every
    * campaign-effectiveness audit starts with, downstream of B15's
    * funnel ("did they convert") — this asks "who gets the credit".
    *
    * Determinism discipline: a touch is encoded as a FIXED-WIDTH string
    * key (zero-padded µs + event_id + type — the A25 total-order trick),
    * so last/first touch are plain min/max over a RANGE frame
    * [us − lookback, us] on the integer µs axis — no engine-specific
    * first_value/ignore-nulls semantics, ties at the same instant
    * resolved by event_id in both engines identically. Revenue rides as
    * exact cents.
    *
    * Scale shape: ONE user-keyed exchange serves both window passes
    * (same partitioning, two frames); the credited relation collapses
    * map-side to (model, touch_type) cardinality. At 100 TB the only
    * stream-sized cost is the per-user sort — the standard
    * sessionization price, shared with B17/B24.
    */
  def attribution(t: Tables,
                  touchTypes: Seq[String] = Seq("view", "click", "signup"),
                  conversion: String = "purchase",
                  lookbackUs: Long = 86400L * 1000000): DataFrame = {
    require(!touchTypes.contains(conversion), "conversion cannot be its own touch")
    val win = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-lookbackUs, 0)
    val credited = t.events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), tsUs.as("us"))
      .withColumn("tkey", when(col("event_type").isin(touchTypes: _*),
        format_string("%020d%020d|%s", col("us"), col("event_id"), col("event_type"))))
      .withColumn("last_key", max(col("tkey")).over(win))
      .withColumn("first_key", min(col("tkey")).over(win))
      .filter(col("event_type") === conversion)
      .select(floor(col("value") * 100.0 + 0.5).cast("long").as("cents"),
        coalesce(expr("substring(last_key, 42)"), lit("(none)")).as("last_type"),
        coalesce(expr("substring(first_key, 42)"), lit("(none)")).as("first_type"))
    // unpivot BEFORE aggregating: one window pass feeds both models
    // (a per-model groupBy would re-run the stream-sized window twice)
    credited
      .select(col("cents"), explode(array(
        struct(lit("last").as("model"), col("last_type").as("touch_type")),
        struct(lit("first").as("model"), col("first_type").as("touch_type")))).as("mt"))
      .groupBy(col("mt.model").as("model"), col("mt.touch_type").as("touch_type"))
      .agg(count(lit(1)).as("n_conv"),
        graft.functions.roundHalfUp(sum(col("cents")).cast("double") / 100.0, 2).as("revenue"))
  }

  /** B24: event-sequence transition mining — the first-order Markov
    * profile of the event stream: every consecutive (from → to) pair of
    * event types in a user's timeline, counted globally and by distinct
    * users, top-k by frequency. The behavioral twin of n-gram mining
    * (C56) over event sequences: the profile that sizes session-model
    * features, flags never-seen transitions as anomalies, and tells
    * funnel design which stage orders actually occur.
    *
    * One shuffle by user_id for the lead window (per-user time order IS
    * the semantics — no shuffle-free formulation exists), sharing B17's
    * partitioning shape; then the aggregation collapses to type²
    * cardinality with map-side partial counts before its exchange, and
    * the top-k is a bounded TakeOrdered, never a global sort. At 100 TB
    * the only stream-sized cost is the per-user sort inside user-hash
    * partitions — Spark's standard sessionization price.
    */
  def eventTransitions(t: Tables, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    t.events
      .select(col("user_id"), col("event_type"), tsUs.as("us"), col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n").desc, col("from_type"), col("to_type"))
      .limit(k)
  }

  /** B26: session path mining — the top-k event-type journeys: sessions
    * under B17's exact gap rule, each truncated to its first `maxLen`
    * events and serialized as "a>b>c", counted by sessions and distinct
    * users. The product-analytics complement of B24: transitions give
    * the edge weights, paths give the whole walks users actually take.
    *
    * Scale shape: ONE user-keyed exchange serves the whole pipeline —
    * the gap window, the running-sum window, the per-session row_number
    * AND the session aggregation all require only user-hash clustering
    * (HashPartitioning(user) satisfies the (user, session) clustered
    * distributions), so Catalyst plans local sorts, never a second
    * shuffle, until the path counts collapse to path cardinality. The
    * truncation filter runs BEFORE the collect, so per-session state is
    * ≤ maxLen rows even for a million-event pathological session.
    */
  def sessionPaths(t: Tables, gapUs: Long = 1800L * 1000000,
      maxLen: Int = 5, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val w2 = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("us"), col("event_id"))
    t.events
      .select(col("user_id"), col("event_id"), col("event_type"), tsUs.as("us"))
      .withColumn("brk",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs || lag(col("us"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(w))
      .withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= maxLen)
      .groupBy(col("user_id"), col("session_id"))
      .agg(sort_array(collect_list(struct(col("rn"), col("event_type")))).as("evs"))
      .select(col("user_id"),
        concat_ws(">", transform(col("evs"), e => e.getField("event_type"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** B28: daily-volume anomaly flagging — the pipeline-health monitor run
    * over ingest telemetry: per event type, the (type, day) event counts
    * whose deviation from that type's median daily volume exceeds
    * `k` × MAD (median absolute deviation) — the robust outlier rule
    * (A21's per-channel logic, lifted to aggregated series) that a mean/
    * stddev z-score can't match when the anomaly itself pollutes the
    * baseline. Emits the flagged days with their n, median and MAD.
    *
    * Scale shape: ONE pass over raw events builds the (type, day) count
    * relation — map-side combinable, collapsing to type×day cardinality
    * (a decade × 1000 types ≈ 4M rows) — which is then locally
    * checkpointed so the two quantile passes and the final flag scan all
    * reuse that tiny materialized relation instead of re-scanning the
    * corpus (and its blocks are GC-released, never a pinned cache entry). Medians/MADs are exact
    * interpolated quantiles via [[Analytics.exactQuantiles]]'s bucketed
    * rank selection and join back as type-cardinality broadcasts. Every
    * value compared sits on an exact binary fraction grid (counts are
    * integers; interpolated medians land on quarters), so the strict
    * `dev > k·mad` boundary is engine-parity-safe with no rounding.
    */
  def anomalyDays(t: Tables, k: Double = 2.0): DataFrame = {
    // localCheckpoint, not persist: the (type, day) relation feeds three
    // consumers (both quantile passes + the flag scan), so the corpus is
    // scanned ONCE here — and unlike an explicit cache, the checkpoint's
    // blocks are released by the ContextCleaner when the result goes out
    // of scope, so repeated calls cannot accumulate pinned cache entries
    val daily = t.events
      .select(col("event_type"), expr("ts div 1000 div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"))
      .localCheckpoint()
    val med = Analytics.exactQuantiles(
      daily.select(col("event_type"), col("n_events").cast("double").as("n")),
      "event_type", Seq("n" -> Seq("med" -> 0.5)))
    val dev = daily.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("n_events").cast("double") - col("med")))
    val mad = Analytics.exactQuantiles(dev.select(col("event_type"), col("dev")),
      "event_type", Seq("dev" -> Seq("mad" -> 0.5)))
    dev.join(broadcast(mad), Seq("event_type"))
      .filter(col("dev") > lit(k) * col("mad"))
      .select(col("event_type"), col("day"), col("n_events"), col("med"), col("mad"))
      .orderBy(col("event_type"), col("day"))
  }

  /** B25: schema-on-read JSON property profiling — extract the typed
    * payload field from the freeform `props` JSON column and profile it
    * per event type: coverage (rows whose value parsed), distinct
    * values, min/max/mean. The gate a pipeline runs over semi-structured
    * telemetry before promoting a JSON field to a real column.
    *
    * `from_json` with an explicit one-field schema is the production
    * path (PERMISSIVE mode: malformed JSON or a missing key → null,
    * counted as uncovered, never an error), and parsing a 1-field
    * struct skips the rest of each payload. The profile itself is one
    * map-side-combinable aggregation at event-type cardinality — the
    * scan dominates at any scale, exactly as a profiling pass should.
    * The oracle extracts the same field with regex algebra (DuckDB has
    * no bundled JSON path in this harness) — identical values on
    * well-formed input; the spec pins malformed/missing-key behavior
    * the synthetic corpus can't exercise.
    */
  def propsProfile(t: Tables, field: String = "k"): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val schema = StructType(Seq(StructField(field, IntegerType)))
    t.events
      .select(col("event_type"),
        from_json(col("props"), schema).getField(field).as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), count(col("k")).as("n_with_k"),
        countDistinct(col("k")).as("n_distinct"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"),
        graft.functions.roundHalfUp(avg(col("k").cast("double")), 4).as("k_mean"))
  }
}
