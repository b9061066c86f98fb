package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventAnalytics

/** B15–B18: behavioral tests with constructed user timelines — ordered
  * funnels must require stage order (not mere co-occurrence), retention
  * must count distinct activity days against the first-day cohort,
  * sessionization must split exactly at the idle gap, and changelog
  * compaction must keep precisely the newest version per key.
  */
class EventAnalyticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  /** events rows: (event_id, ts_ns, user_id, event_type, value). */
  private def events(rows: Seq[(Long, Long, Long, String, Double)]): Tables = {
    import spark.implicits._
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("events").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables(spark, dir)
  }

  private val S = 1000000000L // ns per second

  test("funnel requires stage ORDER, not co-occurrence") {
    val rows = Seq(
      // user 1: view -> click -> purchase in order (counts at all 3)
      (0L, 10L * S, 1L, "view", 0.0), (1L, 20L * S, 1L, "click", 0.0),
      (2L, 30L * S, 1L, "purchase", 0.0),
      // user 2: click BEFORE first view — has all types but never converts
      (3L, 10L * S, 2L, "click", 0.0), (4L, 20L * S, 2L, "view", 0.0),
      (5L, 5L * S, 2L, "purchase", 0.0),
      // user 3: view then click, no purchase
      (6L, 10L * S, 3L, "view", 0.0), (7L, 15L * S, 3L, "click", 0.0))
    val got = EventAnalytics.funnel(events(rows)).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got == Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L), s"got $got")
  }

  test("retention counts distinct active days per cohort offset") {
    val day = 86400L * S
    val rows = Seq(
      // user 1: active day 0 (twice — must count once) and day 2
      (0L, 1L * S, 1L, "view", 0.0), (1L, 2L * S, 1L, "click", 0.0),
      (2L, 2 * day + S, 1L, "view", 0.0),
      // user 2: first active day 2, again day 3
      (3L, 2 * day + S, 2L, "view", 0.0), (4L, 3 * day + S, 2L, "view", 0.0))
    val got = EventAnalytics.retention(events(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 1L, (0L, 2L) -> 1L, (2L, 0L) -> 1L, (2L, 1L) -> 1L),
      s"got $got")
  }

  test("sessionization splits exactly past the idle gap") {
    val gapUs = 1800L * 1000000 // 30 min
    val rows = Seq(
      (0L, 0L, 1L, "view", 0.0),
      (1L, 1800L * S, 1L, "click", 0.0),       // exactly 30 min later: SAME session
      (2L, 3601L * S, 1L, "view", 0.0),        // 1801 s after prev: NEW session
      (3L, 0L, 2L, "view", 0.0))               // another user: own session
    val got = EventAnalytics.userSessions(events(rows), gapUs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got((1L, 1L)) == ((0L, 1800000000L, 2L, 2L)), s"session 1: ${got((1L, 1L))}")
    assert(got((1L, 2L)) == ((3601000000L, 3601000000L, 1L, 1L)), s"session 2: ${got((1L, 2L))}")
    assert(got((2L, 1L)) == ((0L, 0L, 1L, 1L)), s"user 2: ${got((2L, 1L))}")
    assert(got.size == 3)
  }

  test("changelog compaction keeps the newest version per key, ties by event_id") {
    val rows = Seq(
      (0L, 10L * S, 1L, "cart", 1.0),
      (1L, 30L * S, 1L, "cart", 3.0),   // newest for (1, cart)
      (2L, 20L * S, 1L, "cart", 2.0),
      (3L, 40L * S, 1L, "profile", 9.0),
      (4L, 30L * S, 2L, "cart", 7.0),
      (5L, 30L * S, 2L, "cart", 8.0))   // same ts: higher event_id wins
    val got = EventAnalytics.latestState(events(rows)).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5)))
      .toMap
    assert(got((1L, "cart")) == ((30000000L, 1L, 3.0, 3L)), s"latest wins: ${got((1L, "cart"))}")
    assert(got((1L, "profile")) == ((40000000L, 3L, 9.0, 1L)))
    assert(got((2L, "cart")) == ((30000000L, 5L, 8.0, 2L)), s"ts tie → max event_id: ${got((2L, "cart"))}")
  }

  test("windowFunnel bounds every stage by the window from the FIRST entry event") {
    val H = 3600L * S // ns per hour
    val rows = Seq(
      // user 1: all three inside 6h of the first view -> depth 3
      (0L, 0L * H, 1L, "view", 0.0), (1L, 1L * H, 1L, "click", 0.0),
      (2L, 2L * H, 1L, "purchase", 0.0),
      // user 2: click 7h after the view — outside the window -> depth 1
      (3L, 0L * H, 2L, "view", 0.0), (4L, 7L * H, 2L, "click", 0.0),
      // user 3: click in window, purchase outside -> depth 2
      (5L, 0L * H, 3L, "view", 0.0), (6L, 1L * H, 3L, "click", 0.0),
      (7L, 7L * H, 3L, "purchase", 0.0),
      // user 4: the window anchors at the FIRST view (t=0), not the later
      // one — click at 8h is outside even though it is 1h after view#2
      (8L, 0L * H, 4L, "view", 0.0), (9L, 7L * H, 4L, "view", 0.0),
      (10L, 8L * H, 4L, "click", 0.0),
      // user 5: order still required — purchase before click never counts
      (11L, 0L * H, 5L, "view", 0.0), (12L, 1L * H, 5L, "purchase", 0.0))
    val got = EventAnalytics.windowFunnel(events(rows), windowUs = 6L * 3600L * 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 5L, 2L -> 2L, 3L -> 1L),
      s"stage survivors (5 viewed, u1+u3 clicked in window, u1 purchased): $got")
  }

  test("eventTransitions counts consecutive pairs per user, never across users") {
    val rows = Seq(
      // user 1: view -> click -> view  (transitions: view→click, click→view)
      (0L, 10L * S, 1L, "view", 0.0), (1L, 20L * S, 1L, "click", 0.0),
      (2L, 30L * S, 1L, "view", 0.0),
      // user 2: view -> click (one transition; its LAST event emits none,
      // and no cross-user pair forms between user 1's tail and user 2's head)
      (3L, 40L * S, 2L, "view", 0.0), (4L, 50L * S, 2L, "click", 0.0),
      // user 3: a single event — no transitions at all
      (5L, 60L * S, 3L, "purchase", 0.0))
    val got = EventAnalytics.eventTransitions(events(rows)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      ("view", "click") -> ((2L, 2L)),   // both users, once each
      ("click", "view") -> ((1L, 1L))),  // user 1 only
      s"got $got")
  }

  test("eventTransitions orders same-timestamp events by event_id") {
    val rows = Seq(
      (0L, 10L * S, 1L, "a", 0.0),
      (2L, 10L * S, 1L, "c", 0.0),  // same ts as event 1: id order decides
      (1L, 10L * S, 1L, "b", 0.0))
    val got = EventAnalytics.eventTransitions(events(rows)).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("b", "c")), s"got $got")
  }

  test("sessionPaths: gap-split journeys, order within path, truncation at maxLen") {
    val rows = Seq(
      // user 1, session 1: view>click; after a >30min gap, session 2: view
      (0L, 10L * S, 1L, "view", 0.0), (1L, 20L * S, 1L, "click", 0.0),
      (2L, 4000L * S, 1L, "view", 0.0),
      // user 2: same first journey view>click (distinct user, one session)
      (3L, 10L * S, 2L, "view", 0.0), (4L, 20L * S, 2L, "click", 0.0),
      // user 3: four events truncate to the first three at maxLen=3
      (5L, 10L * S, 3L, "a", 0.0), (6L, 20L * S, 3L, "b", 0.0),
      (7L, 30L * S, 3L, "c", 0.0), (8L, 40L * S, 3L, "d", 0.0))
    val got = EventAnalytics.sessionPaths(events(rows), maxLen = 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "view>click" -> ((2L, 2L)),  // users 1 and 2, one session each
      "view" -> ((1L, 1L)),        // user 1's post-gap second session
      "a>b>c" -> ((1L, 1L))),      // user 3 truncated: d dropped
      s"got $got")
  }

  test("funnelLatency: per-transition converting-user count, mean, interpolated p50/p90") {
    val rows = Seq(
      // u1 full chain: view→click 10s, click→purchase 10s
      (0L, 10L * S, 1L, "view", 0.0), (1L, 20L * S, 1L, "click", 0.0),
      (2L, 30L * S, 1L, "purchase", 0.0),
      // u2: view→click 30s, never purchases
      (3L, 10L * S, 2L, "view", 0.0), (4L, 40L * S, 2L, "click", 0.0),
      // u3: click with no prior view — converts nowhere
      (5L, 10L * S, 3L, "click", 0.0))
    val got = EventAnalytics.funnelLatency(events(rows)).collect()
      .map(r => r.getString(1) ->
        ((r.getLong(0), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // view>click lats {1e7, 3e7} µs: mean 2e7, p50 = interp midpoint 2e7,
    // p90 = 1e7 + 0.9·2e7 = 2.8e7; click>purchase lat {1e7}: all stats 1e7
    assert(got == Map(
      "view>click" -> ((1L, 2L, 2.0e7, 2.0e7, 2.8e7)),
      "click>purchase" -> ((2L, 1L, 1.0e7, 1.0e7, 1.0e7))), s"got $got")
  }

  test("anomalyDays: k-MAD flag over daily counts, strict boundary, zero-MAD type") {
    val D = 86400L
    // type a: seven quiet days of 2 then a 10-spike (median 2, MAD 0 —
    // any deviation flags); type b: counts 1,2,3,4,9 (median 3, MAD 1) —
    // day 0's dev of exactly 2 = k·mad must NOT flag (strict >), day 4 must
    val spec = Seq("a" -> Seq(2, 2, 2, 2, 2, 2, 2, 10), "b" -> Seq(1, 2, 3, 4, 9))
    val evs = for {
      (ty, counts) <- spec
      (c, d) <- counts.zipWithIndex
      i <- 0 until c
    } yield (ty, d, i)
    val rows = evs.zipWithIndex.map { case ((ty, d, i), id) =>
      (id.toLong, (d * D + i) * S, 1L, ty, 0.0) }
    val tab = events(rows)
    val got = EventAnalytics.anomalyDays(tab).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(got == Set(("a", 7L, 10L, 2.0, 0.0), ("b", 4L, 9L, 3.0, 1.0)), s"got $got")
    // cache lifecycle: the daily-count relation is locally checkpointed
    // (GC-released blocks), never persist()'d — probe the CacheManager
    // for THIS operator's exact plan (a global isEmpty would race with
    // other suites sharing the session)
    val dailyEq = tab.events
      .select(col("event_type"), expr("ts div 1000 div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    assert(spark.sharedState.cacheManager.lookupCachedData(
        dailyEq.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]).isEmpty,
      "anomalyDays must not pin its daily-count relation in the cache")
  }

  /** events rows with an explicit props payload. */
  private def eventsP(rows: Seq[(Long, Long, Long, String, String)]): Tables = {
    import spark.implicits._
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "props")
      .withColumn("value", lit(0.0))
    val dir = java.nio.file.Files.createTempDirectory("eventsp").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables(spark, dir)
  }

  test("propsProfile: malformed JSON, missing key and null props are uncovered, not errors") {
    val rows = Seq(
      (0L, 10L * S, 1L, "click", """{"k": 10}"""),
      (1L, 20L * S, 1L, "click", """{"k": 30}"""),
      (2L, 30L * S, 1L, "click", """{"other": 5}"""), // key missing -> null
      (3L, 40L * S, 1L, "click", """{"k": broken"""), // malformed -> null
      (4L, 50L * S, 1L, "click", null),               // null props -> null
      (5L, 60L * S, 1L, "view", """{"k": 10}"""),
      (6L, 70L * S, 1L, "view", """{"k": 10}"""))     // duplicate value
    val got = EventAnalytics.propsProfile(eventsP(rows)).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5), r.getDouble(6))))
      .toMap
    assert(got("click") == ((5L, 2L, 2L, 10, 30, 20.0)), s"click: ${got("click")}")
    assert(got("view") == ((2L, 2L, 1L, 10, 10, 10.0)), s"view: ${got("view")}")
  }

  test("propsProfile rounds the mean half-up at 4 decimals") {
    val rows = Seq( // mean of 1 and 2 = 1.5; of 0,0,1 = 0.3333...
      (0L, 10L * S, 1L, "a", """{"k": 1}"""), (1L, 20L * S, 1L, "a", """{"k": 2}"""),
      (2L, 30L * S, 1L, "b", """{"k": 0}"""), (3L, 40L * S, 1L, "b", """{"k": 0}"""),
      (4L, 50L * S, 1L, "b", """{"k": 1}"""))
    val got = EventAnalytics.propsProfile(eventsP(rows)).collect()
      .map(r => r.getString(0) -> r.getDouble(6)).toMap
    assert(got == Map("a" -> 1.5, "b" -> 0.3333), s"got $got")
  }

  test("scd2Build: heartbeats collapse, intervals chain change-to-change, open row is current") {
    val S = 1000000000L
    val rows = Seq(
      // user 1, key "s": 5,5,7,7,5 — the repeated 5 and 7 are heartbeats,
      // not changes; intervals must chain 5@1s..3s, 7@3s..5s, 5@5s..open
      (1L, 1L * S, 1L, "s", 5.0), (2L, 2L * S, 1L, "s", 5.0),
      (3L, 3L * S, 1L, "s", 7.0), (4L, 4L * S, 1L, "s", 7.0),
      (5L, 5L * S, 1L, "s", 5.0),
      // same-ts tie: event_id orders the versions (6 then 7)
      (6L, 1L * S, 2L, "s", 1.0), (7L, 1L * S, 2L, "s", 2.0))
    val got = EventAnalytics.scd2Build(events(rows)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .sortBy(r => (r._1, r._6))
    assert(got.toSeq == Seq(
      (1L, "s", 5.0, 1000000L, 3000000L, 1L, false),
      (1L, "s", 7.0, 3000000L, 5000000L, 2L, false),
      (1L, "s", 5.0, 5000000L, -1L, 3L, true),
      (2L, "s", 1.0, 1000000L, 1000000L, 1L, false),
      (2L, "s", 2.0, 1000000L, -1L, 2L, true)), s"got ${got.toSeq}")
  }

  test("attribution: last/first touch inside lookback, same-instant ties by event_id, (none) otherwise") {
    val rows = Seq(
      // user 1: view -> click -> purchase(10.0): last=click, first=view
      (0L, 10L * S, 1L, "view", 0.0), (1L, 20L * S, 1L, "click", 0.0),
      (2L, 30L * S, 1L, "purchase", 10.0),
      // user 2: purchase with no touch at all
      (3L, 10L * S, 2L, "purchase", 5.0),
      // user 3: only touch is OUTSIDE the 1-day lookback
      (4L, 0L, 3L, "view", 0.0), (5L, 2L * 86400L * S, 3L, "purchase", 7.0),
      // user 4: click and view at the SAME instant: last=higher id (view),
      // first=lower id (click)
      (6L, 100L * S, 4L, "click", 0.0), (7L, 100L * S, 4L, "view", 0.0),
      (8L, 200L * S, 4L, "purchase", 1.0),
      // user 5: touch at the conversion instant itself is credited
      (9L, 50L * S, 5L, "view", 0.0), (10L, 50L * S, 5L, "purchase", 2.0))
    val got = EventAnalytics.attribution(events(rows)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("first", "(none)", 2L, 12.0),
      ("first", "click", 1L, 1.0),
      ("first", "view", 2L, 12.0),
      ("last", "(none)", 2L, 12.0),
      ("last", "click", 1L, 10.0),
      ("last", "view", 2L, 3.0)), s"got ${got.toSeq}")
  }

  test("pitJoin: each fact sees the state current AT ITS OWN instant, facts before any state get NULLs") {
    val rows = Seq(
      // user 1 click-state changelog: 1.0@10s, 2.0@30s, heartbeat 2.0@40s
      // (collapses), 3.0@50s
      (0L, 10L * S, 1L, "click", 1.0), (1L, 30L * S, 1L, "click", 2.0),
      (2L, 40L * S, 1L, "click", 2.0), (3L, 50L * S, 1L, "click", 3.0),
      // purchases probing before/at/inside/after the intervals
      (10L, 5L * S, 1L, "purchase", 0.0),   // before any state -> NULLs
      (11L, 30L * S, 1L, "purchase", 0.0),  // AT a change instant -> new state, age 0
      (12L, 45L * S, 1L, "purchase", 0.0),  // inside [30,50) -> state 2.0
      (13L, 60L * S, 1L, "purchase", 0.0))  // open interval -> state 3.0
    val got = EventAnalytics.pitJoin(events(rows)).collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(4)) null else r.getDouble(4),
        if (r.isNullAt(5)) null else r.getLong(5),
        if (r.isNullAt(6)) null else r.getLong(6))).toMap
    assert(got(10L) == ((null, null, null)), s"pre-state fact ${got(10L)}")
    assert(got(11L) == ((2.0, 2L, 0L)), s"at-change fact ${got(11L)}")
    assert(got(12L) == ((2.0, 2L, 15000000L)), s"mid-interval fact ${got(12L)}")
    assert(got(13L) == ((3.0, 3L, 10000000L)), s"open-interval fact ${got(13L)}")
    assert(got.size == 4, s"multiplicity exactly 1 per fact: ${got.size} rows")
  }

  test("runningBalance: clamp at zero loses the shortfall (non-associative fold), untracked types ignored") {
    val rows = Seq(
      (0L, 10L * S, 1L, "purchase", 10.0), // bal 1000
      (1L, 20L * S, 1L, "click", 3.0),     // bal 700
      (2L, 30L * S, 1L, "error", 20.0),    // raw -1300 -> CLAMP 0
      (9L, 35L * S, 1L, "view", 99.0),     // untracked type: excluded
      (3L, 40L * S, 1L, "signup", 5.0),    // bal 500 (shortfall NOT borrowed)
      (10L, 5L * S, 2L, "click", 1.0),     // first event overdraws -> clamp
      (11L, 6L * S, 2L, "purchase", 2.0))  // bal 200
    val got = EventAnalytics.runningBalance(events(rows)).collect()
      .map(r => r.getLong(1) -> (r.getLong(4), r.getBoolean(5))).toMap
    assert(got == Map(
      0L -> (1000L, false), 1L -> (700L, false), 2L -> (0L, true),
      3L -> (500L, false), 10L -> (0L, true), 11L -> (200L, false)), s"got $got")
  }

  test("rollingActives: DAU exact, WAU counts the trailing 7 days, only observed days report") {
    val day = 86400L * S
    val rows = Seq(
      (0L, 1L * S, 1L, "view", 0.0), (1L, 2L * S, 1L, "click", 0.0), // u1 day0 twice
      (2L, 3L * S, 2L, "view", 0.0),                                  // u2 day0
      (3L, day + 1L * S, 1L, "view", 0.0),                            // u1 day1
      (4L, 8L * day + 1L * S, 1L, "view", 0.0))                       // u1 day8
    val got = EventAnalytics.rollingActives(events(rows)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dayUs = 86400L * 1000000L
    assert(got == Map(
      0L -> (2L, 2L),              // day0: u1+u2 active; window = day0 alone
      dayUs -> (1L, 2L),           // day1: u1 active; window covers day0 too
      8L * dayUs -> (1L, 1L)),     // day8: day1 is 7 days back — OUTSIDE the 7-day window
      s"got $got")
  }
}
