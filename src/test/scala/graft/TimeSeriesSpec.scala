package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

/** A18/A19 behavioral tests with PLANTED signals (the synthetic events
  * stream has no known spectral content): a pure sinusoid must show its
  * amplitude in the matching band and ~nothing elsewhere; a planted
  * point anomaly must be the only z-score outlier.
  */
class TimeSeriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  /** A fake Tables whose events are (event_id, ts_ns, user_id, event_type, value). */
  private def events(rows: Seq[(Long, Long, Long, String, Double)]): Tables = {
    import spark.implicits._
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("events").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables(spark, dir)
  }

  test("bandpower recovers a planted sinusoid's amplitude in its band") {
    // 100·sin(2π t/3600), sampled every 60 s over exactly 2 periods
    val sine = (0 until 120).map { i =>
      val tSec = i * 60L
      (i.toLong, tSec * 1000000000L, 1L, "sine",
        100.0 * math.sin(2 * math.Pi * tSec / 3600.0))
    }
    val flat = (0 until 120).map { i =>
      (1000L + i, i * 60L * 1000000000L, 1L, "flat", 42.0)
    }
    val got = TimeSeries.tsBandpower(events(sine ++ flat)).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val (sineDay, sineHour) = got("sine")
    val (_, flatHour) = got("flat")
    assert(math.abs(sineHour - 100.0) < 2.0, s"hour-band amplitude ~100, got $sineHour")
    // a 2 h record can't resolve the day band — only bound the leakage
    assert(sineDay < 20.0, s"day-band leakage stays small in an hourly sine, got $sineDay")
    assert(flatHour < 1.0, s"constant channel has no hour-band content, got $flatHour")
  }

  test("spectrum isolates a planted harmonic in its own bin") {
    // 100·sin(2π·3t/T) over exactly 3 periods of the 3rd harmonic
    // (T = 10800 s, bins are harmonics of T): all energy in bin 3
    val T = 10800.0
    val sine = (0 until 180).map { i =>
      val tSec = i * 60L
      (i.toLong, tSec * 1000000000L, 1L, "h3",
        100.0 * math.sin(2 * math.Pi * 3 * tSec / T))
    }
    val got = TimeSeries.tsSpectrum(events(sine), periodS = T, nBins = 6).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got.keySet == (1L to 6L).toSet, s"six bins: $got")
    assert(math.abs(got(3L) - 100.0) < 2.0, s"3rd-harmonic bin ~100: $got")
    (1L to 6L).filter(_ != 3L).foreach { k =>
      assert(got(k) < 5.0, s"bin $k holds no planted energy: $got")
    }
  }

  test("lagged cross-correlation finds the planted lead-lag offset") {
    // channel bbb = channel aaa delayed by exactly 2 buckets (2 h):
    // corr(A(t), B(t + lag)) must peak at lag = +2
    val bucketNs = 3600L * 1000000000L
    def wave(i: Int): Double = math.sin(2 * math.Pi * i / 12.0) * 10 + (i % 5)
    val a = (0 until 48).map(i => (i.toLong, i * bucketNs + 1000L, 1L, "aaa", wave(i)))
    val b = (0 until 48).map(i => (100L + i, i * bucketNs + 1000L, 1L, "bbb", wave(i - 2)))
    val got = TimeSeries.tsXcorrLag(events(a ++ b)).collect()
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(got.keySet == (-3L to 3L).toSet, s"all lags present: $got")
    assert(got(2L) > 0.999, s"perfect correlation at the planted lag: $got")
    assert((-3L to 3L).filter(_ != 2L).forall(l => got(l) < got(2L)),
      s"lag +2 is the unique peak: $got")
  }

  test("MAD outliers survive the masking that defeats the z-score detector") {
    // 20 % contamination at 500 inflates mean/stddev enough that the
    // z-score of the outliers themselves drops near 2 — the classic
    // masking failure. The median/MAD pair doesn't move, so the robust
    // detector still flags every planted point and no normal one.
    val normal = (0 until 200).map { i =>
      (i.toLong, i * 1000000000L, 1L, "ch", 10.0 + (i % 7) * 0.5)
    }
    val planted = (0 until 40).map { i =>
      (1000L + i, (500L + i) * 1000000000L, 1L, "ch", 500.0)
    }
    val t = events(normal ++ planted)
    val zFlagged = TimeSeries.tsOutlier(t).collect().map(_.getLong(1)).toSet
    assert(zFlagged.isEmpty, s"masked contamination defeats the z detector, got $zFlagged")
    val madFlagged = TimeSeries.madOutlier(t).collect().map(_.getLong(1)).toSet
    assert(madFlagged == planted.map(_._1).toSet,
      s"MAD flags exactly the planted points, got ${madFlagged.size} of ${planted.size}")
  }

  test("MAD literal-fold and broadcast-join paths agree, incl. at 10k channels") {
    // the masking fixture again, through BOTH scoring paths
    val normal = (0 until 200).map { i =>
      (i.toLong, i * 1000000000L, 1L, "ch", 10.0 + (i % 7) * 0.5)
    }
    val planted = (0 until 40).map { i =>
      (1000L + i, (500L + i) * 1000000000L, 1L, "ch", 500.0)
    }
    val t = events(normal ++ planted)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(rows(TimeSeries.madOutlierEvents(t.events, 3.5, maxLitKeys = 0)) ==
      rows(TimeSeries.madOutlier(t)), "join path == literal path")

    // 10k channels: 6 normal points + 1 planted outlier each — the
    // literal path would ship a 10k-entry map per task; the gated join
    // path must flag exactly the planted point per channel
    val wide = (0 until 10000).flatMap { c =>
      val ch = f"ch$c%05d"
      (0 until 6).map(i => ((c * 7 + i).toLong, i * 1000000000L, 1L, ch, 10.0 + i * 0.5)) :+
        ((c * 7 + 6).toLong, 6L * 1000000000L, 1L, ch, 900.0)
    }
    val tw = events(wide)
    val gated = TimeSeries.madOutlierEvents(tw.events, 3.5, maxLitKeys = 100).collect()
    assert(gated.length == 10000, s"one planted outlier per channel, got ${gated.length}")
    assert(gated.forall(_.getDouble(3) == 900.0))
  }

  test("trailing time-window aggregation counts by TIME, not rows") {
    val rows = Seq(
      (0L, 0L, 1L, "ch", 1.0),           // t = 0 s
      (1L, 60L * 1000000000L, 1L, "ch", 2.0),   // t = 60 s
      (2L, 120L * 1000000000L, 1L, "ch", 3.0),  // t = 120 s
      (3L, 600L * 1000000000L, 1L, "ch", 4.0),  // t = 600 s: 0 s is on the horizon edge (inclusive)
      (4L, 660L * 1000000000L, 1L, "ch", 5.0))  // t = 660 s: 0 s has aged out
    val got = TimeSeries.tsWeighted(events(rows)).collect()
      .map(r => r.getLong(1) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(got(0L) == ((1L, 1.0)) && got(1L) == ((2L, 1.5)) && got(2L) == ((3L, 2.0)))
    assert(got(3L) == ((4L, 2.5)), s"inclusive horizon edge: ${got(3L)}")
    assert(got(4L) == ((4L, 3.5)), s"t=0 aged out: ${got(4L)}")
  }

  test("LTTB keeps the spike a bucket-mean resample would flatten") {
    // 80 samples of a flat signal with one narrow spike; 4 buckets of 20.
    // Resampling to 4 bucket means flattens the spike to ~14.5; LTTB must
    // select the spike point itself for its bucket, plus the exact first
    // and last points for the edge buckets.
    val rows = (0 until 80).map { i =>
      val v = if (i == 30) 100.0 else 10.0
      (i.toLong, i * 60L * 1000000000L, 1L, "ch", v)
    }
    val got = TimeSeries.lttb(events(rows), nBuckets = 4).collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(got.length == 4, s"one point per bucket: ${got.length}")
    assert(got.head._1 == 0L * 60L * 1000000L, "first bucket keeps the first point")
    assert(got.last._1 == 79L * 60L * 1000000L, "last bucket keeps the last point")
    assert(got.map(_._2).contains(100.0), s"spike survives downsampling: ${got.toSeq}")
  }

  test("z-score outlier detection flags exactly the planted anomaly") {
    val normal = (0 until 200).map { i =>
      (i.toLong, i * 1000000000L, 1L, "ch", 10.0 + (i % 7) * 0.5)
    }
    val anomaly = Seq((999L, 500L * 1000000000L, 1L, "ch", 500.0))
    val got = TimeSeries.tsOutlier(events(normal ++ anomaly)).collect()
    assert(got.length == 1 && got(0).getLong(1) == 999L,
      s"only the planted anomaly flagged, got ${got.map(_.getLong(1)).toSeq}")
    assert(got(0).getDouble(4) > 10.0, "planted anomaly has a huge z-score")
  }

  test("tsSeasonal: phase mean from raw sums; max deviation finds the hour that broke its phase") {
    val H = 3600L * 1000000000L // one hour in ns
    val rows = Seq(
      // phase hod=0: day-1 bucket mean (1+3)/2 = 2, day-2 bucket mean 4;
      // phase mean = (1+3+4)/3 = 2.6667, max dev = |4 - 8/3| = 1.3333
      (1L, 100L, 1L, "x", 1.0),
      (2L, 200L, 1L, "x", 3.0),
      (3L, 24L * H + 100L, 1L, "x", 4.0),
      // phase hod=1: single bucket -> dev 0
      (4L, H + 500L, 1L, "x", 10.0))
    val got = TimeSeries.tsSeasonal(events(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("x", 0L, 2L, 3L, 2.6667, 1.3333),
      ("x", 1L, 1L, 1L, 10.0, 0.0)), s"got ${got.toSeq}")
  }

  test("tsSeasonal: hod is the bucket start's HOUR-OF-DAY for any bucket width, not a bucket index") {
    // r13 advice: with bucketUs != 1h, (bucket div bucketUs) % 24 is a
    // bucket-index phase, not an hour. With 2 h buckets the bucket starting
    // at 02:00 must report hod=2 (the index formula would say 1), and the
    // 26:00 bucket must fold onto the same hod=2 phase.
    val H = 3600L * 1000000000L
    val rows = Seq(
      (1L, 100L, 1L, "x", 2.0),          // bucket start 00:00 -> hod 0
      (2L, 2L * H + 100L, 1L, "x", 4.0), // bucket start 02:00 -> hod 2
      (3L, 26L * H + 100L, 1L, "x", 6.0))// bucket start 26:00 -> hod 2 (next day)
    val got = TimeSeries.tsSeasonal(events(rows), bucketUs = 7200L * 1000000).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("x", 0L, 1L, 1L, 2.0, 0.0),
      ("x", 2L, 2L, 2L, 5.0, 1.0)), s"got ${got.toSeq}")
  }

  test("tsSpectrogram: a sinusoid planted in ONE window shows up only in that window's bin") {
    // window = 1 h, bins are harmonics of the window: bin 2 = period 1800 s.
    // Hour 0 carries a 1800 s sine; hour 1 is flat — the spectrogram must
    // localize the energy in (window 0, bin 2) and show ~0 elsewhere,
    // which the global tsSpectrum cannot (it smears both hours together).
    val rows = (0 until 240).map { i =>
      val tSec = i * 30L
      val v = if (tSec < 3600) 100.0 * math.sin(2 * math.Pi * tSec / 1800.0) else 42.0
      (i.toLong, tSec * 1000000000L, 1L, "ch", v)
    }
    val got = TimeSeries.tsSpectrogram(events(rows), windowUs = 3600L * 1000000, nBins = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(4)).toMap
    assert(math.abs(got((0L, 2L)) - 100.0) < 2.0, s"planted bin ~100: $got")
    assert(got((0L, 1L)) < 2.0, s"other bin of the hot window stays cold: $got")
    assert(got((3600000000L, 1L)) < 1.0 && got((3600000000L, 2L)) < 1.0,
      s"flat window has no spectral content: $got")
  }

  test("tsHjorth: hand-computed variance ratios; degenerate single-sample channel") {
    // c = [0,200,0,200] cents: var0 = 10000 -> activity 1.0;
    // d1 = [200,-200,200]: var1 = 40000 - (200/3)^2 = 35555.5556
    //   -> mobility = sqrt(3.5555556) = 1.8856;
    // d2 = [-400,400]: var2 = 160000 -> sqrt(160000/35555.56)/mobility
    //   = sqrt(4.5/3.5555556) = sqrt(1.265625) = 1.125 exactly.
    val quad = Seq(0.0, 2.0, 0.0, 2.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, i * 1000000000L, 1L, "q", v)
    }
    val single = Seq((99L, 0L, 1L, "s", 7.0))
    val got = TimeSeries.tsHjorth(events(quad ++ single)).collect()
      .map(r => r.getString(0) -> r).toMap
    val qr = got("q")
    assert((qr.getLong(1), qr.getDouble(2), qr.getDouble(3), qr.getDouble(4)) ==
      ((4L, 1.0, 1.8856, 1.125)), s"got $qr")
    val sr = got("s")
    assert(sr.getLong(1) == 1L && sr.getDouble(2) == 0.0 && sr.isNullAt(3) && sr.isNullAt(4),
      s"single sample: zero activity, null mobility/complexity: $sr")
  }

  test("tsEpochFeatures: exact mean/rms/line-length/turns; diffs never chain across epochs") {
    val H = 3600L * 1000000000L
    val rows = Seq(
      (1L, 0L, 1L, "e", 1.0), (2L, 1000L, 1L, "e", 3.0),
      (3L, 2000L, 1L, "e", 2.0), (4L, 3000L, 1L, "e", 2.0),
      // next epoch: a single sample — its d must be NULL (no cross-epoch
      // diff against value 2.0), so ll = 0 and no turns
      (5L, H + 1000L, 1L, "e", 9.0))
    val got = TimeSeries.tsEpochFeatures(events(rows)).collect()
      .map(r => (r.getLong(1), (r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getLong(6)))).toMap
    // epoch 0: c=[100,300,200,200] -> mean 2.0, rms sqrt(45000)/100=2.1213,
    // d=[200,-100,0] -> ll 3.0, one sign flip (200 then -100)
    assert(got(0L) == ((4L, 2.0, 2.1213, 3.0, 1L)), s"got ${got(0L)}")
    assert(got(3600000000L) == ((1L, 9.0, 9.0, 0.0, 0L)), s"got ${got(3600000000L)}")
  }

  test("intervalJoin: exact overlap pairs across cells — dedup, touching, exclusions, gate") {
    import spark.implicits._
    val iv = Seq(
      ("A", 1L, 0L, 2500L),    // spans cells 0,1,2 at cellUs=1000
      ("B", 1L, 2400L, 3000L), // overlaps A#1 by 100
      ("B", 2L, 500L, 1500L),  // shares TWO cells with A#1 -> must dedup to one row
      ("C", 1L, 2500L, 2600L), // touches A#1 at one instant -> overlap 0, included
      ("D", 1L, 5000L, 6000L)) // overlaps nothing
      .toDF("event_type", "chunk_id", "start_us", "end_us")
    val got = TimeSeries.intervalJoin(iv, cellUs = 1000L, maxCells = 16).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .sortBy(r => (r._1, r._2, r._3, r._4))
    assert(got.toSeq == Seq(
      ("A", 1L, "B", 1L, 100L),
      ("A", 1L, "B", 2L, 1000L),
      ("A", 1L, "C", 1L, 0L),
      ("B", 1L, "C", 1L, 100L)), s"got ${got.toSeq}")
    // an interval spanning more cells than maxCells is refused loudly
    // BEFORE the explode, with the remedy named
    val e = intercept[IllegalArgumentException] {
      TimeSeries.intervalJoin(iv, cellUs = 1000L, maxCells = 2).collect()
    }
    assert(e.getMessage.contains("maxCells") && e.getMessage.contains("cellUs"), e.getMessage)
  }

  test("tsCar: re-reference subtracts the bucket's cross-channel grand mean") {
    val rows = Seq(
      (1L, 0L, 1L, "A", 1.0),                      // bucket 0: A mean 2.0
      (2L, 60L * 1000000000L, 1L, "A", 3.0),
      (3L, 120L * 1000000000L, 1L, "B", 10.0),     // bucket 0: B mean 10.0
      (4L, 3700L * 1000000000L, 1L, "A", 5.0))     // bucket 1: A alone
    // bucket-0 grand mean = (100+300+1000)/3 cents = 4.666666…
    val got = TimeSeries.tsCar(events(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("A", 0L, 2L, 2L, 2.0, -2.6667),
      ("A", 3600000000L, 1L, 1L, 5.0, 0.0),
      ("B", 0L, 1L, 2L, 10.0, 5.3333)), s"got ${got.toSeq}")
  }

  test("tsDetrend: exact line recovered, flat channel slope 0, single-instant channel nulls") {
    val E = 1704067200L // 2024-01-01T00:00Z, the fixed regression origin
    def at(daySec: Long): Long = (E + daySec) * 1000000000L
    val line = (0 until 5).map { k => // v = 1.00 + 0.01·day: exactly on the line
      (k.toLong, at(k * 86400L), 1L, "line", 1.0 + 0.01 * k)
    }
    val flat = (0 until 5).map { k =>
      (10L + k, at(k * 86400L), 1L, "flat", 42.0)
    }
    val inst = Seq( // two samples at the SAME instant: zero time variance
      (20L, at(0L), 1L, "inst", 1.0), (21L, at(0L), 1L, "inst", 3.0))
    val got = TimeSeries.tsDetrend(events(line ++ flat ++ inst)).collect()
      .map(r => r.getString(0) -> r).toMap
    val l = got("line")
    assert(l.getLong(1) == 5L && l.getDouble(2) == 1.02 &&
      l.getDouble(3) == 0.01 && l.getDouble(4) == 0.0, s"line row $l")
    val f = got("flat")
    assert(f.getDouble(2) == 42.0 && f.getDouble(3) == 0.0 && f.getDouble(4) == 0.0,
      s"flat row $f")
    val i = got("inst")
    assert(i.getDouble(2) == 2.0 && i.isNullAt(3) && i.isNullAt(4),
      s"single-instant channel must yield NULL slope/rms, got $i")
  }

  test("tsOhlc: open/close follow the exact (ts, event_id) order, ties broken by id") {
    val H = 3600L * 1000000000L
    val rows = Seq(
      (10L, 5000000L * 1000L, 1L, "y", 7.5),  // last by us -> close
      (11L, 1000000L * 1000L, 1L, "y", 2.25), // tied us, LOWER id -> open
      (12L, 1000000L * 1000L, 1L, "y", 9.0),  // tied us, higher id
      (13L, H + 1000L, 1L, "y", -1.25))       // second bucket, single event
    val got = TimeSeries.tsOhlc(events(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("y", 0L, 2.25, 9.0, 2.25, 7.5, 3L),
      ("y", 3600000000L, -1.25, -1.25, -1.25, -1.25, 1L)), s"got ${got.toSeq}")
  }

  test("tsWelch: planted sinusoid dominates its harmonic bin; flat channel has no band content") {
    val W = 3600L // window seconds
    // 100*sin(2*pi*2*t/3600): exactly bin 2 of a 1h window, 30s sampling,
    // span [7200, 16200] s -> 4 COMPLETE windows survive (2 per offset);
    // the half-empty edge windows of each offset grid must be discarded
    val sine = (0 to 300).map { i =>
      val tSec = i * 30L
      (i.toLong, (tSec + 7200L) * 1000000000L, 1L, "sine",
        100.0 * math.sin(2 * math.Pi * 2 * tSec / 3600.0))
    }
    val flat = (0 to 300).map { i =>
      (1000L + i, (i * 30L + 7200L) * 1000000000L, 1L, "flat", 42.0)
    }
    val got = TimeSeries.tsWelch(events(sine ++ flat), windowUs = W * 1000000L, nBins = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // Hann splits a pure tone into amplitude 1/2 at its bin and 1/4 at
    // the +-1 bins -> POWER exactly 1/4 of the peak there, ~nothing
    // beyond: the textbook taper structure, pinned exactly
    assert(got((("sine", 2L))) > 10000.0, s"bin-2 power dominates: $got")
    assert(math.abs(got(("sine", 1L)) - got(("sine", 2L)) / 4.0) < 1.0 &&
      math.abs(got(("sine", 3L)) - got(("sine", 2L)) / 4.0) < 1.0,
      s"Hann +-1-bin spread is exactly quarter power: $got")
    assert(got(("sine", 4L)) < 1e-6, s"no far-bin leakage: $got")
    (1L to 4L).foreach { k =>
      assert(got(("flat", k)) < 1e-6, s"demeaned flat channel has NO band content at $k: $got")
    }
    val nw = TimeSeries.tsWelch(events(sine ++ flat), windowUs = W * 1000000L, nBins = 4)
      .collect().map(r => r.getLong(2)).distinct
    assert(nw.toSeq == Seq(4L), s"exactly the 4 complete windows averaged: ${nw.toSeq}")
  }

  test("tsCoherence: phase-lagged copy stays fully coherent; mid-record phase flip decoheres") {
    val W = 3600L
    def t(i: Int): Long = 7200L + i * 30L
    val n = 541 // span [7200, 23400] s -> 8 complete windows across both grids
    val aa = (0 until n).map { i =>
      (i.toLong, t(i) * 1000000000L, 1L, "aa", 100.0 * math.sin(2 * math.Pi * 2 * t(i) / 3600.0))
    }
    // quarter-period phase LEAD: coherence is phase-invariant -> 1.0
    val bb = (0 until n).map { i =>
      (1000L + i, t(i) * 1000000000L, 1L, "bb",
        100.0 * math.sin(2 * math.Pi * 2 * t(i) / 3600.0 + math.Pi / 2))
    }
    // sign flip halfway: window cross-spectra cancel -> near-zero coherence
    val cc = (0 until n).map { i =>
      val sign = if (t(i) < 14400L) 1.0 else -1.0
      (2000L + i, t(i) * 1000000000L, 1L, "cc",
        sign * 100.0 * math.sin(2 * math.Pi * 2 * t(i) / 3600.0))
    }
    val got = TimeSeries.tsCoherence(events(aa ++ bb ++ cc), windowUs = W * 1000000L, nBins = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    val (nwAb, cohAb) = got(("aa", "bb", 2L))
    assert(nwAb == 8L, s"8 complete shared windows: $got")
    assert(cohAb == 1.0, s"phase-lagged copy fully coherent at its bin: $got")
    val (_, cohAc) = got(("aa", "cc", 2L))
    assert(cohAc < 0.1, s"phase-flipped channel decoheres: $got")
  }

  test("tsFir: passband tone passes, stopband tone dies, output equals direct convolution") {
    val H = 3600L * 1000000000L // one event per hourly bucket
    def chan(name: String, base: Long, f: Double): Seq[(Long, Long, Long, String, Double)] =
      (0 until 120).map { k =>
        (base + k, k * H + 1000L, 1L, name, 100.0 * math.sin(2 * math.Pi * f * k))
      }
    val rows = chan("pass", 0L, 0.2) ++ chan("stop", 1000L, 0.02)
    val got = TimeSeries.tsFir(events(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    def rms(xs: Seq[Double]): Double = math.sqrt(xs.map(x => x * x).sum / xs.size)
    val passY = got.filter(_._1 == "pass").map(_._4).toSeq
    val stopY = got.filter(_._1 == "stop").map(_._4).toSeq
    assert(passY.size == 100 && stopY.size == 100, s"valid-mode length 120-20: ${passY.size}")
    val inRms = rms((0 until 120).map(k => 100.0 * math.sin(2 * math.Pi * 0.2 * k)))
    assert(rms(passY) > 0.9 * inRms, s"passband survives: ${rms(passY)} vs $inRms")
    assert(rms(stopY) < 0.02 * inRms, s"stopband dies: ${rms(stopY)}")
    // exact parity against a test-local direct convolution over the
    // cent-quantized grid values (same taps, independent code path)
    val taps = (-10 to 10).map { m =>
      def sinc(x: Double) = if (x == 0.0) 1.0 else math.sin(math.Pi * x) / (math.Pi * x)
      (2.0 * 0.3 * sinc(2.0 * 0.3 * m) - 2.0 * 0.1 * sinc(2.0 * 0.1 * m)) *
        (0.54 + 0.46 * math.cos(2.0 * math.Pi * m / 20))
    }
    val xq = (0 until 120).map(k =>
      math.floor(100.0 * math.sin(2 * math.Pi * 0.2 * k) * 100.0 + 0.5) / 100.0)
    val expect = (20 until 120).map { k =>
      val y = taps.zipWithIndex.map { case (h, j) => h * xq(k - j) }.reduceLeft(_ + _)
      math.floor(y * 10000.0 + 0.5) / 10000.0
    }
    val gotPass = got.filter(_._1 == "pass").sortBy(_._2).map(_._4).toSeq
    assert(gotPass == expect, s"direct convolution parity: ${gotPass.take(3)} vs ${expect.take(3)}")
  }

  test("tsArtifacts: amplitude and gradient gates are exact, epoch-scoped, boundary-exclusive") {
    val H = 3600L * 1000000000L
    val rows = Seq(
      // epoch 0: clean, incl. value EXACTLY at the amplitude ceiling
      // (step 90 stays under the gradient gate)
      (0L, 10L, 1L, "ch", 60.0), (1L, 20L, 1L, "ch", 150.0),
      // epoch 1: one amplitude artifact, gradient clean (step -50)
      (2L, H + 10L, 1L, "ch", 200.0), (3L, H + 20L, 1L, "ch", 150.0),
      // epoch 2: gradient artifact (10 -> 120, step 110 > 100) but
      // amplitudes are fine; step EXACTLY 100 (120 -> 20) stays clean
      (4L, 2 * H + 10L, 1L, "ch", 10.0), (5L, 2 * H + 20L, 1L, "ch", 120.0),
      (6L, 2 * H + 30L, 1L, "ch", 20.0),
      // epoch 3: first sample far from epoch-2's last — the CROSS-epoch
      // step must NOT count (lag restarts per epoch)
      (7L, 3 * H + 10L, 1L, "ch", -130.0))
    val got = TimeSeries.tsArtifacts(events(rows)).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    assert(got(0L) == ((2L, 0L, 0L, false)), s"epoch0 ${got(0L)}")
    assert(got(3600000000L) == ((2L, 1L, 0L, true)), s"epoch1 ${got(3600000000L)}")
    assert(got(2L * 3600000000L) == ((3L, 0L, 1L, true)), s"epoch2 ${got(2L * 3600000000L)}")
    assert(got(3L * 3600000000L) == ((1L, 0L, 0L, false)), s"epoch3 ${got(3L * 3600000000L)}")
  }

  test("tsBursts: a sustained band-limited burst is one event; quiet channel emits nothing") {
    val H = 3600L * 1000000000L
    def tone(k: Int): Double = 100.0 * math.sin(2 * math.Pi * 0.2 * k)
    val bb = (0 until 150).map { k =>
      val v = if (k >= 60 && k < 80) tone(k) else 0.0
      (k.toLong, k * H + 1000L, 1L, "bb", v)
    }
    val qq = (0 until 150).map { k => (1000L + k, k * H + 1000L, 1L, "qq", 0.0) }
    val got = TimeSeries.tsBursts(events(bb ++ qq)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).toSet == Set("bb"), s"only the burst channel fires: ${got.toSeq}")
    assert(got.length == 1, s"ONE sustained burst, not fragments: ${got.toSeq}")
    val (_, startUs, endUs, n, peak) = got.head
    val hUs = 3600000000L
    // causal FIR group delay = 10 buckets; envelope smear +-2; the
    // detected span must cover the delayed core and stay in bounds
    assert(startUs >= 58L * hUs && startUs <= 72L * hUs, s"start ${startUs / hUs}")
    assert(endUs >= 88L * hUs && endUs <= 100L * hUs, s"end ${endUs / hUs}")
    assert(n >= 15L && n <= 40L && peak > 10.0, s"span/peak $n $peak")
  }

  test("tsDecimate: above-new-Nyquist tone is removed where a naive stride would alias it in") {
    val H = 3600L * 1000000000L
    // f=0.4 cycles/sample: far above the n=4 Nyquist of 0.125 — a naive
    // every-4th stride sees it aliased to |0.4*4 mod 1| = 0.6 ~ full
    // amplitude; the anti-aliasing lowpass must kill it
    val hi = (0 until 160).map { k =>
      (k.toLong, k * H + 1000L, 1L, "hi", 100.0 * math.sin(2 * math.Pi * 0.4 * k))
    }
    val lo = (0 until 160).map { k =>
      (1000L + k, k * H + 1000L, 1L, "lo", 100.0 * math.sin(2 * math.Pi * 0.05 * k))
    }
    val got = TimeSeries.tsDecimate(events(hi ++ lo)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def rms(xs: Seq[Double]) = math.sqrt(xs.map(x => x * x).sum / xs.size)
    val hiOut = got.filter(_._1 == "hi").map(_._3).toSeq
    val loOut = got.filter(_._1 == "lo").map(_._3).toSeq
    assert(hiOut.size == 35 && loOut.size == 35, s"(160-20 supported)/4: ${hiOut.size}")
    val naiveAlias = rms((20 until 160 by 4).map(k => 100.0 * math.sin(2 * math.Pi * 0.4 * k)))
    assert(naiveAlias > 50.0, s"the naive stride WOULD alias visibly: $naiveAlias")
    assert(rms(hiOut) < 3.0, s"anti-aliased decimation kills the tone: ${rms(hiOut)}")
    assert(rms(loOut) > 0.7 * rms((0 until 160).map(k => 100.0 * math.sin(2 * math.Pi * 0.05 * k))),
      s"in-band content survives: ${rms(loOut)}")
  }
}
