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
}
