package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream
import graft.streaming.EventStream.{Chunk, Event}

/** A13: Structured Streaming — windowed aggregation and stateful gap
  * sessionization driven synchronously through MemoryStream.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("windowedAgg aggregates event-time windows under a watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.windowedAgg(mem.toDF(), watermark = "5 minutes", win = "10 minutes")
      .writeStream.format("memory").queryName("winagg").outputMode("append").start()
    mem.addData(
      Event(1, ts(1), 1, "click", 10.0), Event(2, ts(2), 1, "click", 20.0),
      Event(3, ts(11), 1, "click", 30.0))
    q.processAllAvailable()
    // advance watermark far enough to close the first windows
    mem.addData(Event(4, ts(59), 1, "click", 40.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM winagg ORDER BY bucket_start").collect()
    q.stop()
    assert(rows.length >= 2, "first two windows emitted")
    assert(rows(0).getAs[Long]("n") == 2 && rows(0).getAs[Double]("avg_value") == 15.0)
    assert(rows(1).getAs[Long]("n") == 1 && rows(1).getAs[Double]("avg_value") == 30.0)
  }

  test("spikeDetect finds crossings across microbatch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.spikeDetect(mem.toDS(), threshold = 100.0)
      .writeStream.format("memory").queryName("spikes").outputMode("append").start()
    mem.addData(Event(1, ts(0), 1, "c", 50.0), Event(2, ts(1), 1, "c", 120.0)) // crossing in-batch
    q.processAllAvailable()
    mem.addData(Event(3, ts(2), 1, "c", 80.0))  // below
    q.processAllAvailable()
    mem.addData(Event(4, ts(3), 1, "c", 150.0)) // crossing ACROSS batches (state)
    q.processAllAvailable()
    val spikes = spark.sql("SELECT * FROM spikes ORDER BY tsUs").collect()
    q.stop()
    assert(spikes.length == 2)
    assert(spikes.map(_.getAs[Double]("value")).toSeq == Seq(120.0, 150.0))
  }

  test("streamingDedup drops duplicates across microbatches via state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Doc]
    val q = EventStream.streamingDedup(mem.toDS())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    // batch 1: two distinct docs + an in-batch duplicate (whitespace noise)
    mem.addData(
      EventStream.Doc(3, "Hello  World"), EventStream.Doc(1, "hello world"),
      EventStream.Doc(2, "something else"))
    q.processAllAvailable()
    // batch 2: cross-batch duplicate + one fresh doc
    mem.addData(EventStream.Doc(4, " HELLO   world "), EventStream.Doc(5, "brand new"))
    q.processAllAvailable()
    val kept = spark.sql("SELECT docId FROM dedup ORDER BY docId").collect().map(_.getLong(0))
    q.stop()
    assert(kept.toSeq == Seq(1L, 2L, 5L),
      s"lowest-id first-seen survives, later duplicates dropped: ${kept.toSeq}")
  }

  test("streamingDedupWindowed drops dups inside the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.TimedDoc]
    val q = EventStream.streamingDedupWindowed(mem.toDS(), watermark = "5 minutes")
      .writeStream.format("memory").queryName("wdedup").outputMode("append").start()
    mem.addData(
      EventStream.TimedDoc(1, ts(0), "hello world"),
      EventStream.TimedDoc(2, ts(1), "HELLO  world"))   // dup within horizon
    q.processAllAvailable()
    mem.addData(EventStream.TimedDoc(3, ts(2), "fresh content"))
    q.processAllAvailable()
    val kept = spark.sql("SELECT docId FROM wdedup ORDER BY docId").collect().map(_.getLong(0))
    q.stop()
    assert(kept.length == 2 && kept.contains(3L) && !(kept.contains(1L) && kept.contains(2L)),
      s"one of the dup pair + the fresh doc survive: ${kept.toSeq}")
  }

  test("streamingHeavyHitters merges the sketch across microbatches per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.TimedDoc]
    val q = EventStream.streamingHeavyHitters(mem.toDS(), capacity = 16,
      windowLen = "10 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("hh").outputMode("append").start()
    // two microbatches inside the SAME window — counts must merge
    mem.addData(EventStream.TimedDoc(1, ts(0), "x x y"), EventStream.TimedDoc(2, ts(1), "x z"))
    q.processAllAvailable()
    mem.addData(EventStream.TimedDoc(3, ts(2), "x y"))
    q.processAllAvailable()
    // an event far past the window closes it (watermark advances)
    mem.addData(EventStream.TimedDoc(4, ts(120), "later stuff"))
    q.processAllAvailable()
    val got = spark.sql("SELECT token, cnt FROM hh ORDER BY cnt DESC, token").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    q.stop()
    assert(got.toSeq.take(3) == Seq(("x", 4L), ("y", 2L), ("z", 1L)),
      s"cross-batch merged counts for the closed window: ${got.toSeq}")
  }

  test("gapSessionize closes chunks across microbatches via state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.gapSessionize(mem.toDS(), gapUs = 5L * 60 * 1000000)
      .writeStream.format("memory").queryName("chunks").outputMode("append").start()
    // batch 1: two events 1 min apart (same chunk)
    mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 2: event 20 min later -> closes first chunk
    mem.addData(Event(3, ts(21), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 3: another gap -> closes second chunk
    mem.addData(Event(4, ts(59), 1, "click", 1.0))
    q.processAllAvailable()
    val chunks = spark.sql("SELECT * FROM chunks ORDER BY startUs").as[Chunk].collect()
    q.stop()
    assert(chunks.length == 2)
    assert(chunks(0).nSamples == 2 && chunks(0).startUs == ts(0).getTime * 1000)
    assert(chunks(1).nSamples == 1 && chunks(1).startUs == ts(21).getTime * 1000)
  }
}
