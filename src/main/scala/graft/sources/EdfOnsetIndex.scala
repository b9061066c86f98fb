package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import graft.sources.EdfFile.EdfHeader

/** Plan-time pruning sidecar for EDF+D files (A1 scale path).
  *
  * EDF+D record onsets live inside each record's own TAL prefix
  * (reference edf.py record-offset parsing), so time-bound pushdown can
  * only prune record READS — the DSv2 reader seek-reads the TAL slice
  * first and skips out-of-range records, but every planned partition
  * still opens the file. This sidecar materializes the onsets once into
  * a tiny JSON file next to the EDF (`<file>.edf.onsets.json`, ~10
  * bytes/record vs the record's KBs of samples), letting
  * `planInputPartitions` drop whole EDF+D splits at PLANNING time —
  * the discontiguous counterpart of the contiguous-file window
  * arithmetic in [[graft.sources.v2.EdfPushdown.recordWindow]].
  *
  * Staleness safety: the sidecar records `nbDataRec`; a mismatch with
  * the file's header (file rewritten, sidecar orphaned) makes `read`
  * return None and planning falls back to the conservative full plan.
  * Pruning remains conservative with the sidecar too — a boundary
  * record is kept and Spark's residual filter trims its rows.
  */
object EdfOnsetIndex {

  def sidecarPath(edfPath: String): String = edfPath + ".onsets.json"

  /** Scan every record's TAL onset (annotation-slice seek-reads only —
    * sample bytes are never transferred: len(TAL) of the record's KBs)
    * and write the sidecar. One sequential pass, run once per file at
    * land time; at fleet scale run it per-file in tasks (it needs only
    * the Hadoop conf, no Spark session).
    */
  def write(path: String, conf: Configuration = new Configuration()): String = {
    val h = EdfFile.readHeader(path, conf)
    require(h.isDiscontiguous, s"$path is contiguous — record onsets are header arithmetic, no sidecar needed")
    val annIdx = h.signals.indexWhere(_.isAnnotation)
    require(annIdx >= 0, s"$path has no annotation signal to carry TAL onsets")
    val sigOffsets = h.signals.scanLeft(0L)((acc, s) => acc + s.nrSamples * 2L)
    val annOff = sigOffsets(annIdx)
    val len = h.signals(annIdx).nrSamples * 2
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    // sub-chunk positioned reads: without openSeekable the checksum
    // layer + 4 KiB buffer would transfer ~the whole file for KB-scale
    // records (measured by EdfScaleProbe)
    val in = EdfFile.openSeekable(fs, p, len)
    val onsets = try {
      val buf = new Array[Byte](len)
      (0 until h.nbDataRec).map { rec =>
        in.readFully(h.headerBytes + rec.toLong * h.recordBytes + annOff, buf)
        val tal = new String(buf, 0, len, StandardCharsets.US_ASCII)
        val head = tal.split("\u0014\u0014", 2).head
        h.startUs + (head.toDouble * 1e6).toLong
      }
    } finally in.close()
    val out = new Path(sidecarPath(path))
    val os = fs.create(out, true)
    try os.write(
      s"""{"nbDataRec": ${h.nbDataRec}, "onsetsUs": [${onsets.mkString(", ")}]}"""
        .getBytes(StandardCharsets.UTF_8))
    finally os.close()
    out.toString
  }

  /** True when `path` is an EDF+D file that needs (and can get) a
    * sidecar it doesn't have yet: discontiguous, TAL-bearing, and no
    * fresh sidecar present.
    */
  def needed(path: String, conf: Configuration): Boolean = {
    val h = EdfFile.readHeader(path, conf)
    h.isDiscontiguous && h.signals.exists(_.isAnnotation) && read(path, h, conf).isEmpty
  }

  /** Land-time indexing for a batch of landed files: ensure every EDF+D
    * member has a fresh sidecar (no-op for contiguous files and
    * already-indexed ones). Runs per-file in executor tasks — the
    * driver never touches record bytes — and is BEST-EFFORT: a file
    * that can't be indexed (corrupt header, read-only directory) is
    * skipped, since planning without a sidecar is merely unpruned,
    * never wrong.
    */
  def ensure(spark: org.apache.spark.sql.SparkSession, files: Seq[String]): Unit =
    ensure(spark.sparkContext, EdfFile.captureConfEntries(spark), files)

  /** Same, for callers that already hold captured conf entries (the
    * streaming micro-batch planner). Task count tracks the cluster
    * (`defaultParallelism`), not a fixed constant, so a 1000-executor
    * fleet indexes a landing burst at fleet width.
    */
  def ensure(sc: org.apache.spark.SparkContext, entries: Seq[(String, String)],
             files: Seq[String]): Unit =
    if (files.nonEmpty) {
      // tag the job so the UI (and tests) can attribute the indexing
      // work to this path rather than whatever query triggered it
      val prev = sc.getLocalProperty("spark.job.description")
      sc.setJobDescription(s"EdfOnsetIndex.ensure: land-time sidecar indexing of ${files.size} file(s)")
      try sc.parallelize(files, math.max(1, math.min(files.size, sc.defaultParallelism)))
        .foreach { f =>
          val conf = EdfFile.confFromEntries(entries)
          try if (needed(f, conf)) { write(f, conf); () }
          catch { case _: Exception => () }
        }
      finally sc.setJobDescription(prev)
    }

  /** Absolute record onsets (µs) from the sidecar, or None when it is
    * missing, unreadable, or stale (record count differs from the
    * header) — callers fall back to unpruned planning.
    */
  def read(path: String, h: EdfHeader, conf: Configuration = new Configuration()): Option[Array[Long]] = {
    val p = new Path(sidecarPath(path))
    try {
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val bytes = try {
        val size = fs.getFileStatus(p).getLen.toInt
        val b = new Array[Byte](size); in.readFully(0, b); b
      } finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(bytes, StandardCharsets.UTF_8))
      val n = node.get("nbDataRec").asInt(-1)
      val arr = node.get("onsetsUs")
      if (n != h.nbDataRec || arr == null || !arr.isArray || arr.size != h.nbDataRec) None
      else Some(Array.tabulate(arr.size)(arr.get(_).asLong))
    } catch { case _: Exception => None }
  }
}
