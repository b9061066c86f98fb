package graft.sources

import java.io.BufferedOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A14: the reference processor's output contract as a distributed sink.
  *
  * Writes, per channel: a binary file of float64 LE sample values
  * (reference base.py:265-294 `write_channel_data`) and a JSON metadata
  * manifest matching timeseries-channel.schema.json (name, start, end,
  * unit, rate, type, group, lastAnnotation, contiguousChunks, properties;
  * reference base.py:47-65).
  *
  * Scale shape: sample data is hash-partitioned by (channel, part) and
  * each task streams whole parts to their files (a part never splits
  * across tasks). Channel MANIFESTS are also assembled distributedly:
  * each channel's contiguous-chunk array is streamed to its manifest file
  * by the executor that owns the channel's chunk rows (a gap-heavy 100 TB
  * corpus can have millions of chunks per channel — they never visit the
  * driver), and the driver only stream-concatenates the finished
  * per-channel manifest files into `channels.json` (file-level I/O,
  * memory O(copy buffer)). The only driver-side plan state is the
  * (file, channel, part) name index — bounded by channels × parts,
  * independent of both sample and chunk volume. Single channels larger
  * than one task should own are range-partitioned on sample_idx into
  * numbered part files via `maxSamplesPerFile`.
  *
  * Cluster-safe output protocol: all I/O goes through the Hadoop
  * FileSystem API (the Hadoop conf is captured on the driver and rebuilt
  * executor-side, so object-store credentials/endpoints reach the tasks
  * and output lands in the shared filesystem, never a task-local disk).
  * Each task writes to a task-attempt temp directory under outDir and
  * commits each finished file by rename; if a speculative or retried
  * attempt already committed the same file, the loser detects the
  * existing destination and discards its temp file, so concurrent
  * attempts can never truncate or interleave a committed stream.
  */
object EdfSink {

  /** Gap boundary: delta-ts > 2x the sampling period (reference base.py:322-342). */
  private def chunkPlan(samples: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("file"), col("channel")).orderBy(col("sample_idx"))
    samples
      .select(col("file"), col("channel"), col("unit"), col("rate"), col("sample_idx"), col("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("gap_us", (lit(2e6) / col("rate")).cast("long"))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > col("gap_us"), 1L).otherwise(0L))
      .withColumn("chunk_id", sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("file"), col("channel"), col("unit"), col("rate"), col("chunk_id"))
      .agg(min(col("sample_idx")).as("start_index"), min(col("ts_us")).as("start_ts"),
        max(col("ts_us")).as("end_ts"), count(lit(1)).as("n"))
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  /** Binary file name for a (file, channel): the reference's
    * `<channel>.ts.bin` for single-file runs; prefixed with the source
    * file stem when several files share channel labels (the normal
    * session-split EDF case) so streams never interleave.
    */
  private def binName(file: String, channel: String, multiFile: Boolean): String = {
    val safe = channel.replaceAll("[^A-Za-z0-9._-]", "_")
    if (!multiFile) s"$safe.ts.bin"
    else {
      val stem = file.split("/").last.replaceAll("\\.edf$", "").replaceAll("[^A-Za-z0-9._-]", "_")
      s"${stem}__$safe.ts.bin"
    }
  }

  /** Distinct (file, channel) -> collision-free binary file name. Labels
    * that differ only in sanitized-away characters ('C3 A' vs 'C3:A')
    * would map to one name; such groups get a stable ordinal suffix.
    * Uniqueness is asserted before any data is written.
    */
  private def planNames(keys: Seq[(String, String)], multiFile: Boolean): Map[(String, String), String] = {
    val names = keys.groupBy(k => binName(k._1, k._2, multiFile)).flatMap {
      case (name, Seq(only)) => Seq(only -> name)
      case (name, clashed) =>
        clashed.sorted.zipWithIndex.map { case (k, i) =>
          k -> name.replaceAll("\\.ts\\.bin$", f"__c$i%02d.ts.bin")
        }
    }
    require(names.values.toSet.size == names.size,
      s"channel binary names not unique after disambiguation: ${names.values.toSeq.sorted}")
    names
  }

  /** Commit a finished temp file: first attempt to rename wins; a loser
    * (speculative/retried task that raced a committed copy) deletes its
    * temp file and moves on — both attempts wrote identical content
    * because a (file, channel) group is wholly owned by one partition.
    * An existing destination can ONLY be a racing attempt from this run:
    * write() pre-deletes every planned destination (and sweeps stale
    * task-attempt temp dirs) before any task starts, so a re-run into a
    * non-empty outDir can never silently keep a previous run's bytes.
    */
  private def commit(fs: FileSystem, tmp: Path, dest: Path): Unit = {
    if (!fs.rename(tmp, dest)) {
      if (fs.exists(dest)) fs.delete(tmp, false)
      else throw new java.io.IOException(s"rename $tmp -> $dest failed")
    }
  }

  /** Stream-append src's bytes onto an open stream, then delete src. */
  private def copyInto(fs: FileSystem, src: Path, out: java.io.OutputStream): Unit = {
    val in = fs.open(src)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    fs.delete(src, false)
  }

  /** Manifest file name for the i-th channel in (file, channel) order —
    * the round-1 contract: channel.json, channel-00001.json, …
    */
  private def manifestName(ord: Int): String =
    if (ord == 0) "channel.json" else f"channel-$ord%05d.json"

  /** Write the binary + manifest output for a sample DataFrame
    * (schema = EdfFile.sampleSchema). Returns the manifest path.
    *
    * `maxSamplesPerFile` bounds how much of one channel a single task
    * owns: channels larger than the bound are range-partitioned on
    * sample_idx into numbered part files (`<name>-part00001.ts.bin` …),
    * so a 30 M-sample reference chunk — or a 100 GB channel — writes with
    * full parallelism instead of through one task. Concatenating the
    * parts in order reproduces the single-file byte stream.
    */
  def write(samples: DataFrame, outDir: String,
            maxSamplesPerFile: Long = Long.MaxValue): String = {
    require(maxSamplesPerFile > 0, s"maxSamplesPerFile must be positive, got $maxSamplesPerFile")
    val spark = samples.sparkSession
    val confEntries = EdfFile.captureConfEntries(spark)
    val outPath = new Path(outDir)
    val driverFs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    driverFs.mkdirs(outPath)

    // channel-name plan from the parts that actually hold rows (integer
    // `div`, the same arithmetic executors use) — sample_idx need not
    // start at 0, and a planned-but-empty part must never reach the
    // manifest; bounded by files x channels x parts, never sample volume
    val partIdx = expr(s"sample_idx div ${maxSamplesPerFile}L")
    val chanParts = samples.select(col("file"), col("channel"), partIdx.as("part")).distinct()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).sorted.toSeq }
    val keys = chanParts.keys.toSeq.sorted
    val multiFile = keys.map(_._1).distinct.size > 1
    val baseNames = planNames(keys, multiFile)
    // (file, channel, part) -> final name; single-part channels keep the
    // reference's plain <channel>.ts.bin whatever their one part index is
    val nameMap: Map[(String, String, Long), String] = chanParts.flatMap { case (k, parts) =>
      parts.map { p =>
        val base = baseNames(k)
        (k._1, k._2, p) ->
          (if (parts.size == 1) base else base.replaceAll("\\.ts\\.bin$", f"-part$p%05d.ts.bin"))
      }
    }.toMap
    // part suffixes could in principle collide with a sibling channel's
    // sanitized name — uniqueness must hold over the FINAL names
    require(nameMap.values.toSet.size == nameMap.size,
      s"binary names not unique after part suffixing: ${nameMap.values.toSeq.sorted}")
    // pre-clean: planned destinations AND any other part layout of the
    // same base names from a previous run, old manifests, plus temp dirs
    // orphaned by killed executors (their finally blocks never ran)
    nameMap.values.foreach(n => driverFs.delete(new Path(outPath, n), false))
    baseNames.values.foreach { base =>
      driverFs.delete(new Path(outPath, base), false)
      driverFs.globStatus(new Path(outPath, base.replaceAll("\\.ts\\.bin$", "-part*.ts.bin")))
        .foreach(s => driverFs.delete(s.getPath, false))
    }
    driverFs.globStatus(new Path(outPath, "channel*.json"))
      .foreach(s => driverFs.delete(s.getPath, false))
    driverFs.globStatus(new Path(outPath, "_tmp-*"))
      .foreach(s => driverFs.delete(s.getPath, true))
    val bNames = spark.sparkContext.broadcast(nameMap)
    // (file, channel) -> (manifest ordinal, ordered binary part names)
    val manifestPlan: Map[(String, String), (Int, Seq[String])] =
      keys.zipWithIndex.map { case (k, i) =>
        k -> (i, chanParts(k).map(p => nameMap((k._1, k._2, p))))
      }.toMap
    val bManifest = spark.sparkContext.broadcast(manifestPlan)
    val outDirStr = outPath.toString

    // 1. distributed binary dump: streams keyed by (file, channel, part) —
    // a channel label repeated across input files never interleaves, and
    // oversized channels split into independently-written parts
    samples
      .select(col("file"), col("channel"),
        expr(s"sample_idx div ${maxSamplesPerFile}L").as("part_idx"),
        col("sample_idx"), col("value"))
      .repartition(col("file"), col("channel"), col("part_idx"))
      .sortWithinPartitions(col("file"), col("channel"), col("part_idx"), col("sample_idx"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val tc = TaskContext.get()
        val fs = new Path(outDirStr).getFileSystem(EdfFile.confFromEntries(confEntries))
        val attemptDir = new Path(outDirStr,
          s"_tmp-${tc.stageId()}-${tc.partitionId()}-attempt-${tc.taskAttemptId()}")
        var current: (String, String, Long) = null
        var tmp: Path = null
        var out: BufferedOutputStream = null
        val buf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        def closeAndCommit(): Unit = if (out != null) {
          out.close(); out = null
          commit(fs, tmp, new Path(outDirStr, bNames.value(current)))
        }
        try {
          rows.foreach { r =>
            val key = (r.getString(0), r.getString(1), r.getLong(2))
            if (key != current) {
              closeAndCommit()
              current = key
              tmp = new Path(attemptDir, bNames.value(key))
              out = new BufferedOutputStream(fs.create(tmp, true), 1 << 16)
            }
            buf.clear(); buf.putDouble(r.getDouble(4))
            out.write(buf.array())
          }
          closeAndCommit()
        } finally {
          if (out != null) out.close()
          fs.delete(attemptDir, true)
        }
      }

    // 2. distributed manifest assembly: every channel's chunk rows land
    // in one partition (hash on (file, channel)) pre-sorted by
    // start_index; the owning task streams the chunk array to a temp
    // file (never holding it in memory), then composes the final
    // manifest — header fields are only known once the stream ends — by
    // header + chunk-array copy + footer, and commits it by rename.
    chunkPlan(samples)
      .repartition(col("file"), col("channel"))
      .sortWithinPartitions(col("file"), col("channel"), col("start_index"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val tc = TaskContext.get()
        val fs = new Path(outDirStr).getFileSystem(EdfFile.confFromEntries(confEntries))
        val attemptDir = new Path(outDirStr,
          s"_tmp-m${tc.stageId()}-${tc.partitionId()}-attempt-${tc.taskAttemptId()}")
        var key: (String, String) = null
        var unit: String = null
        var rate: Double = 0.0
        var start = Long.MaxValue; var end = Long.MinValue
        var prevEnd = Long.MinValue; var nChunks = 0L; var nValues = 0L
        var chunkTmp: Path = null
        var chunkOut: BufferedOutputStream = null
        def finishChannel(): Unit = if (key != null) {
          chunkOut.write(']'.toInt); chunkOut.close(); chunkOut = null
          val (ord, partNames) = bManifest.value(key)
          val bins = partNames.map(jsonStr).mkString("[", ", ", "]")
          val head =
            s"""{"name": ${jsonStr(key._2)}, "start": $start, "end": $end, "unit": ${jsonStr(unit)},
               | "rate": $rate, "type": "CONTINUOUS", "group": "default", "lastAnnotation": 0,
               | "contiguousChunks": """.stripMargin
          val foot =
            s""",
               | "properties": [{"key": "binaryFile", "value": ${jsonStr(partNames.head)}},
               |                {"key": "binaryFiles", "value": $bins},
               |                {"key": "numValues", "value": "$nValues"}]}""".stripMargin
          val tmp = new Path(attemptDir, f"manifest-$ord%05d")
          val out = new BufferedOutputStream(fs.create(tmp, true), 1 << 16)
          out.write(head.getBytes(StandardCharsets.UTF_8))
          copyInto(fs, chunkTmp, out)
          out.write(foot.getBytes(StandardCharsets.UTF_8))
          out.close()
          commit(fs, tmp, new Path(outDirStr, manifestName(ord)))
          key = null
        }
        try {
          rows.foreach { r =>
            val k = (r.getString(0), r.getString(1))
            if (k != key) {
              finishChannel()
              key = k; unit = r.getString(2); rate = r.getDouble(3)
              start = Long.MaxValue; end = Long.MinValue; prevEnd = Long.MinValue
              nChunks = 0L; nValues = 0L
              chunkTmp = new Path(attemptDir, "chunks")
              chunkOut = new BufferedOutputStream(fs.create(chunkTmp, true), 1 << 16)
              chunkOut.write('['.toInt)
            }
            val startIdx = r.getLong(5); val startTs = r.getLong(6); val endTs = r.getLong(7)
            // non-overlap invariant (reference base.py:87-95)
            require(startTs > prevEnd, s"overlapping chunks in channel ${key._2}")
            prevEnd = endTs
            if (nChunks > 0) chunkOut.write(", ".getBytes(StandardCharsets.UTF_8))
            chunkOut.write(s"""{"index": $startIdx, "start": $startTs}"""
              .getBytes(StandardCharsets.UTF_8))
            nChunks += 1; nValues += r.getLong(8)
            if (startTs < start) start = startTs
            if (endTs > end) end = endTs
          }
          finishChannel()
        } finally {
          if (chunkOut != null) chunkOut.close()
          fs.delete(attemptDir, true)
        }
      }

    // 3. driver-side index: stream-concatenate the committed per-channel
    // manifests into channels.json — a bounded-buffer copy, never a
    // parse or a collect
    val idxPath = new Path(outPath, "channels.json")
    val idxOut = new BufferedOutputStream(driverFs.create(idxPath, true), 1 << 16)
    try {
      idxOut.write('['.toInt)
      keys.indices.foreach { i =>
        if (i > 0) idxOut.write(",\n".getBytes(StandardCharsets.UTF_8))
        val in = driverFs.open(new Path(outPath, manifestName(i)))
        try {
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n >= 0) { if (n > 0) idxOut.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
      }
      idxOut.write(']'.toInt)
    } finally idxOut.close()
    idxPath.toString
  }
}
