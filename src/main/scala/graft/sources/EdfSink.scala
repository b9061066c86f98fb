package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode}
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
  * Scale shape: sample data is hash-partitioned by channel and each task
  * streams whole channels to their files (a channel never splits across
  * tasks); only channel-level METADATA (one row per contiguous chunk) is
  * collected to the driver — bounded by channels x chunks, independent of
  * sample volume. For single channels larger than one task should own,
  * the natural extension is range-partitioning on (channel, sample_idx)
  * with numbered part files.
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

  /** Write the binary + manifest output for a sample DataFrame
    * (schema = EdfFile.sampleSchema). Returns the manifest path.
    */
  def write(samples: DataFrame, outDir: String): String = {
    Files.createDirectories(Paths.get(outDir))
    val multiFile = samples.select(col("file")).distinct().count() > 1

    // 1. distributed binary dump: streams keyed by (file, channel) — a
    // channel label repeated across input files never interleaves
    samples
      .select(col("file"), col("channel"), col("sample_idx"), col("value"))
      .repartition(col("file"), col("channel"))
      .sortWithinPartitions(col("file"), col("channel"), col("sample_idx"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        var current: (String, String) = null
        var out: BufferedOutputStream = null
        val buf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        try {
          rows.foreach { r =>
            val key = (r.getString(0), r.getString(1))
            if (key != current) {
              if (out != null) out.close()
              out = new BufferedOutputStream(
                new FileOutputStream(s"$outDir/${binName(key._1, key._2, multiFile)}"))
              current = key
            }
            buf.clear(); buf.putDouble(r.getDouble(3))
            out.write(buf.array())
          }
        } finally if (out != null) out.close()
      }

    // 2. channel manifests from chunk metadata (small, driver-side assembly)
    val chunks = chunkPlan(samples).collect()
      .groupBy(r => (r.getAs[String]("file"), r.getAs[String]("channel"),
        r.getAs[String]("unit"), r.getAs[Double]("rate")))
    val manifests = chunks.toSeq.sortBy(k => (k._1._1, k._1._2)).map { case ((_, name, unit, rate), rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("start_index"))
      // non-overlap invariant (reference base.py:87-95)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          require(b.getAs[Long]("start_ts") > a.getAs[Long]("end_ts"),
            s"overlapping chunks in channel $name")
        case _ =>
      }
      val chunkJson = sorted.map { r =>
        s"""{"index": ${r.getAs[Long]("start_index")}, "start": ${r.getAs[Long]("start_ts")}}"""
      }.mkString("[", ", ", "]")
      val start = sorted.map(_.getAs[Long]("start_ts")).min
      val end = sorted.map(_.getAs[Long]("end_ts")).max
      s"""{"name": ${jsonStr(name)}, "start": $start, "end": $end, "unit": ${jsonStr(unit)},
         | "rate": $rate, "type": "CONTINUOUS", "group": "default", "lastAnnotation": 0,
         | "contiguousChunks": $chunkJson, "properties": []}""".stripMargin
    }
    manifests.zipWithIndex.foreach { case (m, i) =>
      val suffix = if (i > 0) f"-$i%05d" else ""
      Files.write(Paths.get(s"$outDir/channel$suffix.json"), m.getBytes(StandardCharsets.UTF_8))
    }
    val all = manifests.mkString("[", ",\n", "]")
    val path = s"$outDir/channels.json"
    Files.write(Paths.get(path), all.getBytes(StandardCharsets.UTF_8))
    path
  }
}
