package graft.sources

import java.io.BufferedOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  * APPEND MODE (reference base.py:146-221 `get_or_create_channel` /
  * `_get_platform_channel`): `mode = "append"` fuzzy-matches incoming
  * channels against the destination's existing manifests — lowercase-
  * trimmed name equality, same type, rate within 2 % (`abs(1 - r/r') <
  * 0.02`), first match in manifest order wins. Matched channels APPEND:
  * new samples land in new generation part files listed after the
  * existing binaries (object stores have no byte-append — the reference's
  * `open(file,'ab')` becomes "add a part and extend `binaryFiles`";
  * concatenating the listed files in order reproduces the reference's
  * appended byte stream), chunk indices continue the channel's value
  * stream (offset by the existing `numValues`), and the merged manifest
  * keeps the existing chunks followed by the new ones (non-overlap
  * asserted: appended data must start after the channel's existing end,
  * reference base.py:87-95). Unmatched incoming channels are created new,
  * and untouched existing channels pass through with their manifests and
  * binaries intact — like the reference, append never rewrites committed
  * sample bytes.
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

  /** Gap boundary: delta-ts > 2x the sampling period (reference
    * base.py:322-342). Detection is FUSED into the binary dump pass (see
    * `write` step 1): the dump's shuffle already delivers every
    * (file, channel, part) stream to one task sorted by sample_idx, so
    * the task detects boundaries between consecutive rows for free while
    * streaming values to the binary file, and emits one SEGMENT row per
    * contiguous run it saw. No second pass over sample volume exists —
    * the old design's sample-volume lag self-join re-derived ordering
    * the dump's sort had already established (the probe-measured 5 MiB/s
    * sink floor).
    *
    * Segment rows are chunk-cardinality, never sample-cardinality:
    * (ord, start_index, start_ts, end_ts, n, is_new, gap_before).
    * `gap_before` = false marks a part's FIRST segment, whose
    * continuity with the previous part is unknown to the writing task;
    * the manifest assembly (which receives each channel's segments
    * sorted by start_index) merges such a segment into its predecessor
    * when the seam shows no gap. Chunk stats (end_ts, n) come from the
    * rows actually streamed, so filtered/non-dense sample_idx input
    * yields self-consistent manifests — a missing index is a chunk
    * boundary only if it leaves a real time gap.
    */
  private val segSchema = StructType(Seq(
    StructField("ord", IntegerType, nullable = false),
    StructField("start_index", LongType, nullable = false),
    StructField("start_ts", LongType, nullable = false),
    StructField("end_ts", LongType, nullable = true),
    StructField("n", LongType, nullable = true),
    StructField("is_new", BooleanType, nullable = false),
    StructField("gap_before", BooleanType, nullable = false)))

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

  /** Manifest file name for the i-th output channel — the round-1
    * contract: channel.json, channel-00001.json, …
    */
  private def manifestName(ord: Int): String =
    if (ord == 0) "channel.json" else f"channel-$ord%05d.json"

  /** One output channel's write plan, broadcast to the manifest tasks. */
  private case class ChannelPlan(
      ord: Int,
      name: String,
      unit: String,
      rate: Double,
      chanType: String,
      binaryFiles: Seq[String],  // existing parts first, then new, concat order
      exNumValues: Long,         // 0 for new channels
      exStart: Option[Long],
      exEnd: Option[Long],
      appendTag: Option[String]) // replay provenance, committed WITH the manifest

  /** An existing channel parsed (driver-side, chunk-free) from its
    * committed manifest file.
    */
  private case class ExistingChannel(
      ord: Int,
      name: String,
      unit: String,
      rate: Double,
      chanType: String,
      start: Long,
      end: Long,
      binaryFiles: Seq[String],
      numValues: Option[Long],
      appendTag: Option[String] = None)

  private val descSchema = StructType(Seq(
    StructField("name", StringType), StructField("start", LongType),
    StructField("end", LongType), StructField("unit", StringType),
    StructField("rate", DoubleType), StructField("type", StringType),
    StructField("properties", ArrayType(StructType(Seq(
      StructField("key", StringType), StructField("value", StringType)))))))

  private val chunkArraySchema = StructType(Seq(
    StructField("contiguousChunks", ArrayType(StructType(Seq(
      StructField("index", LongType), StructField("start", LongType)))))))

  /** Parse the destination's committed manifests (ordinal order) WITHOUT
    * their chunk arrays — driver state stays channel-cardinality however
    * chunk-heavy the history is. Returns Nil when the directory has no
    * prior run.
    */
  private def readExisting(spark: SparkSession, fs: FileSystem, outPath: Path): Seq[ExistingChannel] = {
    val paths = Iterator.from(0).map(i => new Path(outPath, manifestName(i)))
      .takeWhile(fs.exists).toSeq
    if (paths.isEmpty) return Nil
    val rows = spark.read.schema(descSchema).option("multiLine", true)
      .json(paths.map(_.toString): _*)
      .withColumn("src", input_file_name())
      .collect()
    val byFile = rows.map(r => r.getAs[String]("src").split("/").last -> r).toMap
    paths.zipWithIndex.map { case (p, i) =>
      val r = byFile.getOrElse(p.getName,
        throw new IllegalStateException(s"manifest ${p.getName} unreadable"))
      val props = Option(r.getAs[Seq[org.apache.spark.sql.Row]]("properties")).getOrElse(Seq.empty)
        .map(pr => pr.getAs[String]("key") -> pr.getAs[String]("value")).toMap
      // "binaryFiles" is a JSON array rendered into a string property
      val bins = props.get("binaryFiles")
        .map(_.stripPrefix("[").stripSuffix("]").split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq)
        .orElse(props.get("binaryFile").map(Seq(_)))
        .getOrElse(Seq.empty)
      ExistingChannel(i, r.getAs[String]("name"), r.getAs[String]("unit"),
        r.getAs[Double]("rate"), Option(r.getAs[String]("type")).getOrElse("CONTINUOUS"),
        r.getAs[Long]("start"), r.getAs[Long]("end"), bins,
        props.get("numValues").map(_.toLong),
        props.get("appendTag"))
    }
  }

  /** The reference's fuzzy channel-match rule (base.py:186-200): name
    * equal after lowercase+trim, same type, rate within 2 %; first
    * manifest-order match wins.
    */
  private def matchExisting(existing: Seq[ExistingChannel], channel: String, rate: Double,
                            chanType: String): Option[ExistingChannel] =
    existing.find(ex =>
      ex.name.toLowerCase.trim == channel.toLowerCase.trim &&
        ex.chanType.toLowerCase.trim == chanType.toLowerCase.trim &&
        math.abs(1.0 - rate / ex.rate) < 0.02)

  /** Write the binary + manifest output for a sample DataFrame
    * (schema = EdfFile.sampleSchema). Returns the manifest path.
    *
    * Chunk stats (start/end ts, counts) are derived from the rows
    * actually streamed, so FILTERED input (artifact-removed samples,
    * value-thresholded slices — sample_idx with mid-stream holes) yields
    * self-consistent manifests: a missing index opens a new chunk only
    * when it leaves a time gap > 2 sampling periods, exactly the
    * reference's gap rule over the surviving samples.
    *
    * `maxSamplesPerFile` bounds how much of one channel a single task
    * owns: channels larger than the bound are range-partitioned on
    * sample_idx into numbered part files (`<name>-part00001.ts.bin` …),
    * so a 30 M-sample reference chunk — or a 100 GB channel — writes with
    * full parallelism instead of through one task. Concatenating the
    * parts in order reproduces the single-file byte stream.
    *
    * `mode` is "overwrite" (default; destination pre-cleaned) or
    * "append" (reference append mode, see object doc).
    */

  /** The record-packed sorted dump relation for a routed projection
    * (`_bin_id int, sample_idx long, ts_us long, value double`):
    * map-side PACK into per-bin blocks of up to [[PackBlock]] samples,
    * then ONE hash exchange + block-cardinality sort on
    * (bin, first_idx). Factored out of [[write]] so the stage probes
    * can time the exact physical plan the sink executes.
    */
  private[graft] val PackBlock = 4096
  private[graft] val MaxOpenBins = 256 // bound pack memory on very wide inputs
  private[graft] val packSchema = StructType(Seq(
    StructField("_bin_id", IntegerType, nullable = false),
    StructField("first_idx", LongType, nullable = false),
    StructField("idxs", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("tss", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("vals", ArrayType(DoubleType, containsNull = false), nullable = false)))
  /** Map-side pack only (no exchange) — the block relation pre-shuffle.
    *
    * Input is the RAW sample projection `(file string, channel string,
    * sample_idx long, ts_us long, value double)`; the (file, channel,
    * part) → bin-id routing happens HERE, inside the pack loop, instead
    * of a per-sample broadcast hash join: the r16 stage probe measured
    * the join + re-projection at ~10 s of the 4 GiB fixture's ~22 s
    * drain — hashing two strings and copying them through an
    * UnsafeProjection once per SAMPLE. Consecutive samples almost always
    * share their key (the EDF reader emits per-(record, channel) runs),
    * so the pack caches the last key and resolves it with two memcmps +
    * one floorDiv per row, falling back to the broadcast map only on
    * run boundaries. A key miss is still the loud routing error.
    */
  private[graft] def packedBlocks(projected: DataFrame,
      keyToId: org.apache.spark.broadcast.Broadcast[Map[(String, String, Long), Int]],
      maxSamplesPerFile: Long): DataFrame = {
    val spark = projected.sparkSession
    val packedRdd = projected.queryExecution.toRdd.mapPartitions { it =>
        import org.apache.spark.sql.catalyst.InternalRow
        import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
        final class PackBuf {
          val idx = new Array[Long](PackBlock)
          val ts = new Array[Long](PackBlock)
          val value = new Array[Double](PackBlock)
          var n = 0
        }
        val open = new java.util.HashMap[Integer, PackBuf]()
        val routes = keyToId.value
        // run cache: last (file, channel, part) -> bin id
        var lastFile: org.apache.spark.unsafe.types.UTF8String = null
        var lastChan: org.apache.spark.unsafe.types.UTF8String = null
        var lastPart = Long.MinValue
        var lastId = -1
        def resolve(f: org.apache.spark.unsafe.types.UTF8String,
                    c: org.apache.spark.unsafe.types.UTF8String, part: Long): Int = {
          if (part == lastPart && lastFile != null && f.equals(lastFile) && c.equals(lastChan))
            return lastId
          val id = routes.getOrElse((f.toString, c.toString, part),
            throw new IllegalStateException(
              "sample matched no planned (file, channel, part) bin — routing plan incomplete"))
          // clone: the UTF8Strings point into the scan's reused row buffer
          lastFile = f.clone(); lastChan = c.clone(); lastPart = part; lastId = id
          id
        }
        def emit(id: Int, b: PackBuf): InternalRow = {
          val n = b.n
          // ascending check; a non-EDF-ordered arrival sorts its block
          var sorted = true; var dense = true
          var i = 1
          while (i < n && (sorted || dense)) {
            val d = b.idx(i) - b.idx(i - 1)
            if (d < 0) { sorted = false; dense = false }
            else if (d != 1) dense = false
            i += 1
          }
          var (idxA, tsA, valA) =
            (java.util.Arrays.copyOf(b.idx, n), java.util.Arrays.copyOf(b.ts, n),
              java.util.Arrays.copyOf(b.value, n))
          if (!sorted) {
            val perm = Array.range(0, n).sortBy(idxA(_))
            val (i2, t2, v2) = (new Array[Long](n), new Array[Long](n), new Array[Double](n))
            var k = 0
            while (k < n) { i2(k) = idxA(perm(k)); t2(k) = tsA(perm(k)); v2(k) = valA(perm(k)); k += 1 }
            idxA = i2; tsA = t2; valA = v2
            dense = { var ok = true; var j = 1
              while (ok && j < n) { ok = idxA(j) - idxA(j - 1) == 1; j += 1 }; ok }
          }
          val row = new GenericInternalRow(5)
          row.setInt(0, id)
          row.setLong(1, idxA(0))
          row.update(2, if (dense) null else UnsafeArrayData.fromPrimitiveArray(idxA))
          row.update(3, UnsafeArrayData.fromPrimitiveArray(tsA))
          row.update(4, UnsafeArrayData.fromPrimitiveArray(valA))
          b.n = 0
          row
        }
        new Iterator[InternalRow] {
          private val out = new scala.collection.mutable.ArrayDeque[InternalRow](4)
          private var drained = false
          private def pump(): Unit = {
            while (out.isEmpty && it.hasNext) {
              val r = it.next()
              val sampleIdx = r.getLong(2)
              val id = resolve(r.getUTF8String(0), r.getUTF8String(1),
                Math.floorDiv(sampleIdx, maxSamplesPerFile))
              var b = open.get(id)
              if (b == null) {
                if (open.size >= MaxOpenBins) {
                  // flush the fullest open block to bound memory at
                  // (MaxOpenBins x PackBlock x 24 B) on very wide inputs
                  var maxK: Integer = null; var maxN = -1
                  val e = open.entrySet().iterator()
                  while (e.hasNext) {
                    val en = e.next()
                    if (en.getValue.n > maxN) { maxN = en.getValue.n; maxK = en.getKey }
                  }
                  out.append(emit(maxK, open.remove(maxK)))
                }
                b = new PackBuf(); open.put(id, b)
              }
              b.idx(b.n) = sampleIdx; b.ts(b.n) = r.getLong(3); b.value(b.n) = r.getDouble(4)
              b.n += 1
              if (b.n == PackBlock) { open.remove(id); out.append(emit(id, b)) }
            }
            if (out.isEmpty && !drained && !it.hasNext) {
              drained = true
              val e = open.entrySet().iterator()
              while (e.hasNext) { val en = e.next(); out.append(emit(en.getKey, en.getValue)) }
              open.clear()
            }
          }
          override def hasNext: Boolean = { if (out.isEmpty) pump(); out.nonEmpty }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            out.removeHead()
          }
        }
      }
    org.apache.spark.sql.graft.DatasetShim
      .internalCreateDataFrame(spark, packedRdd, packSchema)
  }

  /** Packed blocks + the exchange: hash repartition on the bin and a
    * BLOCK-cardinality sort on (bin, first_idx). Plain repartition +
    * AQE: the r15 per-sample A/Bs (explicit counts, radix-packed keys)
    * are moot at block cardinality — the sort is thousands of rows, not
    * hundreds of millions. maxSamplesPerFile remains the lever that
    * bounds per-task work: parts cap how much of one channel a single
    * reduce task owns.
    */
  private[graft] def packedDump(projected: DataFrame,
      keyToId: org.apache.spark.broadcast.Broadcast[Map[(String, String, Long), Int]],
      maxSamplesPerFile: Long): DataFrame =
    packedBlocks(projected, keyToId, maxSamplesPerFile)
      .repartition(col("_bin_id"))
      .sortWithinPartitions(col("_bin_id"), col("first_idx"))

  def write(samples: DataFrame, outDir: String,
            maxSamplesPerFile: Long = Long.MaxValue,
            mode: String = "overwrite",
            replayTag: Option[String] = None): String = {
    require(maxSamplesPerFile > 0, s"maxSamplesPerFile must be positive, got $maxSamplesPerFile")
    require(mode == "overwrite" || mode == "append", s"mode must be overwrite|append, got $mode")
    require(replayTag.isEmpty || mode == "append", "replayTag only applies to append mode")
    val spark = samples.sparkSession
    val confEntries = EdfFile.captureConfEntries(spark)
    val outPath = new Path(outDir)
    val driverFs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    driverFs.mkdirs(outPath)
    // dev-only phase timing (SPARK_GRAFT_SINK_DEBUG=1): one line per
    // sink phase so write-throughput work attributes cost to a stage
    // instead of guessing — zero overhead when unset
    val dbg = sys.env.get("SPARK_GRAFT_SINK_DEBUG").contains("1")
    var t0 = System.nanoTime()
    def phase(name: String): Unit = if (dbg) {
      val t1 = System.nanoTime()
      println(f"[sink-phase] $name ${(t1 - t0) / 1e9}%.3f s")
      t0 = t1
    }

    // recover manifests staged by a crashed append: a _prev copy with no
    // committed destination is the surviving original — restore it; with
    // a committed destination the crashed run had already merged — drop it
    driverFs.globStatus(new Path(outPath, "staged-manifest-*.json")).foreach { s =>
      val ord = s.getPath.getName.stripPrefix("staged-manifest-").stripSuffix(".json").toInt
      val dest = new Path(outPath, manifestName(ord))
      if (!driverFs.exists(dest)) driverFs.rename(s.getPath, dest)
      else driverFs.delete(s.getPath, false)
    }

    val existing: Seq[ExistingChannel] =
      if (mode == "append") readExisting(spark, driverFs, outPath) else Nil

    // channel plan from the parts that actually hold rows (FLOOR
    // division, the same Math.floorDiv the pack loop resolves with —
    // SQL's `div` truncates toward zero and would route a negative
    // sample_idx to a different part than the executors compute,
    // killing the job with a routing miss; review r16) — sample_idx
    // need not start at 0, and a planned-but-empty part must never
    // reach the manifest; bounded by files x channels x parts, never
    // sample volume.
    // Hand-rolled per-partition distinct with a last-run key cache
    // instead of a hash aggregate: the agg hashed two STRINGS per SAMPLE
    // (measured 7.4 s of the 4 GiB probe's 12 s — the same per-sample
    // string-keying disease the r16 pack routing removed), while
    // consecutive rows almost always share their (file, channel, part)
    // floorDiv as SQL: (a - pmod(a, n)) / n — pmod is always >= 0, so
    // the numerator is an exact non-positive-remainder multiple of n
    val partIdx =
      expr(s"(sample_idx - pmod(sample_idx, ${maxSamplesPerFile}L)) div ${maxSamplesPerFile}L")
    val chanInfo0All: Map[(String, String), (Seq[Long], Double, String)] = {
      val planRows = samples
        .select(col("file"), col("channel"), col("sample_idx"), col("rate"), col("unit"))
        .queryExecution.toRdd.mapPartitions { it =>
          val seen = new java.util.HashMap[(String, String, Long), (Double, String)]()
          var lastF: org.apache.spark.unsafe.types.UTF8String = null
          var lastC: org.apache.spark.unsafe.types.UTF8String = null
          var lastP = Long.MinValue
          while (it.hasNext) {
            val r = it.next()
            val p = Math.floorDiv(r.getLong(2), maxSamplesPerFile)
            val f = r.getUTF8String(0); val c = r.getUTF8String(1)
            if (p != lastP || lastF == null || !f.equals(lastF) || !c.equals(lastC)) {
              lastF = f.clone(); lastC = c.clone(); lastP = p
              val k = (lastF.toString, lastC.toString, p)
              if (!seen.containsKey(k)) seen.put(k, (r.getDouble(3), r.getUTF8String(4).toString))
            }
          }
          import scala.jdk.CollectionConverters._
          seen.asScala.iterator.map { case (k, v) => (k, v) }
        }.collect()
      // partition-local firsts merge keyed; `first(rate)` semantics kept
      // (any row's rate/unit — they are constant per channel by contract)
      planRows.groupBy { case ((f, c, _), _) => (f, c) }.map { case (k, rows) =>
        k -> (rows.map(_._1._3).distinct.sorted.toSeq, rows.head._2._1, rows.head._2._2)
      }
    }
    phase("plan_scan")
    val keysAll = chanInfo0All.keys.toSeq.sorted

    // append-mode match: incoming (file, channel) -> existing channel
    val matchedAll: Map[(String, String), ExistingChannel] = keysAll.flatMap { k =>
      matchExisting(existing, k._2, chanInfo0All(k)._2, "CONTINUOUS").map(k -> _)
    }.toMap

    // AT-LEAST-ONCE REPLAY (A13b's foreachBatch): a batch that fully
    // committed its sink write but crashed before the streaming
    // checkpoint commit is replayed with the SAME replayTag and the same
    // deterministic data. Each manifest merged by a tagged append
    // records the tag IN the manifest (committed atomically with the
    // merge by the same rename), so on replay a matched channel whose
    // manifest already carries this tag is provably done — skipped
    // wholesale: its rows drop from the plan, its committed generation
    // binaries and merged manifest stand untouched. Channels WITHOUT the
    // tag (a crash mid-manifest-assembly leaves a mix: the staged-
    // manifest recovery restores their originals) re-append normally —
    // no wedge, no double-append, no lost channels.
    val skipKeys: Set[(String, String)] = replayTag match {
      case Some(tag) => matchedAll.filter(_._2.appendTag.contains(tag)).keySet
      case None => Set.empty
    }
    if (skipKeys.nonEmpty && skipKeys.size == keysAll.size) {
      // whole batch already merged. channels.json can still be stale if
      // the committed run died between its last manifest commit and the
      // index concat — rebuild it from the committed manifests
      // (idempotent, channel-cardinality file I/O)
      val idxPath = new Path(outPath, "channels.json")
      concatIndex(driverFs, idxPath, existing.indices.map(o => new Path(outPath, manifestName(o))))
      return idxPath.toString
    }
    val samplesKept =
      if (skipKeys.isEmpty) samples
      else samples.filter(!skipKeys.map { case (f, c) =>
        col("file") === lit(f) && col("channel") === lit(c) }.reduce(_ || _))
    val chanInfo0 = chanInfo0All -- skipKeys
    val keys = keysAll.filterNot(skipKeys.contains)
    val matched = matchedAll -- skipKeys
    val multiFile = keys.map(_._1).distinct.size > 1
    matched.groupBy(_._2.ord).foreach { case (_, ms) =>
      require(ms.size == 1,
        s"append mode: ${ms.size} incoming channels match existing '${ms.head._2.name}' — " +
          s"append one session per channel at a time: ${ms.keys.toSeq.sorted}")
    }
    val newKeys = keys.filterNot(matched.contains)
    val baseNames = planNames(newKeys, multiFile)

    // sample_idx offset: appended samples continue the channel's value
    // stream at the existing numValues (manifest property; fallback =
    // committed binary sizes — channel-cardinality file stats)
    val offsets: Map[(String, String), Long] = matched.map { case (k, ex) =>
      k -> ex.numValues.getOrElse(
        ex.binaryFiles.map(b => driverFs.getFileStatus(new Path(outPath, b)).getLen / 8).sum)
    }

    // matched channels' incoming sample_idx is shifted to continue the
    // existing value stream — part indices and chunk indices both follow.
    // Built BEFORE part planning: the plan's part indices must use the
    // same shifted sample_idx basis the executors key on.
    val adjusted = if (offsets.isEmpty) samplesKept else {
      import spark.implicits._
      val offDf = offsets.toSeq.map { case ((f, c), o) => (f, c, o) }.toDF("file", "channel", "_off")
      samplesKept.join(broadcast(offDf), Seq("file", "channel"), "left")
        .withColumn("sample_idx", col("sample_idx") + coalesce(col("_off"), lit(0L)))
        .drop("_off")
    }
    // a nonzero append offset can move samples across a maxSamplesPerFile
    // boundary (and split one planned part into two), so matched channels'
    // part sets are re-derived from the shifted sample_idx; unmatched
    // channels have offset 0 and keep their first-pass parts
    val chanInfo: Map[(String, String), (Seq[Long], Double, String)] =
      if (offsets.isEmpty || maxSamplesPerFile == Long.MaxValue) chanInfo0
      else {
        import spark.implicits._
        val matchedKeys = offsets.keys.toSeq.toDF("file", "channel")
        val shiftedParts = adjusted.join(broadcast(matchedKeys), Seq("file", "channel"))
          .select(col("file"), col("channel"), partIdx.as("part"))
          .distinct().collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
          .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).sorted.toSeq }
        chanInfo0.map { case (k, (parts, rate, unit)) =>
          k -> (shiftedParts.getOrElse(k, parts), rate, unit)
        }
      }

    // (file, channel, part) -> final binary name. New channels follow the
    // overwrite naming; matched channels continue as generation part
    // files after the existing binaries (never overwriting them).
    val nameMap: Map[(String, String, Long), String] = keys.flatMap { k =>
      val parts = chanInfo(k)._1
      matched.get(k) match {
        case Some(ex) =>
          val base = ex.binaryFiles.headOption.getOrElse(binName(k._1, k._2, multiFile = false))
            .replaceAll("(-g\\d{2})?(-part\\d{5})?\\.ts\\.bin$", ".ts.bin")
          val gen = ex.binaryFiles.size
          parts.zipWithIndex.map { case (p, i) =>
            (k._1, k._2, p) -> base.replaceAll("\\.ts\\.bin$", f"-g$gen%02d-part$i%05d.ts.bin")
          }
        case None =>
          val base = baseNames(k)
          parts.map { p =>
            (k._1, k._2, p) ->
              (if (parts.size == 1) base else base.replaceAll("\\.ts\\.bin$", f"-part$p%05d.ts.bin"))
          }
      }
    }.toMap
    // part suffixes could in principle collide with a sibling channel's
    // sanitized name — uniqueness must hold over the FINAL names, and in
    // append mode new names must also miss every committed binary
    require(nameMap.values.toSet.size == nameMap.size,
      s"binary names not unique after part suffixing: ${nameMap.values.toSeq.sorted}")
    val committedBins = existing.flatMap(_.binaryFiles).toSet
    val clash = nameMap.values.toSeq.filter(committedBins.contains)
    require(clash.isEmpty, s"append mode: planned binaries collide with committed ones: $clash " +
      "(an unmatched incoming channel shares a sanitized name with an existing channel — rename it)")

    // pre-clean. Overwrite: planned destinations, any other part layout
    // of the same base names, old manifests, orphaned temp dirs. Append:
    // only this run's planned NEW files, REWRITTEN manifests (matched +
    // new ordinals), and temp dirs — committed binaries and untouched
    // manifests stay.
    nameMap.values.foreach(n => driverFs.delete(new Path(outPath, n), false))
    if (mode == "overwrite") {
      baseNames.values.foreach { base =>
        driverFs.delete(new Path(outPath, base), false)
        driverFs.globStatus(new Path(outPath, base.replaceAll("\\.ts\\.bin$", "-part*.ts.bin")))
          .foreach(s => driverFs.delete(s.getPath, false))
      }
      driverFs.globStatus(new Path(outPath, "channel*.json"))
        .foreach(s => driverFs.delete(s.getPath, false))
    }
    driverFs.globStatus(new Path(outPath, "_tmp-*"))
      .foreach(s => driverFs.delete(s.getPath, true))

    // output-channel plans: existing channels keep their ordinals (and,
    // if matched, extend binaryFiles / numValues); new channels append
    // after. Ordinals are the channels.json order.
    val newOrdBase = existing.size
    val plans: Seq[ChannelPlan] =
      existing.map { ex =>
        val hit = matched.find(_._2.ord == ex.ord).map(_._1)
        val newParts = hit.toSeq.flatMap(k => chanInfo(k)._1.map(p => nameMap((k._1, k._2, p))))
        ChannelPlan(ex.ord, ex.name, ex.unit, ex.rate, ex.chanType,
          ex.binaryFiles ++ newParts,
          hit.map(offsets).getOrElse(0L),
          Some(ex.start), Some(ex.end),
          if (hit.isDefined) replayTag else ex.appendTag)
      } ++ newKeys.zipWithIndex.map { case (k, i) =>
        ChannelPlan(newOrdBase + i, k._2, chanInfo(k)._3, chanInfo(k)._2, "CONTINUOUS",
          chanInfo(k)._1.map(p => nameMap((k._1, k._2, p))), 0L, None, None, replayTag)
      }
    // incoming key -> output ordinal (drives chunk routing)
    val keyOrd: Map[(String, String), Int] =
      matched.map { case (k, ex) => k -> ex.ord } ++
        newKeys.zipWithIndex.map { case (k, i) => k -> (newOrdBase + i) }

    val bPlans = spark.sparkContext.broadcast(plans.map(p => p.ord -> p).toMap)
    val outDirStr = outPath.toString

    // 1. distributed binary dump, FUSED with chunk-boundary detection:
    // streams keyed by (file, channel, part) — a channel label repeated
    // across input files never interleaves, and oversized channels split
    // into independently-written parts. Each task streams its sorted
    // bins to their binary files AND emits the contiguous-run SEGMENT
    // rows it observed (chunk-cardinality — segments never buffer in
    // memory, they yield lazily between writes). This is the sink's ONLY
    // pass over sample volume: one shuffle, no lag self-join, no second
    // source scan for chunk stats.
    //
    // RECORD-PACKED shuffle (r16; the r15-measured ceiling): per-sample
    // rows through the sorted exchange were the sink's bottleneck —
    // 134M (int, long, long, double) UnsafeRows cost ~40 B each to
    // shuffle and, worse, 134M comparisons to sort (and the r15 design's
    // per-sample broadcast routing join cost another ~10 s of string
    // hashing + re-projection on the 4 GiB probe). The map side now
    // PACKS samples into blocks of up to `PackBlock` per (bin) straight
    // off the scan — routing resolved inside the pack loop from a
    // broadcast key map with a last-run cache (see [[packedBlocks]]) —
    // so the sorted exchange moves ~256-4096x fewer rows (~16-24
    // B/sample of array payload instead of 40 B of row) and the
    // reduce-side sort is over block-cardinality keys. Dense sample_idx
    // runs (the unfiltered common case) drop their idx array entirely
    // (null = idx(i) == first_idx + i). Blocks are flushed sorted
    // (arrival order is already ascending for the EDF reader's output;
    // anything else sorts the 4096-bounded block at flush), so the
    // reduce side restores exact per-sample order by merging blocks
    // ordered on (bin, first_idx) — a heap merge that degenerates to
    // plain block streaming whenever consecutive blocks don't overlap,
    // which is always outside adversarially interleaved input.
    val binIds: Seq[((String, String, Long), Int)] = nameMap.keys.toSeq.sorted.zipWithIndex
    // bin id -> (binary name, output ordinal, gap threshold µs)
    val bBinMeta = spark.sparkContext.broadcast(
      binIds.map { case (k@(f, c, _), i) =>
        i -> ((nameMap(k), keyOrd((f, c)), (2e6 / chanInfo((f, c))._2).toLong))
      }.toMap)
    val bKeyToId = spark.sparkContext.broadcast(binIds.toMap)
    phase("plan_names")
    val dumpDf = packedDump(
      adjusted.select(col("file"), col("channel"), col("sample_idx"), col("ts_us"), col("value")),
      bKeyToId, maxSamplesPerFile)
    phase("dump_plan")
    // Reduce side: unpack blocks in (bin, first_idx) order, stream values
    // to the bin files through a 64 KiB little-endian buffer, and emit
    // the contiguous-run SEGMENT rows observed — identical bytes and
    // segments to the per-sample formulation, per-block instead.
    val segRows: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
      dumpDf.queryExecution.toRdd.mapPartitions { it0 =>
        val tc = TaskContext.get()
        // Binary SAMPLE bytes bypass the local ChecksumFileSystem layer
        // (same rationale as EdfFile.openSeekable, write side): Hadoop's
        // FSOutputSummer pushes every byte through 512-B checksum chunks
        // and writes a .crc sidecar — measurable drag at GB/s output
        // rates, and the read path already handles crc-less binaries.
        // Cluster filesystems (HDFS, object stores) are not
        // ChecksumFileSystems and pass through untouched. Manifests keep
        // the checksummed path (tiny, and append-mode re-READS them
        // through the checksum layer).
        val fs = new Path(outDirStr).getFileSystem(EdfFile.confFromEntries(confEntries)) match {
          case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
          case other => other
        }
        val attemptDir = new Path(outDirStr,
          s"_tmp-${tc.stageId()}-${tc.partitionId()}-attempt-${tc.taskAttemptId()}")
        // failure cleanup: the iterator below cannot use try/finally
        // around consumption (the downstream shuffle writer drives it)
        tc.addTaskCompletionListener[Unit] { _ =>
          try fs.delete(attemptDir, true) catch { case _: Exception => () }
        }
        // a block cursor mid-merge (overlapping blocks only)
        final class Cursor(val first: Long, val idxA: Array[Long],
                           val tsA: Array[Long], val valA: Array[Double]) {
          var pos = 0
          def curIdx: Long = if (idxA == null) first + pos else idxA(pos)
          def len: Int = valA.length
        }
        new Iterator[org.apache.spark.sql.Row] {
          private val meta = bBinMeta.value
          private val buf = ByteBuffer.allocate(1 << 16).order(ByteOrder.LITTLE_ENDIAN)
          private val pending = new scala.collection.mutable.ArrayDeque[org.apache.spark.sql.Row](4)
          private var current = -1
          private var ord = -1
          private var gapUs = 0L
          private var tmp: Path = null
          private var out: java.io.OutputStream = null
          private var segStartIdx = 0L; private var segStartTs = 0L
          private var segGapBefore = false; private var segN = 0L
          private var prevTs = 0L
          private var binFresh = false
          private var drained = false

          // one-block lookahead: the sort's output iterator REUSES its
          // UnsafeRow, so a peeked block materializes its arrays at once
          private var peeked = false
          private var nBin = -1; private var nFirst = 0L
          private var nIdx: Array[Long] = null
          private var nTs: Array[Long] = null
          private var nVal: Array[Double] = null
          private def peek(): Boolean = peeked || {
            if (it0.hasNext) {
              val r = it0.next()
              nBin = r.getInt(0); nFirst = r.getLong(1)
              nIdx = if (r.isNullAt(2)) null else r.getArray(2).toLongArray()
              nTs = r.getArray(3).toLongArray()
              nVal = r.getArray(4).toDoubleArray()
              peeked = true
            }
            peeked
          }
          private val heap = new java.util.PriorityQueue[Cursor](4,
            new java.util.Comparator[Cursor] {
              override def compare(a: Cursor, b: Cursor): Int =
                java.lang.Long.compare(a.curIdx, b.curIdx)
            })

          private def flushBuf(): Unit = if (buf.position() > 0) {
            out.write(buf.array(), 0, buf.position()); buf.clear()
          }
          private def emitSeg(): Unit = if (segN > 0) {
            pending.append(org.apache.spark.sql.Row(
              ord, segStartIdx, segStartTs, prevTs, segN, true, segGapBefore))
            segN = 0
          }
          private def closeBin(): Unit = if (out != null) {
            flushBuf(); out.close(); out = null
            commit(fs, tmp, new Path(outDirStr, meta(current)._1))
          }
          private def openBin(id: Int): Unit = {
            current = id
            val (nm, o, g) = meta(id)
            ord = o; gapUs = g
            tmp = new Path(attemptDir, nm)
            out = fs.create(tmp, true)
            binFresh = true
          }
          private def consume(idx: Long, ts: Long, v: Double): Unit = {
            if (binFresh) {
              segStartIdx = idx; segStartTs = ts; segGapBefore = false
              binFresh = false
            } else if (ts - prevTs > gapUs) {
              emitSeg()
              segStartIdx = idx; segStartTs = ts; segGapBefore = true
            }
            prevTs = ts
            segN += 1
            if (buf.remaining() < 8) flushBuf()
            buf.putDouble(v)
          }
          // heap merge for overlapping same-bin blocks: admits every
          // block whose first_idx precedes the frontier, so the emitted
          // sample order equals the old full sort's whatever the
          // cross-partition interleaving. RESUMABLE (one sample per
          // step-loop iteration, like the pre-packed per-row writer):
          // a merge group spanning a gap-heavy bin must hand its
          // segment rows to the consumer as they arise, never buffer
          // them for the whole group (review r16). Memory is bounded by
          // MaxMergeCursors open blocks — the packed path trades the
          // old spillable sort's tolerance of UNBOUNDED disorder for a
          // ~4M-sample interleaving window; input more disordered than
          // that is refused loudly with the remedy named.
          private val MaxMergeCursors = 1024
          private var merging = false
          private def mergeStep(): Unit = {
            while (pending.isEmpty && !heap.isEmpty) {
              while (peek() && nBin == current && nFirst <= heap.peek().curIdx) {
                if (heap.size() >= MaxMergeCursors)
                  throw new IllegalStateException(
                    s"packed sink merge window exceeded ($MaxMergeCursors overlapping blocks in one " +
                      "channel bin) — the input is pathologically disordered across partitions; " +
                      "sortWithinPartitions(file, channel, sample_idx) (or repartition by channel) " +
                      "before EdfSink.write")
                heap.add(new Cursor(nFirst, nIdx, nTs, nVal)); peeked = false
              }
              val c = heap.poll()
              consume(c.curIdx, c.tsA(c.pos), c.valA(c.pos))
              c.pos += 1
              if (c.pos < c.len) heap.add(c)
            }
            if (heap.isEmpty) merging = false
          }
          private def pump(): Unit = {
            while (pending.isEmpty && (merging || peek())) {
              if (merging) mergeStep()
              else {
                val (bin, first, idxA, tsA, valA) = (nBin, nFirst, nIdx, nTs, nVal)
                peeked = false
                if (bin != current) { emitSeg(); closeBin(); openBin(bin) }
                val n = valA.length
                val lastIdx = if (idxA == null) first + n - 1 else idxA(n - 1)
                if (peek() && nBin == bin && nFirst <= lastIdx) {
                  heap.add(new Cursor(first, idxA, tsA, valA))
                  merging = true
                } else {
                  var i = 0
                  if (idxA == null) {
                    while (i < n) { consume(first + i, tsA(i), valA(i)); i += 1 }
                  } else {
                    while (i < n) { consume(idxA(i), tsA(i), valA(i)); i += 1 }
                  }
                }
              }
            }
            if (pending.isEmpty && !drained) {
              drained = true
              emitSeg(); closeBin()
              fs.delete(attemptDir, true)
            }
          }
          override def hasNext: Boolean = { if (pending.isEmpty) pump(); pending.nonEmpty }
          override def next(): org.apache.spark.sql.Row = {
            if (!hasNext) throw new NoSuchElementException
            pending.removeHead()
          }
        }
      }

    // 2. distributed manifest assembly: every output channel's segment
    // rows land in one partition (hash on ordinal) pre-sorted by
    // start_index; the owning task MERGES part-seam segments (a part's
    // first segment with no time gap to its predecessor continues the
    // predecessor's chunk), streams the chunk array to a temp file
    // (never holding it in memory), then composes the final manifest —
    // header fields are only known once the stream ends — by header +
    // chunk-array copy + footer, and commits it by rename. Because the
    // segments are the dump's map-side output, this stage is the reduce
    // side of the dump's own shuffle: the whole sink is ONE job, one
    // pass over sample volume. In append mode the matched channels'
    // EXISTING chunks are parsed from their old manifest files
    // executor-side and unioned in front of the new ones (their indices
    // are value-stream positions, always below the appended offset, so
    // the index sort interleaves correctly).
    val rewriteOrds: Set[Int] =
      if (mode == "overwrite") plans.map(_.ord).toSet
      else (matched.values.map(_.ord) ++ newKeys.map(keyOrd)).toSet
    // stage matched channels' manifests out of the way (driver rename):
    // the assembly reads their chunk arrays from the _prev copies while
    // the merged manifests commit to the now-free destinations — immune
    // to stage retries re-reading a half-overwritten file, and
    // recoverable (see the _prev sweep above) if this run dies mid-way
    def prevName(o: Int): String = f"staged-manifest-$o%05d.json"
    val matchedOrds = matched.values.map(_.ord).toSeq.sorted
    matchedOrds.foreach { o =>
      val dest = new Path(outPath, prevName(o))
      driverFs.delete(dest, false)
      require(driverFs.rename(new Path(outPath, manifestName(o)), dest),
        s"failed to stage existing manifest ${manifestName(o)}")
    }
    // a NEW ordinal's destination can only hold stale output from a
    // crashed run beyond the contiguous manifest sequence — pre-clean it
    // so the executor-side commit rename can't silently lose to it
    if (mode == "append")
      newKeys.foreach(k => driverFs.delete(new Path(outPath, manifestName(keyOrd(k))), false))
    val newChunks = spark.createDataFrame(segRows, segSchema)
    val exChunks: Option[DataFrame] = {
      if (matchedOrds.isEmpty) None
      else {
        val paths = matchedOrds.map(o => new Path(outPath, prevName(o)).toString)
        val byName = matchedOrds.map(o => prevName(o) -> o).toMap
        val nameToOrd = typedLit(byName)
        Some(spark.read.schema(chunkArraySchema).option("multiLine", true).json(paths: _*)
          .withColumn("ord", element_at(nameToOrd,
            element_at(split(input_file_name(), "/"), -1)))
          .select(col("ord"), explode(col("contiguousChunks")).as("c"))
          .select(col("ord"), col("c.index").as("start_index"), col("c.start").as("start_ts"),
            lit(null).cast("long").as("end_ts"), lit(null).cast("long").as("n"),
            lit(false).as("is_new"), lit(true).as("gap_before")))
      }
    }
    val allChunks = exChunks.map(newChunks.unionByName(_)).getOrElse(newChunks)
    // incoming-rate gap thresholds per output ordinal, for part-seam
    // continuity checks in the assembly (channel-cardinality)
    val bOrdGap = spark.sparkContext.broadcast(
      keys.map(k => keyOrd(k) -> (2e6 / chanInfo(k)._2).toLong).toMap)

    phase("plan_build")
    allChunks
      .repartition(col("ord"))
      .sortWithinPartitions(col("ord"), col("start_index"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val tc = TaskContext.get()
        val fs = new Path(outDirStr).getFileSystem(EdfFile.confFromEntries(confEntries))
        val attemptDir = new Path(outDirStr,
          s"_tmp-m${tc.stageId()}-${tc.partitionId()}-attempt-${tc.taskAttemptId()}")
        var ord = -1
        var start = Long.MaxValue; var end = Long.MinValue
        var prevEnd = Long.MinValue; var nChunks = 0L; var newValues = 0L
        var gapUs = Long.MaxValue
        // chunk 'index' is the chunk's position within the STORED value
        // stream (reference base.py:336-342) — appendOffset + running sum
        // of emitted values. Identical to sample_idx for dense input;
        // reference-correct (and within the binary's bounds) for
        // filtered/non-dense input where sample_idx has holes.
        var storedPos = 0L
        // pending NEW chunk being extended across part seams
        var havePend = false
        var pendStartTs = 0L; var pendEndTs = 0L; var pendN = 0L
        var chunkTmp: Path = null
        var chunkOut: BufferedOutputStream = null
        def writeChunkEntry(idx: Long, startTs: Long): Unit = {
          if (nChunks > 0) chunkOut.write(", ".getBytes(StandardCharsets.UTF_8))
          chunkOut.write(s"""{"index": $idx, "start": $startTs}"""
            .getBytes(StandardCharsets.UTF_8))
          nChunks += 1
        }
        def flushPend(): Unit = if (havePend) {
          writeChunkEntry(storedPos, pendStartTs)
          storedPos += pendN
          newValues += pendN
          if (pendStartTs < start) start = pendStartTs
          if (pendEndTs > end) end = pendEndTs
          havePend = false
        }
        def finishChannel(): Unit = if (ord >= 0) {
          flushPend()
          chunkOut.write(']'.toInt); chunkOut.close(); chunkOut = null
          val plan = bPlans.value(ord)
          val bins = plan.binaryFiles.map(jsonStr).mkString("[", ", ", "]")
          val chStart = math.min(start, plan.exStart.getOrElse(Long.MaxValue))
          val chEnd = math.max(end, plan.exEnd.getOrElse(Long.MinValue))
          val nValues = plan.exNumValues + newValues
          val head =
            s"""{"name": ${jsonStr(plan.name)}, "start": $chStart, "end": $chEnd, "unit": ${jsonStr(plan.unit)},
               | "rate": ${plan.rate}, "type": "${plan.chanType}", "group": "default", "lastAnnotation": 0,
               | "contiguousChunks": """.stripMargin
          // the replay-provenance tag commits atomically WITH the merged
          // manifest (same rename): a replayed tagged append can prove
          // per channel whether this batch's merge already happened
          val tagProp = plan.appendTag
            .map(t => s""",\n               {"key": "appendTag", "value": ${jsonStr(t)}}""")
            .getOrElse("")
          val foot =
            s""",
               | "properties": [{"key": "binaryFile", "value": ${jsonStr(plan.binaryFiles.head)}},
               |                {"key": "binaryFiles", "value": $bins},
               |                {"key": "numValues", "value": "$nValues"}$tagProp]}""".stripMargin
          val tmp = new Path(attemptDir, f"manifest-$ord%05d")
          val out = new BufferedOutputStream(fs.create(tmp, true), 1 << 16)
          out.write(head.getBytes(StandardCharsets.UTF_8))
          copyInto(fs, chunkTmp, out)
          out.write(foot.getBytes(StandardCharsets.UTF_8))
          out.close()
          commit(fs, tmp, new Path(outDirStr, manifestName(ord)))
          ord = -1
        }
        try {
          rows.foreach { r =>
            val o = r.getInt(0)
            if (o != ord) {
              finishChannel()
              ord = o
              start = Long.MaxValue; end = Long.MinValue
              prevEnd = bPlans.value(ord).exEnd.getOrElse(Long.MinValue)
              gapUs = bOrdGap.value.getOrElse(ord, Long.MaxValue)
              nChunks = 0L; newValues = 0L
              storedPos = bPlans.value(ord).exNumValues
              chunkTmp = new Path(attemptDir, "chunks")
              chunkOut = new BufferedOutputStream(fs.create(chunkTmp, true), 1 << 16)
              chunkOut.write('['.toInt)
            }
            val startIdx = r.getLong(1); val startTs = r.getLong(2)
            val isNew = r.getBoolean(5)
            if (!isNew) {
              // existing chunks sort below the appended offset — emitted
              // verbatim, never merged with (pending is always empty here)
              flushPend()
              writeChunkEntry(startIdx, startTs)
            } else {
              val endTs = r.getLong(3)
              // non-overlap invariant (reference base.py:87-95): appended
              // chunks start strictly after everything already committed
              require(startTs > prevEnd,
                s"overlapping chunks in channel ${bPlans.value(ord).name}")
              prevEnd = endTs
              if (havePend && !r.getBoolean(6) && startTs - pendEndTs <= gapUs) {
                // part-seam continuation: the segment's part began with
                // no time gap to the previous part's tail — same chunk
                pendEndTs = endTs; pendN += r.getLong(4)
              } else {
                flushPend()
                havePend = true
                pendStartTs = startTs
                pendEndTs = endTs; pendN = r.getLong(4)
              }
            }
          }
          finishChannel()
        } finally {
          if (chunkOut != null) chunkOut.close()
          fs.delete(attemptDir, true)
        }
      }

    phase("main_job")
    // in append mode a matched-but-empty incoming channel can't occur
    // (chanInfo only lists channels holding rows), but an UNTOUCHED
    // existing channel writes no manifest above — its old file stands.
    require(rewriteOrds.forall(o => driverFs.exists(new Path(outPath, manifestName(o)))),
      "manifest assembly incomplete")
    matchedOrds.foreach(o => driverFs.delete(new Path(outPath, prevName(o)), false))

    // 3. driver-side index: stream-concatenate the committed per-channel
    // manifests into channels.json — a bounded-buffer copy, never a
    // parse or a collect
    val idxPath = new Path(outPath, "channels.json")
    concatIndex(driverFs, idxPath, plans.map(_.ord).sorted.map(o => new Path(outPath, manifestName(o))))
    phase("index")
    idxPath.toString
  }

  private def concatIndex(fs: FileSystem, idxPath: Path, parts: Seq[Path]): Unit = {
    val idxOut = new BufferedOutputStream(fs.create(idxPath, true), 1 << 16)
    try {
      idxOut.write('['.toInt)
      parts.zipWithIndex.foreach { case (p, i) =>
        if (i > 0) idxOut.write(",\n".getBytes(StandardCharsets.UTF_8))
        val in = fs.open(p)
        try {
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n >= 0) { if (n > 0) idxOut.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
      }
      idxOut.write(']'.toInt)
    } finally idxOut.close()
  }

  /** A8b sink: UNIT (spike) channel serialization in the reference's
    * spike contract (base.py:223-263 `write_spike_data`). Input columns:
    * `file, channel, ts_us (long), unit_id (int), waveform
    * (array<double>)` — [[graft.operators.TimeSeries.tsSpikeWaveforms]]
    * output reshapes to this with one `array(...)` select.
    *
    * Per (file, channel) binary layout, all little-endian:
    * {{{
    * waveform_offset int64   -- bytes of the spike-record region (9 * n)
    * num_spikes      int64
    * num_samples     int64   -- waveform samples per spike
    * spike records:  timestamp int64 + unit uint8, each
    * waveforms:      num_spikes x num_samples float64
    * }}}
    * One divergence, deliberate: the reference stacks waveforms by
    * PREPENDING (`np.vstack((spike.waveforms, wf))`, base.py:248-251),
    * which stores them in reverse spike order while the records are
    * forward — a latent bug nothing in the reference reads back. We
    * write waveforms in spike-record order.
    *
    * Scale shape mirrors the sample sink: one shuffle keyed by
    * (file, channel), each owning task streams records and waveforms to
    * two temp files (counts are only known at stream end — the header +
    * record + waveform compose happens at commit, nothing buffers in
    * memory), and writes the channel's UNIT manifest (type "UNIT",
    * start/end from first/last spike, reference base.py:253-261).
    * Manifests land as unit-channel[-NNNNN].json with a
    * channels_unit.json index, keeping the continuous and spike
    * namespaces disjoint in one outDir. Returns the index path.
    */
  def writeSpikes(spikes: DataFrame, outDir: String, mode: String = "overwrite"): String = {
    require(mode == "overwrite" || mode == "append", s"mode must be overwrite|append, got $mode")
    val spark = spikes.sparkSession
    val confEntries = EdfFile.captureConfEntries(spark)
    val outPath = new Path(outDir)
    val driverFs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    driverFs.mkdirs(outPath)

    // recover UNIT manifests staged by a crashed append (same protocol as
    // the sample sink): a staged copy with no committed destination is the
    // surviving original — restore it; with a committed destination the
    // crashed run already merged — drop it. Keeps the ordinal sequence
    // hole-free so the takeWhile scan below never silently drops channels.
    driverFs.globStatus(new Path(outPath, "staged-unit-manifest-*.json")).foreach { s =>
      val ord = s.getPath.getName.stripPrefix("staged-unit-manifest-").stripSuffix(".json").toInt
      val dest = new Path(outPath, unitManifestName(ord))
      if (!driverFs.exists(dest)) driverFs.rename(s.getPath, dest)
      else driverFs.delete(s.getPath, false)
    }

    // append mode (the reference's 'ab' open, base.py:258): existing UNIT
    // channels parsed chunk-free at channel cardinality; match is
    // name-only after lowercase+trim (UNIT channels carry no meaningful
    // rate for the 2 % rule). Unlike the sample sink there is no staged
    // read-back — manifests merge from these driver-side descriptors
    // plus the stream stats, so rewritten destinations just pre-clean.
    val existing: Seq[ExistingChannel] =
      if (mode == "append") {
        val paths = Iterator.from(0).map(i => new Path(outPath, unitManifestName(i)))
          .takeWhile(driverFs.exists).toSeq
        if (paths.isEmpty) Nil
        else {
          val rows = spark.read.schema(descSchema).option("multiLine", true)
            .json(paths.map(_.toString): _*)
            .withColumn("src", input_file_name()).collect()
          val byFile = rows.map(r => r.getAs[String]("src").split("/").last -> r).toMap
          paths.zipWithIndex.map { case (pth, i) =>
            val r = byFile(pth.getName)
            val props = Option(r.getAs[Seq[org.apache.spark.sql.Row]]("properties")).getOrElse(Seq.empty)
              .map(pr => pr.getAs[String]("key") -> pr.getAs[String]("value")).toMap
            val bins = props.get("binaryFiles")
              .map(_.stripPrefix("[").stripSuffix("]").split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq)
              .orElse(props.get("binaryFile").map(Seq(_)))
              .getOrElse(Seq.empty)
            ExistingChannel(i, r.getAs[String]("name"), r.getAs[String]("unit"),
              0.0, "UNIT", r.getAs[Long]("start"), r.getAs[Long]("end"), bins,
              props.get("numSpikes").map(_.toLong))
          }
        }
      } else Nil

    val keys = spikes.select(col("file"), col("channel")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    val multiFile = keys.map(_._1).distinct.size > 1
    val matched: Map[(String, String), ExistingChannel] = keys.flatMap { k =>
      existing.find(_.name.toLowerCase.trim == k._2.toLowerCase.trim).map(k -> _)
    }.toMap
    matched.groupBy(_._2.ord).foreach { case (_, ms) =>
      require(ms.size == 1,
        s"append mode: ${ms.size} incoming spike channels match existing '${ms.head._2.name}': " +
          ms.keys.toSeq.sorted.toString)
    }
    val newKeys = keys.filterNot(matched.contains)
    val names: Map[(String, String), String] =
      planNames(newKeys, multiFile)
        .map { case (k, n) => k -> n.replaceAll("\\.ts\\.bin$", ".spikes.bin") } ++
      matched.map { case (k, ex) =>
        val base = ex.binaryFiles.headOption.getOrElse("unnamed.spikes.bin")
          .replaceAll("(-g\\d{2})?\\.spikes\\.bin$", ".spikes.bin")
        k -> base.replaceAll("\\.spikes\\.bin$", f"-g${ex.binaryFiles.size}%02d.spikes.bin")
      }
    val committed = existing.flatMap(_.binaryFiles).toSet
    val clash = names.values.toSeq.filter(committed.contains)
    require(clash.isEmpty, s"append mode: planned spike binaries collide with committed: $clash")
    val newOrdBase = existing.size
    val ords: Map[(String, String), Int] =
      matched.map { case (k, ex) => k -> ex.ord } ++
        newKeys.zipWithIndex.map { case (k, i) => k -> (newOrdBase + i) }
    // (ord, existing bins, exNumSpikes, exStart, exEnd) for the writer
    val plans: Map[(String, String), (Seq[String], Long, Long, Long)] = keys.map { k =>
      matched.get(k) match {
        case Some(ex) => k -> (ex.binaryFiles, ex.numValues.getOrElse(0L), ex.start, ex.end)
        case None     => k -> (Seq.empty[String], 0L, Long.MaxValue, Long.MinValue)
      }
    }.toMap

    names.values.foreach(n => driverFs.delete(new Path(outPath, n), false))
    def stagedUnitName(o: Int): String = f"staged-unit-manifest-$o%05d.json"
    val matchedUnitOrds = matched.values.map(_.ord).toSeq.sorted
    if (mode == "overwrite")
      driverFs.globStatus(new Path(outPath, "unit-channel*.json"))
        .foreach(s => driverFs.delete(s.getPath, false))
    else {
      // stage matched manifests out of the way (recoverable, see the
      // sweep above) instead of pre-deleting: a crash between here and
      // the executor-side manifest commit must not leave a hole in the
      // unit-channel-NNNNN.json sequence
      matchedUnitOrds.foreach { o =>
        val dest = new Path(outPath, stagedUnitName(o))
        driverFs.delete(dest, false)
        require(driverFs.rename(new Path(outPath, unitManifestName(o)), dest),
          s"failed to stage existing manifest ${unitManifestName(o)}")
      }
      // new ordinals can only hold stale output from a crashed run beyond
      // the contiguous sequence — pre-clean so commit renames can't lose
      newKeys.foreach(k => driverFs.delete(new Path(outPath, unitManifestName(ords(k))), false))
    }
    driverFs.globStatus(new Path(outPath, "_tmp-s*"))
      .foreach(s => driverFs.delete(s.getPath, true))
    val bNames = spark.sparkContext.broadcast(names)
    val bOrds = spark.sparkContext.broadcast(ords)
    val bPlans = spark.sparkContext.broadcast(plans)
    val outDirStr = outPath.toString

    spikes
      .select(col("file"), col("channel"), col("ts_us"), col("unit_id"), col("waveform"))
      .repartition(col("file"), col("channel"))
      .sortWithinPartitions(col("file"), col("channel"), col("ts_us"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val tc = TaskContext.get()
        // spike waveform volume takes the same raw-FS write path as the
        // sample binaries (see the sample writer's rationale); the tiny
        // UNIT manifests ride along — pre-cleans all go through the
        // checksum-aware driver FS, so no stale .crc pair can survive
        val fs = new Path(outDirStr).getFileSystem(EdfFile.confFromEntries(confEntries)) match {
          case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
          case other => other
        }
        val attemptDir = new Path(outDirStr,
          s"_tmp-s${tc.stageId()}-${tc.partitionId()}-attempt-${tc.taskAttemptId()}")
        var key: (String, String) = null
        var recTmp: Path = null; var wfTmp: Path = null
        var recOut: BufferedOutputStream = null; var wfOut: BufferedOutputStream = null
        var nSpikes = 0L; var nSamples = -1L
        var firstTs = 0L; var lastTs = 0L
        val b8 = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        def putLong(out: java.io.OutputStream, v: Long): Unit = {
          b8.clear(); b8.putLong(v); out.write(b8.array())
        }
        def putDouble(out: java.io.OutputStream, v: Double): Unit = {
          b8.clear(); b8.putDouble(v); out.write(b8.array())
        }
        def finishChannel(): Unit = if (key != null) {
          recOut.close(); recOut = null
          wfOut.close(); wfOut = null
          val tmp = new Path(attemptDir, "composed")
          val out = new BufferedOutputStream(fs.create(tmp, true), 1 << 16)
          putLong(out, 9L * nSpikes)   // waveform_offset = len(spike record region)
          putLong(out, nSpikes)
          putLong(out, math.max(nSamples, 0L))
          copyInto(fs, recTmp, out)
          copyInto(fs, wfTmp, out)
          out.close()
          commit(fs, tmp, new Path(outDirStr, bNames.value(key)))
          // UNIT channel manifest (reference base.py:253-261: channel
          // start/end extend to the spike horizon; append merges the
          // existing descriptor and lists every generation binary)
          val ord = bOrds.value(key)
          val (exBins, exSpikes, exStart, exEnd) = bPlans.value(key)
          require(exBins.isEmpty || firstTs > exEnd,
            s"appended spikes must start after channel ${key._2}'s existing end")
          val allBins = exBins :+ bNames.value(key)
          val binsJson = allBins.map(jsonStr).mkString("[", ", ", "]")
          val chStart = math.min(firstTs, exStart)
          val chEnd = math.max(lastTs, exEnd)
          val manifest =
            s"""{"name": ${jsonStr(key._2)}, "start": $chStart, "end": $chEnd, "unit": "uV",
               | "rate": 0.0, "type": "UNIT", "group": "default", "lastAnnotation": 0,
               | "contiguousChunks": [],
               | "properties": [{"key": "binaryFile", "value": ${jsonStr(allBins.head)}},
               |                {"key": "binaryFiles", "value": $binsJson},
               |                {"key": "numSpikes", "value": "${exSpikes + nSpikes}"},
               |                {"key": "numSamples", "value": "${math.max(nSamples, 0L)}"}]}""".stripMargin
          val mTmp = new Path(attemptDir, "manifest")
          val mOut = fs.create(mTmp, true)
          try mOut.write(manifest.getBytes(StandardCharsets.UTF_8)) finally mOut.close()
          commit(fs, mTmp, new Path(outDirStr, unitManifestName(ord)))
          key = null
        }
        try {
          rows.foreach { r =>
            val k = (r.getString(0), r.getString(1))
            if (k != key) {
              finishChannel()
              key = k; nSpikes = 0L; nSamples = -1L
              recTmp = new Path(attemptDir, "records"); wfTmp = new Path(attemptDir, "waveforms")
              recOut = new BufferedOutputStream(fs.create(recTmp, true), 1 << 16)
              wfOut = new BufferedOutputStream(fs.create(wfTmp, true), 1 << 16)
            }
            val ts = r.getLong(2)
            if (nSpikes == 0L) firstTs = ts
            lastTs = ts
            putLong(recOut, ts)
            val unitId = r.getInt(3)
            // uint8 on disk — out-of-range must fail loudly (the
            // reference's bytearray([unit]) raises), never truncate
            require(unitId >= 0 && unitId <= 255,
              s"unit_id $unitId out of uint8 range in channel ${key._2}")
            recOut.write(unitId)
            val wf = r.getSeq[Any](4)
            if (nSamples < 0) nSamples = wf.size.toLong
            require(wf.size.toLong == nSamples,
              s"ragged waveforms in channel ${key._2}: ${wf.size} vs $nSamples")
            wf.foreach {
              case null => putDouble(wfOut, Double.NaN)
              case d: Double => putDouble(wfOut, d)
              case other => throw new IllegalArgumentException(s"waveform element $other")
            }
            nSpikes += 1
          }
          finishChannel()
        } finally {
          if (recOut != null) recOut.close()
          if (wfOut != null) wfOut.close()
          fs.delete(attemptDir, true)
        }
      }

    require(ords.values.forall(o => driverFs.exists(new Path(outPath, unitManifestName(o)))),
      "unit manifest assembly incomplete")
    matchedUnitOrds.foreach(o => driverFs.delete(new Path(outPath, stagedUnitName(o)), false))

    val idxPath = new Path(outPath, "channels_unit.json")
    val total = newOrdBase + newKeys.size
    concatIndex(driverFs, idxPath,
      (0 until total).map(o => new Path(outPath, unitManifestName(o))))
    idxPath.toString
  }

  private def unitManifestName(o: Int): String =
    if (o == 0) "unit-channel.json" else f"unit-channel-$o%05d.json"
}
