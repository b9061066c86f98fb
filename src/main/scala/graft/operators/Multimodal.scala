package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** C12: multimodal column plumbing for training-data pipelines.
  *
  * Media payloads ride as opaque `binary` columns with typed metadata;
  * decode / feature-extraction / frame-sampling run as `mapPartitions`
  * over the typed Dataset so each task touches its partition's bytes once
  * (the Scala analogue of Python's mapInPandas batch shape).
  *
  * NOTE: this container ships no image/audio codecs, so `decodeStub` is a
  * clearly-marked DETERMINISTIC FAKE (features derived from the byte
  * stream itself). The Spark-side contract — schema, encoders, partition
  * batching, null/metadata handling — is the real, tested part; swapping
  * the stub body for a JNI/Java codec changes no plan shape.
  */
object Multimodal {

  final case class Media(mediaId: Long, kind: String, bytes: Array[Byte],
                         width: Int, height: Int, sampleRate: Int)

  final case class MediaFeatures(mediaId: Long, kind: String, nBytes: Long,
                                 checksum: Long, feature: Array[Float])

  final case class Frame(mediaId: Long, frameIdx: Int, offsetBytes: Long, frameBytes: Array[Byte])

  /** Build the canonical media DataFrame (binary payload + typed metadata). */
  def ingest(spark: SparkSession, rows: Seq[Media]): Dataset[Media] = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  /** Decode + featurize each payload: one pass per partition, streaming.
    *
    * STUB: features are a deterministic fold of the payload bytes standing
    * in for a real decoder; replace the body of `featurize` with the codec
    * call in production. Partition shape, schema and encoder are real.
    */
  def decodeFeatures(media: Dataset[Media], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val checksum = m.bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
        val feature = featurize(m.bytes, dim)
        MediaFeatures(m.mediaId, m.kind, m.bytes.length.toLong, checksum, feature)
      }
    }
  }

  /** ??? real decoder goes here — deterministic stand-in for tests. */
  private def featurize(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) { out(i % dim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    out.map(v => v / math.max(1, bytes.length / dim).toFloat)
  }

  /** A decoded-and-resized image payload (stub pixels). */
  final case class Resized(mediaId: Long, width: Int, height: Int, pixels: Array[Byte])

  /** Resize image-kind payloads to (outW, outH): nearest-neighbor over
    * the byte grid implied by the stored (width, height) metadata.
    *
    * STUB decode: bytes are treated as a row-major single-channel image
    * (a real codec would decode first); the nearest-neighbor SAMPLING —
    * coordinate mapping, bounds, partition shape — is the real, tested
    * logic and is unchanged by swapping in a decoder.
    */
  def resize(media: Dataset[Media], outW: Int, outH: Int): Dataset[Resized] = {
    import media.sparkSession.implicits._
    media.filter(m => m.kind == "image" && m.width > 0 && m.height > 0).mapPartitions { it =>
      it.map { m =>
        val out = new Array[Byte](outW * outH)
        var y = 0
        while (y < outH) {
          // Long arithmetic: y*height and sy*width overflow Int for large
          // (unvalidated, ingested) metadata dims, and a wrapped-negative
          // src would slip past the bounds guard below
          val sy = math.min(m.height - 1L, y.toLong * m.height / outH)
          var x = 0
          while (x < outW) {
            val sx = math.min(m.width - 1L, x.toLong * m.width / outW)
            val src = sy * m.width + sx
            out(y * outW + x) = if (src >= 0 && src < m.bytes.length) m.bytes(src.toInt) else 0
            x += 1
          }
          y += 1
        }
        Resized(m.mediaId, outW, outH, out)
      }
    }
  }

  /** Frame sampling for video-kind payloads: every `frameBytes`-sized
    * stride emits one frame slice (deterministic; a codec would seek
    * keyframes instead). Explodes executor-side — no driver involvement.
    */
  def frameSample(media: Dataset[Media], frameBytes: Int, everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val nFrames = m.bytes.length / frameBytes
      (0 until nFrames by everyN).map { f =>
        Frame(m.mediaId, f, f.toLong * frameBytes,
          m.bytes.slice(f * frameBytes, (f + 1) * frameBytes))
      }
    }
  }

  /** Metadata summary over a media set (pure relational on the typed ds). */
  def summarize(media: Dataset[Media]): DataFrame =
    media.toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"), sum(length(col("bytes"))).as("total_bytes"),
        avg(col("width")).as("avg_width"), avg(col("height")).as("avg_height"))
      .orderBy(col("kind"))
}
