package graft.operators

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** C12: multimodal column plumbing for training-data pipelines.
  *
  * Media payloads ride as opaque `binary` columns with typed metadata;
  * decode / feature-extraction / frame-sampling run as `mapPartitions`
  * over the typed Dataset so each task touches its partition's bytes once
  * (the Scala analogue of Python's mapInPandas batch shape).
  *
  * IMAGE payloads are decoded for real via JDK-builtin `javax.imageio`
  * (PNG/JPEG/BMP/GIF/WBMP — zero external dependencies): pixels are
  * luminance-converted executor-side and feed the histogram featurizer
  * and the nearest-neighbor resize below. Byte streams that are NOT a
  * decodable image (raw single-channel grids ingested with explicit
  * width/height metadata) fall back to the metadata-implied grid.
  *
  * AUDIO payloads are decoded for real via JDK-builtin
  * `javax.sound.sampled.AudioSystem` (PCM WAV/AIFF/AU — zero external
  * dependencies): frames are mono-mixed and normalized to signed 16-bit
  * executor-side and feed the same histogram featurizer. Only VIDEO has
  * genuinely no JDK codec, so that kind keeps a clearly-marked
  * DETERMINISTIC byte-fold stand-in; the partition shape, schema, and
  * null/metadata handling are identical, so swapping in a JNI codec
  * changes no plan shape.
  */
object Multimodal {

  /** Pluggable video-decode seam. The JDK ships no video codec, so the
    * default implementation ([[ByteFoldVideoDecoder]]) is the documented
    * deterministic stand-in; a production JNI/FFI codec implements this
    * same trait and drops in via the `video` parameter of
    * [[decodeFeatures]] / [[frameSample]] without touching partition
    * shape, output schema, or plan — the decoder runs strictly inside
    * `mapPartitions` tasks. Implementations must be serializable (they
    * ship to executors) and deterministic per byte stream (results feed
    * oracle-compared pipelines).
    */
  trait VideoDecoder extends Serializable {
    /** `dim`-bucket feature vector for one video payload. */
    def features(bytes: Array[Byte], dim: Int): Array[Float]
    /** Sampled frames as (frameIdx, byteOffset, frameBytes) — a real
      * codec seeks keyframes; the stand-in strides fixed-size slices.
      */
    def frames(bytes: Array[Byte], frameBytes: Int, everyN: Int): Iterator[(Int, Long, Array[Byte])]
    /** Sampled frames decoded to real pixel planes. The default derives
      * a self-describing fake from [[frames]] (each payload slice as a
      * 1-row "image") so stand-in decoders keep working; codec-backed
      * implementations override with true decode.
      */
    def decodedFrames(bytes: Array[Byte], everyN: Int): Iterator[(Int, Long, DecodedImage)] =
      frames(bytes, 4096, everyN).map { case (i, off, fb) => (i, off, DecodedImage(fb.length, 1, fb)) }
  }

  /** Default [[VideoDecoder]]: the deterministic byte-fold/stride
    * stand-in (STUB for real decode — no JDK video codec exists).
    */
  object ByteFoldVideoDecoder extends VideoDecoder {
    override def features(bytes: Array[Byte], dim: Int): Array[Float] = byteFold(bytes, dim)
    override def frames(bytes: Array[Byte], frameBytes: Int,
                        everyN: Int): Iterator[(Int, Long, Array[Byte])] = {
      val nFrames = bytes.length / frameBytes
      (0 until nFrames by everyN).iterator.map { f =>
        (f, f.toLong * frameBytes, bytes.slice(f * frameBytes, (f + 1) * frameBytes))
      }
    }
  }

  /** Real [[VideoDecoder]] for AVI (RIFF) containers, four codecs:
    *
    *  - **Motion-JPEG** — each frame an independent JPEG, decoded by the
    *    JDK's `javax.imageio` codec (sniffed by the FFD8 SOI marker);
    *  - **uncompressed DIB** (`biCompression = 0`) — bottom-up (or
    *    top-down for negative heights) 8/24/32-bit device-independent
    *    bitmap rows, 4-byte-aligned strides, palette-indexed at 8 bpp;
    *  - **Microsoft RLE8** (`biCompression = 1`) — the standard BMP
    *    run-length encoding (count/index pairs; 0-escapes for EOL, EOD,
    *    delta and word-padded absolute runs), palette-indexed, with
    *    INTER-frame delta frames (unset pixels inherit the previous
    *    frame);
    *  - **Microsoft Video 1** (`biCompression = 'CRAM'/'MSVC'/'WHAM'`,
    *    8-bit variant) — 4x4-block vector quantization with 1-, 2- and
    *    8-color blocks and inter-frame SKIP codes copying blocks from
    *    the previous frame.
    *
    * All four are fully public formats; DIB, RLE8 and MS Video 1 are
    * hand-decoded here since the JDK ships no AVI codec. The container
    * walk is a standard RIFF chunk scan (12-byte `RIFF…AVI ` header,
    * chunks of `fourcc + u32le size + data` padded to even offsets):
    * frame payloads are the `##dc`/`##db` chunks inside the `movi` LIST
    * (including `rec ` sub-lists), and the DIB/RLE8 dims + palette come
    * from the `vids` stream's `strf` BITMAPINFOHEADER inside `hdrl`.
    * [[frames]] demuxes the encoded payloads (the `frameBytes` hint is
    * ignored — the container defines frame boundaries);
    * [[decodedFrames]] and [[features]] decode to luminance planes.
    * Unparseable containers/frames yield no frames and a zero feature
    * vector — corrupt rows must degrade, not kill, a 100 TB ingest task.
    */
  object AviVideoDecoder extends VideoDecoder {
    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** (offset, length) of each video frame chunk, demuxed in stream
      * order. Defensive on sizes: a declared size that runs past the
      * buffer ends the walk (truncated upload) rather than throwing.
      */
    private[graft] def videoChunks(bytes: Array[Byte]): Seq[(Int, Int)] = {
      if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ")
        return Seq.empty
      val end = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
      val out = Seq.newBuilder[(Int, Int)]
      def walkChunks(from: Int, to: Int, inMovi: Boolean): Unit = {
        var p = from
        while (p + 8 <= to) {
          val id = fourcc(bytes, p)
          val size = u32(bytes, p + 4)
          val dataStart = p + 8
          if (size < 0 || dataStart + size > to) return // truncated/corrupt
          val dataEnd = (dataStart + size).toInt
          if (id == "LIST" && size >= 4) {
            val listType = fourcc(bytes, dataStart)
            // movi holds the stream data; rec  groups interleaved chunks
            if (listType == "movi" || (inMovi && listType == "rec "))
              walkChunks(dataStart + 4, dataEnd, inMovi = true)
          } else if (inMovi && (id.endsWith("dc") || id.endsWith("db")) && size > 0) {
            out += ((dataStart, size.toInt))
          }
          p = dataEnd + (size.toInt & 1) // chunks are word-aligned
        }
      }
      walkChunks(12, end, inMovi = false)
      out.result()
    }

    /** The `vids` stream's frame format: dims, depth, codec id, and the
      * palette pre-folded to a luminance LUT (BT.601 fixed-point, same
      * formula as [[decodeImage]]).
      */
    private[graft] final case class VidFmt(width: Int, height: Int, topDown: Boolean,
        bitCount: Int, compression: Long, palLum: Array[Byte])

    /** Parse the first video stream's `strf` BITMAPINFOHEADER out of the
      * `hdrl` LIST (strl lists pair a `strh` stream header with its
      * `strf` format chunk; the stream type fourcc leads `strh`).
      */
    private[graft] def videoFormat(bytes: Array[Byte]): Option[VidFmt] = {
      if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ")
        return None
      val end = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
      var found: Option[VidFmt] = None
      var vidsStream = false
      def walk(from: Int, to: Int): Unit = {
        var p = from
        while (p + 8 <= to && found.isEmpty) {
          val id = fourcc(bytes, p)
          val size = u32(bytes, p + 4)
          val dataStart = p + 8
          if (size < 0 || dataStart + size > to) return
          val dataEnd = (dataStart + size).toInt
          if (id == "LIST" && size >= 4) {
            val lt = fourcc(bytes, dataStart)
            if (lt == "hdrl" || lt == "strl") walk(dataStart + 4, dataEnd)
          } else if (id == "strh" && size >= 4) {
            vidsStream = fourcc(bytes, dataStart) == "vids"
          } else if (id == "strf" && vidsStream && size >= 40) {
            val w = u32(bytes, dataStart + 4).toInt
            val hRaw = u32(bytes, dataStart + 8).toInt
            val bits = (bytes(dataStart + 14) & 0xff) | ((bytes(dataStart + 15) & 0xff) << 8)
            val comp = u32(bytes, dataStart + 16)
            val clrUsed = u32(bytes, dataStart + 32).toInt
            val nPal = if (bits <= 8) { if (clrUsed > 0) clrUsed else 1 << bits } else 0
            val pal = new Array[Byte](math.max(nPal, 0))
            val palOff = dataStart + 40 // after the 40-byte BITMAPINFOHEADER
            var i = 0
            while (i < nPal && palOff + i * 4 + 3 < dataEnd) {
              val b = bytes(palOff + i * 4) & 0xff
              val g = bytes(palOff + i * 4 + 1) & 0xff
              val r = bytes(palOff + i * 4 + 2) & 0xff
              pal(i) = ((299 * r + 587 * g + 114 * b) / 1000).toByte
              i += 1
            }
            if (w > 0 && hRaw != 0)
              found = Some(VidFmt(w, math.abs(hRaw), topDown = hRaw < 0, bits, comp, pal))
          }
          p = dataEnd + (size.toInt & 1)
        }
      }
      walk(12, end)
      found
    }

    /** Uncompressed DIB frame -> luminance plane (8/24/32 bpp, 4-byte
      * row stride, bottom-up unless the header's height was negative).
      */
    private[graft] def decodeDib(fb: Array[Byte], f: VidFmt): Option[DecodedImage] = {
      val bytesPerPx = f.bitCount / 8
      if (f.bitCount != 8 && f.bitCount != 24 && f.bitCount != 32) return None
      val stride = ((f.width * bytesPerPx + 3) / 4) * 4
      if (fb.length < stride.toLong * f.height) return None
      val out = new Array[Byte](f.width * f.height)
      var y = 0
      while (y < f.height) {
        val srcRow = (if (f.topDown) y else f.height - 1 - y) * stride
        var x = 0
        while (x < f.width) {
          val p = srcRow + x * bytesPerPx
          out(y * f.width + x) =
            if (f.bitCount == 8) {
              val idx = fb(p) & 0xff
              if (idx < f.palLum.length) f.palLum(idx) else idx.toByte
            } else {
              val b = fb(p) & 0xff; val g = fb(p + 1) & 0xff; val r = fb(p + 2) & 0xff
              ((299 * r + 587 * g + 114 * b) / 1000).toByte
            }
          x += 1
        }
        y += 1
      }
      Some(DecodedImage(f.width, f.height, out))
    }

    /** Microsoft RLE8 frame -> luminance plane. Escapes: 00 00 = end of
      * line, 00 01 = end of bitmap, 00 02 dx dy = position delta,
      * 00 n>=3 = absolute run of n indices padded to a word boundary.
      * Unset pixels keep palette index 0 (the format's defined fill).
      */
    private[graft] def decodeRle8(fb: Array[Byte], f: VidFmt): Option[DecodedImage] =
      rle8IndexGrid(fb, f, prev = null).map(gridToImage(_, f))

    /** RLE8 frame -> bottom-up palette-index grid. `prev` (same layout,
      * or null for a first/keyframe) seeds the grid: pixels the stream
      * does not set retain the PREVIOUS frame's content — MS-RLE8's
      * spec-defined inter-frame 'delta frame' mechanism (the 00 02 dx dy
      * escape and early EOL/EOD exist exactly to skip unchanged runs).
      * With no previous frame the fill is palette index 0.
      */
    private[graft] def rle8IndexGrid(fb: Array[Byte], f: VidFmt,
                                     prev: Array[Byte]): Option[Array[Byte]] = {
      if (f.bitCount != 8) return None
      val idxGrid =
        if (prev != null && prev.length == f.width * f.height)
          java.util.Arrays.copyOf(prev, prev.length)
        else new Array[Byte](f.width * f.height) // bottom-up grid
      var x = 0; var y = 0; var p = 0
      var done = false
      while (!done && p + 1 < fb.length && y < f.height) {
        val n = fb(p) & 0xff; val v = fb(p + 1) & 0xff
        p += 2
        if (n > 0) { // encoded run
          var i = 0
          while (i < n && x < f.width) { idxGrid(y * f.width + x) = v.toByte; x += 1; i += 1 }
        } else v match {
          case 0 => x = 0; y += 1 // end of line
          case 1 => done = true // end of bitmap
          case 2 => // delta
            if (p + 1 < fb.length) { x += fb(p) & 0xff; y += fb(p + 1) & 0xff; p += 2 }
            else done = true
          case abs => // absolute run, word-padded
            var i = 0
            while (i < abs && p < fb.length && x < f.width) {
              idxGrid(y * f.width + x) = fb(p); x += 1; i += 1; p += 1
            }
            // a run clipped at the row edge still consumed `abs` bytes in
            // the stream — skip the unread remainder so a malformed frame
            // can't re-parse run payload as escape codes
            p += (abs - i)
            p += (abs & 1) // pad to word
        }
      }
      Some(idxGrid)
    }

    /** Bottom-up palette-index grid -> top-down luminance plane. */
    private def gridToImage(idxGrid: Array[Byte], f: VidFmt): DecodedImage = {
      val out = new Array[Byte](f.width * f.height)
      var yy = 0
      while (yy < f.height) {
        val srcRow = (if (f.topDown) yy else f.height - 1 - yy) * f.width
        var xx = 0
        while (xx < f.width) {
          val idx = idxGrid(srcRow + xx) & 0xff
          out(yy * f.width + xx) = if (idx < f.palLum.length) f.palLum(idx) else idx.toByte
          xx += 1
        }
        yy += 1
      }
      DecodedImage(f.width, f.height, out)
    }

    /** biCompression fourccs of Microsoft Video 1 (8-bit palettized). */
    private def isMsvc1(comp: Long): Boolean = {
      def fcc(s: String): Long =
        s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          .zipWithIndex.map { case (b, i) => (b & 0xffL) << (8 * i) }.sum
      comp == fcc("CRAM") || comp == fcc("MSVC") || comp == fcc("WHAM")
    }

    /** Microsoft Video 1 (CRAM), 8-bit palettized variant — a true
      * INTER-frame codec: the frame is a bottom-up raster of 4x4 blocks
      * and a skip code copies whole blocks from the previous frame.
      * Block codes (two bytes A, B per the public spec / FFmpeg's
      * msvideo1 notes):
      *
      *  - `(B & 0xFC) == 0x84` — skip `((B - 0x84) << 8) + A` blocks
      *    (previous frame's pixels retained);
      *  - `B < 0x80` — 16-bit flags `(B << 8) | A`, then color bytes:
      *    first color's high bit CLEAR → 2-color block (flag bit per
      *    pixel, LSB first, set bit = color 0); SET → 8-color block
      *    (a color pair per 2x2 quadrant, same flag bits);
      *  - otherwise — 1-color block, color = A.
      *
      * Within a block, pixel rows run bottom-up, pixels left-to-right
      * (the raster convention of the containing frame). `prev` = the
      * previous frame's bottom-up index grid, or null (first frame:
      * skip resolves to palette index 0).
      */
    private[graft] def msvc1IndexGrid(fb: Array[Byte], f: VidFmt,
                                      prev: Array[Byte]): Option[Array[Byte]] = {
      if (f.bitCount != 8 || f.width % 4 != 0 || f.height % 4 != 0) return None
      val w = f.width; val h = f.height
      val grid =
        if (prev != null && prev.length == w * h) java.util.Arrays.copyOf(prev, prev.length)
        else new Array[Byte](w * h)
      val blocksWide = w / 4; val blocksHigh = h / 4
      var p = 0
      var skip = 0
      var block = 0
      val totalBlocks = blocksWide * blocksHigh
      while (block < totalBlocks) {
        if (skip > 0) { skip -= 1; block += 1 }
        else if (p + 2 > fb.length) block = totalBlocks // stream end: rest skips
        else {
          val a = fb(p) & 0xff; val b = fb(p + 1) & 0xff
          p += 2
          if ((b & 0xfc) == 0x84) { skip = ((b - 0x84) << 8) + a; () }
          else {
            // block origin in the bottom-up grid (block rows bottom-up)
            val bx = (block % blocksWide) * 4
            val by = (block / blocksWide) * 4
            def put(px: Int, py: Int, v: Int): Unit =
              grid((by + py) * w + bx + px) = v.toByte
            if (b < 0x80) {
              var flags = (b << 8) | a
              if (p + 2 <= fb.length && (fb(p) & 0x80) != 0) {
                // 8-color: one color pair per 2x2 quadrant
                if (p + 8 > fb.length) { p = fb.length }
                else {
                  val c = java.util.Arrays.copyOfRange(fb, p, p + 8); p += 8
                  var py = 0
                  while (py < 4) {
                    var px = 0
                    while (px < 4) {
                      val ci = ((py & 2) << 1) + (px & 2) + ((flags & 1) ^ 1)
                      put(px, py, c(ci) & 0xff)
                      flags >>= 1; px += 1
                    }
                    py += 1
                  }
                }
              } else if (p + 2 <= fb.length) {
                val c0 = fb(p) & 0xff; val c1 = fb(p + 1) & 0xff; p += 2
                var py = 0
                while (py < 4) {
                  var px = 0
                  while (px < 4) {
                    put(px, py, if ((flags & 1) != 0) c0 else c1)
                    flags >>= 1; px += 1
                  }
                  py += 1
                }
              } else p = fb.length
            } else {
              // 1-color block
              var py = 0
              while (py < 4) {
                var px = 0
                while (px < 4) { put(px, py, a); px += 1 }
                py += 1
              }
            }
            block += 1
          }
        }
      }
      Some(grid)
    }

    /** Demuxed encoded frame payloads (every Nth video chunk). */
    override def frames(bytes: Array[Byte], frameBytes: Int,
                        everyN: Int): Iterator[(Int, Long, Array[Byte])] =
      videoChunks(bytes).zipWithIndex.collect {
        case ((off, len), i) if i % math.max(1, everyN) == 0 =>
          (i, off.toLong, java.util.Arrays.copyOfRange(bytes, off, off + len))
      }.iterator

    /** True decode: sampled payloads to luminance planes — JPEG payloads
      * (FFD8 sniff) through the JDK codec, DIB/RLE8/MS-Video-1 through
      * the hand decoders above (undecodable frames are skipped, not
      * fatal). INTER-frame codecs (RLE8 delta frames, MS Video 1 skip
      * blocks) decode EVERY frame in stream order to carry the
      * previous-frame state a sampled frame may reference, emitting only
      * every Nth — the sampled output is identical to what a player
      * would show, not a keyframe approximation. Intra-only payloads
      * (MJPEG, DIB) skip straight to the sampled frames.
      */
    override def decodedFrames(bytes: Array[Byte],
                               everyN: Int): Iterator[(Int, Long, DecodedImage)] = {
      lazy val fmt = videoFormat(bytes)
      val inter = fmt.filter(f => f.compression == 1L || isMsvc1(f.compression))
      inter match {
        case Some(f) =>
          val n = math.max(1, everyN)
          var prev: Array[Byte] = null
          videoChunks(bytes).iterator.zipWithIndex.flatMap { case ((off, len), i) =>
            val fb = java.util.Arrays.copyOfRange(bytes, off, off + len)
            val grid =
              if (f.compression == 1L) rle8IndexGrid(fb, f, prev)
              else msvc1IndexGrid(fb, f, prev)
            grid.foreach(prev = _)
            if (i % n == 0) grid.map(g => (i, off.toLong, gridToImage(g, f))) else None
          }
        case None =>
          frames(bytes, 0, everyN).flatMap { case (i, off, fb) =>
            val img =
              if (fb.length >= 2 && (fb(0) & 0xff) == 0xff && (fb(1) & 0xff) == 0xd8)
                decodeImage(fb)
              else fmt.flatMap { f =>
                if (f.compression == 0L) decodeDib(fb, f) else None
              }
            img.map(im => (i, off, im))
          }
      }
    }

    /** Per-frame `dim`-bucket luminance histograms averaged across all
      * decodable frames — same bucketing as the image branch of
      * [[decodeFeatures]], so image and video featurization agree.
      */
    override def features(bytes: Array[Byte], dim: Int): Array[Float] =
      lumFeatures(decodedFrames(bytes, 1), dim)
  }

  /** Real [[VideoDecoder]] for YUV4MPEG2 (`.y4m`) streams — the raw
    * planar interchange format video toolchains exchange uncompressed
    * frames in (fully public; mjpegtools/ffmpeg `yuv4mpegpipe`). The
    * stream is a `YUV4MPEG2 W<w> H<h> …` parameter line, then per frame
    * a `FRAME…\n` marker followed by raw planes: Y (w·h bytes) and, per
    * the `C` colorspace parameter, U+V at quarter (C420*), half (C422)
    * or full (C444) size — or nothing (Cmono). The luminance plane IS
    * the Y plane, so decode is exact by construction. Truncated streams
    * yield the frames that fit; garbage yields none (the 100 TB
    * degrade-don't-kill rule).
    */
  object Y4mVideoDecoder extends VideoDecoder {
    private[graft] final case class Y4mHeader(width: Int, height: Int,
                                       chromaBytes: Int, dataStart: Int)

    private[graft] def header(bytes: Array[Byte]): Option[Y4mHeader] = {
      val magic = "YUV4MPEG2".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      if (bytes.length < magic.length + 1 || !bytes.startsWith(magic)) return None
      val nl = bytes.indexOf('\n'.toByte)
      if (nl < 0) return None
      val params = new String(bytes, 0, nl, java.nio.charset.StandardCharsets.US_ASCII)
        .split(' ').drop(1)
      def num(tag: Char): Option[Int] =
        params.find(p => p.nonEmpty && p.head == tag)
          .flatMap(p => scala.util.Try(p.tail.toInt).toOption)
      val (w, h) = (num('W').getOrElse(0), num('H').getOrElse(0))
      if (w <= 0 || h <= 0) return None
      val cs = params.find(p => p.nonEmpty && p.head == 'C').map(_.tail).getOrElse("420")
      // Long plane math: hostile header dims (W65540 H65540) overflow an
      // Int w*h to NEGATIVE, which slips past every downstream bounds
      // check — a frame that cannot fit the payload must yield None
      // (garbage in, no frames out), never throw from copyOfRange
      val chromaL: Long =
        if (cs == "mono") 0L
        else if (cs.startsWith("444")) 2L * w * h
        else if (cs.startsWith("422")) 2L * ((w + 1L) / 2) * h
        else 2L * ((w + 1L) / 2) * ((h + 1L) / 2) // all 420 variants
      if (w.toLong * h + chromaL > bytes.length.toLong) return None
      Some(Y4mHeader(w, h, chromaL.toInt, nl + 1))
    }

    /** (offset-of-plane-data, frame index) positions of each frame. */
    private def framePositions(bytes: Array[Byte], h: Y4mHeader): Iterator[(Int, Int)] =
      new Iterator[(Int, Int)] {
        private val frameBytes = h.width * h.height + h.chromaBytes
        private var p = h.dataStart
        private var idx = -1
        private var nextPos = advance()
        private def advance(): Int = {
          // FRAME marker + optional params up to newline
          val m = "FRAME".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          if (p + m.length > bytes.length) return -1
          if (!m.indices.forall(i => bytes(p + i) == m(i))) return -1
          var nl = p + m.length
          while (nl < bytes.length && bytes(nl) != '\n'.toByte) nl += 1
          if (nl >= bytes.length || nl + 1 + frameBytes > bytes.length) return -1
          nl + 1
        }
        override def hasNext: Boolean = nextPos >= 0
        override def next(): (Int, Int) = {
          val pos = nextPos; idx += 1
          p = pos + frameBytes
          nextPos = advance()
          (pos, idx)
        }
      }

    override def frames(bytes: Array[Byte], frameBytes: Int,
                        everyN: Int): Iterator[(Int, Long, Array[Byte])] =
      header(bytes).iterator.flatMap { h =>
        val fb = h.width * h.height + h.chromaBytes
        framePositions(bytes, h).collect {
          case (pos, i) if i % math.max(1, everyN) == 0 =>
            (i, pos.toLong, java.util.Arrays.copyOfRange(bytes, pos, pos + fb))
        }
      }

    override def decodedFrames(bytes: Array[Byte],
                               everyN: Int): Iterator[(Int, Long, DecodedImage)] =
      header(bytes).iterator.flatMap { h =>
        framePositions(bytes, h).collect {
          case (pos, i) if i % math.max(1, everyN) == 0 =>
            (i, pos.toLong, DecodedImage(h.width, h.height,
              java.util.Arrays.copyOfRange(bytes, pos, pos + h.width * h.height)))
        }
      }

    override def features(bytes: Array[Byte], dim: Int): Array[Float] =
      lumFeatures(decodedFrames(bytes, 1), dim)
  }

  /** [[VideoDecoder]] DEMUXER for ISO BMFF / MP4 containers — the box
    * walk (`moov → trak → mdia(hdlr=vide) → minf → stbl`) plus the
    * sample-table arithmetic (`stsc` chunk runs × `stsz` sizes ×
    * `stco`/`co64` chunk offsets) that maps every video sample to its
    * exact byte range in `mdat`. [[frames]] is REAL demux: the returned
    * (index, offset, payload) triples are the codec access units a
    * player would feed its decoder. Pixel DECODE is real only for
    * JPEG-coded samples (`jpeg`/`mjpa` tracks or FFD8-sniffed payloads,
    * via the JDK codec); H.264/H.265 payloads demux but do not decode —
    * the JDK ships no codec, and that branch is the documented seam for
    * a production JNI implementation. Corrupt/truncated boxes end the
    * walk silently.
    */
  object Mp4VideoDecoder extends VideoDecoder {
    private def u32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    private def u64(b: Array[Byte], off: Int): Long =
      (u32(b, off) << 32) | u32(b, off + 4)
    private def typ(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Walk child boxes of [from, to), invoking f(type, payloadFrom,
      * payloadTo). Stops on truncation/corruption.
      */
    private def boxes(b: Array[Byte], from: Int, to: Int)(f: (String, Int, Int) => Unit): Unit = {
      var p = from
      while (p + 8 <= to) {
        val size0 = u32(b, p)
        val t = typ(b, p + 4)
        var dataStart = p + 8
        val size =
          if (size0 == 1L && p + 16 <= to) { dataStart = p + 16; u64(b, p + 8) }
          else if (size0 == 0L) (to - p).toLong
          else size0
        if (size < (dataStart - p) || p + size > to) return
        f(t, dataStart, (p + size).toInt)
        p = (p + size).toInt
      }
    }

    /** Sample sizes are kept UN-materialized for the constant-size stsz
      * form (`varSizes == null`): a hostile container claiming 256 M
      * constant-size samples must not allocate an 8×-container-size
      * Array[Long] — `sizeOf` computes from the constant instead
      * (review r15 ADVICE). `syncSamples` is the stss keyframe table
      * (1-based sample numbers). NULL means NO stss box — every sample
      * is a sync point (the ISO-BMFF absence rule) — while an EMPTY
      * array is a present stss declaring zero sync samples, the
      * opposite meaning (ISO 14496-12 §8.6.2; conflating them inverted
      * hostile empty-stss containers, review r16).
      */
    private[graft] final case class VideoTrack(codec: String, width: Int, height: Int,
        sampleCount: Int, constSize: Long, varSizes: Array[Long],
        chunkOffsets: Array[Long],
        stscRuns: Array[(Long, Long)], // (first_chunk 1-based, samples_per_chunk)
        syncSamples: Array[Int]) {
      def sizeOf(i: Int): Long = if (varSizes != null) varSizes(i) else constSize
    }

    /** First `vide`-handler track's sample table. */
    private[graft] def videoTrack(b: Array[Byte]): Option[VideoTrack] = {
      var found: Option[VideoTrack] = None
      // a claimed entry count is hostile input until proven otherwise:
      // bound it by the box's actual bytes AND the container size (no
      // real track has more samples than container bytes), floor at 0
      def clampCount(claimed: Long, byBytes: Long): Int =
        math.max(0L, math.min(math.min(claimed, byBytes), b.length.toLong)).toInt
      boxes(b, 0, b.length) { (t0, f0, t0end) =>
        if (t0 == "moov" && found.isEmpty) boxes(b, f0, t0end) { (t1, f1, t1end) =>
          if (t1 == "trak" && found.isEmpty) {
            var isVide = false
            var codec = ""; var w = 0; var h = 0
            var nSamples = -1
            var constSz = 0L
            var sizes: Array[Long] = null
            var offs: Array[Long] = null
            var runs: Array[(Long, Long)] = null
            var syncs: Array[Int] = null  // null = no stss box (all samples sync)
            def stbl(f: Int, to: Int): Unit = boxes(b, f, to) { (t4, f4, t4end) =>
              t4 match {
                case "stsd" if t4end - f4 >= 16 =>
                  // FullBox(4) + entry_count(4), then the first sample
                  // entry: size(4) codec(4) … width@32 height@34
                  val e = f4 + 8
                  if (e + 36 <= t4end) {
                    codec = typ(b, e + 4)
                    w = ((b(e + 32) & 0xff) << 8) | (b(e + 33) & 0xff)
                    h = ((b(e + 34) & 0xff) << 8) | (b(e + 35) & 0xff)
                  }
                case "stsz" if t4end - f4 >= 12 =>
                  val const = u32(b, f4 + 4)
                  // clamp the CLAIMED entry count to what the box's bytes
                  // can actually hold — a corrupt/hostile count must not
                  // allocate (0x7FFFFFFF entries = 16 GB) or go negative;
                  // one bad row degrades, never kills, the ingest task.
                  // The constant-size form carries no per-entry bytes to
                  // bound by, so bound by the payload instead: total
                  // sample bytes cannot exceed the container, so at most
                  // len/const samples can exist (review r15 ADVICE) —
                  // and no sizes array is materialized at all
                  val n = clampCount(u32(b, f4 + 8),
                    if (const != 0) b.length / math.max(1L, const)
                    else (t4end - f4 - 12L) / 4)
                  nSamples = n
                  constSz = const
                  sizes =
                    if (const != 0) null
                    else Array.tabulate(n)(i => u32(b, f4 + 12 + i * 4))
                case "stco" if t4end - f4 >= 8 =>
                  val n = clampCount(u32(b, f4 + 4), (t4end - f4 - 8L) / 4)
                  offs = Array.tabulate(n)(i => u32(b, f4 + 8 + i * 4))
                case "co64" if t4end - f4 >= 8 =>
                  val n = clampCount(u32(b, f4 + 4), (t4end - f4 - 8L) / 8)
                  offs = Array.tabulate(n)(i => u64(b, f4 + 8 + i * 8))
                case "stsc" if t4end - f4 >= 8 =>
                  val n = clampCount(u32(b, f4 + 4), (t4end - f4 - 8L) / 12)
                  runs = Array.tabulate(n) { i =>
                    val e = f4 + 8 + i * 12
                    (u32(b, e), u32(b, e + 4))
                  }
                case "stss" if t4end - f4 >= 8 =>
                  // sync (keyframe) sample table: 1-based sample numbers;
                  // hostile counts bounded by the box's real bytes like
                  // every other table, entries past Int range dropped
                  val n = clampCount(u32(b, f4 + 4), (t4end - f4 - 8L) / 4)
                  syncs = Array.tabulate(n)(i => u32(b, f4 + 8 + i * 4))
                    .filter(s => s >= 1 && s <= Int.MaxValue).map(_.toInt)
                case _ => ()
              }
            }
            boxes(b, f1, t1end) { (t2, f2, t2end) =>
              if (t2 == "mdia") boxes(b, f2, t2end) { (t3, f3, t3end) =>
                if (t3 == "hdlr" && t3end - f3 >= 12)
                  isVide = typ(b, f3 + 8) == "vide"
                else if (t3 == "minf") boxes(b, f3, t3end) { (t4, f4, t4end) =>
                  if (t4 == "stbl") stbl(f4, t4end)
                }
              }
            }
            if (isVide && nSamples > 0 && offs != null && runs != null)
              found = Some(VideoTrack(codec, w, h, nSamples, constSz, sizes, offs, runs, syncs))
          }
        }
      }
      found
    }

    /** Every sample's (index, byteOffset) from the chunk run table —
      * a LAZY iterator (never a materialized Seq: a hostile sample count
      * must not cost memory proportional to its claim; review r15 ADVICE).
      */
    private[graft] def sampleOffsets(tr: VideoTrack): Iterator[(Int, Long)] =
      new Iterator[(Int, Long)] {
        private var sample = 0
        private var chunk = -1       // current chunk; -1 = before the first
        private var remaining = 0L   // samples still owed by the current chunk
        private var off = 0L
        private def advanceChunk(): Unit =
          while (remaining <= 0 && chunk + 1 < tr.chunkOffsets.length) {
            chunk += 1
            // samples-per-chunk = last stsc run whose first_chunk <= this
            val c1 = chunk + 1L
            remaining = tr.stscRuns.foldLeft(0L) { case (acc, (fc, n)) => if (fc <= c1) n else acc }
            off = tr.chunkOffsets(chunk)
          }
        override def hasNext: Boolean = {
          advanceChunk()
          remaining > 0 && sample < tr.sampleCount
        }
        override def next(): (Int, Long) = {
          if (!hasNext) throw new NoSuchElementException
          val out = (sample, off)
          off += tr.sizeOf(sample)
          sample += 1; remaining -= 1
          out
        }
      }

    /** Shared demux body: samples passing `keep`, bounds-guarded ONCE so
      * the next hostile-input hardening cannot fix frames() and silently
      * miss keyframes() (review r16). A hostile co64 entry with the top
      * bit set is a NEGATIVE Long which would pass a naive
      * `off + size <= length` bound (review r15 ADVICE) — require off in
      * [0, length - size] explicitly; sizes are u32-parsed so size >= 0,
      * and off >= 0 keeps the .toInt casts in range once the upper bound
      * holds.
      */
    private def demux(bytes: Array[Byte], tr: VideoTrack,
                      keep: Int => Boolean): Iterator[(Int, Long, Array[Byte])] =
      sampleOffsets(tr).collect {
        case (i, off) if keep(i) &&
          off >= 0 && off <= bytes.length - tr.sizeOf(i) =>
          (i, off, java.util.Arrays.copyOfRange(bytes, off.toInt, (off + tr.sizeOf(i)).toInt))
      }

    override def frames(bytes: Array[Byte], frameBytes: Int,
                        everyN: Int): Iterator[(Int, Long, Array[Byte])] =
      videoTrack(bytes).iterator.flatMap(tr =>
        demux(bytes, tr, i => i % math.max(1, everyN) == 0))

    /** Keyframe-only demux: samples the stss table marks as sync points.
      * ISO-BMFF semantics (14496-12 §8.6.2): NO stss box = every sample
      * is a sync sample; a PRESENT stss with zero entries = no sync
      * samples at all — the two must not be conflated (review r16).
      * The scale rationale: a feature pass that needs one decodable
      * frame per shot seeks straight to keyframes instead of demuxing
      * the delta-frame tail it can't decode anyway.
      */
    def keyframes(bytes: Array[Byte]): Iterator[(Int, Long, Array[Byte])] =
      videoTrack(bytes).iterator.flatMap { tr =>
        val sync: Int => Boolean =
          if (tr.syncSamples == null) _ => true
          else { val s = tr.syncSamples.toSet; i => s.contains(i + 1) }
        demux(bytes, tr, sync)
      }

    override def decodedFrames(bytes: Array[Byte],
                               everyN: Int): Iterator[(Int, Long, DecodedImage)] =
      frames(bytes, 0, everyN).flatMap { case (i, off, fb) =>
        val jpeg = fb.length >= 2 && (fb(0) & 0xff) == 0xff && (fb(1) & 0xff) == 0xd8
        (if (jpeg) decodeImage(fb) else None).map(im => (i, off, im))
      }

    override def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val fromPixels = lumFeatures(decodedFrames(bytes, 1), dim)
      if (fromPixels.exists(_ != 0.0f)) fromPixels
      else byteFold(bytes, dim) // non-JPEG codecs: documented stand-in
    }
  }

  /** Default production seam: sniff the container by magic and route to
    * the matching real decoder — `RIFF…AVI ` → [[AviVideoDecoder]],
    * `YUV4MPEG2` → [[Y4mVideoDecoder]], `ftyp` at offset 4 →
    * [[Mp4VideoDecoder]] — falling back to the deterministic
    * [[ByteFoldVideoDecoder]] stand-in for unknown payloads, so a mixed
    * 100 TB media column routes per ROW with no per-kind pipelines.
    */
  object ContainerVideoDecoder extends VideoDecoder {
    private[graft] def route(bytes: Array[Byte]): VideoDecoder =
      if (bytes.length >= 12 &&
        bytes(0) == 'R'.toByte && bytes(1) == 'I'.toByte && bytes(2) == 'F'.toByte &&
        bytes(3) == 'F'.toByte && bytes(8) == 'A'.toByte && bytes(9) == 'V'.toByte &&
        bytes(10) == 'I'.toByte) AviVideoDecoder
      else if (bytes.length >= 10 && bytes.startsWith(
        "YUV4MPEG2".getBytes(java.nio.charset.StandardCharsets.US_ASCII))) Y4mVideoDecoder
      else if (bytes.length >= 8 &&
        bytes(4) == 'f'.toByte && bytes(5) == 't'.toByte &&
        bytes(6) == 'y'.toByte && bytes(7) == 'p'.toByte) Mp4VideoDecoder
      else ByteFoldVideoDecoder
    override def frames(bytes: Array[Byte], frameBytes: Int,
                        everyN: Int): Iterator[(Int, Long, Array[Byte])] =
      route(bytes).frames(bytes, frameBytes, everyN)
    override def decodedFrames(bytes: Array[Byte],
                               everyN: Int): Iterator[(Int, Long, DecodedImage)] =
      route(bytes).decodedFrames(bytes, everyN)
    override def features(bytes: Array[Byte], dim: Int): Array[Float] =
      route(bytes).features(bytes, dim)
  }

  /** Per-frame `dim`-bucket luminance histograms averaged across frames —
    * the shared featurization of every pixel-producing video decoder
    * (same bucketing as the image branch of [[decodeFeatures]]).
    */
  private def lumFeatures(decoded: Iterator[(Int, Long, DecodedImage)],
                          dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var n = 0
    decoded.foreach { case (_, _, img) =>
      val hist = new Array[Float](dim)
      var i = 0
      while (i < img.gray.length) { hist(((img.gray(i) & 0xff) * dim) >> 8) += 1.0f; i += 1 }
      val tot = math.max(1, img.gray.length).toFloat
      var d = 0
      while (d < dim) { acc(d) += hist(d) / tot; d += 1 }
      n += 1
    }
    if (n == 0) acc else acc.map(_ / n)
  }

  final case class Media(mediaId: Long, kind: String, bytes: Array[Byte],
                         width: Int, height: Int, sampleRate: Int)

  final case class MediaFeatures(mediaId: Long, kind: String, nBytes: Long,
                                 checksum: Long, feature: Array[Float])

  final case class Frame(mediaId: Long, frameIdx: Int, offsetBytes: Long, frameBytes: Array[Byte])

  /** A decoded image: real pixel dims + row-major luminance bytes. */
  final case class DecodedImage(width: Int, height: Int, gray: Array[Byte])

  /** Build the canonical media DataFrame (binary payload + typed metadata). */
  def ingest(spark: SparkSession, rows: Seq[Media]): Dataset[Media] = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  /** Decode an image byte stream with `javax.imageio` and convert to
    * row-major luminance (integer BT.601: (299R + 587G + 114B) / 1000 —
    * fixed-point so results are bit-identical across JVMs/platforms).
    * None when the stream is not a decodable image.
    */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[DecodedImage] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
          out(y * w + x) = lum.toByte
          x += 1
        }
        y += 1
      }
      Some(DecodedImage(w, h, out))
    }
  }

  /** A decoded audio clip: real sample rate/channel count + the frame
    * stream mono-mixed and normalized to signed 16-bit samples.
    */
  final case class DecodedAudio(sampleRate: Int, channels: Int, samples: Array[Int])

  /** Decode an audio byte stream with JDK-builtin `javax.sound.sampled`
    * (PCM WAV/AIFF/AU). Each frame is mono-mixed (integer mean across
    * channels) and normalized to signed 16-bit regardless of the stored
    * bit depth, so downstream featurization is bit-identical across
    * containers. None when the stream is not a decodable PCM audio file.
    */
  private[graft] def decodeAudio(bytes: Array[Byte]): Option[DecodedAudio] = {
    val ais =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: UnsupportedAudioFileException | _: java.io.IOException => null }
    if (ais == null) None
    else {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      if ((enc != AudioFormat.Encoding.PCM_SIGNED && enc != AudioFormat.Encoding.PCM_UNSIGNED)
        || bits < 8 || bits > 32) None
      else {
        val data = ais.readAllBytes()
        val bytesPer = (bits + 7) / 8
        val ch = math.max(1, fmt.getChannels)
        val nFrames = data.length / (bytesPer * ch)
        val mono = new Array[Int](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0L
          var c = 0
          while (c < ch) {
            val off = (f * ch + c) * bytesPer
            var raw = 0L
            var b = 0
            while (b < bytesPer) {
              val idx = if (fmt.isBigEndian) off + b else off + (bytesPer - 1 - b)
              raw = (raw << 8) | (data(idx) & 0xff)
              b += 1
            }
            val signed =
              if (enc == AudioFormat.Encoding.PCM_UNSIGNED) raw - (1L << (bits - 1))
              else { val sh = 64 - bits; (raw << sh) >> sh } // sign-extend from `bits`
            val s16 = if (bits >= 16) (signed >> (bits - 16)).toInt
                      else (signed << (16 - bits)).toInt
            acc += s16
            c += 1
          }
          mono(f) = (acc / ch).toInt
          f += 1
        }
        Some(DecodedAudio(fmt.getSampleRate.toInt, ch, mono))
      }
    }
  }

  /** Decode + featurize each payload: one pass per partition, streaming.
    *
    * Image payloads decode for real (`javax.imageio`) and featurize as a
    * `dim`-bucket normalized luminance histogram with a pixel-stream
    * checksum. Audio payloads decode for real (`javax.sound.sampled`,
    * PCM WAV/AIFF/AU) and featurize as a `dim`-bucket amplitude
    * histogram over the mono-mixed 16-bit sample stream. Other kinds —
    * and rows whose bytes aren't a decodable stream — use the
    * deterministic byte-fold stand-in (STUB only for video: no JDK
    * video codec exists; swap that branch for a codec call in
    * production).
    */
  def decodeFeatures(media: Dataset[Media], dim: Int = 8,
                     video: VideoDecoder = ByteFoldVideoDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val decodedImg = if (m.kind == "image") decodeImage(m.bytes) else None
        val decodedAud = if (m.kind == "audio") decodeAudio(m.bytes) else None
        (decodedImg, decodedAud) match {
          case (Some(img), _) =>
            var checksum = 0L
            val hist = new Array[Float](dim)
            var i = 0
            while (i < img.gray.length) {
              val v = img.gray(i) & 0xff
              checksum = (checksum * 31 + v) % 1000000007L
              hist((v * dim) >> 8) += 1.0f
              i += 1
            }
            val n = math.max(1, img.gray.length).toFloat
            MediaFeatures(m.mediaId, m.kind, m.bytes.length.toLong, checksum, hist.map(_ / n))
          case (_, Some(aud)) =>
            var checksum = 0L
            val hist = new Array[Float](dim)
            var i = 0
            while (i < aud.samples.length) {
              val v = aud.samples(i) + 32768 // 0..65535
              checksum = (checksum * 31 + v) % 1000000007L
              hist((v * dim) >> 16) += 1.0f
              i += 1
            }
            val n = math.max(1, aud.samples.length).toFloat
            MediaFeatures(m.mediaId, m.kind, m.bytes.length.toLong, checksum, hist.map(_ / n))
          case _ =>
            val checksum = m.bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
            val feat = if (m.kind == "video") video.features(m.bytes, dim)
                       else byteFold(m.bytes, dim)
            MediaFeatures(m.mediaId, m.kind, m.bytes.length.toLong, checksum, feat)
        }
      }
    }
  }

  /** Deterministic byte-fold stand-in for kinds with no JDK codec. */
  private def byteFold(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) { out(i % dim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    out.map(v => v / math.max(1, bytes.length / dim).toFloat)
  }

  /** A decoded-and-resized image payload (luminance pixels). */
  final case class Resized(mediaId: Long, width: Int, height: Int, pixels: Array[Byte])

  /** Resize image-kind payloads to (outW, outH) by nearest-neighbor.
    *
    * The pixel grid comes from the REAL `javax.imageio` decode when the
    * bytes are a decodable image (its dims override any metadata);
    * otherwise the bytes are treated as a raw row-major single-channel
    * grid shaped by the stored (width, height) metadata. Rows that are
    * neither decodable nor carry positive metadata dims are dropped.
    */
  def resize(media: Dataset[Media], outW: Int, outH: Int): Dataset[Resized] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.flatMap { m =>
        val grid = decodeImage(m.bytes).orElse {
          if (m.width > 0 && m.height > 0) Some(DecodedImage(m.width, m.height, m.bytes)) else None
        }
        grid.map(g => Resized(m.mediaId, outW, outH, resample(g, outW, outH)))
      }
    }
  }

  /** Nearest-neighbor resample of a luminance grid to (outW, outH) —
    * shared by [[resize]] and the perceptual hash so the two can never
    * sample differently. Long arithmetic: y*height and sy*width overflow
    * Int for large (unvalidated, ingested) metadata dims, and a
    * wrapped-negative src would slip past the bounds guard.
    */
  private[graft] def resample(g: DecodedImage, outW: Int, outH: Int): Array[Byte] = {
    val out = new Array[Byte](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = math.min(g.height - 1L, y.toLong * g.height / outH)
      var x = 0
      while (x < outW) {
        val sx = math.min(g.width - 1L, x.toLong * g.width / outW)
        val src = sy * g.width + sx
        out(y * outW + x) = if (src >= 0 && src < g.gray.length) g.gray(src.toInt) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  /** A 64-bit perceptual image hash. */
  final case class MediaHash(mediaId: Long, phash: Long)

  /** Difference hash (dHash) of a luminance grid: resample to 9×8, bit
    * (y, x) = left pixel brighter than its right neighbor. Integer-only
    * and decode-deterministic, so the same pixels hash identically on
    * every JVM; small pixel noise / re-encode / mild resize flip few
    * bits, unrelated images differ in ~32.
    */
  private[graft] def dhash64(g: DecodedImage): Long = {
    val px = resample(g, 9, 8)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if ((px(y * 9 + x) & 0xff) > (px(y * 9 + x + 1) & 0xff)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** C74: perceptual hashes for image payloads — the multimodal analogue
    * of C3's text SimHash: one decode+hash pass reduces every image to
    * 8 bytes, after which near-dup detection is pure hash relational
    * algebra (pixels never cross an exchange). Undecodable image-kind
    * rows fall back to the metadata-shaped raw grid (the [[resize]]
    * contract); rows with neither are dropped.
    */
  def imagePhash(media: Dataset[Media]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.flatMap { m =>
        val grid = decodeImage(m.bytes).orElse {
          if (m.width > 0 && m.height > 0) Some(DecodedImage(m.width, m.height, m.bytes)) else None
        }
        grid.map(g => MediaHash(m.mediaId, dhash64(g)))
      }
    }
  }

  /** C74b: near-duplicate image detection — re-encodes, mild noise,
    * small crops/rescales of the same picture — by banded perceptual
    * hash + exact Hamming verify. The image-side dedup a multimodal
    * training pipeline runs next to text near-dup.
    *
    * Scale shape is EXACTLY C3's: the 64-bit hash splits into 4×16-bit
    * bands (pigeonhole: any pair within Hamming 3 shares a band
    * verbatim; 4–6 detect with the standard banding probability), ONE
    * repartition by (band, value) feeds both join sides (exchange
    * reuse), candidates join on 10-byte keys, and the popcount verify
    * filters BEFORE distinct so only survivors hit the final shuffle.
    * After [[imagePhash]]'s decode pass, image bytes are out of the
    * plan entirely.
    */
  def phashDedup(media: Dataset[Media], maxHamming: Int = 6): DataFrame =
    hashBandDedup(imagePhash(media).toDF()
      .select(col("mediaId").as("media_id"), col("phash")), maxHamming)

  /** Banded Hamming join over any (media_id, phash) relation — the one
    * shared near-dup kernel behind [[phashDedup]] and [[audioPhashDedup]].
    */
  private[graft] def hashBandDedup(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val bandArr = expr("array(" +
      (0 until 4).map(i => s"shiftright(phash, ${i * 16}) & 65535").mkString(", ") + ")")
    val bands = hashes.select(col("media_id"), col("phash"),
      posexplode(bandArr).as(Seq("band_idx", "band_val")))
    val parted = bands.repartition(col("band_idx"), col("band_val"))
    val a = parted.select(col("band_idx"), col("band_val"),
      col("media_id").as("id_a"), col("phash").as("ph_a"))
    val b = parted.select(col("band_idx").as("bi"), col("band_val").as("bv"),
      col("media_id").as("id_b"), col("phash").as("ph_b"))
    a.join(b, col("band_idx") === col("bi") && col("band_val") === col("bv") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(ph_a ^ ph_b)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming) // before distinct: survivors only
      .distinct()
  }

  /** 64-bit audio fingerprint (Haitsma-Kalker lineage, grid-simplified):
    * the clip splits into 8 equal time segments; each segment's energy
    * is probed at 9 fixed normalized frequencies (Goertzel — no FFT
    * dependency, fixed fold order so the doubles are bit-stable); bit
    * (t, b) = E[t][b] > E[t][b+1], the spectral-slope sign grid. Signs
    * are invariant under uniform amplitude scaling (every E scales by
    * c²), which is the robustness a volume-normalized re-encode needs;
    * a different melody flips band orderings wholesale.
    */
  private[graft] def audioHash64(a: DecodedAudio): Long = {
    val seg = a.samples.length / 8
    if (seg == 0) return 0L
    var bits = 0L
    var t = 0
    while (t < 8) {
      val off = t * seg
      val e = new Array[Double](9)
      var b = 0
      while (b < 9) {
        val coeff = 2.0 * math.cos(math.Pi * (b + 1) / 10.0)
        var s1 = 0.0; var s2 = 0.0
        var i = 0
        while (i < seg) {
          val s0 = a.samples(off + i) + coeff * s1 - s2
          s2 = s1; s1 = s0
          i += 1
        }
        e(b) = s1 * s1 + s2 * s2 - coeff * s1 * s2
        b += 1
      }
      var k = 0
      while (k < 8) {
        if (e(k) > e(k + 1)) bits |= 1L << (t * 8 + k)
        k += 1
      }
      t += 1
    }
    bits
  }

  /** C74c: audio fingerprints — one decode+Goertzel pass reduces every
    * clip to 8 bytes; undecodable audio-kind rows are dropped (there is
    * no honest raw-grid fallback for audio).
    */
  def audioPhash(media: Dataset[Media]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap(m => decodeAudio(m.bytes).map(a => MediaHash(m.mediaId, audioHash64(a))))
    }
  }

  /** C74d: near-duplicate audio detection (re-encodes, volume changes,
    * small noise) through the SAME banded Hamming kernel as the image
    * path — after the fingerprint pass, modality is gone from the plan.
    */
  def audioPhashDedup(media: Dataset[Media], maxHamming: Int = 6): DataFrame =
    hashBandDedup(audioPhash(media).toDF()
      .select(col("mediaId").as("media_id"), col("phash")), maxHamming)

  /** Frame sampling for video-kind payloads through the [[VideoDecoder]]
    * seam — the default strides `frameBytes`-sized slices (deterministic;
    * a production codec seeks keyframes instead). Explodes executor-side
    * — no driver involvement.
    */
  def frameSample(media: Dataset[Media], frameBytes: Int, everyN: Int,
                  video: VideoDecoder = ByteFoldVideoDecoder): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      video.frames(m.bytes, frameBytes, everyN).map { case (idx, off, fb) =>
        Frame(m.mediaId, idx, off, fb)
      }
    }
  }

  /** A frame decoded to real pixels: row-major luminance plane + dims. */
  final case class DecodedFrame(mediaId: Long, frameIdx: Int, offsetBytes: Long,
                                width: Int, height: Int, gray: Array[Byte])

  /** Frame sampling WITH decode for video-kind payloads: every Nth frame
    * demuxed and decoded to its luminance plane through the
    * [[VideoDecoder]] seam. The default [[ContainerVideoDecoder]]
    * sniffs the container per payload and routes to the real
    * AVI/Y4M/MP4 decoders; the byte-fold stand-in
    * still satisfies the same contract via the trait's self-describing
    * fallback. Decode runs strictly executor-side inside the flatMap —
    * partitioning, schema, and plan shape are identical whichever
    * decoder is plugged.
    */
  def frameDecode(media: Dataset[Media], everyN: Int = 1,
                  video: VideoDecoder = ContainerVideoDecoder): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      video.decodedFrames(m.bytes, everyN).map { case (idx, off, img) =>
        DecodedFrame(m.mediaId, idx, off, img.width, img.height, img.gray)
      }
    }
  }

  /** Metadata summary over a media set (pure relational on the typed ds). */
  def summarize(media: Dataset[Media]): DataFrame =
    media.toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"), sum(length(col("bytes"))).as("total_bytes"),
        avg(col("width")).as("avg_width"), avg(col("height")).as("avg_height"))
}
