package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.Media

/** C12: multimodal binary columns — image decode REAL (javax.imageio),
  * audio decode REAL (javax.sound.sampled PCM), video stand-in
  * deterministic, plumbing real throughout.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def media: Seq[Media] = Seq(
    Media(1, "image", Array.tabulate(64)(i => (i * 7).toByte), 8, 8, 0),
    Media(2, "image", Array.tabulate(128)(i => (i * 3).toByte), 16, 8, 0),
    Media(3, "audio", Array.tabulate(256)(i => (i % 97).toByte), 0, 0, 16000),
    Media(4, "video", Array.tabulate(1024)(i => (i % 251).toByte), 64, 48, 0))

  test("binary payloads round-trip through the Dataset with metadata") {
    val ds = Multimodal.ingest(spark, media)
    val back = ds.collect().sortBy(_.mediaId)
    assert(back.length == 4)
    assert(back(0).bytes.toSeq == media.head.bytes.toSeq)
    assert(back(2).sampleRate == 16000)
  }

  test("decodeFeatures is deterministic and partition-parallel") {
    val ds = Multimodal.ingest(spark, media).repartition(4)
    val f1 = Multimodal.decodeFeatures(ds).collect().sortBy(_.mediaId)
    val f2 = Multimodal.decodeFeatures(ds).collect().sortBy(_.mediaId)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq, "stable across runs")
    assert(f1.forall(_.feature.length == 8))
    assert(f1.map(_.nBytes).toSeq == Seq(64L, 128L, 256L, 1024L))
  }

  test("frameSample slices only video payloads at the stride") {
    val ds = Multimodal.ingest(spark, media)
    val frames = Multimodal.frameSample(ds, frameBytes = 128, everyN = 2).collect().sortBy(_.frameIdx)
    assert(frames.forall(_.mediaId == 4))
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 2, 4, 6), "1024/128=8 frames, every 2nd")
    assert(frames.forall(_.frameBytes.length == 128))
  }

  test("resize nearest-neighbor samples only image payloads") {
    val ds = Multimodal.ingest(spark, media)
    val r = Multimodal.resize(ds, outW = 4, outH = 4).collect().sortBy(_.mediaId)
    assert(r.map(_.mediaId).toSeq == Seq(1L, 2L), "image kinds only")
    assert(r.forall(x => x.width == 4 && x.height == 4 && x.pixels.length == 16))
    // media 1 is 8x8 with pixel (y,x) = ((y*8+x)*7).toByte; out (y,x)
    // samples source (2y, 2x)
    val m1 = r(0).pixels
    for (y <- 0 until 4; x <- 0 until 4)
      assert(m1(y * 4 + x) == ((2 * y * 8 + 2 * x) * 7).toByte, s"pixel ($y,$x)")
    // upscale: 8x8 -> 12x12 maps within bounds (no exception, right size)
    val up = Multimodal.resize(ds, outW = 12, outH = 12).collect()
    assert(up.forall(_.pixels.length == 144))
  }

  // a real encoded image: gray value at (x, y) = f(x, y), RGB channels
  // equal so the BT.601 luminance is exactly that value
  private def encoded(fmt: String, w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK has a $fmt writer")
    bos.toByteArray
  }

  test("a real PNG decodes via javax.imageio: known pixels survive resize") {
    // 8x8 gradient, gray(x, y) = (y*8 + x) * 4; metadata dims are
    // deliberately WRONG (1x1) to prove the DECODED dims drive the grid
    val png = Media(10, "image", encoded("png", 8, 8)((x, y) => (y * 8 + x) * 4), 1, 1, 0)
    val ds = Multimodal.ingest(spark, Seq(png))
    val r = Multimodal.resize(ds, outW = 4, outH = 4).collect()
    assert(r.length == 1 && r.head.pixels.length == 16)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((r.head.pixels(y * 4 + x) & 0xff) == (2 * y * 8 + 2 * x) * 4,
        s"decoded pixel ($y,$x): nearest-neighbor of the REAL 8x8 grid")
  }

  test("decodeFeatures histograms real decoded luminance") {
    // 64 gray values 0,4,...,252 — exactly 8 per 32-wide bucket, so the
    // 8-bin normalized histogram is uniform 0.125
    val png = Media(11, "image", encoded("png", 8, 8)((x, y) => (y * 8 + x) * 4), 0, 0, 0)
    val ds = Multimodal.ingest(spark, Seq(png)).repartition(2)
    val f = Multimodal.decodeFeatures(ds).collect().head
    assert(f.feature.toSeq == Seq.fill(8)(0.125f), s"uniform histogram: ${f.feature.toSeq}")
    val f2 = Multimodal.decodeFeatures(ds).collect().head
    assert(f.checksum == f2.checksum, "pixel-stream checksum deterministic")
    // undecodable image-kind rows keep the documented byte-fold fallback
    val raw = Multimodal.decodeFeatures(Multimodal.ingest(spark, media)).collect()
      .sortBy(_.mediaId)
    assert(raw.map(_.nBytes).toSeq == Seq(64L, 128L, 256L, 1024L))
  }

  test("a real JPEG decodes too (lossy: solid color within tolerance)") {
    val jpg = Media(12, "image", encoded("jpg", 6, 4)((_, _) => 128), 0, 0, 0)
    val r = Multimodal.resize(Multimodal.ingest(spark, Seq(jpg)), outW = 3, outH = 2).collect()
    assert(r.length == 1 && r.head.width == 3 && r.head.height == 2)
    assert(r.head.pixels.forall(p => math.abs((p & 0xff) - 128) <= 3),
      s"JPEG round-trip of a solid gray: ${r.head.pixels.map(_ & 0xff).toSeq}")
  }

  // a handcrafted RIFF/WAVE container around known PCM16LE samples
  // (interleaved when channels > 1) — no codec involved in construction,
  // so the decode path is tested against ground truth, not round-trip
  private def wav(samples: Array[Short], sampleRate: Int = 16000, channels: Int = 1): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("a real PCM WAV decodes via javax.sound.sampled: exact samples") {
    val s = Array[Short](-32768, -16384, 0, 16383, 32767, 1000, -1000, 12345)
    val d = Multimodal.decodeAudio(wav(s, 8000)).get
    assert(d.sampleRate == 8000 && d.channels == 1)
    assert(d.samples.toSeq == s.map(_.toInt).toSeq, "bit-exact PCM16 decode")
  }

  test("stereo WAV mono-mixes by integer mean; AIFF (big-endian) matches") {
    val left = Array[Short](100, -200, 3000, -4000)
    val right = Array[Short](300, -100, 1000, -2000)
    val inter = left.zip(right).flatMap { case (l, r) => Seq(l, r) }
    val d = Multimodal.decodeAudio(wav(inter, 16000, channels = 2)).get
    assert(d.channels == 2)
    assert(d.samples.toSeq == Seq(200, -150, 2000, -3000), "per-frame channel mean")
    // same samples through the JDK's AIFF writer (big-endian container)
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, true)
    val raw = new Array[Byte](inter.length * 2)
    java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.BIG_ENDIAN).asShortBuffer().put(inter)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, left.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val d2 = Multimodal.decodeAudio(bos.toByteArray).get
    assert(d2.samples.toSeq == d.samples.toSeq, "container-independent decode")
  }

  test("decodeFeatures histograms real decoded audio amplitude") {
    // 16 samples covering each of the 8 amplitude buckets exactly twice
    val s = (0 until 16).map(i => ((i % 8) * 8192 - 32768).toShort).toArray
    val m = Media(20, "audio", wav(s), 0, 0, 16000)
    val f = Multimodal.decodeFeatures(Multimodal.ingest(spark, Seq(m)).repartition(2))
      .collect().head
    assert(f.feature.toSeq == Seq.fill(8)(0.125f), s"uniform amplitude hist: ${f.feature.toSeq}")
    val expect = s.foldLeft(0L)((a, v) => (a * 31 + (v + 32768)) % 1000000007L)
    assert(f.checksum == expect, "checksum over the u16 sample stream")
    // non-WAV audio bytes keep the documented byte-fold fallback
    val junk = Multimodal.decodeFeatures(Multimodal.ingest(spark, Seq(media(2)))).collect().head
    assert(junk.nBytes == 256L)
  }

  // a handcrafted MJPEG-AVI: RIFF('AVI ' LIST('hdrl' avih) LIST('movi'
  // 00dc-chunks)) with each frame an independently-encoded real JPEG.
  // Container built by hand (no muxer involved), so the demux path is
  // tested against ground truth, not round-trip.
  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def u32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val padded = if (data.length % 2 == 1) data :+ 0.toByte else data
      fourcc(id) ++ u32(data.length) ++ padded
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(typ) ++ body)
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56))) // minimal, zeros
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ u32(body.length) ++ body
  }

  test("MJPEG-AVI demux + real JPEG decode: planted frame luminance recovered") {
    // three solid-gray frames at distinct planted levels; odd JPEG byte
    // lengths exercise the word-alignment padding in the chunk walk
    val levels = Seq(40, 128, 220)
    val jpegs = levels.map(v => encoded("jpg", 8, 6)((_, _) => v))
    val avi = mjpegAvi(jpegs)
    val ds = Multimodal.ingest(spark, Seq(Media(20, "video", avi, 0, 0, 0)))
    val decoded = Multimodal.frameDecode(ds).collect().sortBy(_.frameIdx)
    assert(decoded.length == 3, s"all three frames demux and decode: ${decoded.length}")
    decoded.zip(levels).foreach { case (f, want) =>
      assert(f.width == 8 && f.height == 6, s"REAL decoded dims, not metadata: ${f.width}x${f.height}")
      val mean = f.gray.map(_ & 0xff).sum / f.gray.length
      assert(math.abs(mean - want) <= 3,
        s"frame ${f.frameIdx}: decoded mean luminance $mean ≈ planted $want (lossy tolerance)")
    }
    // offsets are real container positions: monotonic, each at a JPEG SOI
    val offs = decoded.map(_.offsetBytes).toSeq
    assert(offs == offs.sorted && offs.distinct.length == 3, s"container offsets: $offs")
    offs.foreach(o => assert((avi(o.toInt) & 0xff) == 0xff && (avi(o.toInt + 1) & 0xff) == 0xd8,
      s"offset $o points at a JPEG SOI marker"))
    // everyN sampling
    val sampled = Multimodal.frameDecode(ds, everyN = 2).collect().map(_.frameIdx).sorted
    assert(sampled.toSeq == Seq(0, 2), s"every-2nd-frame sampling: ${sampled.toSeq}")
    // features: solid 40/128/220 land in 8-bucket bins 1, 4, 6 with mass
    // ~1/3 each (JPEG ringing on solid frames is sub-tolerance)
    val feat = Multimodal.decodeFeatures(ds, dim = 8,
      video = Multimodal.AviVideoDecoder).collect().head.feature
    Seq(1, 4, 6).foreach(b =>
      assert(feat(b) > 0.30f && feat(b) < 0.37f, s"bucket $b mass ≈ 1/3: ${feat.toSeq}"))
    assert(math.abs(feat.sum - 1.0f) < 1e-3, s"histogram normalized: ${feat.sum}")
    // corrupt/non-AVI payloads degrade to no frames + zero vector, no throw
    val junk = Multimodal.ingest(spark, Seq(Media(21, "video", Array.fill[Byte](64)(7), 0, 0, 0)))
    assert(Multimodal.frameDecode(junk).collect().isEmpty, "junk payload: zero frames")
    val junkFeat = Multimodal.decodeFeatures(junk, dim = 8,
      video = Multimodal.AviVideoDecoder).collect().head.feature
    assert(junkFeat.toSeq == Seq.fill(8)(0.0f), s"junk payload: zero vector ${junkFeat.toSeq}")
    // truncated container (size fields running past the buffer) is safe
    val truncated = java.util.Arrays.copyOfRange(avi, 0, avi.length / 2)
    assert(Multimodal.ingest(spark, Seq(Media(22, "video", truncated, 0, 0, 0)))
      .transform(Multimodal.frameDecode(_)).collect()
      .forall(f => f.width > 0 && f.height > 0), "truncated container: only whole frames decode")
  }

  // AVI with a full hdrl/strl/strh(vids)/strf(BITMAPINFOHEADER+palette)
  // header — the shape the DIB/RLE8 decode needs (dims + palette come
  // from strf, not the frames). Built by hand against the public spec.
  private def dibAvi(frames: Seq[Array[Byte]], w: Int, h: Int, bitCount: Int,
                     compression: Int, palette: Seq[(Int, Int, Int)]): Array[Byte] = {
    def u32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def u16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val padded = if (data.length % 2 == 1) data :+ 0.toByte else data
      fourcc(id) ++ u32(data.length) ++ padded
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(typ) ++ body)
    val bih = u32(40) ++ u32(w) ++ u32(h) ++ u16(1) ++ u16(bitCount) ++
      u32(compression) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(palette.size) ++ u32(0)
    val pal = palette.flatMap { case (r, g, b) =>
      Array(b.toByte, g.toByte, r.toByte, 0.toByte) }.toArray
    val strl = list("strl",
      chunk("strh", fourcc("vids") ++ new Array[Byte](52)) ++ chunk("strf", bih ++ pal))
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)) ++ strl)
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ u32(body.length) ++ body
  }

  test("MS-RLE8 AVI frames decode pixel-exactly through the palette") {
    // palette: 0=black, 1=white, 2=pure red (lum 76 via BT.601 fixed pt)
    val palette = Seq((0, 0, 0), (255, 255, 255), (255, 0, 0))
    // target 4x3 image, top-down rows: (1 1 2 2) / (0 0 0 0) / (1 0 1 0)
    // RLE8 encodes bottom-up: absolute run, encoded runs, EOL/EOD escapes
    val rle: Array[Byte] = Array[Int](
      0, 4, 1, 0, 1, 0, 0, 0, // bottom row: absolute run of 4 (even: no pad), EOL
      4, 0, 0, 0,             // middle row: encoded run 4x idx0, EOL
      2, 1, 2, 2, 0, 0,       // top row: 2x idx1, 2x idx2, EOL
      0, 1                    // end of bitmap
    ).map(_.toByte)
    val avi = dibAvi(Seq(rle), 4, 3, bitCount = 8, compression = 1, palette)
    val ds = Multimodal.ingest(spark, Seq(Media(30, "video", avi, 0, 0, 0)))
    val f = Multimodal.frameDecode(ds).collect().head
    assert((f.width, f.height) == (4, 3), s"dims from strf: ${(f.width, f.height)}")
    val got = f.gray.map(_ & 0xff).toSeq
    assert(got == Seq(255, 255, 76, 76, 0, 0, 0, 0, 255, 0, 255, 0),
      s"RLE8 planted pattern decodes pixel-exactly: $got")
  }

  test("uncompressed-DIB AVI frames decode pixel-exactly (bottom-up, padded stride)") {
    // 2x2 BGR24, 8-byte stride (2 pad bytes/row), bottom-up rows:
    // file order = bottom row (blue, white) then top row (red, green)
    val frame: Array[Byte] = Array[Int](
      255, 0, 0, 255, 255, 255, 0, 0, // bottom: blue px, white px, pad
      0, 0, 255, 0, 255, 0, 0, 0      // top: red px, green px, pad
    ).map(_.toByte)
    val avi = dibAvi(Seq(frame), 2, 2, bitCount = 24, compression = 0, Seq.empty)
    val ds = Multimodal.ingest(spark, Seq(Media(31, "video", avi, 0, 0, 0)))
    val f = Multimodal.frameDecode(ds).collect().head
    val got = f.gray.map(_ & 0xff).toSeq
    // BT.601 fixed point: red 76, green 149, blue 29, white 255
    assert(got == Seq(76, 149, 29, 255), s"DIB planted pattern: $got")
    // and the feature path runs the same decode (no byte-fold)
    val feat = Multimodal.decodeFeatures(ds, dim = 4,
      video = Multimodal.AviVideoDecoder).collect().head.feature
    assert(math.abs(feat.sum - 1.0f) < 1e-3 && feat(0) > 0.2f,
      s"video features from real DIB luminance: ${feat.toSeq}")
  }

  test("RLE8 delta frames inherit the previous frame (inter-frame decode)") {
    val palette = Seq((0, 0, 0), (255, 255, 255), (255, 0, 0))
    val key: Array[Byte] = Array[Int](
      0, 4, 1, 0, 1, 0, 0, 0, // bottom row: absolute run of 4, EOL
      4, 0, 0, 0,             // middle row: encoded run 4x idx0, EOL
      2, 1, 2, 2, 0, 0,       // top row: 2x idx1, 2x idx2, EOL
      0, 1).map(_.toByte)
    // delta frame: 00 02 dx=2 dy=1 jumps to (2,1) — everything skipped
    // stays as the PREVIOUS frame — then overwrites two pixels, EOD
    val delta: Array[Byte] = Array[Int](0, 2, 2, 1, 2, 1, 0, 1).map(_.toByte)
    val avi = dibAvi(Seq(key, delta), 4, 3, bitCount = 8, compression = 1, palette)
    val ds = Multimodal.ingest(spark, Seq(Media(32, "video", avi, 0, 0, 0)))
    val fr = Multimodal.frameDecode(ds).collect().sortBy(_.frameIdx)
    assert(fr.length == 2)
    val f0 = fr(0).gray.map(_ & 0xff).toSeq
    val f1 = fr(1).gray.map(_ & 0xff).toSeq
    assert(f0 == Seq(255, 255, 76, 76, 0, 0, 0, 0, 255, 0, 255, 0))
    // frame 1 = frame 0 with only (2,1)/(3,1) bottom-up — the middle
    // top-down row's last two pixels — rewritten to white
    assert(f1 == Seq(255, 255, 76, 76, 0, 0, 255, 255, 255, 0, 255, 0),
      s"delta frame inherits unskipped pixels from the keyframe: $f1")
  }

  test("MS Video 1 (CRAM) decodes: 1/2/8-color blocks and inter-frame skip") {
    // grayscale palette so lum(idx i) == 10*i exactly
    val palette = (0 to 8).map(i => (10 * i, 10 * i, 10 * i))
    val cram = 0x43 | (0x52 << 8) | (0x41 << 16) | (0x4D << 24) // "CRAM" LE
    // 8x4 = two 4x4 blocks, one block row
    // keyframe: block0 = 1-color idx5; block1 = 2-color flags 0x5555
    // (LSB-first, set bit -> color0): alternating c0=1, c1=2 per pixel
    val key: Array[Byte] = Array[Int](
      0x05, 0x80,             // 1-color block, color 5
      0x55, 0x55, 0x01, 0x02  // 2-color block
    ).map(_.toByte)
    // frame 1: skip 1 block (block0 inherits idx5), block1 -> 8-color:
    // quadrant color pairs (BL, BR, TL, TR) x (set->first, clear->second);
    // flags 0x7FFF (the flag high byte must stay < 0x80 — that byte also
    // selects the block mode, so bit 15 is the only clear bit: pixel
    // (3,3) takes its quadrant's SECOND color); first color 0x84 has the
    // high bit SET — the 8-color signal
    val f1: Array[Byte] = Array[Int](
      0x01, 0x84,             // skip 1 block
      0xff, 0x7f, 0x84, 0x01, 0x03, 0x02, 0x06, 0x04, 0x08, 0x07
    ).map(_.toByte)
    val avi = dibAvi(Seq(key, f1), 8, 4, bitCount = 8, compression = cram, palette)
    val ds = Multimodal.ingest(spark, Seq(Media(33, "video", avi, 0, 0, 0)))
    val fr = Multimodal.frameDecode(ds).collect().sortBy(_.frameIdx)
    assert(fr.length == 2)
    val g0 = fr(0).gray.map(_ & 0xff).toSeq
    // every row: 4x lum(5)=50 then alternating 10, 20 (flags repeat per row)
    assert(g0 == Seq.fill(4)(Seq(50, 50, 50, 50, 10, 20, 10, 20)).flatten,
      s"keyframe 1-color + 2-color blocks: $g0")
    val g1 = fr(1).gray.map(_ & 0xff).toSeq
    // block0 inherited via skip; block1 quadrants (8-color; 0x84 is past
    // the palette -> lum = the idx byte itself = 132): bottom-left pair
    // (0x84, 0x01), bottom-right (0x03, 0x02), top-left (0x06, 0x04),
    // top-right (0x08, 0x07). Set flags pick the FIRST of the pair;
    // the single clear bit 15 = pixel (3,3) picks TR's second (0x07->70).
    // top-down rows: top half = TL/TR quadrants, bottom half = BL/BR
    val q = Seq(
      Seq(50, 50, 50, 50, 60, 60, 80, 70),  // top row: (3,3) -> 0x07
      Seq(50, 50, 50, 50, 60, 60, 80, 80),
      Seq(50, 50, 50, 50, 132, 132, 30, 30), // bottom rows: BL=0x84->132, BR=0x03->30
      Seq(50, 50, 50, 50, 132, 132, 30, 30)).flatten
    assert(g1 == q, s"skip inherits block0, 8-color quadrants land: $g1")
  }

  test("imagePhash: gradient hashes are exact; dedup pairs the noisy re-render only") {
    // base = horizontal gradient (left < right at every 9x8 sample with
    // margin >= 24) -> dHash all-zero; dup adds +/-1 noise (inside the
    // margin -> IDENTICAL hash); rev = reversed gradient -> all-ones;
    // topRev reverses only resampled row 0 -> bits 0..7 -> hamming 8
    val base = Media(1, "image", encoded("png", 32, 32)((x, _) => x * 8), 0, 0, 0)
    val dup = Media(2, "image",
      encoded("png", 32, 32)((x, y) => math.max(0, math.min(255, x * 8 + ((x + y) % 3) - 1))), 0, 0, 0)
    val rev = Media(3, "image", encoded("png", 32, 32)((x, _) => 248 - x * 8), 0, 0, 0)
    val topRev = Media(4, "image",
      encoded("png", 32, 32)((x, y) => if (y < 4) 248 - x * 8 else x * 8), 0, 0, 0)
    val vid = Media(9, "video", Array.fill[Byte](64)(7), 0, 0, 0)
    val ds = Multimodal.ingest(spark, Seq(base, dup, rev, topRev, vid))
    val hashes = Multimodal.imagePhash(ds).collect().map(h => h.mediaId -> h.phash).toMap
    assert(hashes == Map(1L -> 0L, 2L -> 0L, 3L -> -1L, 4L -> 255L),
      s"exact dHash values (video-kind excluded): $hashes")
    val pairs = Multimodal.phashDedup(ds).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 0L)),
      s"only the noisy re-render pairs at maxHamming 6: $pairs")
    // at hamming 8 the top-reversed variant shares 3 of 4 bands, so the
    // banded candidate generation surfaces it once the verify allows it
    val loose = Multimodal.phashDedup(ds, maxHamming = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(loose == Set((1L, 2L, 0L), (1L, 4L, 8L), (2L, 4L, 8L)),
      s"banded recall at hamming 8: $loose")
  }

  test("summarize aggregates by kind") {
    val s = Multimodal.summarize(Multimodal.ingest(spark, media)).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(s == Map("audio" -> 256L, "image" -> 192L, "video" -> 1024L))
  }

  // ---- C74c/C74d: audio fingerprints ----

  // deterministic pseudo-random PCM: even-valued samples (so an exact
  // half-amplitude copy exists in int16) in [-1000, 998]
  private def lcgSamples(seed: Long, n: Int): Array[Short] = {
    var x = seed
    Array.fill(n) {
      x = (x * 1103515245L + 12345L) & 0x7fffffffL
      (2 * (((x >>> 16) % 1000L).toInt - 500)).toShort
    }
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
  private def bandsOf(h: Long): Seq[Long] = (0 until 4).map(i => (h >>> (i * 16)) & 0xffffL)

  test("audioHash64: exact bit grid vs an independent DFT reference") {
    // the hash's Goertzel energy is |X(w)|^2 for ANY w (the Chebyshev
    // identity, not just bin frequencies) — so a plain DFT computed here
    // with different arithmetic is a true independent oracle for the
    // segment split, probe frequencies, and (t*8+k) bit layout
    val n = 4096
    val samples = lcgSamples(20260815L, n).map(_.toInt)
    val seg = n / 8
    var expected = 0L
    var minMargin = Double.MaxValue
    for (t <- 0 until 8) {
      val e = (0 until 9).map { b =>
        val w = math.Pi * (b + 1) / 10.0
        var re = 0.0; var im = 0.0
        for (i <- 0 until seg) {
          re += samples(t * seg + i) * math.cos(w * i)
          im += samples(t * seg + i) * math.sin(w * i)
        }
        re * re + im * im
      }
      for (k <- 0 until 8) {
        minMargin = math.min(minMargin, math.abs(e(k) - e(k + 1)) / math.max(e(k), e(k + 1)))
        if (e(k) > e(k + 1)) expected |= 1L << (t * 8 + k)
      }
    }
    assert(minMargin > 1e-6, s"fixture margin too thin for FP-stable bits: $minMargin")
    val direct = Multimodal.audioHash64(Multimodal.DecodedAudio(8000, 1, samples))
    assert(direct == expected, f"kernel bits 0x$direct%016x vs DFT reference 0x$expected%016x")
    // and the full Dataset path (WAV container -> decode -> hash) agrees
    val m = Media(41, "audio", wav(samples.map(_.toShort), 8000), 0, 0, 8000)
    val viaDs = Multimodal.audioPhash(Multimodal.ingest(spark, Seq(m))).collect()
    assert(viaDs.map(h => h.mediaId -> h.phash).toMap == Map(41L -> expected))
  }

  test("audioPhashDedup: amplitude-invariant; noisy re-encode pairs; different melody excluded") {
    val n = 4096
    val base = lcgSamples(20260815L, n)
    val half = base.map(s => (s / 2).toShort) // exact: all base samples even
    val noiseLcg = lcgSamples(7L, n)
    val noisy = base.zipWithIndex.map { case (s, i) => (s + (noiseLcg(i) % 3)).toShort }
    val other = lcgSamples(999L, n)
    def hashOf(s: Array[Short]) =
      Multimodal.audioHash64(Multimodal.DecodedAudio(8000, 1, s.map(_.toInt)))
    val (hb, hh, hn, ho) = (hashOf(base), hashOf(half), hashOf(noisy), hashOf(other))
    // energies scale by c^2 under uniform gain; halving is FP-exact, so
    // the sign grid — hence the fingerprint — is bit-identical
    assert(hb == hh, f"half-amplitude copy must hash identically: 0x$hb%016x vs 0x$hh%016x")
    assert(hamming(hb, hn) <= 6, s"noisy dup drifted past the dedup bar: ${hamming(hb, hn)}")
    assert(bandsOf(hb).zip(bandsOf(hn)).exists(p => p._1 == p._2),
      "fixture must keep the noisy dup reachable through the banded join")
    assert(hamming(hb, ho) >= 12, s"independent melody should differ wholesale: ${hamming(hb, ho)}")
    val ms = Seq(
      Media(51, "audio", wav(base, 8000), 0, 0, 8000),
      Media(52, "audio", wav(half, 8000), 0, 0, 8000),
      Media(53, "audio", wav(noisy, 8000), 0, 0, 8000),
      Media(54, "audio", wav(other, 8000), 0, 0, 8000),
      Media(55, "image", encoded("png", 8, 8)((x, _) => x * 30), 0, 0, 0))
    // expected = the kernel's contract: candidate iff a 16-bit band
    // matches verbatim, survivor iff popcount <= maxHamming
    val hs = Map(51L -> hb, 52L -> hh, 53L -> hn, 54L -> ho)
    val expect = (for {
      a <- hs.keys; b <- hs.keys if a < b
      if hamming(hs(a), hs(b)) <= 6
      if bandsOf(hs(a)).zip(bandsOf(hs(b))).exists(p => p._1 == p._2)
    } yield (a, b, hamming(hs(a), hs(b)).toLong)).toSet
    assert(expect.contains((51L, 52L, 0L)) && expect.exists(p => p._1 == 51L && p._2 == 53L))
    assert(!expect.exists(p => p._1 == 54L || p._2 == 54L))
    val got = Multimodal.audioPhashDedup(Multimodal.ingest(spark, ms)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, s"audio near-dup pairs (image row must be out of the plan): $got vs $expect")
  }

  test("hashBandDedup: pigeonhole recall — 8 flips in one band found, 2-per-band spread missed") {
    import spark.implicits._
    // id1/id4 identical; id3 differs from them by bits 0..7 (all in band
    // 0 -> shares 3 bands); id2 differs from id1 by 2 bits in EVERY band
    // -> no band matches, so banding cannot surface it at any threshold
    val hashes = Seq((1L, 0L), (2L, 0x0003000300030003L), (3L, 255L), (4L, 0L))
      .toDF("media_id", "phash")
    def run(maxH: Int) = Multimodal.hashBandDedup(hashes, maxH).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(8) == Set((1L, 3L, 8L), (1L, 4L, 0L), (3L, 4L, 8L)),
      "hamming-8-in-one-band pairs surface at 8; the 2-per-band spread is the documented miss")
    assert(run(6) == Set((1L, 4L, 0L)), "verify bound excludes the hamming-8 pairs at 6")
  }

  /** A YUV4MPEG2 stream: header line + FRAME-marked raw planes. */
  private def y4m(w: Int, h: Int, cs: String, frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C$cs\n".getBytes("US-ASCII"))
    frames.foreach { f => out.write("FRAME\n".getBytes("US-ASCII")); out.write(f) }
    out.toByteArray
  }

  test("Y4M decode is pixel-exact (the Y plane IS the luminance); chroma sizes per colorspace") {
    import graft.operators.Multimodal.Y4mVideoDecoder
    val w = 4; val h = 2
    val y0 = Array.tabulate(w * h)(i => (i * 10).toByte)
    val y1 = Array.tabulate(w * h)(i => (200 - i).toByte)
    // C420: Y + quarter-size U and V planes
    def frame(y: Array[Byte]) = y ++ Array.fill(2 * (w / 2) * (h / 2))(0x80.toByte)
    val bytes = y4m(w, h, "420", Seq(frame(y0), frame(y1)))
    val dec = Y4mVideoDecoder.decodedFrames(bytes, 1).toSeq
    assert(dec.map(_._1) == Seq(0, 1), s"both frames decode: ${dec.map(_._1)}")
    assert(dec.head._3.width == w && dec.head._3.height == h)
    assert(dec(0)._3.gray.toSeq == y0.toSeq && dec(1)._3.gray.toSeq == y1.toSeq,
      "Y planes recovered byte-exactly")
    // everyN sampling + mono colorspace (no chroma planes at all)
    val mono = y4m(w, h, "mono", Seq(y0, y1, y0))
    val sampled = Y4mVideoDecoder.decodedFrames(mono, 2).toSeq
    assert(sampled.map(_._1) == Seq(0, 2), s"every 2nd frame: ${sampled.map(_._1)}")
    // a truncated final frame yields only the complete ones
    val trunc = java.util.Arrays.copyOf(bytes, bytes.length - 3)
    assert(Y4mVideoDecoder.decodedFrames(trunc, 1).size == 1, "truncated tail dropped")
    // garbage in, nothing out
    assert(Y4mVideoDecoder.decodedFrames("nonsense".getBytes, 1).isEmpty)
  }

  /** Minimal ISO-BMFF: mdat with the sample payloads + a moov/trak video
    * sample table (stsd/stsz/stsc/stco) mapping them across two chunks.
    */
  private def mp4(samples: Seq[Array[Byte]]): (Array[Byte], Seq[Long]) = {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ t.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
    // chunk 1 = samples 0,1; chunk 2 = sample 2 (exercises the stsc runs)
    val mdatPayload = samples.flatten.toArray
    val mdat = box("mdat", mdatPayload)
    val chunk1Off = ftyp.length + 8L // into mdat payload
    val offs = Seq(chunk1Off, chunk1Off + samples.take(2).map(_.length).sum)
    val stsd = box("stsd", be32(0) ++ be32(1) ++ box("avc1",
      Array.fill[Byte](6)(0) ++ Array[Byte](0, 1) ++ Array.fill[Byte](16)(0) ++
        Array[Byte](0, 16, 0, 8) ++ Array.fill[Byte](44)(0)))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(samples.length) ++
      samples.flatMap(s => be32(s.length)).toArray)
    val stsc = box("stsc", be32(0) ++ be32(2) ++
      (be32(1) ++ be32(2) ++ be32(1)) ++ (be32(2) ++ be32(1) ++ be32(1)))
    val stco = box("stco", be32(0) ++ be32(offs.length) ++ offs.flatMap(be32).toArray)
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco)
    val minf = box("minf", stbl)
    val hdlr = box("hdlr", be32(0) ++ be32(0) ++ "vide".getBytes ++ Array.fill[Byte](12)(0))
    val mdia = box("mdia", hdlr ++ minf)
    val trak = box("trak", mdia)
    val moov = box("moov", trak)
    (ftyp ++ mdat ++ moov, offs)
  }

  test("MP4 demux: sample-table arithmetic recovers exact byte ranges across chunk runs") {
    import graft.operators.Multimodal.Mp4VideoDecoder
    val samples = Seq(Array.tabulate(5)(_.toByte), Array.tabulate(7)(i => (i + 50).toByte),
      Array.tabulate(3)(i => (i + 100).toByte))
    val (bytes, offs) = mp4(samples)
    val tr = Mp4VideoDecoder.videoTrack(bytes)
    assert(tr.isDefined, "vide track found")
    assert(tr.get.codec == "avc1" && tr.get.width == 16 && tr.get.height == 8, s"${tr.get}")
    val got = Mp4VideoDecoder.frames(bytes, 0, 1).toSeq
    assert(got.map(_._1) == Seq(0, 1, 2))
    assert(got.map(_._2) == Seq(offs(0), offs(0) + 5, offs(1)),
      s"chunk-run offsets: ${got.map(_._2)} vs $offs")
    assert(got.map(_._3.toSeq) == samples.map(_.toSeq), "payloads byte-exact")
    // everyN demux sampling
    assert(Mp4VideoDecoder.frames(bytes, 0, 2).map(_._1).toSeq == Seq(0, 2))
    // H.264 payloads demux but don't decode (no JDK codec -- documented seam)
    assert(Mp4VideoDecoder.decodedFrames(bytes, 1).isEmpty)
  }

  test("hostile containers degrade, never kill: claimed-count and dimension attacks") {
    import graft.operators.Multimodal.{Mp4VideoDecoder, Y4mVideoDecoder}
    // stsz claiming 2^31-1 samples (16 GB allocation) / 2^31 (negative
    // Int) inside a tiny box: the clamp bounds by actual box bytes
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ t.getBytes("US-ASCII") ++ payload
    for (claimed <- Seq(0x7fffffffL, 0x80000000L)) {
      val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(claimed) ++ be32(5))
      val stsc = box("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(1) ++ be32(1))
      val stco = box("stco", be32(0) ++ be32(claimed)) // claimed chunks, zero entries' bytes
      val evil = box("ftyp", "isom".getBytes ++ be32(0)) ++
        box("moov", box("trak", box("mdia",
          box("hdlr", be32(0) ++ be32(0) ++ "vide".getBytes ++ Array.fill[Byte](12)(0)) ++
          box("minf", box("stbl",
            box("stsd", be32(0) ++ be32(1) ++ box("avc1", Array.fill[Byte](70)(0))) ++
            stsz ++ stsc ++ stco)))))
      // must neither throw nor allocate count-sized arrays
      assert(Mp4VideoDecoder.frames(evil, 0, 1).size <= 1,
        s"claimed=$claimed clamped to the box's real bytes")
    }
    // co64 with the top bit set: a NEGATIVE Long offset must be dropped
    // by the bounds guard, not crash copyOfRange (degrade-don't-kill)
    {
      def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
      val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(2) ++ be32(4) ++ be32(4))
      val stsc = box("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(2) ++ be32(1))
      val co64 = box("co64", be32(0) ++ be32(1) ++ be64(0x8000000000000010L))
      val evil = box("ftyp", "isom".getBytes ++ be32(0)) ++
        box("mdat", Array.fill[Byte](16)(7)) ++
        box("moov", box("trak", box("mdia",
          box("hdlr", be32(0) ++ be32(0) ++ "vide".getBytes ++ Array.fill[Byte](12)(0)) ++
          box("minf", box("stbl",
            box("stsd", be32(0) ++ be32(1) ++ box("avc1", Array.fill[Byte](70)(0))) ++
            stsz ++ stsc ++ co64)))))
      assert(Mp4VideoDecoder.frames(evil, 0, 1).isEmpty,
        "negative co64 offsets dropped, no ArrayIndexOutOfBounds")
    }
    // constant-size stsz claiming 256M samples: sample count must be
    // bounded by container-bytes/const (total sample bytes can't exceed
    // the file) and nothing count-sized may materialize — the demux is
    // lazy, so taking 3 must return instantly
    {
      val stsz = box("stsz", be32(0) ++ be32(64) ++ be32(256L * 1024 * 1024))
      val stsc = box("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(0x7fffffffL) ++ be32(1))
      val stco = box("stco", be32(0) ++ be32(1) ++ be32(40))
      val evil = box("ftyp", "isom".getBytes ++ be32(0)) ++
        box("mdat", Array.fill[Byte](256)(1)) ++
        box("moov", box("trak", box("mdia",
          box("hdlr", be32(0) ++ be32(0) ++ "vide".getBytes ++ Array.fill[Byte](12)(0)) ++
          box("minf", box("stbl",
            box("stsd", be32(0) ++ be32(1) ++ box("avc1", Array.fill[Byte](70)(0))) ++
            stsz ++ stsc ++ stco)))))
      val tr = Mp4VideoDecoder.videoTrack(evil).get
      assert(tr.varSizes == null, "constant-size form stores no sizes array")
      assert(tr.sampleCount <= evil.length / 64,
        s"const-stsz count bounded by payload: ${tr.sampleCount}")
      assert(Mp4VideoDecoder.frames(evil, 0, 1).take(3).size <= 3)
    }
    // Y4M header whose w*h overflows Int: garbage yields no frames
    val evilY4m = ("YUV4MPEG2 W65540 H65540 Cmono\nFRAME\n" + "x" * 64).getBytes("US-ASCII")
    assert(Y4mVideoDecoder.decodedFrames(evilY4m, 1).isEmpty, "overflowing dims rejected")
    // and a frame bigger than the whole payload can never decode
    val tooBig = ("YUV4MPEG2 W100 H100 Cmono\nFRAME\n" + "x" * 50).getBytes("US-ASCII")
    assert(Y4mVideoDecoder.decodedFrames(tooBig, 1).isEmpty, "oversized frame rejected")
  }

  test("MP4 stss keyframe demux: sync samples only; no stss = every sample") {
    import graft.operators.Multimodal.Mp4VideoDecoder
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ t.getBytes("US-ASCII") ++ payload
    val samples = Seq(Array.tabulate(5)(_.toByte), Array.tabulate(7)(i => (i + 50).toByte),
      Array.tabulate(3)(i => (i + 100).toByte))
    val (plain, _) = mp4(samples)
    // no stss box: every sample is a sync point (ISO-BMFF default)
    assert(Mp4VideoDecoder.keyframes(plain).map(_._1).toSeq == Seq(0, 1, 2))
    // graft an stss marking samples 1 and 3 (1-based) into the stbl by
    // rebuilding the container with the extra box
    def mp4WithStss(sync: Seq[Int]): Array[Byte] = {
      val mdatPayload = samples.flatten.toArray
      val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
      val mdat = box("mdat", mdatPayload)
      val chunk1Off = ftyp.length + 8L
      val offs = Seq(chunk1Off, chunk1Off + samples.take(2).map(_.length).sum)
      val stsd = box("stsd", be32(0) ++ be32(1) ++ box("avc1",
        Array.fill[Byte](6)(0) ++ Array[Byte](0, 1) ++ Array.fill[Byte](16)(0) ++
          Array[Byte](0, 16, 0, 8) ++ Array.fill[Byte](44)(0)))
      val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(samples.length) ++
        samples.flatMap(s => be32(s.length)).toArray)
      val stsc = box("stsc", be32(0) ++ be32(2) ++
        (be32(1) ++ be32(2) ++ be32(1)) ++ (be32(2) ++ be32(1) ++ be32(1)))
      val stco = box("stco", be32(0) ++ be32(offs.length) ++ offs.flatMap(be32).toArray)
      val stss = box("stss", be32(0) ++ be32(sync.length) ++ sync.flatMap(s => be32(s)).toArray)
      val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco ++ stss)
      val hdlr = box("hdlr", be32(0) ++ be32(0) ++ "vide".getBytes ++ Array.fill[Byte](12)(0))
      ftyp ++ mdat ++ box("moov", box("trak", box("mdia", hdlr ++ box("minf", stbl))))
    }
    val withStss = mp4WithStss(Seq(1, 3))
    val kf = Mp4VideoDecoder.keyframes(withStss).toSeq
    assert(kf.map(_._1) == Seq(0, 2), s"only sync samples demux: ${kf.map(_._1)}")
    assert(kf.map(_._3.toSeq) == Seq(samples(0).toSeq, samples(2).toSeq), "payloads byte-exact")
    // full demux is unaffected by the presence of stss
    assert(Mp4VideoDecoder.frames(withStss, 0, 1).map(_._1).toSeq == Seq(0, 1, 2))
    // a PRESENT stss with ZERO entries means NO sync samples — the
    // opposite of no-stss (ISO 14496-12 §8.6.2; review r16 found the
    // two conflated, which inverted hostile empty-stss containers)
    assert(Mp4VideoDecoder.keyframes(mp4WithStss(Seq.empty)).isEmpty,
      "empty stss = zero keyframes, not all")
  }

  test("ContainerVideoDecoder sniffs AVI / Y4M / MP4 / unknown per payload") {
    import graft.operators.Multimodal._
    val y = y4m(4, 2, "mono", Seq(Array.tabulate(8)(_.toByte)))
    val (m, _) = mp4(Seq(Array[Byte](1, 2, 3)))
    assert(ContainerVideoDecoder.route(y) eq Y4mVideoDecoder)
    assert(ContainerVideoDecoder.route(m) eq Mp4VideoDecoder)
    assert(ContainerVideoDecoder.route("random stuff here".getBytes) eq ByteFoldVideoDecoder)
    // end-to-end through the Dataset API: mixed video payloads route per row
    val ds = Multimodal.ingest(spark, Seq(
      Media(10, "video", y, 4, 2, 0), Media(11, "video", m, 16, 8, 0)))
    val dec = Multimodal.frameDecode(ds).collect()
    assert(dec.map(_.mediaId).toSet == Set(10L), "Y4M decodes pixels; MP4 (H.264) demux-only")
    assert(dec.head.gray.toSeq == (0 until 8).map(_.toByte).toSeq)
  }
}
