package graft

/** Dev-only scratch: byte cost of ONE cold keptRange against a real
  * sidecar, isolating the page-read accounting from split planning.
  * Usage: tools/run_main.sh graft.SidecarBytesProbe /tmp/edf_scale/probe_d.edf
  */
object SidecarBytesProbe {
  def main(args: Array[String]): Unit = {
    val path = args.lift(0).getOrElse("/tmp/edf_scale/probe_d.edf")
    val conf = new org.apache.hadoop.conf.Configuration()
    val h = graft.sources.EdfFile.readHeader(path, conf)
    def localBytes(): Long =
      org.apache.hadoop.fs.FileSystem.getAllStatistics.toArray
        .collect { case s: org.apache.hadoop.fs.FileSystem.Statistics => s.getBytesRead }.sum
    val durUs = (h.duration * 1e6).toLong
    val segRecs = 4096
    val seg = h.nbDataRec / segRecs / 2
    val lo = h.startUs + (seg.toLong * (segRecs + 7200L)) * 1000000L
    val hi = lo + segRecs.toLong * 1000000L
    val b0 = localBytes()
    val r1 = graft.sources.EdfOnsetIndex.keptRange(path, h, lo, hi, durUs, conf)
    val b1 = localBytes()
    val r2 = graft.sources.EdfOnsetIndex.keptRange(path, h, lo, hi, durUs, conf)
    val b2 = localBytes()
    val r3 = graft.sources.EdfOnsetIndex.keptRange(path, h, lo, hi + 1, durUs, conf)
    val b3 = localBytes()
    println(s"""{"probe":"sidecar_bytes","cold":${b1 - b0},"memo":${b2 - b1},""" +
      s""""second_window":${b3 - b2},"r1":"$r1","r2":"$r2","r3":"$r3","n_rec":${h.nbDataRec}}""")

    // per-read floor: what ONE positioned 2 KiB read costs in statistics,
    // at various io.file.buffer.size settings
    val sp = new org.apache.hadoop.fs.Path(graft.sources.EdfOnsetIndex.sidecarPath(path))
    Seq(-1, 4096, 2048, 512).foreach { bufSz =>
      val c2 = new org.apache.hadoop.conf.Configuration()
      if (bufSz > 0) c2.setInt("io.file.buffer.size", bufSz)
      val fs = sp.getFileSystem(c2)
      val in = graft.sources.EdfFile.openSeekable(fs, sp, 2048)
      val buf = new Array[Byte](2048)
      val x0 = localBytes()
      in.readFully(500000L, buf)
      val x1 = localBytes()
      in.readFully(800000L, buf)
      val x2 = localBytes()
      in.close()
      println(s"""{"probe":"read_floor","io_buf":$bufSz,"read1":${x1 - x0},"read2":${x2 - x1}}""")
    }
  }
}
