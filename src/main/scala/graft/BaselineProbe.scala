package graft

/** Dev-only: times `EdfPipeline.process` (the drop-in for the reference
  * processor's task loop, processor.py:10-69) on the same files
  * `tools/baseline_reference.py` times the reference on — giving
  * BENCH-vs-BASELINE a real denominator instead of vs-self (r14 verdict
  * item 4). One JSON line per file: wall seconds, input bytes, MB/s.
  *
  * Usage: sbt "runMain graft.BaselineProbe <file.edf> [more...]"
  * Pass `gen:<path>:<gib>` to synthesize an EDF+C probe file first
  * (EdfScaleProbe's generator, 64 signals × 256 samples/record) and
  * then time it — the same file is handed to the python side.
  */
object BaselineProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BaselineProbe <file.edf|gen:path:gib> [more...]")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val files = args.toSeq.map {
      case g if g.startsWith("gen:") =>
        val parts = g.stripPrefix("gen:").split(":")
        val (path, gib) = (parts(0), parts(1).toDouble)
        val nSig = 64; val samplesPerRec = 256
        val nRec = ((gib * (1L << 30)) / (nSig * samplesPerRec * 2)).toInt
        EdfScaleProbe.generate(path, nSig, samplesPerRec, nRec, gapEveryRecs = 0)
        path
      case p => p
    }
    files.foreach { f =>
      val bytes = new java.io.File(f).length()
      // two passes: pass 1 carries JVM/JIT/codegen warmup (what a cold
      // one-shot run pays); `sec` = MIN of the passes (the EdfScaleProbe
      // min-of-2 de-noising convention — at multi-GB output sizes the
      // SECOND pass can be slower than the first because the first
      // pass's dirty pages are still flushing, measured 23 s vs 65 s at
      // 1 GiB). Each pass's output is deleted before the next so the
      // probe never stacks multi-GB temp dirs. The python reference
      // side has no JIT so its single pass is its steady state.
      var outBytes = 0L
      def walk(x: java.io.File): Long =
        if (x.isFile) x.length() else Option(x.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      def rmr(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rmr)); x.delete(): Unit
      }
      val passes = (1 to 2).map { _ =>
        val outDir = java.nio.file.Files.createTempDirectory("graft_baseline_").toString
        val t0 = System.nanoTime()
        EdfPipeline.process(spark, Seq(f), outDir)
        val sec = (System.nanoTime() - t0) / 1e9
        outBytes = walk(new java.io.File(outDir))
        rmr(new java.io.File(outDir))
        sec
      }
      val sec = passes.min
      println(f"""{"engine":"graft (EdfPipeline.process, local[32])","file":"$f","input_bytes":$bytes,"output_bytes":$outBytes,"sec_cold":${passes.head}%.3f,"sec":${sec}%.3f,"mb_per_s":${bytes / sec / 1e6}%.3f}""")
    }
    spark.stop()
  }
}
