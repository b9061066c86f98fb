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
      // one-shot run pays), pass 2 is the steady-state a long-running
      // session sees. Both reported; the python reference side has no
      // JIT so its single pass is its steady state.
      val passes = (1 to 2).map { _ =>
        val outDir = java.nio.file.Files.createTempDirectory("graft_baseline_").toString
        val t0 = System.nanoTime()
        EdfPipeline.process(spark, Seq(f), outDir)
        ((System.nanoTime() - t0) / 1e9, outDir)
      }
      val sec = passes.last._1
      val outBytes = {
        def walk(x: java.io.File): Long =
          if (x.isFile) x.length() else Option(x.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        walk(new java.io.File(passes.last._2))
      }
      println(f"""{"engine":"graft (EdfPipeline.process, local[32])","file":"$f","input_bytes":$bytes,"output_bytes":$outBytes,"sec_cold":${passes.head._1}%.3f,"sec":${sec}%.3f,"mb_per_s":${bytes / sec / 1e6}%.3f}""")
    }
    spark.stop()
  }
}
