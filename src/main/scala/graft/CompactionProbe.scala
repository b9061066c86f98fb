package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Dev-only: the C67b tombstone-growth curve and the C67c payoff — the
  * two numbers that justify compaction's trigger threshold. Builds the
  * full-corpus index once, then applies a stream of small update deltas
  * (each re-tokenizes ~0.1 % of docs) and times the segmented BM25 query
  * at generation checkpoints; finally compacts and re-times. The query
  * is [[operators.TextAnalysis.bm25IndexedInc]] exactly as the driver
  * runs it (noop-sink evaluation, min over warm + 2 timed passes).
  *
  * Prints one JSON line:
  *   {"sf":…, "n_docs":N, "points":[{"gens":G,"tomb_rows":T,
  *    "posting_files":F,"query_sec":S},…],
  *    "compacted":{"gens":G,"tomb_rows":0,"posting_files":F,"query_sec":S},
  *    "maintenance_sec_total":…}
  *
  * Usage: tools/run_main.sh graft.CompactionProbe <sfDir> [maxGens] [churnMod]
  *   maxGens: highest generation count measured (default 64; checkpoints
  *   at 1, 4, 16, …, maxGens). churnMod: each delta re-adds docs with
  *   doc_id % churnMod == gen % churnMod (default 997 → ~0.1 % per delta).
  */
object CompactionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxGens = args.lift(1).map(_.toInt).getOrElse(64)
    val churnMod = args.lift(2).map(_.toInt).getOrElse(997)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    val docs = t.documents.select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("compactprobe").toString
    val nDocs = docs.count()
    TextAnalysis.buildInvertedIndex(t, dir)

    def postingFiles(): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(s"$dir/postings"))
    }
    def tombRows(): Long = {
      val td = new java.io.File(s"$dir/tombstones")
      if (td.isDirectory) spark.read.parquet(td.toString).count() else 0L
    }
    def querySec(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        TextAnalysis.bm25IndexedInc(spark, dir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      math.min(once(), once())
    }
    val checkpoints = Iterator.iterate(1)(_ * 4).takeWhile(_ < maxGens).toSeq :+ maxGens
    val points = scala.collection.mutable.ArrayBuffer[String]()
    var maintSec = 0.0
    var gen = 0
    for (g <- 1 to maxGens) {
      val m0 = System.nanoTime()
      TextAnalysis.indexDelta(spark, dir,
        docs.filter(col("doc_id") % churnMod === g % churnMod), removedIds = Seq.empty)
      maintSec += (System.nanoTime() - m0) / 1e9
      gen = g
      if (checkpoints.contains(g)) {
        val s = querySec()
        points += s"""{"gens":$g,"tomb_rows":${tombRows()},"posting_files":${postingFiles()},"query_sec":${"%.3f".format(s)}}"""
        System.err.println(s"[compactprobe] gens=$g query=${"%.3f".format(s)}s tombs=${tombRows()}")
      }
    }
    val c0 = System.nanoTime()
    TextAnalysis.compactIndex(spark, dir)
    val compactSec = (System.nanoTime() - c0) / 1e9
    val s = querySec()
    val compacted =
      s"""{"gens":$gen,"tomb_rows":${tombRows()},"posting_files":${postingFiles()},"query_sec":${"%.3f".format(s)},"compact_sec":${"%.3f".format(compactSec)}}"""
    println(s"""{"sf":"$sfDir","n_docs":$nDocs,"churn_mod":$churnMod,""" +
      s""""points":[${points.mkString(",")}],"compacted":$compacted,""" +
      s""""maintenance_sec_total":${"%.3f".format(maintSec)}}""")
    spark.stop()
  }
}
