package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up: touch every table and compile one trivial noop write so the
    // first timed query doesn't absorb session/codegen startup
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => }
    }
    // optional arg: comma-separated query names to bench (default all)
    val only = args.lift(0).map(_.split(",").toSet)
    only.foreach(names => require(names.subsetOf(SparkEntry.queries.keySet),
      s"unknown query name(s): ${(names -- SparkEntry.queries.keySet).mkString(", ")}"))
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // one untimed pass: measure steady-state engine throughput, not
    // first-run planning + whole-stage-codegen JIT compilation (which
    // dominates sub-second queries and never recurs in a live session)
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => }
    }
    var failed = List.empty[String]
    def timeOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      // noop sink forces full evaluation of every output column —
      // .count() would let Catalyst prune the projections being measured
      val ok = try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true } catch {
        case e: Throwable =>
          if (!failed.contains(name)) failed ::= name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
      }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // two timed passes, keep the min over SUCCESSFUL passes: transient
    // host noise on a single pass would otherwise masquerade as a
    // query-level regression — and a fast failure must never deflate the
    // reported time of a slow success
    val results = selected.map { case (name, fn) =>
      val (d1, ok1) = timeOnce(name, fn)
      val (d2, ok2) = timeOnce(name, fn)
      val t = (ok1, ok2) match {
        case (true, true)   => math.min(d1, d2)
        case (true, false)  => d1
        case (false, true)  => d2
        case (false, false) => math.max(d1, d2)
      }
      name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
