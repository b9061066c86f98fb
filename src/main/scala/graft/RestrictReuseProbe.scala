package graft
/** Dev-only: proves the stats-gated verify restriction's diamond (cands
  * feeding candIds, the intersection join AND the final restore join)
  * is materialized ONCE at runtime — the INITIAL plan clones the
  * candidate DAG into every consumer (zero static ReusedExchange), but
  * the FINAL adaptive plan dedupes the shuffle stages (AQE reuses query
  * stages by canonical form; observed 8 ReusedExchange at 200k docs).
  * Run: sbt "runMain graft.RestrictReuseProbe".
  */
object RestrictReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    // >100k docs with exact stats so the verify restriction engages at plan time
    val docs = spark.range(0, 200000L).select(col("id").as("doc_id"),
      concat(lit("alpha "), col("id") % 7, lit(" beta "), col("id") * 2654435761L % 1000003L,
        lit(" gamma "), col("id") * 40503L % 999983L, lit(" delta "), col("id"),
        when(col("id") >= 100000L && col("id") < 101000L,
          concat(lit(" planted duplicate tail run "), col("id") % 1000L)).otherwise(lit(""))).as("text"))
    val df = operators.Dedup.ngramJaccardDocs(docs, 3, 8, 4, 0.0)
    println(s"rows=${df.collect().length}")
    val p = df.queryExecution.executedPlan.toString
    def n(s: String) = s.r.findAllIn(p).size
    println(s"""{"minhashbands":${n("minhashbands")},"shinglehashes":${n("shinglehashes")},"leftsemi":${n("(?i)leftsemi")},"reused":${n("ReusedExchange")},"exchanges":${n("Exchange hashpartitioning")}}""")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/restrict_plan.txt"), p)
    spark.stop()
  }
}
