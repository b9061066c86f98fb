package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-only surface: flagship operators registered as table-valued
  * functions via SparkSessionExtensions.injectTableFunction — a user
  * with nothing but a SQL connection can reach the engine.
  */
class SqlTvfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("graft_curate runs from pure SQL and matches the DataFrame API") {
    val sql = spark.sql(s"SELECT * FROM graft_curate('$sf') ORDER BY doc_id").collect()
    val api = graft.operators.TextAnalysis.curate(new Tables(spark, sf))
      .orderBy("doc_id").collect()
    assert(sql.nonEmpty && sql.toSeq == api.toSeq, s"${sql.length} rows, SQL == API")
  }

  test("graft_corpus_stats and graft_lang_id run from pure SQL") {
    assert(spark.sql(s"SELECT * FROM graft_corpus_stats('$sf')").collect().nonEmpty)
    val langs = spark.sql(
      s"SELECT pred_lang, count(*) AS n FROM graft_lang_id('$sf') GROUP BY pred_lang").collect()
    assert(langs.nonEmpty, "TVF output composes with outer SQL")
  }

  test("graft_ann_topk takes literal args and composes in SQL") {
    val top3 = spark.sql(s"SELECT * FROM graft_ann_topk('$sf', 0, 3)").collect()
    assert(top3.length == 3)
    val api = graft.operators.Similarity.annTopK(new Tables(spark, sf), 0L, 3).collect()
    assert(top3.toSeq == api.toSeq)
  }

  test("graft_dedup_minhash pairs from SQL match the API") {
    val sql = spark.sql(s"SELECT * FROM graft_dedup_minhash('$sf')").count()
    val api = graft.operators.Dedup.dedupMinhash(new Tables(spark, sf)).count()
    assert(sql == api)
  }

  test("graft_q reaches the whole query surface from SQL") {
    val sql = spark.sql(s"SELECT * FROM graft_q('q1_pricing', '$sf')").collect()
    val api = SparkEntry.queries("q1_pricing")(spark, sf).collect()
    assert(sql.nonEmpty && sql.toSeq == api.toSeq)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_q('no_such_query', '$sf')").collect()
    }
    assert(e.getMessage.contains("unknown graft query") && e.getMessage.contains("q1_pricing"),
      s"unknown name lists the surface: ${e.getMessage.take(200)}")
  }

  test("non-literal TVF args fail analysis loudly") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_curate(concat('a', 'b'))").collect()
    }
    assert(e.getMessage != null)
  }
}
