package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** C33 refreshIncremental: the incremental pipeline must be
  * indistinguishable from a full recompute — and provably cheaper: only
  * added+changed docs may reach the compute stage, and unchanged docs
  * must carry their PREVIOUS output verbatim (asserted with a sentinel
  * that a recompute would overwrite).
  */
class RefreshSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("planted delta: fresh/carried/tombstone routing is exact") {
    val prev = df(Seq(
      (1L, "stable text"),
      (2L, "old text"),
      (4L, "gone text")))
    val cur = df(Seq(
      (1L, "stable text"),   // unchanged -> carried
      (2L, "new text"),      // changed   -> fresh
      (3L, "brand new")))    // added     -> fresh; 4 removed -> tombstoned
    // sentinel: prevOut for doc 1 is a WRONG fingerprint on purpose — if
    // refresh recomputed unchanged docs, parity with this value breaks
    val prevOut = TextAnalysis.fingerprint(prev.filter(col("doc_id") =!= 1L))
      .unionByName(df(Seq((1L, "SENTINEL")))
        .select(col("doc_id"), lit("SENTINEL").as("md5_hash"), lit(-7L).as("poly_hash")))
    val out = TextAnalysis.refreshIncremental(cur, prev, prevOut)(TextAnalysis.fingerprint)
      .orderBy(col("doc_id")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), "removed doc 4 tombstoned")
    val bySrc = out.map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(bySrc == Map(1L -> "carried", 2L -> "fresh", 3L -> "fresh"), s"provenance: $bySrc")
    assert(out(0).getString(1) == "SENTINEL" && out(0).getLong(2) == -7L,
      "unchanged doc carries previous output VERBATIM (never recomputed)")
    val freshRows = out.filter(_.getString(3) == "fresh")
    val full = TextAnalysis.fingerprint(cur).filter(col("doc_id").isin(2L, 3L))
      .orderBy(col("doc_id")).collect()
    assert(freshRows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      full.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq,
      "fresh rows equal full recompute on the dirty docs")
  }

  test("compute stage only ever sees the dirty fraction of the corpus") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val cur = t.documents.select(col("doc_id"), col("text"))
    val prev = TextAnalysis.simulatedPrev(cur)
    var computeInput: DataFrame = null
    val out = TextAnalysis.refreshIncremental(cur, prev, TextAnalysis.fingerprint(prev)) { dirty =>
      computeInput = dirty
      TextAnalysis.fingerprint(dirty)
    }
    val nDirty = computeInput.count()
    val nExpected = cur.filter(col("doc_id") % 13 === 5 || col("doc_id") % 17 === 3).count()
    assert(nDirty == nExpected,
      s"compute saw $nDirty docs, expected exactly the added+changed $nExpected")
    assert(nDirty < cur.count() / 2, "dirty fraction is a strict minority of the corpus")
    assert(out.count() == cur.count(), "every current doc has exactly one output row")
  }

  test("incremental == full recompute on the real corpus (parity)") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val inc = TextAnalysis.refreshIncremental(t)
      .drop("src").orderBy(col("doc_id")).collect()
    val full = TextAnalysis.fingerprint(t).orderBy(col("doc_id")).collect()
    assert(inc.toSeq == full.toSeq, s"${inc.length} rows, incremental == full")
  }
}
