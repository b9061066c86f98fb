package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JsonlDocs

/** D7: JSONL ingest — well-formed rows land in the documents shape,
  * broken/incomplete lines quarantine with the raw line and a reason.
  */
class JsonlDocsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("good rows parse, malformed and incomplete lines quarantine with reasons") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}""",
      """{"doc_id": 2, "text": "zwei", "lang": "de", "source": "web", "n_chars": 999}""",
      """{"doc_id": 3, "text": "broken json...""",
      """{"text": "no id here", "lang": "en", "source": "web"}""",
      """{"doc_id": 5, "lang": "en", "source": "web"}""")
    java.nio.file.Files.write(dir.resolve("part0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val (good, bad) = JsonlDocs.read(spark, dir.toString)

    val g = good.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getString(2), r.getLong(4))).toMap
    assert(g.keySet == Set(1L, 2L), s"exactly the well-formed rows: $g")
    assert(g(1L) == (("hello world", "en", 11L)))
    // n_chars is DERIVED, never trusted from the client row
    assert(g(2L) == (("zwei", "de", 4L)), s"client n_chars=999 ignored: ${g(2L)}")

    val q = bad.collect().map(r => (r.getString(0), r.getString(1)))
    assert(q.length == 3, s"three rejected lines: ${q.toSeq}")
    val reasons = q.map(_._2).sorted.toSeq
    assert(reasons == Seq("malformed_json", "missing_doc_id", "missing_text"), s"$reasons")
    // the malformed line carries its raw text for diagnosis
    assert(q.exists { case (raw, reason) =>
      reason == "malformed_json" && raw.contains("broken json") }, s"${q.toSeq}")
    // every quarantine row carries the RAW input line verbatim
    assert(q.exists(_._1 == """{"text": "no id here", "lang": "en", "source": "web"}"""),
      s"raw line preserved: ${q.toSeq}")
  }

  test("blank separator lines are formatting, not quarantine rows") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl2")
    val lines = Seq(
      """{"doc_id": 1, "text": "one", "lang": "en", "source": "web"}""",
      "", "   ", // blank + whitespace-only separators
      """{"doc_id": 2, "text": "two", "lang": "en", "source": "web"}""")
    java.nio.file.Files.write(dir.resolve("part0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val (good, bad) = JsonlDocs.read(spark, dir.toString)
    assert(good.count() == 2 && bad.count() == 0,
      s"blank lines skipped like the json datasource: ${bad.collect().toSeq}")
  }
}
