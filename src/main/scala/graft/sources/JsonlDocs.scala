package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** D7: JSONL corpus ingest with corrupt-record quarantine — the front
  * door of every training-data pipeline (raw crawl/export drops arrive
  * as JSONL, not parquet). Schema is ENFORCED at the scan: well-formed
  * rows land in the documents shape (`doc_id, text, lang, source,
  * n_chars`), anything else — broken JSON, wrong types, missing
  * required fields — lands in a quarantine relation carrying the raw
  * line, so a bad drop is diagnosable instead of silently null-padded
  * or fatally failing the job.
  *
  * Scale notes: one pass, narrow, splittable (JSONL is line-delimited —
  * Spark assigns file splits to tasks like any text source); the
  * explicit schema skips the whole-corpus inference pass
  * `spark.read.json` would otherwise pay (at 100 TB, inference is a
  * full extra read). Parsing is a `from_json` projection over the text
  * scan rather than a `spark.read.json` relation: the json SCAN refuses
  * filters referencing only its corrupt column (SPARK-21610), but a
  * parsed STRUCT column carries no such restriction — so both splits
  * stay fully lazy narrow plans with no cached intermediate (the r14
  * ADVICE leak: the old workaround cached the parsed relation for the
  * session lifetime with no unpersist handle). A consumer of both
  * splits pays the text parse twice; that is the honest 100 TB trade —
  * a re-scan is restartable and spillless, a 100 TB session cache is
  * neither.
  */
object JsonlDocs {

  val Corrupt = "_corrupt_record"

  /** The documents schema + the corrupt-record capture column. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField(Corrupt, StringType)))

  /** Read a JSONL path → (good, quarantined).
    *
    * good: the documents shape (n_chars derived — trusting a
    * client-supplied length invites silent drift). quarantined: one row
    * per rejected line with the raw text and a reason. A row missing
    * doc_id or text is rejected even when the JSON parses — required
    * fields are part of the contract, and PERMISSIVE would otherwise
    * null-pad them straight into the corpus.
    */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> Corrupt)
    // text scan + from_json projection: the parsed struct is an ordinary
    // column, so corrupt-only predicates are legal (unlike on the json
    // scan itself, SPARK-21610) and both splits below are lazy — nothing
    // is cached or materialized at read() time
    // blank/whitespace-only lines are formatting, not records — the json
    // datasource skipped them, so this path must too (a quarantine row
    // per blank separator line would fabricate drop-rate alarms)
    val raw = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"), from_json(col("value"), schema, opts).as("j"))
      .select(col("value"), col("j.*"))
    val bad = col(Corrupt).isNotNull || col("doc_id").isNull || col("text").isNull
    val good = raw.filter(!bad)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
    // the quarantine contract: ALWAYS the raw input line (the text scan
    // keeps it at hand — no reconstruction through to_json, which loses
    // the original bytes and renders a null struct as nothing at all)
    val quarantined = raw.filter(bad)
      .select(
        col("value").as("raw"),
        when(col(Corrupt).isNotNull, "malformed_json")
          .when(col("doc_id").isNull, "missing_doc_id")
          .otherwise("missing_text").as("reason"))
    (good, quarantined)
  }
}
