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
  * full extra read). PERMISSIVE mode with a named corrupt-record
  * column is the engine-supported routing; Spark disallows filtering a
  * json scan by ONLY the corrupt column (SPARK-21610), so the split is
  * projected through one materialized pass.
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
    val raw = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)
      // SPARK-21610: a filter referencing only the corrupt column on the
      // raw scan is disallowed; cache materializes the parsed relation
      // once and both splits read it
      .cache()
    val bad = col(Corrupt).isNotNull || col("doc_id").isNull || col("text").isNull
    val good = raw.filter(!bad)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
    val quarantined = raw.filter(bad)
      .select(
        coalesce(col(Corrupt),
          to_json(struct(col("doc_id"), col("text"), col("lang"), col("source"))))
          .as("raw"),
        when(col(Corrupt).isNotNull, "malformed_json")
          .when(col("doc_id").isNull, "missing_doc_id")
          .otherwise("missing_text").as("reason"))
    (good, quarantined)
  }
}
