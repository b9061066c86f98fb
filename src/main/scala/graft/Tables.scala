package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Catalog over the driver-generated parquet star schema (TESTDATA.md).
  *
  * Single load point so every operator reads through the same
  * column-prunable parquet scans; at cluster scale the same paths would be
  * object-store URIs and nothing else changes.
  */
final class Tables(spark: SparkSession, dir: String) {
  /** Resolve through the catalog when [[Tables.register]] has published
    * this dir as stats-backed external tables — plan statistics then
    * answer cardinality questions (Similarity.corpusRows bandBits /
    * maxAllPairs sizing) with ZERO jobs at plan-build time. Bare paths
    * fall back to a direct parquet scan (and self-sizing operators fall
    * back to a `count()` job — correct, just not free).
    */
  private def t(name: String): DataFrame = {
    val db = Tables.registered.get(Tables.dirKey(dir))
    if (db != null && spark.catalog.tableExists(s"$db.$name")) spark.table(s"$db.$name")
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `ts` is normalized to int64 nanos-since-epoch regardless of how the
    * file encodes it: the driver's testdata is parquet TIMESTAMP(NANOS)
    * (read as long via nanosAsLong), while Spark-written copies (e.g.
    * ScaleGen's sf1 derivation) carry TIMESTAMP(MICROS) — every operator
    * downstream assumes long nanos (`ts div 1000` → µs).
    */
  def events: DataFrame = {
    val df = t("events")
    df.schema("ts").dataType match {
      case LongType => df
      case _: TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case _: TimestampNTZType =>
        // session tz is UTC (GraftSession), so this cast is exact
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalArgumentException(s"events.ts: unsupported type $other")
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  /** All driver-generated star-schema member names (TESTDATA.md). */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalized registry key: equivalent spellings of one dir (trailing
    * slash, redundant separators) must hit the same registration, or
    * the SQL user typing `graft_q('…', '/data/sf1/')` silently loses
    * the stats-backed path.
    */
  private[graft] def dirKey(dir: String): String =
    new org.apache.hadoop.fs.Path(dir).toUri.toString

  /** dirKey → database holding its registered external tables. JVM-wide
    * so the SQL/TVF path (`graft_q('…', dir)` builds a fresh `Tables`)
    * resolves through the catalog too; `tableExists` guards against a
    * session that no longer carries the database.
    */
  private[graft] val registered =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Publish `dir`'s parquet tables as EXTERNAL catalog tables with
    * ANALYZE'd row counts under database `db`, so every later
    * `Tables(spark, dir)` — including the ones TVFs build during SQL
    * analysis — sees catalog statistics and self-sizing operators pay
    * zero plan-build jobs (Similarity.corpusRows). The data never moves
    * (LOCATION points at the existing files); ANALYZE reads footer
    * metadata, not rows. Register once per landed IMMUTABLE snapshot.
    * REWRITING files under a registered dir requires re-running this:
    * the catalog froze both the row stats AND the schema, so a rewrite
    * with different columns/types would silently read through the stale
    * stored schema (nulls for vanished columns) — re-register, don't
    * mutate in place.
    */
  def register(spark: SparkSession, dir: String, db: String = "graft"): Unit = {
    // both values are interpolated into SQL text: refuse anything that
    // could break out of its quoting rather than escaping ad hoc. Spark
    // SQL string literals process backslash escapes, so a trailing '\'
    // would swallow the closing quote — reject it alongside quotes and
    // control characters instead of trying to escape.
    require(db.matches("[A-Za-z0-9_]+"), s"db must be [A-Za-z0-9_]+: '$db'")
    require(!dir.exists(c => c == '\'' || c == '\\' || c.isControl),
      s"dir must not contain quotes, backslashes, or control chars: '$dir'")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    val conf = spark.sparkContext.hadoopConfiguration
    names.foreach { n =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$n.parquet")
      if (p.getFileSystem(conf).exists(p)) {
        spark.sql(s"DROP TABLE IF EXISTS `$db`.`$n`")
        spark.sql(s"CREATE TABLE `$db`.`$n` USING parquet LOCATION '$dir/$n.parquet'")
        spark.sql(s"ANALYZE TABLE `$db`.`$n` COMPUTE STATISTICS")
      }
    }
    // A db holds ONE dir's tables: re-registering a different dir under
    // the same db just re-pointed the catalog at the new location, so any
    // stale key still mapping to this db would silently resolve to the
    // NEW dir's data. Evict those keys before publishing ours.
    val key = dirKey(dir)
    registered.entrySet().removeIf(e => e.getValue == db && e.getKey != key)
    registered.put(key, db)
    ()
  }

  /** Undo [[register]]'s dir→db mapping (catalog objects are the
    * caller's to drop). Mainly for tests that must not leak resolution
    * mode across suites.
    */
  def deregister(dir: String): Unit = { registered.remove(dirKey(dir)); () }
}
