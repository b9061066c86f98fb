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
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

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
}
