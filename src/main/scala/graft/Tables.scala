package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * Each table is a single parquet file under `\$dir/<name>.parquet`.
  * All reads go through `spark.read.parquet` so Catalyst gets schema
  * from the footer and can push filters / prune columns into the scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` has been generated as both parquet TIMESTAMP(MICROS)
    * (reads natively as TimestampType) and TIMESTAMP(NANOS) (which Spark
    * cannot read natively, [PARQUET_TYPE_ILLEGAL]) across data drops, so
    * the loader adapts to the footer schema instead of assuming one:
    * with the legacy nanosAsLong flag set, a NANOS column surfaces as
    * LongType and is integer-divided (`div`, NOT double `/` —
    * ns-since-epoch ≈ 1.7e18 exceeds double's 53-bit mantissa) down to
    * microseconds; a MICROS column is already a timestamp and passes
    * through untouched. The µs truncation on the nanos path is safe vs.
    * the DuckDB oracle: the ms-aligned order/window boundaries we compare
    * against are never crossed by sub-microsecond truncation.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // tz-less parquet micros surface as TIMESTAMP_NTZ, which
        // unix_micros/watermarks reject; the session TZ is pinned UTC, so
        // this cast re-tags the wall-clock as the same UTC instant
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
