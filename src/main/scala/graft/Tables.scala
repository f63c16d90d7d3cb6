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
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark cannot
    * read natively ([PARQUET_TYPE_ILLEGAL]). Read nanos as Long via the
    * legacy flag, then integer-divide (`div`, NOT double `/` — ns-since-epoch
    * ≈ 1.7e18 exceeds double's 53-bit mantissa) down to microseconds.
    * The µs truncation is safe vs. the DuckDB oracle: the ms-aligned
    * order/window boundaries we compare against are never crossed by
    * sub-microsecond truncation.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
