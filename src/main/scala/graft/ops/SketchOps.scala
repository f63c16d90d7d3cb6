package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable quantile sketches (Greenwald-Khanna, the same summary Spark's
  * `approx_percentile` uses internally) exposed as first-class values, so
  * quantiles can be ROLLED UP hierarchically: leaf groups each build a
  * sketch once, coarser grains merge the serialized sketches without
  * re-reading the fact table. That is the 100 TB pattern — per-partition /
  * per-day sketches computed at ingest, every later grain (week, region,
  * global) is a cheap sketch-merge, never a re-scan.
  *
  * Built-in `approx_percentile` merges partials across PARTITIONS but its
  * sketch is consumed at the group boundary; these Aggregators keep it
  * alive across grouping levels. No reference counterpart (SURVEY §2.2
  * gap: the reference has no approximate aggregates at all).
  */
object SketchOps {

  private val Eps = 0.01 // relative rank error

  private def ser(qs: QuantileSummaries): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    out.writeObject(qs.compress()); out.close(); bos.toByteArray
  }
  private def deser(b: Array[Byte]): QuantileSummaries = {
    val in = new ObjectInputStream(new ByteArrayInputStream(b))
    in.readObject().asInstanceOf[QuantileSummaries]
  }
  private def empty: QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, Eps)

  /** Leaf level: doubles in, serialized sketch out. */
  object SketchAgg extends Aggregator[Double, QuantileSummaries, Array[Byte]] {
    def zero: QuantileSummaries = empty
    def reduce(b: QuantileSummaries, v: Double): QuantileSummaries = b.insert(v)
    def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      a.compress().merge(b.compress())
    def finish(b: QuantileSummaries): Array[Byte] = ser(b)
    def bufferEncoder: Encoder[QuantileSummaries] = Encoders.javaSerialization
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  case class Quantiles(p10: Double, p50: Double, p90: Double)

  /** Rollup level: serialized sketches in, merged quantiles out. */
  object SketchMergeAgg extends Aggregator[Array[Byte], QuantileSummaries, Quantiles] {
    def zero: QuantileSummaries = empty
    def reduce(b: QuantileSummaries, bytes: Array[Byte]): QuantileSummaries =
      b.compress().merge(deser(bytes))
    def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      a.compress().merge(b.compress())
    def finish(b: QuantileSummaries): Quantiles = {
      val q = b.compress().query(Seq(0.1, 0.5, 0.9)).get
      Quantiles(q.head.asInstanceOf[Double], q(1).asInstanceOf[Double], q(2).asInstanceOf[Double])
    }
    def bufferEncoder: Encoder[QuantileSummaries] = Encoders.javaSerialization
    def outputEncoder: Encoder[Quantiles] = Encoders.product[Quantiles]
  }

  // --------------------------------------------------------------------------
  // q74 — hierarchical quantile rollup: per-nation account-balance sketches
  // (leaf pass over customer), merged per region WITHOUT touching customer
  // again. Approximate (rank error ≤ Eps) → rows-only driver check;
  // SketchSpec bounds the error against exact percentiles.
  def q74SketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val sketch = udaf(SketchAgg, Encoders.scalaDouble)
    val mergeQ = udaf(SketchMergeAgg, Encoders.BINARY)
    val perNation = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(sketch(col("c_acctbal")).as("sk"), count(lit(1)).as("n"))
    val nations = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_regionkey"))
    perNation
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"))
      .agg(mergeQ(col("sk")).as("q"), sum(col("n")).as("n_customers"))
      .select(
        col("n_regionkey"),
        round(col("q.p10"), 2).as("p10"),
        round(col("q.p50"), 2).as("p50"),
        round(col("q.p90"), 2).as("p90"),
        col("n_customers"))
      .orderBy(col("n_regionkey"))
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q74_sketch_rollup", q74SketchRollup _, None))
}
