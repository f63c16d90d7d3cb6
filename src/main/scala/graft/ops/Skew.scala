package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §2.2 / builder-prompt scale
  * requirement): salt the skewed (big) side with a per-row salt, replicate
  * the other side once per salt value, join on (key, salt).
  *
  * AQE's skew-join handling covers sort-merge joins automatically; explicit
  * salting remains necessary for aggregations over hot keys and for
  * engines/paths AQE doesn't rewrite. Result set is identical to the plain
  * equi-join (SkewSpec asserts it).
  */
object Skew {

  /** Inner equi-join with the left (big/skewed) side salted `salts` ways.
    * The salt hashes ALL of the row's columns — stable under task retry
    * (monotonically_increasing_id would reassign on recomputation and,
    * used as a shuffle key, could double-count/drop rows after a fetch
    * failure). Identical duplicate rows share a salt — they stay together,
    * which is correct; a hot KEY still spreads because its rows differ in
    * the other columns.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame,
                     bigKey: String, smallKey: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt) first, then final-aggregate on key. Spark's hash aggregate
    * already does map-side partials; this adds a REDUCE-side split for keys
    * whose partial streams still overwhelm one reducer.
    * `aggs` must be re-aggregatable (sum/count/min/max).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
}
