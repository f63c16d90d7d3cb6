package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  // --------------------------------------------------------------------------
  // q123 — the salted equi-join as a CATALOG operator, not just a
  // spec-tested utility: orders ⋈ customer through saltedEquiJoin (the
  // big fact side salted 8 ways, the customer side replicated per salt),
  // then revenue per nation key. The oracle is the PLAIN join SQL — the
  // whole point of salting is result-set identity, and the hash check
  // proves it on the driver gate, not just in SkewSpec.
  //
  // Scale shape: salting splits each hot custkey's rows across 8 shuffle
  // partitions at the cost of an 8× replication of the (small) dimension
  // — the standard trade when one key dominates (e.g. the null/default
  // customer absorbing a crawl's unattributed orders).
  def q123SaltedJoin(spark: SparkSession, dir: String): DataFrame =
    saltedEquiJoin(
      Tables.orders(spark, dir).select(col("o_custkey"), col("o_totalprice")),
      Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
      "o_custkey", "c_custkey", salts = 8)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"), Num.moneySum(col("o_totalprice")).as("total_rev"))
      .orderBy(col("c_nationkey"))

  val q123Sql: String =
    """SELECT c_nationkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q123_salted_join", q123SaltedJoin _, Some(q123Sql)))
}
