package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.SparkSession

/** q214 cost-based-optimizer stats round-trip: the one Catalyst subsystem
  * the rest of the suite never touches. Pins (a) the catalog entry's stats
  * against a direct aggregate, (b) the optimizer-visible rowCount, and
  * (c) the PLAN effect — with ANALYZE stats + spark.sql.cbo.enabled, a
  * selective dimension filter's estimate shrinks below the broadcast
  * threshold and a sort-merge join flips to broadcast; without CBO the
  * filter keeps the file-size estimate and stays sort-merge. That flip is
  * exactly what table stats buy at 100 TB: the 6 KB filtered dim slice
  * broadcasts instead of shuffling the fact table.
  */
class CboSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withConfs(s: SparkSession, kv: (String, String)*)(body: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> s.conf.getOption(k) }
    kv.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  test("q214 catalog stats equal direct aggregates") {
    val got = RelationalMore.q214CboStats(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val cust = graft.Tables.customer(spark, dir)
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.min("c_acctbal"),
        org.apache.spark.sql.functions.max("c_acctbal")).head()
    assert(got("customer")._1 === cust.getLong(0))
    assert(got("customer")._2 === 0L)
    assert(got("customer")._3 === cust.getDouble(1))
    assert(got("customer")._4 === cust.getDouble(2))
    assert(got("nation")._1 === 25L)
  }

  test("ANALYZE stats surface as optimizer rowCount under CBO") {
    RelationalMore.q214CboStats(spark, dir).collect()
    withConfs(spark, "spark.sql.cbo.enabled" -> "true") {
      val rc = spark.table("graft_cbo_customer")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(rc.isDefined && rc.get.toLong > 0)
    }
  }

  test("CBO + column stats flip a filtered dim join from sort-merge to broadcast") {
    spark.sql("DROP TABLE IF EXISTS graft_cbo_spec_cust")
    spark.sql(s"CREATE TABLE graft_cbo_spec_cust USING parquet LOCATION '$dir/customer.parquet'")
    spark.sql("ANALYZE TABLE graft_cbo_spec_cust COMPUTE STATISTICS FOR COLUMNS c_custkey, c_name")

    def hasBroadcast(cbo: Boolean): Boolean = {
      var found = false
      withConfs(spark,
        "spark.sql.cbo.enabled" -> cbo.toString,
        "spark.sql.adaptive.enabled" -> "false", // pin the STATIC planner decision
        "spark.sql.autoBroadcastJoinThreshold" -> "2048") {
        val dim = spark.table("graft_cbo_spec_cust")
          .filter(org.apache.spark.sql.functions.col("c_custkey") <= 10)
          .select("c_custkey", "c_name")
        val fact = graft.Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
        val plan = fact.join(dim, fact("o_custkey") === dim("c_custkey"))
          .queryExecution.executedPlan
        found = plan.collect {
          case b: BroadcastHashJoinExec => b
          case a: AdaptiveSparkPlanExec => a
        }.exists(_.isInstanceOf[BroadcastHashJoinExec])
      }
      found
    }

    assert(hasBroadcast(cbo = true),
      "with ANALYZE stats + CBO the ~7% filtered dim should broadcast")
    assert(!hasBroadcast(cbo = false),
      "without CBO the filter keeps the 7 KB file-size estimate and must not broadcast")
    spark.sql("DROP TABLE IF EXISTS graft_cbo_spec_cust")
  }
}
