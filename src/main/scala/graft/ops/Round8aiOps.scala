package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 thirty-fifth operator batch: broadcast-threshold advisor and
  * shuffle-partition sizing planner — the join-strategy and stage-width
  * capacity tools beside q357 (salting) and q273 (LSH banding), on the
  * §8.4 exact-integer discipline.
  */
object Round8aiOps {

  // --------------------------------------------------------------------------
  // q375 — BROADCAST ADVISOR: for each declared FK join, measure the
  // build side EXACTLY — rows, variable bytes (Σ string lengths), and
  // fixed bytes (8 per numeric/date column) — and emit the
  // broadcast-vs-shuffle verdict against the 10 MiB default threshold
  // (spark.sql.autoBroadcastJoinThreshold). The same estimate an engine
  // makes from catalog stats, here computed from the data so q277-style
  // estimate drift is visible: a dimension that LOOKS broadcastable in
  // stale stats but has outgrown the threshold is exactly the 100 TB
  // plan regression this catches in CI.
  //
  // Scale: one aggregate per dimension table (the small side by
  // construction); the fact side is never touched.
  def broadcastAdvisor(sides: Seq[(String, DataFrame, Seq[String], Int)],
                       thresholdBytes: Long): DataFrame = {
    val dfs = sides.map { case (name, df, strCols, fixedCols) =>
      val varBytes: Column = if (strCols.isEmpty) lit(0L)
        else strCols.map(c => sum(length(col(c)).cast("long"))).reduce(_ + _)
      df.agg(count(lit(1)).as("rows"), varBytes.as("var_bytes"))
        .select(lit(name).as("build_side"), col("rows"),
          (col("var_bytes") + lit(8L * fixedCols) * col("rows"))
            .as("est_bytes"))
    }
    dfs.reduce(_ unionByName _)
      .withColumn("threshold_bytes", lit(thresholdBytes))
      .withColumn("verdict",
        when(col("est_bytes") <= col("threshold_bytes"), "broadcast")
          .otherwise("shuffle"))
      .withColumn("headroom_pct",
        expr("(100L * est_bytes) div threshold_bytes"))
      .orderBy(col("build_side"))
  }

  def q375BroadcastAdvisor(spark: SparkSession, dir: String): DataFrame =
    broadcastAdvisor(Seq(
      ("nation", Tables.nation(spark, dir), Seq("n_name"), 2),
      ("region", Tables.region(spark, dir), Seq("r_name"), 1),
      ("supplier", Tables.supplier(spark, dir), Seq("s_name"), 3),
      ("part", Tables.part(spark, dir),
        Seq("p_name", "p_brand", "p_type"), 3),
      ("customer", Tables.customer(spark, dir),
        Seq("c_name", "c_mktsegment"), 3)),
      thresholdBytes = 10L * 1024 * 1024)

  private def advSql(name: String, table: String, strCols: Seq[String],
                     fixedCols: Int): String = {
    val varExpr = if (strCols.isEmpty) "0"
      else strCols.map(c => s"SUM(CAST(length($c) AS BIGINT))").mkString(" + ")
    s"""SELECT '$name' AS build_side, COUNT(*) AS rows,
       |  $varExpr + ${8L * fixedCols} * COUNT(*) AS est_bytes
       |FROM $table""".stripMargin
  }

  val q375Sql: String = {
    val parts = Seq(
      advSql("nation", "nation", Seq("n_name"), 2),
      advSql("region", "region", Seq("r_name"), 1),
      advSql("supplier", "supplier", Seq("s_name"), 3),
      advSql("part", "part", Seq("p_name", "p_brand", "p_type"), 3),
      advSql("customer", "customer", Seq("c_name", "c_mktsegment"), 3))
      .mkString("(", ")\nUNION ALL\n(", ")")
    s"""WITH sides AS (
       |$parts)
       |SELECT build_side, rows, CAST(est_bytes AS BIGINT) AS est_bytes,
       |  CAST(${10L * 1024 * 1024} AS BIGINT) AS threshold_bytes,
       |  CASE WHEN est_bytes <= ${10L * 1024 * 1024} THEN 'broadcast'
       |    ELSE 'shuffle' END AS verdict,
       |  CAST((100 * est_bytes) // ${10L * 1024 * 1024} AS BIGINT)
       |    AS headroom_pct
       |FROM sides ORDER BY build_side""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q376 — SHUFFLE-PARTITION PLANNER: for each declared workload stage,
  // the EXACT bytes of the shuffled projection (only the columns that
  // cross the wire — Σ string lengths + 8·numeric count, the same
  // accounting as q375) and the partition count that hits the 128 MiB
  // target: parts = ceil(bytes/target) clamped to [1, 2000], plus
  // rows-per-partition at that width. The number every
  // spark.sql.shuffle.partitions override should come from instead of
  // folklore — and the audit that catches a stage whose projection
  // quietly grew past its configured width.
  //
  // Scale: one narrow aggregate per stage over exactly the columns the
  // stage would shuffle; nothing else moves.
  def shufflePlanner(stages: Seq[(String, DataFrame, Seq[String], Int)],
                     targetBytes: Long): DataFrame = {
    val dfs = stages.map { case (name, df, strCols, fixedCols) =>
      val varBytes: Column = if (strCols.isEmpty) lit(0L)
        else strCols.map(c => sum(length(col(c)).cast("long"))).reduce(_ + _)
      df.agg(count(lit(1)).as("rows"), varBytes.as("var_bytes"))
        .select(lit(name).as("stage"), col("rows"),
          (col("var_bytes") + lit(8L * fixedCols) * col("rows"))
            .as("shuffle_bytes"))
    }
    dfs.reduce(_ unionByName _)
      .withColumn("parts", greatest(lit(1L), least(lit(2000L),
        expr(s"(shuffle_bytes + ${targetBytes}L - 1L) div ${targetBytes}L"))))
      .withColumn("rows_per_part", expr("(rows + parts - 1L) div parts"))
      .orderBy(col("stage"))
  }

  def q376ShufflePlanner(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val docs = Tables.documents(spark, dir)
    shufflePlanner(Seq(
      ("lineitem_groupby_suppkey",
        li.select(col("l_suppkey"), col("l_extendedprice")), Nil, 2),
      ("orders_groupby_custkey",
        ord.select(col("o_custkey"), col("o_totalprice")), Nil, 2),
      ("orders_join_lineitem",
        li.select(col("l_orderkey"), col("l_extendedprice"),
          col("l_quantity")), Nil, 3),
      ("documents_token_explode",
        docs.select(col("doc_id"), col("text")), Seq("text"), 1)),
      targetBytes = 128L * 1024 * 1024)
  }

  val q376Sql: String = {
    val t = 128L * 1024 * 1024
    def st(name: String, table: String, varExpr: String, fixedCols: Int)
    : String =
      s"""SELECT '$name' AS stage, COUNT(*) AS rows,
         |  $varExpr + ${8L * fixedCols} * COUNT(*) AS shuffle_bytes
         |FROM $table""".stripMargin
    val parts = Seq(
      st("lineitem_groupby_suppkey", "lineitem", "0", 2),
      st("orders_groupby_custkey", "orders", "0", 2),
      st("orders_join_lineitem", "lineitem", "0", 3),
      st("documents_token_explode", "documents",
        "SUM(CAST(length(text) AS BIGINT))", 1))
      .mkString("(", ")\nUNION ALL\n(", ")")
    s"""WITH stages AS (
       |$parts),
       |sized AS (
       |  SELECT stage, rows, CAST(shuffle_bytes AS BIGINT) AS shuffle_bytes,
       |    GREATEST(1, LEAST(2000, (shuffle_bytes + $t - 1) // $t)) AS parts
       |  FROM stages)
       |SELECT stage, rows, shuffle_bytes, CAST(parts AS BIGINT) AS parts,
       |  CAST((rows + parts - 1) // parts AS BIGINT) AS rows_per_part
       |FROM sized ORDER BY stage""".stripMargin
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q375_broadcast_advisor", q375BroadcastAdvisor _, Some(q375Sql)),
    ("q376_shuffle_planner", q376ShufflePlanner _, Some(q376Sql)))
}
