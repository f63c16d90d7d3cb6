package graft.ops

import graft.SparkSpec

class RelationalExtSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct lands within 5% of exact") {
    RelationalExt.q24Raw(spark, dir).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.05, s"approx $approx vs exact $exact")
    }
  }

  test("native codegen cosine expression returns the same top-k as the lambda-fold version") {
    val a = VectorOps.q40CosineTopk(spark, dir).collect().map(_.toSeq)
    val b = RelationalExt.q44CosineTopkNative(spark, dir).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("approx_percentile lands within 2% of the exact median") {
    Relational.q55Raw(spark, dir).collect().foreach { r =>
      val approx = r.getAs[Double]("approx_median")
      val exact = r.getAs[Double]("exact_median")
      assert(math.abs(approx - exact) / exact < 0.02, s"approx $approx vs exact $exact")
    }
  }

  test("hash sampling is deterministic across runs") {
    val a = RelationalExt.q27HashSample(spark, dir).collect()(0).getAs[Long]("n_sampled")
    val b = RelationalExt.q27HashSample(spark, dir).collect()(0).getAs[Long]("n_sampled")
    assert(a === b)
    assert(a > 0L)
  }

  test("q148 multiset semantics: intersectAll keeps min counts, exceptAll subtracts") {
    import spark.implicits._
    val a = Seq("x", "x", "x", "y", "z").toDF("p")
    val b = Seq("x", "y", "y").toDF("p")
    val inter = a.intersectAll(b).collect().map(_.getString(0)).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(inter === Map("x" -> 1, "y" -> 1)) // min(3,1), min(1,2); z: min(1,0)=0
    val diff = a.exceptAll(b).collect().map(_.getString(0)).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(diff === Map("x" -> 2, "z" -> 1)) // 3-1, 1-0; y: 1-2 → 0
  }

  test("q147 lateral top-k equals the window formulation and decorrelates") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val lateral = RelationalExt.q147LateralTopk(spark, dir).collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Long]("o_orderkey"))).toSet
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = graft.Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .join(graft.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .collect().map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"))).toSet
    assert(lateral === windowed && lateral.nonEmpty)
    // Catalyst decorrelates the subquery: one join, no per-row re-execution
    val p = RelationalExt.q147LateralTopk(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("HashJoin") && !p.contains("CartesianProduct"), p)
  }
}
