package graft

/** Dev-side physical-plan scanner: build every catalog query against a
  * target sf dir and report which ones plan a SortAggregate (the
  * min/max-over-STRING-buffer cliff found in the round-12 q32
  * post-mortem — a var-length aggregation buffer is not
  * UnsafeRow-mutable, so the aggregate silently falls out of
  * HashAggregate and sorts its whole input). Most hits are benign
  * (collect_list / sort-based shapes chosen on purpose); this is the
  * triage list, not a lint. Not part of the driver contract.
  */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val needle = args.lift(1).getOrElse("SortAggregate")
    val spark = GraftSession.localBuilder(4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val n = plan.sliding(needle.length).count(_ == needle)
        if (n > 0) println(s"[scan] $name: $n x $needle")
      } catch { case e: Throwable =>
        println(s"[scan] $name: PLAN FAILED ${e.getMessage.take(80)}")
      }
      ops.Checkpoints.releaseAll(spark)
    }
    spark.stop()
  }
}
