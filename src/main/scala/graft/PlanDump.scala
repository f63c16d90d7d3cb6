package graft

/** Dev-side plan capture for the optimization rounds: write
  * `.explain("formatted")` output for each named catalog query to
  * `<outDir>/<query><suffix>.txt` — the before/after plan evidence the
  * optimization judge checks claims against. Not part of the driver
  * contract.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <queryPrefix...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r14")
    val suffix = args.lift(2).getOrElse("_before")
    val prefixes = args.drop(3)
    val spark = GraftSession.localBuilder(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.isEmpty || prefixes.exists(n.startsWith) }
    for ((name, fn) <- qs) {
      try {
        val plan = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"$name$suffix.txt"), plan)
        println(s"[plandump] $name -> $outDir/$name$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getMessage.take(120)}")
      }
      ops.Checkpoints.releaseAll(spark)
    }
    spark.stop()
  }
}
