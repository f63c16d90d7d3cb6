package graft

/** Dev-side same-JVM warm-runs probe (the A/B discipline from SURVEY
  * §8.26): run each named query N times in ONE warm JVM and print every
  * run's seconds. Subset Bench runs understate steady-state performance
  * for plan-compilation-heavy queries (a 6-query run never JIT-warms
  * Catalyst the way the 450-query gate run does), so perf claims on the
  * iterative tail are made from run 2+ here, never from cold subsets.
  * Usage: runMain graft.WarmProbe <sfDir> <runs> <queryPrefix...>
  * Not part of the driver contract.
  */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val prefixes = args.drop(2)
    val spark = GraftSession.localBuilder(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.isEmpty || prefixes.exists(n.startsWith) }
    for ((name, fn) <- qs) {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count() // same materialization as Bench
        val s = (System.nanoTime() - t0) / 1e9
        ops.Checkpoints.releaseAll(spark)
        s
      }
      println(f"""{"probe":"warm","query":"$name","runs":[${times.map(t => f"$t%.3f").mkString(",")}],"""
        + f""""warm_min":${times.drop(1).min}%.3f}""")
    }
    spark.stop()
  }
}
