package graft

/** Dev-side config A/B probe: WarmProbe, but each `k=v` argument before
  * the first query prefix is applied with spark.conf.set BEFORE the runs
  * — for measuring runtime-settable session config candidates (AQE
  * coalescing, advisory sizes) against the stock session on the same
  * JVM. Not part of the driver contract. Usage:
  *   runMain graft.ConfProbe <sfDir> <runs> [k=v ...] <queryPrefix...>
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val (confs, prefixes) = args.drop(2).partition(_.contains("="))
    val spark = GraftSession.localBuilder(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      println(s"[conf] $k=$v")
    }
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.isEmpty || prefixes.exists(n.startsWith) }
    for ((name, fn) <- qs) {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val s = (System.nanoTime() - t0) / 1e9
        ops.Checkpoints.releaseAll(spark)
        s
      }
      println(f"""{"probe":"conf","query":"$name","runs":[${times.map(t => f"$t%.3f").mkString(",")}],"""
        + f""""warm_min":${times.drop(1).min}%.3f}""")
    }
    spark.stop()
  }
}
