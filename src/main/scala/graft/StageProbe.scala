package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-side stage profiler: run one catalog query N times and print every
  * stage over a wall-time threshold — the measurement loop behind the
  * round-12 q32 post-mortem (SURVEY §8.26), kept as a tool because "which
  * stage is the 8 seconds" is the first question of every perf
  * investigation. Usage:
  *   sbt "runMain graft.StageProbe <queryName> [sfDir] [runs]"
  * Not part of the driver contract.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_agg")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.localBuilder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
        if (ms > 200)
          println(f"[stage] id=${i.stageId} tasks=${i.numTasks} ${ms}ms ${i.name.take(80)}")
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[probe] $name run $r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      ops.Checkpoints.releaseAll(spark)
    }
    spark.stop()
  }
}
