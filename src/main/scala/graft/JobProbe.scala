package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-side job-census profiler: run one catalog query N times and print
  * every Spark job's wall time plus the inter-job gaps — the per-batch
  * scheduler-floor question ("how many job latencies does this operator
  * chain pay, and where") that StageProbe's stage view cannot answer for
  * multi-action operators like the BandIndex ingest loop. Not part of
  * the driver contract. Usage:
  *   runMain graft.JobProbe <queryName> [sfDir] [runs]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_agg")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.localBuilder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var jobs = 0
    @volatile var jobMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, e.time)
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val t0 = Option(starts.get(e.jobId)).getOrElse(e.time)
        val ms = e.time - t0
        jobs += 1; jobMs += ms
        println(f"[job] id=${e.jobId} ${ms}ms")
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { r =>
      jobs = 0; jobMs = 0L
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name run $r: $wall%.2f s ($n rows) jobs=$jobs jobSec=${jobMs / 1e3}%.2f")
      ops.Checkpoints.releaseAll(spark)
    }
    spark.stop()
  }
}
