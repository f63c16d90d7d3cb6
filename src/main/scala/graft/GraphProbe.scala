package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-side power-law graph probe (SURVEY §8.11): hub-heavy degree
  * distributions are the classic triangle/CC killer — a node of degree d
  * owns d·(d−1)/2 raw wedges, so an un-oriented path join through a
  * 40k-degree hub alone fans out ~8·10⁸ candidate rows. This probe
  * generates a Zipf-ish edge set WITH a deliberate mega-hub (~10% of all
  * edge endpoints hit node 0) at 1×/3×/10× and measures:
  *
  *   - `triangle_zipf`: wall time of [[ops.CurateOps.triangleStats]] plus
  *     the measured fan-out bound — raw wedges (what a naive path join
  *     would generate) vs ORIENTED wedges (what the Schank/Wagner
  *     lower-(degree,id)→higher orientation actually feeds the join).
  *     The hub has out-degree 0 under the orientation (every incident
  *     edge points INTO the max-degree endpoint), so oriented wedges
  *     must stay near-linear in m while raw wedges grow ~m².
  *   - `cc_zipf` / `cc_star_zipf`: label-propagation and star-contraction
  *     connected components — hub graphs are shallow (diameter ~2-3), so
  *     rounds must stay constant and wall time near-linear.
  *   - `pagerank_zipf`: 3 damped integer-grid power iterations.
  *
  * Not part of the driver contract.
  */
object GraphProbe {

  /** 400k·m edges over 50k·m nodes: ~10% of endpoints pinned to hub node
    * 0, the rest Zipf-ish via u³ concentration (density ∝ x^(-2/3)).
    * Normalized to (p1 < p2), deduplicated, no self-loops.
    */
  private[graft] def genEdges(spark: SparkSession, m: Int): DataFrame = {
    val nNodes = 50000L * m
    val nEdges = 400000L * m
    def endpoint(seed: Int) = {
      val u = pmod(xxhash64(col("id"), lit(seed)), lit(1000000)).cast("double") / 1e6
      when(pmod(xxhash64(col("id"), lit(seed + 100)), lit(10)) === 0, lit(0L))
        .otherwise(floor(u * u * u * nNodes).cast("long"))
    }
    spark.range(nEdges)
      .select(endpoint(1).as("x"), endpoint(2).as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("p1"), greatest(col("x"), col("y")).as("p2"))
      .distinct()
  }

  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.localBuilder(cpus.toInt).appName("graft-graphprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String, m: Int, extra: String = "")(run: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows =
        try run
        catch { case e: Throwable =>
          System.err.println(s"[probe] x$m $name FAILED: ${e.getMessage}"); -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      println(java.lang.String.format(java.util.Locale.ROOT,
        """{"probe":"%s","scale_x":%d,"sec":%.2f,"rows":%d%s}""",
        name, Int.box(m), Double.box(sec), Long.box(rows), extra))
    }

    scales.foreach { m =>
      val edges = genEdges(spark, m).localCheckpoint()
      val deg = ops.CurateOps.degreeOf(edges).localCheckpoint()
      // fan-out bound: raw wedges vs oriented wedges, plus the hub's share
      val raw = deg.agg(sum(expr("d * (d - 1) div 2"))).head().getLong(0)
      val od = ops.CurateOps.orientEdges(edges, deg)
        .groupBy(col("lo")).agg(count(lit(1)).as("od"))
      val oriented = od.agg(sum(expr("od * (od - 1) div 2"))).head().getLong(0)
      val maxDeg = deg.agg(max("d")).head().getLong(0)
      val maxOd = od.agg(max("od")).head().getLong(0)
      println(java.lang.String.format(java.util.Locale.ROOT,
        """{"probe":"wedge_bound","scale_x":%d,"edges":%d,"raw_wedges":%d,"oriented_wedges":%d,"max_degree":%d,"max_out_degree":%d}""",
        Int.box(m), Long.box(edges.count()), Long.box(raw), Long.box(oriented),
        Long.box(maxDeg), Long.box(maxOd)))

      // butterfly census on the same hub-heavy edge set read as bipartite
      // (p1 = customer side): node 0 is a mega-hub whose raw wedge mass
      // alone is ~C(hub_degree, 2) — the degree cap must drop it whole
      // and keep census wall time near-linear in m
      {
        val bf = ops.GraphMiningOps.butterflyCensus(
          edges.select(col("p1").as("ck"), col("p2").as("pk")), cap = 40)
        val t0 = System.nanoTime()
        val r = bf.head()
        println(java.lang.String.format(java.util.Locale.ROOT,
          """{"probe":"butterfly_zipf","scale_x":%d,"sec":%.2f,"wedges":%d,"butterflies":%d,"hubs_dropped":%d}""",
          Int.box(m), Double.box((System.nanoTime() - t0) / 1e9),
          Long.box(r.getAs[Long]("wedges")), Long.box(r.getAs[Long]("butterflies")),
          Long.box(r.getAs[Long]("n_hubs_dropped"))))
      }
      timed("triangle_zipf", m)(ops.CurateOps.triangleStats(edges).count())
      timed("cc_zipf", m)(ops.TextOps.connectedComponents(edges).count())
      timed("cc_star_zipf", m)(ops.TextOps.connectedComponentsStar(edges).count())
      timed("pagerank_zipf", m)(
        ops.PipelineOps.pageRank(
          edges.select(col("p1").as("src"), col("p2").as("dst")), iters = 3, topK = 20)
          .count())
    }
    spark.stop()
  }
}
