package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** The DSv2 connector's three optimizer contracts, asserted on real plans:
  * filter pushdown consumes the id range, the partition grid prunes to the
  * pushed range, and column pruning narrows the reader schema.
  */
class SynthSourceSpec extends SparkSpec {

  private def table = spark.read.format("graft-synth")
    .option("rows", 100000L).option("partitions", 8).load()

  test("id-range filters push into the scan and prune grid partitions") {
    val df = table.filter(col("id") >= 20000L && col("id") < 30000L)
      .select(col("id"))
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("pushedIdRange=[20000,30000)"), p)
    // grid chunk = 12500: [20000,30000) spans grid cells [12500,25000) and
    // [25000,37500) → exactly 2 planned partitions of the original 8
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 10000L)
    // the pushed range is consumed at the source: no post-scan Filter node
    // re-evaluates id bounds
    val filterLines = p.linesIterator.filter(_.contains("Filter")).toSeq
    assert(!filterLines.exists(_.contains("20000")), filterLines.mkString("\n"))
  }

  test("column pruning narrows the reader schema; residual filters stay in Spark") {
    val df = table.filter(col("id") < 50000L && col("bucket") === 3)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("cols=bucket") && !p.contains("score"), p)
    // the bucket predicate is NOT consumed by the source — it must appear
    // as a residual Spark-side filter
    assert(p.linesIterator.exists(l => l.contains("Filter") || l.contains("bucket#")), p)
    val rows = df.collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("n") === (50000L / 97 + 1))
  }

  test("generated rows are the portable md5 uniforms (DuckDB-regenerable)") {
    val r = table.filter(col("id") === 42L).select(col("score"), col("word")).head()
    assert(r.getAs[Double]("score") === SynthSource.mdUniform(42L))
    assert(r.getAs[String]("word") === SynthSource.words(42 % 8))
    assert(SynthSource.mdUniform(42L) > 0.0 && SynthSource.mdUniform(42L) < 1.0)
  }
}
