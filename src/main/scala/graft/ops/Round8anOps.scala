package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 fortieth operator batch: Hampel rolling-median anomaly
  * filter and a fixed-budget OOV audit — robust series monitoring and
  * tokenizer-coverage governance on the §8.4 exact-integer discipline.
  */
object Round8anOps {

  // --------------------------------------------------------------------------
  // q385 — HAMPEL FILTER: q344's EWMA bands are mean-based and a
  // single spike drags them; the Hampel filter scores each day against
  // the MEDIAN of its ±3-day window with the window's median absolute
  // deviation — both exact integers from sorting the 7-value window
  // array row-locally (no float, no approx percentile). Ships the
  // top-10 days by |x − med| with the 3·MAD exceedance flag (MAD
  // floored at 1 so a flat window cannot divide the verdict away).
  //
  // Scale: the corpus collapses to the calendar grid; the ±3 window
  // and the array sorts are grid-local.
  def hampel(orders: DataFrame): DataFrame = {
    val daily = orders.groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
    val w = Window.orderBy(col("d")).rowsBetween(-3, 3)
    daily
      .withColumn("arr", collect_list(col("x")).over(w))
      .filter(size(col("arr")) === 7)
      .withColumn("med", expr("element_at(array_sort(arr), 4)"))
      .withColumn("mad", expr(
        "element_at(array_sort(transform(arr, v -> abs(v - med))), 4)"))
      .withColumn("dev", abs(col("x") - col("med")))
      .withColumn("flagged", col("dev") > greatest(lit(3L) * col("mad"), lit(1L)))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("x"),
        col("med"), col("mad"), col("dev"), col("flagged"))
      .orderBy(col("dev").desc, col("day"))
      .limit(10)
  }

  def q385Hampel(spark: SparkSession, dir: String): DataFrame =
    hampel(Tables.orders(spark, dir))

  val q385Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x
      |  FROM orders GROUP BY 1),
      |win AS (
      |  SELECT d, x, list(x) OVER (ORDER BY d
      |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS arr
      |  FROM daily),
      |scored AS (
      |  SELECT d, x,
      |    list_sort(arr)[4] AS med,
      |    list_sort(list_transform(arr, v -> abs(v - list_sort(arr)[4])))[4]
      |      AS mad,
      |    abs(x - list_sort(arr)[4]) AS dev
      |  FROM win WHERE len(arr) = 7)
      |SELECT STRFTIME(d, '%Y-%m-%d') AS day, x, CAST(med AS BIGINT) AS med,
      |  CAST(mad AS BIGINT) AS mad, CAST(dev AS BIGINT) AS dev,
      |  dev > GREATEST(3 * mad, 1) AS flagged
      |FROM scored ORDER BY dev DESC, day LIMIT 10""".stripMargin

  // --------------------------------------------------------------------------
  // q386 — FIXED-BUDGET OOV AUDIT: given a 32768-type vocabulary
  // budget, which sources fall off it? The vocabulary is the
  // frequency-threshold crossing — the smallest f* whose f ≥ f* type
  // count fits the budget, read off the COUNT-OF-COUNTS cumulative
  // grid (bounded far below the corpus, q302's class; actual size ≤
  // budget by construction — the threshold rule, no per-type global
  // rank anywhere). Per source: token occurrences whose type sits
  // below f* as exact ppm — the domain-shift readout q336 (global
  // sizing) and q360 (diversity) don't give.
  //
  // Scale: one global type-count pass, a count-of-counts cum grid, a
  // broadcast f* row, one (source, type) aggregate semi-filtered on
  // the broadcast threshold.
  def oovAudit(docs: DataFrame, budget: Long): DataFrame = {
    val freq = docs.select(col("source"), explode(TextOps.toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .localCheckpoint()
    val coc = freq.groupBy(col("f")).agg(count(lit(1)).as("vm"))
      .withColumn("cum_ge", sum(col("vm")).over(
        Window.orderBy(col("f").desc).rowsBetween(Window.unboundedPreceding, 0)))
    val fstar = coc.filter(col("cum_ge") <= budget)
      .agg(min(col("f")).as("f_min"), max(col("cum_ge")).as("vocab_size"))
    val srcTok = docs.select(col("source"), explode(TextOps.toks).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("sf"))
      .join(freq, Seq("w"))
      .crossJoin(broadcast(fstar))
    srcTok.groupBy(col("source"))
      .agg(sum(col("sf")).as("n_tokens"),
        sum(when(col("f") < col("f_min"), col("sf")).otherwise(0L))
          .as("oov_tokens"),
        first(col("f_min")).as("vocab_f_min"),
        first(col("vocab_size")).as("vocab_size"))
      .withColumn("oov_ppm", expr("(1000000L * oov_tokens) div n_tokens"))
      .orderBy(col("source"))
  }

  def q386OovAudit(spark: SparkSession, dir: String): DataFrame =
    oovAudit(Tables.documents(spark, dir), budget = 32768L)

  val q386Sql: String =
    s"""WITH tok AS (
       |  SELECT source, UNNEST(t) AS w
       |  FROM (SELECT source, ${TextOps.toksSqlD} AS t FROM documents)),
       |freq AS (SELECT w, COUNT(*) AS f FROM tok GROUP BY 1),
       |coc AS (
       |  SELECT f, SUM(vm) OVER (ORDER BY f DESC ROWS UNBOUNDED PRECEDING)
       |    AS cum_ge
       |  FROM (SELECT f, COUNT(*) AS vm FROM freq GROUP BY 1)),
       |fstar AS (
       |  SELECT MIN(f) AS f_min, MAX(cum_ge) AS vocab_size
       |  FROM coc WHERE cum_ge <= 32768),
       |src AS (
       |  SELECT source, w, COUNT(*) AS sf FROM tok GROUP BY 1, 2)
       |SELECT source, CAST(SUM(sf) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN f < f_min THEN sf ELSE 0 END) AS BIGINT)
       |    AS oov_tokens,
       |  CAST(ANY_VALUE(f_min) AS BIGINT) AS vocab_f_min,
       |  CAST(ANY_VALUE(vocab_size) AS BIGINT) AS vocab_size,
       |  CAST((1000000 * SUM(CASE WHEN f < f_min THEN sf ELSE 0 END))
       |    // SUM(sf) AS BIGINT) AS oov_ppm
       |FROM src JOIN freq USING (w), fstar
       |GROUP BY source ORDER BY source""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q385_hampel_filter", q385Hampel _, Some(q385Sql)),
    ("q386_oov_audit", q386OovAudit _, Some(q386Sql)))
}
