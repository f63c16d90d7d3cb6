package graft.functions

import graft.SparkSpec

/** The test session is built with `.withExtensions(new GraftExtensions)`
  * (SparkSpec), so cosine_sim must resolve in SQL with NO runtime
  * registration call — proving the SparkSessionExtensions path.
  */
class ExtensionsSpec extends SparkSpec {

  test("cosine_sim resolves via SparkSessionExtensions injection") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d, 0.0d), array(1.0d, 0.0d, 0.0d)) AS s").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    val orth = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS s").collect()(0)
    assert(math.abs(orth.getDouble(0)) < 1e-12)
  }

  test("unaccent folds composed AND decomposed forms to the same ASCII, null passes through") {
    // composed \u00e9 and decomposed e + combining acute U+0301 must both
    // fold to 'e' -- the property that makes it a dedup KEY function
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301"
    val accented = "\u00e1\u00e9\u00ed\u00f1\u00f3\u00fa\u00e7"
    val r = spark.sql(
      s"SELECT unaccent('$composed') AS a, unaccent('$decomposed') AS b, " +
        s"unaccent('$accented') AS c, " +
        "unaccent(CAST(NULL AS STRING)) AS d").collect()(0)
    assert(r.getString(0) === "cafe")
    assert(r.getString(1) === "cafe")
    assert(r.getString(2) === "aeinouc")
    assert(r.isNullAt(3))
    // interpreted path (direct eval) agrees with the codegen'd SQL path
    assert(UnicodeNorm.strip(
      org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)).toString === "cafe")
  }

  test("cosine_sim null semantics: zero-norm and null input yield null") {
    val zero = spark.sql("SELECT cosine_sim(array(0.0d, 0.0d), array(1.0d, 1.0d)) AS s").collect()(0)
    assert(zero.isNullAt(0))
    val nul = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS s").collect()(0)
    assert(nul.isNullAt(0))
  }

  test("LevenshteinRewrite bounds 2-arg levenshtein filters and preserves results") {
    import org.apache.spark.sql.functions._
    // parquet-backed source: local relations are folded before the plan
    // can be inspected
    val part = graft.Tables.part(spark, "/root/testdata/sf0.001")
    val q = part.filter(expr("levenshtein(p_name, 'cold widget') <= 2"))
      .select("p_name").distinct()
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("Some(2)) >= 0"), opt)  // thresholded 3-arg form
    assert(opt.contains("abs((length(p_name#"), opt) // band prune (rhs len folded)
    val got = q.collect().map(_.getString(0)).toSet
    // reference semantics recomputed driver-side
    val all = part.select("p_name").distinct().collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    assert(got === all.filter(n => lev(n, "cold widget") <= 2).toSet)
  }

  test("LevenshteinRewrite leaves NULL tri-state behaviour intact and skips bounded calls") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(Some("abc"), None).toDF("s")
    // null input row is dropped by the filter exactly as before
    val n = df.filter(expr("levenshtein(s, 'abd') <= 1")).count()
    assert(n === 1L)
    // already-thresholded predicates are not double-rewritten
    val part = graft.Tables.part(spark, "/root/testdata/sf0.001")
    val q = part.filter(expr("levenshtein(p_name, 'abd', 1) >= 0"))
    val occurrences = "levenshtein".r.findAllIn(q.queryExecution.optimizedPlan.toString).size
    assert(occurrences === 1, q.queryExecution.optimizedPlan.toString)
  }

  test("cosine_sim rejects non-array<double> inputs at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim('a', 'b')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.toLowerCase.contains("array"), e.getMessage)
  }
}
