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

  test("cosine_sim null semantics: zero-norm and null input yield null") {
    val zero = spark.sql("SELECT cosine_sim(array(0.0d, 0.0d), array(1.0d, 1.0d)) AS s").collect()(0)
    assert(zero.isNullAt(0))
    val nul = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS s").collect()(0)
    assert(nul.isNullAt(0))
  }

  test("cosine_sim rejects non-array<double> inputs at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim('a', 'b')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.toLowerCase.contains("array"), e.getMessage)
  }
}
