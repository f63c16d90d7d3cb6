package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for graft's custom expressions — the
  * deployment path for clusters where sessions are built once with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), making `cosine_sim` available
  * in every SQL/expr context without per-query registration.
  *
  * (`CosineSimilarity.register` remains the per-session runtime
  * alternative used by the driver-contract queries, whose SparkSession is
  * created by the driver without extensions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    extensions.injectFunction((
      FunctionIdentifier("unaccent"),
      new ExpressionInfo(classOf[StripAccentsExpr].getName, "unaccent"),
      (exprs: Seq[Expression]) => StripAccentsExpr(exprs.head)))
    extensions.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinklerExpr(exprs.head, exprs(1))))
    extensions.injectFunction((
      FunctionIdentifier("geohash_q"),
      new ExpressionInfo(classOf[GeohashExpr].getName, "geohash_q"),
      (exprs: Seq[Expression]) => GeohashExpr(exprs.head, exprs(1))))
    extensions.injectOptimizerRule(_ => LevenshteinRewrite)
  }
}
