package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared numeric-determinism helpers (single source of truth for the
  * policy documented in Relational.scala / SURVEY §8.4).
  */
object Num {
  /** Exact, order-independent sum of a money-like double column (values on
    * the .01 grid): per-row decimal cast, exact decimal sum, double out.
    */
  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")
}
