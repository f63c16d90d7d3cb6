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

  /** PORTABLE round of a double to n decimals: floor(x·10ⁿ + 0.5)/10ⁿ.
    *
    * `round(double, n)` is NOT portable across engines — Spark routes the
    * double through BigDecimal HALF_UP while C-library engines round the
    * scaled double — so when the true value sits within an ulp of a
    * 10⁻ⁿ·(k+½) boundary the two disagree on the last digit (the class
    * that failed q136/q249/q263 in earlier rounds and q265/q266 in round
    * 7). floor-based rounding is three IEEE double ops + an exact floor:
    * bit-identical in every engine given the same input double (which
    * hashed doubles already guarantee via the fixed-order-fold and
    * scaled-long policies). Values equal round() everywhere except cells
    * ON a boundary, where every engine now moves together.
    *
    * NEGATIVE boundary direction (round-8 advice): floor(x·10ⁿ + 0.5)
    * rounds half-way values toward +infinity on BOTH signs, so a negative
    * boundary cell differs from ROUND's HALF_UP (away from zero) — e.g.
    * pround(-0.0000005, 6) = 0.0 where HALF_UP gives -0.000001. Many
    * migrated columns are signed (z-scores, slopes, SMD, PSI); the
    * Scala and SQL twins share the identity so hashes agree, but anyone
    * regenerating a baseline with a HALF_UP round must expect negative
    * boundary cells to differ by one last-digit ulp. Kept as-is
    * deliberately: toward-+inf is the one direction every engine's
    * floor reproduces bit-identically; a sign-aware floor(abs)·sign
    * would add two more IEEE ops per cell for no portability gain.
    *
    * SQL oracle twin: `FLOOR((x) * 1eN + 0.5) / 1eN`.
    */
  def pround(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }
}
