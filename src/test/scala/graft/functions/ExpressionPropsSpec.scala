package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-7 native expressions: algebraic laws a
  * correct Jaro-Winkler / geohash implementation must satisfy on ANY
  * input — the complement to the DuckDB-pinned point values in
  * Round7bOpsSpec (those pin cross-engine agreement; these pin internal
  * consistency over the whole input space).
  */
class ExpressionPropsSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, r.status.toString)
  }

  private def jw(a: String, b: String): Double =
    JaroWinkler.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  private val word: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  test("jaro_winkler: symmetric, bounded to [0,1], identity on non-empty") {
    check(Prop.forAll(word, word) { (a, b) =>
      val s = jw(a, b)
      s == jw(b, a) && s >= 0.0 && s <= 1.0
    })
    check(Prop.forAll(word.suchThat(_.nonEmpty)) { a => jw(a, a) == 1.0 })
  }

  test("jaro_winkler: empty operand always scores 0 (DuckDB convention)") {
    check(Prop.forAll(word) { a => jw(a, "") == 0.0 && jw("", a) == 0.0 })
  }

  test("jaro_winkler: disjoint alphabets score 0") {
    val letters = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val digits = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('x', 'y', 'z')).map(_.mkString))
    check(Prop.forAll(letters, digits) { (a, b) => jw(a, b) == 0.0 })
  }

  private val q20: Gen[Long] = Gen.choose(0L, 1048575L)

  test("geohash_q: 8 base32 chars, deterministic, and injective on the grid") {
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz".toSet
    check(Prop.forAll(q20, q20) { (lat, lon) =>
      val g = GeohashQ.encode(lat, lon).toString
      g.length == 8 && g.forall(alphabet) && g == GeohashQ.encode(lat, lon).toString
    })
    // distinct quantized cells never collide (the 40-bit interleave is a
    // bijection into the 8-char code)
    check(Prop.forAll(q20, q20, q20, q20) { (a, b, c, d) =>
      (a == c && b == d) ||
        GeohashQ.encode(a, b).toString != GeohashQ.encode(c, d).toString
    })
  }

  test("geohash_q: northern/southern halves split on the first character") {
    // latitude bit 19 is the second-most-significant geohash bit; all
    // points with latq >= 2^19 sort into the upper half of the first
    // base32 character range for fixed lonq
    check(Prop.forAll(q20) { lat =>
      val hi = GeohashQ.encode(lat | (1L << 19), 0L).toString
      val lo = GeohashQ.encode(lat & ~(1L << 19), 0L).toString
      hi > lo // the alphabet is value-ordered, so codes sort like the grid
    })
  }
}
