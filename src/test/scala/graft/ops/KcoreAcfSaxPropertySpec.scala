package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters

/** ScalaCheck properties for the round-8d batch: k-core peeling against a
  * sequential synchronous-peel reference, ACF integer identities
  * (sequential BigInt reference + Cauchy–Schwarz), HHI against exact
  * floor arithmetic, and SAX words against a sequential ntile/ISO-week
  * emulation (the riskiest cross-engine semantics in the batch).
  */
class KcoreAcfSaxPropertySpec extends SparkSpec {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)

  test("q300 k-core peel equals the sequential synchronous peel on random bipartite graphs") {
    import spark.implicits._
    val edgesGen = for {
      n <- Gen.choose(4, 60)
      es <- Gen.listOfN(n, for {
        c <- Gen.choose(1L, 8L); p <- Gen.choose(101L, 110L)
      } yield (c, p))
    } yield es.distinct
    def ref(edges: Seq[(Long, Long)], kc: Int, kp: Int,
            rounds: Int): Seq[(Int, Long, Long, Long)] = {
      var e = edges
      def st(r: Int) = (r, e.map(_._1).distinct.size.toLong,
        e.map(_._2).distinct.size.toLong, e.size.toLong)
      val out = collection.mutable.ArrayBuffer(st(0))
      for (r <- 1 to rounds) {
        val cd = e.groupBy(_._1).view.mapValues(_.size).toMap
        val pd = e.groupBy(_._2).view.mapValues(_.size).toMap
        e = e.filter(x => cd(x._1) >= kc && pd(x._2) >= kp)
        out += st(r)
      }
      out.toSeq
    }
    val prop = Prop.forAll(edgesGen) { es =>
      val got = GraphMiningOps.kcorePeel(es.toDF("ck", "pk"), 2, 3, 3)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val want = ref(es, 2, 3, 3)
      (got == want) :| s"got $got want $want" &&
        got.sliding(2).forall(w => w.last._4 <= w.head._4) :| "edges non-increasing"
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("q303 ACF integer stats equal a BigInt reference and obey Cauchy-Schwarz") {
    import spark.implicits._
    val seriesGen = for {
      n <- Gen.choose(6, 40)
      xs <- Gen.listOfN(n, Gen.choose(0L, 500L))
    } yield xs
    val prop = Prop.forAll(seriesGen) { xs =>
      val daily = xs.zipWithIndex.map { case (x, i) =>
        (java.sql.Date.valueOf(LocalDate.of(2024, 1, 1).plusDays(i)), x)
      }.toDF("d", "x")
      val got = GraphMiningOps.acf(daily, maxLag = 3).collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      (1 to 3).forall { lag =>
        val pairs = xs.dropRight(lag).zip(xs.drop(lag))
        val n = BigInt(pairs.size)
        val sx = pairs.map(p => BigInt(p._1)).sum
        val sy = pairs.map(p => BigInt(p._2)).sum
        val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
        val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
        val syy = pairs.map(p => BigInt(p._2) * p._2).sum
        val (num, d1, d2) = (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
        val (gn, gnum, gd1, gd2) = got(lag)
        gn == pairs.size.toLong && BigInt(gnum) == num &&
          BigInt(gd1) == d1 && BigInt(gd2) == d2 &&
          num * num <= d1 * d2 // Cauchy-Schwarz: |r| <= 1 exactly
      } :| s"stats mismatch: $got"
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("q304 HHI equals exact floor arithmetic on random supplier ledgers") {
    import spark.implicits._
    val ledgerGen = for {
      n <- Gen.choose(2, 30)
      rows <- Gen.listOfN(n, for {
        sk <- Gen.choose(1L, 8L)
        cents <- Gen.choose(1L, 500000L)
      } yield (sk, cents))
    } yield rows
    val prop = Prop.forAll(ledgerGen) { rows =>
      val li = rows.map { case (sk, c) => (sk, c / 100.0) }
        .toDF("l_suppkey", "l_extendedprice")
      val supp = (1L to 8L).map(k => (k, 1)).toDF("s_suppkey", "s_nationkey")
      val nat = Seq((1, "N1")).toDF("n_nationkey", "n_name")
      val got = GraphMiningOps.hhi(li, supp, nat).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).head
      val bySupp = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val tot = bySupp.values.sum
      val shares = bySupp.values.map(c => 1000000L * c / tot)
      val ss = shares.map(s => s * s).sum
      val want = (bySupp.size.toLong, shares.max, ss / 1000000L, 100000000000000L / ss)
      (got == want) :| s"got $got want $want" &&
        (got._4 >= 100L && got._4 <= 800L) :| "effective suppliers within [1,8]x100"
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("q305 SAX words equal the sequential ntile + ISO-week emulation") {
    import spark.implicits._
    val seriesGen = for {
      n <- Gen.choose(3, 35)
      start <- Gen.choose(0, 6) // vary the weekday the series starts on
      cents <- Gen.listOfN(n, Gen.choose(0L, 20L)) // small domain -> many ties
    } yield (start, cents)
    val prop = Prop.forAll(seriesGen) { case (start, cents) =>
      val base = LocalDate.of(2024, 1, 1).plusDays(start)
      val days = cents.zipWithIndex.map { case (c, i) => (base.plusDays(i), c) }
      val daily = days.map { case (d, c) => (java.sql.Date.valueOf(d), c) }
        .toDF("d", "cents")
      val got = GraphMiningOps.saxMotifs(daily).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // sequential ntile(4) over (cents, d): first (n mod 4) buckets take
      // the extra row, assigned in total (cents, d) order
      val n = days.size
      val ordered = days.sortBy { case (d, c) => (c, d.toEpochDay) }
      val sizes = (1 to 4).map(b => n / 4 + (if (b <= n % 4) 1 else 0))
      val letters = ordered.zipWithIndex.map { case ((d, _), idx) =>
        val b = sizes.scanLeft(0)(_ + _).tail.indexWhere(idx < _) + 1
        d -> ('a' + b - 1).toChar
      }.toMap
      val want = days.map(_._1)
        .groupBy(_.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY)))
        .map { case (_, ds) => ds.sorted.map(letters).mkString }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      (got == want) :| s"got $got want $want"
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }
}
