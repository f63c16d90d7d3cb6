package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import java.time.LocalDate

/** ScalaCheck properties for the round-8q..8y batches: each distributed
  * operator against an independent sequential reference (BigInt where
  * exactness is claimed), on randomized inputs.
  */
class KruskalAdamicHaarPropertySpec extends SparkSpec {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("q341 Kruskal-Wallis sufficient stats equal the sequential rank reference") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(4, 40)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("A", "B", "C"); v <- Gen.choose(0, 15)
      } yield (g, v.toDouble))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val got = InferenceTestOps.kruskalWallis(rows.toDF("g", "bal"), "bal", "g")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // sequential doubled tie-averaged ranks
      val cents = rows.map { case (g, v) => (g, math.floor(v * 100 + 0.5).toLong) }
      val sorted = cents.map(_._2).sorted
      def dr(v: Long): Long = {
        val lt = sorted.count(_ < v); val eq = sorted.count(_ == v)
        2L * lt + eq + 1
      }
      val want = cents.groupBy(_._1).view.mapValues { g =>
        (g.size.toLong, g.map(p => dr(p._2)).sum)
      }.toMap
      (got == want) :| s"got $got want $want"
    })
  }

  test("q343 Adamic-Adar equals the brute-force common-neighbor reference") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(2, 25)
      es <- Gen.listOfN(n, for {
        a <- Gen.choose(1L, 12L); b <- Gen.choose(1L, 12L)
      } yield (math.min(a, b), math.max(a, b)))
    } yield es.filter(e => e._1 != e._2).distinct
    check(Prop.forAll(gen) { es =>
      es.isEmpty || {
        val got = GraphMiningOps.adamicAdar(es.toDF("p1", "p2"), degCap = 256, topK = 1000)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
          .toMap
        val nbr = (es ++ es.map(e => (e._2, e._1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val deg = nbr.view.mapValues(_.size).toMap
        val w = deg.view.mapValues(d =>
          if (d >= 2) math.floor(1e6 / math.log(d.toDouble)).toLong else 0L).toMap
        val nodes = nbr.keys.toSeq.sorted
        val want = (for {
          a <- nodes; b <- nodes if a < b && !nbr(a).contains(b)
          common = nbr(a).intersect(nbr(b)).filter(z => deg(z) >= 2)
          if common.nonEmpty
        } yield (a, b) -> ((common.toSeq.map(w).sum, common.size.toLong))).toMap
        (got == want) :| s"got $got want $want"
      }
    })
  }

  test("q344 EWMA bands equal the sequential dyadic-kernel reference") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(3, 45)
      xs <- Gen.listOfN(n, Gen.choose(1, 30))
    } yield xs
    check(Prop.forAll(gen) { xs =>
      val rows = xs.zipWithIndex.flatMap { case (x, i) =>
        Seq.fill(x)(java.sql.Date.valueOf(LocalDate.of(2024, 1, 1).plusDays(i)))
      }
      val got = GraphMiningOps.ewmaBands(rows.toDF("o_orderdate"), spark, topK = 1000)
        .collect()
        .map(r => r.getDate(0).toString ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
      // sequential reference
      def priorEwma(series: Seq[Long], scale: Long): Seq[Option[Long]] =
        series.indices.map { t =>
          val lags = (1 to 23).filter(k => t - k >= 0)
          if (lags.isEmpty) None
          else {
            val num = lags.map(k => BigInt(1L << (24 - k)) * series(t - k)).sum
            val den = lags.map(k => BigInt(1L << (24 - k))).sum
            Some((BigInt(scale) * num / den).toLong)
          }
        }
      val lev = priorEwma(xs.map(_.toLong), 1000000L)
      val dev = xs.indices.map(t => lev(t).map(l => math.abs(1000000L * xs(t) - l)))
      val devSeries = dev.flatten
      val band = priorEwma(devSeries, 1L)
      val want = (for {
        t <- xs.indices; l <- lev(t); d <- dev(t)
        di = t - 1 // dev series index of day t
        if di >= 1
        b <- band(di)
        if b > 0
      } yield LocalDate.of(2024, 1, 1).plusDays(t).toString ->
        ((xs(t).toLong, l, d, b, 1000000L * d / b))).toMap
      (got == want) :| s"got $got want $want"
    })
  }

  test("q348 source divergence equals the brute-force BigInt reference") {
    import spark.implicits._
    val wordGen = Gen.oneOf("a", "b", "c", "d", "e")
    val gen = for {
      docs <- Gen.listOfN(6, for {
        src <- Gen.oneOf("s1", "s2", "s3")
        ws <- Gen.nonEmptyListOf(wordGen)
      } yield (src, ws.mkString(" ")))
    } yield docs
    check(Prop.forAll(gen) { docs =>
      val srcs = docs.map(_._1).distinct
      (srcs.size >= 2) ==> {
        val df = docs.zipWithIndex.map { case ((s, t), i) => (i.toLong, t, s) }
          .toDF("doc_id", "text", "source")
        val got = InferenceTestOps.sourceDivergence(df).collect()
          .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
          .toMap
        val cnt = docs.groupBy(_._1).view.mapValues { ds =>
          ds.flatMap(_._2.split(" ")).filter(_.nonEmpty)
            .groupBy(identity).view.mapValues(_.size.toLong).toMap
        }.toMap
        val want = (for {
          s1 <- srcs; s2 <- srcs if s1 < s2
          ca = cnt(s1); cb = cnt(s2)
          ta = ca.values.sum; tb = cb.values.sum
        } yield {
          val shared = ca.keySet.intersect(cb.keySet)
          val tsh = shared.toSeq.map { wd =>
            val x = BigInt(ca(wd)) * tb; val y = BigInt(cb(wd)) * ta
            ((x - y) * (x - y) / (x + y)).toLong
          }.sum
          val ash = shared.toSeq.map(ca).sum
          val bsh = shared.toSeq.map(cb).sum
          val sigma = BigInt(tsh) + BigInt(ta - ash) * tb + BigInt(tb - bsh) * ta
          (s1, s2) -> ((shared.size.toLong,
            (BigInt(1000000) * sigma / (BigInt(ta) * tb)).toLong))
        }).toMap
        (got == want) :| s"got $got want $want"
      }
    })
  }

  test("q352 Haar energies equal the sequential complete-block reference") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(2, 40)
      // present-day mask + counts: some days missing
      xs <- Gen.listOfN(n, Gen.option(Gen.choose(1, 9)))
    } yield xs
    check(Prop.forAll(gen) { xs =>
      xs.flatten.nonEmpty ==> {
        val rows = xs.zipWithIndex.flatMap {
          case (Some(x), i) =>
            Seq.fill(x)(java.sql.Date.valueOf(LocalDate.of(2024, 1, 1).plusDays(i)))
          case (None, _) => Nil
        }
        val got = EvalReplayOps.haarEnergy(rows.toDF("o_orderdate"), spark)
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
          .toMap
        // offsets relative to first present day
        val present = xs.zipWithIndex.collect { case (Some(x), i) => (i, x.toLong) }
        val base = present.head._1
        val series = present.map { case (i, x) => ((i - base).toLong, x) }.toMap
        val want = (1 to 12).flatMap { l =>
          val w = 1L << l
          val blocks = series.keys.groupBy(_ / w).filter(_._2.size == w)
          if (blocks.isEmpty) None
          else {
            val dets = blocks.toSeq.map { case (_, is) =>
              is.toSeq.map(i =>
                (if ((i / (w / 2)) % 2 == 0) 1L else -1L) * series(i)).sum
            }
            val raw = dets.map(d => d * d).sum
            Some(l.toLong -> ((blocks.size.toLong, raw, 1000000L * raw / w)))
          }
        }.toMap
        (got == want) :| s"got $got want $want"
      }
    })
  }

  test("q353 energy distance equals the brute-force pair-sum reference") {
    import spark.implicits._
    val gen = for {
      na <- Gen.choose(2, 15); nb <- Gen.choose(2, 15)
      as <- Gen.listOfN(na, Gen.choose(0, 20))
      bs <- Gen.listOfN(nb, Gen.choose(0, 20))
    } yield (as.map(_.toDouble), bs.map(_.toDouble))
    check(Prop.forAll(gen) { case (as, bs) =>
      val rows = (as.map(("A", _)) ++ bs.map(("B", _))).toDF("g", "bal")
      val r = InferenceTestOps.energyDistance(rows, "bal", "g", "A", "B").collect()(0)
      val ac = as.map(v => math.floor(v * 100 + 0.5).toLong)
      val bc = bs.map(v => math.floor(v * 100 + 0.5).toLong)
      val txy = (for (x <- ac; y <- bc) yield math.abs(x - y)).sum
      val txx = (for (x <- ac; y <- ac) yield math.abs(x - y)).sum
      val tyy = (for (x <- bc; y <- bc) yield math.abs(x - y)).sum
      val n = ac.size; val m = bc.size
      val num = BigInt(1000000) * (BigInt(2) * txy * n * m -
        BigInt(txx) * m * m - BigInt(tyy) * n * n)
      val eU = (num / (BigInt(n) * n * m * m)).toLong
      val want = (n.toLong, m.toLong, txy, txx, tyy, eU)
      val gotT = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      (gotT == want) :| s"got $gotT want $want"
    })
  }
}
