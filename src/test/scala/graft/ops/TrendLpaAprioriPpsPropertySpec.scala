package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import java.time.LocalDate

/** ScalaCheck properties for the round-8g/8h/8i/8j/8k batches: each
  * distributed operator against an independent sequential reference
  * (BigInt where exactness is claimed), on randomized inputs.
  */
class TrendLpaAprioriPpsPropertySpec extends SparkSpec {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("q314 segmented trend equals the brute-force exact-objective split") {
    import spark.implicits._
    val seriesGen = for {
      n <- Gen.choose(4, 30)
      xs <- Gen.listOfN(n, Gen.choose(0L, 300L))
    } yield xs
    check(Prop.forAll(seriesGen) { xs =>
      val daily = xs.zipWithIndex.map { case (x, i) =>
        (java.sql.Date.valueOf(LocalDate.of(2024, 1, 1).plusDays(i)), x)
      }.toDF("d", "x")
      val got = GraphMiningOps.segmentedTrend(daily).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
      // brute-force: maximize the exact fixed-point gain, tie on min i
      val n = xs.size
      val cs = xs.scanLeft(0L)(_ + _).tail
      val stot = cs.last
      def gain(i: Int): BigInt =
        (BigInt(10000) * cs(i - 1) * cs(i - 1)) / i +
          (BigInt(10000) * (stot - cs(i - 1)) * (stot - cs(i - 1))) / (n - i)
      val s1 = (1 until n).maxBy(i => (gain(i), BigInt(-i)))
      def ols(seg: Seq[(Int, Long)]): (Long, Long, Option[Long]) = {
        val m = BigInt(seg.size)
        val si = seg.map(p => BigInt(p._1)).sum
        val sy = seg.map(p => BigInt(p._2)).sum
        val siy = seg.map(p => BigInt(p._1) * p._2).sum
        val sii = seg.map(p => BigInt(p._1) * p._1).sum
        val num = m * siy - si * sy
        val den = m * sii - si * si
        (num.toLong, den.toLong,
          if (den == 0) None else Some((BigInt(1000000) * num / den).toLong))
      }
      val idx = xs.zipWithIndex.map { case (x, i) => (i + 1, x) }
      val (bn, bd, bs) = ols(idx.take(s1))
      val (an, ad, as_) = ols(idx.drop(s1))
      val wantB = (s1.toLong, s1.toLong, bn, bd, bs)
      val wantA = ((n - s1).toLong, s1.toLong, an, ad, as_)
      (got("before") == wantB) :| s"before ${got("before")} want $wantB" &&
        (got("after") == wantA) :| s"after ${got("after")} want $wantA"
    })
  }

  test("q315 LPA trajectory equals the sequential side-synchronous reference") {
    import spark.implicits._
    val edgesGen = for {
      n <- Gen.choose(3, 40)
      es <- Gen.listOfN(n, for {
        c <- Gen.choose(1L, 10L); p <- Gen.choose(101L, 112L)
      } yield (c, p))
    } yield es.distinct
    def ref(edges: Seq[(Long, Long)], rounds: Int): Seq[(Int, Long, Long, Long)] = {
      var lc = edges.map(_._1).distinct.map(c => c -> (2 * c)).toMap
      var lp = edges.map(_._2).distinct.map(p => p -> (2 * p + 1)).toMap
      def mode(ls: Seq[Long]): Long =
        ls.groupBy(identity).toSeq.map { case (l, g) => (-g.size, l) }.min._2
      def st(r: Int): (Int, Long, Long, Long) = {
        val sizes = (lc.values.toSeq ++ lp.values.toSeq)
          .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        val top = sizes.map { case (l, s) => (-s, l) }.min
        (r, sizes.size.toLong, top._2, -top._1)
      }
      val out = collection.mutable.ArrayBuffer(st(0))
      for (r <- 1 to rounds) {
        lc = edges.groupBy(_._1).map { case (c, es) => c -> mode(es.map(e => lp(e._2))) }
        lp = edges.groupBy(_._2).map { case (p, es) => p -> mode(es.map(e => lc(e._1))) }
        out += st(r)
      }
      out.toSeq
    }
    check(Prop.forAll(edgesGen) { es =>
      val got = GraphMiningOps.lpaCommunities(es.toDF("ck", "pk"), rounds = 2).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val want = ref(es, 2)
      // q315's RDD inner loop (narrow-scope treatment) must be
      // trajectory-identical to the DataFrame form on every graph shape
      val gotRdd = GraphMiningOps.lpaCommunitiesRdd(es.toDF("ck", "pk"),
          rounds = 2, parts = 3).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      ((got == want) :| s"got $got want $want") &&
        ((gotRdd == want) :| s"rdd $gotRdd want $want")
    })
  }

  test("q317 Apriori triples equal brute-force enumeration with the same thresholds") {
    import spark.implicits._
    val basketsGen = for {
      n <- Gen.choose(3, 12)
      bs <- Gen.listOfN(n, Gen.nonEmptyListOf(Gen.choose(1L, 8L)).map(_.distinct.take(5)))
    } yield bs
    check(Prop.forAll(basketsGen) { bs =>
      val items = bs.zipWithIndex.flatMap { case (b, i) => b.map(p => (i.toLong, p)) }
      val got = TrendStatOps.aprioriTriples(items.toDF("ok", "p"), minsup = 2L)
        .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
          (r.getLong(3), r.getLong(4)))).toMap
      val nOrd = bs.size.toLong
      val want = bs.flatMap(b => b.sorted.combinations(3).map(c => (c(0), c(1), c(2))))
        .groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2)
        .map { case (t, c) => t -> ((c, 1000000L * c / nOrd)) }.toMap
      (got == want) :| s"got $got want $want"
    })
  }

  test("q319 peak concurrency equals the brute candidate-instant maximum") {
    import spark.implicits._
    val DAY = 86400L
    val evGen = for {
      n <- Gen.choose(1, 40)
      ts <- Gen.listOfN(n, Gen.choose(0L, 3 * DAY - 1))
    } yield ts
    check(Prop.forAll(evGen) { ts =>
      val events = ts.zipWithIndex
        .map { case (t, i) => (i.toLong, new java.sql.Timestamp(t * 1000L)) }
        .toDF("event_id", "ts")
      val got = TrendStatOps.peakConcurrency(events, lenSec = 1800L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      // reference: c(t) = #{i: s_i <= t < e_i}; per-day candidates are the
      // day-clipped piece starts (event start, or midnight for spills)
      val iv = ts.map(t => (t, t + 1800L))
      def cAt(t: Long): Long = iv.count { case (s, e) => s <= t && t < e }.toLong
      val want = iv.flatMap { case (s, e) =>
        val d0 = s / DAY
        Seq((d0, s)) ++ (if (e > (d0 + 1) * DAY) Seq((d0 + 1, (d0 + 1) * DAY)) else Nil)
      }.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, cands) =>
        val scored = cands.map(_._2).distinct.map(t => (cAt(t), t))
        val peak = scored.map(_._1).max
        (d, peak, scored.filter(_._1 == peak).map(_._2).min * 1000000L)
      }
      (got == want) :| s"got $got want $want"
    })
  }

  test("q322 systematic PPS equals the sequential threshold walk and sums to k") {
    import spark.implicits._
    val wGen = for {
      n <- Gen.choose(2, 30)
      ws <- Gen.listOfN(n, Gen.choose(1L, 500L))
    } yield ws
    check(Prop.forAll(wGen) { ws =>
      val df = ws.zipWithIndex.map { case (w, i) => ((i + 1).toLong, w) }.toDF("sk", "w")
      val k = 5L
      val got = TrendStatOps.systematicPps(df, k).collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSeq
      val wtot = ws.sum
      val step = wtot / k
      val r0 = step / 2
      val thresholds = (0L until k).map(j => r0 + j * step)
      val cum = ws.scanLeft(0L)(_ + _)
      val want = ws.indices.map { i =>
        ((i + 1).toLong, thresholds.count(t => cum(i) <= t && t < cum(i + 1)).toLong)
      }.filter(_._2 >= 1)
      (got == want) :| s"got $got want $want" &&
        (got.map(_._2).sum == k) :| "sums to k"
    })
  }

  test("q324 kappa matches the exact BigInt formula on random contingency tables") {
    import spark.implicits._
    val labGen = for {
      n <- Gen.choose(4, 60)
      ls <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 2L); b <- Gen.choose(0L, 2L)
      } yield (a, b))
    } yield ls
    check(Prop.forAll(labGen) { ls =>
      val got = EvalReplayOps.cohenKappa(ls.toDF("a", "b")).collect()
      val nn = BigInt(ls.size)
      val dg = BigInt(ls.count(p => p._1 == p._2))
      val rs = (0L to 2L).map(c =>
        BigInt(ls.count(_._1 == c)) * BigInt(ls.count(_._2 == c))).sum
      val want = (BigInt(1000000) * (nn * dg - rs)) / (nn * nn - rs)
      // BigInt / floors toward zero for positive, matches div; sign-safe
      // here because kappa inputs keep |num| handled by truncation in both
      val num = BigInt(1000000) * (nn * dg - rs)
      val den = nn * nn - rs
      val trunc = (num.abs / den) * num.signum
      got.forall(_.getLong(4) == trunc.toLong) :| s"kappa ${got.head.getLong(4)} want $trunc (naive $want)"
    })
  }

  test("q328 serpentine shards: exact sequential reference, doc counts within 1") {
    import spark.implicits._
    val szGen = for {
      n <- Gen.choose(2, 50)
      ss <- Gen.listOfN(n, Gen.choose(1L, 400L))
    } yield ss
    check(Prop.forAll(szGen) { ss =>
      val docs = ss.zipWithIndex.map { case (s, i) => ((i + 1).toLong, s) }
        .toDF("doc_id", "n_chars")
      val shards = 4
      val got = CorpusStatOps.serpentineShards(docs, shards).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val ranked = ss.zipWithIndex.map { case (s, i) => (s, (i + 1).toLong) }
        .sortBy { case (s, id) => (-s, id) }
      val assigned = ranked.zipWithIndex.map { case ((s, id), r0) =>
        val block = r0 / shards; val pos = r0 % shards
        val sh = if (block % 2 == 0) pos else shards - 1 - pos
        (sh.toLong, s)
      }
      val want = assigned.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (sh, g) => (sh, g.size.toLong, g.map(_._2).sum) }
      val counts = got.map(_._2)
      (got == want) :| s"got $got want $want" &&
        (counts.isEmpty || counts.max - counts.min <= 1) :| "doc counts within 1"
    })
  }
}
