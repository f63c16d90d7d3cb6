package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import java.nio.file.Files
import java.sql.Timestamp

/** ScalaCheck properties for the round-8 batch: packing conservation laws,
  * item-CF against a sequential reference, binseg against exhaustive
  * search with the identical integer objective, and reservoir-sample
  * partition invariance.
  */
class ReservoirPackingCfPropertySpec extends SparkSpec {

  private def writeDocs(lens: Seq[Int]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8p_docs").toString
    lens.zipWithIndex.map { case (len, i) =>
      ((i + 1).toLong, Seq.fill(len)("w").mkString(" "), "en", "s", len)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("q285 conservation laws hold on random document-length mixes") {
    val lensGen = for {
      n <- Gen.choose(1, 12)
      lens <- Gen.listOfN(n, Gen.choose(1, 1200))
    } yield lens
    val prop = Prop.forAll(lensGen) { lens =>
      val got = CorpusOps.q285PackedBlocks(spark, writeDocs(lens)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val total = lens.map(_.toLong).sum
      val lossTotal = lens.map(l => l.toLong - (l + 3) / 4).sum
      val blocks = got.map(_._1)
      (blocks.toSeq == (0L until ((total + 511) / 512)).toSeq) :| "contiguous blocks" &&
        (got.map(_._3).sum == total) :| "token conservation" &&
        (got.map(_._4).sum == lossTotal) :| "loss-token conservation" &&
        got.dropRight(1).forall(_._5 == 0L) :| "only the last block padded" &&
        got.forall(b => b._4 <= b._3 && b._3 + b._5 == 512L) :| "block arithmetic"
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }

  /** Sequential item-CF reference with the identical ppm/tie rules. */
  private def refCf(baskets: Seq[(Long, Long)]): Seq[(Long, Int, Long, Long, Long)] = {
    val b = baskets.distinct
    val ci = b.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairCounts = b.groupBy(_._1).values.toSeq.flatMap { items =>
      val is = items.map(_._2).sorted
      for (i <- is; j <- is if i < j) yield (i, j)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sym = pairCounts.toSeq.flatMap { case ((i, j), c) => Seq((i, j, c), (j, i, c)) }
    sym.groupBy(_._1).toSeq.flatMap { case (item, ns) =>
      val scored = ns.map { case (_, nbr, cij) =>
        val sim = math.floor(
          cij.toDouble / math.sqrt((ci(item) * ci(nbr)).toDouble) * 1e6 + 0.5).toLong
        (nbr, cij, sim)
      }.sortBy(t => (-t._3, t._1)).take(3)
      scored.zipWithIndex.map { case ((nbr, cij, sim), k) =>
        (item, k + 1, nbr, cij, sim)
      }
    }.sortBy(t => (t._1, t._2))
  }

  test("q288 matches the sequential CF reference on random baskets") {
    import spark.implicits._
    val basketsGen = for {
      n <- Gen.choose(1, 8)
      baskets <- Gen.listOfN(n, for {
        ok <- Gen.choose(1L, 8L)
        items <- Gen.listOfN(4, Gen.choose(101L, 108L))
      } yield items.map(ok -> _))
    } yield baskets.flatten
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val prop = Prop.forAll(basketsGen) { baskets =>
      val d = Files.createTempDirectory("graft_r8p_cf").toString
      baskets.zipWithIndex.map { case ((ok, pk), k) =>
        (ok, pk, 1L, k + 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts)
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
        .coalesce(1).write.parquet(s"$d/lineitem.parquet")
      val got = GraphMiningOps.q288ItemCf(spark, d).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
      got == refCf(baskets)
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }

  /** Exhaustive binseg reference with the identical integer objective. */
  private def refBinseg(xs: Seq[Long]): Seq[(Int, Long)] = {
    val n = xs.length
    val cs = xs.scanLeft(0L)(_ + _) // cs(i) = sum of first i
    def seg(a: Int, b: Int): Long = { // (a..b] as 1-based prefix indices
      val s = cs(b) - cs(a); val w = b - a
      (10000L * s * s) / w
    }
    val cand1 = (1 until n).map(i => (i, seg(0, i) + seg(i, n)))
    val (s1, obj1) = cand1.maxBy { case (i, g) => (g, -i) }
    val cand2 = (1 until n).filter(_ != s1).map { i =>
      val lo = math.min(i, s1); val hi = math.max(i, s1)
      (i, seg(0, lo) + seg(lo, hi) + seg(hi, n))
    }
    val (s2, obj2) = cand2.maxBy { case (i, g) => (g, -i) }
    Seq((s1, obj1), (s2, obj2))
  }

  test("q292 matches exhaustive-search binseg on random series") {
    import spark.implicits._
    val seriesGen = for {
      n <- Gen.choose(3, 18)
      xs <- Gen.listOfN(n, Gen.choose(0L, 5L))
    } yield xs
    val prop = Prop.forAll(seriesGen) { xs =>
      val d = Files.createTempDirectory("graft_r8p_bs").toString
      xs.zipWithIndex.map { case (x, i) =>
        // one order per day with totalprice x·1e5 dollars -> quantized
        // series value exactly x (floor(x·1e7 cents / 1e7))
        ((i + 1).toLong, 1L, "O", x * 100000.0,
          Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"), "1-URGENT")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
        .coalesce(1).write.parquet(s"$d/orders.parquet")
      val got = TrendStatOps.q292ChangepointBinseg(spark, d).collect()
        .map(r => (r.getDate(1).toString, r.getLong(2)))
      val ref = refBinseg(xs).map { case (s, o) => (f"2024-01-$s%02d", o) }
      got.toSeq == ref
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }

  test("q283 sample is invariant to the input file layout") {
    import spark.implicits._
    val rows = (1L to 60L).map(i => (i, s"doc $i", s"s${i % 3}", (i % 7 + 1).toInt))
    def write(d: String, parts: Int): Unit =
      rows.toDF("doc_id", "text", "source", "n_chars")
        .repartition(parts).write.parquet(s"$d/documents.parquet")
    val d1 = Files.createTempDirectory("graft_r8p_wr1").toString
    val d5 = Files.createTempDirectory("graft_r8p_wr5").toString
    write(d1, 1); write(d5, 5)
    def run(d: String) = PipelineOps.q283WeightedReservoir(spark, d).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(run(d1) === run(d5))
  }
}
