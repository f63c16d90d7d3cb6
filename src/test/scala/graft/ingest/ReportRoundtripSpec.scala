package graft.ingest

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: render(blocks) → parse ≡ identity (modulo trim), at any
  * partition count — the guarantee the reference only gets from
  * repartition(1) (SURVEY §5.2 item 3).
  */
class ReportRoundtripSpec extends SparkSpec {

  private val keyGen: Gen[String] =
    Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
      .suchThat(k => k.nonEmpty && k != ReportFormat.BlockTerminatorKey)

  private val valGen: Gen[String] = Gen.listOfN(12,
    Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.const(':'), 1 -> Gen.const(' ')))
    .map(_.mkString.trim)

  private val blockGen: Gen[Seq[(String, String)]] = for {
    n <- Gen.choose(1, 8)
    keys <- Gen.listOfN(n, keyGen).map(_.distinct)
    vals <- Gen.listOfN(keys.size, valGen)
    endVal <- valGen
  } yield keys.zip(vals) :+ (ReportFormat.BlockTerminatorKey -> endVal)

  test("parse(render(blocks)) == blocks as key→value maps, at any partition count") {
    val prop = Prop.forAll(Gen.choose(1, 6).flatMap(Gen.listOfN(_, blockGen)), Gen.choose(1, 7)) {
      (blocks: List[Seq[(String, String)]], parts: Int) =>
        val dir = Fixtures.tmpDir()
        Fixtures.writeReport(dir, "p.TXT", ReportPipeline.renderReport(blocks))
        val lines = ReportFormat.toLines(ReportFormat.readReportFiles(spark, dir.toString))
        val parsed = ReportFormat.assembleBlocks(lines.repartition(parts))
          .orderBy("block_id").collect()
          .map(_.getAs[Map[String, String]]("kv"))
        val expected = blocks.map(_.toMap)
        parsed.toSeq == expected
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }
}
