package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.sys.process._

/** Oracle result-TYPE lint (portability class #5, SURVEY §8.4) — the
  * type-side complement of PlanLintSpec's Round-over-double lint.
  *
  * DuckDB silently widens SUM / COALESCE-over-BIGINT chains to HUGEINT;
  * pandas converts HUGEINT to float64; Spark ships int64; the driver's
  * float canonicalization then distinguishes "82.0" from "82" and the
  * hash flips — exactly how q345/q356 failed round 8 while the builder's
  * %.6g selfcheck canon collided them (green locally, red at the gate,
  * twice). The fix is always CAST(... AS BIGINT) in the oracle SQL, so
  * this lint's allowlist is EMPTY by design and lives in
  * tools/selfcheck.py --typelint, which BINDS (does not run) all catalog
  * oracles against sf0.001 and rejects any HUGEINT/UHUGEINT output
  * column.
  *
  * Shells driver-side python (duckdb is a driver-only dependency, never
  * linked by library code); cancels rather than fails where that python
  * is absent so the suite stays green on minimal runners.
  */
class OracleTypeLintSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  private def havePythonDuckdb: Boolean =
    try Process(Seq("python3", "-c", "import duckdb")).! == 0
    catch { case _: Throwable => false }

  private def runTypelint(oracles: Map[String, String]): (Int, String) = {
    val json = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(json, Verify.oracleJson(oracles))
    val out = new StringBuilder
    val code = Process(
      Seq("python3", "tools/selfcheck.py", "--typelint", sfDir, json.toString))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    Files.deleteIfExists(json)
    (code, out.toString)
  }

  test("no catalog oracle outputs a HUGEINT/UHUGEINT column (empty allowlist)") {
    assume(havePythonDuckdb, "driver-side python3+duckdb not available")
    val (code, out) = runTypelint(SparkEntry.oracleSql)
    assert(code == 0, s"typelint flagged oracle output types:\n$out")
    assert(out.contains(s"${SparkEntry.oracleSql.size} oracles, 0 bad"), out)
  }

  test("the lint fires on a planted HUGEINT fixture") {
    assume(havePythonDuckdb, "driver-side python3+duckdb not available")
    val planted = Map(
      // SUM over INTEGER is HUGEINT in DuckDB — the exact q345/q356 class
      "q999_planted_hugeint" ->
        "SELECT SUM(r_regionkey) AS s FROM region",
      // and the cast form that the policy prescribes stays legal
      "q998_planted_cast" ->
        "SELECT CAST(SUM(r_regionkey) AS BIGINT) AS s FROM region")
    val (code, out) = runTypelint(planted)
    assert(code != 0, s"planted HUGEINT fixture did not fire:\n$out")
    assert(out.contains("q999_planted_hugeint") && out.contains("HUGEINT"), out)
    assert(!out.contains("q998_planted_cast:"), out)
  }

  test("the RUNTIME dtype-class compare fires on a planted float64-vs-int64 pair") {
    // the --typelint drill above proves the BIND-time net; this drill
    // proves the second net — the per-column dtype-class compare in the
    // main selfcheck loop — also fires, on exactly the pair the %.6g
    // value canon collides: spark int64(82) vs oracle float64(82.0) hash
    // IDENTICALLY, so only the dtype compare can catch the drift
    // (round-9 verdict optional-hardening task).
    assume(havePythonDuckdb, "driver-side python3+duckdb not available")
    val outDir = Files.createTempDirectory("graft_drift")
    Files.createDirectory(outDir.resolve("q997_planted_drift"))
    Files.createDirectory(outDir.resolve("q996_planted_control"))
    // stage the "Spark results" (both int64) via driver-side duckdb
    val stage =
      s"""import duckdb
         |con = duckdb.connect()
         |con.execute("COPY (SELECT CAST(82 AS BIGINT) AS v) TO '$outDir/q997_planted_drift/p.parquet' (FORMAT PARQUET)")
         |con.execute("COPY (SELECT CAST(82 AS BIGINT) AS v) TO '$outDir/q996_planted_control/p.parquet' (FORMAT PARQUET)")
         |""".stripMargin
    assert(Process(Seq("python3", "-c", stage)).! == 0)
    Files.writeString(outDir.resolve("oracle_sql.json"), Verify.oracleJson(Map(
      "q997_planted_drift" -> "SELECT 82.0 AS v",             // float64 oracle
      "q996_planted_control" -> "SELECT CAST(82 AS BIGINT) AS v")))
    val out = new StringBuilder
    val code = Process(
      Seq("python3", "tools/selfcheck.py", sfDir, outDir.toString))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    val o = out.toString
    assert(code != 0, s"planted dtype drift did not fail the compare:\n$o")
    // the drift line proves WHICH net fired: rows+schema+hash all match,
    // only the dtype-class compare flags it
    assert(o.contains("q997_planted_drift: MISMATCH") && o.contains("hash=true")
      || o.contains("q997_planted_drift: MISMATCH") && o.contains("hash=True"), o)
    assert(o.contains("dtype-class drift v: spark=int oracle=float"), o)
    assert(o.contains("q996_planted_control: OK"), o)
  }
}
