package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ledger sync: every query id declared in [[SparkEntry.queries]] must
  * appear in COVERAGE.md — the §2 "single checklist" promise depends on
  * the ledger staying exhaustive, and the r13 audit found five green
  * queries whose rows the final commits outran. Pure string check, no
  * Spark session. */
class CoverageLedgerSpec extends AnyFunSuite {
  test("every declared query id appears in COVERAGE.md") {
    val cov = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(cov.contains)
    assert(missing.isEmpty,
      s"COVERAGE.md lacks rows for: ${missing.mkString(", ")}")
  }
}
