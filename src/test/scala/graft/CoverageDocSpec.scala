package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Pins COVERAGE.md's hand-written citations to the live registries —
  * the [[QueriesIndexSpec]] generated-artifact discipline applied to
  * the hand-written doc. Round 15 assigned STREAMCHECK twin ids and
  * COVERAGE.md cited three of them stale (`x115_quota` for
  * `x133_quota`, …) the very round they shipped; this spec makes that
  * class of drift a build failure:
  *
  *  - every `STREAMCHECK twin \`id\`` citation must name a twin in
  *    [[StreamVerify.twins]];
  *  - every `oracle \`id\`` citation must resolve to a
  *    [[SparkEntry.queries]] key — exactly, or as an unambiguous
  *    `id_`-prefix (the doc's shorthand for e.g. `a3` →
  *    `a3_count_by_key`).
  */
class CoverageDocSpec extends AnyFunSuite {

  private lazy val text: String = {
    val p = Paths.get("COVERAGE.md")
    assert(Files.exists(p), "COVERAGE.md missing")
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
  }

  test("every STREAMCHECK twin id cited in COVERAGE.md is in StreamVerify's registry") {
    val cited = "STREAMCHECK twin `([a-z0-9_]+)`".r
      .findAllMatchIn(text).map(_.group(1)).toSet
    assert(cited.nonEmpty, "no twin citations found — pattern drifted?")
    val twins = StreamVerify.twins.map(_._1).toSet
    val stale = cited -- twins
    assert(stale.isEmpty,
      s"COVERAGE.md cites STREAMCHECK twin ids not in StreamVerify.twins: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }

  test("every oracle id cited in COVERAGE.md resolves to a SparkEntry.queries key") {
    val cited = "oracle `([a-z0-9_]+)`".r.findAllMatchIn(text).map(_.group(1)).toSet
    assert(cited.size >= 200, s"only ${cited.size} oracle citations — pattern drifted?")
    val keys = SparkEntry.queries.keySet
    val stale = cited.filterNot { id =>
      keys.contains(id) || keys.count(_.startsWith(id + "_")) == 1
    }
    assert(stale.isEmpty,
      s"COVERAGE.md cites oracle ids that resolve to no (or >1) query: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }
}
