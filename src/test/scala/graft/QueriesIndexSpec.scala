package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Pins the generated QUERIES.md index: every query id must carry a
  * description (adjacent in-source comment or the generator's
  * supplemental map), and the committed file must match the current
  * source extraction row-for-row — a new query without a description, or
  * an edited comment without a regenerate, fails the build. Plan-shape
  * cells are only checked non-empty (they need a Spark run; the
  * generator main owns them). */
class QueriesIndexSpec extends AnyFunSuite {

  private lazy val descs = QueriesIndexGen.descriptions()

  test("every SparkEntry.queries id has a one-line description") {
    val ids = descs.map(_._1)
    assert(ids.toSet == SparkEntry.queries.keySet,
      s"extractor/queries drift: onlyExtract=${ids.toSet -- SparkEntry.queries.keySet} " +
        s"onlyQueries=${SparkEntry.queries.keySet -- ids.toSet}")
    val missing = descs.collect { case (id, d) if d.trim.isEmpty => id }
    assert(missing.isEmpty,
      s"queries without a description (add a comment or a supplemental entry): $missing")
  }

  test("committed QUERIES.md matches the current source extraction") {
    val path = Paths.get("QUERIES.md")
    assert(Files.exists(path), "QUERIES.md missing — run Test/runMain graft.QueriesIndexGen")
    val text = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
    // the headline count is generated too — it must not be able to drift
    // from the row count (the round-14 "306-query surface"/307-row slip)
    assert(text.startsWith(s"# QUERIES — generated index of the ${descs.size}-query surface"),
      s"stale headline count (expect ${descs.size}) — regenerate QUERIES.md")
    val rows = text
      .split('\n').filter(l => l.startsWith("| ") && !l.startsWith("| id "))
      .map { l =>
        // split on unescaped pipes only — descriptions may carry \| escapes
        val cells = l.split("(?<!\\\\)\\|").map(_.trim)
        // cells(0) is the empty prefix before the leading pipe
        (cells(1), cells(2), cells(3), cells(5))
      }
    val byId = rows.map(r => r._1 -> r).toMap
    assert(rows.length == descs.size,
      s"QUERIES.md has ${rows.length} rows, source has ${descs.size} — regenerate")
    val twinsOf = StreamVerify.twins.groupBy(_._2)
      .view.mapValues(_.map(_._1).sorted.mkString(", ")).toMap
    descs.foreach { case (id, desc) =>
      val row = byId.getOrElse(id, fail(s"QUERIES.md missing row for $id — regenerate"))
      assert(row._2 == desc.replace("|", "\\|"),
        s"stale description for $id — regenerate QUERIES.md")
      assert(row._3.nonEmpty && row._3 != "?", s"empty plan shape for $id")
      assert(row._4 == twinsOf.getOrElse(id, "—"),
        s"stale STREAMCHECK column for $id — regenerate QUERIES.md")
    }
  }
}
