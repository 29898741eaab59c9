package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Every SCALAR in the library's hot paths is a codegen'd built-in or a
  * custom Catalyst Expression by design — a scalar Scala UDF is an
  * opaque box that blocks whole-stage codegen, filter pushdown, and
  * null-safety reasoning. This guard fails the build if one sneaks into
  * main source. Typed `Aggregator`s wrapped via `udaf(...)` are NOT
  * flagged: they are the deliberate custom-aggregate surface (SURVEY
  * §2.8 — bounded top-k, KMV, reservoirs), where no codegen'd
  * alternative exists and the blocking-codegen concern doesn't apply
  * the same way (aggregation buffers aren't scalar pipelines). */
class NoUdfSpec extends AnyFunSuite {

  private def scalaFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq

  test("main source registers no scalar Scala UDFs") {
    val root = Paths.get("src/main/scala")
    assume(Files.exists(root), "main source tree not present")
    val offenders = scalaFiles(root).flatMap { p =>
      val src = new String(Files.readAllBytes(p), "UTF-8")
      // word-boundary match so `udaf(` (allowed) never trips the scalar rule
      val scalarUdf = """(?<![a-zA-Z0-9_])udf\(""".r
      val hits = Seq(
        scalarUdf.findFirstIn(src).map(_ => "udf("),
        if (src.contains("spark.udf.register")) Some("spark.udf.register") else None
      ).flatten
      if (hits.isEmpty) None else Some(s"$p: ${hits.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"scalar UDF registrations found in main source:\n${offenders.mkString("\n")}")
  }

  test("main source never case-converts without Locale.ROOT") {
    // the round-10 incident class: String.toLowerCase() without a locale
    // follows the JVM default locale (Turkish-I etc.), forking results
    // across deployments. Every case conversion in main source must pass
    // Locale.ROOT (comment/scaladoc lines are exempt).
    val root = Paths.get("src/main/scala")
    assume(Files.exists(root), "main source tree not present")
    val bare = """to(Lower|Upper)Case(\(\)|(?=[^(a-zA-Z0-9_]|$))""".r
    val offenders = scalaFiles(root).flatMap { p =>
      val lines = new String(Files.readAllBytes(p), "UTF-8").linesIterator
      lines.zipWithIndex.collect {
        case (l, i)
          if !l.trim.startsWith("*") && !l.trim.startsWith("//") &&
            bare.findFirstIn(l).isDefined &&
            !l.contains("Locale.ROOT") =>
          s"$p:${i + 1}: ${l.trim}"
      }
    }
    assert(offenders.isEmpty,
      s"locale-less case conversions in main source:\n${offenders.mkString("\n")}")
  }
}
