package graft.kafka

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}

/** Cross-implementation check of the REAL zstd compressor: frames
  * produced by [[Zstd.compress]] must decode byte-exactly under the
  * UPSTREAM `zstd` CLI — the reverse direction of `ZstdSpec`'s
  * CLI-produced fixtures, so both coder directions are held to the
  * defining implementation, not to each other. Skipped (assume) when
  * no CLI is installed; in this repo's environment one is. */
class ZstdEncodeInteropSpec extends AnyFunSuite {

  private def findCli(): Option[Path] =
    (Seq("/root/miniconda/bin/zstd", "/usr/bin/zstd", "/usr/local/bin/zstd")
      .map(Paths.get(_)) ++
      sys.env.get("PATH").toSeq.flatMap(_.split(':'))
        .map(d => Paths.get(d, "zstd")))
      .find(p => Files.isExecutable(p))

  test("upstream zstd CLI decodes our compressed frames byte-exactly") {
    val cli = findCli()
    assume(cli.nonEmpty, "no zstd CLI on this machine — cross-check skipped")
    val rnd = new scala.util.Random(99)
    val payloads: Seq[(String, Array[Byte])] = Seq(
      "text" -> ("a training corpus line with repeated phrases; " * 800).getBytes,
      "runs" -> Array.fill(90000)('z'.toByte),
      "periodic" -> Array.tabulate(140000)(i => (i % 97).toByte),
      "mixed" -> {
        val a = new Array[Byte](60000)
        rnd.nextBytes(a)
        // plant long self-repeats among the noise
        System.arraycopy(a, 1000, a, 30000, 8000)
        System.arraycopy(a, 0, a, 50000, 10000)
        a
      },
      "crossBlock" -> {
        val a = new Array[Byte](140000)
        rnd.nextBytes(a)
        System.arraycopy(a, 0, a, 131000, 9000)
        a
      },
      "tiny" -> "x".getBytes,
      "empty" -> Array.empty[Byte])
    val dir = Files.createTempDirectory("zstd_enc")
    payloads.foreach { case (name, data) =>
      val fz = dir.resolve(s"$name.zst")
      val fout = dir.resolve(s"$name.out")
      Files.write(fz, Zstd.compress(data))
      val pb = new ProcessBuilder(cli.get.toString, "-d", "-f", "-q",
        fz.toString, "-o", fout.toString)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val log = new String(proc.getInputStream.readAllBytes(), "UTF-8")
      val rc = proc.waitFor()
      assert(rc == 0, s"$name: CLI exit $rc: $log")
      val got = Files.readAllBytes(fout)
      assert(java.util.Arrays.equals(got, data),
        s"$name: CLI decoded ${got.length} B != ${data.length} B expected")
    }
  }
}
