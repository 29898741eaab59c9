package graft.state

import graft.SparkSpec
import graft.kafka.Wire

import java.net.{HttpURLConnection, URI}
import scala.io.Source

/** The reference's multi-instance Interactive-Query topology
  * (`MetadataService.java:30-68` key→host lookup,
  * `IQueriesService.java:84-87,104-109` cross-instance forward), closed
  * on a single machine with two REAL HTTP instances over complementary
  * key slices: a point lookup answered by EITHER instance must return
  * the owner's row (one forwarded hop), the metadata endpoints must
  * advertise the true ring and the true owner per key, and a misrouted
  * forwarded request must fail loudly instead of looping. */
class StateHttpRoutingSpec extends SparkSpec {

  private def get(port: Int, path: String,
                  forwarded: Boolean = false): (Int, String) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    if (forwarded) conn.setRequestProperty("X-Graft-Forwarded", "1")
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = Source.fromInputStream(is, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  test("two-instance ring: foreign keys forward, metadata tells the truth") {
    val s = spark
    import s.implicits._
    // a keyed store sliced the way the partitioner assigns ownership
    val rows = Seq(("alpha", 3L), ("bravo", 7L), ("carol", 11L),
      ("delta", 19L), ("echo", 23L), ("fox", 29L))
    def slice(idx: Int) = rows
      .filter { case (k, _) => Wire.partitionFor(k.getBytes("UTF-8"), 2) == idx }
      .toDF("key", "cnt")
    // both slices must be non-empty or the test is vacuous
    assert(slice(0).count() > 0 && slice(1).count() > 0)

    val srv0 = new StateHttpServer(s).registerView("counts", () => slice(0), "key")
    val srv1 = new StateHttpServer(s).registerView("counts", () => slice(1), "key")
    val p0 = srv0.start()
    val p1 = srv1.start()
    try {
      val ring = Seq(("127.0.0.1", p0), ("127.0.0.1", p1))
      srv0.enableRouting(ring, 0)
      srv1.enableRouting(ring, 1)

      // every key answers identically from BOTH instances (local or
      // one forwarded hop — the reference client never cares which)
      rows.foreach { case (k, v) =>
        val want = s"""[{"key":"$k","cnt":$v}]"""
        assert(get(p0, s"/state/keyvalue/counts/$k") == ((200, want)), s"$k via p0")
        assert(get(p1, s"/state/keyvalue/counts/$k") == ((200, want)), s"$k via p1")
      }

      // /state/instance/{store}/{key} names the true owner
      rows.foreach { case (k, _) =>
        val wantPort = if (Wire.partitionFor(k.getBytes("UTF-8"), 2) == 0) p0 else p1
        val (c, body) = get(p1, s"/state/instance/counts/$k")
        assert(c == 200 && body.contains(s""""port":$wantPort"""), s"$k: $body")
      }

      // /state/instances advertises the full ring from either instance
      Seq(p0, p1).foreach { p =>
        val (c, body) = get(p, "/state/instances")
        assert(c == 200 && body.contains(s""""port":$p0""") &&
          body.contains(s""""port":$p1"""), body)
      }

      // loop guard: a FORWARDED request for a key this instance does not
      // own must answer 500 (misrouted), never forward again
      val foreign = rows.collectFirst {
        case (k, _) if Wire.partitionFor(k.getBytes("UTF-8"), 2) == 1 => k
      }.get
      val (code, body) = get(p0, s"/state/keyvalue/counts/$foreign", forwarded = true)
      assert(code == 500 && body.contains("misrouted"), s"$code $body")
    } finally { srv0.stop(); srv1.stop() }
  }

  test("scans stay local by design: clients scatter-gather via the ring") {
    val s = spark
    import s.implicits._
    val rows = Seq(("alpha", 3L), ("bravo", 7L), ("carol", 11L),
      ("delta", 19L), ("echo", 23L), ("fox", 29L))
    def slice(idx: Int) = rows
      .filter { case (k, _) => Wire.partitionFor(k.getBytes("UTF-8"), 2) == idx }
      .toDF("key", "cnt")
    val srv0 = new StateHttpServer(s).registerView("counts", () => slice(0), "key")
    val srv1 = new StateHttpServer(s).registerView("counts", () => slice(1), "key")
    val p0 = srv0.start()
    val p1 = srv1.start()
    try {
      val ring = Seq(("127.0.0.1", p0), ("127.0.0.1", p1))
      srv0.enableRouting(ring, 0)
      srv1.enableRouting(ring, 1)
      // the union of per-instance /all scans is the whole table, and the
      // two scans are disjoint (slices, not copies)
      def keysOf(port: Int): Set[String] = {
        val (c, body) = get(port, "/state/keyvalues/counts/all")
        assert(c == 200, body)
        """"key":"([a-z]+)"""".r.findAllMatchIn(body).map(_.group(1)).toSet
      }
      val (k0, k1) = (keysOf(p0), keysOf(p1))
      assert((k0 & k1).isEmpty, s"slices overlap: ${k0 & k1}")
      assert((k0 | k1) == rows.map(_._1).toSet, s"union incomplete: ${k0 | k1}")
    } finally { srv0.stop(); srv1.stop() }
  }
}
