package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The written layout is the contract: partition dirs, bounded file
  * counts, in-file sort order, and a lossless round trip. */
class CuratedWriterSpec extends SparkSpec {

  test("partition dirs, bounded files per dir, in-file sort, exact round trip") {
    val s = spark
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("curated").toString
    val events = Tables.events(s, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "event_type", "ts_sec", "value")

    CuratedWriter.write(events, out, Seq("event_type"),
      Seq(col("ts_sec"), col("event_id")), filesPerDir = 3)

    val back = s.read.parquet(out)
    // lossless round trip (partition col comes back as a directory column)
    assert(back.count() == events.count())
    assert(back.select(sum("event_id")).head.getLong(0) ==
      events.select(sum("event_id")).head.getLong(0))

    // each partition directory holds at most filesPerDir parquet files
    val root = new java.io.File(out)
    val dirs = root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("event_type="))
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty && files.length <= 3, s"${d.getName}: ${files.length} files")
    }

    // rows inside every physical file are sorted by (ts_sec, event_id)
    val perFile = back
      .withColumn("f", input_file_name())
      .select("f", "ts_sec", "event_id")
      .collect()
      .groupBy(_.getString(0))
    perFile.foreach { case (f, rows) =>
      val keys = rows.map(r => (r.getLong(1), r.getLong(2))).toSeq
      assert(keys == keys.sorted, s"unsorted rows in $f")
    }
  }
}
