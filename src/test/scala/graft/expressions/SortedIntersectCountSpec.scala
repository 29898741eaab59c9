package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.functions._

/** [[SortedIntersectCount]] — exactness vs `array_intersect` with the
  * exit disabled, and the bail-out contract against random requirements. */
class SortedIntersectCountSpec extends SparkSpec {

  import spark.implicits._

  private def sic(a: String, b: String, req: String) =
    GraftShims.column(SortedIntersectCount(
      GraftShims.expression(col(a)), GraftShims.expression(col(b)),
      GraftShims.expression(col(req))))

  private def randomSets(n: Int): Seq[(Seq[String], Seq[String])] = {
    val rng = new scala.util.Random(7)
    Seq.fill(n) {
      def set() = Seq.fill(rng.nextInt(40))(s"w${rng.nextInt(30)}")
        .distinct.sorted
      (set(), set())
    }
  }

  test("required <= 0: equals size(array_intersect) on random sorted sets") {
    val df = randomSets(200).toDF("a", "b").withColumn("req", lit(0))
    val rows = df.select(sic("a", "b", "req").as("got"),
        size(array_intersect(col("a"), col("b"))).as("want"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("early exit: result passes the requirement iff the true size does; exact when passing") {
    val rng = new scala.util.Random(11)
    val data = randomSets(200).map { case (a, b) => (a, b, rng.nextInt(12)) }
    val rows = data.toDF("a", "b", "req")
      .select(col("req"), sic("a", "b", "req").as("got"),
        size(array_intersect(col("a"), col("b"))).as("truth"))
      .collect()
    rows.foreach { r =>
      val (req, got, truth) = (r.getInt(0), r.getInt(1), r.getInt(2))
      if (truth >= req) assert(got == truth, s"must be exact: $r")
      else assert(got < req, s"bail-out must stay below the requirement: $r")
    }
  }

  test("null elements never intersect and never crash (SQL-registered surface)") {
    // user SQL can hand arrays with nulls — sort_array puts them first;
    // SQL semantics: null ≠ null, so they contribute nothing
    graft.GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT sorted_intersect_count(array(NULL, 'a', 'b'), array(NULL, 'b', 'c'), 0) AS c1,
        |       sorted_intersect_count(array(CAST(NULL AS STRING)), array(CAST(NULL AS STRING)), 0) AS c2,
        |       sorted_intersect_count(array(NULL, 'a'), array('a', 'z'), 1) AS c3
        |""".stripMargin).collect().head
    assert(rows.getInt(0) == 1, "b intersects once, nulls skipped")
    assert(rows.getInt(1) == 0, "null-only arrays are disjoint")
    assert(rows.getInt(2) == 1, "early exit path skips nulls too")
  }

  test("empty and disjoint inputs") {
    val df = Seq(
      (Seq.empty[String], Seq("a", "b"), 0),
      (Seq("a"), Seq.empty[String], 3),
      (Seq("a", "b"), Seq("c", "d"), 1)).toDF("a", "b", "req")
    assert(df.select(sic("a", "b", "req")).as[Int].collect().toSeq == Seq(0, 0, 0))
  }
}
