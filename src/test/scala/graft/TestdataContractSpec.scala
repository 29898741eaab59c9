package graft

import org.apache.spark.sql.types._

/** Round-start canary for driver-regenerated testdata: the harness
  * rewrites `/root/testdata` between rounds and has already changed a
  * physical type once (`events.ts`: TIMESTAMP(NANOS) → timestamp[us],
  * which silently broke 17 suites mid-project). This spec fails LOUDLY,
  * listing exactly which column drifted, so schema drift surfaces as one
  * named failure instead of seventeen obscure ones.
  *
  * Listed types are what the LIBRARY depends on (join keys, time
  * columns, text/embedding payloads) — extra columns the driver may add
  * are fine and ignored. */
class TestdataContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType,
      "n_name" -> StringType),
    "customer" -> Map("c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_name" -> StringType, "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_nationkey" -> IntegerType,
      "s_name" -> StringType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_retailprice" -> DoubleType,
      "p_size" -> IntegerType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_returnflag" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("driver tables carry the column types the library depends on") {
    val drift = for {
      (table, cols) <- expected.toSeq.sortBy(_._1)
      loaded = Tables(spark, dir, table).schema
      (name, want) <- cols.toSeq.sortBy(_._1)
      got = loaded.find(_.name == name).map(_.dataType)
      if !got.contains(want)
    } yield s"$table.$name: expected $want, got ${got.getOrElse("MISSING")}"
    assert(drift.isEmpty, s"testdata drifted:\n  ${drift.mkString("\n  ")}")
  }

  test("events time columns are usable whichever physical ts shape shipped") {
    // orders/lineitem date columns must be timestamps (j15/x7 epoch math)
    Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate").foreach {
      case (t, c) =>
        val dt = Tables(spark, dir, t).schema.find(_.name == c).map(_.dataType)
        assert(dt.exists(d => d == TimestampType || d == TimestampNTZType),
          s"$t.$c: expected a timestamp type, got $dt")
    }
    // whatever raw shape events.ts arrives in, the loader must surface
    // TimestampType ts + LongType ts_sec (the cross-engine contract)
    val ev = Tables.events(spark, dir).schema
    assert(ev.find(_.name == "ts").map(_.dataType).contains(TimestampType), ev)
    assert(ev.find(_.name == "ts_sec").map(_.dataType).contains(LongType), ev)
    Seq("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType).foreach {
      case (n, want) =>
        assert(ev.find(_.name == n).map(_.dataType).contains(want), s"$n: $ev")
    }
  }
}
