package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** KTable⋈KTable primary-key join changelog semantics — the reference's
  * driven scenario `TopologiesTest.scala:219-239` (left join with
  * right-side tombstones), with clean relational emissions. */
class PkJoinStreamSpec extends SparkSpec {

  /** Drives the join with one micro-batch per record (`step` after each
    * feed), mirroring the reference's synchronous `TopologyTestDriver`
    * pipe — otherwise left/right records race across batch boundaries and
    * the emission order is nondeterministic (cross-topic arrival order is
    * unspecified in the reference too). */
  private def run(how: String,
                  feed: (MemoryStream[Rec], MemoryStream[Rec], () => Unit) => Unit,
                  name: String): List[JoinChange] = {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val left = MemoryStream[Rec]
    val right = MemoryStream[Rec]
    val q = PkJoinStream.join(left.toDS(), right.toDS(), how)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      feed(left, right, () => q.processAllAvailable())
      q.processAllAvailable()
      s.table(name).as[JoinChange].collect().sortBy(_.seq).toList
    } finally q.stop()
  }

  test("left join: right updates re-emit, right tombstone null-pads, left tombstone retracts") {
    val out = run("left", (l, r, step) => {
      r.addData(Rec("key1", "3", 0, 1)); step()   // right first: no left yet → silent
      l.addData(Rec("key1", "pv1", 0, 2)); step() // → (pv1, 3)
      l.addData(Rec("key1", "pv2", 0, 3)); step() // → (pv2, 3)
      r.addData(Rec("key1", null, 0, 4)); step()  // right delete → (pv2, null)
      r.addData(Rec("key2", null, 0, 5)); step()  // tombstone for absent key → silent
      l.addData(Rec("key1", null, 0, 6)); step()  // left delete → retraction
    }, "pk_left")
    assert(out == List(
      JoinChange("key1", "pv1", "3", deleted = false, 2),
      JoinChange("key1", "pv2", "3", deleted = false, 3),
      JoinChange("key1", "pv2", null, deleted = false, 4),
      JoinChange("key1", null, null, deleted = true, 6)))
  }

  test("inner join: emits only while both sides exist; either delete retracts once") {
    val out = run("inner", (l, r, step) => {
      l.addData(Rec("k", "L1", 0, 1)); step() // only left → silent
      r.addData(Rec("k", "R1", 0, 2)); step() // both → (L1, R1)
      l.addData(Rec("k", "L2", 0, 3)); step() // → (L2, R1)
      r.addData(Rec("k", null, 0, 4)); step() // right delete → retract
      l.addData(Rec("k", "L3", 0, 5)); step() // right still absent → silent
      r.addData(Rec("k", "R2", 0, 6)); step() // → (L3, R2)
    }, "pk_inner")
    assert(out == List(
      JoinChange("k", "L1", "R1", deleted = false, 2),
      JoinChange("k", "L2", "R1", deleted = false, 3),
      JoinChange("k", null, null, deleted = true, 4),
      JoinChange("k", "L3", "R2", deleted = false, 6)))
  }

  test("stale redelivery (seq <= side's high-water mark) is not re-applied") {
    val out = run("left", (l, r, step) => {
      l.addData(Rec("k", "v1", 0, 1)); step()
      l.addData(Rec("k", "v1", 0, 1)); step() // at-least-once duplicate → dropped
      l.addData(Rec("k", "v2", 0, 2)); step()
    }, "pk_replay")
    assert(out == List(
      JoinChange("k", "v1", null, deleted = false, 1),
      JoinChange("k", "v2", null, deleted = false, 2)))
  }

  test("replay guard survives a full tombstone: pre-tombstone redelivery stays dropped") {
    val out = run("left", (l, r, step) => {
      l.addData(Rec("k", "v1", 0, 1)); step()
      l.addData(Rec("k", null, 0, 2)); step()  // tombstone — key fully unset
      l.addData(Rec("k", "v1", 0, 1)); step()  // redelivery of seq 1 → must NOT resurrect
    }, "pk_replay_tomb")
    assert(out == List(
      JoinChange("k", "v1", null, deleted = false, 1),
      JoinChange("k", null, null, deleted = true, 2)))
  }

  test("KTable self-join (reference TopologiesTest.scala:241-253)") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val t = MemoryStream[Rec]
    val q = PkJoinStream.join(t.toDS(), t.toDS(), "inner")
      .writeStream.format("memory").queryName("pk_self").outputMode("append").start()
    try {
      t.addData(Rec("key1", "a", 0, 1))
      q.processAllAvailable()
      val out = s.table("pk_self").as[JoinChange].collect().toList
      // one row joins itself exactly once
      assert(out == List(JoinChange("key1", "a", "a", deleted = false, 1)))
    } finally q.stop()
  }
}
