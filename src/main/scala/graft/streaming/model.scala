package graft.streaming

/** Canonical streaming record shapes.
  *
  * The reference engine is bytes-in/bytes-out with pluggable serdes
  * (`serdes/JsonSerde.scala:10-36`); we mirror that with String key/value
  * plus an event-time and a per-source monotonic sequence number:
  *  - `value == null` is a tombstone (Kafka Streams delete,
  *    `TopologiesTest.scala:234-235`);
  *  - `seq` gives a total order for same-key records inside one
  *    micro-batch (Kafka offset equivalent) — stateful operators sort on
  *    it, so results do not depend on shuffle iteration order;
  *  - structured payloads ride as JSON in `value` (use
  *    `from_json`/`to_json` at the edges, exactly where the reference
  *    plugs serdes).
  */
case class Rec(key: String, value: String, ts: Long, seq: Long)

/** A changelog row emitted by [[KTableStream]]: the key's new value (null =
  * deleted) and the value it replaced (null = none). */
case class Change(key: String, value: String, old: String, seq: Long)

/** A primary-key table-table join change: latest joined row for `key`
  * after applying one input change. `deleted == true` retracts the key. */
case class JoinChange(key: String, leftValue: String, rightValue: String,
                      deleted: Boolean, seq: Long)

/** FK-join subscription event (stage 1 → stage 2 of [[FkJoinStream]]):
  * `op = +1` subscribe / `op = -1` unsubscribe of a left row (pk,payload)
  * to/from a foreign key. An append-only event log — in production this is
  * a topic, mirroring Kafka Streams' FK-join subscription topic. */
case class FkSub(fk: String, leftKey: String, payload: String, op: Int, seq: Long)

/** FK-join output change: joined row for a left key, or its retraction. */
case class FkJoinChange(leftKey: String, leftPayload: String, rightValue: String,
                        deleted: Boolean, seq: Long)
