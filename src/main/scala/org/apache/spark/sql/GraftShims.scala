package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column↔Expression converters, for graft's
  * custom Catalyst expressions. Lives in the spark.sql package solely to
  * cross the access boundary — the standard pattern for third-party
  * Catalyst extensions that predate a public conversion API. */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Release the RDD blocks backing a `localCheckpoint`ed frame.
    * `Dataset.localCheckpoint` persists an internal RDD wrapped in a
    * `private[sql]` `LogicalRDD`, so iterative algorithms (label
    * propagation rounds) have no public handle to free superseded
    * snapshots — without this, executor storage grows O(rounds). */
  def unpersistLocalCheckpoint(df: Dataset[_]): Unit = df match {
    case d: classic.Dataset[_] =>
      d.queryExecution.analyzed.foreach {
        case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    case _ => ()
  }

  /** The EXECUTED physical plan of a streaming query's last micro-batch
    * — the streaming analog of `df.queryExecution.executedPlan`, for
    * plan guards over streaming twins. `StreamingQueryWrapper` is
    * `private[sql]`, hence this bridge. None before the first batch. */
  def lastMicroBatchPlan(q: org.apache.spark.sql.streaming.StreamingQuery)
      : Option[execution.SparkPlan] = q match {
    case w: execution.streaming.runtime.StreamingQueryWrapper =>
      Option(w.streamingQuery.lastExecution).map(_.executedPlan)
    case _ => None
  }
}
