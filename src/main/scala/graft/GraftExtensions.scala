package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.DotProductFloat

/** Catalyst integration point: install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `withExtensions`) to expose graft's custom expressions to SQL —
  * `SELECT dot_product_float(a, b)` — alongside the Column API.
  *
  * This is the sanctioned extension mechanism (no session-state
  * reflection): the injected builder goes through the same
  * FunctionRegistry as built-ins, so the expressions participate in
  * Catalyst folding/codegen exactly like `functions._` ones. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotProductFloatDescriptor)
  }
}

object GraftExtensions {

  val dotProductFloatDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product_float"),
    new ExpressionInfo(classOf[DotProductFloat].getName, "dot_product_float"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"dot_product_float expects 2 arguments, got ${children.length}")
      DotProductFloat(children.head, children(1))
    })

  /** Imperative registration for an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = dotProductFloatDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
