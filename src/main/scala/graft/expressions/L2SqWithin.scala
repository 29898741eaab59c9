package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Codegen'd ε-ball test over quantized integer vectors: TRUE iff
  * Σ(aᵢ−bᵢ)² ≤ eps2 — the inner kernel of the exact DBSCAN
  * neighborhood scan (s16). A custom expression for the same reason as
  * [[DotProductFloat]]: the `zip_with`+`aggregate` HOF form allocates
  * an intermediate array per PAIR and folds it interpreted, which is
  * the difference between an all-pairs scan being minutes and seconds.
  * The primitive loop also EARLY-EXITS the moment the running sum
  * crosses eps2 — in high dimensions a non-neighbor reveals itself in
  * a handful of coordinates, so most pairs never read their full
  * vectors. Exactness is unaffected: the sum is monotone in the
  * dimension index, so the verdict equals the full sum's.
  *
  * Inputs are LongType arrays (milli-unit quantized, the s19
  * discipline); mismatched lengths or null elements make the pair a
  * non-neighbor (FALSE) rather than an error — the conservative verdict
  * for a malformed vector. */
case class L2SqWithin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "l2sq_within"

  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArray(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (isLongArray(first.dataType) && isLongArray(second.dataType) &&
      third.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>, bigint), got " +
        s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
        third.dataType.catalogString)
  }

  override def nullSafeEval(a: Any, b: Any, e: Any): Any =
    L2SqWithin.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      e.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, e) => {
      s"""
         |${ev.value} = graft.expressions.L2SqWithin$$.MODULE$$.compute($a, $b, (long) $e);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): L2SqWithin =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object L2SqWithin {

  def compute(a: ArrayData, b: ArrayData, eps2: Long): Boolean = {
    val n = a.numElements()
    if (n != b.numElements()) return false
    var sum = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return false
      val d = a.getLong(i) - b.getLong(i)
      sum += d * d
      if (sum > eps2) return false
      i += 1
    }
    true
  }
}
