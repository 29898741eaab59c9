package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd intersection SIZE of two ASCENDING-SORTED string arrays,
  * with a sound early exit against a required minimum.
  *
  * Why a custom Catalyst expression: the similarity-join verify stage
  * evaluates |A ∩ B| for every candidate pair, and Spark's
  * `array_intersect` builds a per-evaluation hash set of one side —
  * allocation plus string hashing per pair. Over pre-sorted arrays the
  * same count is one allocation-free merge scan (binary UTF8 order, the
  * exact comparator `sort_array` sorts by), and the scan can STOP the
  * moment the running count plus the shorter remaining suffix cannot
  * reach `required` — the candidate pairs a prefix filter could not
  * kill die here after a few comparisons instead of a full pass.
  *
  * Contract: when the true intersection reaches `required`, the EXACT
  * size is returned; when it cannot, some value strictly below
  * `required` is returned (the bail-out bound — callers threshold on
  * the result, and any value below `required` fails every downstream
  * similarity test that `required` was derived from). `required <= 0`
  * disables the early exit and always returns the exact size. Inputs
  * MUST be sorted ascending (sort_array default) — unsorted input gives
  * an undercount; the verify spec cross-checks against
  * `array_intersect` on sorted fixtures. */
case class SortedIntersectCount(first: Expression, second: Expression,
                                third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    val okArr = Seq(first, second).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    val okReq = third.dataType == IntegerType || third.dataType == LongType
    if (okArr && okReq) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, array<string>, int), got " +
        s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
        s"${third.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any, req: Any): Any = {
    val r = req match {
      case i: Int => i.toLong
      case l: Long => l
    }
    SortedIntersectCount.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, r) => {
      s"""
         |${ev.value} = graft.expressions.SortedIntersectCount$$.MODULE$$.compute($a, $b, (long) $r);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SortedIntersectCount =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SortedIntersectCount {

  /** Merge scan over two ascending UTF8 arrays. Duplicate-safe for the
    * distinct-set inputs the verify stage produces (each common value
    * counted once per aligned step). NULL elements never intersect
    * (SQL: null ≠ null) and are skipped — the function is SQL-exposed
    * as `sorted_intersect_count`, so user arrays may carry nulls even
    * though the verify pipelines never produce them; `sort_array`
    * places nulls first, so the skip costs nothing on sorted input and
    * stays correct (an undercount is already the bail-out contract)
    * anywhere else. */
  def compute(a: ArrayData, b: ArrayData, required: Long): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var count = 0
    while (i < na && j < nb) {
      if (required > 0) {
        val remaining = math.min(na - i, nb - j)
        if (count + remaining < required) return count
      }
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      if (x == null) i += 1
      else if (y == null) j += 1
      else {
        val c = x.compareTo(y)
        if (c == 0) { count += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    count
  }
}
