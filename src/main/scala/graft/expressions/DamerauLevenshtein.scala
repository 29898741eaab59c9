package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd UNRESTRICTED Damerau-Levenshtein distance (Lowrance-Wagner):
  * edit distance with insert / delete / substitute / transpose where a
  * transposed pair may be further edited later — unlike the cheaper
  * "optimal string alignment" variant that forbids touching a transposed
  * substring again ("CA"→"ABC" is 2 here — transpose then insert — but 3
  * under OSA).
  *
  * Why a custom Catalyst expression: Spark ships `levenshtein` but no
  * Damerau variant, and the transposition edit is what makes edit
  * distance usable for human-typed identifiers (swapped letters are the
  * dominant typo class). The full variant is implemented — not OSA —
  * because that is what the DuckDB oracle's `damerau_levenshtein`
  * computes (verified by fuzzing the two over random strings), so
  * fuzzy-match results hash-compare exactly.
  *
  * Distances are over Unicode code points (identical to character
  * counting for the ASCII/BMP keys this is meant for). Cost is
  * O(|a|·|b|) time and memory per pair — an edit-distance floor, not an
  * implementation shortcut — so the intended domain is SHORT join keys
  * (names, codes, titles); callers block/bucket candidates first
  * (see the x61 site) rather than ever running it all-pairs.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = graft.expressions.DamerauLevenshtein$$.MODULE$$.compute($a, $b);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  def compute(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n

    // Lowrance-Wagner with the classic INF border (row/col -1) so the
    // transposition lookback H[k-1][l-1] is always in range. Flat
    // (n+2)×(m+2) int matrix — the full matrix is required (the
    // lookback reaches arbitrarily far up-left), two-row rolling
    // storage only works for plain Levenshtein/OSA.
    val w = m + 2
    val inf = n + m
    val h = new Array[Int]((n + 2) * w)
    java.util.Arrays.fill(h, 0, w, inf) // border row
    var i = 0
    while (i <= n) {
      h((i + 1) * w) = inf     // border column
      h((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= m) {
      h(w + j + 1) = j
      j += 1
    }

    // last row index (1-based) where each code point occurred in `a`
    val da = new java.util.HashMap[Int, Int]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = da.getOrDefault(b(j - 1), 0)
        val l = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val sub = h(i * w + j) + cost
        val ins = h((i + 1) * w + j) + 1
        val del = h(i * w + j + 1) + 1
        val trn = h(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trn < best) best = trn
        h((i + 1) * w + j + 1) = best
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    h((n + 1) * w + m + 1)
  }
}
