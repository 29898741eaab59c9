package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro-Winkler similarity (Winkler 1990) — the record-linkage
  * standard for short human-entered strings (names, codes): Jaro match
  * similarity plus a common-prefix boost, because typos cluster at the
  * END of names while the head is usually typed right.
  *
  * Why a custom Catalyst expression: Spark ships `levenshtein` and
  * `soundex` but no Jaro family. The CLASSIC parameterization is
  * implemented — match window floor(max(|a|,|b|)/2)-1, transpositions
  * counted as half the out-of-order matches, prefix boost
  * `jaro + min(4, prefix)·0.1·(1-jaro)` applied only when jaro > 0.7,
  * and 0.0 when either side is empty (including BOTH empty) — because
  * that is exactly what the DuckDB oracle's `jaro_winkler_similarity`
  * computes (probe-verified on the boost-threshold, prefix-cap and
  * empty-string edges; `JaroWinklerSpec` fuzz-pins the port against an
  * independent textbook replay).
  *
  * Similarity is over Unicode code points. Cost is O(|a|·|b|) time in
  * the worst case (the match scan is window-bounded) and O(|a|+|b|)
  * memory — like [[DamerauLevenshtein]] the intended domain is SHORT
  * keys inside blocked candidate sets, never all-pairs corpus scans.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = graft.expressions.JaroWinkler$$.MODULE$$.compute($a, $b);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  private final val PrefixWeight = 0.1
  private final val PrefixCap = 4
  private final val BoostThreshold = 0.7

  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val n = a.length
    val m = b.length
    // DuckDB convention: empty vs anything (including empty vs empty)
    // is 0.0 — there is no "match" evidence either way.
    if (n == 0 || m == 0) return 0.0

    // Jaro: greedy left-to-right matching inside the window.
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val aMatch = new Array[Boolean](n)
    val bMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true
          bMatch(j) = true
          matches += 1
          done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0

    // Transpositions: matched sequences compared in order; each
    // misaligned pair counts HALF (integer halving after the scan).
    var transpositionsX2 = 0
    var j = 0
    i = 0
    while (i < n) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a(i) != b(j)) transpositionsX2 += 1
        j += 1
      }
      i += 1
    }
    val t = transpositionsX2 / 2
    val md = matches.toDouble
    val jaro = (md / n + md / m + (md - t) / md) / 3.0

    // Winkler boost: common-prefix length capped at 4, only past the
    // classic 0.7 threshold (below it the boost is a false signal).
    if (jaro <= BoostThreshold) return jaro
    var prefix = 0
    val maxP = math.min(PrefixCap, math.min(n, m))
    while (prefix < maxP && a(prefix) == b(prefix)) prefix += 1
    jaro + prefix * PrefixWeight * (1.0 - jaro)
  }
}
