package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass tokenizer: lowercase + split on non-word runs +
  * drop empties — `filter(split(lower(text), "\\W+"), _ <> '')` as ONE
  * byte scan.
  *
  * Why a custom expression: that tokenizer is the innermost loop of the
  * whole text family (wordcount, MinHash shingles, SimHash, quality
  * scoring, language ID) — at 100 TB it runs per document per query. The
  * composable form pays a regex NFA walk over every character plus two
  * materialized intermediate arrays (split output, filter output); this
  * expression emits tokens directly.
  *
  * Exact-equivalence argument (spec-asserted against the HOF form):
  * `\W` is ASCII `[^a-zA-Z0-9_]`, so every token is a maximal run of
  * ASCII word bytes — multi-byte UTF-8 sequences consist entirely of
  * bytes ≥ 0x80, which are separators, and ASCII-lowercasing a word run
  * equals full `lower()` on it. The one theoretical divergence is an
  * exotic uppercase letter that LOWERCASES INTO ASCII (e.g. İ → i +
  * combining dot, K → k): `lower-then-split` would manufacture an ASCII
  * token where this expression sees a separator. The oracle gate
  * (DuckDB computes lower-then-split independently) fails loudly if the
  * corpus ever contains one.
  */
case class AsciiWordTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ascii_word_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    AsciiWordTokens.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.AsciiWordTokens$$.MODULE$$.tokenize($c);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AsciiWordTokens =
    copy(child = newChild)
}

object AsciiWordTokens {

  /** One pass over the UTF-8 bytes: word = ASCII `[a-zA-Z0-9_]`; every
    * other byte (including all bytes of multi-byte code points) is a
    * separator; A–Z lowercased in place while copying the token. */
  def tokenize(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      val c = b(i)
      if (isWord(c)) {
        val start = i
        while (i < n && isWord(b(i))) i += 1
        val tok = new Array[Byte](i - start)
        var j = start
        while (j < i) {
          val x = b(j)
          tok(j - start) = if (x >= 'A' && x <= 'Z') (x + 32).toByte else x
          j += 1
        }
        out.add(UTF8String.fromBytes(tok))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  @inline private def isWord(c: Byte): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Column-level API. */
  def tokens(text: Column): Column =
    GraftShims.column(AsciiWordTokens(GraftShims.expression(text)))
}
