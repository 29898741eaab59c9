package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array in ONE map-side pass: md5 each token,
  * majority-vote the leading 64 digest bits (±1 per token per bit),
  * assemble the signature — no token explosion, no per-doc aggregation
  * shuffle, no hex-string parsing.
  *
  * Same construction as [[SimHash16]] widened to the full production
  * signature width: bit i is bit (7 − i%8) of digest byte i/8 (the first
  * 8 digest bytes, MSB-first per byte), and a set vote (sum > 0)
  * contributes `1L << i` — bit 63 lands on the sign bit, so signatures
  * are compared with unsigned shifts ([[graft.functions.DedupOps
  * .simhashPairsBanded]]) and XOR popcount, never `<`.
  *
  * 64 bits is what makes blocked near-dup detection hold at corpus
  * scale: with the (d+1)-band split, bucket keys carry 64/(d+1) ≥ 16
  * bits of signature, so bucket sizes stay tiny instead of the 2^16
  * total signature space of the 16-bit variant degenerating giant
  * blocks into all-pairs scans.
  *
  * Documents with zero tokens produce no rows in the chain (explode of
  * an empty array); callers filter empty token arrays to match.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.SimHash64$$.MODULE$$.compute($c);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    val digest = md5.get()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      if (tok != null) { // null tokens are ignored (SQL-callable input)
        digest.reset()
        val d = digest.digest(tok.getBytes)
        var i = 0
        while (i < 64) {
          val bit = (d(i / 8) >>> (7 - i % 8)) & 1
          counts(i) += bit * 2 - 1
          i += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** Column-level API. */
  def sig(tokens: Column): Column =
    GraftShims.column(SimHash64(GraftShims.expression(tokens)))
}
