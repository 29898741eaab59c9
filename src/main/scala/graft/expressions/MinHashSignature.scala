package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole MinHash signature per document in ONE map-side pass: word-shingle
  * the token array, md5 each shingle, derive the k universal hashes, and
  * keep the k running minima — no shingle explosion, no per-doc
  * `groupBy(min)` shuffle, no md5-hex-string materialization.
  *
  * Replaces the three-stage composable chain (explode shingles → md5 →
  * conv-parse → k arithmetic columns → shuffle to per-doc min aggregate):
  * the signature is pure row-local state, so an aggregation shuffle for
  * it is structurally unnecessary — at 100 TB the eliminated exchange is
  * |shingles| rows wide. The chain survives as
  * [[graft.functions.DedupOps.minhashSignaturesAgg]] for cross-checking.
  *
  * Hash parity with the DuckDB oracle (and the old chain) is exact:
  * v = first 15 hex chars of md5(shingle) parsed base-16 (computed here
  * directly from the digest's leading 7.5 bytes) mod 2^30, then
  * hash_s(v) = (v·(2s+1) + 7919·s + 13) mod 1e9+7.
  */
case class MinHashSignature(child: Expression, numHashes: Int, shingleN: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.MinHashSignature$$.MODULE$$.compute(
         |  $c, $numHashes, $shingleN);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  import graft.functions.DedupOps.{BaseMod, HashMod}

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** v from a digest: 15 hex chars = the leading 7 bytes plus the high
    * nibble of byte 7, parsed base-16 — bit-identical to
    * `conv(substring(hex, 1, 15), 16, 10)`. */
  private def leading60Bits(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  private val Space = Array[Byte](' ')

  def compute(tokens: ArrayData, numHashes: Int, shingleN: Int): ArrayData = {
    require(numHashes > 0, s"numHashes must be positive, got $numHashes")
    val n = tokens.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val digest = md5.get()

    def hashShingle(from: Int, len: Int): Unit = {
      digest.reset()
      // concat_ws skips a null token AND its separator ('a',null,'b' → "a b"),
      // so the separator is written only before a non-null token that follows
      // at least one other non-null token.
      var emitted = 0
      var i = 0
      while (i < len) {
        val tok = tokens.getUTF8String(from + i)
        if (tok != null) {
          if (emitted > 0) digest.update(Space)
          digest.update(tok.getBytes)
          emitted += 1
        }
        i += 1
      }
      val v = (leading60Bits(digest.digest()) % BaseMod + BaseMod) % BaseMod
      var s = 0
      while (s < numHashes) {
        val h = (v * (2L * s + 1) + (7919L * s + 13)) % HashMod
        if (h < mins(s)) mins(s) = h
        s += 1
      }
    }

    if (n >= shingleN) {
      var i = 0
      while (i <= n - shingleN) { hashShingle(i, shingleN); i += 1 }
    } else {
      hashShingle(0, n) // whole-document shingle (n may be 0 → md5 of "")
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Column-level API. */
  def sig(tokens: Column, numHashes: Int, shingleN: Int = 3): Column =
    GraftShims.column(MinHashSignature(GraftShims.expression(tokens), numHashes, shingleN))
}
