package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compression ratio of a document's UTF-8 bytes, rounded to 4
  * places — the model-free redundancy signal (a cousin of the
  * RefinedWeb/MassiveText repetition heuristics; public literature):
  * boilerplate and template spam compress far below ~0.4, while natural
  * prose sits noticeably higher, so a threshold on this single number is
  * a cheap first-pass quality gate that needs no token model at all.
  *
  * Why a custom expression: Spark has no compression scalar, and the
  * alternative (a Scala UDF) pays serialization in/out of the row
  * format. Like the other graft expressions it stays inside whole-stage
  * codegen by emitting a static call; the DEFLATE loop itself is
  * per-row work either way. Map-side, zero shuffles.
  *
  * Not oracle-checkable: DuckDB exposes no zlib scalar, so the driver
  * query `t19_compress_ratio` reads out the engine-portable
  * distinct-4-gram statistic instead (same redundancy ordering); this
  * exact zlib ratio stays available as a library scalar, with the
  * behavioral contract (repetition ⇒ low ratio, incompressible ⇒ ~1,
  * determinism) spec-asserted. */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    DeflateRatio.ratioOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.DeflateRatio$$.MODULE$$.ratioOf($c);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {

  /** compressed/raw byte ratio, raw DEFLATE (no zlib header), default
    * level; empty input has no evidence of redundancy → 1.0. Can exceed
    * 1.0 on short/incompressible inputs (DEFLATE framing overhead) —
    * callers threshold on the LOW side, so that tail is harmless. */
  def ratioOf(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) 1.0
    else {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      try {
        d.setInput(raw)
        d.finish()
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        math.round(total.toDouble / raw.length * 10000).toDouble / 10000
      } finally d.end()
    }
  }

  /** Column-level API. */
  def ratio(text: Column): Column =
    GraftShims.column(DeflateRatio(GraftShims.expression(text)))
}
