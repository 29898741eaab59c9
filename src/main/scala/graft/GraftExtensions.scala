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

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {

  type Descriptor = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val dotProductFloatDescriptor: Descriptor = (
    FunctionIdentifier("dot_product_float"),
    new ExpressionInfo(classOf[DotProductFloat].getName, "dot_product_float"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"dot_product_float expects 2 arguments, got ${children.length}")
      DotProductFloat(children.head, children(1))
    })

  /** SQL twins of the curation helpers, built from raw Catalyst nodes —
    * a registry builder must return a resolvable Expression tree, and
    * Spark 4 Columns are lazy ColumnNodes whose unresolved functions do
    * not re-enter analysis from inside a registered function. The
    * HOF-based scorers (lang-id, quality) stay Column-API-only for that
    * reason. Equivalence with the Column forms is spec-asserted. */
  private object SqlExprs {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{BinaryType, LongType}

    /** md5(normalized text) — mirror of `TextAnalysis.fingerprint`. */
    def fingerprint(text: Expression): Expression =
      Md5(Cast(RegExpReplace(
        new StringTrim(Lower(text)), Literal("\\s+"), Literal(" ")), BinaryType))

    /** pmod(60-bit md5 prefix of key's string form, buckets) — mirror of
      * `Sampling.hashBucket` with a column/expression bucket count. */
    def hashBucket(key: Expression, buckets: Expression): Expression =
      Pmod(
        Cast(Conv(Substring(
          Md5(Cast(Cast(key, org.apache.spark.sql.types.StringType), BinaryType)),
          Literal(1), Literal(15)), Literal(16), Literal(10)), LongType),
        Cast(buckets, LongType))

    /** Rendezvous shard — mirror of `Sharding.hrwShard` (argmax over n
      * md5 candidate weights as an array-of-structs max). */
    def hrwShard(key: Expression, n: Int): Expression = {
      require(n >= 1 && n <= 256, s"hrw_shard: shard count out of range: $n")
      val candidates = (0 until n).map { i =>
        CreateNamedStruct(Seq(
          Literal("h"),
          Md5(Cast(Concat(Seq(
            Cast(key, org.apache.spark.sql.types.StringType),
            Literal(s":$i"))), BinaryType)),
          Literal("s"), Literal(i.toLong)))
      }
      val top = ArrayMax(CreateArray(candidates))
      GetStructField(top, 1, Some("s"))
    }
  }

  private def exprFn(name: String, arity: Int)
                    (f: Seq[Expression] => Expression): Descriptor = (
    FunctionIdentifier(name),
    new ExpressionInfo("graft.GraftExtensions", name),
    (children: Seq[Expression]) => {
      require(children.length == arity, s"$name expects $arity arguments, got ${children.length}")
      f(children)
    })

  val descriptors: Seq[Descriptor] = Seq(
    dotProductFloatDescriptor,
    exprFn("graft_fingerprint", 1)(cs => SqlExprs.fingerprint(cs.head)),
    exprFn("graft_hash_bucket", 2)(cs => SqlExprs.hashBucket(cs.head, cs(1))),
    exprFn("ascii_word_tokens", 1)(cs => graft.expressions.AsciiWordTokens(cs.head)),
    exprFn("graft_simhash16", 1)(cs => graft.expressions.SimHash16(cs.head)),
    exprFn("graft_simhash64", 1)(cs => graft.expressions.SimHash64(cs.head)),
    exprFn("graft_minhash", 2)(cs => {
      val k = cs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) if v > 0 => v
        case other => throw new IllegalArgumentException(
          s"graft_minhash(tokens, k): k must be a positive integer literal, got $other")
      }
      graft.expressions.MinHashSignature(cs.head, k, 3)
    }),
    exprFn("graft_deflate_ratio", 1)(cs =>
      graft.expressions.DeflateRatio(cs.head)),
    exprFn("damerau_levenshtein", 2)(cs =>
      graft.expressions.DamerauLevenshtein(cs.head, cs(1))),
    exprFn("jaro_winkler", 2)(cs =>
      graft.expressions.JaroWinkler(cs.head, cs(1))),
    exprFn("l2sq_within", 3)(cs =>
      graft.expressions.L2SqWithin(cs.head, cs(1), cs(2))),
    exprFn("sorted_intersect_count", 3)(cs =>
      graft.expressions.SortedIntersectCount(cs.head, cs(1), cs(2))),
    exprFn("hrw_shard", 2)(cs => {
      val n = cs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) if v > 0 => v
        case other => throw new IllegalArgumentException(
          s"hrw_shard(key, n): n must be a positive integer literal, got $other")
      }
      SqlExprs.hrwShard(cs.head, n)
    }))

  /** Imperative registration for an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
