package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document token statistics — the quality-signal folds
  * (entropy, repetition) as single tight JVM passes, replacing
  * interpreted `aggregate`/`transform` lambdas that dispatched once per
  * token (plus per-token struct allocations in the entropy fold).
  * Tokenization is the corpus-wide standard
  * `filter(split(lower(text), "\s+"), length > 0)` — the same
  * parity-proven machinery as [[TextKernels]].
  *
  * Both are EXACTLY equal to their declarative renderings (asserted in
  * graft.KernelSpec / KernelPropertySpec): the entropy run-length fold
  * sorts tokens in UTF8String BINARY order (what `array_sort` compares
  * under the default collation) and accumulates `Σ c·log2(c)` over run
  * lengths in that same order with `StrictMath.log(x) / StrictMath.log(2)`
  * — exactly Spark's own `log2` codegen. NULL text yields NULL (unary
  * propagation, same as the `bindOnce`-wrapped renderings).
  */
private[functions] abstract class TextStatsExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def nullable: Boolean = true
}

/** `TokenEntropyStats(text) = struct(n_tok, n_types, sclog)` where
  * `sclog = Σ_runs c·log2(c)` over token run lengths in sorted order —
  * the inputs of `entropy = log2(n_tok) - sclog / n_tok`. NULL when the
  * document has no tokens (the rendering filters `size(l) > 0` first;
  * consumers filter `isNotNull`). */
case class TokenEntropyStats(child: Expression) extends TextStatsExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("sclog", DoubleType, nullable = false)))
  override def prettyName: String = "token_entropy_stats"
  override def nullSafeEval(v: Any): Any =
    TextStats.entropyStats(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        |${ev.value} = graft.functions.TextStats.entropyStats($c);
        |${ev.isNull} = ${ev.value} == null;
      """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): TokenEntropyStats =
    copy(child = c)
}

/** `TokenRepetitionStats(text) = struct(n_tok, n_uniq, n_bi, n_uniq_bi)`
  * — token/bigram counts and their exact string-distinct counts, the
  * inputs of the dup-token / dup-bigram ratios. Integer-only (no FP
  * parity surface); never NULL for non-null text (the rendering computes
  * zeros for an empty token list). */
case class TokenRepetitionStats(child: Expression) extends TextStatsExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_uniq", LongType, nullable = false),
    StructField("n_bi", LongType, nullable = false),
    StructField("n_uniq_bi", LongType, nullable = false)))
  override def prettyName: String = "token_repetition_stats"
  override def nullSafeEval(v: Any): Any =
    TextStats.repetitionStats(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.repetitionStats($c)")
  override protected def withNewChildInternal(c: Expression): TokenRepetitionStats =
    copy(child = c)
}

object TextStats {

  private val WS = Pattern.compile("\\s+")

  /** The corpus-standard tokenizer (see [[TextKernels]]), kept as
    * UTF8String so sorting compares what `array_sort` compares. */
  private def utf8Tokens(s: UTF8String): Array[UTF8String] =
    WS.split(s.toLowerCase.toString, -1).iterator
      .filter(_.nonEmpty).map(UTF8String.fromString).toArray

  /** Kernel body (entropy): tokenize, binary-sort, run-length fold. */
  def entropyStats(s: UTF8String): GenericInternalRow = {
    val t = utf8Tokens(s)
    if (t.length == 0) return null
    java.util.Arrays.sort(t, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    var types = 1L
    var run = 1L
    var sclog = 0.0
    var i = 1
    while (i < t.length) {
      if (t(i) == t(i - 1)) run += 1
      else {
        sclog += clog(run)
        types += 1
        run = 1
      }
      i += 1
    }
    sclog += clog(run)
    new GenericInternalRow(Array[Any](t.length.toLong, types, sclog))
  }

  // Spark's log2 codegen is StrictMath.log(x) / StrictMath.log(2)
  // (verified in the Log2 class's generated template — Math.log differed
  // by 1 ulp via platform intrinsics and broke bit parity); run >= 1 so
  // the rendering's c > 0 guard is always taken
  private def clog(c: Long): Double =
    c.toDouble * (java.lang.StrictMath.log(c.toDouble) /
      java.lang.StrictMath.log(2.0))

  /** Kernel body (repetition): one pass + two exact string hash sets. */
  def repetitionStats(s: UTF8String): GenericInternalRow = {
    val t = utf8Tokens(s)
    val uniq = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < t.length) { uniq.add(t(i)); i += 1 }
    val nBi = if (t.length >= 2) t.length - 1 else 0
    val uniqBi = new java.util.HashSet[String]()
    i = 0
    while (i < nBi) {
      uniqBi.add(t(i).toString + " " + t(i + 1).toString)
      i += 1
    }
    new GenericInternalRow(Array[Any](t.length.toLong, uniq.size.toLong,
      nBi.toLong, uniqBi.size.toLong))
  }

  /** Column-API entry points. */
  def tokenEntropyStats(text: Column): Column =
    graftshim.toColumn(TokenEntropyStats(graftshim.toExpression(text)))
  def tokenRepetitionStats(text: Column): Column =
    graftshim.toColumn(TokenRepetitionStats(graftshim.toExpression(text)))
}
