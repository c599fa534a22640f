package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass quality verdict for the document-quality filter hot path.
  *
  * The column form ([[graft.ops.TextStats.qualityFlags]]) builds the
  * verdict CASE from six rule expressions that each re-derive their metric
  * from scratch — after predicate pushdown inlines the CASE into a Filter
  * condition, the full tokenize pipeline (regexp_replace → trim → lower →
  * split) appears ~6× per row in the plan (flagged by the
  * PlanInvariantsSpec recompute-guard audit when the corpus-prep
  * composition query filtered on `keep`). This expression evaluates the
  * rules in declaration order with each metric computed once, stopping at
  * the first violation; generated code is a single static call.
  *
  * Value parity with the column form is exact (QualityExpressionsSpec):
  * normalization is `lower(trim(regexp_replace(text, "\\s+", " ")))` with
  * Spark semantics — space-only trim (UTF8String.trim, NOT Java's
  * <= 0x20 trim), UTF8String lowercasing, code-point character counts —
  * and ratio comparisons are the same unguarded IEEE divisions (0/0 → NaN
  * compares false, exactly like the CASE branches). Rule evaluation order
  * matters for the SHORT-CIRCUIT only: an empty text fails
  * `too_few_tokens` before any ratio is consulted, as in the CASE.
  */
object QualityExpressions {

  private val Ws = Pattern.compile("\\s+")
  private val Punct = Pattern.compile("[.,;:!?'\"()]")

  private val TooFewTokens = UTF8String.fromString("too_few_tokens")
  private val TooManyTokens = UTF8String.fromString("too_many_tokens")
  private val MeanTooShort = UTF8String.fromString("mean_token_too_short")
  private val MeanTooLong = UTF8String.fromString("mean_token_too_long")
  private val TooMuchPunct = UTF8String.fromString("too_much_punct")
  private val TooFewStopwords = UTF8String.fromString("too_few_stopwords")

  private def countMatches(p: Pattern, s: String): Int = {
    val m = p.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** First violated rule name, or null when the document is kept. */
  def computeFail(text: UTF8String, stopPattern: Pattern,
                  minTokens: Int, maxTokens: Int,
                  minMeanTokenLen: Double, maxMeanTokenLen: Double,
                  maxPunctRatio: Double, minStopwordRatio: Double): UTF8String = {
    val raw = text.toString
    // normalizeText: regexp_replace collapses \s+ runs to single spaces,
    // UTF8String.trim strips edge SPACES only, UTF8String.toLowerCase is
    // Spark's Lower (UTF8_BINARY)
    val norm = UTF8String.fromString(Ws.matcher(raw).replaceAll(" "))
      .trim().toLowerCase.toString

    // split(norm, " ", -1): norm is space-collapsed, so tokens = spaces + 1
    // ("" stays one empty token, like Spark's split)
    var spaces = 0
    var i = 0
    while (i < norm.length) {
      if (norm.charAt(i) == ' ') spaces += 1
      i += 1
    }
    val nTokens = spaces + 1
    if (nTokens < minTokens) return TooFewTokens
    if (nTokens > maxTokens) return TooManyTokens

    // mean token length: non-space code points of norm / token count
    val normChars = norm.codePointCount(0, norm.length) - spaces
    val meanTok = normChars.toDouble / nTokens
    if (meanTok < minMeanTokenLen) return MeanTooShort
    if (meanTok > maxMeanTokenLen) return MeanTooLong

    // punctuation ratio over the RAW text (code-point length, like length())
    val punct = countMatches(Punct, raw).toDouble /
      raw.codePointCount(0, raw.length)
    if (punct > maxPunctRatio) return TooMuchPunct

    // stopword ratio: whole-word matches over lower(raw)
    val stop = countMatches(stopPattern, text.toLowerCase.toString).toDouble /
      nTokens
    if (stop < minStopwordRatio) return TooFewStopwords
    null
  }

  /** `quality_fail(text)` — null (kept) or the first violated rule name.
    * `stopwordsRegex` must be the same whole-word alternation
    * [[graft.ops.TextStats.stopwordCount]] builds.
    */
  case class QualityFail(child: Expression,
                         minTokens: Int, maxTokens: Int,
                         minMeanTokenLen: Double, maxMeanTokenLen: Double,
                         maxPunctRatio: Double, minStopwordRatio: Double,
                         stopwordsRegex: String) extends UnaryExpression {

    @transient private lazy val stopPattern = Pattern.compile(stopwordsRegex)

    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quality_fail requires string input, got $other")
    }

    override def nullSafeEval(v: Any): Any =
      computeFail(v.asInstanceOf[UTF8String], stopPattern, minTokens,
        maxTokens, minMeanTokenLen, maxMeanTokenLen, maxPunctRatio,
        minStopwordRatio)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val pat = ctx.addReferenceObj("stopPattern", stopPattern,
          classOf[Pattern].getName)
        // the verdict itself is nullable (null = kept): propagate it
        s"""${ev.value} = graft.functions.QualityExpressions.computeFail(
           |  $c, $pat, $minTokens, $maxTokens, $minMeanTokenLen,
           |  $maxMeanTokenLen, $maxPunctRatio, $minStopwordRatio);
           |${ev.isNull} = (${ev.value} == null);""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "quality_fail"
  }

  def quality_fail(text: Column, minTokens: Int, maxTokens: Int,
                   minMeanTokenLen: Double, maxMeanTokenLen: Double,
                   maxPunctRatio: Double, minStopwordRatio: Double,
                   stopwordsRegex: String): Column =
    bridge.column(QualityFail(bridge.expression(text), minTokens, maxTokens,
      minMeanTokenLen, maxMeanTokenLen, maxPunctRatio, minStopwordRatio,
      stopwordsRegex))
}
