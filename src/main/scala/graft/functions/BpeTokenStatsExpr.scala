package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The text_tokens_bpe statistics — token count, word-token count,
  * digit-token count, tokenized character total — of the pre-tokenizer
  * pattern `[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]` in ONE code-point pass.
  * The composed form ran `regexp_extract_all` and three interpreted
  * higher-order lambdas (filter x2, transform+aggregate) per row,
  * materializing the full token array four expressions deep and
  * evicting the projection from whole-stage codegen. The pattern's
  * alternatives are disjoint single-class runs, so leftmost-longest
  * matching degenerates to a linear scan: maximal ASCII-letter runs,
  * maximal ASCII-digit runs, and every other non-space code point as a
  * single one-character token (both engines' regexes are code-point
  * indexed, as is this scan — a supplementary-plane character is ONE
  * token of length 1). Counts only — no token strings allocated.
  */
final case class BpeTokenStatsExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BpeTokenStatsExpr.outType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_token_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeTokenStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeTokenStatsExpr.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): BpeTokenStatsExpr = copy(child = newChild)
}

object BpeTokenStatsExpr {

  val outType: DataType = StructType(Seq(
    StructField("n_bpe", LongType, nullable = false),
    StructField("n_word", LongType, nullable = false),
    StructField("n_num", LongType, nullable = false),
    StructField("n_chars_tokenized", LongType, nullable = false)))

  private def isLetter(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
  private def isDigit(cp: Int): Boolean = cp >= '0' && cp <= '9'

  def compute(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    val len = s.length
    var nBpe = 0L
    var nWord = 0L
    var nNum = 0L
    var nChars = 0L
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      if (isLetter(cp)) {
        var run = 0L
        while (i < len && isLetter(s.charAt(i))) { run += 1; i += 1 }
        nBpe += 1; nWord += 1; nChars += run
      } else if (isDigit(cp)) {
        var run = 0L
        while (i < len && { val c = s.charAt(i); c >= '0' && c <= '9' }) {
          run += 1; i += 1
        }
        nBpe += 1; nNum += 1; nChars += run
      } else {
        if (cp != ' ') { nBpe += 1; nChars += 1 }
        i += Character.charCount(cp)
      }
    }
    new GenericInternalRow(Array[Any](nBpe, nWord, nNum, nChars))
  }
}
