package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The text_rep_ratio per-document statistics — token count, distinct
  * token count, modal-bigram occurrence count — in ONE pass over the
  * token array. All three are pure per-row functions, but the
  * composed form computed the modal bigram RELATIONALLY: explode to a
  * (doc, w1, w2) string-pair stream (tens of millions of rows at
  * sf1), hash-aggregate it twice, and join the result back to the
  * per-doc token stats on doc_id. This expression interns each
  * document's tokens to dense int ids (UTF8String-keyed map — no
  * string copies), counts bigrams in a long-keyed map of the id
  * pairs, and returns the three counters — the explode, both
  * aggregations, and the join disappear from the plan entirely.
  * Per-document memory is O(distinct tokens + distinct bigrams),
  * bounded by document length — the same per-group bound the
  * aggregation path had, minus its shuffle.
  */
final case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = RepetitionStatsExpr.outType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionStatsExpr.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStatsExpr = copy(child = newChild)
}

object RepetitionStatsExpr {

  val outType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_uniq", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false)))

  def compute(arr: ArrayData): GenericInternalRow = {
    val m = arr.numElements()
    // intern tokens to dense ids; map size = distinct tokens
    val ids = new java.util.HashMap[UTF8String, Integer](((m * 4) / 3) + 1)
    val tokIds = new Array[Int](m)
    var next = 0
    var i = 0
    while (i < m) {
      val t = arr.getUTF8String(i)
      val existing = ids.get(t)
      if (existing == null) { ids.put(t, next); tokIds(i) = next; next += 1 }
      else tokIds(i) = existing.intValue()
      i += 1
    }
    // modal bigram over (id1, id2) pairs
    var top = 0L
    if (m >= 2) {
      val bc = new java.util.HashMap[java.lang.Long, Array[Long]](((m * 4) / 3) + 1)
      i = 0
      while (i < m - 1) {
        val key = java.lang.Long.valueOf(
          (tokIds(i).toLong << 32) | (tokIds(i + 1).toLong & 0xffffffffL))
        val slot = bc.get(key)
        val c = if (slot == null) { bc.put(key, Array(1L)); 1L }
                else { slot(0) += 1L; slot(0) }
        if (c > top) top = c
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](m.toLong, next.toLong, top))
  }
}
