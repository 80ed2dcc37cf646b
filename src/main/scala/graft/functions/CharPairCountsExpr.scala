package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document adjacent-character-pair counts for the BPE pair-count
  * step — `explode(words) -> explode(char pairs) -> count` pre-combined
  * inside the scan. The composed form shuffles nothing either (the
  * global agg is alphabet²-sized) but MATERIALIZES every pair
  * occurrence as a two-string struct row: two `substr` UTF8String
  * allocations per character of corpus text, hundreds of millions of
  * rows at sf1, all to be hash-aggregated down to a few hundred groups.
  * This expression scans each document's code points once, counts
  * pairs into a small open map keyed by `(cp1 << 21) | cp2`, and emits
  * one struct per DISTINCT pair per document — the per-document
  * partial aggregate the global sum then combines. Output rows shrink
  * from (total chars) to (distinct pairs per doc, bounded by
  * alphabet²), and the only allocations are one decoded string per
  * document plus one small struct per distinct pair.
  *
  * Semantics pinned to the oracle's
  * `unnest(string_split(text,' ')) -> substr(w,i,1), substr(w,i+1,1)
  * WHERE len(w) >= 2`: words are maximal runs between single-space
  * separators (a run of k spaces produces k-1 empty words, all
  * shorter than 2 — skipped on both sides), pairs never span a space,
  * and characters are Unicode CODE POINTS (surrogate pairs stay
  * whole), matching both engines' character-indexed substr.
  */
final case class CharPairCountsExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = CharPairCountsExpr.outType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_char_pair_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharPairCountsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call — the projection stays inside whole-stage codegen
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharPairCountsExpr.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): CharPairCountsExpr = copy(child = newChild)
}

object CharPairCountsExpr {

  val outType: DataType = ArrayType(
    StructType(Seq(
      StructField("c1", StringType, nullable = false),
      StructField("c2", StringType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  def compute(text: UTF8String): GenericArrayData = {
    // one decoded String per document; code-point iteration below
    // never allocates per character
    val s = text.toString
    val len = s.length
    // counts keyed by (cp1 << 21) | cp2 — code points fit in 21 bits
    val counts = new java.util.HashMap[java.lang.Long, Array[Long]](64)
    var i = 0
    var prev = -1 // previous code point within the current word, -1 at a boundary
    while (i < len) {
      val cp = s.codePointAt(i)
      if (cp == ' ') prev = -1
      else {
        if (prev >= 0) {
          val key = java.lang.Long.valueOf((prev.toLong << 21) | cp.toLong)
          val slot = counts.get(key)
          if (slot == null) counts.put(key, Array(1L)) else slot(0) += 1L
        }
        prev = cp
      }
      i += Character.charCount(cp)
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      val key = e.getKey.longValue()
      val c1 = (key >>> 21).toInt
      val c2 = (key & 0x1fffffL).toInt
      out(k) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(new String(Character.toChars(c1))),
        UTF8String.fromString(new String(Character.toChars(c2))),
        e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(out)
  }
}
