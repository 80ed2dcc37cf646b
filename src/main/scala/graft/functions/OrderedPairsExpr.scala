package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All index-ordered pairs (a_i, a_j), i < j, of a long array — the
  * market-basket pair generator. Fed a SORTED DISTINCT per-group set
  * (sort_array(collect_set(...))), the output is exactly the
  * `a.key < b.key` self-join pair stream of the composed form, emitted
  * from the already-grouped row with no join: the self-join needed two
  * extra full shuffles of the (group, key) relation (hash-cluster each
  * side on the group key) before the pair aggregation; this emits
  * pairs straight out of the grouped sets. Output size is bounded by
  * group-size squared — order size here, never corpus size — the same
  * bound the self-join had.
  */
final case class OrderedPairsExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = OrderedPairsExpr.outType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_ordered_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    OrderedPairsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.OrderedPairsExpr.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): OrderedPairsExpr = copy(child = newChild)
}

object OrderedPairsExpr {

  val outType: DataType = ArrayType(
    StructType(Seq(
      StructField("pa", LongType, nullable = false),
      StructField("pb", LongType, nullable = false))),
    containsNull = false)

  def compute(arr: ArrayData): GenericArrayData = {
    val m = arr.numElements()
    val out = new Array[Any](m * (m - 1) / 2)
    var k = 0
    var i = 0
    while (i < m) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < m) {
        out(k) = new GenericInternalRow(Array[Any](a, arr.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
