package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The DISTINCT space-joined word-n-gram strings of a token array, in
  * first-occurrence order — the string twin of [[HashedShingleSetExpr]]
  * for operators whose OUTPUT carries the n-gram text (the boilerplate
  * worklist). Emitting per-document distinct shingles turns the
  * downstream `count(DISTINCT doc_id) GROUP BY shingle` — which Spark
  * plans as an expand plus TWO full exchanges of the (shingle, doc)
  * stream — into a plain map-side-combinable `count(*)` with ONE
  * exchange of partial counts: per-doc uniqueness is guaranteed here,
  * inside the scan, where it costs a hash-set probe instead of a
  * shuffle. Shorter-than-n token arrays yield the empty array.
  */
final case class DistinctShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_distinct_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    DistinctShinglesExpr.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DistinctShinglesExpr.compute($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): DistinctShinglesExpr = copy(child = newChild)
}

object DistinctShinglesExpr {

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var nOut = 0
    val seen = new java.util.HashSet[UTF8String](((m - n + 1) * 4) / 3 + 1)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i <= m - n) {
      // concat via UTF8String.concat: one allocation per shingle, no
      // java.lang.String round trip
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        if (j > 0) parts(2 * j - 1) = space
        parts(2 * j) = arr.getUTF8String(i + j)
        j += 1
      }
      val sh = UTF8String.concat(parts: _*)
      if (sh != null && seen.add(sh)) { out(nOut) = sh; nOut += 1 }
      i += 1
    }
    new GenericArrayData(
      java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], nOut))
  }
}
