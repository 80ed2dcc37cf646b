package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating function (UDTF tier of the custom-extension
  * ladder, alongside the scalar Expressions and the TopKAgg
  * Aggregator): emits one (pos, shingle) row per word n-gram of a
  * token array — the row-generating form of [[graft.ops.DedupOps]]'s
  * `shingles3` transform+explode, for `spark.sql` / LATERAL VIEW users:
  *
  * {{{
  * SELECT doc_id, s.pos, s.shingle
  * FROM docs LATERAL VIEW graft_shingles(split(text, ' '), 3) s AS pos, shingle
  * }}}
  *
  * Unlike the array-building transform, the generator streams rows
  * without materializing the shingle array per document — the shape
  * that matters when n-gram fan-out is large. Positions are 0-based
  * and shingles are space-joined, NOT deduplicated (compose with
  * DISTINCT when set semantics are wanted; `shingles3` dedups because
  * its consumers are set-similarity joins).
  *
  * Evaluation is interpreted ([[CodegenFallback]]): Spark's Generate
  * operator drives generators through `eval`, and the per-row work
  * here is string concatenation the JIT handles well.
  */
case class ShingleGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects ARRAY<STRING>, got ${other.sql}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) return Iterator.empty
    val arr = data.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return Iterator.empty
    (0 to m - n).iterator.map { i =>
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        // a null token renders as the empty string — a DOCUMENTED
        // divergence from the concat-based shingles3 (where one null
        // token null-propagates and voids the whole shingle): a
        // generator row must exist for every position, and split()
        // inputs never contain nulls anyway
        val t = arr.getUTF8String(i + j)
        if (t != null) sb.append(t.toString)
        j += 1
      }
      InternalRow(i.toLong, UTF8String.fromString(sb.toString))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}
