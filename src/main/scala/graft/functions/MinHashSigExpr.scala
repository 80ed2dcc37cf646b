package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native k-permutation MinHash signature over an array of shingle-hash
  * longs: element j of the result is
  * `min over h in child of (a(j) * (h mod p) + b(j)) mod p`.
  *
  * Semantically identical to the higher-order formulation
  * `array(array_min(transform(transform(sh, h -> h % p),
  * h -> (a_j*h + b_j) % p)) for j < k)` — the one the DuckDB oracle
  * still runs — but that shape costs k interpreted lambda passes and
  * k+1 intermediate arrays per row (Spark's higher-order functions do
  * not participate in codegen). This is ONE generated loop inside
  * whole-stage codegen: each element is reduced mod p once, then all k
  * running minima update with two multiply-adds each.
  *
  * Inputs are 60-bit md5-derived hashes (non-negative), so `h % p` and
  * `(a*h' + b) % p` never see a negative operand and Java `%` matches
  * DuckDB's `%` exactly; the largest intermediate, max(a)·(p-1)+max(b),
  * must stay below 2^63 — callers guarantee that with p ≈ 1e9 and
  * a ≈ 1e7. An EMPTY input array yields NULL (the per-element
  * formulation yields an array of k nulls there; both encode "no
  * shingles" and neither can produce a band key, but the single-null
  * form never materializes nulls inside an array slot). A null input
  * yields null.
  */
final case class MinHashSigExpr(
    child: Expression, p: Long, a: Seq[Long], b: Seq[Long])
    extends UnaryExpression {

  require(a.nonEmpty && a.length == b.length,
    s"coefficient vectors must be non-empty and equal-length, got ${a.length}/${b.length}")
  // (max a)·(p-1) + max b must not overflow a signed 64-bit multiply-add
  require(a.forall(x => x > 0 && x <= Long.MaxValue / p) && b.forall(_ >= 0),
    s"coefficients must satisfy 0 < a <= ${Long.MaxValue / p} and b >= 0 for overflow-free mod-$p arithmetic")

  private def k: Int = a.length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty input → null signature
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i) % p
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val aRef = ctx.addReferenceObj("minhashA", a.toArray, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", b.toArray, "long[]")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      s"""
         |int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $arr.getLong($i) % ${p}L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($aRef[$j] * $h + $bRef[$j]) % ${p}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
         |}
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}
