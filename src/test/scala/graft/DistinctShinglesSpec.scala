package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native distinct-string-shingle emitter vs the composed
  * array_distinct(space-joined n-grams) form, and the boilerplate
  * reshape's count(*) over per-doc-distinct shingles vs the
  * count(DISTINCT doc_id) formulation it replaced.
  */
class DistinctShinglesSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def native(c: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.DistinctShinglesExpr(
        org.apache.spark.sql.GraftColumnShim.expression(c), n))

  private def composed(c: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(c) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(c, i + j)): _*))
    when(size(c) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  private val docs = Seq(
    "a b c d e",
    "a b a b a b",          // repeated shingles within one doc
    "x y",                  // shorter than n=3
    "",                     // single empty token
    "uniç 日本 uniç 日本 uniç", // repeated unicode shingle
    "one two three four five six seven")

  test("element sets equal the composed array_distinct form (n=3, n=5)") {
    val df = docs.toDF("text").select(split(col("text"), " ").as("t"))
    Seq(3, 5).foreach { n =>
      val rows = df.select(native(col("t"), n).as("a"),
        composed(col("t"), n).as("b")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n")
      }
    }
  }

  test("count(*) over per-doc-distinct shingles equals count(DISTINCT doc_id)") {
    val df = (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      docs.zipWithIndex.map { case (t, i) => (i.toLong + 100, t) })
      .toDF("doc_id", "text")
    val exp = df
      .select(col("doc_id"),
        explode(composed(split(col("text"), " "), 5)).as("shingle"))
      .groupBy("shingle").agg(countDistinct("doc_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df
      .select(explode(native(split(col("text"), " "), 5)).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exp)
    assert(exp.values.exists(_ > 1)) // the duplicate-doc fixture really counts reach
  }
}
