package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native per-document char-pair counter vs the composed
  * explode(words) -> explode(substr pairs) -> count formulation it
  * replaced in text_bpe_pair_step — aggregated totals must be equal
  * on every input (the DuckDB twin is pinned to the composed form).
  */
class CharPairCountsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def native(c: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.CharPairCountsExpr(
        org.apache.spark.sql.GraftColumnShim.expression(c)))

  /** The pre-kernel pipeline, verbatim. */
  private def composedCounts(df: org.apache.spark.sql.DataFrame) = {
    val pairs = transform(sequence(lit(1), length(col("w")) - 1), i =>
      struct(col("w").substr(i, lit(1)).as("c1"),
        col("w").substr(i + 1, lit(1)).as("c2")))
    df.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(pairs).as("p"))
      .select(col("p.c1"), col("p.c2"))
      .groupBy("c1", "c2").agg(count(lit(1)).as("n"))
  }

  private def nativeCounts(df: org.apache.spark.sql.DataFrame) =
    df.select(explode(native(col("text"))).as("p"))
      .select(col("p.c1"), col("p.c2"), col("p.n"))
      .groupBy("c1", "c2").agg(sum("n").as("n"))

  private val samples = Seq(
    "",
    " ",
    "   ",
    "a",
    "ab",
    "a b",
    "hello world",
    "aaa aaa aaa",
    "double  space   runs",
    " leading and trailing ",
    "uniçødé 日本語 mixé",
    "emoji 😀😀 pair 𝔘𝔫𝔦", // supplementary-plane code points (surrogate pairs)
    "x", "xy", "xyz",
    ("repeat " * 50).trim,
    "the quick brown fox jumps over the lazy dog")

  test("aggregated totals equal the composed substr-explode pipeline") {
    val df = samples.toDF("text")
    val exp = composedCounts(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = nativeCounts(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === exp)
    assert(exp.nonEmpty) // the fixture really exercises pairs
  }

  test("fuzz: random space/unicode soup agrees with the composed form") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab XY9 çé日😀" // includes space and a surrogate pair
    val cps = alphabet.codePoints().toArray
    val texts = Seq.fill(200) {
      val n = rnd.nextInt(40)
      val sb = new java.lang.StringBuilder
      (0 until n).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      sb.toString
    }
    val df = texts.toDF("text")
    val exp = composedCounts(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = nativeCounts(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === exp)
  }

  test("null text yields a null array (null-propagating, not a crash)") {
    val df = Seq[Option[String]](None, Some("ab")).toDF("text")
    val rows = df.select(native(col("text")).as("a")).collect()
    assert(rows.count(_.isNullAt(0)) === 1)
  }
}
