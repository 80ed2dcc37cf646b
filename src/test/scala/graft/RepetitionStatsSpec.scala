package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The native per-document repetition statistics vs the composed
  * explode -> bigram agg -> max -> join formulation they replaced in
  * text_rep_ratio — all three counters must be equal on every input
  * (the DuckDB twin is pinned to the relational form).
  */
class RepetitionStatsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def native(c: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.RepetitionStatsExpr(
        org.apache.spark.sql.GraftColumnShim.expression(c)))

  /** The pre-kernel relational pipeline, verbatim (bigram via slices). */
  private def composed(df: org.apache.spark.sql.DataFrame) = {
    val t = df.select(col("doc_id"), split(col("text"), " ").as("tokens"))
      .filter(size(col("tokens")) >= 2)
    val pairs = transform(slice(col("tokens"), lit(1), size(col("tokens")) - 1),
      (w, i) => struct(w.as("w1"),
        element_at(col("tokens"), i + 2).as("w2")))
    val top = t.select(col("doc_id"), explode(pairs).as("p"))
      .groupBy(col("doc_id"), col("p.w1"), col("p.w2"))
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_cnt"))
    t.select(col("doc_id"),
      size(col("tokens")).cast(LongType).as("n_tokens"),
      size(array_distinct(col("tokens"))).cast(LongType).as("n_uniq"))
      .join(top, "doc_id")
  }

  private def nativeStats(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), native(split(col("text"), " ")).as("st"))
      .filter(col("st.n_tokens") >= 2)
      .select(col("doc_id"), col("st.n_tokens").as("n_tokens"),
        col("st.n_uniq").as("n_uniq"), col("st.top_cnt").as("top_cnt"))

  private val samples = Seq(
    1L -> "a b",
    2L -> "a a a a",                // overlapping modal bigram (a,a) x3
    3L -> "the cat sat on the cat", // repeated non-adjacent bigram
    4L -> "x y x y x y z",
    5L -> "all distinct tokens here now",
    6L -> "solo",                   // filtered out (n_tokens < 2)
    7L -> "",                       // single empty token, filtered out
    8L -> "uniç uniç 日本 日本 uniç")

  test("counters equal the relational bigram pipeline") {
    val df = samples.toDF("doc_id", "text")
    val exp = composed(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val got = nativeStats(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === exp)
    assert(!got.contains(6L) && !got.contains(7L))
  }

  test("fuzz: random small-vocab docs agree with the relational form") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("a", "b", "c", "dd", "e")
    val docs = (1L to 300L).map(i =>
      i -> Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val df = docs.toDF("doc_id", "text")
    val exp = composed(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val got = nativeStats(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === exp)
  }
}
