package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The native one-pass BPE token statistics vs the composed
  * regexp_extract_all + HOF formulation it replaced in
  * text_tokens_bpe — all four counters must be equal on every input
  * (the DuckDB twin is pinned to the regex form).
  */
class BpeTokenStatsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def native(c: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.BpeTokenStatsExpr(
        org.apache.spark.sql.GraftColumnShim.expression(c)))

  private def composed(df: org.apache.spark.sql.DataFrame) = {
    val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
    val toks = regexp_extract_all(col("text"), lit(pat), lit(0))
    df.select(
      col("text"),
      size(toks).cast(LongType).as("n_bpe"),
      size(filter(toks, t => t.rlike("^[A-Za-z]+$"))).cast(LongType).as("n_word"),
      size(filter(toks, t => t.rlike("^[0-9]+$"))).cast(LongType).as("n_num"),
      aggregate(transform(toks, t => length(t).cast(LongType)),
        lit(0L), (acc, x) => acc + x).as("n_chars_tokenized"))
  }

  private def nativeStats(df: org.apache.spark.sql.DataFrame) =
    df.select(col("text"), native(col("text")).as("st"))
      .select(col("text"), col("st.n_bpe"), col("st.n_word"),
        col("st.n_num"), col("st.n_chars_tokenized"))

  private val samples = Seq(
    "",
    " ",
    "hello world",
    "abc123def",
    "12 34x! ?",
    "a1b2c3",
    "punct!!! ... ,,, ;;;",
    "tabs\tand\nnewlines are single tokens",
    "uniçødé 日本語 mixé2000",
    "emoji 😀 and 𝔘 supplementary",
    "UPPER lower MiXeD 007",
    "---===+++",
    "ends with digit 42",
    "42 starts with digit")

  test("all four counters equal the composed regex pipeline") {
    val df = samples.toDF("text")
    val exp = composed(df).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val got = nativeStats(df).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === exp)
  }

  test("fuzz: random ascii/unicode soup agrees with the composed form") {
    val rnd = new scala.util.Random(11)
    val alphabet = "aB9 .!ç日😀\t\n"
    val cps = alphabet.codePoints().toArray
    val texts = Seq.fill(300) {
      val sb = new java.lang.StringBuilder
      (0 until rnd.nextInt(60)).foreach(_ =>
        sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      sb.toString
    }.distinct
    val df = texts.toDF("text")
    val exp = composed(df).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val got = nativeStats(df).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === exp)
  }
}
