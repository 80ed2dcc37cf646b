package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The grouped-set pair generator (sort_array(collect_set) +
  * OrderedPairsExpr) vs the `a.key < b.key` self-join formulation it
  * replaced in q_basket_lift — aggregated pair counts must be equal
  * on every input (the DuckDB twin is pinned to the self-join form).
  */
class OrderedPairsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def pairsCol(c: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.OrderedPairsExpr(
        org.apache.spark.sql.GraftColumnShim.expression(c)))

  test("pair counts equal the distinct self-join formulation") {
    val rnd = new scala.util.Random(7)
    // groups with duplicates, singletons, empties-by-absence, skew
    val rows = (1L to 400L).flatMap { g =>
      val size = rnd.nextInt(8)
      (0 until size).map(_ => (g, rnd.nextInt(20).toLong))
    } ++ Seq((1000L, 5L), (1000L, 5L), (1000L, 5L)) // all-duplicate group
    val df = rows.toDF("g", "k")

    val lines = df.select(col("g"), col("k")).distinct()
    val exp = lines.select(col("g"), col("k").as("pa"))
      .join(lines.select(col("g"), col("k").as("pb")), "g")
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val got = df.groupBy("g")
      .agg(sort_array(collect_set(col("k"))).as("parts"))
      .select(explode(pairsCol(col("parts"))).as("p"))
      .groupBy("p.pa", "p.pb").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    assert(got === exp)
    assert(exp.nonEmpty)
  }

  test("empty and single-element sets produce no pairs") {
    val df = Seq((1L, Seq.empty[Long]), (2L, Seq(9L))).toDF("g", "parts")
    assert(df.select(explode(pairsCol(col("parts")))).count() === 0)
  }
}
