package graft

import graft.ops.MergeOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import scala.util.Random

/** Property-style tests: the merge must agree with a direct Scala
  * re-implementation of the reference row-loop semantics
  * (`gule_test_job.py:125-156`) on randomized inputs (seeded, so
  * failures reproduce) — row-count preservation, cell provenance
  * (every cell ∈ {primary, secondary, null}), and the precedence law
  * (primary non-null ⇒ primary wins).
  */
class MergePropertiesSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private case class P(id: Long, v: Option[Double])
  private case class S(id: Long, v: Option[Double], w: Option[String])

  private def genP(r: Random) =
    P(r.nextInt(7).toLong, if (r.nextBoolean()) Some(r.nextInt(9) + 1.0) else None)

  private def genS(r: Random) =
    S(r.nextInt(7).toLong,
      if (r.nextBoolean()) Some(r.nextInt(9) + 1.0) else None,
      if (r.nextBoolean()) Some(Seq("a", "b", "c")(r.nextInt(3))) else None)

  private val pSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))
  private val sSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType),
    StructField("w", StringType)))

  /** The deterministic "first match": min by (v, w) ascending with
    * NULLS LAST — the same ordering MergeOps.firstMatch's window uses
    * (explicit asc_nulls_last, matching the DuckDB oracle's ASC
    * default; Spark's own ASC default would be nulls FIRST).
    */
  private def firstMatch(ss: List[S]): Map[Long, S] =
    ss.groupBy(_.id).map { case (id, rows) =>
      id -> rows.minBy(s => (
        s.v.isEmpty, s.v.getOrElse(0.0),   // None sorts LAST, then value
        s.w.isEmpty, s.w.getOrElse("")))
    }

  private def oracle(ps: List[P], ss: List[S]): Seq[(Long, Option[Double], Option[String])] = {
    val sm = firstMatch(ss)
    ps.map { p =>
      val s = sm.get(p.id)
      (p.id, p.v.orElse(s.flatMap(_.v)), s.flatMap(_.w))
    }
  }

  test("merge equals the reference row-loop semantics on 20 random tables") {
    for (seed <- 1 to 20) {
      val r = new Random(seed)
      val ps = List.fill(8)(genP(r))
      val ss = List.fill(8)(genS(r))
      val pdf = spark.createDataFrame(
        ps.map(p => Row(p.id, p.v.orNull)).asJava, pSchema)
      val sdf = spark.createDataFrame(
        ss.map(s => Row(s.id, s.v.orNull, s.w.orNull)).asJava, sSchema)
      val got = MergeOps.coalesceMerge(pdf, sdf, "id").collect().map { row =>
        (row.getLong(0),
          if (row.isNullAt(1)) None else Some(row.getDouble(1)),
          if (row.isNullAt(2)) None else Some(row.getString(2)))
      }.toSeq
      val want = oracle(ps, ss)
      assert(got.sorted === want.sorted, s"mismatch at seed=$seed\nps=$ps\nss=$ss")
      assert(got.size === ps.size, s"row count not preserved at seed=$seed")
      val sById = ss.groupBy(_.id)
      got.foreach { case (id, v, _) =>
        val fromP = ps.exists(p => p.id == id && p.v == v)
        val fromS = sById.getOrElse(id, Nil).exists(_.v == v)
        assert(v.isEmpty || fromP || fromS,
          s"cell $v not traceable to either side for id $id (seed=$seed)")
      }
      // precedence law: every primary row with a non-null value has an
      // output row carrying exactly that value (primary wins)
      ps.filter(_.v.isDefined).foreach { p =>
        assert(got.exists { case (id, v, _) => id == p.id && v == p.v },
          s"primary-wins law violated for $p (seed=$seed)")
      }
    }
  }
}
