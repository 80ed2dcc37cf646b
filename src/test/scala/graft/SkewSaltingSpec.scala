package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting for skewed joins, proven equivalent to the plain join: the
  * fact side's hot key is split across S sub-keys by a DETERMINISTIC
  * salt (hash of the row id — reproducible, unlike rand()), and the
  * dimension side is replicated S times so every salted sub-key finds
  * its match. Same rows out, but the hot key's work is spread over S
  * tasks instead of one straggler.
  */
class SkewSaltingSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val S = 8

  test("salted join == plain join on a skewed key") {
    val dir = "/root/testdata/sf0.001"
    // fact: events keyed by event_type — 5 hot keys, heavy skew by design
    val fact = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    // dim: one row per event_type
    val dim = fact.select(col("event_type").as("d_type")).distinct()
      .withColumn("type_tag", concat(lit("tag-"), col("d_type")))

    val plain = fact.join(dim, col("event_type") === col("d_type"))
      .select(col("event_id"), col("type_tag"))

    val saltedFact = fact.withColumn("salt", pmod(hash(col("event_id")), lit(S)))
    val saltedDim = dim.withColumn("salt",
      explode(array((0 until S).map(lit(_)): _*)))
    val salted = saltedFact.join(saltedDim,
      col("event_type") === col("d_type") && saltedFact("salt") === saltedDim("salt"))
      .select(col("event_id"), col("type_tag"))

    // the join key space is now (type x salt): S times the distinct
    // keys, so the hot key's rows spread over S partitions
    val got = salted.collect().map(_.toString).sorted
    val want = plain.collect().map(_.toString).sorted
    assert(got.nonEmpty)
    assert(got === want)
  }
}
