package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{LangTok, MixSnapshot}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming mixture monitor must converge to the batch
  * q_mix_weights aggregation: after all triggers, the LAST snapshot per
  * language carries exactly the batch (n_docs, n_tokens), and interim
  * snapshots are monotone prefixes of it.
  */
class StreamingMixtureSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  test("mixture monitor snapshots converge to the batch mixture") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = Tables.load(spark, dir, "documents")
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .as[LangTok].collect().toSeq

    val ms = MemoryStream[LangTok]
    val q = StatefulOps.mixtureMonitor(ms.toDS())
      .writeStream.format("memory").queryName("mix_monitor")
      .outputMode("append").start()
    try {
      input.grouped(150).foreach { chunk =>
        ms.addData(chunk)
        q.processAllAvailable()
      }
      val snaps = spark.table("mix_monitor").as[MixSnapshot].collect()

      // final snapshot per lang = the row with that lang's max totals
      val finalByLang = snaps.groupBy(_.lang).map { case (l, ss) =>
        l -> ss.maxBy(_.n_tokens)
      }
      val want = SparkEntry.queries("q_mix_weights")(spark, dir)
        .select("lang", "n_docs", "n_tokens").collect()
        .map(r => r.getAs[String]("lang") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
      spark.catalog.clearCache()
      assert(finalByLang.keySet === want.keySet)
      finalByLang.foreach { case (l, s) =>
        assert((s.n_docs, s.n_tokens) === want(l),
          s"final $l snapshot diverges from batch mixture")
      }
      // interim snapshots are monotone: totals only grow per language
      snaps.groupBy(_.lang).foreach { case (l, ss) =>
        val byDocs = ss.sortBy(_.n_docs).map(_.n_tokens)
        assert(byDocs.zip(byDocs.tail).forall { case (a, b) => a <= b },
          s"$l snapshots are not monotone")
      }
    } finally q.stop()
  }
}
