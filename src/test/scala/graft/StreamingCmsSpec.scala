package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.CmsCell
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming count-min grid must converge to exactly the counts a
  * batch pass produces: after all triggers, the final snapshot per cell
  * equals a plain-Scala reference count, and probing the grid for the
  * stopword list reproduces the oracle-checked batch q_sketch_cms
  * estimates.
  */
class StreamingCmsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  test("streaming CMS grid converges to the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    val tokens = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .as[String].collect().toSeq

    val ms = MemoryStream[String]
    val q = StatefulOps.cmsMonitor(ms.toDS())
      .writeStream.format("memory").queryName("cms_monitor")
      .outputMode("append").start()
    try {
      tokens.grouped(tokens.size / 2 + 1).foreach { chunk =>
        ms.addData(chunk)
        q.processAllAvailable()
      }
      val snaps = spark.table("cms_monitor").as[CmsCell].collect()
      // final snapshot per cell = its max running count
      val grid = snaps.groupBy(c => (c.j, c.bucket))
        .map { case (k, cs) => k -> cs.map(_.n).max }

      // plain-Scala reference grid, independent of Spark execution
      val ref = tokens
        .flatMap(t => (0 until 3).map(j => (j, StatefulOps.cmsBucket(t, j, 1024))))
        .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      assert(grid === ref, "streaming grid diverges from reference counts")
      assert(grid.size <= 3 * 1024, "state exceeded the fixed grid bound")

      // probing the final grid reproduces the batch q_sketch_cms ests
      val batch = SparkEntry.queries("q_sketch_cms")(spark, dir)
        .select("token", "est").collect()
        .map(r => r.getAs[String]("token") -> r.getAs[Long]("est")).toMap
      spark.catalog.clearCache()
      ops.TextOps.stopwords.foreach { w =>
        val est = (0 until 3)
          .map(j => grid.getOrElse((j, StatefulOps.cmsBucket(w, j, 1024)), 0L)).min
        assert(est === batch(w), s"stream probe for '$w' diverges from batch est")
      }
    } finally q.stop()
  }
}
