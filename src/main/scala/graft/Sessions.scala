package graft

import org.apache.spark.sql.SparkSession

/** Session-level invariants the engine's plans are designed against. */
object Sessions {

  /** Fail fast if adaptive execution (including skew-join splitting) is
    * off. Every registered plan assumes AQE's runtime re-planning —
    * small-side broadcast conversion, partition coalescing, and the
    * skew-join split AqeSkewSpec proves engages — so a config
    * regression here would silently change every plan shape in a
    * Verify/Bench run. Spark 4 defaults both ON; this guards against
    * an explicit override creeping into a builder or spark-defaults.
    */
  def requireAqe(spark: SparkSession): Unit = {
    // no-default get: resolves the EFFECTIVE value (an explicit setting
    // or Spark's registered default) — get(key, "false") would mask the
    // registered default and always read "false" on an unset key
    val adaptive = spark.conf.get("spark.sql.adaptive.enabled")
    val skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    require(adaptive == "true" && skew == "true",
      s"adaptive execution must be on for every registered plan to keep its " +
        s"designed shape; got spark.sql.adaptive.enabled=$adaptive, " +
        s"spark.sql.adaptive.skewJoin.enabled=$skew")
  }
}
