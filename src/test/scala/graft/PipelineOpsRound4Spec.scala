package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-4 operators (chunking, BPE pair
  * counting, CV folds, Markov transitions, decay weighting, stickiness,
  * embedding dimension stats, cosine histogram) — contracts the oracle's
  * value-equality gate does not itself state.
  */
class PipelineOpsRound4Spec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = {
    val rows = SparkEntry.queries(name)(spark, dir).collect()
    spark.catalog.clearCache()
    rows
  }

  test("text_chunk_overlap: chunks tile every document exactly") {
    val rows = run("text_chunk_overlap")
    assert(rows.nonEmpty)
    val W = ops.TextOps.ChunkWin.toLong
    val S = ops.TextOps.ChunkStride.toLong
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("chunk_id"))
      val n = sorted.head.getAs[Long]("n_tokens")
      // ids consecutive from 0, starts on the stride grid
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_id") === i.toLong, s"doc $doc: gap in chunk ids")
        assert(r.getAs[Long]("chunk_start") === i * S)
        val len = r.getAs[Long]("chunk_len")
        assert(len > 0 && len <= W, s"doc $doc chunk $i: bad length $len")
      }
      // the final chunk ends exactly at the document's last token
      val last = sorted.last
      assert(last.getAs[Long]("chunk_start") + last.getAs[Long]("chunk_len") === n,
        s"doc $doc: chunks do not cover the tail")
      // a doc at most one window long must be exactly one chunk
      if (n <= W) assert(sorted.length === 1)
    }
  }

  test("text_bpe_pair_step: ranked top-20 agrees with a driver-side recount") {
    val rows = run("text_bpe_pair_step")
    assert(rows.length <= 20 && rows.nonEmpty)
    val byRank = rows.sortBy(_.getAs[Long]("rk"))
    assert(byRank.map(_.getAs[Long]("rk")).toSeq === (1L to rows.length).toSeq)
    assert(byRank.map(_.getAs[Long]("n")).toSeq.reverse.sorted.reverse ===
      byRank.map(_.getAs[Long]("n")).toSeq, "counts not non-increasing by rank")
    // brute-force recount of the modal pair on the driver
    val texts = Tables.load(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach(_.split(" ").foreach { w =>
      (0 until w.length - 1).foreach { i =>
        val k = (w.substring(i, i + 1), w.substring(i + 1, i + 2))
        counts(k) = counts.getOrElse(k, 0L) + 1
      }
    })
    val top = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head
    val got = byRank.head
    assert((got.getAs[String]("c1"), got.getAs[String]("c2")) === top._1)
    assert(got.getAs[Long]("n") === top._2)
  }

  test("q_cv_folds: folds partition the corpus and shares sum to 1 per language") {
    val rows = run("q_cv_folds")
    assert(rows.map(_.getAs[Long]("fold")).forall(f => f >= 0 && f < ops.TextOps.CvFolds))
    val corpus = Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === corpus)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val share = rs.map(_.getAs[Double]("fold_share")).sum
      assert(math.abs(share - 1.0) < 1e-9, s"$lang fold shares sum to $share")
    }
  }

  test("q_events_markov: probabilities are per-source distributions over all transitions") {
    val rows = run("q_events_markov")
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (src, rs) =>
      val p = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(p - 1.0) < 1e-9, s"$src transition probs sum to $p")
    }
    // each user's chain contributes (events - 1) transitions
    val ev = Tables.load(spark, dir, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum === expected)
  }

  test("q_events_decay: decayed spend is bounded by undecayed spend, counts cover the stream") {
    val rows = run("q_events_decay")
    val plain = SparkEntry.queries("q_events_decay")(spark, dir) // schema probe only
    assert(plain.columns.toSeq === Seq("user_id", "n_events", "decayed"))
    val undecayed = Tables.load(spark, dir, "events")
      .groupBy("user_id").agg(Cols.dsum(col("value")).as("tot"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("tot")).toMap
    rows.foreach { r =>
      val d = r.getAs[Double]("decayed")
      val t = undecayed(r.getAs[Long]("user_id"))
      assert(d >= 0 && d <= t + 1e-9, s"decayed $d outside [0, $t]")
    }
    assert(rows.map(_.getAs[Long]("n_events")).sum ===
      Tables.load(spark, dir, "events").count())
    spark.catalog.clearCache()
  }

  test("q_events_stickiness: ratio is avg-DAU over MAU and lands in (0, 1]") {
    val rows = run("q_events_stickiness")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("stickiness")
      assert(s > 0 && s <= 1.0, s"stickiness $s outside (0,1]")
      assert(r.getAs[Long]("dau_sum") >= r.getAs[Long]("mau"),
        "summed DAU cannot be below MAU (every monthly active has >= 1 active day)")
    }
  }

  test("q_events_conversion: one row per purchasing user, coherent latency") {
    val rows = run("q_events_conversion")
    val purchasers = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(rows.length.toLong === purchasers)
    assert(rows.map(_.getAs[Long]("user_id")).distinct.length === rows.length)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_clicks_before")
      assert(n >= 0)
      if (n == 0) assert(r.isNullAt(r.fieldIndex("secs_to_convert")))
      // floor division legitimately yields 0 for a click under one
      // second before the purchase — only negative latency is a bug
      else assert(r.getAs[Long]("secs_to_convert") >= 0,
        "clicks are strictly before the purchase, so latency cannot be negative")
    }
  }

  test("q_pareto: deciles partition the customers, cumulative share reaches exactly 1") {
    val rows = run("q_pareto").sortBy(_.getAs[Long]("decile"))
    assert(rows.map(_.getAs[Long]("decile")).toSeq === (0L to 9L))
    val customers = Tables.load(spark, dir, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum === customers)
    // rank-ordered deciles: per-customer average spend can only fall
    val avg = rows.map(r => r.getAs[Double]("spend") / r.getAs[Long]("n_customers")).toSeq
    avg.sliding(2).foreach { case Seq(a, b) => assert(a >= b); case _ => () }
    val cum = rows.map(_.getAs[Double]("cum_share")).toSeq
    cum.sliding(2).foreach { case Seq(a, b) => assert(a < b); case _ => () }
    assert(cum.last === 1.0, "last decile's cumulative share must be exactly total/total")
  }

  test("q_rfm: valid segment digits and customers fully partitioned") {
    val rows = run("q_rfm")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val code = r.getAs[Long]("rfm")
      val (d1, d2, d3) = (code / 100, code / 10 % 10, code % 10)
      Seq(d1, d2, d3).foreach(d => assert(d >= 1 && d <= 5, s"bad RFM code $code"))
      assert(r.getAs[Double]("monetary_total") > 0)
    }
    val customers = Tables.load(spark, dir, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum === customers)
  }

  test("q_basket_lift: ranked pairs meet support floor with coherent lift") {
    val rows = run("q_basket_lift").sortBy(_.getAs[Long]("rk"))
    assert(rows.length <= 10)
    assert(rows.map(_.getAs[Long]("rk")).toSeq === (1L to rows.length))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ab") >= 3)
      assert(r.getAs[Long]("pa") < r.getAs[Long]("pb"))
      assert(r.getAs[Double]("lift") > 0)
    }
    rows.map(_.getAs[Double]("lift")).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b); case _ => ()
    }
  }

  test("q_events_paths: top-10 ranked 3-step paths with non-increasing counts") {
    val rows = run("q_events_paths").sortBy(_.getAs[Long]("rk"))
    assert(rows.map(_.getAs[Long]("rk")).toSeq === (1L to rows.length))
    rows.map(_.getAs[Long]("n")).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b); case _ => ()
    }
  }

  test("q_lang_confusion: rates are per-declared-language distributions covering the corpus") {
    val rows = run("q_lang_confusion")
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val rate = rs.map(_.getAs[Double]("rate")).sum
      assert(math.abs(rate - 1.0) < 1e-9, s"$lang confusion rates sum to $rate")
    }
    val corpus = Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum === corpus)
    // the matrix diagonal must agree with text_langid's hit counts
    val hits = run("text_langid").count(_.getAs[Boolean]("hit"))
    val diag = rows.filter(r => r.getAs[String]("lang") == r.getAs[String]("pred_lang"))
      .map(_.getAs[Long]("n")).sum
    assert(diag.toInt === hits)
  }

  test("q_tombstone_sweep: purge counts cascade consistently through the key chain") {
    val rows = run("q_tombstone_sweep")
    val byTbl = rows.map(r => r.getAs[String]("tbl") ->
      (r.getAs[Long]("n_purged"), r.getAs[Long]("n_kept"))).toMap
    assert(byTbl.keySet === Set("customer", "orders", "lineitem"))
    // purged + kept must equal each table's full row count
    Seq("customer", "orders", "lineitem").foreach { t =>
      val (p, k) = byTbl(t)
      assert(p + k === Tables.load(spark, dir, t).count(), s"$t split is lossy")
      assert(p > 0, s"$t: vacuous purge — fixture has no tombstoned rows")
    }
  }

  test("q_events_seasonal_mae: scores exactly the days with a 7-day-earlier anchor") {
    val rows = run("q_events_seasonal_mae")
    assert(rows.nonEmpty)
    // driver-side replay of the calendar alignment: a day scores iff
    // the SAME type was active exactly 7 calendar days earlier
    val dayMs = 86400000L
    val active = Tables.load(spark, dir, "events")
      .select(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .distinct().collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("d").getTime))
    val byType = active.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    rows.foreach { r =>
      assert(r.getAs[Double]("mae") >= 0)
      val t = r.getAs[String]("event_type")
      val expected = byType(t).count(d => byType(t).contains(d - 7 * dayMs))
      assert(r.getAs[Long]("n_scored") === expected.toLong,
        s"$t scored ${r.getAs[Long]("n_scored")} days, calendar replay says $expected")
    }
  }

  test("dedup_component_sizes: histogram mass equals the clustered-doc count") {
    val rows = run("dedup_component_sizes")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("comp_size") >= 2,
        "a component from an edge list has at least two members")
    }
    val mass = rows.map(r => r.getAs[Long]("comp_size") * r.getAs[Long]("n_components")).sum
    val clustered = SparkEntry.queries("dedup_near_components")(spark, dir).count()
    spark.catalog.clearCache()
    assert(mass === clustered)
  }

  test("q_agg_delta_merge: merged partials equal the direct aggregation") {
    val rows = run("q_agg_delta_merge")
    assert(rows.nonEmpty)
    val direct = Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), Cols.dsum(col("value")).as("total"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
    rows.foreach { r =>
      val (n, t) = direct(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Double]("total") === t,
        "decimal partial-merge must be bit-identical to the direct sum")
      assert(r.getAs[Long]("n_delta") <= n)
    }
  }

  test("mm_shard_manifest: byte layout replays exactly per shard stream") {
    val rows = run("mm_shard_manifest")
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      var cum = 0L
      rs.sortBy(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx")))
        .foreach { r =>
          assert(r.getAs[Long]("shard_file") === cum / 4096,
            s"shard $shard doc ${r.getAs[Long]("doc_id")}: wrong shard_file")
          assert(r.getAs[Long]("file_off") === cum % 4096,
            s"shard $shard doc ${r.getAs[Long]("doc_id")}: wrong file_off")
          val fb = r.getAs[Long]("frame_bytes")
          assert(fb > 0 && fb <= 16)
          cum += fb
        }
    }
  }

  test("q_sketch_hll: estimates land within HLL's error regime for m=256") {
    val rows = run("q_sketch_hll")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("hll_est")
      val exact = r.getAs[Long]("n_exact")
      val empty = r.getAs[Long]("n_empty")
      assert(empty >= 0 && empty <= 256)
      assert(est > 0)
      // The query reports the RAW estimator (ln() is not bit-stable
      // cross-engine, so linear counting stays out of the oracle'd
      // output). In the small-range regime (empty registers remain)
      // the raw estimate biases high BY DESIGN; n_empty carries
      // exactly the information needed to recover accuracy, which
      // this spec does test-side: m*ln(m/V) — the standard HLL
      // small-range correction.
      if (empty > 0) {
        val lc = 256.0 * math.log(256.0 / empty)
        assert(math.abs(lc - exact) / exact < 0.2,
          s"${r.getAs[String]("event_type")}: linear-count $lc vs exact $exact")
      } else {
        // past the small-range regime the raw estimator's standard
        // error is ~1.04/sqrt(256) = 6.5%; allow 3 sigma
        assert(math.abs(est - exact) / exact < 0.2,
          s"${r.getAs[String]("event_type")}: est $est vs exact $exact")
      }
    }
  }

  test("sim_dim_stats: one row per dimension, corpus-sized counts, non-negative variance") {
    val rows = run("sim_dim_stats")
    val corpus = Tables.load(spark, dir, "embeddings").count()
    assert(rows.map(_.getAs[Long]("dim")).toSet === (1L to 64L).toSet)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") === corpus)
      // exact integer moments; only the final double division rounds
      assert(r.getAs[Double]("var_pop") >= -1e-12)
    }
  }

  test("sim_pair_hist: bins are 0.1-wide cosine buckets accounting for every candidate pair") {
    val rows = run("sim_pair_hist")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= -11 && bin <= 10, s"bin $bin outside cosine range")
      assert(r.getAs[Long]("n_pairs") > 0)
    }
    // total pairs must equal sum over buckets of k-choose-2
    import functions.VectorFns
    val bucketSizes = Tables.load(spark, dir, "embeddings")
      .select(VectorFns.lshBucket(VectorFns.toDouble(col("embedding"))).as("b"))
      .groupBy("b").count().collect().map(_.getAs[Long]("count"))
    val expected = bucketSizes.map(k => k * (k - 1) / 2).sum
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === expected)
  }
}
