package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact global ranking WITHOUT a single-partition sort.
  *
  * `Window.orderBy(...)` with no partition spec moves the whole
  * relation into ONE partition (Spark logs `WindowExec: No Partition
  * Defined`) — correct at any size, but a single-task sort of the
  * full input. Fine over a 10-row aggregate; a certain bottleneck
  * over 10⁸–10⁹ rows on a 1000-executor cluster. These helpers keep
  * rank/ntile semantics bit-identical to the window forms while every
  * data-plane step stays partition-parallel:
  *
  *   1. range-shuffle the relation on the (strict, total) sort order —
  *      partition p holds keys strictly before partition p+1's;
  *   2. sort WITHIN each partition and assign per-partition positions
  *      with `monotonically_increasing_id` (record number in the low
  *      33 bits — the documented layout; this is the classic
  *      distributed zipWithIndex, one shuffle, no second window);
  *   3. count rows per partition (an O(numPartitions) driver-side
  *      scalar collect, the same budget class as the components
  *      fixpoint counters), prefix-sum the counts into per-partition
  *      rank offsets, and add them back as a broadcast map literal.
  *
  * global row_number = within-partition position + offset[partition].
  * The order MUST be a total order (include a unique tie-break
  * column) — that is also what makes the windowed form deterministic,
  * so callers already have one.
  */
object Ranks {

  /** Appends `rnName` = exact global `row_number() OVER (ORDER BY
    * order*)` (1-based Long) and returns the total row count (known
    * as a free by-product of the offset computation — callers use it
    * for ntile / decile arithmetic instead of a `count(*) OVER ()`
    * single-partition window).
    *
    * The returned frame is persisted: the offset collect has already
    * materialized it, so downstream reuse is a cache read, and a
    * recompute after eviction is deterministic because the order is
    * total. Works on any column set; `order` may reference columns by
    * expression (e.g. `col("spend").desc`).
    */
  def withGlobalRowNumber(
      df: DataFrame, rnName: String, order: Column*): (DataFrame, Long) = {
    val (out, total, _) = rankStep(df, rnName, order)
    (out, total)
  }

  /** Chains several exact global ranks over the SAME relation (the RFM
    * pattern: one rank per metric) while keeping at most ONE generation
    * cached. Each step's offset collect materializes that step's
    * persist, at which point generation k-1's cache is dead weight —
    * every block it holds is now also embedded in generation k's
    * buffers — so it is unpersisted immediately. Chaining the
    * single-rank form instead would pin every generation until
    * `clearCache` (at production scale: N extra cached copies of the
    * relation for an N-metric scoring job). Returns the last
    * generation (which carries ALL the rank columns) and the row count
    * (identical across steps — ranking is row-preserving).
    *
    * The 2-tuple form cannot release the LAST generation's cache
    * (unpersisting the returned projection is a `sameResult` no-op —
    * see [[rankStep]]); callers that finish consuming the result and
    * want the memory back use [[withGlobalRowNumbersHandle]].
    */
  def withGlobalRowNumbers(
      df: DataFrame, ranks: Seq[(String, Seq[Column])]): (DataFrame, Long) = {
    val (out, total, _) = withGlobalRowNumbersHandle(df, ranks)
    (out, total)
  }

  /** As [[withGlobalRowNumbers]], plus the final generation's PERSISTED
    * handle — `handle.unpersist()` is the only call that actually
    * releases the chain's one surviving cache entry. All steps'
    * orderings are validated up front, and a failure mid-chain
    * unpersists the in-flight generation before propagating — an
    * aborted chain leaks no cache.
    */
  def withGlobalRowNumbersHandle(
      df: DataFrame,
      ranks: Seq[(String, Seq[Column])]): (DataFrame, Long, DataFrame) = {
    require(ranks.nonEmpty, "rank chain needs at least one (name, order) step")
    ranks.foreach { case (rnName, order) =>
      require(order.nonEmpty, s"rank step '$rnName' needs at least one ordering column")
    }
    var cur = df
    var prevHandle: Option[DataFrame] = None
    var total = 0L
    try {
      ranks.foreach { case (rnName, order) =>
        val (out, t, handle) = rankStep(cur, rnName, order)
        // rankStep's offset collect has materialized `handle`'s cache in
        // full (the counts agg scans every partition), so the previous
        // generation can be released NOW, not at end-of-query
        prevHandle.foreach(_.unpersist(blocking = false))
        prevHandle = Some(handle)
        cur = out
        total = t
      }
    } catch {
      case e: Throwable =>
        prevHandle.foreach(_.unpersist(blocking = false))
        throw e
    }
    (cur, total, prevHandle.get)
  }

  /** Core of the two-phase rank. Also returns the PERSISTED relation
    * itself: the public tuple form's first element is a projection over
    * it, and `Dataset.unpersist` only drops cache entries whose plan
    * `sameResult`s the call target — unpersisting the projection is a
    * silent no-op, so any caller that wants to release the cache needs
    * this handle (as [[withGlobalRowNumbers]] does between generations).
    *
    * Correctness leans on two Spark layout facts, both pinned by
    * RanksSpec against the window forms:
    *  - `monotonically_increasing_id` keeps the within-partition record
    *    number in the LOW 33 BITS of the id (the documented layout) —
    *    the bitmask below extracts it;
    *  - `spark_partition_id` ascending matches the range-partition
    *    order, INCLUDING under AQE: AQE's partition coalescing only
    *    merges ADJACENT shuffle partitions, which preserves the range
    *    ordering (and AQE never splits a user repartitionByRange's
    *    ordering); skew-split is disabled for non-join range shuffles.
    * A Spark upgrade that changes either fact breaks the RanksSpec
    * equality pins first — the regression is traceable, not silent.
    */
  private def rankStep(
      df: DataFrame, rnName: String,
      order: Seq[Column]): (DataFrame, Long, DataFrame) = {
    require(order.nonEmpty, "global rank needs at least one ordering column")
    val ranged = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      // both ids are nondeterministic expressions, so Catalyst will not
      // reorder this projection below the sort — positions are assigned
      // in sorted order, once, then pinned by the persist
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .persist()
    // runtime failure here (a task failure during the offset collect)
    // must release the generation just persisted, or an aborted chain
    // leaks its in-flight cache entry — the analysis-time failures
    // RanksSpec pins throw before the persist, so this is the only
    // post-persist failure window
    val counts =
      try ranged.groupBy("__pid").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      catch {
        case e: Throwable =>
          ranged.unpersist(blocking = false)
          throw e
      }
    val total = counts.map(_._2).sum
    var acc = 0L
    val offsets: Map[Int, Long] =
      counts.map { case (p, c) => val o = acc; acc += c; p -> o }.toMap
    // record number within the partition = the low 33 bits of the id
    // (Spark's documented monotonically_increasing_id layout)
    val localIdx = col("__mid").bitwiseAND(lit((1L << 33) - 1))
    val out = ranged
      // every __pid in the data has an offsets entry by construction
      // (the map was built from this exact cached relation)
      .withColumn(rnName,
        (localIdx + element_at(typedlit(offsets), col("__pid")) + lit(1L))
          .cast(LongType))
      .drop("__pid", "__mid")
    (out, total, ranged)
  }

  /** Releases `handle`'s cache as soon as the first action whose plan
    * CONTAINS the handle's relation completes (success or failure) —
    * the missing half of [[withGlobalRowNumbersHandle]]'s contract for
    * callers that hand their result to someone else to execute: a
    * registered query builder returns a lazy DataFrame, so it cannot
    * unpersist "after consumption" itself. A one-shot, self-
    * unregistering QueryExecutionListener can: when the consuming
    * action (Verify's parquet write, Bench's noop write, a user
    * collect) finishes, the final generation's cache is dropped
    * instead of pinning a full copy of the relation until someone
    * calls `clearCache`. Unrelated actions do not match (subtree
    * `sameResult` check), and an early release is only ever a
    * recompute, never a wrong answer — the rank offsets are already
    * embedded as literals and the ordering is total, the same
    * determinism that makes cache EVICTION safe.
    */
  def releaseOnConsumption(
      spark: org.apache.spark.sql.SparkSession, handle: DataFrame): Unit = {
    val lm = spark.listenerManager
    val handlePlan = handle.queryExecution.analyzed
    lm.register(new org.apache.spark.sql.util.QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def fire(qe: org.apache.spark.sql.execution.QueryExecution): Unit =
        if (qe.analyzed.exists(_.sameResult(handlePlan)) &&
            done.compareAndSet(false, true)) {
          handle.unpersist(blocking = false)
          lm.unregister(this)
        }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = fire(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = fire(qe)
    })
  }

  /** SQL-standard `ntile(k)` derived arithmetically from an exact
    * global rank column and the total row count: with n = q·k + r,
    * the first r tiles take q+1 rows. Pure integer `div` on literals —
    * stays in whole-stage codegen, no window at all.
    */
  def ntileFromRank(rnName: String, n: Long, k: Int): Column = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    val q = n / k
    val r = n % k
    val head = r * (q + 1) // ranks 1..head fall in the first r tiles
    // q == 0 (n < k): every rank is <= head, so the ELSE branch is
    // unreachable; the max(q, 1) divisor keeps it well-formed anyway
    val qSafe = math.max(q, 1L)
    expr(
      s"CASE WHEN $rnName <= ${head}L THEN ($rnName - 1L) div ${q + 1}L " +
        s"ELSE ${r}L + ($rnName - ${head}L - 1L) div ${qSafe}L END + 1L")
  }
}
