package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Native AS-OF JOIN — the whole-operator extension point exercised
  * end to end (custom LogicalPlan + optimizer Rule + SparkStrategy +
  * SparkPlan, registered through `SparkSessionExtensions` in
  * [[graft.functions.GraftExtensions]]).
  *
  * Semantics: for every LEFT row, attach the RIGHT row with the same
  * key whose time is the greatest time <= the left row's time
  * (backward as-of, inclusive — DuckDB's `ASOF LEFT JOIN ... ON
  * l.k = r.k AND r.t <= l.t`); left rows with no such match keep NULL
  * right columns. This is the standard enrichment join Spark's
  * DataFrame API lacks (pandas `merge_asof`, kdb `aj`): "the latest
  * price/config/state at or before each observation". The composed
  * alternative (union + last_value window, `q_asof_join`) stays as
  * the oracle-checked reference formulation; this operator is the
  * one-hash-shuffle-per-side physical path.
  *
  * Scale shape: both children hash-cluster on the key (one shuffle
  * each — EnsureRequirements co-partitions them exactly as it does
  * for SortMergeJoin), and each partition builds a hash index of the
  * RIGHT side's (time, row) lists and streams the left side through
  * binary searches — the ShuffledHashJoin memory profile (right
  * partition resident), chosen over a merge because it needs no
  * cross-type key ordering and no sort on either child. A sort-merge
  * spill path is the documented follow-up if right partitions ever
  * outgrow memory.
  */
/** merge_asof's direction dial. Nearest prefers the BACKWARD
  * candidate on an exact distance tie (pinned, spec-tested contract).
  */
sealed trait AsOfDirection extends Serializable
object AsOfDirection {
  case object Backward extends AsOfDirection
  case object Forward extends AsOfDirection
  case object Nearest extends AsOfDirection
  def parse(s: String): AsOfDirection = s match {
    case "backward" => Backward
    case "forward" => Forward
    case "nearest" => Nearest
    case other => throw new IllegalArgumentException(
      s"as-of direction must be 'backward', 'forward' or 'nearest', got '$other'")
  }
}

final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    direction: AsOfDirection = AsOfDirection.Backward,
    tolerance: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def references: AttributeSet =
    AttributeSet(Seq(leftKey, rightKey, leftTime, rightTime).flatMap(_.references))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Catalyst does not know a custom node's semantics, so no built-in
  * rule moves predicates through [[AsOfJoinPlan]]; without this rule a
  * filter on left-side columns would run AFTER the join (and after
  * both shuffles). Left-side predicates commute with a left as-of
  * join — each left row's match depends only on that row — so they
  * push below the join and on toward the scan. Right-side predicates
  * do NOT commute (dropping a right row can change which row is
  * "latest at-or-before") and are left where they are.
  */
object AsOfFilterPushdown extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoinPlan) =>
      val (pushable, keep) = conjuncts(cond)
        .partition(c => c.references.nonEmpty && c.references.subsetOf(a.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(pushable.reduce(And), a.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, dir, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, dir, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    direction: AsOfDirection,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // one hash shuffle per side; EnsureRequirements co-partitions the
  // two single-key clusterings exactly as it does for equi joins
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Times must evaluate to an integral instant — the engine's event
    * time is TimestampType (micros as Long). Date/int/long are
    * accepted for generality. [[AsOfJoinOps.asof]] enforces the type
    * contract (same type both sides, from this set) at construction;
    * this is the runtime backstop for plans built directly.
    */
  private def toLong(dt: org.apache.spark.sql.types.DataType, v: Any): Long = dt match {
    case TimestampType | TimestampNTZType | LongType => v.asInstanceOf[Long]
    case IntegerType | DateType => v.asInstanceOf[Int].toLong
    case other => throw new IllegalArgumentException(
      s"as-of time column must be timestamp/date/integral, got $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lkB = BindReferences.bindReference(leftKey, leftOut)
    val ltB = BindReferences.bindReference(leftTime, leftOut)
    val rkB = BindReferences.bindReference(rightKey, rightOut)
    val rtB = BindReferences.bindReference(rightTime, rightOut)
    val ltType = leftTime.dataType
    val rtType = rightTime.dataType
    val out = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // BUILD the right side's per-key time index. Rows from the
      // iterator are reused buffers: copy first, then evaluate key
      // from the copy so map keys (e.g. UTF8String) stay stable.
      val index = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
      rIter.foreach { raw =>
        val row = raw.copy()
        val k = rkB.eval(row)
        val t = rtB.eval(row)
        if (k != null && t != null) {
          var buf = index.get(k)
          if (buf == null) {
            buf = new scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]()
            index.put(k, buf)
          }
          buf += ((toLong(rtType, t), row))
        }
      }
      // sort each key's postings once; ties on time resolve to the
      // LAST row in sort order (stable sort keeps build order — the
      // operator contract asks callers to dedup per (key, time), as
      // q_asof_native's purchase side does)
      val it = index.values().iterator()
      while (it.hasNext) { val b = it.next(); b.sortInPlaceBy(_._1) }

      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(out, out)

      lIter.map { lrow =>
        val k = lkB.eval(lrow)
        val t = ltB.eval(lrow)
        var matched: InternalRow = null
        if (k != null && t != null) {
          val buf = index.get(k)
          if (buf != null) {
            val target = toLong(ltType, t)
            // ONE binary search anchors all three directions: bk is
            // the greatest index with time <= target; bk+1 is then the
            // smallest index with time > target. BACKWARD takes bk,
            // FORWARD the smallest time >= target (bk itself on an
            // exact hit, else bk+1), NEAREST whichever neighbor has
            // the smaller absolute gap — ties to the backward one.
            var lo = 0
            var hi = buf.length - 1
            var bk = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (buf(mid)._1 <= target) { bk = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            val ans = direction match {
              case AsOfDirection.Backward => bk
              case AsOfDirection.Forward =>
                if (bk >= 0 && buf(bk)._1 == target) bk
                else if (bk + 1 < buf.length) bk + 1
                else -1
              case AsOfDirection.Nearest =>
                val fw = bk + 1
                if (bk < 0 && fw >= buf.length) -1
                else if (bk < 0) fw
                else if (fw >= buf.length) bk
                else if (target - buf(bk)._1 <= buf(fw)._1 - target) bk
                else fw
            }
            // tolerance band (merge_asof's dial): a candidate farther
            // than `tolerance` time units from the probe is no match
            if (ans >= 0 && tolerance.forall(tol =>
                math.abs(buf(ans)._1 - target) <= tol))
              matched = buf(ans)._2
          }
        }
        project(joined(lrow, if (matched != null) matched else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-facing API for the native as-of join. */
object AsOfJoinOps {

  /** `left AS-OF LEFT JOIN right ON left(key) = right(key) AND
    * right(time) <= left(time)`, latest right row winning. Column
    * names are resolved on each side independently, so colliding
    * names across sides are fine (rename before joining if you need
    * to select both afterwards). Self-joins are safe: when the two
    * sides share attribute ids (same source Dataset), the right side
    * is re-aliased so the join output never contains duplicate ids —
    * without this, UnsafeProjection would bind both copies of a
    * duplicated attribute to the LEFT value (silently wrong rows).
    *
    * Type contract, checked HERE (construction time, not first-row):
    * the two time columns must have the SAME integral/temporal type
    * (date-vs-timestamp would compare days to micros and silently
    * never match), and float/double keys are rejected — the exec's
    * hash index uses value equality, which disagrees with SQL
    * equality on -0.0/NaN; normalize such keys to bits first.
    */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(tolerance.forall(_ >= 0), "as-of tolerance must be >= 0")
    val dir = AsOfDirection.parse(direction)
    val lp = GraftPlanShim.analyzed(left)
    val rp0 = GraftPlanShim.analyzed(right)
    val rp =
      if (rp0.outputSet.intersect(lp.outputSet).isEmpty) rp0
      else GraftPlanShim.analyzed(
        right.select(right.columns.toIndexedSeq.map(c =>
          org.apache.spark.sql.functions.col(c).as(c)): _*))
    def attr(p: LogicalPlan, n: String, side: String) =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"as-of $side column '$n' not found among ${p.output.map(_.name).mkString(", ")}"))
    val (lk, rk) = (attr(lp, leftKey, "left key"), attr(rp, rightKey, "right key"))
    val (lt, rt) = (attr(lp, leftTime, "left time"), attr(rp, rightTime, "right time"))
    require(lt.dataType == rt.dataType &&
      Seq(TimestampType, TimestampNTZType, LongType, IntegerType, DateType)
        .contains(lt.dataType),
      s"as-of time columns must share one integral/temporal type; " +
        s"got ${lt.dataType} vs ${rt.dataType}")
    Seq("left key" -> lk, "right key" -> rk).foreach { case (side, a) =>
      require(a.dataType != org.apache.spark.sql.types.DoubleType &&
        a.dataType != org.apache.spark.sql.types.FloatType,
        s"as-of $side is ${a.dataType}: floating-point join keys are not " +
          "supported (value equality diverges from SQL equality on -0.0/NaN)")
    }
    GraftPlanShim.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp, lk, rk, lt, rt, dir, tolerance))
  }
}
