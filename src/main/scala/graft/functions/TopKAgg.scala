package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate for the top-k accumulator. */
final case class Scored(score: Double, id: Long)

/** Exact grouped top-k as a typed Aggregator (SURVEY.md §7.3's one
  * plausible custom-expression site).
  *
  * Scale rationale vs the window formulation (`row_number() OVER
  * (PARTITION BY g ORDER BY score DESC)` then `rk <= k`): the window
  * must shuffle and sort EVERY row of every group; an Aggregator gets
  * Spark's partial aggregation, so each map task reduces its slice to
  * at most k candidates per group and the shuffle carries O(groups * k)
  * rows. Same answer, radically less data movement when groups are
  * large.
  *
  * Ordering: highest score first, ties to the smaller id — identical to
  * `ORDER BY score DESC, id` in the oracle.
  */
final class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  // k = 0 would crash reduce's b.last inside a task; k < 0 would
  // silently return nothing — fail at construction like the sibling
  // expressions' width guards
  require(k >= 1, s"top-k size must be >= 1, got $k")

  private def ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  private def trim(s: Seq[Scored]): Seq[Scored] = s.sorted(ord).take(k)

  def zero: Seq[Scored] = Seq.empty

  /** The buffer is kept sorted (trim sorts), so the common case on a
    * large group — candidate no better than the current kth — is ONE
    * comparison, not a re-sort per input row.
    */
  def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (b.length == k && ord.lteq(b.last, a)) b else trim(b :+ a)

  def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = trim(x ++ y)
  def finish(r: Seq[Scored]): Seq[Scored] = r.sorted(ord)

  def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
