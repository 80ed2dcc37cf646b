package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** The reference pipeline's relational core, re-expressed as distributed
  * DataFrame operations (SURVEY.md §2 O6–O15).
  *
  * Reference semantics (all citations into /root/reference):
  *   - both sources must expose the join key (`gule_test_job.py:107-111`)
  *   - left-outer equi-join on the key, FIRST secondary match only —
  *     duplicate secondary keys never multiply output rows, and primary
  *     row count is exactly preserved (`gule_test_job.py:125-133`, first
  *     match at `:132`)
  *   - cell-level precedence: primary value wins when present and
  *     non-NaN (`pd.notna`, `gule_test_job.py:140-147`); a NaN cell is
  *     treated as MISSING and eligible for fill, so float NaNs are
  *     normalized to null before the coalesce
  *   - output columns: primary columns in their original order, then
  *     secondary-only columns (`gule_test_job.py:161-163`). The reference
  *     orders the secondary-only tail by Python set iteration
  *     (nondeterministic, `:114,162`); we fix it to secondary schema
  *     order and document the deviation (SURVEY.md §1.3).
  *   - unmatched secondary rows are reported, never written
  *     (`gule_test_job.py:166-185`)
  *
  * The reference executes all of this as a single-threaded pandas row
  * loop on the driver (O(N*M) nested loop). Here it is one left-outer
  * join that Catalyst/AQE plans as broadcast-hash or sort-merge: at
  * 100 TB the dimension side is deduped (one shuffle of the SMALL side
  * only, or none when broadcast), and the fact side streams through
  * without collecting anything to the driver.
  */
object MergeOps {

  /** O6: hard-fail before planning when the join key is missing. */
  def requireKey(df: DataFrame, key: String, side: String): Unit =
    require(
      df.schema.fieldNames.contains(key),
      s"Error: '$key' column not found in $side data")

  /** Reference `pd.notna` semantics: float NaN counts as missing
    * (`gule_test_job.py:140`). SQL NULL already does; NaN does not, so
    * normalize NaN -> null on every float/double column.
    */
  def nanToNull(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case DoubleType | FloatType =>
          when(isnan(col(f.name)), lit(null)).otherwise(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** O8's "first match" (`iloc[0]`, `gule_test_job.py:132`) made
    * deterministic: keep one row per key, "first" defined by ascending
    * order of the remaining columns (schema order), NULLS LAST — Spark's
    * default ASC is NULLS FIRST while the DuckDB oracle's ASC is NULLS
    * LAST, so the explicit direction keeps the chosen row identical in
    * both engines when an ordering column is NULL. The window shuffles
    * only the (small) secondary side.
    */
  def firstMatch(secondary: DataFrame, key: String): DataFrame = {
    val ord: Seq[Column] =
      secondary.schema.fieldNames.filterNot(_ == key)
        .map(c => col(c).asc_nulls_last).toIndexedSeq
    val w = Window.partitionBy(col(key)).orderBy(ord: _*)
    secondary
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** O7+O8+O9+O12 in one plan: schema union, first-match left-outer
    * join, per-cell coalesce with primary precedence, ordered projection.
    * Primary row count is preserved by construction (left-outer against
    * a key-unique build side).
    *
    * @param broadcastSecondary hint Catalyst to broadcast the deduped
    *   secondary (the reference's secondary is a dimension table; at
    *   scale this turns the merge into a map-side join, zero shuffle of
    *   the fact side).
    */
  def coalesceMerge(
      primary: DataFrame,
      secondary: DataFrame,
      key: String,
      broadcastSecondary: Boolean = true): DataFrame = {
    requireKey(primary, key, "S3")
    requireKey(secondary, key, "RDS")
    val p = nanToNull(primary).alias("p")
    val sDedup = firstMatch(nanToNull(secondary), key)
    val s = (if (broadcastSecondary) broadcast(sDedup) else sDedup).alias("s")

    val pCols = primary.schema.fieldNames.toIndexedSeq
    val sCols = secondary.schema.fieldNames.toIndexedSeq
    val shared = pCols.toSet.intersect(sCols.toSet)

    val out: Seq[Column] =
      pCols.map {
        case `key` => col(s"p.$key").as(key)
        case c if shared(c) => coalesce(col(s"p.$c"), col(s"s.$c")).as(c)
        case c => col(s"p.$c")
      } ++ sCols.filter(c => c != key && !shared(c)).map(c => col(s"s.$c"))

    p.join(s, col(s"p.$key") === col(s"s.$key"), "left_outer").select(out: _*)
  }

  /** O13: secondary rows whose key never appears in the primary
    * (`~isin`, `gule_test_job.py:166-167`) as a distributed anti-join.
    */
  def unmatched(secondary: DataFrame, primary: DataFrame, key: String): DataFrame =
    secondary.join(primary.select(key), Seq(key), "left_anti")

  /** O14+O15: head-N sample plus total count for the unmatched report
    * (`gule_test_job.py:173-185`). One action for the sample, one count.
    */
  def reportSample(df: DataFrame, key: String, n: Int = 10): (Seq[Any], Long) = {
    val total = df.count()
    val sample = df.select(col(key)).orderBy(col(key)).limit(n)
      .collect().map(_.get(0)).toIndexedSeq
    (sample, total)
  }
}
