package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The one keyed state-merge shape every additive stats ingest shares
  * (token counts, per-source fertility, quality histograms): a
  * NULL-SAFE full-outer join of state and delta on the key columns —
  * a null key is a real group (both engines' GROUP BY semantics), not
  * a non-match — followed by a per-column combine of the (possibly
  * null) state-side and delta-side values. Centralized so the
  * null-key/coalesce discipline cannot drift between sibling modules.
  */
private[streaming] object StateMerge {

  /** `a + b` with a missing side counting 0 — the additive-count
    * combiner.
    */
  def addLong(a: Column, b: Column): Column =
    coalesce(a, lit(0L)) + coalesce(b, lit(0L))

  /** Merge `delta` into `state`: both frames must share a schema whose
    * first columns are `keyCols`; every other column is combined by
    * the matching entry of `valueCombiners` (column name → combiner
    * over the state-side and delta-side values, either of which is
    * null when the key exists on one side only — `least`/`greatest`
    * already skip nulls, sums should go through [[addLong]]).
    * Output columns: keys (coalesced) then values, in the given order.
    */
  def fullOuterMerge(
      state: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      valueCombiners: Seq[(String, (Column, Column) => Column)]): DataFrame = {
    require(keyCols.nonEmpty, "fullOuterMerge needs at least one key column")
    val s = state.select(state.columns.map(c => col(c).alias(s"s_$c")).toSeq: _*)
    val d = delta.select(delta.columns.map(c => col(c).alias(s"b_$c")).toSeq: _*)
    val cond = keyCols.map(k => s(s"s_$k") <=> d(s"b_$k")).reduce(_ && _)
    s.join(d, cond, "full_outer")
      .select(
        (keyCols.map(k => coalesce(col(s"s_$k"), col(s"b_$k")).alias(k)) ++
          valueCombiners.map { case (c, f) =>
            f(col(s"s_$c"), col(s"b_$c")).alias(c)
          }).toSeq: _*)
  }
}
