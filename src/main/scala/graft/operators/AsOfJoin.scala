package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to each left row the nearest right row (by
  * time) with the same key. Spark has no native ASOF JOIN; the usual
  * range-join formulation explodes into an inequality join, so this
  * composes existing operators instead (preference (a) of the
  * custom-operator ladder): union both sides tagged, one window pass
  * carries the nearest right value through each key's timeline, then
  * keep left rows.
  *
  * Cost model: one shuffle on the key (the union sorts within
  * partitions), versus a theta-join's quadratic fan-out. At 100 TB the
  * window pass is the only viable shape without interval bucketing
  * ([[RangeJoin]] is the bucketed alternative when a bounded tolerance
  * is known up front).
  *
  * Surface matches the pandas `merge_asof` / kdb `aj` contract:
  *
  *  - `direction = "backward"` (default): most recent right row with
  *    `rts <= lts`;
  *  - `direction = "forward"`: earliest right row with `rts >= lts`;
  *  - `toleranceSec`: maximum |lts − rts| staleness — a match farther
  *    away resolves to null (exactly pandas' `tolerance`). The window
  *    still carries the nearest candidate; the tolerance is a row-local
  *    post-filter, so it costs nothing extra.
  *
  * Output: left columns + `asof_<valueCol>` + `asof_ts` (the matched
  * right timestamp; null when no qualifying right row).
  *
  * The oracle twin (q134) is DuckDB's NATIVE `ASOF LEFT JOIN` — an
  * independent implementation of the same semantics, so the gate
  * cross-checks the operator against a second engine's as-of, not
  * against a re-transcription of this plan.
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      direction: String = "backward",
      toleranceSec: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    toleranceSec.foreach(t => require(t >= 0, s"toleranceSec must be >= 0, got $t"))

    val rvType = right.schema(valueCol).dataType
    val tsType = right.schema(tsCol).dataType
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
      .withColumn("__rts", lit(null).cast(tsType))
    val r0 = right
      .select(col(keyCol), col(tsCol),
        col(valueCol).alias("__rv"), col(tsCol).alias("__rts"))
      .withColumn("__side", lit(0))
    // align the right side to the left's full column set (nulls elsewhere)
    val rAligned = l.columns.foldLeft(r0) { (acc, c) =>
      if (acc.columns.contains(c)) acc
      else acc.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }
    val u = l.unionByName(rAligned.select(l.columns.toIndexedSeq.map(col): _*))

    // right rows sort BEFORE left rows at the same timestamp (__side 0
    // first), so an exactly-simultaneous right value is visible to the
    // left row — standard ASOF <=/>= semantics. Backward walks time
    // ascending (last right seen = most recent <=); forward walks time
    // DESCENDING (last right seen = earliest >=).
    val order =
      if (direction == "backward") Seq(col(tsCol).asc, col("__side").asc)
      else Seq(col(tsCol).desc, col("__side").asc)
    val w = Window
      .partitionBy(keyCol)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = u
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("__asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    // tolerance: null out matches farther than the allowed staleness —
    // row-local, after the window already found the nearest candidate
    val inTol = toleranceSec match {
      case Some(t) =>
        abs(unix_micros(col(tsCol)) - unix_micros(col("__asof_ts"))) <= t * 1000000L
      case None => col("__asof_ts").isNotNull
    }
    matched
      .withColumn("__keep", col("__asof_ts").isNotNull && inTol)
      .withColumn(s"asof_$valueCol", when(col("__keep"), col("__asof")))
      .withColumn("asof_ts", when(col("__keep"), col("__asof_ts")))
      .drop("__side", "__rv", "__rts", "__asof", "__asof_ts", "__keep")
  }
}
