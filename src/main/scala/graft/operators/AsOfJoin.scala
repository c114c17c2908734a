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
    // the matched (ts, value) travel as ONE struct so the reported
    // asof value and asof_ts always come from the SAME right row
    // (two parallel last() calls could disagree when a right value
    // is null), and so duplicate-timestamp right rows have a
    // deterministic winner (the struct is the window tiebreaker)
    val rStruct = new org.apache.spark.sql.types.StructType()
      .add("ts", tsType).add("v", rvType)
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStruct))
    val r0 = right
      .select(col(keyCol), col(tsCol),
        struct(col(tsCol).alias("ts"), col(valueCol).alias("v")).alias("__r"))
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
    // DESCENDING (last right seen = earliest >=). The __r struct is
    // the third sort key: among right rows sharing (key, ts) the
    // LARGEST value deterministically wins in both directions, so
    // repeated runs (and any partitioning) agree on duplicate
    // timestamps. This requires the value type to be orderable —
    // true for every atomic type; as-of over array/map values has no
    // meaningful "nearest" tiebreak anyway.
    val order =
      if (direction == "backward")
        Seq(col(tsCol).asc, col("__side").asc, col("__r").asc_nulls_first)
      else
        Seq(col(tsCol).desc, col("__side").asc, col("__r").asc_nulls_first)
    val w = Window
      .partitionBy(keyCol)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = u
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn("__asof", col("__m.v"))
      .withColumn("__asof_ts", col("__m.ts"))

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
      .drop("__side", "__r", "__m", "__asof", "__asof_ts", "__keep")
  }
}
