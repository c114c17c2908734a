package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to each left row the most recent right row (by
  * time) with the same key. Spark has no native ASOF JOIN; the usual
  * range-join formulation explodes into an inequality join, so this
  * composes existing operators instead (preference (a) of the
  * custom-operator ladder): union both sides tagged, one window pass
  * carries the last right value forward within each key, then keep left
  * rows.
  *
  * Cost model: one shuffle on the key (the union sorts within
  * partitions), versus a theta-join's quadratic fan-out. At 100 TB the
  * window pass is the only viable shape without interval bucketing.
  *
  * Output: left columns + `asof_<valueCol>` (null when no right row
  * precedes the left row).
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {

    val rvType = right.schema(valueCol).dataType
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val r0 = right
      .select(col(keyCol), col(tsCol), col(valueCol).alias("__rv"))
      .withColumn("__side", lit(0))
    // align the right side to the left's full column set (nulls elsewhere)
    val rAligned = left.columns.foldLeft(r0) { (acc, c) =>
      if (acc.columns.contains(c)) acc
      else acc.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val u = l.unionByName(rAligned.select(l.columns.toIndexedSeq.map(col): _*))

    // right rows sort BEFORE left rows at the same timestamp (__side 0
    // first), so an exactly-simultaneous right value is visible to the
    // left row — standard ASOF <= semantics
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    u.withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__rv")
      .withColumnRenamed("__asof", s"asof_$valueCol")
  }
}
