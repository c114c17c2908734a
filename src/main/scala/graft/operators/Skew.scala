package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers. Spark's AQE splits skewed SHUFFLE partitions
  * for joins, but a single hot GROUP BY key still funnels through one
  * reducer for the final aggregate. Two-phase salted aggregation bounds
  * any key's reducer fan-in to `saltBuckets` partial rows.
  */
object Skew {

  /** `groupBy(key).agg(sum(valueCol))` in two phases: (key, salt) partial
    * sums, then final sum per key. Adds one extra (tiny) shuffle over the
    * partials; worth it when key frequency is pathological (the classic
    * hot-key wordcount at web scale).
    */
  def saltedSum(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      resultCol: String,
      saltBuckets: Int = 64): DataFrame =
    df
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).alias("__partial"))
      .groupBy(keyCol)
      .agg(sum(col("__partial")).alias(resultCol))

  /** Salted count — the wordcount shape. */
  def saltedCount(df: DataFrame, keyCol: String, resultCol: String, saltBuckets: Int = 64): DataFrame =
    saltedSum(df.withColumn("__one", lit(1L)), keyCol, "__one", resultCol, saltBuckets)
}
