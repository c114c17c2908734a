package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key→count table algebra — the reference's persisted-state merge.
  *
  * `merge` re-expresses `RedisInterface.update_table`
  * (`/root/reference/src/main/scala/TwitchStream/RedisInterface.scala:61-73`):
  * full-outer equi-join on the key, missing side → 0, counts summed.
  * Catalyst plans a shuffled sort-merge join (a full outer join cannot
  * broadcast); at 100 TB both sides hash-partition on the key, so the
  * merge is a single co-partitioned shuffle — and if both tables are
  * bucketed by key on disk, no shuffle at all.
  */
object KVTable {

  def merge(oldDf: DataFrame, newDf: DataFrame, key: String, sumCol: String): DataFrame = {
    val incoming = newDf.withColumnRenamed(sumCol, "__new")
    oldDf
      .join(incoming, Seq(key), "full_outer")
      .na.fill(0, Seq(sumCol, "__new"))
      .withColumn(sumCol, col(sumCol) + col("__new"))
      .drop("__new")
  }

  /** Top-K keys by count, deterministic tie-break on the key. Catalyst
    * plans `TakeOrderedAndProject` — a true distributed top-K (per-
    * partition heaps + driver merge), never a full sort. Mirrors the
    * reference's sort+limit (`ProcessingWorkSheet.sc:102-114`).
    */
  def topK(df: DataFrame, key: String, countCol: String, k: Int): DataFrame =
    df.orderBy(col(countCol).desc, col(key).asc).limit(k)
}
