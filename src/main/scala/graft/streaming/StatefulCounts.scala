package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Lower-level stateful running counts via `flatMapGroupsWithState` —
  * the explicit-state form of [[StreamingPipeline.wordCounts]]'s
  * aggregation (SURVEY.md §2.4 A4 maps `updateStateByKey` to streaming
  * `groupBy.sum`; this is the noted `mapGroupsWithState` alternative,
  * needed only when state wants semantics the aggregate can't express —
  * here: optional idle-key TTL eviction, which the reference lacked but
  * its Redis TTL map gestured at).
  *
  * Emits `(key, runningCount)` for every key updated in the batch
  * (Update output mode); a key idle past `ttl` is dropped from the state
  * store via processing-time timeout.
  */
object StatefulCounts {

  final case class KeyCount(key: String, count: Long)

  def runningCounts(
      keys: Dataset[String],
      ttl: Option[java.time.Duration] = None): Dataset[KeyCount] = {
    import keys.sparkSession.implicits._
    val timeout = ttl match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout()
      case None => GroupStateTimeout.NoTimeout()
    }
    keys
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, KeyCount](OutputMode.Update(), timeout) {
        (key: String, values: Iterator[String], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val next = state.getOption.getOrElse(0L) + values.size
            state.update(next)
            ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
            Iterator.single(KeyCount(key, next))
          }
      }
  }
}
