package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One parsed Twitch IRC chat message.
  *
  * Column contract of the reference pipeline (the 7-column `Row` pattern
  * match at `/root/reference/src/main/scala/TwitchStream/SparkRunner.scala:90-97`),
  * re-expressed as a typed case class with a real `TimestampType` event
  * time instead of the reference's string-prepended epoch millis
  * (`IRCBot.scala:52-53`).
  */
final case class TwitchMessage(
    raw: String,
    event_ts: Timestamp,
    metadata: String,
    user: String,
    channel: String,
    text: String)

/** IRC PRIVMSG line parsing — pure Scala (unit-testable without Spark) and
  * columnar (codegen-friendly, used in the actual plans).
  *
  * Semantics follow `/root/reference/src/main/scala/TwitchStream/SparkRunner.scala:191-209`
  * with the documented limit-3 fix (SURVEY.md §2.11.3): the reference's
  * `split(message, ":")` truncates chat text at any later `:`; we split
  * with limit 3 so the message body survives intact.
  */
object IrcParser {

  /** Raw line shape: `:nick!nick@host PRIVMSG #channel :message body`. */
  final case class Parsed(metadata: String, user: String, channel: String, text: String)

  /** Pure parser used for golden tests and by the streaming source. */
  def parseLine(line: String): Option[Parsed] = {
    val parts = line.split(":", 3)
    if (parts.length < 3) None
    else {
      val metadata = parts(1)
      val metaTokens = metadata.split(" ")
      // takeWhile, not split().head — split("!") on a token of only '!'
      // yields an empty array (Java drops trailing empties)
      val user = metaTokens.headOption.map(_.takeWhile(_ != '!')).getOrElse("")
      val channel = metaTokens.find(_.startsWith("#")).getOrElse("")
      Some(Parsed(metadata, user, channel, parts(2).toLowerCase))
    }
  }

  /** Columnar parse of a `raw` IRC-line column into the message schema.
    * All built-in expressions — stays inside WholeStageCodegen, and
    * Catalyst prunes unused outputs.
    */
  def parseColumns(raw: Column): Seq[Column] = {
    val parts = split(raw, ":", 3)
    val metadata = parts.getItem(1)
    val metaTokens = split(metadata, " ")
    Seq(
      metadata.alias("metadata"),
      split(metaTokens.getItem(0), "!").getItem(0).alias("user"),
      // channel = first '#'-prefixed metadata token — the SAME rule as the
      // pure parseLine above (not a fixed index, which diverges on lines
      // carrying extra metadata tokens such as IRC tags)
      coalesce(
        element_at(filter(metaTokens, t => t.startsWith("#")), 1),
        lit("")).alias("channel"),
      lower(parts.getItem(2)).alias("text")
    )
  }

  /** `value: STRING` (+ optional `event_ts`) → parsed message DataFrame.
    * Mirrors `helpers.formatRawDataFrame` (`SparkRunner.scala:191-209`).
    */
  def parse(df: DataFrame, rawCol: String = "value"): DataFrame = {
    val keep = df.columns.filter(_ != rawCol).map(col).toSeq
    df.select((col(rawCol).alias("raw") +: keep) ++ parseColumns(col(rawCol)): _*)
  }
}
