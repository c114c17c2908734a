package graft.operators

import graft.SparkTestBase

class WordCountSpec extends SparkTestBase {
  import spark.implicits._

  test("wordCounts: tokenizes, drops stop-words and short words, counts multiset") {
    val docs = Seq(
      "The spark engine runs spark jobs",
      "engine ENGINE the and or cat").toDF("text")
    val got = WordCount.wordCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    // "the"/"and"/"or" are stop-words; "runs","jobs","cat" pass length>3
    // except "cat"/"runs"/"jobs": length>3 means >=4 chars → cat (3) drops
    assert(got == Map("spark" -> 2L, "engine" -> 3L, "runs" -> 1L, "jobs" -> 1L))
  }

  test("wordCounts honors the language argument") {
    val docs = Seq("le chat mange avec le chien").toDF("text")
    val fr = WordCount.wordCounts(docs, "text", language = "french")
      .as[(String, Long)].collect().toMap
    // "avec" is a French stop-word; chat/chien short? chat=4 chars passes
    assert(fr == Map("chat" -> 1L, "mange" -> 1L, "chien" -> 1L))
  }
}
