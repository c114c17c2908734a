package graft.operators

import graft.SparkTestBase

class TrainingPrepSpec extends SparkTestBase {
  import spark.implicits._

  test("prepare: quality gates, language filter, dedup keep-min-id") {
    val en = "the cat and the dog were with all of them over there and it was done then"
    val docs = Seq(
      (1L, en), //                            kept (16 tokens, en)
      (2L, en), //                            dup of 1 → folded in
      (3L, "le chat est sur la table et il y a des choses que nous avons la"), // fr → dropped
      (4L, "too short"), //                   dropped (< minTokens)
      (5L, "the quick brown fox jumps over the lazy dog and then some more words here") // kept
    ).toDF("doc_id", "text")

    val out = TrainingPrep.prepare(docs, "doc_id", "text",
      minTokens = 10, maxTokens = 50, language = "en")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    assert(out.keySet == Set(1L, 5L))
    assert(out(1L)._4 == 2L) // docs 1+2 folded
    assert(out(5L)._4 == 1L)
    assert(out(1L)._3 == en.split("\\s+").length)
  }
}
