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

  test("funnelReport: stage counts match the gates, monotone, and stage 4 equals prepare's output size") {
    val en = "the cat and the dog were with all of them over there and it was done then"
    val docs = Seq(
      (1L, en),                 // survives everything
      (2L, en),                 // survives gates, folds in dedup
      (3L, "le chat est sur la table et il y a des choses que nous avons la"), // lang gate
      (4L, "too short"),        // token gate
      (5L, "the quick brown fox jumps over the lazy dog and then some more words here"),
      (6L, null.asInstanceOf[String]) // counted at ingest, falls at the first gate
    ).toDF("doc_id", "text")

    val funnel = TrainingPrep.funnelReport(docs, "doc_id", "text",
      minTokens = 10, maxTokens = 50, language = "en")
      .as[(String, Long)].collect().toMap

    assert(funnel == Map(
      "1_ingest" -> 6L,
      "2_token_bounds" -> 4L,        // 1, 2, 3, 5 (doc 4 short, doc 6 null)
      "3_language" -> 3L,            // drops the French doc
      "4_dedup_canonical" -> 2L))    // 1+2 fold
    val stages = funnel.toSeq.sortBy(_._1).map(_._2)
    assert(stages == stages.sorted.reverse, "funnel must be monotone non-increasing")
    assert(stages.last == TrainingPrep.prepare(docs, "doc_id", "text",
      minTokens = 10, maxTokens = 50, language = "en").count())
  }
}
