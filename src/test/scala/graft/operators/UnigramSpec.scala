package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The unigram tokenizer's contracts: training invariants (alphabet
  * always kept, prune sizes honored, deterministic), exact
  * apply-vs-driver-kernel parity (same code path by construction —
  * this pins it), the documented tie-break and UNK rules, and the
  * empty/null edges the q143 oracle also covers.
  */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cats sat on mats"),
    (3L, "le chat est sur le tapis"),
    (4L, "thematic cats concatenate the theme"),
    (5L, "on the mat the cat sat"),
    (6L, null.asInstanceOf[String]))

  test("training: alphabet kept, prune sizes honored, pieces deterministic") {
    val docs = corpus.toDF("doc_id", "text")
    val v1 = Unigram.trainFromCorpus(docs, "text", 300, 24, 4, Seq(16, 12))
    val v2 = Unigram.trainFromCorpus(docs, "text", 300, 24, 4, Seq(16, 12))
    assert(v1 === v2, "trainer must be a pure fold")
    val vocab = v1.toMap
    val chars = corpus.flatMap(r => Option(r._2)).flatMap(_.toLowerCase.split("\\s+"))
      .flatMap(_.toCharArray.map(_.toString)).toSet
    chars.foreach(c => assert(vocab.contains(c), s"alphabet piece '$c' missing"))
    val multis = v1.map(_._1).filter(_.length > 1)
    assert(multis.nonEmpty && multis.size <= 12, s"prune size violated: ${multis.size}")
    assert(v1.forall(_._2 < 0L), "log-probs must be negative micros")
  }

  test("apply: pieces concatenate back to the word sequence; no UNK on the training corpus") {
    val docs = corpus.toDF("doc_id", "text")
    val vocab = Unigram.trainFromCorpus(docs, "text", 300, 24, 4, Seq(16, 12))
    val got = Unigram.tokenize(docs, "doc_id", "text", vocab, 4)
      .as[(Long, Seq[String])].collect().toMap
    corpus.foreach { case (id, text) =>
      val words = Option(text).map(_.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
      assert(got(id).mkString === words.mkString, s"doc $id pieces lost characters")
      val vs = vocab.toMap
      got(id).foreach(p => assert(vs.contains(p), s"doc $id emitted out-of-vocab piece '$p'"))
    }
  }

  test("viterbi tie-break: equal scores choose the longest piece") {
    // lp chosen so 'ab' exactly ties 'a'+'b'
    val lp = Map("a" -> -10L, "b" -> -10L, "ab" -> -20L)
    assert(Unigram.viterbi("ab", lp, 4) === Seq("ab"))
    // and a strictly better split wins over the long piece
    val lp2 = Map("a" -> -5L, "b" -> -5L, "ab" -> -20L)
    assert(Unigram.viterbi("ab", lp2, 4) === Seq("a", "b"))
    // longest-wins applies at every position, not just the end
    val lp3 = Map("a" -> -10L, "b" -> -10L, "c" -> -10L, "ab" -> -20L, "bc" -> -20L)
    assert(Unigram.viterbi("abc", lp3, 4) === Seq("a", "bc"))
  }

  test("UNK: an out-of-vocabulary code point becomes its own piece at UnkMicro") {
    val lp = Map("a" -> -10L, "b" -> -10L)
    assert(Unigram.viterbi("axb", lp, 4) === Seq("a", "x", "b"))
    val stats = Unigram.tokenStats(
      Seq((1L, "axb")).toDF("doc_id", "text"), "doc_id", "text", lp.toSeq, 4)
      .select("doc_id", "nll_micro").as[(Long, Long)].collect().head
    assert(stats._2 === (10L + 10L - Unigram.UnkMicro), s"UNK not charged: $stats")
  }

  test("null/empty text: empty piece array, md5('') hash, zero NLL") {
    val stats = Unigram.tokenStats(
      Seq((1L, null.asInstanceOf[String]), (2L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("a" -> -10L), 4)
      .select("doc_id", "n_pieces", "seq_hash", "nll_micro")
      .as[(Long, Long, String, Long)].collect().toSet
    val emptyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.empty[Byte]).map("%02x".format(_)).mkString
    assert(stats === Set((1L, 0L, emptyMd5, 0L), (2L, 0L, emptyMd5, 0L)))
  }

  test("rounding is half-away-from-zero (the cross-engine rule), not Math.round") {
    // Math.round(-2.5) == -2 (half-up); DuckDB/Spark round(-2.5) == -3
    assert(Unigram.roundHalfAway(-2.5) === -3L)
    assert(Unigram.roundHalfAway(2.5) === 3L)
    assert(Unigram.roundHalfAway(-2.4) === -2L)
    assert(Unigram.roundHalfAway(-2.6) === -3L)
    assert(Math.round(-2.5) === -2L, "if this changes, the guard is moot")
  }
}
