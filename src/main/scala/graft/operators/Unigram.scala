package graft.operators

import graft.functions.TextFunctions
import graft.functions.expressions.UnigramTokenizeExpr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Unigram-LM (SentencePiece-style) tokenizer — the second production
  * tokenizer family beside BPE ([[Bpe]]): a piece VOCABULARY with
  * log-probabilities, trained by hard-EM over a word-frequency table,
  * applied by per-word Viterbi segmentation (Kudo 2018, "Subword
  * Regularization" — public literature; this is the deterministic
  * Viterbi-EM variant, not the forward-backward soft-EM, so every
  * step is integer-reproducible in a second engine).
  *
  * The algorithm, exactly as the q143 oracle re-derives it in SQL:
  *
  *  1. word-frequency table from the corpus (the [[Bpe]] tokenizer's
  *     whitespace-lowercase tokens), capped at `maxWords` by
  *     (freq desc, word asc) — the driver-scale bound every real
  *     tokenizer trainer applies;
  *  2. alphabet = every distinct code point of every corpus word
  *     (NOT just the capped head — guarantees the final vocabulary
  *     segments the whole corpus with no UNK);
  *  3. seed vocabulary = alphabet ∪ the top `seedMulti` multi-code-
  *     point substrings (length ≤ `maxPieceLen`) by occurrence count
  *     (overlaps counted, weighted by word freq; ties by piece asc);
  *  4. `pruneSizes.length` hard-EM rounds: compute add-one-smoothed
  *     log-probs in integer MICROS (`round(ln((c+1)/Σ(c+1))·1e6)`,
  *     half-away-from-zero — the q101 fixed-point rule), Viterbi-
  *     segment every vocabulary word (ties prefer the LONGEST last
  *     piece), count pieces along the chosen segmentations weighted
  *     by word freq, then keep the alphabet plus the top-`k` multi
  *     pieces by (new count desc, piece asc);
  *  5. final log-probs from the last round's counts.
  *
  * Scale shape: training touches the corpus exactly twice (the word
  * aggregate and the alphabet aggregate — both one exchange of
  * word/char-sized rows) and then runs on the driver over the capped
  * table, the [[Bpe.trainMergesFromCorpus]] contract. Apply is ONE
  * fused scan projection (native [[UnigramTokenizeExpr]], no HOF
  * lambda, no UDF, nothing shuffles).
  */
object Unigram {

  /** Log-prob micros charged to a code point absent from the
    * vocabulary at apply time (cannot happen on the training corpus —
    * the alphabet is part of every vocabulary).
    */
  val UnkMicro: Long = -25000000L

  /** Half-away-from-zero rounding — Spark/DuckDB `round` semantics;
    * `Math.round` rounds half-UP (toward +∞), which differs on the
    * negative values every log-prob takes.
    */
  private[operators] def roundHalfAway(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  /** Add-one-smoothed integer-micro log-probs over a (piece, count)
    * vocabulary. Smoothing keeps never-chosen alphabet pieces finite
    * (SentencePiece keeps character fallbacks for the same reason).
    */
  def logProbs(vocabCounts: Seq[(String, Long)]): Seq[(String, Long)] = {
    val total = vocabCounts.iterator.map(_._2 + 1L).sum.toDouble
    vocabCounts.map { case (p, c) =>
      p -> roundHalfAway(math.log((c + 1L).toDouble / total) * 1e6)
    }
  }

  /** Viterbi segmentation of one word — delegates to the SAME kernel
    * the apply expression runs, so trainer and applier cannot drift.
    */
  def viterbi(word: String, lp: Map[String, Long], maxPieceLen: Int): Seq[String] = {
    val table = UnigramTokenizeExpr.buildTable(lp.toSeq, maxPieceLen)
    val out = new java.util.ArrayList[Any]()
    UnigramTokenizeExpr.segmentWord(word, table, out)
    (0 until out.size()).map(i =>
      out.get(i).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
  }

  /** Driver-side hard-EM trainer over a word-frequency table. Returns
    * the final (piece, logp_micro) vocabulary sorted by piece
    * (code-point order — the cross-engine collation).
    */
  def train(
      wordFreqs: Seq[(String, Long)],
      alphabet: Seq[String],
      seedMulti: Int,
      maxPieceLen: Int,
      pruneSizes: Seq[Int]): Seq[(String, Long)] = {
    require(seedMulti >= 0, s"seedMulti must be >= 0, got $seedMulti")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(pruneSizes.nonEmpty, "need at least one EM round")
    val words: Seq[(Vector[String], Long)] =
      wordFreqs.map { case (w, f) => (Bpe.codePoints(w), f) }

    // seed occurrence counts: every substring of length 1..maxPieceLen
    val counts = mutable.HashMap.empty[String, Long]
    words.foreach { case (cps, f) =>
      var i = 0
      while (i < cps.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= cps.length) {
          val piece = cps.slice(i, i + l).mkString
          counts.update(piece, counts.getOrElse(piece, 0L) + f)
          l += 1
        }
        i += 1
      }
    }
    val singles = alphabet.distinct.sorted(Bpe.codePointOrdering)
    def cpLen(s: String): Int = s.codePointCount(0, s.length)
    val seedMultis = counts.keysIterator.filter(cpLen(_) > 1).toSeq
      .sortBy(p => (-counts(p), p))(
        Ordering.Tuple2(Ordering.Long, Bpe.codePointOrdering))
      .take(seedMulti)
    var vocabCounts: Seq[(String, Long)] =
      singles.map(p => p -> counts.getOrElse(p, 0L)) ++
        seedMultis.map(p => p -> counts(p))

    pruneSizes.foreach { k =>
      val lp = logProbs(vocabCounts).toMap
      val segCounts = mutable.HashMap.empty[String, Long]
      words.foreach { case (cps, f) =>
        viterbi(cps.mkString, lp, maxPieceLen).foreach { p =>
          segCounts.update(p, segCounts.getOrElse(p, 0L) + f)
        }
      }
      val keptMultis = vocabCounts.iterator.map(_._1).filter(cpLen(_) > 1).toSeq
        .sortBy(p => (-segCounts.getOrElse(p, 0L), p))(
          Ordering.Tuple2(Ordering.Long, Bpe.codePointOrdering))
        .take(k)
      vocabCounts =
        singles.map(p => p -> segCounts.getOrElse(p, 0L)) ++
          keptMultis.map(p => p -> segCounts.getOrElse(p, 0L))
    }
    logProbs(vocabCounts).sortBy(_._1)(Bpe.codePointOrdering)
  }

  /** [[train]] fed from a corpus: one word aggregate (capped) + one
    * alphabet aggregate, both single-exchange corpus passes; EM runs
    * on the driver over the bounded table.
    */
  def trainFromCorpus(
      docs: DataFrame,
      textCol: String,
      maxWords: Int,
      seedMulti: Int,
      maxPieceLen: Int,
      pruneSizes: Seq[Int]): Seq[(String, Long)] = {
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    // ONE corpus tokenize pass (r22, guide §1.2): the r21 form ran the
    // explode(tokens) projection twice — once under the word-frequency
    // top-K and again under the alphabet distinct. The grouped word
    // table is vocabulary-bounded, so persist it and derive BOTH from
    // it; the alphabet over distinct words is the same set as over the
    // token stream (distinctness doesn't weight by frequency).
    val wfAll = docs
      .select(explode(TextFunctions.tokens(col(textCol))).alias("w"))
      .groupBy("w").agg(count(lit(1)).alias("f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wf = wfAll
      .orderBy(col("f").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    // code-point-exact char explode (substr, not split-on-empty, which
    // would halve astral surrogate pairs)
    val alphabet = wfAll
      .select(explode(transform(
        sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))).alias("c"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSeq
    wfAll.unpersist(blocking = false)
    train(wf, alphabet, seedMulti, maxPieceLen, pruneSizes)
  }

  /** Apply: per-doc piece sequence via the native scan expression. */
  def tokenize(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Seq[(String, Long)],
      maxPieceLen: Int): DataFrame =
    docs.select(
      col(idCol).alias("id"),
      UnigramTokenizeExpr.unigramTokenize(col(textCol), vocab, maxPieceLen)
        .alias("pieces"))

  /** Per-doc segmentation summary + negative log-likelihood in exact
    * integer micros — the q143 registry shape (`nll_micro` doubles as
    * a model-based quality signal: high per-piece NLL = text the
    * learned vocabulary compresses badly).
    */
  def tokenStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Seq[(String, Long)],
      maxPieceLen: Int): DataFrame = {
    val vm: Column = typedlit(vocab.toMap)
    tokenize(docs, idCol, textCol, vocab, maxPieceLen)
      .select(
        col("id").alias("doc_id"),
        size(col("pieces")).cast("long").alias("n_pieces"),
        md5(concat_ws("|", col("pieces"))).alias("seq_hash"),
        (-coalesce(
          aggregate(
            transform(col("pieces"),
              p => coalesce(element_at(vm, p), lit(UnkMicro))),
            lit(0L), (acc, x) => acc + x),
          lit(0L))).alias("nll_micro"))
  }
}
