package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenization: APPLY a trained merge list to text, distributed
  * and oracle-checkable. (Reference analogue: none — this takes the
  * tokenize contract of `pipelines.scala:42-67` to its training-pipeline
  * conclusion; q90/`Vocab.bpePairCounts` is the matching train-side
  * step.)
  *
  * Representation trick that makes the whole apply chain native codegen
  * (`StringReplace`, no UDF, no shuffle): a document's words are joined
  * by a `\n` sentinel symbol and exploded to per-character symbols
  * rendered as a string with TWO spaces between symbols and ONE flanking
  * space: `" a  b  \n  c "`. One `replace(s, " a  b ", " ab ")` pass per
  * merge then consumes one space from each side of the matched pair,
  * PRESERVING the separator budget of its neighbors — so consecutive
  * occurrences ("abab" → `" a  b  a  b "`) both merge in a single
  * left-to-right pass, exactly the textbook BPE merge step. (With
  * single-space separators the first match would swallow the delimiter
  * the second match needs — the classic off-by-one that silently
  * diverges from reference BPE implementations.) Since Spark's and
  * DuckDB's `replace` share left-to-right non-overlapping semantics,
  * the oracle reproduces the apply bit-for-bit, including
  * identical-symbol runs ("aaaa" → `[aa, aa]`).
  *
  * Scale shape: the apply is a pure per-row projection — `nMerges`
  * linear string passes per document, embarrassingly parallel, zero
  * exchanges (plan-audited). The merge list itself is driver-scale by
  * definition (a tokenizer's merge table, 10k–100k entries max; here
  * bounded by `topPairs`). At 100 TB the classic refinement is to apply
  * merges over DISTINCT words only (Zipf: the word vocabulary is orders
  * of magnitude smaller than the token stream) and re-join; the
  * projection form here keeps the oracle equivalence exact and is the
  * right shape while per-doc text dominates distinct-word overhead.
  */
object Bpe {

  /** Split into code points (NOT UTF-16 chars) — merge pairs are
    * 2-character strings in SQL character semantics, and Java substring
    * would cut astral pairs in half.
    */
  private[operators] def codePoints(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Code-point (= UTF-8 byte) string order. Scala's default String
    * ordering compares UTF-16 code UNITS, which sorts astral characters
    * (surrogate pairs, 0xD800+) BELOW some BMP characters — diverging
    * from the UTF-8/code-point binary collation both Spark SQL's
    * `orderBy` and DuckDB apply. Every driver-side sort whose order an
    * oracle must reproduce goes through this ordering.
    */
  private[graft] val codePointOrdering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
  }

  /** One-shot ranked merge list: the top-`topPairs` adjacent character
    * pairs by corpus frequency (exactly `Vocab.bpePairCounts`' table,
    * ties broken by pair text), split into (left, right) symbols. This
    * is the first round of BPE training taken as the whole merge list —
    * deterministic and reproducible in SQL, which is what the oracle
    * check needs. For a REAL multi-level merge list use [[trainMerges]]
    * (driver-side iterative BPE) or any externally trained list;
    * [[tokenize]] accepts arbitrary symbol pairs.
    */
  def rankedBigramMerges(docs: DataFrame, textCol: String, topPairs: Int): Seq[(String, String)] =
    Vocab.bpePairCounts(docs, textCol, topPairs)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (pair, cnt) => (-cnt, pair) }(
        Ordering.Tuple2(Ordering.Long, codePointOrdering))
      .map { case (pair, _) =>
        val cps = codePoints(pair)
        require(cps.length == 2, s"bigram merge must be 2 code points, got '$pair'")
        (cps(0), cps(1))
      }.toSeq

  /** Textbook iterative BPE training, driver-side, over a (word, freq)
    * table (collect the word-frequency aggregate first — it is
    * vocabulary-sized, and real tokenizer trainers are driver-scale for
    * the same reason; cap the table before calling for a hard memory
    * bound). Each round counts adjacent symbol pairs weighted by word
    * frequency, merges the (count desc, pair asc) argmax, and
    * re-segments with the same left-to-right non-overlapping pass
    * [[tokenize]] applies — trainer and applier agree by construction.
    */
  def trainMerges(wordFreqs: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Vector[(Vector[String], Long)] =
      wordFreqs.iterator.map { case (w, f) => (codePoints(w), f) }.toVector
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }(
          Ordering.Tuple3(Ordering.Long, codePointOrdering, codePointOrdering))._1
        merges += best
        words = words.map { case (syms, f) => (mergePass(syms, best), f) }
        round += 1
      }
    }
    merges.result()
  }

  /** [[trainMerges]] fed from a corpus: the word-frequency aggregate is
    * cut to the top-`maxVocab` words by (freq desc, word asc) before the
    * driver collect — the hard memory bound every real tokenizer trainer
    * applies (the frequency head carries virtually all pair mass; the
    * dropped tail is mostly hapax legomena whose pair counts cannot
    * reach the top anyway). Deterministic: the cut is a total order, and
    * [[trainMerges]] is a pure fold from there.
    */
  def trainMergesFromCorpus(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocab: Int = 65536): Seq[(String, String)] = {
    require(maxVocab > 0, s"maxVocab must be positive, got $maxVocab")
    val wf = docs
      .select(explode(TextFunctions.tokens(col(textCol))).alias("w"))
      .groupBy("w").agg(count(lit(1)).alias("f"))
      .orderBy(col("f").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainMerges(wf, numMerges)
  }

  /** One left-to-right non-overlapping merge pass over a symbol list —
    * the list-form twin of the string `replace` pass (a token merged in
    * this pass is never the LEFT element of another match in the same
    * pass).
    */
  private[operators] def mergePass(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += (pair._1 + pair._2)
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.result()
  }

  /** The spaced symbol string for a document: words (lower-cased
    * whitespace tokens) joined by the `\n` sentinel, every code point a
    * symbol — `" a  b  \n  c "` form (one flanking space, two between).
    * `\n` can never merge (merge pairs come from words, which contain no
    * whitespace), so merges stop at word boundaries by construction.
    */
  private def spacedSymbols(text: Column): Column =
    concat(
      lit(" "),
      regexp_replace(concat_ws("\n", TextFunctions.tokens(text)), "(?s)(.)", "$1  "))

  /** Merge-applied symbol string: fold the ranked merges into chained
    * native `replace` calls. Pattern `" a  b "` → `" ab "` keeps the
    * one-flanking/two-separating invariant, so later (lower-rank)
    * merges see the same representation.
    */
  private def applyMerges(spaced: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(spaced) { case (c, (a, b)) =>
      replace(c, lit(s" $a  $b "), lit(s" $a$b "))
    }

  /** Final token array of a merged symbol string: split on spaces, drop
    * empties and the `\n` word sentinels.
    */
  private def parseTokens(merged: Column): Column =
    filter(split(merged, " "), t => length(t) > 0 && t =!= lit("\n"))

  /** `(id, toks: array<string>)` — the tokenized corpus. Pure
    * projection: scan → native per-word merge kernel; no exchange.
    *
    * r21: the chained-`replace` form (nMerges full-document string
    * passes) is replaced by [[graft.functions.expressions.BpeApplyExpr]]
    * — per-word mergePass chain with a per-task distinct-word cache;
    * row-identical (`BpeKernelSpec` pins kernel == replace chain; the
    * `tokenizeViaWords` parity spec already pins the per-word ==
    * whole-document argument). The coalesce preserves the replace
    * chain's null-text behavior (null text → empty token array).
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[(String, String)]): DataFrame =
    docs.select(
      col(idCol).alias("id"),
      coalesce(
        graft.functions.expressions.BpeApplyExpr
          .bpeApply(TextFunctions.tokens(col(textCol)), merges),
        typedlit(Seq.empty[String])).alias("toks"))

  /** The r20 chained-replace tokenize — kept as the spec reference
    * ([[graft.functions.expressions.BpeApplyExpr]]'s parity oracle).
    */
  private[graft] def tokenizeViaReplaceChain(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    docs.select(
      col(idCol).alias("id"),
      parseTokens(applyMerges(spacedSymbols(col(textCol)), merges)).alias("toks"))

  /** [[tokenize]] via DISTINCT words — the 100 TB shape. Merges never
    * cross word boundaries, so a doc's token sequence is the
    * concatenation of its words' token lists; the `nMerges` replace
    * passes therefore need to run only over the word VOCABULARY (Zipf:
    * orders of magnitude smaller than the token stream), not over every
    * occurrence. Costs two exchanges (the distinct and the doc
    * re-assembly) that the projection form avoids — the break-even is
    * `corpus chars ≫ vocabulary chars × occupancy`, i.e. any corpus
    * whose words repeat. Output is row-identical to [[tokenize]]
    * (spec-pinned), so callers choose purely on plan shape.
    */
  def tokenizeViaWords(docs: DataFrame, idCol: String, textCol: String,
                       merges: Seq[(String, String)]): DataFrame = {
    val ids = docs.select(col(idCol).alias("id"))
    val words = docs
      .select(col(idCol).alias("id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "w")))
    val applied = words.select("w").distinct()
      .select(col("w"),
        parseTokens(applyMerges(wordSymbols(col("w")), merges)).alias("wtoks"))
    val reassembled = words
      .join(applied, Seq("w"))
      .groupBy("id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("wtoks")))),
        s => s.getField("wtoks"))).alias("toks"))
    // docs with no words have no exploded rows — restore them with an
    // empty token array so the output row set matches tokenize()
    ids.join(reassembled, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("toks"), typedlit(Seq.empty[String])).alias("toks"))
  }

  /** The spaced symbol string of ONE word (no `\n` sentinels needed). */
  private def wordSymbols(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(?s)(.)", "$1  "))

  /** `(w, wtoks)` — every DISTINCT word's token list; the shared
    * word-vocabulary kernel of the `ViaWords`/counts/stream forms.
    */
  private def appliedWords(docs: DataFrame, textCol: String,
                           merges: Seq[(String, String)]): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).alias("w"))
      .distinct()
      .select(col("w"),
        parseTokens(applyMerges(wordSymbols(col("w")), merges)).alias("wtoks"))

  /** `(id, n_tokens)` — per-doc BPE token counts WITHOUT sequence
    * reassembly: the replace chain runs over distinct words, each doc
    * sums its words' subtoken counts. The cheapest correct budget for
    * packing/manifests (row-identical to `size(tokenize().toks)`,
    * spec-pinned).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val perWord = appliedWords(docs, textCol, merges)
      .select(col("w"), size(col("wtoks")).cast("long").alias("n"))
    docs.select(col(idCol).alias("id"),
        explode(TextFunctions.tokens(col(textCol))).alias("w"))
      .join(perWord, Seq("w"))
      .groupBy("id")
      .agg(sum(col("n")).alias("n_tokens"))
      .join(docs.select(col(idCol).alias("id")), Seq("id"), "right_outer")
      .select(col("id"), coalesce(col("n_tokens"), lit(0L)).alias("n_tokens"))
  }

  /** `(group, n_docs, n_tokens, n_chars)` — per-GROUP document, BPE
    * token, and word-character totals in ONE pass over the exploded
    * word stream (the q98 shape): each word occurrence carries both its
    * subtoken count (distinct-word kernel join) and its own length, so
    * no per-doc counts table and no doc-keyed shuffle join ever exist —
    * the only exchanges are the distinct-word kernel's and the bounded
    * per-group aggregate. The doc-count side is a separate scalar scan
    * of the group column alone (so docs whose text yields zero words
    * still count); group keys join null-safely, so a null group
    * aggregates like any other (as both engines' GROUP BY does).
    */
  def groupTokenStats(docs: DataFrame, groupCol: String, textCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    val perWord = appliedWords(docs, textCol, merges)
      .select(col("w"), size(col("wtoks")).cast("long").alias("n"))
    val wordAgg = docs
      .select(col(groupCol), explode(TextFunctions.tokens(col(textCol))).alias("w"))
      .join(perWord, Seq("w"))
      .groupBy(groupCol)
      .agg(
        sum(col("n")).alias("n_tokens"),
        sum(length(col("w")).cast("long")).alias("n_chars"))
    val docCounts = docs.groupBy(groupCol).agg(count(lit(1)).alias("n_docs"))
    // null-safe key join between two frames sharing lineage: alias the
    // keys apart first — dataframe-qualified columns (`docCounts(c) <=>
    // wordAgg(c)`) resolve to the SAME attribute here and Spark logs a
    // "trivially true equals predicate" warn on every run (it then
    // disambiguates correctly, but a warning-bearing plan is
    // indistinguishable from a real self-join bug in a log scan)
    docCounts.select(col(groupCol).alias("__dk"), col("n_docs"))
      .join(
        wordAgg.select(col(groupCol).alias("__wk"), col("n_tokens"), col("n_chars")),
        col("__dk") <=> col("__wk"), "left")
      .select(
        col("__dk").alias(groupCol),
        col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).alias("n_tokens"),
        coalesce(col("n_chars"), lit(0L)).alias("n_chars"))
  }

  /** `(token)` — the corpus subword stream with occurrence multiplicity
    * (order not guaranteed): the input a tokenizer-vocabulary count
    * wants, again without per-doc reassembly.
    */
  def tokenStream(docs: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).alias("w"))
      .join(appliedWords(docs, textCol, merges), Seq("w"))
      .select(explode(col("wtoks")).alias("token"))

  /** Per-document tokenization evidence, scalar-only (the correctness
    * gate's row compare needs scalars): token count, distinct-token
    * count, longest token, and an order-sensitive md5 over the full
    * token sequence — a hash mismatch catches ANY divergence in merge
    * application order or segmentation, not just count drift.
    */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)]): DataFrame =
    tokenize(docs, idCol, textCol, merges)
      .select(
        col("id"),
        size(col("toks")).cast("long").alias("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").alias("n_unique_tokens"),
        array_max(transform(col("toks"), t => length(t))).cast("long").alias("max_token_len"),
        md5(concat_ws("|", col("toks"))).alias("seq_hash"))

  /** Token→id vocabulary of a tokenized corpus: rank by (count desc,
    * token asc), 1-based. Bounded by |alphabet| + |merges| (every
    * symbol is a single character or a merge output), hence always
    * driver-scale.
    */
  def vocabIds(toks: DataFrame, toksCol: String): Map[String, Int] =
    toks.select(explode(col(toksCol)).alias("t"))
      .groupBy("t").agg(count(lit(1)).alias("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }(
        Ordering.Tuple2(Ordering.Long, codePointOrdering))
      .zipWithIndex
      .map { case ((t, _), i) => (t, i + 1) }
      .toMap

  /** `(id, token_ids: array<int>)` — the training-loader handoff. The
    * vocabulary map is a broadcast literal (bounded, see [[vocabIds]]);
    * the lookup is a codegen'd `element_at`, still projection-only.
    */
  def tokenIds(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[(String, String)], vocab: Map[String, Int]): DataFrame = {
    require(vocab.nonEmpty, "tokenIds: empty vocabulary")
    val vm = typedlit(vocab)
    tokenize(docs, idCol, textCol, merges)
      .select(col("id"),
        transform(col("toks"), t => element_at(vm, t)).alias("token_ids"))
  }
}
