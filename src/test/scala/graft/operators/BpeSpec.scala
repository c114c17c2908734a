package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenize applies merges in rank order, textbook left-to-right") {
    val docs = Seq((1L, "the then"), (2L, "hee")).toDF("doc_id", "text")
    // merges: (t,h) first, then (h,e) — after "th" merges, the "h" is
    // consumed, so "the" -> [th, e], NOT [t, he]
    val merges = Seq(("t", "h"), ("h", "e"))
    val out = Bpe.tokenize(docs, "doc_id", "text", merges)
      .orderBy("id").as[(Long, Seq[String])].collect()
    assert(out(0) === ((1L, Seq("th", "e", "th", "e", "n"))))
    // "hee" -> [he, e]: merge (h,e) takes the leftmost occurrence
    assert(out(1) === ((2L, Seq("he", "e"))))
  }

  test("adjacent occurrences of the same pair all merge in one pass") {
    val docs = Seq((1L, "abab"), (2L, "aaaa"), (3L, "aaaaa")).toDF("doc_id", "text")
    val ab = Bpe.tokenize(docs.filter($"doc_id" === 1), "doc_id", "text", Seq(("a", "b")))
      .select("toks").as[Seq[String]].head()
    assert(ab === Seq("ab", "ab"),
      "consecutive pair occurrences must BOTH merge (the single-space " +
        "encoding would swallow the shared delimiter and produce [ab,a,b])")
    val a4 = Bpe.tokenize(docs.filter($"doc_id" === 2), "doc_id", "text", Seq(("a", "a")))
      .select("toks").as[Seq[String]].head()
    assert(a4 === Seq("aa", "aa"))
    val a5 = Bpe.tokenize(docs.filter($"doc_id" === 3), "doc_id", "text", Seq(("a", "a")))
      .select("toks").as[Seq[String]].head()
    assert(a5 === Seq("aa", "aa", "a"), "left-to-right: odd runs leave the tail single")
  }

  test("merges never cross word boundaries") {
    val docs = Seq((1L, "ba ab")).toDF("doc_id", "text")
    val out = Bpe.tokenize(docs, "doc_id", "text", Seq(("a", "a")))
      .select("toks").as[Seq[String]].head()
    assert(out === Seq("b", "a", "a", "b"),
      "the trailing 'a' of 'ba' and leading 'a' of 'ab' are in different words")
  }

  test("trainMerges runs textbook iterative BPE and agrees with tokenize") {
    // "abab" x2: round 1 counts (a,b)=4 (two occurrences x freq 2),
    // (b,a)=2 -> merge (a,b); round 2: (ab,ab)=2 -> merge (ab,ab)
    val merges = Bpe.trainMerges(Seq(("abab", 2L)), numMerges = 2)
    assert(merges === Seq(("a", "b"), ("ab", "ab")))
    val docs = Seq((1L, "abab ab")).toDF("doc_id", "text")
    val out = Bpe.tokenize(docs, "doc_id", "text", merges)
      .select("toks").as[Seq[String]].head()
    assert(out === Seq("abab", "ab"), "multi-level merges apply through the same chain")
  }

  test("trainMerges tie-break is (count desc, pair asc) and stops when no pairs remain") {
    // "ba" freq 1 and "ab" freq 1: (a,b)=1 and (b,a)=1 tie -> (a,b) wins
    val m = Bpe.trainMerges(Seq(("ba", 1L), ("ab", 1L)), numMerges = 10)
    assert(m.head === (("a", "b")))
    // single-char words have no pairs: training terminates early
    assert(Bpe.trainMerges(Seq(("a", 5L)), numMerges = 3) === Seq.empty)
  }

  test("trainMergesFromCorpus: bounded collect, equals trainMerges below the cap") {
    val docs = Seq((1L, "abab abab cd"), (2L, "abab xy")).toDF("doc_id", "text")
    // under the cap: identical to training on the full word-freq table
    val full = Bpe.trainMerges(Seq(("abab", 3L), ("cd", 1L), ("xy", 1L)), numMerges = 2)
    val got = Bpe.trainMergesFromCorpus(docs, "text", numMerges = 2, maxVocab = 100)
    assert(got === full)
    // cap = 1 trains on the single most frequent word only
    val capped = Bpe.trainMergesFromCorpus(docs, "text", numMerges = 1, maxVocab = 1)
    assert(capped === Seq(("a", "b")), s"got $capped")
  }

  test("tokens reassemble the original character stream (lossless segmentation)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.rankedBigramMerges(docs, "text", topPairs = 50)
    assert(merges.size === 50)
    val bad = Bpe.tokenize(docs, "doc_id", "text", merges)
      .select(col("id"), concat_ws("", col("toks")).alias("joined"))
      .join(docs.select(col("doc_id").alias("id"),
        concat_ws("", graft.functions.TextFunctions.tokens(col("text"))).alias("expected")), Seq("id"))
      .filter(col("joined") =!= col("expected"))
      .count()
    assert(bad === 0L, "concatenating a doc's tokens must reproduce its word characters exactly")
  }

  test("tokenizeViaWords is row-identical to tokenize (incl. empty docs)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .union(Seq((99991L, "", "en", "srcx", 0L)).toDF(
        "doc_id", "text", "lang", "source", "n_chars"))
    val merges = Bpe.rankedBigramMerges(docs, "text", topPairs = 50)
    val direct = Bpe.tokenize(docs, "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
    val viaWords = Bpe.tokenizeViaWords(docs, "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
    assert(viaWords === direct,
      "the distinct-word application must reproduce the projection form exactly")
    assert(viaWords.exists(_._1 == 99991L), "wordless docs must survive with empty toks")

    // the reassembly-free forms agree too: counts per doc...
    val counts = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .as[(Long, Long)].collect().toMap
    assert(direct.forall { case (id, toks) => counts(id) == toks.size.toLong },
      "tokenCounts diverged from size(tokenize().toks)")
    assert(counts(99991L) === 0L)
    // ...and the stream's multiset
    val streamCounts = Bpe.tokenStream(docs, "text", merges)
      .groupBy("token").count().as[(String, Long)].collect().toMap
    val directCounts = direct.flatMap(_._2).groupBy(identity).map { case (t, o) => (t, o.size.toLong) }
    assert(streamCounts === directCounts, "tokenStream multiset diverged")
  }

  test("groupTokenStats equals the two-pass per-doc composition (incl. wordless docs, null groups)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .union(Seq(
        (99991L, "", "en", "srcx", 0L), // wordless: counts toward n_docs only
        (99992L, "solo words", "en", null, 10L) // null group must still aggregate
      ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val merges = Bpe.rankedBigramMerges(docs, "text", topPairs = 50)
    val got = Bpe.groupTokenStats(docs, "source", "text", merges)
      .as[(Option[String], Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // reference: the old per-doc shape — tokenCounts + per-doc char sums
    val counts = Bpe.tokenCounts(docs, "doc_id", "text", merges).withColumnRenamed("id", "doc_id")
    val expected = docs
      .select(col("doc_id"), col("source"),
        length(concat_ws("", graft.functions.TextFunctions.tokens(col("text"))))
          .cast("long").alias("nc"))
      .join(counts, Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)), sum("n_tokens"), sum("nc"))
      .as[(Option[String], Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === expected, s"one-pass diverged:\n$got\nvs\n$expected")
    // the null group aggregated (1 doc, 9 word chars); token count is
    // whatever the trained merges yield, pinned by the equality above
    assert(got.contains(None), s"null group missing: ${got.keySet}")
    assert(got(None)._1 == 1L && got(None)._3 == 9L, s"null group: ${got(None)}")
  }

  test("the q100 trainer config is genuinely multi-level on the fixtures (merge outputs merge again)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.trainMergesFromCorpus(docs, "text", numMerges = 24)
    assert(merges.size === 24)
    val multi = merges.filter(p => p._1.length > 1 || p._2.length > 1)
    assert(multi.nonEmpty,
      s"no merge consumed a prior merge's output — q100 would degenerate to the q93 bigram form: $merges")
    // and at least one side is itself a multi-round product (depth > 2)
    val outputs = merges.map { case (a, b) => a + b }.toSet
    assert(multi.exists(p => outputs.contains(p._1) || outputs.contains(p._2)),
      s"no merge side is a prior OUTPUT: $multi")
  }

  test("tokenStats seq_hash is order-sensitive") {
    val docs = Seq((1L, "ab ba")).toDF("doc_id", "text")
    val swapped = Seq((1L, "ba ab")).toDF("doc_id", "text")
    val h1 = Bpe.tokenStats(docs, "doc_id", "text", Seq.empty).select("seq_hash").as[String].head()
    val h2 = Bpe.tokenStats(swapped, "doc_id", "text", Seq.empty).select("seq_hash").as[String].head()
    assert(h1 !== h2)
  }

  test("tokenIds maps through the frequency-ranked vocab, projection-only") {
    val docs = Seq((1L, "aa ab"), (2L, "aa")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"))
    val toks = Bpe.tokenize(docs, "doc_id", "text", merges)
    val vocab = Bpe.vocabIds(toks, "toks")
    // token counts: aa=3 (doc1 'aa', doc1 'a'+'b'? no — 'ab' -> [a, b]), recount:
    // doc1: "aa"->[aa], "ab"->[a,b]; doc2: "aa"->[aa] => aa:2, a:1, b:1
    assert(vocab === Map("aa" -> 1, "a" -> 2, "b" -> 3))
    val ids = Bpe.tokenIds(docs, "doc_id", "text", merges, vocab)
      .orderBy("id").as[(Long, Seq[Int])].collect()
    assert(ids(0) === ((1L, Seq(1, 2, 3))))
    assert(ids(1) === ((2L, Seq(1))))
    val plan = Bpe.tokenIds(docs, "doc_id", "text", merges, vocab)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "token-id mapping must stay projection-only")
  }

  test("empty and whitespace-only docs tokenize to empty") {
    val docs = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val out = Bpe.tokenStats(docs, "doc_id", "text", Seq(("a", "b")))
      .orderBy("id")
      .select("n_tokens", "max_token_len").as[(Long, Option[Long])].collect()
    assert(out.forall { case (n, m) => n == 0L && m.isEmpty })
  }
}
