package graft.tools

import graft.sinks.ParquetKVSink
import graft.streaming.DedupIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import scala.collection.mutable

/** Scratch experiment main (not part of the library surface): measures
  * `DedupIngest.startUnified`'s sustained throughput and WHERE each
  * trigger's time goes across the four tiers (exact → near-dup →
  * frozen semantic → ANN append) at several batch sizes — the numbers
  * behind BASELINE.md's round-14 unified-ingest table.
  *
  * The synthetic stream carries ~20% exact-dup mass (every 5th doc
  * repeats a canonical text per 200-block), clustered 16-dim vectors
  * with repeated representatives (every 7th doc), and unique ids —
  * every tier does real dropping work. State goes through
  * `ParquetKVSink` (the persistent deployment shape; the sink IS the
  * state store, so Spark's state-store/RocksDB knobs do not apply to
  * this pipeline — there are no stateful operators in the plan).
  *
  * Run: `sbt "runMain graft.tools.UnifiedIngestBench"` (env:
  * SPARK_GRAFT_UB_LINES total docs per size, default 30000;
  * SPARK_GRAFT_UB_LM=1 adds the frozen-LM quality tier — ~5.6% of the
  * stream (never the dup-branch docs, so both modes share one dup
  * composition) becomes fully-OOV junk and a persisted bigram LM
  * gates it between the exact and near tiers;
  * SPARK_GRAFT_UB_COMPOSED=1 runs the FULL streaming composition the
  * batch PipelineBench proved end-to-end: `keepByGopher` in front of
  * the unified ingest (a planted ~5.9% symbol-junk slice does real
  * gate work), the LM tier on, and the three round-16 observer
  * stores — DataCard, DistStats, and a token FreqSketch — as
  * parallel streaming queries over the SAME gated stream, with the
  * per-trigger time split reported per query. This measures what a
  * real deployment runs concurrently, not tiers in isolation;
  * SPARK_GRAFT_UB_CLSGATE=1 additionally swaps the rule gate for the
  * trained classifier gate — the frozen q145 artifact applied via
  * `keepByScore` — to price the learned gate at the same position.
  * Front-door stages, each opt-in and chained in the batch
  * PipelineBench order blocklist → quota → boilerplate → gate:
  * SPARK_GRAFT_UB_BLOCK=1 fronts the whole composition with the
  * domain blocklist (`UrlFilter.keepAllowed`; listed-domain docs
  * never reach the quota, the gate, any dedup state, or any observer
  * — leak-checked against the final card/shard state after each
  * run), SPARK_GRAFT_UB_QUOTA=1 the per-domain admission quota,
  * SPARK_GRAFT_UB_TMPLCAP=1 the per-layout-family admission cap
  * (q170's live twin — a one-family flood capped before any
  * downstream state, cap-checked against the packed shards),
  * SPARK_GRAFT_UB_BOILER=1 the frozen boilerplate profile).
  */
object UnifiedIngestBench {
  def main(args: Array[String]): Unit = {
    val total = sys.env.getOrElse("SPARK_GRAFT_UB_LINES", "30000").toInt
    val lmMode = sys.env.get("SPARK_GRAFT_UB_LM").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.get("SPARK_GRAFT_UB_COMPOSED").contains("1")) {
      runComposed(spark, total)
      spark.stop()
      return
    }
    import spark.implicits._

    val words = Array("stream", "corpus", "dedup", "vector", "shard", "token",
      "merge", "batch", "index", "probe", "cell", "band")
    // seed word first: every seed yields DISTINCT text (the word soup
    // alone cycles with period 12)
    def text(seed: Int): String =
      s"doc$seed " + (0 until 19).map(j => words((seed * 31 + j * 7) % words.length)).mkString(" ")
    def vec(seed: Int): Seq[Float] = {
      val axis = seed % 8
      Seq.tabulate(16)(d =>
        (if (d == axis * 2) 1.0f else 0.0f) + ((seed * 131 + d * 17) % 100) / 1000.0f)
    }
    // ~20% exact-dup mass (every 5th doc repeats its 200-block's
    // canonical text), ~9% near-dup mass (every 11th appends one word
    // to its 550-block's canonical -> shingle Jaccard ~ 0.9), ~14%
    // repeated vectors (every 7th reuses its 350-block's) — each tier
    // drops real work
    def doc(i: Int): (Long, String, Seq[Float]) = {
      val t =
        // ~5.6% fully-OOV junk for the LM gate; junk only replaces docs
        // that are NOT on the exact/near-dup branches, so the LM and
        // no-LM streams carry IDENTICAL dup composition and the twin
        // comparison isolates the gate's cost
        if (lmMode && i % 13 == 0 && i % 5 != 0 && i % 11 != 0)
          s"junk$i " + (0 until 19).map(j => s"zz${(i * 17 + j * 5) % 997}").mkString(" ")
        else if (i % 5 == 0) text((i / 200) * 200)
        else if (i % 11 == 0) text((i / 550) * 550) + s" tail"
        else text(i)
      val vSeed = if (i % 7 == 0) (i / 350) * 350 else i
      (i.toLong, t, vec(vSeed))
    }

    // frozen LM over the in-domain generator (trained once, persisted —
    // the deployment shape; in-domain docs score near ln(1)=0, junk hits
    // the OOV floor, so cutoff -3 gates exactly the junk mass)
    val lmPath = if (lmMode) {
      val dir = java.nio.file.Files.createTempDirectory("graft-ub-lm").toString
      graft.operators.NgramLm.saveLm(
        graft.operators.NgramLm.train(
          (0 until 5000).map(i => (i.toLong, text(i))).toDF("doc_id", "text"),
          "doc_id", "text"),
        dir)
      Some(dir)
    } else None

    val searchMode = sys.env.get("SPARK_GRAFT_UB_SEARCH").contains("1")
    val tiers = (if (lmMode) Seq("exact", "quality") else Seq("exact")) ++
      Seq("near", "sem", "ann") ++ (if (searchMode) Seq("search") else Seq.empty)
    println(f"${"batch"}%8s ${"batches"}%7s ${"docs/s"}%8s  " +
      tiers.map(t => f"$t%8s").mkString(" ") + f" ${"other"}%8s  (mean s/trigger)")

    for (batchSize <- Seq(2500, 10000, 50000)) {
      val nBatches = math.max(1, total / batchSize)
      val input = MemoryStream[(Long, String, Seq[Float])](spark)
      val root = java.nio.file.Files.createTempDirectory("graft-ub").toString
      val sink = new ParquetKVSink(s"$root/state")
      val agg = mutable.Map.empty[String, Double].withDefaultValue(0.0)
      val timer = (tier: String, sec: Double) => agg.synchronized { agg(tier) += sec }
      val q = DedupIngest.startUnified(
        input.toDF().toDF("doc_id", "text", "embedding"),
        "doc_id", "text", "embedding", sink, "uni", s"$root/ckpt",
        Trigger.ProcessingTime("0 seconds"),
        annIndexPath = Some(s"$root/index"),
        nLists = 8, trainSample = 2048, annNLists = 8, annM = 8, annCodes = 16,
        tierTimer = timer, lmPath = lmPath, qualityCutoff = -3.0,
        searchIndexPath = if (searchMode) Some(s"$root/postings") else None)

      // warmup trigger (bootstrap: quantizer + ANN model train) is
      // excluded from rates and tier means
      input.addData((0 until 1000).map(doc))
      q.processAllAvailable()
      agg.clear()

      val t0 = System.nanoTime()
      var b = 0
      while (b < nBatches) {
        input.addData((0 until batchSize).map(i => doc(1000 + b * batchSize + i)))
        q.processAllAvailable()
        b += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      val rate = nBatches.toLong * batchSize / sec
      val tierMeans = tiers.map(t => agg(t) / nBatches)
      val other = sec / nBatches - tierMeans.sum
      println(f"$batchSize%8d $nBatches%7d $rate%8.0f  " +
        tierMeans.map(m => f"$m%8.2f").mkString(" ") + f" $other%8.2f")
    }
    spark.stop()
  }

  /** The full streaming composition (the batch `PipelineBench`'s
    * streaming twin): gopher gate → unified dedup ingest with the LM
    * tier → DataCard + DistStats + token-FreqSketch observers, four
    * streaming queries over ONE MemoryStream, per-trigger time split
    * per query plus the unified query's internal tier split.
    */
  private def runComposed(spark: SparkSession, total: Int): Unit = {
    import spark.implicits._
    val words = Array("stream", "corpus", "dedup", "vector", "shard", "token",
      "merge", "batch", "index", "probe", "cell", "band")
    def text(seed: Int): String =
      s"doc$seed " + (0 until 19).map(j => words((seed * 31 + j * 7) % words.length)).mkString(" ")
    def vec(seed: Int): Seq[Float] = {
      val axis = seed % 8
      Seq.tabulate(16)(d =>
        (if (d == axis * 2) 1.0f else 0.0f) + ((seed * 131 + d * 17) % 100) / 1000.0f)
    }
    // layered junk: every 13th off-dup doc is OOV (the LM tier's work),
    // every 17th off-dup doc is symbol junk (the GOPHER gate's work —
    // zero alpha words fail minAlphaFrac before any state is touched)
    def doc(i: Int): (Long, String, Seq[Float]) = {
      val onDup = i % 5 == 0 || i % 11 == 0
      val t =
        if (!onDup && i % 13 == 0)
          s"junk$i " + (0 until 19).map(j => s"zz${(i * 17 + j * 5) % 997}").mkString(" ")
        else if (!onDup && i % 17 == 0)
          (0 until 20).map(j => "!#$%" * 3).mkString(" ") + s" $i"
        else if (i % 5 == 0) text((i / 200) * 200)
        else if (i % 11 == 0) text((i / 550) * 550) + s" tail"
        else text(i)
      val vSeed = if (i % 7 == 0) (i / 350) * 350 else i
      (i.toLong, t, vec(vSeed))
    }

    // SPARK_GRAFT_UB_C4=1's cleaning transform (see the stage comment
    // in the loop below) — defined up here because the FROZEN artifacts
    // trained before the stream starts must see the SAME text the gate
    // positions downstream of the cleaner will see: an LM trained on
    // unwrapped text scores every cleaned doc's new tokens as OOV junk
    // and the quality tier silently drops the whole stream (measured:
    // near survivors hit 0 and the sem/ANN tiers starved before this
    // was moved ahead of the LM/classifier training).
    val c4On = sys.env.get("SPARK_GRAFT_UB_C4").contains("1")
    def c4Clean(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val tok = element_at(split(col("text"), " ", -1), 1)
      val paged = df.withColumn("text", concat(col("text"), lit(".\n"),
        lit("Please enable JavaScript to continue viewing this page.\n"),
        lit("Home About Contact\n"),
        lit("Supplementary "), tok, lit(" sentence "), tok, lit(" words pass.")))
      graft.operators.QualityPrune.keepByC4(paged, "text", minKeptLines = 2)
    }

    val lmDir = java.nio.file.Files.createTempDirectory("graft-ubc-lm").toString
    val lmTrain = (0 until 5000).map(i => (i.toLong, text(i))).toDF("doc_id", "text")
    graft.operators.NgramLm.saveLm(
      graft.operators.NgramLm.train(
        if (c4On) c4Clean(lmTrain) else lmTrain, "doc_id", "text"),
      lmDir)

    // SPARK_GRAFT_UB_CLSGATE=1 swaps the rule gate for the TRAINED
    // classifier gate (keepByScore with weights distilled offline from
    // the same teacher params over a 5k pre-stream corpus — the frozen
    // q145 artifact applied in the streaming front door). Measures the
    // learned gate at the rule gate's position in the same composition.
    val clsGate = sys.env.get("SPARK_GRAFT_UB_CLSGATE").contains("1")
    // round 20: the freeze/refuse protocol CONSUMED (q160 -> q172 arc):
    // the gate trains on an 80% slice, the 20% hold-out calibrates, and
    // the frozen artifact deploys ONLY when freezeDecision says the
    // transfer clears the floor — a refused gate stays OFF
    // (pass-through) and says so, instead of silently curating noise.
    // no type ascriptions here: a typed tuple pattern never matches the
    // null in the else branch and would MatchError the default path
    val (clsW, clsFrozen) =
      if (clsGate) {
        val train0 = (0 until 5000).map(doc).map(d => (d._1, d._2)).toDF("doc_id", "text")
        val train = if (c4On) c4Clean(train0) else train0
        val feats = graft.operators.QualityClassifier.gopherFeatures(
            train, "doc_id", "text", dim = 256, minTokens = 5L, minStopHits = 0L)
          .withColumn("is_train", col("doc_id") % 5 > 0)
          .localCheckpoint()
        val w = graft.operators.QualityClassifier.train(
          feats.filter(col("is_train")), "feats", "y", 256 + 17, iters = 30)
        val heldOut = graft.operators.QualityClassifier
          .score(feats.filter(!col("is_train")), "feats", w)
          .select(
            (col("y") === 1L).as("label"),
            col("score_micro"),
            (col("pred") === (col("y") === 1L)).as("correct"))
          .localCheckpoint()
        val cal = graft.operators.QualityClassifier
          .cutoffSweep(heldOut, "label", "score_micro",
            Seq(-500000L, -250000L, 0L, 250000L, 500000L))
          .transform(graft.operators.QualityClassifier.markSelectedCutoffs(_, 900000L))
          .transform(graft.operators.QualityClassifier
            .markFreezeDecision(_, heldOut, "correct", 700000L))
        val ok = graft.operators.QualityClassifier.freezeDecision(cal)
        val acc = cal.select("holdout_acc_micro").head().getLong(0)
        println(s"[composed] gate freeze decision: " +
          (if (ok) s"FROZEN (holdout ${acc}µ >= 700000µ)"
           else s"REFUSED (holdout ${acc}µ < 700000µ) — gate stage OFF, pass-through"))
        (w, ok)
      } else (null, false)
    if (clsGate && clsFrozen)
      println("[composed] gate = trained classifier (keepByScore, dim=256)")

    val tiers = Seq("exact", "quality", "near", "sem", "ann")
    val qNames = Seq("unified", "card", "dist", "freq", "pack")
    println(f"${"batch"}%8s ${"batches"}%7s ${"docs/s"}%8s ${"kept"}%6s  " +
      (tiers.map(t => f"$t%8s") ++ qNames.drop(1).map(t => f"$t%8s")).mkString(" ") +
      "  (mean s/trigger; unified split then observer queries)")

    for (batchSize <- Seq(2500, 10000)) {
      val nBatches = math.max(1, total / batchSize)
      val input = MemoryStream[(Long, String, Seq[Float])](spark)
      val root = java.nio.file.Files.createTempDirectory("graft-ubc").toString
      val sink = new ParquetKVSink(s"$root/state")
      val agg = mutable.Map.empty[String, Double].withDefaultValue(0.0)
      val timer = (tier: String, sec: Double) => agg.synchronized { agg(tier) += sec }
      val trg = Trigger.ProcessingTime("0 seconds")

      val src0 = input.toDF().toDF("doc_id", "text", "embedding")
      // SPARK_GRAFT_UB_BLOCK=1 chains the domain BLOCKLIST in front of
      // EVERYTHING (the PipelineBench front-door order, streamed): every
      // doc carries a registrable domain b{doc_id % 4}.example, the
      // 1-entry list blocks b3.example, and UrlFilter.keepAllowed drops
      // the listed quarter BEFORE the quota, the gate, the dedup state,
      // and every observer — a stateless broadcast anti-probe, so it
      // composes into each streaming query like the boilerplate stage.
      // Because the blocked domain is exactly the doc_id % 4 == 3 slice
      // and the observers' source column is s{doc_id % 4}, "listed docs
      // never reach any observer" is checkable from the final state:
      // the DataCard must hold ZERO s3 docs and the packed shards zero
      // doc_id % 4 == 3 rows (printed after each run).
      val blockOn = sys.env.get("SPARK_GRAFT_UB_BLOCK").contains("1")
      val src =
        if (blockOn) {
          val bl = Seq("b3.example").toDF("domain")
          graft.operators.UrlFilter.keepAllowed(
              src0.withColumn("domain",
                concat(lit("b"), pmod(col("doc_id"), lit(4)), lit(".example"))),
              "domain", bl)
            .drop("domain")
        } else src0
      if (blockOn && batchSize == 2500)
        println("[composed] blocklist = 1 domain (b3.example) fronting every query; " +
          "drops the doc_id % 4 == 3 quarter")
      // SPARK_GRAFT_UB_QUOTA=1 chains the per-domain admission quota IN
      // FRONT of the gate (the PipelineBench front-door order, streamed):
      // a planted hot-domain flood — HALF the stream under one domain —
      // admits its first `cap` docs and drops the rest, so every
      // downstream stage (gate, dedup state, observers) sees the
      // quota'd stream, not the flood. Each streaming query embeds its
      // own quota stage (the same recompute-per-query shape as the
      // gate); its cost shows up in each query's trigger split.
      val quotaOn = sys.env.get("SPARK_GRAFT_UB_QUOTA").contains("1")
      val quotaCap = 3000L
      val base =
        if (quotaOn) {
          val dom = when(col("doc_id") % 2 === 0, lit("hot"))
            .otherwise(concat(lit("d"), pmod(col("doc_id"), lit(7))))
          graft.streaming.StreamQuota.admitDocs(
              src.withColumn("domain", dom),
              "doc_id", "domain", "text", "embedding", cap = quotaCap)
            .toDF()
            .select(col("doc_id"), col("text"), col("embedding"))
        } else src
      if (quotaOn && batchSize == 2500)
        println(s"[composed] quota = per-domain cap $quotaCap, hot-domain flood (1/2 of stream)")
      // SPARK_GRAFT_UB_TMPLCAP=1 chains the per-LAYOUT-FAMILY admission
      // cap (q170's live twin, round 20) between the quota and the
      // boilerplate stage — front-door stage 6 in the PipelineBench
      // order: every doc carries a synthetic layout (HALF the stream is
      // ONE template family — the machine-generated flood; the other
      // half spreads over a 37-layout tail), the fingerprint is
      // computed scan-side, and admitDocsByFamily admits each family's
      // first `tmplCap` docs — the flood is capped BEFORE it reaches
      // the boiler/gate/dedup state. Checkable from the final state:
      // packed-shard rows from the big family (doc_id % 2 == 0) must
      // not exceed the cap (printed after each run).
      val tmplOn = sys.env.get("SPARK_GRAFT_UB_TMPLCAP").contains("1")
      val tmplCap = 3000L
      val capped =
        if (tmplOn) {
          val tail = pmod(col("doc_id"), lit(37)).cast("string")
          val html = when(pmod(col("doc_id"), lit(2)) === 0,
              lit("<html><body><h1>t</h1><p>x</p></body></html>"))
            .otherwise(concat(lit("<html><body><p>x</p><i"), tail,
              lit("></i"), tail, lit("></body></html>")))
          if (batchSize == 2500)
            println(s"[composed] template cap = per-family cap $tmplCap, " +
              "one-family flood (1/2 of stream) + 37-layout tail")
          graft.streaming.StreamTemplates.admitDocsByFamily(
              base.withColumn("raw", html),
              "doc_id", "raw", "text", "embedding", cap = tmplCap)
            .select("doc_id", "text", "embedding")
        } else base
      // SPARK_GRAFT_UB_BOILER=1 chains the FROZEN boilerplate profile
      // (q156's apply) in front of the gate: the profile is the frozen
      // artifact by contract (mined offline — here a fixed 3-word
      // profile per domain, so each ~20-token doc loses a few tokens
      // and the downstream gate keeps its population), applied per
      // trigger as a pure broadcast + binary-search projection — the
      // stateless front-door stage at its streaming position.
      val boilerOn = sys.env.get("SPARK_GRAFT_UB_BOILER").contains("1")
      val boiled =
        if (boilerOn) {
          val hotWords = Seq("stream", "corpus", "dedup")
          val profile = (0 until 4).flatMap(d => hotWords.map(w =>
              (s"s$d", graft.functions.TextFunctions.md5Hash60Local(w))))
            .toDF("domain", "fp")
          if (batchSize == 2500)
            println(s"[composed] boilerplate profile = ${hotWords.size} fps × 4 domains, frozen")
          graft.operators.Dedup.applyBoilerplateProfile(
              capped.withColumn("domain", concat(lit("s"), pmod(col("doc_id"), lit(4)))),
              profile, "doc_id", "domain", "text", delim = " ")
            .select(col("doc_id"), col("clean_text").alias("text"), col("embedding"))
        } else capped
      // SPARK_GRAFT_UB_C4=1 chains the C4 line cleaner (q165's
      // keepByC4) between the boilerplate stage and the gate — the
      // SALVAGE position: every doc is wrapped into a page carrying a
      // JavaScript-boilerplate line and a nav line that the cleaner
      // strips (the wrap is a pure function of the text, so exact-dup
      // copies stay byte-identical after cleaning and the dedup tiers
      // do the same work on the cleaned stream). The second KEPT line
      // varies with the TEXT's own first token, interleaved so no
      // 3-shingle is constant across distinct docs: a constant kept
      // tail would inflate shingle Jaccard between unrelated docs. The
      // transform itself (c4Clean) is defined before the frozen-LM /
      // classifier training above — see the comment there.
      val c4d =
        if (c4On) {
          if (batchSize == 2500)
            println("[composed] c4 = line cleaner (keepByC4, minKeptLines=2); " +
              "strips 2 planted boilerplate lines per page; LM + classifier " +
              "trained on cleaned text")
          c4Clean(boiled)
        } else boiled
      val gated =
        if (clsGate && clsFrozen)
          graft.operators.QualityClassifier.keepByScore(c4d, "text", clsW, dim = 256)
        else if (clsGate)
          c4d // gate REFUSED by the freeze decision: pass-through
        else
          graft.operators.QualityPrune.keepByGopher(
            c4d, "text", minTokens = 5L, minStopHits = 0L)
      val withSource = gated
        .withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(4))))

      val qUni = DedupIngest.startUnified(
        gated.select("doc_id", "text", "embedding"),
        "doc_id", "text", "embedding", sink, "uni", s"$root/ckpt_uni", trg,
        annIndexPath = Some(s"$root/index"),
        nLists = 8, trainSample = 2048, annNLists = 8, annM = 8, annCodes = 16,
        tierTimer = timer, lmPath = Some(lmDir), qualityCutoff = -3.0)
      val qCard = graft.streaming.DataCard.start(
        withSource, sink, "card", s"$root/ckpt_card", trg)
      val qDist = graft.streaming.DistStats.start(
        withSource, sink, "dist", s"$root/ckpt_dist", trg)
      val qFreq = graft.streaming.FreqSketch.start(
        gated.select(explode(
          graft.functions.TextFunctions.tokens(col("text"))).alias("w")),
        "w", sink, "freq", s"$root/ckpt_freq", trg)
      // live context-window assignments (StreamPack): the loader path
      // running beside ingest — packed-shard rows append as docs arrive
      val qPack = graft.streaming.StreamPack.assignments(
        withSource.select(
          col("doc_id"), col("source"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").alias("n_tokens")),
        "doc_id", "source", "n_tokens", budget = 2048L, shards = 8)
        .writeStream
        .format("parquet")
        .option("path", s"$root/packed")
        .option("checkpointLocation", s"$root/ckpt_pack")
        .outputMode("append")
        .trigger(trg)
        .start()
      val queries = qNames.zip(Seq(qUni, qCard, qDist, qFreq, qPack))
      val perQ = mutable.Map.empty[String, Double].withDefaultValue(0.0)

      // warmup (bootstrap trains quantizer/ANN; observers create state)
      input.addData((0 until 1000).map(doc))
      queries.foreach(_._2.processAllAvailable())
      agg.clear(); perQ.clear()

      val t0 = System.nanoTime()
      var b = 0
      while (b < nBatches) {
        input.addData((0 until batchSize).map(i => doc(1000 + b * batchSize + i)))
        queries.foreach { case (n, q) =>
          val s = System.nanoTime()
          q.processAllAvailable()
          perQ(n) += (System.nanoTime() - s) / 1e9
        }
        b += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      queries.foreach(_._2.stop())
      val kept = graft.streaming.DataCard
        .card(spark, sink, "card", 256)
        .agg(org.apache.spark.sql.functions.sum("n_docs")).head().getLong(0)
      val rate = nBatches.toLong * batchSize / sec
      val keptFrac = kept.toDouble / (nBatches.toLong * batchSize + 1000)
      println(f"$batchSize%8d $nBatches%7d $rate%8.0f $keptFrac%6.2f  " +
        (tiers.map(t => f"${agg(t) / nBatches}%8.2f") ++
          qNames.drop(1).map(n => f"${perQ(n) / nBatches}%8.2f")).mkString(" "))
      if (blockOn) {
        // leak check: listed-domain docs must be absent from EVERY
        // downstream state — the card's per-source counts (s3 = the
        // blocked quarter) and the packed-shard parquet (doc ids)
        val cardLeak = graft.streaming.DataCard.card(spark, sink, "card", 256)
          .filter(col("source") === "s3")
          .agg(coalesce(org.apache.spark.sql.functions.sum("n_docs"), lit(0L)))
          .head().getLong(0)
        val packLeak = spark.read.parquet(s"$root/packed")
          .filter(pmod(col("doc_id"), lit(4)) === 3).count()
        println(s"[composed] blocklist leak check: card s3 docs = $cardLeak, " +
          s"packed doc_id%4==3 rows = $packLeak (contract: 0, 0)")
      }
      if (tmplOn) {
        // cap check: the one-family flood (doc_id % 2 == 0) must not
        // exceed the per-family cap in any downstream state — the
        // packed-shard parquet carries every doc the front door let
        // through to the loader path
        val bigFam = spark.read.parquet(s"$root/packed")
          .filter(pmod(col("doc_id"), lit(2)) === 0).count()
        println(s"[composed] template cap check: packed big-family rows = " +
          s"$bigFam (contract: <= $tmplCap)")
      }
    }
  }
}
