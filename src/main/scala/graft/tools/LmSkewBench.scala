package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-gram skew measurement for the LM family (q101 perplexity, q112
  * PMI) on a NON-disjoint scaled corpus — the measurement
  * `ScaleBench`'s derived corpus cannot provide: its token prefixing
  * makes per-copy vocabularies DISJOINT, so no key ever gets hotter as
  * copies grow. Here every copy keeps the SAME text (ids offset only),
  * so the Zipf head's absolute heat grows `copies`×, which is exactly
  * the 100 TB question: does any reducer on the gram-keyed paths take
  * pathologically longer than the median as the head heats up?
  *
  * Per query it reports, for every shuffle stage with enough tasks to
  * judge, the worst task-level imbalance two ways: shuffle-read RECORDS
  * (the scale-honest signal — wall time on a small fixture is mostly
  * constant overhead) and task DURATION. The skew gate in VERDICT/
  * BASELINE doctrine is reducer time > 4× the median.
  *
  * Run: `sbt "runMain graft.tools.LmSkewBench"` (env: SPARK_GRAFT_SF_DIR
  * base fixture, default /root/testdata/sf0.1; SPARK_GRAFT_SCALE
  * copies, default 10; SPARK_GRAFT_SCALE_OUT corpus dir, default
  * /tmp/graft_lmskew10).
  */
object LmSkewBench {

  private final class SpreadListener extends SparkListener {
    val tasks = scala.collection.concurrent.TrieMap[
      Int, scala.collection.mutable.ArrayBuffer[(Long, Long)]]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      if (te.taskInfo != null && te.taskInfo.successful) {
        val recs = Option(te.taskMetrics)
          .map(_.shuffleReadMetrics.recordsRead).getOrElse(0L)
        tasks.getOrElseUpdate(te.stageId,
          scala.collection.mutable.ArrayBuffer.empty) +=
          ((te.taskInfo.duration, recs))
      }
  }

  private def median(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s(s.length / 2)
  }

  private def report(label: String, l: SpreadListener): Unit = {
    val rows = l.tasks.toSeq
      .map { case (sid, ts) => (sid, ts.toSeq) }
      .filter { case (_, ts) => ts.length >= 8 && ts.map(_._2).sum > 0 }
      .map { case (sid, ts) =>
        val durs = ts.map(_._1)
        val recs = ts.map(_._2)
        val medR = math.max(1L, median(recs))
        val medD = math.max(1L, median(durs))
        (sid, ts.length, median(recs), recs.max, recs.max.toDouble / medR,
          median(durs), durs.max, durs.max.toDouble / medD)
      }
      .sortBy(-_._5)
    println(f"[lmskew] $label — top shuffle stages by record imbalance:")
    println(f"[lmskew]   ${"stage"}%6s ${"tasks"}%5s ${"medRec"}%9s ${"maxRec"}%9s ${"recSkew"}%8s ${"medMs"}%7s ${"maxMs"}%7s ${"timeSkew"}%8s")
    rows.take(5).foreach { case (sid, n, mr, xr, rs, md, xd, ds) =>
      println(f"[lmskew]   $sid%6d $n%5d $mr%9d $xr%9d $rs%8.2f $md%7d $xd%7d $ds%8.2f")
    }
    val worstTime = if (rows.isEmpty) 0.0 else rows.map(_._8).max
    val worstRec = if (rows.isEmpty) 0.0 else rows.map(_._5).max
    println(f"[lmskew] $label worst: recSkew=$worstRec%.2f timeSkew=$worstTime%.2f (gate: time > 4x)")
  }

  /** Same-text copies: doc ids offset per copy, text untouched — true
    * duplication, cross-copy hot grams. When `zipf`, additionally
    * collapse every token whose md5 is even onto the single literal
    * `zipfhot` — the fixture vocabulary is 31 near-UNIFORM words
    * (measured: each ≈ 3.4% of mass), so same-text duplication alone
    * scales every key equally and cannot create a head; the collapse
    * deterministically concentrates ≈ half the token mass on one
    * unigram (and ≈ a quarter of all bigram occurrences on
    * `(zipfhot, zipfhot)`), which is a HARSHER head than natural text
    * ("the" ≈ 5–7%) — an upper-bound stress, derived from the fixture,
    * not invented data.
    */
  private def generate(
      spark: SparkSession, baseDir: String, outDir: String, copies: Int,
      zipf: Boolean): Unit = {
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    val cols = docs.columns
    docs
      .select(col("*"), explode(lit((0 until copies).toArray)).as("cp"))
      .select(cols.map {
        case "doc_id" =>
          (col("doc_id").cast("long") + col("cp").cast("long") * 1000000000L).as("doc_id")
        case "text" if zipf =>
          array_join(
            transform(split(col("text"), " "),
              w => when(pmod(graft.functions.TextFunctions.md5Hash60(w), lit(2L)) === 0L,
                lit("zipfhot")).otherwise(w)),
            " ").as("text")
        case other => col(other)
      }.toSeq: _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "/tmp/graft_lmskew10")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // keep all 32 reducers materialized: AQE's small-partition
      // coalescing would fold the fixture-scale shuffles into a couple
      // of tasks and hide exactly the per-reducer imbalance this
      // harness exists to measure (production keeps coalescing ON;
      // record-level imbalance is partition-assignment math and is the
      // same either way)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force the 100 TB JOIN SHAPE: at corpus scale the LM count
      // tables are billions of rows and the scoring joins are plain
      // gram-keyed shuffle joins (the scaladoc's "the LM is NEVER
      // broadcast" doctrine) — at fixture scale AQE would broadcast the
      // tiny tables and no gram key would ever enter a partitioning,
      // hiding exactly the skew under test. AQE's skew-join splitting
      // stays ON (it is part of the production mitigation being
      // measured).
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!new java.io.File(s"$outDir/documents.parquet").exists()) {
      println(s"[lmskew] generating same-text ${copies}x corpus at $outDir")
      generate(spark, baseDir, outDir, copies, zipf = false)
    }
    val zipfDir = s"${outDir}_zipf"
    if (!new java.io.File(s"$zipfDir/documents.parquet").exists()) {
      println(s"[lmskew] generating zipf-collapsed ${copies}x corpus at $zipfDir")
      generate(spark, baseDir, zipfDir, copies, zipf = true)
    }
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    val zdocs = spark.read.parquet(s"$zipfDir/documents.parquet")

    // AQE's skew-join split is the in-box mitigation, but its byte
    // thresholds (256 MB skewed-partition floor) never trigger at
    // fixture scale — the "aqeSkew" variants scale the thresholds down
    // to fixture bytes so the bench measures what a 100 TB run's AQE
    // would actually do to the hot partition.
    val aqeScaledDown = Map(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")

    val queries: Seq[(String, Map[String, String], () => DataFrame)] = Seq(
      ("q101_perplexity(10x-dup)", Map.empty[String, String], () =>
        graft.operators.NgramLm.perplexity(docs, "doc_id", "text")),
      ("q112_pmi(10x-dup)", Map.empty[String, String], () =>
        graft.operators.NgramLm.pmiCollocations(docs, "doc_id", "text")),
      ("q101_perplexity(10x-zipf)", Map.empty[String, String], () =>
        graft.operators.NgramLm.perplexity(zdocs, "doc_id", "text")),
      ("q112_pmi(10x-zipf)", Map.empty[String, String], () =>
        graft.operators.NgramLm.pmiCollocations(zdocs, "doc_id", "text")),
      ("q101_perplexity(10x-zipf,aqeSkew)", aqeScaledDown, () =>
        graft.operators.NgramLm.perplexity(zdocs, "doc_id", "text")),
      ("q112_pmi(10x-zipf,aqeSkew)", aqeScaledDown, () =>
        graft.operators.NgramLm.pmiCollocations(zdocs, "doc_id", "text")),
      ("q101_perplexity(10x-zipf,hot64)", Map.empty[String, String], () =>
        graft.operators.NgramLm.perplexity(zdocs, "doc_id", "text", hotKeys = 64)),
      ("q112_pmi(10x-zipf,hot64)", Map.empty[String, String], () =>
        graft.operators.NgramLm.pmiCollocations(zdocs, "doc_id", "text", hotKeys = 64)),
      // hotKeys = -1: the operator measures the head itself
      // (autoHotKeys) — must land at K >= 64 on the zipf corpus and
      // resolve to 0 (plain plan) on the near-uniform dup corpus
      ("q101_perplexity(10x-zipf,hotAuto)", Map.empty[String, String], () =>
        graft.operators.NgramLm.perplexity(zdocs, "doc_id", "text", hotKeys = -1)),
      ("q112_pmi(10x-zipf,hotAuto)", Map.empty[String, String], () =>
        graft.operators.NgramLm.pmiCollocations(zdocs, "doc_id", "text", hotKeys = -1)),
      ("q101_perplexity(10x-dup,hotAuto)", Map.empty[String, String], () =>
        graft.operators.NgramLm.perplexity(docs, "doc_id", "text", hotKeys = -1)))

    // the K each corpus resolves to under hotKeys = -1 (the same LM
    // split q101's perplexity trains on) — the BASELINE table's auto row
    Seq("10x-dup" -> docs, "10x-zipf" -> zdocs).foreach { case (tag, d) =>
      val lm = graft.operators.NgramLm.train(
        d.filter(col("doc_id") % 10 < 8), "doc_id", "text")
      println(s"[lmskew] autoHotKeys($tag) = ${graft.operators.NgramLm.autoHotKeys(lm)}")
    }

    queries.foreach { case (label, confs, fn) =>
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // warm once (JIT + file listing), then measure with a listener
      fn().queryExecution.toRdd.count()
      val l = new SpreadListener
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      val n = fn().queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(l)
      confs.keys.foreach(spark.conf.unset)
      println(f"[lmskew] $label rows=$n t=$secs%.2fs")
      report(label, l)
    }
    spark.stop()
  }
}
