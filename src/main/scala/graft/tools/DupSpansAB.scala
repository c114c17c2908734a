package graft.tools

import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch experiment main (not part of the library surface): round-9
  * parity + A/B timing for the duplicate-span rework — the round-8
  * explode-per-covered-position plan with the closure shingle UDF
  * (reconstructed inline here) vs the shipped
  * [[Dedup.duplicateSpans]] (native `shingle_hash60s` scan + doc-local
  * `cut_covered_spans` interval union). Asserts the FULL result sets are
  * identical at the q81 configuration before printing timings.
  * Run: `sbt "runMain graft.tools.DupSpansAB /root/testdata/sf0.01"`.
  */
object DupSpansAB {

  /** Byte-for-byte the round-8 plan (Dedup.scala @ 585f7ac). */
  def legacyDuplicateSpans(
      docs: DataFrame, idCol: String, textCol: String, k: Int, minDocs: Int): DataFrame = {
    val hashK = udf { (text: String) =>
      val sh = shinglesLocal(tokensLocal(text), k)
      val out = new Array[Long](sh.length)
      var i = 0
      while (i < sh.length) { out(i) = md5Hash60Local(sh(i)); i += 1 }
      out
    }
    val toks = docs
      .select(col(idCol).alias("doc_id"), tokens(col(textCol)).alias("t"))
      .localCheckpoint(true)
    val grams = toks.select(
      col("doc_id"),
      posexplode(hashK(concat_ws(" ", col("t")))).as(Seq("pos", "h")))
    val dup = grams
      .select("doc_id", "h")
      .distinct()
      .groupBy("h")
      .agg(count(lit(1)).alias("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
    val covered = grams
      .join(dup, Seq("h"))
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (k - 1))).alias("p"))
      .distinct()
    val kept = toks
      .select(col("doc_id"), posexplode(col("t")).as(Seq("p", "tok")))
      .join(covered, Seq("doc_id", "p"), "left_anti")
    val rebuilt = kept
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("p"), col("tok")))).alias("a"))
      .select(
        col("doc_id"),
        concat_ws(" ", col("a.tok")).alias("clean_text"),
        size(col("a")).cast("long").alias("n_kept"))
    toks
      .select(col("doc_id"), size(col("t")).cast("long").alias("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("clean_text"), lit("")).alias("clean_text"),
        coalesce(col("n_kept"), lit(0L)).alias("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).alias("n_removed"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, dir).select("doc_id", "text").localCheckpoint(true)

    // parity first: identical full result sets at the q81 configuration
    val legacy = legacyDuplicateSpans(docs, "doc_id", "text", k = 4, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val current = Dedup.duplicateSpans(docs, "doc_id", "text", k = 4, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    require(legacy.length == current.length,
      s"row count diverged: legacy=${legacy.length} current=${current.length}")
    legacy.zip(current).foreach { case (l, c) =>
      require(l == c, s"row diverged:\n  legacy : $l\n  current: $c")
    }
    println(s"parity OK: ${legacy.length} rows identical at $dir (k=4, minDocs=2)")

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val rounds = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); val n = f; val s = (System.nanoTime() - t0) / 1e9
        (n, s)
      }
      val best = rounds.map(_._2).min
      println(f"$label: rows=${rounds.head._1} best=$best%.3f " +
        rounds.map(r => f"${r._2}%.2f").mkString("all [", ", ", " s]"))
    }

    time("legacy (UDF scan + explode+distinct)") {
      legacyDuplicateSpans(docs, "doc_id", "text", 4, 2).queryExecution.toRdd.count()
    }
    time("current (native scan + span merge) ") {
      Dedup.duplicateSpans(docs, "doc_id", "text", 4, 2).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
