package graft.streaming

import graft.SparkTestBase
import graft.functions.TextFunctions
import graft.functions.expressions.KmvSketchAgg
import graft.operators.TrainingPrep
import graft.sinks.{InMemoryKVSink, ParquetKVSink}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The tier's contract: the additive tables are batching-invariant
  * and match the one-pass batch `dataCard` exactly; the fingerprint
  * sketch equals the one-pass KMV over everything ingested (union
  * associativity); retirement subtracts the additive tables exactly
  * and leaves the sketch (the documented KMV trade) until `rebuildFp`.
  */
class DataCardSpec extends SparkTestBase {
  import spark.implicits._

  private val trigger = Trigger.ProcessingTime("50 milliseconds")
  private val k = 16

  private def doc(i: Int): (Long, String, String) = {
    val src = s"s${i % 3}"
    val txt =
      if (i % 11 == 5) null                             // null text rides along
      else if (i % 7 == 0) "the cat sat on the mat"     // exact dups across i
      else if (i % 3 == 1) s"le chat ${i} est sur le tapis et il dort bien"
      else s"the dog ${i} ran far and fast with joy"
    (i.toLong, txt, src)
  }

  test("streamed card equals the batch dataCard on additive fields; sketch equals one-pass KMV") {
    val all = (0 until 90).map(doc)
    val batches = Seq(all.slice(0, 40), all.slice(40, 55), all.slice(55, 90))

    val input = MemoryStream[(Long, String, String)](spark)
    val sink = new ParquetKVSink(Files.createTempDirectory("graft-card").toString)
    val ckpt = Files.createTempDirectory("graft-card-ckpt").toString
    val q = DataCard.start(
      input.toDF().toDF("doc_id", "text", "source"), sink, "card", ckpt,
      trigger, "source", "text", k)
    batches.foreach { bt => input.addData(bt: _*); q.processAllAvailable() }
    q.stop()

    val live = DataCard.card(spark, sink, "card", k)
      .select("source", "n_docs", "n_texted", "n_tokens", "top_lang",
        "top_lang_docs", "sum_ent_micro", "mean_ent")
      .as[(String, Long, Long, Long, String, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    val batch = TrainingPrep.dataCard(all.toDF("doc_id", "text", "source"), "text", "source")
      .select("source", "n_docs", "n_texted", "n_tokens", "top_lang",
        "top_lang_docs", "sum_ent_micro", "mean_ent")
      .as[(String, Long, Long, Long, String, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(live.keySet === batch.keySet)
    live.keySet.foreach(s => assert(live(s) === batch(s), s"source $s diverged"))

    // the sketch state IS the one-pass KMV over everything ingested
    // (select past the in-state ack columns)
    val liveMinima = sink.read(spark, "card_fp", DataCard.fpStateSchema)
      .select("source", "h").as[(String, Long)].collect().toSet
    val onePass = all.toDF("doc_id", "text", "source")
      .select(col("source"),
        graft.functions.expressions.CorpusStatsExpr.corpusStats(col("text"))
          .getField("fp").alias("fp"))
      .filter(col("fp").isNotNull)
      .groupBy("source")
      .agg(KmvSketchAgg.kmvSketch(TextFunctions.md5Hash60(col("fp")), k).alias("kmv"))
      .select(col("source"), explode(col("kmv")).alias("h"))
      .as[(String, Long)].collect().toSet
    assert(liveMinima === onePass)

    // dup_frac_est is sensible: s0 carries the planted exact dups
    val est = DataCard.card(spark, sink, "card", k)
      .select("source", "dup_frac_est").as[(String, Double)].collect().toMap
    assert(est.values.forall(v => v >= 0.0 && v < 1.0))
    assert(est("s0") > 0.0, s"planted dups invisible: $est")
  }

  test("replay is a no-op; retire subtracts additive tables exactly and rebuildFp re-honests the sketch") {
    val sink = new InMemoryKVSink
    val rows = (0 until 60).map(doc).toDF("doc_id", "text", "source")
    DataCard.applyBatch(rows, 0L, "source", "text", k, sink, "card")
    val first = DataCard.card(spark, sink, "card", k).collect().map(_.toSeq).toSet
    DataCard.applyBatch(rows, 0L, "source", "text", k, sink, "card") // acked replay
    assert(DataCard.card(spark, sink, "card", k).collect().map(_.toSeq).toSet === first)

    // retire 20 docs; additive fields must equal a fresh card over survivors
    val (removed, kept) = (0 until 60).map(doc).partition(_._1 < 20)
    DataCard.retire(removed.toDF("doc_id", "text", "source"),
      "source", "text", sink, "card", retireId = 1L, idCol = Some("doc_id"))
    // replayed retire: ack makes it a no-op
    DataCard.retire(removed.toDF("doc_id", "text", "source"),
      "source", "text", sink, "card", retireId = 1L, idCol = Some("doc_id"))
    val after = DataCard.card(spark, sink, "card", k)
      .select("source", "n_docs", "n_texted", "n_tokens", "top_lang",
        "top_lang_docs", "sum_ent_micro")
      .as[(String, Long, Long, Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    val fresh = TrainingPrep.dataCard(kept.toDF("doc_id", "text", "source"), "text", "source")
      .select("source", "n_docs", "n_texted", "n_tokens", "top_lang",
        "top_lang_docs", "sum_ent_micro")
      .as[(String, Long, Long, Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(after === fresh, s"retired additive state diverged:\n$after\n$fresh")

    // the staleness pair makes the KMV trade visible: retired texted
    // docs are counted, and the share is strictly positive wherever a
    // texted doc was removed
    val stale = DataCard.card(spark, sink, "card", k)
      .select("source", "n_retired_texted", "fp_staleness")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val removedTexted = removed.filter(_._2 != null).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    removedTexted.foreach { case (src, n) =>
      assert(stale(src)._1 === n, s"retired-texted counter wrong for $src")
      assert(stale(src)._2 > 0.0, s"fp_staleness not raised for $src")
    }

    // no sidecar ack tables: the acks ride INSIDE the state tables,
    // atomic with each swap-write (the double-subtract window is gone
    // by construction, not by ordering)
    assert(!sink.tableNames.exists(t => t.contains("__meta") || t.contains("__retire")),
      s"unexpected sidecar ack tables: ${sink.tableNames}")

    // the sketch was NOT retired (documented) — rebuild re-honests it
    DataCard.rebuildFp(kept.toDF("doc_id", "text", "source"),
      "source", "text", sink, "card", k)
    val rebuilt = sink.read(spark, "card_fp", DataCard.fpStateSchema)
      .select("source", "h").as[(String, Long)].collect().toSet
    val onePassKept = kept.toDF("doc_id", "text", "source")
      .select(col("source"),
        graft.functions.expressions.CorpusStatsExpr.corpusStats(col("text"))
          .getField("fp").alias("fp"))
      .filter(col("fp").isNotNull)
      .groupBy("source")
      .agg(KmvSketchAgg.kmvSketch(TextFunctions.md5Hash60(col("fp")), k).alias("kmv"))
      .select(col("source"), explode(col("kmv")).alias("h"))
      .as[(String, Long)].collect().toSet
    assert(rebuilt === onePassKept)

    // rebuild resets the staleness counter — the card reads honest again
    val postRebuild = DataCard.card(spark, sink, "card", k)
      .select("source", "n_retired_texted", "fp_staleness")
      .as[(String, Long, Double)].collect()
    postRebuild.foreach { case (src, n, s) =>
      assert(n === 0L && s === 0.0, s"staleness not reset for $src: ($n, $s)")
    }
  }

  test("crash+takedown interleaving: a retire that zeroes EVERYTHING keeps the acks, " +
      "so a crash-replayed ingest batch does not re-add retired docs") {
    val sink = new InMemoryKVSink
    val rows = (0 until 30).map(doc).toDF("doc_id", "text", "source")
    DataCard.applyBatch(rows, 0L, "source", "text", k, sink, "card")
    // takedown of the WHOLE corpus: every additive row subtracts to zero
    DataCard.retire(rows, "source", "text", sink, "card",
      retireId = 1L, idCol = Some("doc_id"))
    val zeroed = DataCard.card(spark, sink, "card", k)
      .select("source", "n_docs", "n_texted", "dup_frac_est", "top_lang_share", "mean_ent")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(zeroed.nonEmpty, "zero rows must survive as ack carriers")
    zeroed.foreach { case (src, nd, nt, dfe, tls, me) =>
      assert(nd === 0L && nt === 0L, s"$src not fully retired: ($nd, $nt)")
      assert(!dfe.isNaN && !tls.isNaN && !me.isNaN, s"$src card ratio NaN on a zero row")
    }
    // the regression: a crash-replayed ingest of the ALREADY-COUNTED
    // batch — before round 18 the empty table had lost last_batch_id
    // and this re-added 30 retired docs
    DataCard.applyBatch(rows, 0L, "source", "text", k, sink, "card")
    val replayed = DataCard.card(spark, sink, "card", k)
      .agg(sum("n_docs")).as[Long].head()
    assert(replayed === 0L, s"replayed batch re-added $replayed retired docs")
    // and a genuinely NEW batch merges onto the zero rows normally
    val fresh = (100 until 110).map(doc).toDF("doc_id", "text", "source")
    DataCard.applyBatch(fresh, 1L, "source", "text", k, sink, "card")
    val after = DataCard.card(spark, sink, "card", k)
      .agg(sum("n_docs")).as[Long].head()
    assert(after === 10L, s"new batch after full retirement miscounted: $after")
  }

  test("retire of never-ingested docs floors at zero — no persistent negative counters") {
    val sink = new InMemoryKVSink
    val rows = (0 until 10).map(doc).toDF("doc_id", "text", "source")
    DataCard.applyBatch(rows, 0L, "source", "text", k, sink, "card")
    // a BAD retire input: 30 docs when only 10 were ever counted (a
    // mismatched slice) — before round 19 this stored n_docs = -20 and
    // the card's n_docs > 0 guards masked it as 0.0 ratios forever
    val tooMany = (0 until 30).map(doc).toDF("doc_id", "text", "source")
    DataCard.retire(tooMany, "source", "text", sink, "card",
      retireId = 1L, idCol = Some("doc_id"))
    val st = sink.read(spark, "card_add", DataCard.addStateSchema)
      .select("n_docs", "n_texted", "n_tokens", "sum_ent_micro")
      .as[(Long, Long, Long, Long)].collect()
    assert(st.nonEmpty, "zero rows must survive as ack carriers")
    st.foreach { case (nd, nt, tk, se) =>
      assert(nd >= 0L && nt >= 0L && tk >= 0L && se >= 0L,
        s"negative counter stored: ($nd, $nt, $tk, $se)")
    }
  }
}
