package graft.tools

import graft.sinks.ParquetKVSink
import graft.operators.Similarity
import graft.streaming.SearchIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retirement-cost measurement for the persisted index artifacts —
  * the evidence behind the round-16 tombstone redesign: per-artifact
  * retire latency vs TAKEDOWN size and vs ARTIFACT size, tombstone
  * mode against the eager `compactNow` full-rewrite (the pre-round-16
  * behavior, kept as the erasure-deadline path).
  *
  * The scale claim under test: a tombstone retire's cost tracks the
  * takedown size (id-list write + vocabulary-bounded negative merges)
  * and stays FLAT as the artifact grows, while the full rewrite's cost
  * tracks the artifact (every retire re-writes all postings / all PQ
  * codes). The deferred fold still pays the rewrite — once, on the
  * maintenance cadence, amortized over every takedown since the last
  * one — so the bench also times the fold and the masked query path.
  *
  * Corpus: the base fixtures plus [[ScaleBench.generate]]'s derived
  * `copies`× corpus (same derivation as every other scaling harness —
  * no invented data). Artifacts are built fresh per scale; the two
  * retire modes use DISJOINT takedown id sets on the same artifact
  * (tombstone first, so the later `compactNow` fold also absorbs the
  * earlier tombstones — noted, negligible, and realistic: that IS the
  * maintenance cadence).
  *
  * Run: `sbt "runMain graft.tools.RefreshBench"` (env:
  * SPARK_GRAFT_SF_DIR base fixture, default /root/testdata/sf0.1;
  * SPARK_GRAFT_SCALE_OUT scaled-corpus dir, default /tmp/graft_scale10;
  * SPARK_GRAFT_SCALE copies, default 10).
  */
object RefreshBench {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "/tmp/graft_scale10")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!new java.io.File(s"$outDir/documents.parquet").exists()) {
      println(s"[refresh] generating ${copies}x corpus at $outDir")
      ScaleBench.generate(spark, baseDir, outDir, copies)
    }

    val work = java.nio.file.Files.createTempDirectory("graft-refresh-bench").toString
    println("[refresh] artifact | scale | takedown | mode | seconds")

    Seq("1x" -> baseDir, s"${copies}x" -> outDir).foreach { case (tag, dir) =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")).localCheckpoint(true)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint(true)
      val nDocs = docs.count()
      val nVec = emb.count()

      // ---- search postings artifact ----
      val sink = new ParquetKVSink(s"$work/sink-$tag")
      val idx = s"$work/postings-$tag"
      val (_, tBuild) = timed {
        SearchIndex.applyBatch(docs, 0L, "doc_id", "text", idx, sink, s"t$tag",
          buckets = 16)
      }
      println(f"[refresh] search  | $tag%4s ($nDocs%7d docs) | build      | -          | $tBuild%8.2f")
      // live query terms sampled from the corpus itself (the scaled
      // corpus prefixes tokens per copy, so hardcoded terms could miss)
      val terms = docs.head().getString(1).split(" ").distinct.take(3).toSeq
      // disjoint takedown slices via an id cursor (base ids are dense
      // 0..4999; start past the sampled query rows)
      var cursor = 100L
      def docSlice(n: Int): DataFrame = {
        val lo = cursor; cursor += n
        docs.filter(col("doc_id") >= lo && col("doc_id") < lo + n)
          .localCheckpoint(true)
      }
      var retireId = 0L
      Seq(10, 1000).foreach { n =>
        val tomb = docSlice(n)
        val (_, tTomb) = timed {
          SearchIndex.retire(tomb, "doc_id", "text", idx, sink, s"t$tag", retireId)
        }
        retireId += 1
        val (_, tQuery) = timed {
          SearchIndex.search(spark, idx, sink, s"t$tag", terms)
            .queryExecution.toRdd.count()
        }
        val eager = docSlice(n)
        val (_, tEager) = timed {
          SearchIndex.retire(eager, "doc_id", "text", idx, sink, s"t$tag", retireId,
            compactNow = true)
        }
        retireId += 1
        println(f"[refresh] search  | $tag%4s ($nDocs%7d docs) | ${tomb.count()}%5d docs | tombstone  | $tTomb%8.2f (masked query $tQuery%.2f)")
        println(f"[refresh] search  | $tag%4s ($nDocs%7d docs) | ${eager.count()}%5d docs | compactNow | $tEager%8.2f")
      }

      // ---- IVF-PQ code artifact ----
      val ann = s"$work/ivfpq-$tag"
      val (_, tAnnBuild) = timed {
        Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", ann,
          nLists = 16, m = 16, nCodes = 64, trainSample = 2048)
      }
      println(f"[refresh] ivfpq   | $tag%4s ($nVec%7d vecs) | build      | -          | $tAnnBuild%8.2f")
      val q = emb.filter(col("vec_id") === 1).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble)
      // base vec ids are dense 0..1999: two sizes x two modes must fit
      // disjointly, so the bigger ANN slice is 500
      var vecCursor = 100L
      def vecSlice(n: Int): DataFrame = {
        val lo = vecCursor; vecCursor += n
        emb.select("vec_id")
          .filter(col("vec_id") >= lo && col("vec_id") < lo + n)
          .localCheckpoint(true)
      }
      Seq(10, 500).foreach { n =>
        val tomb = vecSlice(n)
        val (_, tTomb) = timed {
          Similarity.removeFromIvfPqIndex(spark, ann, tomb, "vec_id")
        }
        val (_, tQuery) = timed {
          Similarity.ivfPqTopKFromIndex(spark, ann, emb, "vec_id", "embedding",
            q, k = 10, nProbe = 4, rerank = 100)
            .queryExecution.toRdd.count()
        }
        val eager = vecSlice(n)
        val (_, tEager) = timed {
          Similarity.removeFromIvfPqIndex(spark, ann, eager, "vec_id",
            compactNow = true)
        }
        println(f"[refresh] ivfpq   | $tag%4s ($nVec%7d vecs) | ${tomb.count()}%5d vecs | tombstone  | $tTomb%8.2f (masked query $tQuery%.2f)")
        println(f"[refresh] ivfpq   | $tag%4s ($nVec%7d vecs) | ${eager.count()}%5d vecs | compactNow | $tEager%8.2f")
      }

      // ---- the deferred fold the tombstone mode amortizes into ----
      val moreTombs = docSlice(1000)
      SearchIndex.retire(moreTombs, "doc_id", "text", idx, sink, s"t$tag", retireId)
      val (_, tFold) = timed { SearchIndex.compactPostings(spark, idx) }
      println(f"[refresh] search  | $tag%4s ($nDocs%7d docs) | fold       | compaction | $tFold%8.2f")
      val (_, tAnnFold) = timed { Similarity.compactIvfPqIndex(spark, ann) }
      println(f"[refresh] ivfpq   | $tag%4s ($nVec%7d vecs) | fold       | compaction | $tAnnFold%8.2f")
    }
    spark.stop()
  }
}
