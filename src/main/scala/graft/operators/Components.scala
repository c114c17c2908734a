package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the clustering
  * step of every near-duplicate pipeline: LSH/Jaccard emits PAIRS, but
  * deduplication needs CLUSTERS (keep one canonical doc per component,
  * drop the rest). Reference analogue: none (the reference dedups
  * nothing); this is a training-data-pipeline extension per SURVEY.md §7.8.
  *
  * Algorithm: alternating min-label propagation and pointer-jumping
  * (path compression), the classic two-phase CC recipe (cf. Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14):
  *
  *   1. propagate: l(v) ← min(l(v), min over neighbors u of l(u))
  *   2. compress:  l(v) ← l(l(v))
  *
  * Propagation alone needs O(diameter) rounds (a path graph of length d
  * takes d rounds); the compression join halves the pointer depth each
  * round, so convergence is O(log d) rounds — at 100 TB that is the
  * difference between 40 shuffles and 6.
  *
  * r21 rendering (guide §1.2 step 1): the loop runs on pair RDDs with a
  * FIXED HashPartitioner, not on DataFrames. The r20 DataFrame loop
  * paid, per round, a fresh Catalyst plan + an eager localCheckpoint of
  * the propagated frame + another of the compressed frame + a separate
  * convergence count — ~10 driver-blocking jobs/round once AQE splits
  * each materialization into stage-jobs (measured: q77's 10-round CC
  * accounted for ~100 of the query's 123 jobs, with per-stage work of
  * 20-80 ms). The RDD loop co-partitions edges and labels once, so the
  * neighborhood join is NARROW (no exchange); each round shuffles only
  * the (vertex, candidate-label) messages and the pointer-jump
  * redistribution, and runs exactly ONE driver job (the convergence
  * count, with the changed-counter riding an accumulator on the same
  * pass). Labels are canonical (min reachable id), so the output is a
  * pure graph property — algorithm-step changes cannot alter it
  * (`ComponentsSpec` pins it against a local union-find oracle).
  */
object Components {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** `(id, cluster_id)` for every vertex, where `cluster_id` is the
    * minimum vertex id reachable in the undirected graph
    * `vertices ∪ edges` — singletons map to themselves.
    *
    * Edge/vertex ids must be integral (every dedup caller's ids are
    * longs already); edges with a NULL endpoint are inert, exactly as
    * in the r20 DataFrame form (a NULL key never equi-joins).
    *
    * @param edges    two-column frame of undirected edges (each pair
    *                 listed once in either orientation)
    * @param vertices one-column universe of vertex ids (vertices with no
    *                 edges still appear in the output)
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      vertices: DataFrame,
      idCol: String,
      maxIterations: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    Seq(edges.schema(srcCol), edges.schema(dstCol), vertices.schema(idCol))
      .foreach { f =>
        val ok = f.dataType match {
          case org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.LongType => true
          case _ => false
        }
        require(ok,
          s"connectedComponents needs integral ids, got ${f.name}: ${f.dataType.catalogString}")
      }

    // both orientations — the (possibly expensive: a whole dedup
    // pipeline) edge lineage executes exactly once, into this persist
    val eRdd = edges
      .select(col(srcCol).cast("long").alias("s"), col(dstCol).cast("long").alias("d"))
      .queryExecution.toRdd
      .flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) Iterator.empty
        else {
          val s = r.getLong(0)
          val d = r.getLong(1)
          Iterator((s, d), (d, s))
        }
      }
      .persist(StorageLevel.MEMORY_AND_DISK)

    // scale-adaptive reducer count, DERIVED from the measured edge
    // count (guide §2: partitioning must adapt to input size, not a
    // constant tuned for one deployment): ~64k edge rows per reduce
    // partition, capped by the session's shuffle-partition knob — the
    // RDD loop gets no AQE coalescing, so without this every round of
    // a 50k-edge graph would schedule 3 stages × 32 near-empty tasks
    // (measured: q77's 10-round CC slower than the DataFrame form it
    // replaced until this line existed)
    val nUnd = eRdd.count()
    val maxP = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val p = new HashPartitioner(
      math.max(1L, math.min(maxP.toLong, nUnd / 65536L + 1L)).toInt)
    val und = eRdd.partitionBy(p).persist(StorageLevel.MEMORY_AND_DISK)

    // Iterate ONLY over edge-incident vertices: a vertex with no edges
    // can never change label, and in a dedup pipeline the pair graph is
    // orders of magnitude smaller than the corpus (at 100 TB the
    // difference between looping over ~10^7 near-dup members and the
    // full 10^10-doc universe). Singletons rejoin at the end via a
    // single left join with coalesce-to-self.
    // init fuses the first propagation: label(v) = min(v, min neighbor).
    // Star/pair clusters (the bulk of near-dup graphs) are already at
    // their fixpoint after this, so the loop's first changed-count hits
    // zero one round earlier.
    var labels = und
      .reduceByKey(p, (a: Long, b: Long) => math.min(a, b))
      .mapPartitions(
        _.map { case (v, nm) => (v, math.min(v, nm)) },
        preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var iter = 0
    // the previous round's propagated blocks stay persisted until the
    // NEXT round's action has materialized the (lazy) compress that
    // reads them — freed here at the top of that round
    var pendingFree: Option[org.apache.spark.rdd.RDD[_]] = None
    while (!converged && iter < maxIterations) {
      // 1. propagate: min label over the neighborhood. und and labels
      //    share the partitioner, so the join is narrow; only the
      //    (neighbor, label) messages shuffle (reduceByKey min).
      val nbrMin = und
        .join(labels)
        .map { case (_, (d, lbl)) => (d, lbl) }
        .reduceByKey(p, (a: Long, b: Long) => math.min(a, b))
      // changed-count rides an accumulator on the materializing pass —
      // a transformation-side accumulator can only OVER-count (on task
      // retry), which at worst buys one extra idempotent round, never a
      // premature exit (exit needs changed == 0, and a retried round at
      // the fixpoint adds 0)
      val changedAcc = spark.sparkContext.longAccumulator("cc.changed")
      val propagated = labels
        .leftOuterJoin(nbrMin) // narrow: both sides carry p
        .mapValues { case (old, nm) =>
          val next = math.min(old, nm.getOrElse(old))
          if (next != old) changedAcc.add(1L)
          next
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      propagated.count() // the round's ONE driver job
      pendingFree.foreach(_.unpersist(blocking = false))
      pendingFree = None
      val changed = changedAcc.value
      if (changed == 0L) {
        // labels are already the fixpoint — the propagated frame adds
        // nothing; keep the previous round's blocks as the answer
        propagated.unpersist(blocking = false)
        converged = true
      } else {
        // 2. compress: label ← label(label) (pointer jumping) — halves
        //    pointer depth per round. Left lazy: the next round's single
        //    action materializes it into its persist, so compression
        //    costs no extra driver job.
        val compressed = propagated
          .map { case (v, l) => (l, v) }
          .leftOuterJoin(propagated) // propagated carries p; left side shuffles
          .map { case (l, (v, ll)) => (v, ll.getOrElse(l)) }
          .partitionBy(p)
          .persist(StorageLevel.MEMORY_AND_DISK)
        labels.unpersist(blocking = false)
        pendingFree = Some(propagated)
        labels = compressed
      }
      iter += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"[cc] round $iter changed=$changed")
    }
    if (!converged)
      log.warn(
        s"connectedComponents exhausted maxIterations=$maxIterations without converging; " +
          "the returned labeling may still contain unmerged components " +
          "(raise maxIterations for graphs with very large diameter)")
    // r22 (leak fix): the r21 form returned a plan pinned to the
    // persisted `labels` RDD and left it registered forever ("freed
    // with the RDD's GC" — i.e. nondeterministically, maybe never).
    // Every CC-consuming query leaked vertex-scale blocks into the
    // block manager for the rest of the session; in a long-lived
    // library session that is a real memory leak, and it inflated 28
    // unrelated bench queries at local[32]. The labeling is only
    // edge-incident-vertex-sized (near-dup pair scale, not corpus
    // scale), so materialize it eagerly into a localCheckpoint — whose
    // blocks the ContextCleaner frees when the frame goes unreachable,
    // and which the per-query RDD hygiene in Bench/Verify drops
    // deterministically — then unpersist every loop RDD before
    // returning.
    val labelsDf = labels.toDF("id", "label").localCheckpoint(true)
    labels.unpersist(blocking = false)
    pendingFree.foreach(_.unpersist(blocking = false))
    val idType = vertices.schema(idCol).dataType
    val out = vertices.select(col(idCol).cast("long").alias("id"))
      .join(labelsDf, Seq("id"), "left")
      .select(
        col("id").cast(idType).alias("id"),
        coalesce(col("label"), col("id")).cast(idType).alias("cluster_id"))
    und.unpersist(blocking = false)
    eRdd.unpersist(blocking = false)
    out
  }

  /** Deduplication view of a component labeling: one row per cluster
    * with its canonical (minimum) id and member count — `filter(id ===
    * cluster_id)` on the labeling keeps exactly the canonical docs.
    */
  def clusterSummary(labels: DataFrame): DataFrame =
    labels
      .groupBy("cluster_id")
      .agg(count(lit(1)).alias("cluster_size"))
}
