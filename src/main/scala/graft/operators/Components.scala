package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step of every near-duplicate pipeline: LSH/Jaccard emits PAIRS, but
  * deduplication needs CLUSTERS (keep one canonical doc per component,
  * drop the rest). Reference analogue: none (the reference dedups
  * nothing); this is a training-data-pipeline extension per SURVEY.md §7.8.
  *
  * Algorithm: alternating min-label propagation and pointer-jumping
  * (path compression), the DataFrame rendering of the classic
  * two-phase CC recipe (cf. Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14):
  *
  *   1. propagate: l(v) ← min(l(v), min over neighbors u of l(u))
  *   2. compress:  l(v) ← l(l(v))
  *
  * Propagation alone needs O(diameter) rounds (a path graph of length d
  * takes d rounds); the compression join halves the pointer depth each
  * round, so convergence is O(log d) rounds — at 100 TB that is the
  * difference between 40 shuffles and 6. Each round is two shuffles
  * (neighbor-min groupBy + label-of-label join), both on long keys.
  * `localCheckpoint` truncates the growing lineage
  * per round so the plan doesn't deepen, and the convergence check is an
  * exact changed-label count over the just-materialized blocks (a
  * one-row aggregate, not a collect of the labels).
  */
object Components {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The RDD whose blocks back an eagerly `localCheckpoint`ed frame, so
    * a finished round's storage can be freed instead of accumulating for
    * the whole loop (None when the plan isn't a checkpoint scan).
    */
  private def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  private def freeCheckpoint(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking = false))

  /** `(id, cluster_id)` for every vertex, where `cluster_id` is the
    * minimum vertex id reachable in the undirected graph
    * `vertices ∪ edges` — singletons map to themselves.
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
    // materialize the (possibly expensive — e.g. a whole dedup pipeline)
    // edge frame ONCE, then derive both orientations from the
    // checkpointed blocks; a union of two projections of the raw plan
    // would execute it twice
    val e = edges.select(col(srcCol).alias("s"), col(dstCol).alias("d"))
      .localCheckpoint(true)
    val und = e.union(e.select(col("d").alias("s"), col("s").alias("d")))

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
    var labels = und.groupBy(col("s"))
      .agg(min(col("d")).alias("nbr_min"))
      .select(col("s").alias("id"), least(col("s"), col("nbr_min")).alias("label"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // 1. propagate: min label over the neighborhood (old label rides
      //    along so convergence needs no extra join afterwards).
      //    Checkpoint BEFORE the convergence check and the compress
      //    self-join: propagation stability is the exact fixpoint
      //    criterion (a stable labeling is constant per component at the
      //    component min — compress is only an accelerator), so a
      //    converged round skips the compress join entirely; and in an
      //    unconverged round both sides of the compress self-join read
      //    the materialized blocks instead of recomputing the propagate
      //    join+aggregate twice (the two sides exchange on different
      //    keys, so ReuseExchange cannot dedup them).
      val nbrMin = und
        .join(labels, und("s") === labels("id"))
        .groupBy(col("d").alias("id"))
        .agg(min(col("label")).alias("nbr_min"))
      val propagated = labels
        .withColumnRenamed("label", "old_label")
        .join(nbrMin, Seq("id"), "left")
        .select(
          col("id"),
          col("old_label"),
          least(col("old_label"), coalesce(col("nbr_min"), col("old_label"))).alias("label"))
        .localCheckpoint(true)
      // convergence: one tiny aggregate over the just-materialized blocks
      val changed = propagated.filter(col("label") =!= col("old_label")).count()
      if (changed == 0) {
        // labels are already the fixpoint — the propagated frame adds
        // nothing; keep the previous round's blocks as the answer
        freeCheckpoint(propagated)
        converged = true
      } else {
        // 2. compress: label ← label(label) (pointer jumping) over the
        //    checkpointed blocks — halves pointer depth per round
        val lab2 = propagated.select(col("id").alias("l_id"), col("label").alias("l_label"))
        val compressed = propagated
          .join(lab2, propagated("label") === lab2("l_id"), "left")
          .select(col("id"), coalesce(col("l_label"), col("label")).alias("label"))
          .localCheckpoint(true)
        // the new round is materialized — the previous round's blocks
        // are dead weight now; free them instead of accumulating
        // executor storage across every round
        freeCheckpoint(labels)
        freeCheckpoint(propagated)
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
    // the loop is done with the edge frame; only the (checkpointed)
    // labels feed the final join
    freeCheckpoint(e)
    vertices.select(col(idCol).alias("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).alias("cluster_id"))
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
