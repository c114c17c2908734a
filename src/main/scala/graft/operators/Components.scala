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
  * `localCheckpoint` truncates the growing lineage per round so the
  * plan doesn't deepen (and AQE re-plans each round on real sizes).
  *
  * Convergence is detected by an exact changed-label count (a one-row
  * aggregate per round, not a collect of the labels).
  */
object Components {

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
    val src = col(srcCol).alias("s")
    val dst = col(dstCol).alias("d")
    // both orientations once, up front — propagation is symmetric
    val und = edges.select(src, dst)
      .union(edges.select(col(dstCol).alias("s"), col(srcCol).alias("d")))
      .localCheckpoint(true)

    var labels = vertices.select(col(idCol).alias("id"), col(idCol).alias("label"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // 1. propagate: min label over the neighborhood
      val nbrMin = und
        .join(labels, und("s") === labels("id"))
        .groupBy(col("d").alias("id"))
        .agg(min(col("label")).alias("nbr_min"))
      val propagated = labels
        .join(nbrMin, Seq("id"), "left")
        .select(
          col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).alias("label"))
      // 2. compress: label ← label(label) (pointer jumping)
      val lab2 = propagated.select(col("id").alias("l_id"), col("label").alias("l_label"))
      val compressed = propagated
        .join(lab2, propagated("label") === lab2("l_id"), "left")
        .select(
          col("id"),
          coalesce(col("l_label"), col("label")).alias("label"))
        .localCheckpoint(true)
      val changed = compressed
        .join(labels.withColumnRenamed("label", "old_label"), Seq("id"))
        .filter(col("label") =!= col("old_label"))
        .count()
      labels = compressed
      converged = changed == 0
      iter += 1
    }
    labels.select(col("id"), col("label").alias("cluster_id"))
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
