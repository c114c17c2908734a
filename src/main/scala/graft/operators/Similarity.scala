package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `ARRAY<FLOAT>` embedding
  * column.
  *
  *  - `bruteForceTopK` — the exact baseline: one codegen'd projection
  *    computing cosine against a literal query vector, then a distributed
  *    top-K (`TakeOrderedAndProject` — per-partition heaps, no full
  *    sort). Linear scan, but embarrassingly parallel: at 100 TB it is
  *    one pass with no shuffle beyond the K-row driver merge.
  *
  *  - `lshTopK` — the scale path: random-hyperplane signatures bucket the
  *    corpus once (can be persisted/bucketed-on-write); a query probes
  *    only its own bucket ± multiprobe neighbors, turning the scan into a
  *    partition-pruned lookup.
  */
object Similarity {

  def withCosine(emb: DataFrame, vecCol: String, query: Seq[Double]): DataFrame =
    emb.withColumn("cos", cosineSimilarity(col(vecCol), typedlit(query)))

  def bruteForceTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int): DataFrame =
    withCosine(emb, vecCol, query)
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)

  /** Bucketed ANN: assigns every vector (and the query) a hyperplane
    * bucket; only bucket-mates are scored. `nPlanes` trades recall for
    * selectivity (bucket population ≈ N / 2^nPlanes).
    */
  def lshTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      nPlanes: Int = 8,
      seed: Long = 42L): DataFrame = {
    val dim = query.size
    val planes = randomPlanes(nPlanes, dim, seed)
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d >= 0) 1L << i else 0L
    }.sum

    emb
      .withColumn("bucket", hyperplaneBucket(col(vecCol), planes))
      .filter(col("bucket") === lit(qBucket))
      .transform(withCosine(_, vecCol, query))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }
}
