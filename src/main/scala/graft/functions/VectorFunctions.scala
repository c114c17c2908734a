package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `ARRAY<FLOAT>` embedding columns.
  *
  * All doubles, all built-in higher-order functions (`zip_with` +
  * `aggregate`) so the arithmetic is a strict left-to-right fold — the
  * same evaluation order DuckDB's `list_sum(list_transform(...))` uses,
  * which makes results bit-identical for the oracle. No UDFs, no shuffle:
  * a cosine against a broadcast query vector is one codegen'd projection.
  */
object VectorFunctions {

  /** IEEE division for cosine scores: 0-denominator (zero-norm vector)
    * yields NaN instead of Spark 4's ANSI `DIVIDE_BY_ZERO` error. NaN
    * then orders ABOVE every value in both Spark and DuckDB comparisons,
    * so `cos >= threshold` keeps degenerate pairs consistently across
    * the SQL plans, the tight-loop kernels (plain JVM `0.0/0.0`), and
    * the oracle.
    */
  def nanDiv(num: Column, den: Column): Column =
    when(den === lit(0.0), lit(Double.NaN)).otherwise(num / den)

  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm2(a: Column): Column =
    sqrt(fsum(transform(a, x => x.cast("double") * x.cast("double"))))

  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Random-hyperplane LSH: sign bits of the dot products against `planes`
    * (deterministic, seeded driver-side), packed into one BIGINT bucket
    * key. Vectors in the same bucket are ANN candidates; nearby vectors
    * collide with probability `1 - angle/π` per bit.
    */
  def hyperplaneBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    require(planes.nonEmpty && planes.size <= 62, "1..62 hyperplanes")
    planes.zipWithIndex
      .map { case (p, i) =>
        when(dot(vec, typedlit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** Deterministic unit hyperplanes (fixed seed — reproducible across
    * runs and executors; generated driver-side, shipped in the plan as
    * literals).
    */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n).toSeq
    }
  }
}
