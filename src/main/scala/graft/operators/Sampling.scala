package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducible alternative to
  * `Dataset.sample` for training-data curation. `sample()` draws from a
  * per-partition RNG, so results change with partitioning and re-runs;
  * curation needs samples that are (a) stable across re-runs and
  * cluster layouts, (b) consistent across engines (auditable by the
  * DuckDB oracle), and (c) cheap — a scan-side predicate, no shuffle.
  *
  * The keep-decision hashes the ROW KEY (md5-derived 60-bit int, the
  * project's cross-engine hash primitive) into [0, denom) and keeps
  * rows below the per-stratum threshold. Same key ⇒ same decision,
  * everywhere, forever — which also makes samples NESTED: the 10‰
  * sample is a subset of the 100‰ sample, the property you want when
  * growing a training mix.
  */
object Sampling {

  /** `hash(key) ∈ [0, denom)` — uniform, deterministic, engine-portable. */
  def hashBucket(key: Column, denom: Int): Column =
    TextFunctions.md5Hash60(key.cast("string")) % denom

  /** Uniform sample: keep rows with `hashBucket < permille`. */
  def uniformSample(df: DataFrame, keyCol: String, permille: Int): DataFrame =
    df.filter(hashBucket(col(keyCol), 1000) < permille)

  /** Stratified sample with a per-stratum keep-rate (in ‰). Strata
    * missing from `ratesPermille` keep `defaultPermille`. One scan, no
    * shuffle: the rate map compiles to a literal CASE chain.
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      ratesPermille: Map[String, Int],
      defaultPermille: Int = 0): DataFrame = {
    val rate = ratesPermille.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, permille)) =>
        when(col(stratumCol) === stratum, lit(permille)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), 1000) < rate)
  }
}
