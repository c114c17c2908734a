package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video travel as opaque `BINARY` columns with typed metadata, and the
  * expensive per-item work (decode, feature extraction, frame sampling)
  * runs partition-batched so decoder state is set up once per partition —
  * the Scala analogue of `mapInPandas` batching.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a [[MediaDecoder]] trait with a deterministic stub
  * implementation; everything Spark-side — schema, batching, partition
  * shape, columnar derivations — is real and tested. Swap in a JNI/FFMPEG
  * decoder by implementing the trait.
  */
object Multimodal {

  /** Typed metadata contract carried alongside an opaque content column. */
  val MediaMetaSchema: StructType = new StructType()
    .add("media_type", StringType) //  image | audio | video
    .add("format", StringType) //      png, wav, mp4, …
    .add("width", IntegerType)
    .add("height", IntegerType)
    .add("duration_ms", LongType)

  /** Per-item decoder: bytes → fixed-dim feature vector. Implementations
    * must be serializable; per-partition setup belongs in lazy fields.
    */
  trait MediaDecoder extends Serializable {
    def dim: Int
    def decode(bytes: Array[Byte]): Array[Float]
  }

  /** Deterministic stand-in for a real codec: features derived from an
    * md5 of the bytes. Stable across JVMs/runs — usable in tests and
    * correctness fixtures.
    */
  final case class StubDecoder(override val dim: Int) extends MediaDecoder {
    override def decode(bytes: Array[Byte]): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(bytes)
      Array.tabulate(dim) { i =>
        val b = h(i % h.length) & 0xff
        (b * (i + 1) % 251) / 251.0f
      }
    }
  }

  /** Partition-batched decode: one decoder per partition, feature vectors
    * out. Keeps the binary payload off the shuffle — only (id, features)
    * leave the scan stage.
    */
  def decodeFeatures(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      decoder: MediaDecoder): DataFrame = {
    val spark = df.sparkSession
    val outSchema = new StructType()
      .add("id", LongType)
      .add("features", ArrayType(FloatType, containsNull = false))
    val rdd = df.select(col(idCol).cast("long"), col(contentCol)).rdd.mapPartitions { it =>
      // decoder is materialized once per partition here; real codecs hang
      // native handles off lazy vals inside the decoder instance
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.getLong(0), if (bytes == null) null else decoder.decode(bytes).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Columnar byte-level stats — no decode needed, stays in codegen. */
  def byteStats(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(contentCol)).cast("long").as("byte_len"),
      md5(col(contentCol)).as("content_md5"))

  /** Deterministic pseudo-features as NATIVE columns (oracle-checkable
    * shape of the decode step): dim doubles derived from the content md5.
    */
  def fakeEmbedding(contentCol: org.apache.spark.sql.Column, dim: Int): org.apache.spark.sql.Column = {
    val h = md5(contentCol)
    array((0 until dim).map { i =>
      (TextFunctions.md5Hash60(concat(h, lit(":" + i))) % lit(1000000L)).cast("double") / lit(1000000.0)
    }: _*)
  }

  /** Resize plumbing: target-dimension metadata plus a deterministic
    * stand-in payload transform (byte count scaled by the area ratio —
    * a real implementation swaps the payload lambda for a codec via
    * [[MediaDecoder]]). Emits `struct(content, width, height)` so the
    * schema contract downstream operators consume is the real one.
    */
  def resizeStub(
      contentCol: org.apache.spark.sql.Column,
      widthCol: org.apache.spark.sql.Column,
      heightCol: org.apache.spark.sql.Column,
      targetW: Int,
      targetH: Int): org.apache.spark.sql.Column = {
    val srcArea = greatest(widthCol * heightCol, lit(1)).cast("double")
    val scaled = (length(contentCol).cast("double") * lit(targetW.toLong * targetH) / srcArea)
      .cast("int")
    struct(
      contentCol.substr(lit(1), greatest(scaled, lit(1))).as("content"),
      lit(targetW).as("width"),
      lit(targetH).as("height"))
  }

  /** Frame sampling plumbing: n fixed-size byte windows at evenly-spaced
    * offsets (for video, these would be keyframe offsets from the
    * container index). Pure columnar — `substr` on BINARY yields BINARY.
    */
  def frameSample(contentCol: org.apache.spark.sql.Column, frameBytes: Int, n: Int): org.apache.spark.sql.Column = {
    val span = greatest(length(contentCol) - lit(frameBytes), lit(0)).cast("long")
    val denom = lit(math.max(n - 1, 1).toLong)
    transform(
      sequence(lit(0), lit(n - 1)),
      i => contentCol.substr((floor(span * i.cast("long") / denom) + 1).cast("int"), lit(frameBytes)))
  }

  /** 64-bit perceptual (difference) hash of an opaque content column —
    * see [[graft.functions.expressions.DHash64Expr]].
    */
  def dhash64(contentCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.expressions.DHash64Expr.dhash64Col(contentCol)

  /** Perceptual near-duplicate pairs over an opaque media column —
    * the image-content analogue of q21's SimHash text near-dup (the
    * LAION-scale need: the same image re-encoded, lightly edited, or
    * re-captioned dedups by CONTENT, not by byte hash):
    *
    *  1. one scan computes `dhash64` per item (the content bytes never
    *     leave the scan stage — only `(id, hash)` rows move);
    *  2. candidates come from Hamming BANDING, the q21 machinery: the
    *     64-bit hash splits into `maxDist + 1` disjoint bands (capped
    *     at 64 one-bit bands), so by pigeonhole a pair within
    *     `maxDist` differing bits leaves at least one band untouched
    *     and MUST meet — recall is complete for the requested
    *     threshold, not just for a fixed 4-band dist<=3 regime (the
    *     round-17 review's gap: maxDist in [4, 64] used to lose
    *     pairs silently). More bands = more candidate rows
    *     (`(maxDist+1)·n` band rows), the standard LSH recall/cost
    *     trade made explicit in the one knob that states it;
    *  3. map-side verify `bit_count(xor) <= maxDist` BEFORE the
    *     pair-level distinct — only true matches pay the dedup
    *     shuffle (the q122 discipline).
    *
    * `maxBandFreq` is the hot-bucket guard (the q141/q119 doctrine):
    * a band value shared by `f` items generates `O(f²)` candidates —
    * byte-identical boilerplate images (blank thumbnails, tracking
    * pixels) concentrate into one bucket. The cap drops buckets
    * hotter than `f` from both sides (broadcast anti-join against the
    * once-materialized hot list), with the completeness caveat
    * documented: an all-hot-bands pair is missed — and is exactly the
    * boilerplate pair a curation run wants suppressed.
    *
    * Output: `(left_id, right_id, dist)`, `left_id < right_id`, one
    * row per pair. Null-content items carry no hash and never pair.
    */
  def perceptualNearDup(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      maxDist: Int,
      maxBandFreq: Option[Int] = None): DataFrame = {
    // 63, not 64: completeness needs maxDist+1 bands and the 64-bit hash
    // caps at 64 one-bit bands — at maxDist=64 a bit-complement pair
    // (all 64 bits differ) would share no band and be silently missed.
    // maxDist=64 means "everything pairs": that is a cross join, not an
    // LSH problem — reject it rather than return an incomplete answer.
    require(maxDist >= 0 && maxDist <= 63, s"maxDist must be in [0, 63], got $maxDist")
    maxBandFreq.foreach(f => require(f >= 1, s"maxBandFreq must be >= 1, got $f"))
    val hs = df
      .select(col(idCol).cast("long").alias("id"),
        dhash64(col(contentCol)).alias("h"))
      .na.drop(Seq("h"))
    // band b covers bits [b*64/nBands, (b+1)*64/nBands) — widths differ
    // by at most one bit when nBands doesn't divide 64
    val nBands = math.min(maxDist + 1, 64)
    val bands = hs.select(
      col("id"), col("h"),
      posexplode(array((0 until nBands).map { b =>
        val lo = (b * 64) / nBands
        val width = ((b + 1) * 64) / nBands - lo
        val mask = if (width >= 64) -1L else (1L << width) - 1L
        shiftright(col("h"), lo).bitwiseAND(lit(mask))
      }: _*)).as(Seq("band", "v")))
    val guarded = maxBandFreq match {
      case None => bands
      case Some(cap) =>
        val hot = bands.groupBy("band", "v")
          .agg(count(lit(1)).alias("__f"))
          .filter(col("__f") > cap)
          .select("band", "v")
          .localCheckpoint(true)
        bands.join(broadcast(hot), Seq("band", "v"), "left_anti")
    }
    guarded.select(col("band"), col("v"), col("id").alias("l_id"), col("h").alias("l_h"))
      .join(
        guarded.select(col("band"), col("v"), col("id").alias("r_id"), col("h").alias("r_h")),
        Seq("band", "v"))
      .filter(col("l_id") < col("r_id"))
      .withColumn("dist", bit_count(col("l_h").bitwiseXOR(col("r_h"))).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("l_id").alias("left_id"), col("r_id").alias("right_id"), col("dist"))
      .dropDuplicates("left_id", "right_id")
  }
}
