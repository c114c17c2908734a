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
}
