package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq((1L, "hello media world"), (2L, "x"))
    .toDF("id", "text")
    .withColumn("content", col("text").cast("binary"))

  test("byteStats: byte length and md5 of the binary payload") {
    val rows = Multimodal.byteStats(docs, "id", "content").collect()
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getLong(1) == "hello media world".getBytes("UTF-8").length)
    assert(r1.getString(2).length == 32)
  }

  test("decodeFeatures: partition-batched stub decode, fixed dim, deterministic") {
    val decoder = Multimodal.StubDecoder(8)
    val out = Multimodal.decodeFeatures(docs, "id", "content", decoder)
    assert(out.schema.fieldNames.toSeq == Seq("id", "features"))
    val feats = out.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).size == 8)
    assert(feats(2L).size == 8)
    // matches a local decode of the same bytes
    assert(feats(1L) == decoder.decode("hello media world".getBytes("UTF-8")).toSeq)
    assert(feats.values.forall(_.forall(f => f >= 0.0f && f <= 1.0f)))
  }

  test("fakeEmbedding: native-column pseudo-features, dim and range") {
    val got = docs.select(Multimodal.fakeEmbedding(col("content"), 4).as("f"))
      .as[Seq[Double]].collect()
    assert(got.forall(_.size == 4))
    assert(got.forall(_.forall(v => v >= 0.0 && v < 1.0)))
    // deterministic: same content → same features
    val again = docs.select(Multimodal.fakeEmbedding(col("content"), 4).as("f"))
      .as[Seq[Double]].collect()
    assert(got.toSeq == again.toSeq)
  }

  test("frameSample: n windows of frameBytes, first at offset 0, last at end") {
    val payload = (0 until 100).map(i => ('a' + i % 26).toChar).mkString
    val df = Seq((1L, payload)).toDF("id", "text")
      .withColumn("content", col("text").cast("binary"))
    val frames = df.select(Multimodal.frameSample(col("content"), 10, 4).as("fr"))
      .collect().head.getSeq[Array[Byte]](0)
    assert(frames.size == 4)
    assert(frames.forall(_.length == 10))
    assert(new String(frames.head, "UTF-8") == payload.substring(0, 10))
    assert(new String(frames.last, "UTF-8") == payload.substring(90, 100))
  }

  test("resizeStub: target dims in metadata, payload scaled by area ratio") {
    val payload = "x" * 800
    val df = Seq((1L, payload, 40, 20)).toDF("id", "text", "w", "h")
      .withColumn("content", col("text").cast("binary"))
    val r = df.select(Multimodal.resizeStub(col("content"), col("w"), col("h"), 20, 10).as("r"))
      .select(col("r.content"), col("r.width"), col("r.height"))
      .collect().head
    assert(r.getInt(1) == 20 && r.getInt(2) == 10)
    // area ratio (20*10)/(40*20) = 1/4 → 200 bytes survive the stub
    assert(r.getAs[Array[Byte]](0).length == 200)
  }
}
