package graft.classify

import org.scalatest.funsuite.AnyFunSuite

class TextClassifierSpec extends AnyFunSuite {

  test("default classifier loads the bundled class map once and classifies") {
    val clf = TextClassifier.default
    assert(clf.labels.size == 20)
    assert(clf.labels.contains("gaming"))
    // ≥4 of 6 gaming keywords present → score > 0.5
    assert(clf.classify("lets play this game on stream, great boss level")
      == Seq("gaming"))
    assert(clf.classify("totally unrelated words").isEmpty)
  }

  test("loadLabelKeywords preserves label order and keyword lists") {
    val m = TextClassifier.loadLabelKeywords("/graft/classifier_classes.json").toMap
    assert(m("music").contains("song"))
    assert(m.values.forall(_.nonEmpty))
  }

  test("KeywordClassifier scores are keyword-fraction based") {
    val clf = KeywordClassifier(Seq("x" -> Seq("a", "b", "c", "d")))
    assert(clf.scores("a b") == Seq(0.5))
    assert(clf.scores("a b c") == Seq(0.75))
    assert(clf.classify("a b") == Seq.empty) // 0.5 is not > 0.5
    assert(clf.classify("a b c") == Seq("x"))
  }

}

/** Recorder lives in a JVM singleton: task closures are serialized even
  * in local mode, but statics aren't — the deserialized closure sees this
  * same object.
  */
object BatchRecorder {
  val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
}

final class CountingClassifier extends TextClassifier {
  private val inner = KeywordClassifier(Seq("x" -> Seq("a", "b", "c", "d")))
  override def scores(text: String): Seq[Double] = inner.scores(text)
  override def labels: IndexedSeq[String] = inner.labels
  override def classifyBatch(texts: Seq[String]): Seq[Seq[String]] = {
    BatchRecorder.sizes.add(texts.size)
    super.classifyBatch(texts)
  }
}

class TextClassifierPartitionSpec extends graft.SparkTestBase {
  import spark.implicits._

  test("classifyPartitioned: batch hook sees batches, results match per-row classify") {
    BatchRecorder.sizes.clear()
    val docs = (1L to 100L).map(i => (i, if (i % 2 == 0) "a b c" else "z")).toDF("id", "text")
    val got = TextClassifier
      .classifyPartitioned(docs.repartition(2), "id", "text", new CountingClassifier, batchSize = 16)
      .as[(Long, Seq[String])].collect().toMap
    assert(got.size == 100)
    assert(got(2L) == Seq("x") && got(1L).isEmpty)
    // the hook ran per batch, not per row
    import scala.jdk.CollectionConverters._
    val sizes = BatchRecorder.sizes.asScala.toSeq
    assert(sizes.sum == 100 && sizes.forall(_ <= 16) && sizes.exists(_ > 1))
  }

  test("asColumn: keyword classifier runs native and byte-identical to the UDF twin; RPC impls keep the UDF") {
    import org.apache.spark.sql.functions.col
    val clf: KeywordClassifier = TextClassifier.default
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, "lets play this game on stream, great boss level"),
        org.apache.spark.sql.Row(2L, "this song is from my favourite band on tour"),
        org.apache.spark.sql.Row(3L, ""),
        org.apache.spark.sql.Row(4L, null)), // UDF twin maps null -> empty
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType, nullable = true))))
    def run(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      docs.select(col("id"), f(col("text")).as("labels"))
        .as[(Long, Seq[String])].collect().toMap
    val native = run(TextClassifier.asColumn(clf))
    val viaUdf = run(TextClassifier.asUdf(clf))
    assert(native == viaUdf, s"native diverged from UDF twin:\n$native\nvs\n$viaUdf")

    // plan shapes: keyword classifier → native expression, no ScalaUDF;
    // a classifyBatch-overriding (RPC-shaped) impl → the UDF fallback
    val nativePlan = docs.select(TextClassifier.asColumn(clf)(col("text")))
      .queryExecution.executedPlan.toString
    assert(nativePlan.contains("keyword_classify") && !nativePlan.toLowerCase.contains("scalaudf"),
      nativePlan)
    val rpcPlan = docs.select(TextClassifier.asColumn(new CountingClassifier)(col("text")))
      .queryExecution.executedPlan.toString
    // rendered as "UDF(text)" (ScalaUDF's pretty form)
    assert(rpcPlan.toLowerCase.contains("udf("), rpcPlan)
  }
}
