package graft.operators

import graft.SparkTestBase

class LabelPrepSpec extends SparkTestBase {
  import spark.implicits._

  test("cleanText strips <br>, bracket junk and collapses whitespace") {
    val got = LabelPrep.cleanText(
      Seq("""hello < br / > [world]  "quoted"   text""").toDF("text"), "text")
      .as[String].head()
    assert(got == "hello world quoted text")
  }

  test("cleanText fast twin matches the columnar specification") {
    val texts = Seq(
      """hello < br / > [world]  "quoted"   text""",
      "no junk at all", "  lead and trail  ", "",
      "[< br / >]", "tabs\tand\nnewlines < br / >< br / > done",
      "a['] mixed [\"< br / >\"] case")
    val df = texts.toDF("t")
    val columnar = df.select(
      LabelPrep.cleanTextColumnar(org.apache.spark.sql.functions.col("t")))
      .as[String].collect().toSeq
    val fast = LabelPrep.cleanText(df, "t").as[String].collect().toSeq
    assert(fast == columnar)
  }

  test("prepare: drops short/null docs, removes outliers, keeps top-K labels only") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta something else entirely here"),
      (3L, "short text"), // dropped: < 50 chars
      (4L, "alpha alpha alpha beta beta gamma rare1 rare2 rare3 rare4 rare5 words")
    ).toDF("doc_id", "text")

    val out = LabelPrep.prepare(docs, "doc_id", "text",
      outlierLabels = Seq("else"), minTextLength = 50, maxLabels = 3)
      .as[(Long, String)].collect().toSet

    // doc 3 gone
    assert(!out.exists(_._1 == 3L))
    // outlier label never appears
    assert(!out.exists(_._2 == "else"))
    // only 3 distinct labels survive (top by doc frequency: alpha, beta, gamma)
    assert(out.map(_._2) == Set("alpha", "beta", "gamma"))
    // label arrays are distinct per doc: doc4's triple alpha → one row
    assert(out.count(_._1 == 4L) == 3)
  }

  test("S5: the reference's CSV scan — multiline quoted fields, header, explicit schema — feeds the prep pipeline") {
    // the exact reader configuration of ProcessingWorkSheet.sc:35-43
    // (wholeFile + multiline + header + escape '"' + supplied schema)
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{StringType, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    val csv =
      "title,text,discussions,categories\n" +
        "\"Page \"\"one\"\"\",\"body\",\"alpha beta gamma delta epsilon zeta eta theta iota kappa\nsecond line of the same quoted discussion\",\"[cat1, cat2]\"\n" +
        "\"page two\",\"body\",\"short\",\"[cat1]\"\n"
    java.nio.file.Files.write(dir.resolve("d.csv"), csv.getBytes("UTF-8"))

    val schema = new StructType()
      .add("title", StringType).add("text", StringType)
      .add("discussions", StringType).add("categories", StringType)
    val df = spark.read.format("csv")
      .option("wholeFile", "true").option("multiline", value = true)
      .option("header", "true").option("escape", "\"")
      .schema(schema).load(dir.toString)

    assert(df.count() == 2)
    // escaped quotes and the embedded newline both survive the parse
    val multi = df.filter(col("title") === "Page \"one\"")
      .select("discussions").as[String].head()
    assert(multi.contains("\nsecond line"))

    // and the parsed frame runs through the label-prep pipeline
    val prepped = LabelPrep.prepare(
      df.select(col("title"), col("discussions")), "title", "discussions",
      outlierLabels = Nil, minTextLength = 50, maxLabels = 10)
      .as[(String, String)].collect()
    assert(prepped.nonEmpty && prepped.forall(_._1 == "Page \"one\""))
  }
}
