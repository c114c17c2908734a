package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

class PiiSpec extends SparkTestBase {
  import spark.implicits._

  test("redact replaces every PII class; counts match; clean text passes through") {
    val df = Seq(
      (1L, "mail a.b@x.org or c.d@y.io now"),
      (2L, "see https://a.example/p?q=1 and http://b.example"),
      (3L, "call 415-555-0199 twice: 415-555-0199"),
      (4L, "nothing sensitive here"),
      (5L, "mixed a@b.co https://c.d/e 123-456-7890 end")
    ).toDF("id", "t")

    val got = df.select(
      col("id"),
      Pii.emailCount(col("t")).as("e"),
      Pii.urlCount(col("t")).as("u"),
      Pii.phoneCount(col("t")).as("p"),
      Pii.redact(col("t")).as("r"))
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    assert(got(1L) == ((2L, 0L, 0L, "mail [EMAIL] or [EMAIL] now")))
    assert(got(2L) == ((0L, 2L, 0L, "see [URL] and [URL]")))
    assert(got(3L) == ((0L, 0L, 2L, "call [PHONE] twice: [PHONE]")))
    assert(got(4L) == ((0L, 0L, 0L, "nothing sensitive here")))
    assert(got(5L) == ((1L, 1L, 1L, "mixed [EMAIL] [URL] [PHONE] end")))
  }
}
