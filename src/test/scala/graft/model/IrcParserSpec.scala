package graft.model

import graft.SparkTestBase

class IrcParserSpec extends SparkTestBase {

  private val privmsg =
    ":nick!nick@nick.tmi.twitch.tv PRIVMSG #chan :Hello World"

  test("parseLine extracts user, channel, lower-cased text") {
    val p = IrcParser.parseLine(privmsg).get
    assert(p.user == "nick")
    assert(p.channel == "#chan")
    assert(p.text == "hello world")
  }

  test("parseLine keeps text after later colons (limit-3 split)") {
    val p = IrcParser
      .parseLine(":a!a@h PRIVMSG #c :see: this colon: survives")
      .get
    assert(p.text == "see: this colon: survives")
  }

  test("parseLine finds channel among extra metadata tokens") {
    val p = IrcParser
      .parseLine(":a!a@h extra tokens PRIVMSG #weird :x")
      .get
    assert(p.channel == "#weird")
  }

  test("parseLine returns None on non-message lines") {
    assert(IrcParser.parseLine("PING tmi.twitch.tv").isEmpty)
    assert(IrcParser.parseLine("").isEmpty)
  }

  test("columnar parse agrees with pure parseLine (golden parity)") {
    val lines = Seq(
      privmsg,
      ":a!a@h PRIVMSG #c :colon: inside",
      ":a!a@h tag=1 PRIVMSG #late :text",
      ":solo PRIVMSG #c :UPPER Case",
      ":u!u@h PRIVMSG #c :"
    )
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(lines.map(org.apache.spark.sql.Row(_))),
      org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
    val got = IrcParser
      .parse(df)
      .select("raw", "user", "channel", "text")
      .collect()
      .map(r => (r.getString(0), (r.getString(1), r.getString(2), r.getString(3))))
      .toMap
    lines.foreach { l =>
      val p = IrcParser.parseLine(l).get
      assert(got(l) == ((p.user, p.channel, p.text)), s"line: $l")
    }
  }

  test("parseLine is total on arbitrary strings") {
    val rnd = new scala.util.Random(42)
    val alphabet = ":#! @ABCabc\t\n"
    (1 to 500).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString
      IrcParser.parseLine(s) // must not throw
    }
    succeed
  }
}
