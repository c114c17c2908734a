package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Contract of the COMPOSED five-stage front door (q169): the stage
  * interactions the round-19 bench bugs proved matter — the quota
  * decides what the boilerplate miner sees, the boiler decides what
  * the C4 cleaner sees, and the C4 output decides what the gate
  * measures. The per-stage operators each have their own spec; this
  * suite pins the composition on the registry query itself plus one
  * controlled interaction fixture.
  */
class FrontDoorSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q169: survivor counts are monotone and every output row cleared each stage") {
    val out = graft.SparkEntry.queries("q169_front_door")(spark, dir)
      .localCheckpoint()
    val counts = out
      .select("n_input", "n_allowed", "n_admitted", "n_c4")
      .distinct()
      .as[(Long, Long, Long, Long)]
      .collect()
    assert(counts.length === 1, "stage counts must be scalar across rows")
    val (nIn, nAllowed, nAdmitted, nC4) = counts.head
    val nGate = out.count()
    assert(nIn >= nAllowed && nAllowed >= nAdmitted && nAdmitted >= nC4 &&
      nC4 >= nGate, s"non-monotone funnel: $nIn/$nAllowed/$nAdmitted/$nC4/$nGate")
    // every stage discriminates on this fixture (a stage that keeps or
    // drops everything is a broken composition, not a gate)
    assert(nIn > nAllowed, "blocklist dropped nothing")
    assert(nAllowed > nAdmitted, "quota capped nothing")
    assert(nC4 > nGate, "gate dropped nothing")
    // blocked domains never appear downstream
    assert(out.filter(col("domain").isin("seofarm.com", "site3.com")).count() === 0)
    // the gate's own rule holds on the emitted text: >= 18 tokens
    val minTokens = out
      .select(size(graft.functions.TextFunctions.tokens(col("clean_page"))))
      .as[Int].collect().min
    assert(minTokens >= 18, s"gate leaked a $minTokens-token page")
  }

  test("q174: the six-stage funnel is monotone; the family cap binds inside the quota's survivors") {
    val out = graft.SparkEntry.queries("q174_front_door6")(spark, dir)
      .localCheckpoint()
    val counts = out
      .select("n_input", "n_allowed", "n_domain_cap", "n_family_cap", "n_c4")
      .distinct()
      .as[(Long, Long, Long, Long, Long)]
      .collect()
    assert(counts.length === 1)
    val (nIn, nAllowed, nDom, nFam, nC4) = counts.head
    val nGate = out.count()
    assert(nIn >= nAllowed && nAllowed >= nDom && nDom >= nFam &&
      nFam >= nC4 && nC4 >= nGate,
      s"non-monotone funnel: $nIn/$nAllowed/$nDom/$nFam/$nC4/$nGate")
    assert(nDom > nFam, "family cap dropped nothing — stage 3 is dead")
    // no surviving family exceeds the 30-page cap
    val maxFam = out.groupBy("tag_fp").count()
      .agg(max("count")).as[Long].collect().head
    assert(maxFam <= 30L, s"a family leaked past the cap: $maxFam")
  }

  test("interaction: a doc whose content the boiler consumed dies at C4, not at the gate") {
    // one domain, 12 pages; every page shares the word 'hot' (mined as
    // boilerplate at 75%); doc 0 is ALL boilerplate, doc 1 keeps prose
    val docs = (0 until 12).map { i =>
      val text = if (i == 0) "hot hot hot" else s"hot unique$i prose$i words$i run$i go$i"
      (i.toLong, "d.example", text)
    }.toDF("doc_id", "domain", "text")
    val profile = Dedup.boilerplateProfile(
      docs, "doc_id", "domain", "text", delim = " ", maxPagePct = 75, minPages = 10L)
    val boiled = Dedup.applyBoilerplateProfile(
      docs, profile, "doc_id", "domain", "text", delim = " ")
    val paged = boiled.select(col("doc_id"),
      concat(lit("Intro line with enough words to survive cleanly here."), lit("\n"),
        col("clean_text"), lit(" tail words end here.")).alias("page"))
    val c4d = QualityPrune.keepByC4(paged, "page", minWords = 5, minKeptLines = 2)
    val kept = c4d.select("doc_id").as[Long].collect().toSet
    // doc 0's content line collapsed to the 4-word tail -> under
    // minWords -> only the intro survives -> fails minKeptLines
    assert(!kept.contains(0L), "fully-boiled doc must die at the C4 stage")
    assert(kept.contains(1L), "doc with surviving prose must pass C4")
  }
}
