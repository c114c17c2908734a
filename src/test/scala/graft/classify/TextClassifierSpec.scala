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
