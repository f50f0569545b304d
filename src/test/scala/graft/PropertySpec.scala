package graft

import graft.core.{Doc, Span}
import graft.ingest.DocValidator
import graft.nlp.{SentenceSplitter, Tokenizer}
import graft.pairs.PairGenerator
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (FIXTURES.md §5 / SURVEY.md §5 test plan): structural
  * invariants under randomized inputs, run through raw ScalaCheck. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200), prop)
    assert(result.passed, s"$name: $result")
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val textGen = Gen.listOf(Gen.oneOf(word, Gen.const("."),
    Gen.const(" "), Gen.const("! "), Gen.const("? "))).map(_.mkString(" "))

  test("tokenizer: offsets reconstruct the token text; tokens ascend, never overlap") {
    check("tokenizer", Prop.forAll(textGen) { text =>
      val toks = Tokenizer.tokenize(text)
      toks.forall(t => text.substring(t.bgn, t.end) == t.text) &&
        toks.sliding(2).forall {
          case Seq(a, b) => a.end <= b.bgn
          case _ => true
        } &&
        toks.forall(t => t.text.nonEmpty && !t.text.exists(_.isWhitespace))
    })
  }

  test("splitter: ranges ascend within bounds; sentence text matches its range") {
    check("splitter", Prop.forAll(textGen) { text =>
      val bs = SentenceSplitter.boundaries(text)
      bs.forall { case (b, e) => b >= 0 && b < e && e <= text.length } &&
        bs.sliding(2).forall {
          case Seq((_, e1), (b2, _)) => e1 <= b2
          case _ => true
        }
    })
  }

  test("span invariant: generated docs validate and pass through unchanged") {
    val p = graft.core.CorpusGen.Params(nDocs = 1)
    check("span-invariant", Prop.forAll(Gen.choose(0L, 5000L)) { idx =>
      val doc = graft.core.CorpusGen.genDoc(p, idx).doc
      DocValidator.validate(doc).isEmpty &&
        doc.spans.sliding(2).forall {
          case Seq(a, b) => b.offset > a.offset // strictly increasing
          case _ => true
        }
    })
  }

  test("validator: structural mutations are always quarantined") {
    val base = Doc("d", Seq(Span("text", "abc def.", "", 0)))
    val mutations: Gen[Doc] = Gen.oneOf(
      base.copy(doc_id = ""),
      base.copy(spans = Nil),
      base.copy(spans = Seq(Span("text", "abc", "", -1))),
      base.copy(spans = Seq(Span("weird", "x", "", 0))),
      base.copy(spans = Seq(Span("media", "", "", 0))),
      base.copy(spans = Seq(Span("text", "abc", "ref!", 0))),
      base.copy(spans = Seq(Span("text", "abcdef", "", 5), Span("text", "g", "", 2))))
    check("validator", Prop.forAll(mutations)(d => DocValidator.validate(d).nonEmpty))
  }

  test("equiv closure: idempotent; expansion emits unordered-unique pairs") {
    val setsGen = Gen.listOf(Gen.nonEmptyListOf(Gen.choose(0, 15))
      .map(_.map(i => s"T$i").toSet))
    check("equiv", Prop.forAll(setsGen) { sets =>
      val once = PairGenerator.unionEquivSets(sets)
      val twice = PairGenerator.unionEquivSets(once)
      once.map(_.toSeq.sorted).sortBy(_.mkString) ==
        twice.map(_.toSeq.sorted).sortBy(_.mkString)
    })
    val pairsGen = Gen.listOf(Gen.zip(Gen.choose(0, 9), Gen.choose(0, 9))
      .map { case (a, b) => (s"T$a", s"T$b") }.suchThat(p => p._1 != p._2))
    check("expansion", Prop.forAll(pairsGen, setsGen) { (pos, sets) =>
      val out = PairGenerator.expandPositives(pos, sets)
      out.distinct == out && out.forall { case (a, b) => a < b }
    })
  }

  test("rolling hash: polynomial concat identity h(a++b) = h(a)·B^|b| + h(b)") {
    check("rolling-hash", Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      val ha = graft.functions.RollingHashExpr.hash(a.getBytes("UTF-8"))
      val hb = graft.functions.RollingHashExpr.hash(b.getBytes("UTF-8"))
      val hab = graft.functions.RollingHashExpr.hash((a + b).getBytes("UTF-8"))
      var shift = 1L
      (0 until b.getBytes("UTF-8").length)
        .foreach(_ => shift *= graft.functions.RollingHashExpr.B)
      hab == ha * shift + hb
    })
  }
}
