package graft

import graft.core._
import graft.eval.InternalMetrics
import graft.nlp.{MentionDetector, SentenceSplitter, Tokenizer}
import graft.pairs.{ExampleGenerator, PairGenerator}
import graft.score.{RegulationAugmentation, WindowEncoder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Representation strategies (MARK vs MASK), multi-span FN accounting, and
  * the regulation-augmentation rule stage. */
class StrategySpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private def fixture = {
    val ac = graft.nlp.AhoCorasick.build(Seq(
      ("p53", "nA", "Protein"), ("ABC1", "nB", "Protein")))
    val doc = Doc("d", Seq(Span("text", "we saw p53 binds strongly to ABC1 today.", "", 0)))
    val mentions = MentionDetector.detect(doc, ac, SentenceSplitter.split(doc))
    val pairs = PairGenerator.forDoc(mentions, TaskConfig.complexTome)
    val tokens = Tokenizer.tokenize(SentenceSplitter.docText(doc))
    (tokens, mentions, pairs)
  }

  test("MARK inserts typed [unused3/4] boundary markers, no other masking") {
    val (tokens, mentions, pairs) = fixture
    val mark = WindowEncoder.Mark(Seq("Protein"))
    val enc = WindowEncoder.encodeDocWith(mark)(tokens, pairs, mentions, 128)
    assert(enc.length == 1 && enc.head.fitted)
    val w = enc.head.tokens
    // markers around each focus entity, entity text PRESERVED between them
    assert(w.containsSlice(Seq("[unused3]", "p53", "[unused4]")), w.mkString(" "))
    assert(w.containsSlice(Seq("[unused3]", "ABC1", "[unused4]")), w.mkString(" "))
    assert(w.count(_ == "[unused3]") == 2 && w.count(_ == "[unused4]") == 2)
    assert(!w.contains(WindowEncoder.FocusMask) && !w.contains(WindowEncoder.OtherMask))
    // offsets stay monotone non-decreasing through the zero-width markers
    val bgns = enc.head.tokenBgns
    assert(bgns.zip(bgns.tail).forall { case (a, b) => a <= b })
  }

  test("MARK markers are typed per entity-type index (+2k)") {
    val mark = WindowEncoder.Mark(Seq("Protein", "Chemical"))
    assert(mark.bgnMarker("Protein") == "[unused3]")
    assert(mark.endMarker("Protein") == "[unused4]")
    assert(mark.bgnMarker("Chemical") == "[unused5]")
    assert(mark.endMarker("Chemical") == "[unused6]")
  }

  test("MARK vs MASK: same W3 windowing, +6 vs +4 fit predicate") {
    val (tokens, mentions, pairs) = fixture
    val p = pairs.head
    val (_, _, _, _, dist, _) = WindowEncoder.geometry(tokens, p, 128)
    // at max = dist+5: MASK (reserve 4) fits, MARK (reserve 6) must not
    val atBoundary = dist + 5
    val mask = WindowEncoder.encodeDocWith(WindowEncoder.MaskEverything)(
      tokens, pairs, mentions, atBoundary)
    val mark = WindowEncoder.encodeDocWith(WindowEncoder.Mark(Seq("Protein")))(
      tokens, pairs, mentions, atBoundary)
    assert(mask.head.fitted && !mark.head.fitted,
      s"dist=$dist max=$atBoundary: MASK fits, MARK must not (+6 reserve)")
    // at a roomy max both fit; the MARK window minus its 4 markers must be
    // a contiguous UNMASKED slice of the document (MARK never masks), while
    // the MASK window replaces focus tokens with [unused1]
    val maskW = WindowEncoder.encodeDocWith(WindowEncoder.MaskEverything)(
      tokens, pairs, mentions, 128).head.tokens
    val markW = WindowEncoder.encodeDocWith(WindowEncoder.Mark(Seq("Protein")))(
      tokens, pairs, mentions, 128).head.tokens
    val markers = Set("[unused3]", "[unused4]")
    val stripped = markW.filterNot(markers)
    val raw = tokens.map(_.text)
    assert(raw.containsSlice(stripped),
      s"MARK window must be a raw-doc slice: $stripped vs $raw")
    assert(maskW.count(_ == WindowEncoder.FocusMask) == 2 &&
      !markW.contains(WindowEncoder.FocusMask))
  }

  test("pipeline-level strategy dispatch: encodeCandidates under MARK") {
    val p = CorpusGen.Params(nDocs = 20)
    val docs = CorpusGen.generate(spark, p).map(_.doc)
    val dict = MentionDetector.broadcastDict(spark, CorpusGen.dictionary(p))
    val enc = KgPipeline.encodeCandidates(docs, dict, TaskConfig.complexTome,
      WindowEncoder.Mark(Seq("Protein"))).filter((e: EncodedPair) => e.fitted)
    val windows = enc.take(50)
    assert(windows.nonEmpty)
    assert(windows.forall(w =>
      w.tokens.count(_ == "[unused3]") == 2 && w.tokens.count(_ == "[unused4]") == 2),
      "every fitted MARK window carries both typed marker pairs")
    assert(windows.forall(w => !w.tokens.contains(WindowEncoder.FocusMask)))
  }

  test("multi-span entities are rejected and their gold positives become FNs") {
    val mentions = Seq(
      Mention("d", "T1", "Protein", 0, 3, "p53", "nA", 0),
      Mention("d", "T2", "Protein", 10, 14, "ABC1", "nB", 0),
      Mention("d", "T3", "Protein", 20, 24, "XYZ2", "nC", 0))
    val gold = Seq(
      ExampleGenerator.GoldRel("d", "Complex_formation", directed = false, "T1", "T2"),
      ExampleGenerator.GoldRel("d", "Complex_formation", directed = false, "T1", "T3"))
    // T3 is a multi-span entity (discontinuous T line)
    val (examples, fns) = ExampleGenerator.forDocRejectingMultiSpan(
      mentions, gold, Nil, TaskConfig.complexTome, multiSpanIds = Set("T3"))
    // no generated example may touch T3 (ann_io:56-61 rejection)
    assert(examples.forall(e => e.e1 != "T3" && e.e2 != "T3"))
    assert(examples.exists(e => e.e1 == "T1" && e.e2 == "T2" &&
      e.labels == Seq("Complex_formation")))
    // the lost gold positive surfaces as an FN row
    assert(fns.length == 1 && fns.head.e2 == "T3" &&
      fns.head.labels == Seq("Complex_formation"))
  }

  test("multi-span FN rows reach InternalMetrics as gold-pos/pred-neg") {
    val mentions = Seq(
      Mention("d", "T1", "Protein", 0, 3, "p53", "nA", 0),
      Mention("d", "T3", "Protein", 20, 24, "XYZ2", "nC", 0))
    val gold = Seq(
      ExampleGenerator.GoldRel("d", "Complex_formation", directed = false, "T1", "T3"))
    val (_, fns) = ExampleGenerator.forDocRejectingMultiSpan(
      mentions, gold, Nil, TaskConfig.complexTome, multiSpanIds = Set("T3"))
    val scored = Seq(("d", "a", "b", "neg", "neg"))
      .toDF("doc_id", "e1", "e2", "gold_label", "pred_label")
    val unfitted = fns.map(f => (f.doc_id, f.e1, f.e2, f.labels.head))
      .toDF("doc_id", "e1", "e2", "gold_label")
    val report = InternalMetrics.compute(scored, unfitted)
    val cf = report.perClass.find(_.label == "Complex_formation").get
    assert(cf.fn == 1 && cf.tp == 0,
      s"multi-span gold positive must land as FN: $report")
  }

  test("A7 best-run selection: max score, earliest run wins ties (strict >)") {
    val runs = Seq((1, 0.90), (2, 0.95), (3, 0.95), (4, 0.80))
      .toDF("run_id", "evaluation_score")
    val best = graft.eval.BestRun.select(runs).head()
    assert(best.getInt(0) == 2, s"strict-greater update keeps run 2: $best")
  }

  test("regulation augmentation: directed rule closure over the label set") {
    val preds = Seq(
      ("p1", Seq("Positive_regulation>")),
      ("p2", Seq("Regulation_of_transcription<", "Complex_formation")),
      ("p3", Seq("Complex_formation")),
      ("p4", Seq("Positive_regulation>", "Regulation>"))) // already closed
      .toDF("pair_id", "labels")
    val out = RegulationAugmentation.augment(preds)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("p1") == Seq("Positive_regulation>", "Regulation>"))
    assert(out("p2") == Seq("Complex_formation", "Regulation<",
      "Regulation_of_transcription<"))
    assert(out("p3") == Seq("Complex_formation"), "no rule fires — unchanged")
    assert(out("p4") == Seq("Positive_regulation>", "Regulation>"), "idempotent")
  }
}
