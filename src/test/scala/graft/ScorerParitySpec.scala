package graft

import graft.core._
import graft.nlp.{MentionDetector, SentenceSplitter, Tokenizer}
import graft.pairs.PairGenerator
import graft.score.{LexiconScorer, RelationScorer, WindowEncoder}
import org.scalatest.funsuite.AnyFunSuite

/** The LexiconScorer's zero-allocation per-doc fast path must score every
  * pair identically to the reference-shaped encode-then-score path. */
class ScorerParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // a default-path scorer: same lexicon, no scoreDoc override
  class SlowScorer(lx: Set[String]) extends RelationScorer {
    private val inner = new LexiconScorer(lx)
    override def score(ps: Iterator[EncodedPair]) = inner.score(ps)
  }

  test("fast path == window path on 200 synthetic docs (every pair)") {
    val p = CorpusGen.Params(nDocs = 200)
    val dict = graft.nlp.AhoCorasick.build(
      CorpusGen.dictionary(p).map(d => (d.surface, d.norm_id, d.tag)))
    val fast = new LexiconScorer(CorpusGen.triggerLexicon)
    val slow = new SlowScorer(CorpusGen.triggerLexicon)
    var pairsSeen = 0L
    (0 until 200).foreach { i =>
      val doc = CorpusGen.genDoc(p, i).doc
      val sents = SentenceSplitter.split(doc)
      val mentions = MentionDetector.detect(doc, dict, sents)
      val pairs = PairGenerator.forDoc(mentions, TaskConfig.complexTome)
      val tokens = Tokenizer.tokenize(SentenceSplitter.docText(doc))
      val a = fast.scoreDoc(tokens, mentions, pairs, 128).toSeq
        .map(s => (s.e1, s.e2, s.score_neg, s.score_pos, s.tokens))
      val b = slow.scoreDoc(tokens, mentions, pairs, 128).toSeq
        .map(s => (s.e1, s.e2, s.score_neg, s.score_pos,
          // the fast path drops windows for negatives — normalize
          if (s.score_pos > s.score_neg) s.tokens else Nil))
      pairsSeen += a.length
      assert(a == b, s"divergence in doc ${doc.doc_id}")
    }
    assert(pairsSeen > 1000, s"too few pairs exercised: $pairsSeen")
  }

  test("overlapping dictionary surfaces: focus masking wins over the owner array") {
    // 'alpha p53' encloses 'p53' — AhoCorasick emits both. The window path
    // must focus-mask the p53 token for the (p53, ABC1) pair even though
    // the owner array attributes it to the enclosing mention; otherwise the
    // two scorer paths contradict each other and positives are lost.
    val ac = graft.nlp.AhoCorasick.build(Seq(
      ("alpha p53", "nA", "Protein"), ("p53", "nB", "Protein"),
      ("ABC1", "nC", "Protein")))
    val doc = Doc("d", Seq(Span("text", "alpha p53 binds ABC1.", "", 0)))
    val sents = SentenceSplitter.split(doc)
    val mentions = MentionDetector.detect(doc, ac, sents)
    assert(mentions.length == 3, s"expected overlapping mentions: $mentions")
    val pairs = PairGenerator.forDoc(mentions, TaskConfig.complexTome)
    val tokens = Tokenizer.tokenize(SentenceSplitter.docText(doc))
    val lx = Set("binds")
    val fast = new LexiconScorer(lx)
      .scoreDoc(tokens, mentions, pairs, 128).toSeq
      .map(s => (s.e1, s.e2) -> (s.score_pos > s.score_neg)).toMap
    val slow = new SlowScorer(lx)
      .scoreDoc(tokens, mentions, pairs, 128).toSeq
      .map(s => (s.e1, s.e2) -> (s.score_pos > s.score_neg)).toMap
    assert(fast == slow, s"paths diverge: fast=$fast slow=$slow")
    // the p53–ABC1 pair (overlapped focus) must be positive in BOTH paths
    val p53 = mentions.find(m => m.text == "p53").get.mention_id
    val abc = mentions.find(m => m.text == "ABC1").get.mention_id
    assert(fast((p53, abc)), "overlapped focus mention must still score positive")
  }

  test("fast path applies the F5 fit predicate identically") {
    val p = CorpusGen.Params(nDocs = 300)
    val dict = graft.nlp.AhoCorasick.build(
      CorpusGen.dictionary(p).map(d => (d.surface, d.norm_id, d.tag)))
    val fast = new LexiconScorer(CorpusGen.triggerLexicon)
    var unfittedSeen = 0
    (0 until 300).foreach { i =>
      val doc = CorpusGen.genDoc(p, i).doc
      val mentions = MentionDetector.detect(doc, dict, SentenceSplitter.split(doc))
      val pairs = PairGenerator.forDoc(mentions, TaskConfig.complexTome)
      val tokens = Tokenizer.tokenize(SentenceSplitter.docText(doc))
      val unfitted = WindowEncoder.encodeDoc(tokens, pairs, mentions, 128)
        .filterNot(_.fitted).map(e => (e.e1, e.e2)).toSet
      unfittedSeen += unfitted.size
      val scoredKeys = fast.scoreDoc(tokens, mentions, pairs, 128)
        .map(s => (s.e1, s.e2)).toSet
      assert(scoredKeys.intersect(unfitted).isEmpty,
        "fast path scored a pair the fit predicate must drop")
      assert(scoredKeys.size == pairs.size - unfitted.size)
    }
    assert(unfittedSeen > 0, "corpus must contain unfitted pairs")
  }
}
