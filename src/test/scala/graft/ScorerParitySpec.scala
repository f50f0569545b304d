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
