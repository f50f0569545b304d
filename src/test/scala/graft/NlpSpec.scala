package graft

import graft.core.{Doc, Span}
import graft.nlp.{AhoCorasick, MentionDetector, SentenceSplitter, Tokenizer}
import org.scalatest.funsuite.AnyFunSuite

class NlpSpec extends AnyFunSuite {

  test("sentence splitter: boundary rule and offsets") {
    val b = SentenceSplitter.boundaries("One two. Three four! Five")
    assert(b == Seq((0, 8), (9, 20), (21, 25)))
    val doc = Doc("d1", Seq(
      Span("text", "A binds B. C here.", "", 0),
      Span("media", "", "media://d1/0", 18),
      Span("text", "D too.", "", 19)))
    val sents = SentenceSplitter.split(doc)
    assert(sents.map(_.text) == Seq("A binds B.", "C here.", "D too."))
    assert(sents.map(s => (s.bgn, s.end)) == Seq((0, 10), (11, 18), (19, 25)))
    assert(sents.map(_.sent_id) == Seq(0, 1, 2))
  }

  test("splitter: no terminal punctuation, abbreviation-free determinism") {
    assert(SentenceSplitter.boundaries("no terminator at all") == Seq((0, 20)))
    assert(SentenceSplitter.boundaries("") == Seq.empty)
    assert(SentenceSplitter.boundaries("x.y is not a boundary. ok") ==
      Seq((0, 22), (23, 25))) // '.' not followed by whitespace is internal
  }

  test("tokenizer: offsets, punctuation, binary-search lookup") {
    val toks = Tokenizer.tokenize("AB binds, CD-1.", base = 100)
    assert(toks.map(_.text) == Seq("AB", "binds", ",", "CD", "-", "1", "."))
    assert(toks.head.bgn == 100 && toks.head.end == 102)
    assert(Tokenizer.tokenIndexAt(toks, 103) == 1) // inside "binds"
    assert(Tokenizer.tokenIndexAt(toks, 100) == 0)
  }

  test("aho-corasick: word boundaries, overlaps, alias linking") {
    val ac = AhoCorasick.build(Seq(
      ("PROT1Q", "9606.E1", "Protein"),
      ("GEN1X", "9606.E1", "Protein"),
      ("PROT11Q", "9606.E11", "Protein")))
    val hits = ac.findAll("PROT1Q and PROT11Q but notPROT1Q nor PROT1Qx", 0)
    // word-boundary: the embedded and suffixed occurrences are rejected
    assert(hits.map(h => (h.surface, h.bgn)) == Seq(("PROT1Q", 0), ("PROT11Q", 11)))
    assert(hits.head.norm_id == "9606.E1")
  }

  test("mention detection: sentence assignment + T-numbering in char order") {
    val ac = AhoCorasick.build(Seq(("AA", "n1", "Protein"), ("BB", "n2", "Protein")))
    val doc = Doc("d", Seq(Span("text", "AA binds BB. BB alone here.", "", 0)))
    val ms = MentionDetector.detect(doc, ac, SentenceSplitter.split(doc))
    assert(ms.map(_.mention_id) == Seq("T1", "T2", "T3"))
    assert(ms.map(_.sent_id) == Seq(0, 0, 1))
    assert(ms.map(_.norm_id) == Seq("n1", "n2", "n2"))
    assert(ms.map(m => doc.spans.head.text.substring(m.bgn, m.end)) ==
      ms.map(_.text)) // span-text reconstruction equality (C2 invariant)
  }
}
