package graft.score

import graft.core._
import graft.nlp.Tokenizer
import graft.nlp.Tokenizer.Token

/** Pair-window encoding (SURVEY.md §2.5 W3, §2.2 F5, §2.7 C7-C10).
  *
  * Mirrors the reference's encoder
  * (helpers/ann_io_generator_cross_sentence_MD.py):
  *  - the document is tokenized ONCE and every pair window is a slice —
  *    the reference's own key optimization (:48-90 then :158-219; see
  *    SURVEY.md §4 "whole-document tokenize once");
  *  - MASK_EVERYTHING representation (:92-156, :221-297): the two focus
  *    mentions become `[unused1]`, every other entity mention `[unused2]`,
  *    with original char offsets tracked through masking — this is the
  *    strategy the shipped best model uses
  *    (TrainRelationExtractionSystem/ct_train_pipeline.py:105);
  *  - F5 window-fit predicate (:178-181, :243-246): pair token distance +
  *    reserved-mark budget must fit max_seq_len; unfitted pairs are NOT
  *    silently dropped — they surface as false negatives in evaluation
  *    exactly like the reference's FN accounting (:401-523);
  *  - W3 window slice: ⌊(max_len − (dist+reserve))/2⌋ tokens before/after
  *    the pair, clamped to doc bounds (:183-198, :248-262).
  *
  * Padding (C10) is unnecessary: no tensor batch exists — the scorer is a
  * row iterator, so windows stay variable-length.
  */
object WindowEncoder extends Serializable {

  val FocusMask = "[unused1]"
  val OtherMask = "[unused2]"
  /** MASK strategy reserves 4 positions (CLS/SEP + 2 masks) per
    * ann_io_generator_cross_sentence_MD.py:243-246. */
  val MaskReserve = 4

  /** Per-token mention ownership (mention_id or null), computed ONCE per
    * document and shared across all of its pair encodings. */
  def owners(tokens: IndexedSeq[Token], allMentions: Seq[Mention]): Array[String] = {
    val mentionRanges = allMentions.map(m => (m.bgn, m.end, m.mention_id)).sortBy(_._1)
    tokens.map { t =>
      mentionRanges.find(r => t.bgn >= r._1 && t.end <= r._2).map(_._3).orNull
    }.toArray
  }

  /** Token-index geometry of one pair: (t1, t1e, t2, t2e, dist, fitted).
    * Pure binary-search arithmetic — no allocation; lets scorers apply the
    * F5 fit predicate and positional rules without building a window. */
  def geometry(tokens: IndexedSeq[Token], p: CandidatePair,
               maxSeqLen: Int): (Int, Int, Int, Int, Int, Boolean) = {
    val t1 = Tokenizer.tokenIndexAt(tokens, p.e1_bgn)
    val t1e = math.max(t1, Tokenizer.tokenIndexAt(tokens, p.e1_end - 1))
    val t2 = Tokenizer.tokenIndexAt(tokens, p.e2_bgn)
    val t2e = math.max(t2, Tokenizer.tokenIndexAt(tokens, p.e2_end - 1))
    val dist = t2e - t1 + 1
    (t1, t1e, t2, t2e, dist, dist + MaskReserve <= maxSeqLen)
  }

  /** Encode one pair against the shared owner array (W3 slice + MASK). */
  def encodeOne(tokens: IndexedSeq[Token], owner: Array[String],
                p: CandidatePair, maxSeqLen: Int): EncodedPair = {
    val (t1, _, _, t2e, dist, fitted) = geometry(tokens, p, maxSeqLen)
    if (!fitted) {
      EncodedPair(p.doc_id, p.e1, p.e2, p.e1_norm, p.e2_norm,
        p.sent_dist, p.cross_sentence, Nil, Nil, Nil, dist, fitted = false)
    } else {
      val countAround = (maxSeqLen - (dist + MaskReserve)) / 2
      val wBgn = math.max(0, t1 - countAround)
      val wEnd = math.min(tokens.length, t2e + 1 + countAround)
      val sliceIdx = wBgn until wEnd
      val masked = sliceIdx.map { i =>
        val t = tokens(i)
        // focus masking decided by the PAIR's char ranges, not the owner
        // array: with overlapping dictionary surfaces (AhoCorasick emits
        // overlaps) the owner array may attribute a focus token to an
        // earlier enclosing mention, which would render it [unused2] and
        // silently lose the pair — the focus check must win
        val isFocus =
          (t.bgn >= p.e1_bgn && t.end <= p.e1_end) ||
            (t.bgn >= p.e2_bgn && t.end <= p.e2_end)
        if (isFocus) FocusMask
        else if (owner(i) != null) OtherMask
        else t.text
      }
      EncodedPair(p.doc_id, p.e1, p.e2, p.e1_norm, p.e2_norm,
        p.sent_dist, p.cross_sentence,
        masked, sliceIdx.map(tokens(_).bgn), sliceIdx.map(tokens(_).end),
        dist, fitted = true)
    }
  }

  /** Encode every candidate pair of one document against its token array.
    * `allMentions` = every detected mention (for [unused2] masking). */
  def encodeDoc(tokens: IndexedSeq[Token], pairs: Seq[CandidatePair],
                allMentions: Seq[Mention], maxSeqLen: Int): Seq[EncodedPair] = {
    if (pairs.isEmpty) return Nil
    val owner = owners(tokens, allMentions)
    pairs.map(p => encodeOne(tokens, owner, p, maxSeqLen))
  }
}
