package graft.triggers

import graft.core._
import graft.score.WindowEncoder

/** Trigger-word detection (SURVEY.md §3.3, F8 junk filter + A8 argmax).
  *
  * The reference attributes token importance with integrated gradients
  * (LargeScaleTriggerDetectionPipeline/large_scale_pt_rel_model_loader_
  * helper.py:279-301) and then (a) discards junk tokens and (b) emits every
  * token attaining the max attribution (ties kept). The engine preserves
  * (a) and (b) exactly, replacing the gradient attribution with a
  * deterministic lexicon+proximity score — positives-only gating (F6,
  * large_scale_explanation_pipeline.py:383-390) is applied by the caller.
  *
  * F8 junk predicate (large_scale_explanation_helper.py:71-124):
  * empty spans, entity masks [unused1]/[unused2], tokens containing
  * newline/tab, all-punctuation tokens, and closed-class words (the
  * reference's ~300-entry CCWords set; here the filler vocabulary plays
  * that role on synthetic corpora).
  */
object TriggerDetector extends Serializable {

  /** Closed-class word set — the engine's CCWords analog. */
  val ccWords: Set[String] = CorpusGen.fillerVocab.toSet

  private def isPunct(t: String): Boolean =
    t.nonEmpty && t.forall(c => !Character.isLetterOrDigit(c))

  def isJunk(t: String): Boolean =
    t.isEmpty ||
      t == WindowEncoder.FocusMask || t == WindowEncoder.OtherMask ||
      t.exists(c => c == '\n' || c == '\t') ||
      isPunct(t) ||
      ccWords.contains(t.toLowerCase)

  /** Deterministic attribution analog: lexicon tokens score 2.0; other
    * valid tokens a small proximity score, so the argmax is a lexicon hit
    * whenever one exists and ties (two trigger words in one window) are
    * all emitted, matching A8 argmax-with-ties
    * (large_scale_explanation_helper.py:126-131). */
  def triggersFor(sp: ScoredPair): Seq[Trigger] = {
    val first = sp.tokens.indexOf(WindowEncoder.FocusMask)
    val last = sp.tokens.lastIndexOf(WindowEncoder.FocusMask)
    if (first < 0 || last <= first) return Nil
    val candidates = (first + 1) until last
    val scored = candidates.flatMap { i =>
      val t = sp.tokens(i)
      if (isJunk(t)) None
      else {
        val mid = (first + last) / 2.0
        val prox = 0.1 / (1.0 + math.abs(i - mid))
        val s = if (CorpusGen.triggerLexicon.contains(t)) 2.0 else prox
        Some((i, t, s))
      }
    }
    if (scored.isEmpty) Nil
    else {
      val maxS = scored.map(_._3).max
      scored.filter(_._3 == maxS).map { case (i, t, s) =>
        Trigger(sp.doc_id, sp.e1, sp.e2, sp.tokenBgns(i), sp.tokenEnds(i), t, s)
      }
    }
  }
}
