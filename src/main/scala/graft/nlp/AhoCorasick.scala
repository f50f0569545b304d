package graft.nlp

import scala.collection.mutable

/** Serializable Aho-Corasick automaton for multi-pattern dictionary
  * matching in one pass over document text.
  *
  * This is the engine's scale path for mention detection (SURVEY.md §7.1
  * module `nlp`): the entity dictionary (protein surfaces + aliases,
  * FIXTURES.md §2) is compiled once on the driver, broadcast, and each
  * document is scanned in O(|text| + matches) inside a narrow map — the
  * Spark-first replacement for the reference corpus's precomputed `T`
  * entity lines (brat_json_converter.py:80-88). A per-pattern `indexOf`
  * scan would be O(|dict| · |text|) and fall over at 100 TB; Aho-Corasick
  * is independent of dictionary size at scan time.
  *
  * Matches are emitted only on word boundaries (chars adjacent to the match
  * must be non-word), mirroring token-aligned entity spans in the corpus.
  */
final class AhoCorasick private (
    // flat automaton arrays — compact to serialize/broadcast
    private val next: Array[mutable.HashMap[Char, Int]],
    private val fail: Array[Int],
    private val out: Array[List[Int]],   // pattern ids ending at this node
    val patterns: Array[String],
    val payloads: Array[(String, String)] // (norm_id, tag) per pattern
) extends Serializable {
  import AhoCorasick.Match

  private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** All word-boundary-valid dictionary matches in `text`; offsets are
    * `base`-shifted (doc-absolute). Overlapping matches are all emitted,
    * as in brat corpora where entity spans may overlap. */
  def findAll(text: String, base: Int = 0): Seq[Match] = {
    val res = Seq.newBuilder[Match]
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      var s = state
      while (s != 0 && !next(s).contains(c)) s = fail(s)
      state = next(s).getOrElse(c, 0)
      var o = state
      // out-links are pre-propagated through fail links at build time
      out(o).foreach { pid =>
        val p = patterns(pid)
        val b = i + 1 - p.length
        val leftOk = b == 0 || !isWordChar(text.charAt(b - 1))
        val rightOk = i + 1 == n || !isWordChar(text.charAt(i + 1))
        if (leftOk && rightOk) {
          val (norm, tag) = payloads(pid)
          res += Match(base + b, base + i + 1, p, norm, tag)
        }
      }
      i += 1
    }
    res.result()
  }
}

object AhoCorasick {
  final case class Match(bgn: Int, end: Int, surface: String, norm_id: String, tag: String)

  /** Build the automaton from (surface, norm_id, tag) dictionary rows.
    * Duplicate surfaces keep the lexicographically-smallest norm_id so the
    * automaton is deterministic regardless of input row order. */
  def build(dict: Seq[(String, String, String)]): AhoCorasick = {
    val entries = dict.filter(_._1.nonEmpty)
      .groupBy(_._1).toSeq
      .map { case (surface, rows) => (surface, rows.minBy(r => (r._2, r._3))) }
      .sortBy(_._1)
    val patterns = entries.map(_._1).toArray
    val payloads = entries.map { case (_, (_, n, t)) => (n, t) }.toArray

    val next = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val outB = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { c =>
        s = next(s).getOrElseUpdate(c, {
          next += mutable.HashMap.empty[Char, Int]
          outB += Nil
          next.length - 1
        })
      }
      outB(s) = pid :: outB(s)
    }
    val fail = Array.fill(next.length)(0)
    val queue = mutable.Queue.empty[Int]
    next(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      next(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(v) = if (next(f).contains(c) && next(f)(c) != v) next(f)(c) else 0
        outB(v) = outB(v) ++ outB(fail(v)) // propagate outputs through fail links
        queue.enqueue(v)
      }
    }
    new AhoCorasick(next.toArray, fail, outB.toArray, patterns, payloads)
  }
}
