package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}
import scala.util.Random

/** Deterministic synthetic corpus generator (FIXTURES.md §1-5).
  *
  * Produces the BASELINE `input_hint` table — interleaved text+media
  * documents — plus the entity dictionary, equivalence edges, and gold
  * annotations, all seeded. The construction guarantees the evaluation is
  * well-defined (FIXTURES.md §5): a pair is gold-positive iff a trigger
  * lexicon phrase occurs strictly between the two mentions within one
  * sentence — the exact features the deterministic LexiconScorer reads —
  * so a micro-P/R below the 0.95 gate indicates a genuine pipeline bug,
  * not model noise. A controlled ~1.5% of positives are planted in
  * over-length sentences so the max-seq-len fit predicate (F5) produces
  * real false negatives, exercising the reference's FN accounting
  * (ann_io_generator_cross_sentence_MD.py:401-523).
  *
  * Generation is distributed and order-independent: each doc derives from
  * its own RNG seeded by (globalSeed, docIdx), so output is identical at
  * any parallelism — required for the local[8] vs local[32] scaling bench.
  *
  * Scale knobs mirror the real sample shard density (525 docs / 17.5k
  * entities, BASELINE.md row 5) and plant hot-entity skew: ~1% of entities
  * appear in ~30% of docs (p53 analogs) to exercise skew handling.
  */
object CorpusGen {

  /** Trigger lexicon — biomedical interaction cue words in the spirit of
    * the reference's devel trigger words
    * (LargeScaleTriggerDetectionPipeline/large_scale_explanation_helper
    * .py:31-40). Shared with the LexiconScorer. */
  val triggerLexicon: Set[String] = Set(
    "binds", "interacts", "associates", "complex", "heterodimer",
    "coprecipitates", "dimerizes", "attaches")

  /** Filler vocabulary — disjoint from trigger words and from every
    * dictionary surface (surfaces are uppercase synthetic symbols). */
  val fillerVocab: IndexedSeq[String] = IndexedSeq(
    "the", "cell", "was", "observed", "in", "assay", "with", "under",
    "condition", "sample", "tissue", "culture", "measured", "level",
    "expression", "of", "and", "a", "control", "result", "showed",
    "signal", "pathway", "response", "after", "treatment", "during",
    "growth", "phase", "analysis", "data", "indicated", "presence",
    "high", "low", "activity", "rate", "value", "test", "group")

  case class Params(
      nDocs: Int,
      nEntities: Int = 400,
      seed: Long = 42L,
      hotEntityFrac: Double = 0.01,
      hotDocFrac: Double = 0.30,
      pPositiveSentence: Double = 0.25,
      // fraction of ALL sentences that are over-length positives; ~1.6% of
      // positives (0.004/0.25) — enough to exercise F5's FN accounting,
      // small enough that recall stays above the 0.95 gate
      pLongPositive: Double = 0.004,
      equivGroupSize: Int = 3)

  /** One generated document bundle: the input row + its gold fixtures. */
  case class GenDoc(doc: Doc, goldMentions: Seq[GoldMention],
                    goldRelations: Seq[GoldRelation])

  /** STRING-style norm id (format per the `#` AnnotatorNotes in the real
    * sample shard, e.g. `9606.ENSP00000269305`). */
  def normId(i: Int): String = f"9606.ENSP$i%08d"

  /** Canonical id of entity i: min norm id of its equiv group — groups are
    * consecutive blocks of `equivGroupSize` ids. */
  def canonicalOf(i: Int, groupSize: Int): String =
    normId((i / groupSize) * groupSize)

  /** Dictionary: every entity gets a primary surface and one alias; the
    * surfaces are synthetic uppercase symbols disjoint from filler words. */
  def dictionary(p: Params): Seq[DictEntry] =
    (0 until p.nEntities).flatMap { i =>
      Seq(DictEntry(s"PROT${i}Q", normId(i), "Protein"),
          DictEntry(s"GEN${i}X", normId(i), "Protein"))
    }

  /** Equivalence edges: chain within each equiv group (the cross-reference
    * identity edges canonicalization must close over). */
  def equivEdges(p: Params): Seq[EquivEdge] =
    (0 until p.nEntities).filter(i => i % p.equivGroupSize != 0)
      .map(i => EquivEdge(normId(i - 1), normId(i)))

  /** Generate one document deterministically from (seed, idx). */
  def genDoc(p: Params, idx: Long): GenDoc = {
    val rng = new Random(p.seed * 1000003L + idx)
    val docId = f"$idx%08d"
    val nHot = math.max(1, (p.nEntities * p.hotEntityFrac).toInt)
    val isHotDoc = rng.nextDouble() < p.hotDocFrac
    def pickEntity(): Int =
      if (isHotDoc && rng.nextDouble() < 0.5) rng.nextInt(nHot)
      else rng.nextInt(p.nEntities)
    def surfaceOf(i: Int): String =
      if (rng.nextBoolean()) s"PROT${i}Q" else s"GEN${i}X"
    def filler(n: Int): Seq[String] =
      Seq.fill(n)(fillerVocab(rng.nextInt(fillerVocab.length)))
    val triggers = triggerLexicon.toIndexedSeq.sorted

    val nSent = 1 + rng.nextInt(12)
    // build sentences as word lists; remember planted mentions per sentence
    case class Planted(words: Seq[String], mentionWordIdx: Seq[(Int, Int)],
                       positivePair: Option[(Int, Int)]) // entity ids
    val sents: Seq[Planted] = (0 until nSent).map { _ =>
      val roll = rng.nextDouble()
      if (roll < p.pLongPositive) {
        // over-length positive: window-fit predicate must reject it → FN
        val e1 = pickEntity()
        val e2 = Iterator.continually(pickEntity())
          .find(e => canonicalOf(e, p.equivGroupSize) != canonicalOf(e1, p.equivGroupSize)).get
        val pad = filler(160) // > maxSeqLen tokens between the mentions
        val words = Seq(surfaceOf(e1), triggers(rng.nextInt(triggers.length))) ++
          pad ++ Seq(surfaceOf(e2))
        Planted(words, Seq((0, e1), (words.length - 1, e2)), Some((e1, e2)))
      } else if (roll < p.pPositiveSentence) {
        // positive: exactly two mentions with a trigger strictly between
        val e1 = pickEntity()
        val e2 = Iterator.continually(pickEntity())
          .find(e => canonicalOf(e, p.equivGroupSize) != canonicalOf(e1, p.equivGroupSize)).get
        val pre = filler(rng.nextInt(4))
        val mid1 = filler(rng.nextInt(3))
        val mid2 = filler(rng.nextInt(3))
        val post = filler(rng.nextInt(4))
        val words = pre ++ Seq(surfaceOf(e1)) ++ mid1 ++
          Seq(triggers(rng.nextInt(triggers.length))) ++ mid2 ++
          Seq(surfaceOf(e2)) ++ post
        val i1 = pre.length
        val i2 = pre.length + 1 + mid1.length + 1 + mid2.length
        Planted(words, Seq((i1, e1), (i2, e2)), Some((e1, e2)))
      } else if (roll < 0.7) {
        // mention sentence: 1-4 mentions, no trigger anywhere → negatives
        val ents = Seq.fill(1 + rng.nextInt(4))(pickEntity())
        val base = filler(3 + rng.nextInt(8))
        var words = base
        var idxs = Seq.empty[(Int, Int)]
        ents.foreach { e =>
          val at = rng.nextInt(words.length + 1)
          words = (words.take(at) :+ surfaceOf(e)) ++ words.drop(at)
          idxs = idxs.map { case (i, x) => (if (i >= at) i + 1 else i, x) } :+ ((at, e))
        }
        Planted(words, idxs.sortBy(_._1), None)
      } else Planted(filler(3 + rng.nextInt(8)), Nil, None)
    }

    // lay out sentence text with ". " terminators; record mention offsets
    val text = new StringBuilder
    val mentions = Seq.newBuilder[(Int, Int, String, Int)] // bgn, end, surface, entity
    val sentRanges = Seq.newBuilder[(Int, Int)]
    sents.foreach { s =>
      val sentBgn = text.length
      s.words.zipWithIndex.foreach { case (w, wi) =>
        if (wi > 0) text.append(' ')
        val b = text.length
        text.append(w)
        if (s.mentionWordIdx.exists(_._1 == wi)) {
          val e = s.mentionWordIdx.find(_._1 == wi).get._2
          mentions += ((b, b + w.length, w, e))
        }
      }
      text.append('.')
      sentRanges += ((sentBgn, text.length))
      text.append(' ')
    }
    val fullText = text.toString.stripSuffix(" ")

    // split into 1-3 text spans at sentence boundaries + interleaved media
    val ranges = sentRanges.result()
    val cutPoints: Seq[Int] =
      if (ranges.length < 2) Seq.empty
      else (0 until rng.nextInt(3)).map(_ => ranges(rng.nextInt(ranges.length - 1))._2 + 1)
        .distinct.sorted.filter(c => c > 0 && c < fullText.length)
    val pieces = (Seq(0) ++ cutPoints ++ Seq(fullText.length)).distinct.sorted
      .sliding(2).map { case Seq(a, b) => (a, fullText.substring(a, b)) }.toSeq
    var mediaCount = 0
    var offsetShift = 0
    val spans = Seq.newBuilder[Span]
    // (original piece start, shift applied to chars at/after it) — media
    // spans occupy one virtual char each so offsets stay strictly increasing
    val shifts = Seq.newBuilder[(Int, Int)]
    pieces.zipWithIndex.foreach { case ((origOff, t), pi) =>
      if (pi > 0 && rng.nextDouble() < 0.4) {
        spans += Span("media", "", s"media://$docId/$mediaCount", origOff + offsetShift)
        mediaCount += 1
        offsetShift += 1
      }
      shifts += ((origOff, offsetShift))
      spans += Span("text", t, "", origOff + offsetShift)
    }
    val builtSpans = spans.result()
    val shiftTable = shifts.result()
    // mention offsets move by the media shift of the piece containing them
    def shiftedOffset(orig: Int): Int =
      orig + shiftTable.takeWhile(_._1 <= orig).lastOption.map(_._2).getOrElse(0)

    val goldMentions = mentions.result().sortBy(_._1).zipWithIndex.map {
      case ((b, e, surf, ent), i) =>
        GoldMention(docId, s"T${i + 1}", "Protein",
          shiftedOffset(b), shiftedOffset(b) + (e - b), surf, normId(ent))
    }
    val goldRelations = sents.flatMap(_.positivePair).map { case (a, b) =>
      val ca = canonicalOf(a, p.equivGroupSize)
      val cb = canonicalOf(b, p.equivGroupSize)
      val (lo, hi) = if (ca <= cb) (ca, cb) else (cb, ca)
      GoldRelation(docId, "Complex_formation", lo, hi)
    }
    GenDoc(Doc(docId, builtSpans), goldMentions, goldRelations)
  }

  /** Distributed generation: identical output at any parallelism. */
  def generate(spark: SparkSession, p: Params): Dataset[GenDoc] = {
    import spark.implicits._
    spark.range(p.nDocs).map(i => genDoc(p, i))
  }

  def docs(gen: Dataset[CorpusGen.GenDoc])(implicit spark: SparkSession): Dataset[Doc] = {
    import spark.implicits._
    gen.map(_.doc)
  }

  def goldRelations(gen: Dataset[GenDoc])(implicit spark: SparkSession): Dataset[GoldRelation] = {
    import spark.implicits._
    gen.flatMap(_.goldRelations)
  }

  def goldMentions(gen: Dataset[GenDoc])(implicit spark: SparkSession): Dataset[GoldMention] = {
    import spark.implicits._
    gen.flatMap(_.goldMentions)
  }
}
