package graft.pairs

import graft.core._
import org.apache.spark.sql.{Dataset, SparkSession}

/** Training-mode example generation — the faithful port of the reference's
  * candidate-pair labeling semantics
  * (helpers/example_generation_cross_sentence_MD.py):
  *
  *  - positives: gold relation args expanded over the per-doc equiv closure
  *    (J2, :85-92/:176-208), grouped by unordered pair with the label SET
  *    collected and sorted (A1, :196-257); directional relation types get a
  *    `>` suffix when Arg1 is the first-occurring mention and `<` otherwise
  *    (:231-257); positives are NEVER distance-pruned;
  *  - negatives: every valid-type mention pair NOT in the positives map
  *    (J4 set-minus, :282-287), pruned at sentence distance ≥ k (F4,
  *    :275-279 — the cutoff applies to negatives only);
  *  - e1 = the first-occurring mention by char offset (:311-317).
  *
  * Per-document work runs in one narrow pass (the doc owns its gold rows
  * after a single cogroup on doc_id — the only shuffle, inherent to
  * joining two tables).
  */
object ExampleGenerator {

  case class LabeledExample(doc_id: String, e1: String, e2: String,
                            labels: Seq[String], sent_dist: Int,
                            cross_sentence: Boolean)

  /** Gold relation at mention granularity (brat R line): arg ids are T-ids. */
  case class GoldRel(doc_id: String, rel_type: String, directed: Boolean,
                     arg1: String, arg2: String)

  /** Pure per-doc generation. `equivSets` are the doc's `*\tEquiv` sets. */
  def forDoc(mentions: Seq[Mention], gold: Seq[GoldRel],
             equivSets: Seq[Set[String]], config: TaskConfig): Seq[LabeledExample] = {
    val valid = mentions
      .filter(m => config.entities.contains(m.tag) && m.sent_id >= 0)
      .sortBy(m => (m.bgn, m.end, m.mention_id))
    val byId = valid.map(m => m.mention_id -> m).toMap
    val order = valid.map(_.mention_id).zipWithIndex.toMap // char order rank

    // J2: replicate each positive over the equiv crosses of its two args
    // (role order preserved for direction), then A1: aggregate sorted label
    // sets per unordered pair
    val closure = PairGenerator.unionEquivSets(equivSets)
    val setOf = closure.flatMap(s => s.map(_ -> s)).toMap
    val positives: Seq[((String, String), String)] = gold.flatMap { r =>
      for {
        x <- setOf.getOrElse(r.arg1, Set(r.arg1)).toSeq // role Arg1
        y <- setOf.getOrElse(r.arg2, Set(r.arg2)).toSeq // role Arg2
        if x != y && byId.contains(x) && byId.contains(y)
      } yield {
        val key = if (x <= y) (x, y) else (y, x)
        // direction suffix (example_generation:231-257): '>' when the
        // Arg1-role entity is the first-occurring by char offset
        val label =
          if (!r.directed) r.rel_type
          else if (order(x) <= order(y)) r.rel_type + ">"
          else r.rel_type + "<"
        (key, label)
      }
    }
    val labelsByPair: Map[(String, String), Seq[String]] =
      positives.groupBy(_._1).map { case (k, v) =>
        k -> v.map(_._2).distinct.sorted // A1: sorted label set
      }

    val examples = Seq.newBuilder[LabeledExample]
    for {
      i <- valid.indices
      j <- (i + 1) until valid.length
      a = valid(i); b = valid(j)
      if config.isValidPair(a.tag, b.tag)
    } {
      val key = if (a.mention_id <= b.mention_id) (a.mention_id, b.mention_id)
      else (b.mention_id, a.mention_id)
      val dist = math.abs(a.sent_id - b.sent_id)
      labelsByPair.get(key) match {
        case Some(labels) => // positive: never pruned
          examples += LabeledExample(a.doc_id, a.mention_id, b.mention_id,
            labels, dist, dist > 0)
        case None => // negative: F4 prune
          if (config.passesDistancePrune(dist))
            examples += LabeledExample(a.doc_id, a.mention_id, b.mention_id,
              Seq("neg"), dist, dist > 0)
      }
    }
    examples.result()
  }

  /** Multi-span entity rejection with FN accounting. The reference HALTS
    * the whole program on a `T` line with a discontinuous span
    * ("multi-span entities are not supported",
    * ann_io_generator_cross_sentence_MD.py:56-61); the engine deviates
    * intentionally (same policy as ShardReader's quarantine): it isolates
    * the entity instead of halting, and any gold positive touching one —
    * which can then never be predicted — surfaces as a FALSE NEGATIVE in
    * evaluation (the FN-aware accounting of
    * relation_extraction_pipeline_pt.py:489-501), not a silent vanish.
    *
    * @return (examples generated over single-span mentions only,
    *          FN rows for gold positives lost to the rejection — shaped
    *          like LabeledExamples so InternalMetrics unions them with the
    *          unfitted side output) */
  def forDocRejectingMultiSpan(mentions: Seq[Mention], gold: Seq[GoldRel],
                               equivSets: Seq[Set[String]], config: TaskConfig,
                               multiSpanIds: Set[String])
      : (Seq[LabeledExample], Seq[LabeledExample]) = {
    val usable = mentions.filterNot(m => multiSpanIds.contains(m.mention_id))
    val examples = forDoc(usable, gold, equivSets, config)
    val byId = mentions.map(m => m.mention_id -> m).toMap
    val fns = gold.flatMap { r =>
      val rejected = multiSpanIds.contains(r.arg1) || multiSpanIds.contains(r.arg2)
      if (!rejected) None
      else for {
        a <- byId.get(r.arg1); b <- byId.get(r.arg2)
        if config.entities.contains(a.tag) && config.entities.contains(b.tag)
      } yield {
        val label =
          if (!r.directed) r.rel_type
          else if (a.bgn < b.bgn || (a.bgn == b.bgn && a.end <= b.end)) r.rel_type + ">"
          else r.rel_type + "<"
        val dist = math.abs(a.sent_id - b.sent_id)
        LabeledExample(r.doc_id, r.arg1, r.arg2, Seq(label), dist, dist > 0)
      }
    }
    (examples, fns)
  }

  /** Dataset-level stage: one cogroup on doc_id joins mentions with gold. */
  def generate(mentions: Dataset[Mention], gold: Dataset[GoldRel],
               equivs: Dataset[(String, Seq[String])], // (doc_id, members)
               config: TaskConfig)
              (implicit spark: SparkSession): Dataset[LabeledExample] = {
    import spark.implicits._
    val goldByDoc = gold.groupByKey(_.doc_id)
    val equivByDoc = equivs.groupByKey(_._1)
    val mentionByDoc = mentions.groupByKey(_.doc_id)
    mentionByDoc.cogroup(goldByDoc) { (doc, ms, gs) =>
      Iterator((doc, ms.toSeq, gs.toSeq))
    }.groupByKey(_._1).cogroup(equivByDoc) { (doc, mg, eq) =>
      mg.flatMap { case (_, ms, gs) =>
        forDoc(ms, gs, eq.toSeq.map(_._2.toSet), config)
      }
    }
  }

  /** Per-epoch stratified negative downsampling — the engine analog of
    * helpers/negative_downsampler.py (training-only): keep all positives,
    * sample negatives at `fraction` with a deterministic seed. */
  def downsampleNegatives(examples: Dataset[LabeledExample], fraction: Double,
                          seed: Long)(implicit spark: SparkSession): Dataset[LabeledExample] = {
    import spark.implicits._
    val pos = examples.filter((e: LabeledExample) => e.labels != Seq("neg"))
    val neg = examples.filter((e: LabeledExample) => e.labels == Seq("neg"))
      .sample(withReplacement = false, fraction, seed)
    pos.union(neg)
  }
}
