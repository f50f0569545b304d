package graft.core

/** Task configuration — the engine port of the reference's ConfigsManager
  * semantics (helpers/configs_manager.py:30-189):
  *   - valid entity tags (F1) and relation types (F2);
  *   - the *symmetrized* valid-pair closure (F3): undirected relation types
  *     admit both tag orders, directed types only the declared order
  *     (configs_manager.py:128-149);
  *   - the negative sentence-distance prune k (F4), default 7 as in
  *     LargeScaleRelationExtractionPipeline/run_ls_pipeline.py:19;
  *   - max_seq_len for the window-fit predicate (F5), default 128 per the
  *     shipped best model (TrainRelationExtractionSystem/ct_train_pipeline
  *     .py:105-115).
  *
  * For ComplexTome (LargeScaleRelationExtractionPipeline/
  * ComplexTome_configs.json:1-12): binary classification, entities
  * ["Protein"], one undirected relation Complex_formation with valid pair
  * (Protein, Protein).
  */
case class RelationSpec(relType: String, directed: Boolean,
                        validPairs: Seq[(String, String)])

case class TaskConfig(
    entities: Set[String],
    relations: Seq[RelationSpec],
    negativeSentenceDistanceCutoff: Option[Int],
    maxSeqLen: Int) {

  /** Symmetrized valid-pair closure (configs_manager.py:128-149): for
    * undirected types both (a,b) and (b,a) are valid; directed types keep
    * the declared order only. */
  val validPairClosure: Set[(String, String)] =
    relations.flatMap { r =>
      if (r.directed) r.validPairs
      else r.validPairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    }.toSet

  def isValidPair(tag1: String, tag2: String): Boolean =
    validPairClosure.contains((tag1, tag2))

  /** Negatives only — positives are never distance-pruned
    * (example_generation_cross_sentence_MD.py:259-287 applies the cutoff to
    * negative candidate generation only). */
  def passesDistancePrune(sentDist: Int): Boolean =
    negativeSentenceDistanceCutoff.forall(k => sentDist < k)
}

object TaskConfig {
  /** The ComplexTome task: binary, Protein-Protein, undirected
    * Complex_formation, k=7, max_seq_len=128. */
  val complexTome: TaskConfig = TaskConfig(
    entities = Set("Protein"),
    relations = Seq(RelationSpec("Complex_formation", directed = false,
      validPairs = Seq(("Protein", "Protein")))),
    negativeSentenceDistanceCutoff = Some(7),
    maxSeqLen = 128)

  /** Trigger detection runs with the distance cutoff disabled
    * (large_scale_pt_rel_model_loader_helper.py:96: dont_generate_negatives
    * =None → all distances). */
  val complexTomeTriggers: TaskConfig =
    complexTome.copy(negativeSentenceDistanceCutoff = None)
}
