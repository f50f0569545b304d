package graft.score

/** Prediction decode (SURVEY.md C3/C6).
  *
  * C6 — argmax over the 2-class scores; argmax(softmax) == argmax(logits)
  * per helpers/pt_model_helper.py:353-371, so the engine never materializes
  * a softmax.
  *
  * C3 — direction-suffix handling for directed relation types
  * (large_scale_prediction_pipeline_tf.py:388-398, pt:470-504): a predicted
  * label `Regulation>` strips to type `Regulation` with (e1, e2) in
  * declared order; `Regulation<` additionally swaps the arguments. For
  * ComplexTome's undirected `Complex_formation` this is the identity, but
  * the engine keeps the general decode so directed task configs work.
  */
object Decode {

  val NegativeLabel = "neg"

  /** argmax decode of the 2-class pseudo-logits. */
  def argmax(scoreNeg: Double, scorePos: Double, positiveLabel: String): String =
    if (scorePos > scoreNeg) positiveLabel else NegativeLabel

  /** (relType, arg1, arg2) after direction-suffix strip/swap. */
  def direction(label: String, e1: String, e2: String): (String, String, String) =
    if (label.endsWith(">")) (label.dropRight(1), e1, e2)
    else if (label.endsWith("<")) (label.dropRight(1), e2, e1)
    else (label, e1, e2)
}
