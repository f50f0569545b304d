package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A7 best-epoch selection analog (SURVEY §2.4 — reference:
  * relation_extraction_pipeline.py:429-441, pt:356-370): the training loop
  * keeps the epoch maximizing `evaluation_score`, with a STRICT `>`
  * comparison, so the earliest of tied runs wins. Training itself is out of
  * engine scope; the analog selects the best calibration run from a
  * metrics table — one TakeOrderedAndProject, no full sort materialization.
  */
object BestRun {

  /** The best run row: max evaluation score, earliest run id on ties
    * (the reference's strict-greater update rule). */
  def select(runs: DataFrame, scoreCol: String = "evaluation_score",
             idCol: String = "run_id"): DataFrame =
    runs.orderBy(col(scoreCol).desc, col(idCol)).limit(1)
}
