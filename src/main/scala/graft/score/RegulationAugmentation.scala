package graft.score

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Post-scoring multi-label closure rules — the engine analog of the
  * reference's regulation augmentation
  * (helpers/preds_regulation_augmentation.py:1-73): in multi-label mode,
  * any predicted `Positive_regulation> / Negative_regulation> /
  * Regulation_of_gene_expression> / Regulation_of_proteolysis> /
  * Regulation_of_transcription>` implies `Regulation>` (and likewise for
  * the `<` direction). The reference mutates the one-hot prediction matrix
  * row-by-row on the driver; the engine expresses the same closure as ONE
  * column expression over the `labels: array<string>` column — per-row,
  * codegen'd, no shuffle, so it costs a projection at any corpus scale.
  *
  * Unused for the ComplexTome config (binary, one relation type —
  * relation_extraction_pipeline.py:117-122 only invokes it for
  * multi-label), but it is a reference capability and the generic rule
  * table covers any directed multi-label task.
  */
object RegulationAugmentation {

  /** The reference's rule table (preds_regulation_augmentation.py:37-52),
    * symmetrized over both direction suffixes. */
  val regulationRules: Seq[(String, String)] = for {
    dir <- Seq(">", "<")
    src <- Seq("Positive_regulation", "Negative_regulation",
      "Regulation_of_gene_expression", "Regulation_of_proteolysis",
      "Regulation_of_transcription")
  } yield (src + dir, "Regulation" + dir)

  /** The closure as a pure column expression: labels ∪ {to | (from→to) ∈
    * rules, from ∈ labels}, deduplicated and sorted (label sets are sorted
    * throughout the engine — A1 semantics). */
  def augmentColumn(labels: Column, rules: Seq[(String, String)]): Column = {
    val implied = rules.map { case (from, to) =>
      when(array_contains(labels, from), array(lit(to)))
        .otherwise(array().cast("array<string>"))
    }
    sort_array(array_distinct(concat(labels +: implied: _*)))
  }

  /** Apply the rule table to `labelCol` of a predictions frame. */
  def augment(preds: DataFrame, labelCol: String = "labels",
              rules: Seq[(String, String)] = regulationRules): DataFrame =
    preds.withColumn(labelCol, augmentColumn(col(labelCol), rules))
}
