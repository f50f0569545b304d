package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standoff-evaluation semantics (SURVEY.md J7/J8/A5/A6) — the engine port
  * of the reference's conformance oracle
  * `TrainRelationExtractionSystem/evalsorel.py`:
  *  - equiv resolution: relation args map to their equivalence-set
  *    representative before matching (:100-108) — here both sides arrive
  *    already canonicalized (ConnectedComponents uses the identical
  *    min-representative rule);
  *  - symmetric types match on unordered arg sets (:13-15, :324-338) →
  *    equi-join on (doc_id, type, least(a,b), greatest(a,b));
  *  - duplicate relations are dropped before counting (:341-352) →
  *    `distinct` on the match key;
  *  - micro P/R/F accumulated over the corpus (:359-372, :443-453);
  *  - false negatives from pairs that did not fit max_seq_len are unioned
  *    into the gold side as unmatched rows — the reference's FN-aware
  *    accounting (relation_extraction_pipeline_pt.py:478-638, A6).
  *
  * Everything is set-algebra on DataFrames: inner join for TP, anti-joins
  * both ways for FP/FN (no row ever leaves the cluster).
  */
object Evalsorel {

  case class Result(tp: Long, fp: Long, fn: Long) {
    def precision: Double = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    def f1: Double = {
      val p = precision; val r = recall
      if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    }
  }

  /** Normalize a relation table to the symmetric match key. Expects columns
    * (doc_id, relType, a, b); renames to the canonical unordered key. */
  private def key(df: DataFrame, relType: String, a: String, b: String): DataFrame =
    df.select(col("doc_id"), col(relType).as("rel_type"),
        least(col(a), col(b)).as("lo"), greatest(col(a), col(b)).as("hi"))
      .distinct() // duplicate dropping (evalsorel.py:341-352)

  /** Per-document equiv-representative resolution (evalsorel.py:100-108):
    * relation args are replaced by `sorted(equiv_set)[0]` of their
    * document's equiv closure before matching. `equivs` is
    * (doc_id, member, representative) — built from brat `*\tEquiv` lines
    * via PairGenerator.unionEquivSets; args without an equiv entry keep
    * their id. */
  def resolveWithEquivs(rels: DataFrame, equivs: DataFrame,
                        argCols: Seq[String]): DataFrame =
    argCols.foldLeft(rels) { (df, c) =>
      df.join(equivs.select(col("doc_id"),
          col("member").as(c), col("representative").as(s"${c}_rep")),
          Seq("doc_id", c), "left")
        .withColumn(c, coalesce(col(s"${c}_rep"), col(c)))
        .drop(s"${c}_rep")
    }

  /** @param gold   gold relations (doc_id, rel_type, arg1_norm, arg2_norm),
    *               canonical ids
    * @param pred   predicted triples (doc_id, pred, subj, obj), canonical ids
    */
  def evaluate(gold: DataFrame, pred: DataFrame)
              (implicit spark: SparkSession): Result = {
    val g = key(gold, "rel_type", "arg1_norm", "arg2_norm")
    val p = key(pred, "pred", "subj", "obj")
    val keyCols = Seq("doc_id", "rel_type", "lo", "hi")
    val tp = p.join(g, keyCols, "left_semi").count()
    val fp = p.join(g, keyCols, "left_anti").count()
    val fn = g.join(p, keyCols, "left_anti").count()
    Result(tp, fp, fn)
  }
}
