package graft.canon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ENTITY-RESOLUTION CANDIDATE GENERATION — the step BEFORE the equiv
  * edges that [[ConnectedComponents]] closes: given a table of entity
  * mentions with a surface-form name column, propose the near-duplicate
  * name pairs an ER pipeline would review or auto-merge. The reference
  * pipeline receives its equivalences pre-annotated (brat `Equiv` lines);
  * a production KG build has to DISCOVER them, and the standard shape is
  * blocking + pairwise verification (the Fellegi–Sunter tradition;
  * token blocking per the ER-survey canon):
  *
  *   1. collapse mentions to DISTINCT names with a support count (the
  *      survivorship weight a merge step uses to pick the canonical
  *      representative);
  *   2. BLOCK on shared name tokens — only names sharing a token are
  *      ever paired, replacing the O(n²) cross join with per-token
  *      blocks. A token shared by more than `maxBlockNames` names is
  *      dropped as a blocking key (a stopword-ish token pairs everything
  *      with everything — the blocking-key analog of the hot-key skew
  *      every large join fights; capping it bounds any block to
  *      `maxBlockNames²` pairs, so AQE never even sees the skew);
  *   3. VERIFY each candidate pair once with Levenshtein edit distance
  *      (codegen'd built-in, no UDF) and keep pairs within `maxEdit`.
  *
  * Blocking recall caveat (inherent to the method, documented not
  * hidden): a pair whose ONLY difference is the shared token itself —
  * i.e. two single-token names — or whose every shared token is capped
  * away, is never proposed. Production stacks a second blocking pass
  * (e.g. character q-grams) for those; the q-gram pass is this same
  * function with a q-gram explode.
  *
  * Scale shape at a billion mentions: the mention table collapses to the
  * distinct-name table in one map-side-combinable count; everything
  * after runs on names (vocabulary-sized, orders of magnitude smaller).
  * The block self-join shuffles on the token key — bounded per key by
  * the cap; the verify is a per-row expression on the deduped pair set.
  *
  * @param mentions      one row per entity mention.
  * @param nameCol       surface-form column to resolve on.
  * @param maxEdit       keep pairs with levenshtein <= this.
  * @param maxBlockNames drop blocking tokens shared by more names.
  * @return (name_a, name_b, edit_dist, n_shared_tokens, n_ids_a,
  *         n_ids_b) with name_a < name_b; n_shared_tokens counts the
  *         surviving blocking tokens the pair shares. Feed pairs at
  *         auto-merge confidence into [[ConnectedComponents]] as equiv
  *         edges for the transitive merge closure. */
object ErCandidates {
  def nameCandidates(mentions: DataFrame, nameCol: String,
                     maxEdit: Int, maxBlockNames: Long): DataFrame = {
    val names = mentions.filter(col(nameCol).isNotNull)
      .groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_ids"))
    // blocking keys: distinct (name, token); a token repeated inside one
    // name blocks once
    val tok = names
      .select(col("name"), explode(split(col("name"), " ")).as("tok"))
      .filter(col("tok") =!= "").distinct()
    // frequency-capped key set — token-vocabulary-sized, broadcastable
    val keep = tok.groupBy("tok").agg(count(lit(1)).as("n_names"))
      .filter(col("n_names") <= maxBlockNames).select("tok")
    val blocked = tok.join(broadcast(keep), "tok")
    val pairs = blocked.select(col("tok"), col("name").as("name_a"))
      .join(blocked.select(col("tok"), col("name").as("name_b")), "tok")
      .filter(col("name_a") < col("name_b"))
      .groupBy("name_a", "name_b")
      .agg(count(lit(1)).as("n_shared_tokens"))
      .withColumn("edit_dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("edit_dist") <= maxEdit)
    pairs
      .join(names.select(col("name").as("name_a"), col("n_ids").as("n_ids_a")), "name_a")
      .join(names.select(col("name").as("name_b"), col("n_ids").as("n_ids_b")), "name_b")
      .select(col("name_a"), col("name_b"), col("edit_dist"),
        col("n_shared_tokens"), col("n_ids_a"), col("n_ids_b"))
  }
}
