package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixing operators — the step after dedup
  * and decontamination in a training-data pipeline: choose how much of
  * each stratum (language, quality band, source, length band) survives
  * into the training mix.
  */
object Sampling {

  /** Stratified downsampling with a DETERMINISTIC per-row coin: document
    * d survives iff ((A·id + B) mod P) mod 1000 < rate‰(stratum(d)).
    *
    * The coin is an integer LCG over the document id (A, B drawn from the
    * seeded full-range family in [[Dedup]], P prime), not `rand(seed)`:
    * Spark's rand assigns values by partition layout and intra-partition
    * position, so a repartitioned rerun — or a task retry after a fetch
    * failure — samples a DIFFERENT subset. The LCG coin is a pure
    * function of the row, so reruns, resumes and retries keep exactly
    * the same sample, and any SQL engine reproduces it bit-for-bit.
    * The coin uses pmod, so it is well-defined for NEGATIVE ids too —
    * but a plain `%` SQL mirror (like the catalog's generated oracle)
    * agrees only on non-negative ids; mirror negative-id tables with
    * `((x % m) + m) % m`.
    *
    * Scale shape: a pure per-row projection + filter — no shuffle, no
    * state; Catalyst pushes the filter toward the scan. Rates are given
    * per-mille; strata not listed fall back to `defaultPermille`
    * (1000 = keep everything). The when-chain follows `ratesPermille`
    * order, so duplicate stratum labels resolve first-wins. */
  def stratifiedSample(docs: DataFrame, idCol: Column, stratum: Column,
                       ratesPermille: Seq[(String, Int)],
                       defaultPermille: Int = 1000): DataFrame = {
    val coin = pmod(
      pmod(lit(Dedup.HashA(0)) * idCol.cast("long") + lit(Dedup.HashB(0)),
        lit(Dedup.HashP)),
      lit(1000L))
    val rate = ratesPermille.reverse.foldLeft(lit(defaultPermille.toLong)) {
      case (els, (s, r)) => when(stratum === s, lit(r.toLong)).otherwise(els)
    }
    docs.withColumn("stratum", stratum)
      .withColumn("coin", coin)
      .filter(col("coin") < rate)
  }
}
