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

  /** Rebalance a corpus toward a UNIFORM mix over the values of `groupCol`
    * (language is the canonical case) by deterministic downsampling: each
    * group's keep-rate is its uniform-share target over its actual share,

    *   rate‰(g) = min(1000, ⌊1000·total / (ngroups·count(g))⌋)
    *
    * so over-represented groups are cut toward total/ngroups docs and
    * under-represented ones keep everything (a sampler cannot upsample
    * without replication — the cap records that honestly; a DoReMi-style
    * weighted target is this same operator with a weights table in place
    * of the uniform 1/ngroups). The per-row coin is the same LCG family as
    * [[stratifiedSample]] (index `hashIdx` — a different index than the
    * stratified sampler's 0, so composing both never correlates the
    * coins), making the sample stable under reruns and repartitioning.
    * Null group values form their own group (null-safe join), mirroring
    * the corpus-stats rollup.
    *
    * Scale shape: one map-side-combinable count-by-group, a broadcast of
    * the tiny rates table (|groups| rows), then a pure per-row filter —
    * no data-sized shuffle anywhere. All arithmetic is BIGINT (1000·total
    * overflows only past ~9·10¹⁵ docs). */
  def mixtureSample(docs: DataFrame, idCol: Column, groupCol: Column,
                    hashIdx: Int = 1): DataFrame = {
    val counts = docs.groupBy(groupCol.as("grp")).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("total"), count(lit(1)).as("ngroups"))
    // SQL `div` is exact BIGINT floor-division — a double `/` + cast loses
    // exactness past 2^53, which 1000·total reaches at ~9·10¹² docs
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("rate_pm",
        least(lit(1000L), expr("(1000 * total) div (ngroups * cnt)")))
      .select(col("grp"), col("rate_pm"))
    applyRates(docs, rates, idCol, groupCol, hashIdx)
  }

  /** The shared sampling tail: broadcast the (grp, rate_pm) table, join
    * null-safely on the group, flip the per-row LCG coin, keep the row
    * iff coin < rate. One copy, so a coin or join fix reaches every
    * mixture sampler. */
  private def applyRates(docs: DataFrame, rates: DataFrame, idCol: Column,
                         groupCol: Column, hashIdx: Int): DataFrame = {
    val coin = pmod(
      pmod(lit(Dedup.HashA(hashIdx)) * idCol.cast("long") + lit(Dedup.HashB(hashIdx)),
        lit(Dedup.HashP)),
      lit(1000L))
    docs.join(broadcast(rates), groupCol <=> col("grp"))
      .withColumn("coin", coin)
      .filter(col("coin") < col("rate_pm"))
  }

  /** EXACT-k stratified sample: the min(k, |stratum|) documents with the
    * smallest LCG hash per stratum, ranked by (hash, id) so ties are
    * deterministic — the "give me exactly 10k eval docs per language"
    * request that per-row coins ([[stratifiedSample]]) can only hit in
    * expectation. Output: (stratum, doc_id, rn), rn = 1..k.
    *
    * Scale shape — the naive form is one `row_number()` window over the
    * WHOLE corpus partitioned by stratum: a full shuffle where the
    * largest stratum (English at ~half a web crawl) lands on one task.
    * Instead the operator pre-thins with a THRESHOLD on the hash and only
    * ranks survivors: h is uniform on [0, P), so keeping h ≤ ⌊P·(2k+m)/n⌋
    * leaves ~2k+m rows per stratum — the window input shrinks from n rows
    * to O(k) regardless of corpus size, and the pre-thin itself is a
    * pure per-row filter against a broadcast (stratum, n, threshold)
    * table. The result is still EXACT, not approximate: the survivor set
    * is downward-closed in h (it contains every row with h ≤ t), so if a
    * stratum retains ≥ min(k, n) survivors, its true min(k, n) smallest
    * (h, id) rows are all among them. Strata where the uniformity bet
    * loses (fewer survivors than min(k, n) — exponentially unlikely at
    * the default margin, but possible) are detected by a survivor count
    * and re-ranked over their FULL rows; the fallback branch is per-
    * failing-stratum, so the worst case degrades to the naive plan only
    * where the data forced it. Deterministic throughout: reruns, retries
    * and repartitions return byte-identical samples. */
  def stratifiedExactK(docs: DataFrame, idCol: Column, stratum: Column,
                       k: Int, hashIdx: Int = 3,
                       safetyMargin: Int = 64): DataFrame = {
    val h = pmod(lit(Dedup.HashA(hashIdx)) * idCol.cast("long")
      + lit(Dedup.HashB(hashIdx)), lit(Dedup.HashP))
    val base = docs.select(stratum.as("stratum"), idCol.cast("long").as("doc_id"))
      .withColumn("h", h)
    minKByHash(base, k, safetyMargin)
      .select(col("stratum"), col("doc_id"), col("rn").cast("long").as("rn"))
  }

  /** WEIGHTED exact-k sample per stratum (Efraimidis-Spirakis A-ES 2006,
    * the integer analog): each row's priority is hash div weight — a
    * larger weight shrinks the priority range, so the min-k selection
    * picks it proportionally more often (the u^(1/w) trick with integer
    * division; the same deterministic weighting the node2vec walker
    * uses). The quality-weighted data-selection primitive: "sample 10k
    * docs per language, proportional to quality score", bit-reproducible
    * across reruns and engines.
    *
    * Selection reuses [[minKByHash]]. Its thinning quantile assumes a
    * uniform ranking value; priorities skew LOW under weighting, which
    * only makes the thin CONSERVATIVE (more survivors pass — never
    * fewer), so exactness is untouched and the per-stratum fallback
    * stays the safety net. Weights are clamped to ≥ 1 (a zero/null
    * weight still competes, at the lowest odds).
    *
    * @return (stratum, doc_id, rn), rn = 1..k by (priority, id). */
  def weightedExactK(docs: DataFrame, idCol: Column, stratum: Column,
                     weight: Column, k: Int, hashIdx: Int = 5,
                     safetyMargin: Int = 64): DataFrame = {
    val h = pmod(lit(Dedup.HashA(hashIdx)) * idCol.cast("long")
      + lit(Dedup.HashB(hashIdx)), lit(Dedup.HashP))
    val w = greatest(lit(1L), coalesce(weight.cast("long"), lit(0L)))
    // integer h div w without float hazards: exact-multiple division
    val pr = ((h - h % w) / w).cast("long")
    val base = docs
      .select(stratum.as("stratum"), idCol.cast("long").as("doc_id"),
        pr.as("h"))
    minKByHash(base, k, safetyMargin)
      .select(col("stratum"), col("doc_id"), col("rn").cast("long").as("rn"))
  }

  /** The pre-thinned exact min-k machinery behind [[stratifiedExactK]]
    * (and the KMV sketch): given prepared (stratum, doc_id, h) rows with
    * h uniform on [0, HashP), return each stratum's min(k, n) smallest
    * (h, doc_id) rows with rank rn = 1..k — thinning to ~2k+margin
    * survivors per stratum before the ranking window, with the
    * per-failing-stratum full re-rank fallback (see the scaladoc above
    * for the downward-closure exactness argument). */
  private[operators] def minKByHash(base: DataFrame, k: Int,
                                    safetyMargin: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    val counts = base.groupBy(col("stratum")).agg(count(lit(1)).as("n"))
    // threshold per stratum: everything when n ≤ k (the whole stratum is
    // the sample); else the (2k + margin)-quantile of the uniform hash.
    // BIGINT div keeps it exact — P·(2k+m) stays far inside Long.
    val budget = 2L * k + math.max(0, safetyMargin)
    val thr = when(col("n") <= k, lit(Dedup.HashP))
      .otherwise(least(lit(Dedup.HashP),
        expr(s"(CAST(${Dedup.HashP} AS BIGINT) * $budget) div n")))
    // every stratum join below is NULL-SAFE (<=>): a null stratum is a
    // stratum like any other (mirrors the corpus-stats / mixture rollups)
    val thrTab = counts.withColumn("thr", thr)
      .select(col("stratum").as("t_stratum"), col("n"), col("thr"))
    val surv = base.join(broadcast(thrTab), col("stratum") <=> col("t_stratum"))
      .filter(col("h") <= col("thr"))
      .select(col("stratum"), col("doc_id"), col("h"))
    // completeness check: a stratum is proven complete iff it kept at
    // least min(k, n) survivors (downward closure in h — see scaladoc)
    val survCnt = surv.groupBy(col("stratum").as("c_stratum"))
      .agg(count(lit(1)).as("s"))
    val short = thrTab.join(broadcast(survCnt),
        col("t_stratum") <=> col("c_stratum"), "left")
      .filter(coalesce(col("s"), lit(0L)) < least(lit(k.toLong), col("n")))
      .select(col("t_stratum").as("bad_stratum"))
    val win = Window.partitionBy(col("stratum"))
      .orderBy(col("h").asc, col("doc_id").asc)
    val fast = surv.join(broadcast(short),
      col("stratum") <=> col("bad_stratum"), "left_anti")
    val slow = base.join(broadcast(short),
      col("stratum") <=> col("bad_stratum"), "left_semi")
    fast.select(col("stratum"), col("doc_id"), col("h"))
      .unionByName(slow.select(col("stratum"), col("doc_id"), col("h")))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") <= k)
  }

  /** DoReMi-style WEIGHTED mixture: `targets` (grp, target_ppm) pins each
    * group's desired share of the final mix in parts-per-million, and the
    * keep-rate is the exact integer form of 1000 · target-share /
    * actual-share,
    *
    *   rate‰(g) = min(1000, ⌊target_ppm(g)·total / (1000·count(g))⌋)
    *
    * (algebraically 1000·(target_ppm/10⁶)/(cnt/total), rearranged so the
    * division happens once — BIGINT-exact to ~9·10¹² docs). Groups ABSENT
    * from the targets table are dropped: the table pins the whole mix, and
    * an unlisted group's target is zero. [[mixtureSample]] is the uniform
    * special case (kept separate: its ⌊1000·total/(n·cnt)⌋ form is exact
    * where a ⌊10⁶/n⌋-ppm row here would round). Same scale shape: one
    * count-by-group, a broadcast rates table, a per-row coin filter. */
  def mixtureSampleTo(docs: DataFrame, idCol: Column, groupCol: Column,
                      targets: DataFrame, hashIdx: Int = 1): DataFrame = {
    val counts = docs.groupBy(groupCol.as("grp")).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("total"))
    val rates = counts
      .join(targets, counts("grp") <=> targets("grp"))
      .crossJoin(broadcast(tot))
      .withColumn("rate_pm",
        least(lit(1000L), expr("(target_ppm * total) div (1000 * cnt)")))
      .select(counts("grp"), col("rate_pm"))
    applyRates(docs, rates, idCol, groupCol, hashIdx)
  }
}
