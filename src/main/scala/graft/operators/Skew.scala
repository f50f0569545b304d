package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Explicit skew handling for hot keys (SURVEY.md §4 "salting transform",
  * §7.3 risk 3 — p53-class entities appear in ~30% of documents).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
  * every session this engine builds) handles sort-merge joins at runtime;
  * this utility covers the cases AQE doesn't: deterministic salting for
  * large⋈large equi-joins on a known-skewed key, and pre-aggregation
  * salting when a single group exceeds executor memory.
  *
  * The salt is `pmod(hash(<row identity>), S)` — deterministic, no RNG
  * state, reproducible across retries (required for idempotent resume).
  */
object Skew {

  /** Salted inner equi-join: the skewed (large, hot-keyed) side gets a
    * deterministic salt from its own row hash; the other side is exploded
    * S ways so every salted key finds its match. Correct for inner joins
    * on `key`; output = the unsalted join's rows exactly. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedL = skewed.withColumn("graft_salt",
      pmod(hash(struct(skewed.columns.map(col): _*)), lit(salts)))
    val saltedR = other.withColumn("graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedL.join(saltedR, Seq(key, "graft_salt"), "inner").drop("graft_salt")
  }

  /** Two-phase salted aggregation for hot group keys: partial aggregate on
    * (key, salt), then final on key. `partial` and `merge` must form the
    * same commutative monoid (e.g. sum/sum, count/sum). Spark's hash
    * aggregate already map-side-combines, so reach for this only when one
    * group's partial state itself is too large (collect_set on a hot key).
    *
    * Salt derivation (retry-safety): pass `uniqueCol` — a column whose
    * values distinguish rows within a group (an event id, a mention id, a
    * file+offset) — and the salt is `pmod(xxhash64(key, uniqueCol), S)`:
    * fully deterministic, reproducible across task retries, and it still
    * spreads repeated-CONTENT rows of a hot group (their unique ids
    * differ, unlike a whole-row content hash which would map exact
    * duplicates onto one salt bucket — the repeated-row hot-key case this
    * spreading exists for).
    *
    * Without `uniqueCol` the fallback salt is row-position-derived
    * (monotonically_increasing_id), which is deterministic ONLY on
    * deterministically-ordered inputs (e.g. straight off a file scan). On
    * post-shuffle inputs a task retried after a fetch failure can emit
    * different salts than map output other reducers already consumed —
    * Spark does not roll the stage back for expression nondeterminism, so
    * rows can be double-counted or dropped in the partial aggregate.
    * Prefer `uniqueCol` anywhere a shuffle precedes the salt. */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
                partial: Seq[Column], finalAgg: Seq[Column],
                uniqueCol: Option[String] = None): DataFrame = {
    val saltExpr = uniqueCol match {
      case Some(u) => pmod(xxhash64(col(key), col(u)), lit(salts))
      case None => pmod(hash(monotonically_increasing_id()), lit(salts))
    }
    val salted = df.withColumn("graft_salt", saltExpr)
    val phase1 = salted.groupBy(col(key), col("graft_salt"))
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(col(key)).agg(finalAgg.head, finalAgg.tail: _*)
  }
}
