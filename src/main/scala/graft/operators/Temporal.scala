package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark's built-in operators don't express directly:
  * backward AS-OF join and interval containment (range) join. Both are
  * composed from shuffle-and-sort primitives the optimizer already
  * understands — no theta join anywhere, so neither degrades into the
  * O(n·m) BroadcastNestedLoopJoin a naive `ON r.ts <= l.ts` predicate
  * plans. The shapes follow the published bin-join / union-window
  * patterns (the same constructions behind Databricks' range-join hints
  * and kdb-style aj): at 100 TB each costs one key-partitioned
  * shuffle+sort — the price of a sort-merge equi-join on the same key. */
object Temporal {

  /** Backward AS-OF join: for every left row, the LATEST right row with
    * the same key and `right.time <= left.time` (ties at equal time
    * match). Appends to each left row the matched right `valueCols`
    * (suffixed) and the matched right time as `<time><suffix>`; no match
    * → nulls. `toleranceSec` bounds the lookback: a match older than the
    * tolerance is treated as absent.
    *
    * Plan shape: tag-union both sides, ONE window over
    * (key) ordered by (time, tag, values) carrying the last non-null
    * right payload forward, filter back to left rows — a single Exchange
    * + sort, asserted in TemporalSpec. The naive formulation is a
    * non-equi join + per-left-row max: two shuffles and a quadratic
    * worst case per hot key.
    *
    * Duplicate right rows at the same (key, time) resolve
    * deterministically to the one with the greatest value tuple (the
    * trailing sort keys); pre-aggregate the right side when a different
    * rule is wanted. Hot keys concentrate a partition each (windows
    * don't AQE-split); pre-bucket by coarse time with boundary seeding
    * if one key dominates. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               valueCols: Seq[String], toleranceSec: Option[Long] = None,
               suffix: String = "_asof"): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin needs at least one right value column")
    val carried = valueCols :+ "__rts"
    val l0 = left.select(col(key).as("__k"), col(time).as("__t"),
      lit(1).as("__tag"), struct(left.columns.map(col): _*).as("__l"))
    val lRow = valueCols.foldLeft(
        l0.withColumn("__rts", lit(null).cast(right.schema(time).dataType))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val rRow = right.select(Seq(col(key).as("__k"), col(time).as("__t"),
      lit(0).as("__tag"), lit(null).cast(l0.schema("__l").dataType).as("__l"),
      col(time).as("__rts")) ++ valueCols.map(col): _*)
    // right rows (tag 0) sort before left rows at equal time so an exact-
    // time marker is visible to its own instant; trailing value columns
    // make duplicate right rows at one (key, time) resolve to the max
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc +: col("__tag").asc +: valueCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCarry = carried.foldLeft(lRow.unionByName(rRow)) { (df, c) =>
      df.withColumn(s"__c_$c", last(col(c), ignoreNulls = true).over(w))
    }
    // casts make NTZ parquet timestamps epoch-extractable; sessions pin
    // UTC (GraftSession) so naive-as-UTC matches the DuckDB oracle
    val inTol = toleranceSec match {
      case Some(tol) => col("__c___rts").isNotNull &&
        unix_micros(col("__t").cast("timestamp")) -
          unix_micros(col("__c___rts").cast("timestamp")) <= tol * 1000000L
      case None => col("__c___rts").isNotNull
    }
    withCarry.filter(col("__tag") === 1)
      .select(col("__l.*") +:
        when(inTol, col("__c___rts")).as(s"$time$suffix") +:
        valueCols.map(c => when(inTol, col(s"__c_$c")).as(s"$c$suffix")): _*)
  }

  /** Interval-containment (range) join: every (point, interval) pair with
    * equal `keys`, `start <= pointTime <= end` — both boundaries
    * inclusive. Returns the point columns plus the interval's non-key
    * columns; name collisions beyond the keys are the caller's to avoid.
    *
    * Plan shape (the bin-join pattern): points land in one time bucket of
    * `bucketSec` each; intervals EXPLODE into every bucket they touch;
    * one equi-join on (keys..., bucket) + the exact between-filter. The
    * explosion factor is ⌈len/bucketSec⌉+1 per interval — size bucketSec
    * near the typical interval length so it stays O(1), and let AQE split
    * any hot bucket (plain equi-join, splittable; the theta join this
    * replaces is not). */
  def rangeJoin(points: DataFrame, intervals: DataFrame, pointTime: String,
                start: String, end: String, keys: Seq[String] = Nil,
                bucketSec: Long = 600L): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    val width = bucketSec * 1000000L
    // casts make NTZ parquet timestamps epoch-extractable (UTC sessions)
    val p = points.withColumn("__bucket",
      expr(s"unix_micros(CAST($pointTime AS TIMESTAMP)) div $width"))
    val iv = intervals
      .withColumn("__bucket", explode(sequence(
        expr(s"unix_micros(CAST($start AS TIMESTAMP)) div $width"),
        expr(s"unix_micros(CAST($end AS TIMESTAMP)) div $width"))))
    p.join(iv, keys :+ "__bucket")
      .filter(col(pointTime) >= col(start) && col(pointTime) <= col(end))
      .drop("__bucket")
  }
}
