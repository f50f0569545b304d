package graft

import java.sql.Timestamp
import graft.operators.Temporal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // left: (id, key, t); right markers: (key, t, v)
  private val left = Seq(
    (1L, "u1", ts(100)), (2L, "u1", ts(200)), (3L, "u1", ts(250)),
    (4L, "u2", ts(100)), // u2 has no marker at all
    (5L, "u1", ts(199)), // one second BEFORE u1's t=200 marker
    (6L, "u3", ts(300))  // exactly AT u3's only marker
  ).toDF("id", "key", "t").repartition(3)

  private val right = Seq(
    ("u1", ts(150), 10.0),
    ("u1", ts(200), 20.0),
    ("u1", ts(200), 30.0), // duplicate instant: max value must win
    ("u3", ts(300), 77.0)
  ).toDF("key", "t", "v").repartition(2)

  private def runAsof(tol: Option[Long]) =
    Temporal.asofJoin(left, right, key = "key", time = "t",
        valueCols = Seq("v"), toleranceSec = tol)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(3)).map(_.getTime / 1000), Option(r.getAs[Double]("v_asof")))))
      .toMap

  test("asofJoin: latest-at-or-before semantics, ties, dups, and misses") {
    val got = runAsof(None)
    assert(got(1L) == ((None, None)), "before any marker")
    assert(got(5L) == ((Some(150L), Some(10.0))), "strictly-later marker invisible")
    assert(got(2L) == ((Some(200L), Some(30.0))),
      "exact-instant marker matches; duplicate instant resolves to max value")
    assert(got(3L) == ((Some(200L), Some(30.0))), "carried forward past the instant")
    assert(got(4L) == ((None, None)), "key with no markers")
    assert(got(6L) == ((Some(300L), Some(77.0))), "exact instant on another key")
  }

  test("asofJoin tolerance: stale matches null out") {
    val got = runAsof(Some(40L))
    assert(got(2L) == ((Some(200L), Some(30.0))), "age 0 within tolerance")
    assert(got(3L) == ((None, None)), "age 50s > 40s tolerance")
    assert(got(5L) == ((None, None)), "age 49s > 40s tolerance")
  }

  test("asofJoin plans exactly one Exchange (no theta join, no extra shuffle)") {
    val plan = Temporal.asofJoin(left, right, "key", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"theta join leaked in:\n$plan")
    // the two RoundRobin exchanges are this spec's own input repartitions;
    // the operator itself may require exactly ONE key shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 key shuffle, saw $exchanges:\n$plan")
  }

  test("rangeJoin equals the naive theta join, boundaries inclusive") {
    val points = Seq(
      (1L, "u1", ts(100)), (2L, "u1", ts(700)), (3L, "u1", ts(701)),
      (4L, "u2", ts(100)), (5L, "u1", ts(3000))
    ).toDF("pid", "user_id", "pt").repartition(3)
    val iv = Seq(
      ("u1", 10L, ts(100), ts(700)),   // [100, 700]: pids 1 (start) + 2 (end)
      ("u1", 11L, ts(650), ts(2650)),  // spans 4 buckets at 600s width
      ("u2", 12L, ts(99), ts(99))      // zero-length, covers nothing here
    ).toDF("user_id", "iv_id", "s", "e").repartition(2)
    val got = Temporal.rangeJoin(points, iv, "pt", "s", "e",
        keys = Seq("user_id"), bucketSec = 600L)
      .select(col("pid"), col("iv_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.as("p").join(iv.as("i"),
        col("p.user_id") === col("i.user_id") &&
          col("p.pt") >= col("i.s") && col("p.pt") <= col("i.e"))
      .select(col("pid"), col("iv_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)),
      "both boundaries inclusive; multi-bucket interval found; key isolation holds")
  }
}
