package graft

import graft.operators.Packing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing: the two-pass distributed prefix sum must equal the
  * single-partition window-function formulation it replaces, without ever
  * planning an Exchange SinglePartition. */
class PackingSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private val docs = (1L to 40L).map(i =>
    (i, Seq.fill(3 + (i % 7).toInt)("w").mkString(" "))).toDF("doc_id", "text")

  test("two-pass prefix sum equals the window-function form") {
    val got = Packing.packChunked(docs, seqLen = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val ref = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("start_offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("bin", floor(col("start_offset").cast("double") / 16).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == ref)
  }

  test("packing never plans a single-partition exchange; the window twin does") {
    val pack = Packing.packChunked(docs, 16)
    assert(!pack.queryExecution.executedPlan.toString.contains("SinglePartition"))
    val twin = docs.withColumn("c",
      sum(lit(1)).over(Window.orderBy("doc_id")))
    assert(twin.queryExecution.executedPlan.toString.contains("SinglePartition"),
      "the window formulation must exhibit the anti-pattern packChunked avoids")
  }

  test("null policy: null text packs as zero tokens, null doc_id rows drop") {
    val d = Seq(
      (Option(1L), Option("a b c")),
      (Option(2L), Option.empty[String]),  // null text → 0 tokens
      (Option.empty[Long], Option("x y")), // null id → dropped
      (Option(3L), Option("d e"))).toDF("doc_id", "text")
    val rows = Packing.packChunked(d, 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows == Map(1L -> ((3L, 0L)), 2L -> ((0L, 3L)), 3L -> ((2L, 3L))))
  }

  test("packChunks: a doc straddling multiple bins emits one row per bin") {
    // seqLen 8; doc 1 holds tokens [0,5), doc 2 tokens [5,25) → doc 2
    // spans bins 0..3 with slice offsets/sizes fixed by the boundaries
    val d = Seq((1L, Seq.fill(5)("a").mkString(" ")),
      (2L, Seq.fill(20)("b").mkString(" "))).toDF("doc_id", "text")
    val rows = Packing.packChunks(d, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set(
      (1L, 0L, 0L, 5L),
      (2L, 0L, 5L, 3L),  // [5,8)
      (2L, 1L, 0L, 8L),  // [8,16)
      (2L, 2L, 0L, 8L),  // [16,24)
      (2L, 3L, 0L, 1L))) // [24,25)
  }

  test("packChunks: chunks conserve doc tokens and tile every bin gaplessly") {
    val ch = Packing.packChunks(docs, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val perDoc = ch.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val ref = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc == ref, "chunk tokens per doc must sum to the doc's tokens")
    // the token stream is contiguous, so every bin but the last holds
    // exactly seqLen tokens, and within a bin the chunks tile [0, fill)
    // with no gap or overlap
    val perBin = ch.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val lastBin = perBin.keys.max
    assert(perBin.filter(_._1 != lastBin).values.forall(_ == 16L))
    ch.groupBy(_._2).foreach { case (_, rows) =>
      rows.sortBy(_._3).foldLeft(0L) { case (expect, (_, _, off, n)) =>
        assert(off == expect, s"gap/overlap at bin offset $off (expected $expect)")
        off + n
      }
    }
  }

  test("packChunks: zero-token docs occupy no bin and emit no chunk rows") {
    val d = Seq((Option(1L), Option("a b")), (Option(2L), Option.empty[String]))
      .toDF("doc_id", "text")
    assert(Packing.packChunks(d, 8).collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("a document straddling a bin boundary belongs to its start bin") {
    // lengths 5,5,5,5 at seqLen 8: offsets 0,5,10,15 → bins 0,0,1,1
    // (doc 2 straddles tokens 5..9 across the 8-boundary; it starts in
    // bin 0, so it packs there)
    val d = Seq((1L, "a a a a a"), (2L, "a a a a a"),
      (3L, "a a a a a"), (4L, "a a a a a")).toDF("doc_id", "text")
    val bins = Packing.packChunked(d, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }
}
