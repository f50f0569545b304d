package graft

import graft.operators.Dedup
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dup candidates: the per-row simhash matches the batch
  * operator bit-for-bit, and the stateful candidate stream finds exactly
  * the batch candidate set across micro-batches. */
class StreamingNearDupSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy dog",
    3L -> "the quick brown fox jumps over the lazy cat",
    4L -> "completely different content entirely here now",
    5L -> "unrelated words about spark catalyst planning")

  test("per-row simhash equals the batch explode+groupBy simhash") {
    val docs = corpus.toDF("doc_id", "text")
    val batch = Dedup.simhashes(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perRow = Dedup.withSimhash(docs)
      .select("doc_id", "sh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRow == batch)
  }

  test("stateful candidate stream finds the batch candidate set across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingIngest.nearDupCandidatesStream(
      input.toDF().toDF("doc_id", "text"))
    val q = out.toDF("doc_a", "doc_b", "hamming").writeStream
      .outputMode("append").format("memory")
      .queryName("graft_neardup_test").start()
    try {
      // docs arrive across TWO micro-batches: 3 pairs with 2 in batch 1
      // means pair (1,2) emits in batch 1, pairs (x,3) only once 3 arrives
      input.addData(corpus.take(2): _*)
      q.processAllAvailable()
      input.addData(corpus.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("graft_neardup_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val batch = Dedup.simhashCandidates(corpus.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // block-level duplicates collapse under toSet; the candidate SETS
      // must agree exactly with the batch operator
      assert(streamed == batch,
        s"missing=${batch -- streamed} extra=${streamed -- batch}")
      assert(batch.nonEmpty, "test corpus must produce at least one candidate")
    } finally q.stop()
  }
}
