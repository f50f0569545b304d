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

  test("null-text docs never enter bucket state (streaming/batch parity)") {
    // batch simhashes DROPS wordless docs; the per-row form must not let
    // them through as sh = 0 — withSimhash yields null, the stream filters
    val withNull = Seq((1L, "alpha beta"), (2L, null: String), (3L, "alpha beta"))
      .toDF("doc_id", "text")
    val sh = Dedup.withSimhash(withNull).select("doc_id", "sh").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(sh(2L).isEmpty, "null text must yield a null simhash")
    assert(sh(1L).isDefined && sh(1L) == sh(3L))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Option[String])]
    val out = StreamingIngest.nearDupCandidatesStream(
      input.toDF().toDF("doc_id", "text"))
    val q = out.toDF("doc_a", "doc_b", "hamming").writeStream
      .outputMode("append").format("memory")
      .queryName("graft_neardup_null_test").start()
    try {
      input.addData((1L, Some("alpha beta")), (2L, None), (3L, Some("alpha beta")),
        (4L, None))
      q.processAllAvailable()
      val streamed = spark.table("graft_neardup_null_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // only the real near-dup pair; no (2,4) sh=0 collision, no pair with
      // a null-text doc — exactly the batch operator's candidate set
      assert(streamed == Set((1L, 3L)), s"got $streamed")
    } finally q.stop()
  }

  test("state TTL evicts idle buckets; pre-expiry candidates still emit") {
    // ProcessingTimeTimeout makes shouldRunAnotherBatch always true, so
    // the engine keeps running (empty) micro-batches to fire timeouts and
    // processAllAvailable NEVER latches noNewData — the test polls the
    // memory sink with deadlines instead. The continuous empty batches
    // are what fires the evictions during the sleep.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val text = "the quick brown fox jumps over the lazy dog"
    val input = MemoryStream[(Long, String)]
    val out = StreamingIngest.nearDupCandidatesStream(
      input.toDF().toDF("doc_id", "text"),
      stateTtl = Some(java.time.Duration.ofMillis(300)))
    val q = out.toDF("doc_a", "doc_b", "hamming").writeStream
      .outputMode("append").format("memory")
      .queryName("graft_neardup_ttl_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .start()
    def pairs(): Set[(Long, Long)] =
      try spark.table("graft_neardup_ttl_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      catch { case _: Throwable => Set.empty }
    def awaitPairs(expect: Set[(Long, Long)] => Boolean, deadlineMs: Long): Unit = {
      val end = System.currentTimeMillis() + deadlineMs
      while (!expect(pairs()) && System.currentTimeMillis() < end) Thread.sleep(100)
    }
    try {
      // 1 and 2 arrive in ONE micro-batch — the pair emits within the TTL
      input.addData(1L -> text, 2L -> text)
      awaitPairs(_.contains((1L, 2L)), 20000)
      assert(pairs() == Set((1L, 2L)), s"pre-expiry candidate must emit: ${pairs()}")
      // the engine's continuous timeout batches evict the idle buckets
      Thread.sleep(1500)
      // 3 and 4 share the evicted buckets; (3,4) emits (same batch), but
      // no pair with 1/2 can — their state is gone. (3,4) appearing also
      // proves the late docs were processed, making the absence assertion
      // meaningful rather than vacuous.
      input.addData(3L -> text, 4L -> text)
      awaitPairs(_.contains((3L, 4L)), 20000)
      val late = pairs()
      assert(late == Set((1L, 2L), (3L, 4L)),
        s"expired peers must not pair with late arrivals: $late")
    } finally q.stop()
  }
}
