package graft

import graft.operators.Dedup
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming decontamination guard flags exactly the doc set the
  * batch operator flags — n-gram overlap plus both whole-doc containment
  * directions — across micro-batches. */
class StreamingDecontamSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  test("streaming guard flag set equals the batch decontaminate flag set") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evalSet = Seq(
      100L -> "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10",
      101L -> "tiny dup").toDF("doc_id", "text")
    val corpus = Seq(
      1L -> "x1 x2 e2 e3 e4 e5 e6 e7 e8 e9 y1 y2", // shared 8-gram
      2L -> "clean words only nothing shared here at all okay sure",
      3L -> "tiny dup",                             // short exact dup
      4L -> "tiny dup plus six more filler words here", // short eval inside
      5L -> "e3 e4 e5",                             // short corpus inside eval
      // shares the bigram "e3 e4" with eval 100's INTERIOR — not
      // contamination under the batch rule (no shared 8-gram, not sub-8,
      // contains no whole short eval doc); a guard pooling eval windows
      // untagged would over-flag exactly this doc
      6L -> "e3 e4 aa bb cc dd ee ff gg hh")
    val input = MemoryStream[(Long, String)]
    val out = StreamingIngest.decontamStream(
      input.toDF().toDF("doc_id", "text"), evalSet)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("graft_decontam_test").start()
    try {
      input.addData(corpus.take(2): _*)
      q.processAllAvailable()
      input.addData(corpus.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("graft_decontam_test")
        .collect().map(_.getLong(0)).toSet
      val batch = Dedup.decontaminate(corpus.toDF("doc_id", "text"), evalSet)
        .collect().map(_.getLong(0)).toSet
      assert(streamed == batch,
        s"missing=${batch -- streamed} extra=${streamed -- batch}")
      assert(batch == Set(1L, 3L, 4L, 5L), "doc 6 must NOT flag")
    } finally q.stop()
  }
}
