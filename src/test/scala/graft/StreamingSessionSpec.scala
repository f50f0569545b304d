package graft

import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Watermark-finalized streaming session windows: a session is appended
  * exactly when the watermark passes its end, and its boundaries equal the
  * batch session_window computation. */
class StreamingSessionSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")

  test("session emitted once the watermark passes its end; boundaries exact") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val out = StreamingIngest.sessionizeStream(
      input.toDF().toDF("ts", "user_id"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("graft_sess_test").start()
    try {
      // batch 1: user A's 2-event session + a clock event from Z pushing
      // the watermark to 13:00 - 10min = 12:50 — past A's session end
      // (10:05 + 30min = 10:35), so batch 2 finalizes and emits it
      input.addData(ts("10:00") -> "A", ts("10:05") -> "A", ts("13:00") -> "Z")
      q.processAllAvailable()
      input.addData(ts("13:01") -> "Z")
      q.processAllAvailable()
      val rows = spark.table("graft_sess_test")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val base = ts("10:00").getTime / 1000
      // A's session finalized (watermark 12:51 > its end 10:35), emitted
      // exactly once; Z's session is still open (watermark has not passed
      // 13:01 + 30min) so it must NOT be emitted yet
      assert(rows.toSeq == Seq(("A", base, base + 300 + 1800, 2L)),
        s"expected exactly A's [10:00, 10:35) session with 2 events, got ${rows.toSeq}")
    } finally q.stop()
  }
}
