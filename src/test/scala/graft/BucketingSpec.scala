package graft

import graft.sources.BucketedTables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketed tables: same key + same bucket count →
  * sort-merge join with NO exchange on either side. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  test("bucketed-bucketed join plans without a shuffle exchange") {
    val mentions = (0 until 5000)
      .map(i => (f"doc${i % 800}%05d", s"T$i", s"norm${i % 50}"))
      .toDF("doc_id", "mention_id", "norm_id")
    val sentences = (0 until 3000)
      .map(i => (f"doc${i % 800}%05d", i % 5, s"sentence $i"))
      .toDF("doc_id", "sent_id", "text")

    BucketedTables.writeBucketed(mentions, "graft_b_mentions", "doc_id", 8)
    BucketedTables.writeBucketed(sentences, "graft_b_sentences", "doc_id", 8)
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedTables.read(spark, "graft_b_mentions")
        .join(BucketedTables.read(spark, "graft_b_sentences"), "doc_id")
      assert(!BucketedTables.hasShuffle(joined),
        "bucketed join must not exchange:\n" + joined.queryExecution.executedPlan)
      assert(joined.count() > 0)

      // sanity: the same join on unbucketed frames DOES shuffle
      val unbucketed = mentions.join(sentences, "doc_id")
      assert(BucketedTables.hasShuffle(unbucketed))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_b_mentions")
      spark.sql("DROP TABLE IF EXISTS graft_b_sentences")
    }
  }
}
