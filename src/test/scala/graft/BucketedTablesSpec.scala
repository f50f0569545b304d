package graft

import graft.sources.BucketedTables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located bucketed joins: write once, shuffle never again. Merges the
  * former BucketingSpec + BucketedJoinSpec over the single consolidated
  * BucketedTables implementation. */
class BucketedTablesSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
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

  test("join of two co-bucketed tables plans with zero Exchange and zero Sort") {
    val triples = (0 until 2000)
      .map(i => (s"node${i % 300}", s"doc$i", i.toDouble))
      .toDF("node_id", "doc_id", "score")
    val nodes = (0 until 300).map(i => (s"node$i", s"Protein", i))
      .toDF("node_id", "tag", "rank")
    BucketedTables.writeBucketed(triples, "bjs_triples", "node_id", nBuckets = 8)
    BucketedTables.writeBucketed(nodes, "bjs_nodes", "node_id", nBuckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the plan must exploit the bucket layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedTables.colocatedJoin(spark, "bjs_triples", "bjs_nodes", "node_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$plan")
      assert(!plan.contains("Sort ("),
        s"bucket sortBy must satisfy the SMJ ordering requirement:\n$plan")
      // and it is still the CORRECT join
      assert(joined.count() == 2000)
      val one = joined.filter(col("node_id") === "node7")
      assert(one.count() == 2000 / 300 + (if (7 < 2000 % 300) 1 else 0))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bjs_triples")
      spark.sql("DROP TABLE IF EXISTS bjs_nodes")
    }
  }

  test("aggregation on the bucket key also avoids the shuffle") {
    val df = (0 until 1000).map(i => (s"k${i % 50}", i)).toDF("node_id", "v")
    BucketedTables.writeBucketed(df, "bjs_agg", "node_id", nBuckets = 8)
    try {
      val agg = spark.table("bjs_agg").groupBy("node_id").agg(sum(col("v")).as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy on the bucket key must reuse the layout:\n$plan")
      assert(agg.count() == 50)
    } finally spark.sql("DROP TABLE IF EXISTS bjs_agg")
  }
}
