package graft

import graft.materialize.BucketedTables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located bucketed joins: write once, shuffle never again. */
class BucketedJoinSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

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
