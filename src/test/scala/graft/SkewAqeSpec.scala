package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence that AQE's runtime skew-join splitting actually engages under
  * this engine's session configuration (north-rule: "AQE skew-join
  * handling for hot entities") — a sort-merge join with one hot key is
  * executed and the FINAL adaptive plan must mark the join skew-handled. */
class SkewAqeSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // shrink thresholds so a test-sized hot partition counts as skewed
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

      // half the rows share one key: the hot shuffle partition is >2x the
      // median AND over the (lowered) absolute threshold — both conditions
      // of OptimizeSkewedJoin. Payload must be incompressible: skew
      // decisions read LZ4-compressed map-output sizes, and a constant
      // pad compresses below the threshold.
      val left = spark.range(100000)
        .select(when(col("id") % 2 =!= 0, concat(lit("k"), col("id")))
          .otherwise(lit("HOT")).as("key"),
          concat(md5(col("id").cast("string")),
            md5(concat(col("id").cast("string"), lit("s")))).as("payload"))
      val right = (0 until 500).map(i => (if (i == 0) "HOT" else s"k$i", i))
        .toDF("key", "attr")
      val joined = left.join(right, "key")
      // collect() executes THIS DataFrame's QueryExecution (count() would
      // plan a separate aggregate query and leave this one un-executed)
      assert(joined.collect().length > 0)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skew-handled:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
