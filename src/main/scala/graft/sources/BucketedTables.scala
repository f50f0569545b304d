package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support for shuffle-free co-located joins (SURVEY.md §4
  * shard-parallelism row; the Spark-native answer to "pre-partition the
  * corpus so repeated joins on the same key never exchange").
  *
  * `bucketBy` persists the hash-partitioning in the table metadata: two
  * tables bucketed on the same key with the same bucket count sort-merge
  * join WITHOUT an Exchange on either side (asserted in BucketingSpec by
  * inspecting the physical plan). At 100 TB this is the difference between
  * shuffling the fact table on every join and shuffling it once at write
  * time — e.g. the mention table bucketed by doc_id joins sentences,
  * pairs, and triples for free.
  */
object BucketedTables {

  /** Save as a bucketed managed table (requires a warehouse-backed
    * session; bucket metadata only survives in the catalog). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True if the executed plan contains any shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
