package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout for shuffle-free co-located joins — the
  * catalog-table analog of Iceberg's `bucket(N, key)` partition transform
  * (SURVEY §2.1 S1 mapping; §4 "co-locate joins via bucketing").
  *
  * Why it matters at 100 TB: the KG outputs are re-joined on their keys
  * constantly — triples⋈nodes on the canonical id, triples⋈triples across
  * runs on doc_id, gold⋈pred in evaluation. A plain parquet table pays a
  * full shuffle of both sides on EVERY such join; a table written
  * `bucketBy(N, key).sortBy(key)` carries its hash-partitioning and order
  * in the catalog, so Catalyst plans the sort-merge join with ZERO
  * Exchange and zero Sort on every subsequent join against a co-bucketed
  * table, and groupBy on the bucket key reuses the layout too (both
  * asserted in BucketedTablesSpec). Write once, shuffle never again.
  */
object BucketedTables {

  /** Write `df` as a managed parquet table bucketed (and by default
    * sorted) on `key` — bucket metadata only survives in the catalog, so
    * this needs a warehouse-backed session. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int = 32, sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet").bucketBy(nBuckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Equi-join two co-bucketed tables on their bucket key. With matching
    * bucket counts Catalyst plans SortMergeJoin over the existing layout —
    * no Exchange, no Sort. */
  def colocatedJoin(spark: SparkSession, tableA: String, tableB: String,
                    key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), key)

  /** True if the executed plan contains any shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
