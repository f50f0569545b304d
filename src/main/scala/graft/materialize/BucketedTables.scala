package graft.materialize

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout for co-located joins — the catalog-table analog of
  * Iceberg's `bucket(N, key)` partition transform (SURVEY §2.1 S1 mapping,
  * §4 "co-locate joins via bucketing").
  *
  * Why it matters at 100 TB: the KG outputs are re-joined on their keys
  * constantly — triples⋈nodes on the canonical id, triples⋈triples across
  * runs on doc_id, gold⋈pred in evaluation. A plain parquet table pays a
  * full shuffle of both sides on EVERY such join; a table written
  * `bucketBy(N, key).sortBy(key)` carries its hash-partitioning and order
  * in the catalog, so Catalyst plans the sort-merge join with ZERO
  * Exchange and zero Sort on every subsequent join against a co-bucketed
  * table (asserted in BucketedJoinSpec). Write once, shuffle never again.
  */
object BucketedTables {

  /** Write `df` as a managed parquet table bucketed + sorted on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on their bucket key. With matching
    * bucket counts Catalyst plans SortMergeJoin over the existing layout —
    * no Exchange, no Sort. */
  def colocatedJoin(spark: SparkSession, tableA: String, tableB: String,
                    key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), key)
}
