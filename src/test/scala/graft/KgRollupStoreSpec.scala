package graft

import graft.sources.KgRollupStore
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The stored-rollup maintenance contract: merged state equals the full
  * recompute, the old corpus is PHYSICALLY unreadable during the merge
  * (deleted after init — the strongest possible "never re-extracted"
  * proof), and a resumed orchestrator re-merging the committed batch is
  * a no-op. */
class KgRollupStoreSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
      r.getLong(3), r.getLong(4))).toSet

  private def tmpDir(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_$name")
    p.toFile.deleteOnExit(); p.toString
  }

  test("init + merge equals the full recompute; old docs deleted before " +
    "the merge; re-merge of the committed batch is a no-op") {
    val all = Queries.kgTriples(spark, dir)
    val oldSlice = all.filter(col("doc_id") % 4 =!= 3)
    val delta = all.filter(col("doc_id") % 4 === 3)
    assert(oldSlice.limit(1).count() == 1 && delta.limit(1).count() == 1,
      "both slices must be non-trivial on this corpus")

    // stage the OLD slice to its own parquet, init the store from the
    // staged copy, then DELETE the copy — the merge must not need it
    val staged = tmpDir("kg_old_docs")
    oldSlice.write.mode("overwrite").parquet(s"$staged/docs")
    val store = tmpDir("kg_store")
    val m0 = KgRollupStore.init(
      spark.read.parquet(s"$staged/docs"), store)
    assert(m0.version == 0 && m0.batches == 1)
    import scala.reflect.io.Directory
    assert(new Directory(new java.io.File(s"$staged/docs")).deleteRecursively())

    val m1 = KgRollupStore.merge(delta, store)
    assert(m1.version == 1 && m1.batches == 2)
    val merged = asSet(KgRollupStore.read(spark, store))
    val full = asSet(Queries.kgEdgeRollup(spark, dir))
    assert(merged == full)

    // resume: the same delta again must be recognized and skipped
    val m2 = KgRollupStore.merge(delta, store)
    assert(m2 == m1)
    assert(asSet(KgRollupStore.read(spark, store)) == full)
  }

  test("merge commits atomically: meta points at a fully-written version") {
    val all = Queries.kgTriples(spark, dir)
    val store = tmpDir("kg_store2")
    KgRollupStore.init(all.filter(col("doc_id") % 2 === 0), store)
    KgRollupStore.merge(all.filter(col("doc_id") % 2 === 1), store)
    val meta = KgRollupStore.readMeta(store)
    assert(meta.version == 1)
    // the committed version dir carries the _SUCCESS marker of a complete
    // Spark write — the sidecar never points at a partial table
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(store, "v1", "_SUCCESS")))
    assert(meta.rows == KgRollupStore.read(spark, store).count())
  }
}
