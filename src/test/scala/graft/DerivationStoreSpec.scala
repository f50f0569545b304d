package graft

import graft.graph.BgpMatcher.{C, TriplePattern, V}
import graft.sources.DerivationStore
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The stored-derivation maintenance contract: merged inference state
  * equals the full re-derivation, the init graph is PHYSICALLY
  * unreadable during the merge (deleted after init — the strongest
  * "never re-ground" proof), a re-merge of the committed batch is a
  * no-op, and merging under a different rule is rejected. */
class DerivationStoreSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val body = Seq(
    TriplePattern(V("x"), C("filter"), V("m")),
    TriplePattern(V("m"), C("group"), V("y")))
  private val head = TriplePattern(V("x"), C("scan"), V("y"))

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2))).toSet

  private def tmpDir(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_$name")
    p.toFile.deleteOnExit(); p.toString
  }

  test("init + merge equals the full re-derivation; init graph deleted " +
    "before the merge; re-merge is a no-op; rule mismatch rejected") {
    // the kg_rule_infer_delta slices: old = codes {0,1}, delta = code 2
    val train = Queries.kgTypedTriples(spark, dir)
      .select(col("subj"), col("pred"), col("obj")).distinct()
      .localCheckpoint()
    val dRank = Queries.kgDictWords.zipWithIndex.toMap
    val pRank = Queries.kgPredWords.zipWithIndex.toMap
    val codes = train.collect().map { r =>
      val (s, p, o) = (r.getString(0), r.getString(1), r.getString(2))
      ((s, p, o), dRank(s) * 25 + pRank(p) * 5 + dRank(o))
    }.toMap
    import spark.implicits._
    val oldSlice = codes.filter(_._2 % 4 <= 1).keys.toSeq
      .toDF("subj", "pred", "obj")
    val delta = codes.filter(_._2 % 4 == 2).keys.toSeq
      .toDF("subj", "pred", "obj")
    assert(oldSlice.count() > 0 && delta.count() > 0)

    // stage the OLD graph, init from the staged copy, DELETE the copy
    val staged = tmpDir("deriv_old")
    oldSlice.write.mode("overwrite").parquet(s"$staged/edges")
    val store = tmpDir("deriv_store")
    val m0 = DerivationStore.init(
      spark.read.parquet(s"$staged/edges"), body, head, store)
    assert(m0.version == 0 && m0.batches == 1 && m0.derivedRows > 0)
    import scala.reflect.io.Directory
    assert(new Directory(
      new java.io.File(s"$staged/edges")).deleteRecursively())

    val m1 = DerivationStore.merge(delta, body, head, store)
    assert(m1.version == 1 && m1.batches == 2)
    // the stored inferred view == construct over the combined graph ==
    // the catalog entry (which itself hash-matches the DuckDB oracle)
    val inferred = asSet(DerivationStore.readInferred(spark, store))
    val full = asSet(Queries.kgRuleInferDelta(spark, dir))
    assert(inferred == full && inferred.nonEmpty)
    // the committed version carries complete Spark writes
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(store, "v1", "edges", "_SUCCESS")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(store, "v1", "derived", "_SUCCESS")))
    assert(m1.edgeRows ==
      DerivationStore.readEdges(spark, store).count())

    // resume: the same delta again is recognized and skipped
    val m2 = DerivationStore.merge(delta, body, head, store)
    assert(m2 == m1)
    assert(asSet(DerivationStore.readInferred(spark, store)) == full)

    // a different rule than the committed one is rejected outright
    val otherHead = TriplePattern(V("x"), C("merge"), V("y"))
    val err = intercept[IllegalArgumentException] {
      DerivationStore.merge(delta, body, otherHead, store)
    }
    assert(err.getMessage.contains("built for rule"))
  }

  test("derived heads survive observation: an edge asserted by a delta " +
    "leaves the inferred view but stays derivable") {
    import spark.implicits._
    val old = Seq(("a", "filter", "b"), ("b", "group", "c"))
      .toDF("subj", "pred", "obj")
    val store = tmpDir("deriv_store2")
    DerivationStore.init(old, body, head, store)
    assert(asSet(DerivationStore.readInferred(spark, store)) ==
      Set(("a", "scan", "c")))
    // the delta ASSERTS the inferred edge -> it leaves the view ...
    val assertScan = Seq(("a", "scan", "c")).toDF("subj", "pred", "obj")
    DerivationStore.merge(assertScan, body, head, store)
    assert(asSet(DerivationStore.readInferred(spark, store)).isEmpty)
    // ... but the derivation is still stored (meta counts it), exactly
    // the construct(newOnly = false) contract the store commits to
    val m = DerivationStore.readMeta(store)
    assert(m.derivedRows == 1)
    assert(asSet(spark.read.parquet(s"$store/v${m.version}/derived")) ==
      Set(("a", "scan", "c")))
  }
}
