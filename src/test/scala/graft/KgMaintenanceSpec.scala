package graft

import org.scalatest.funsuite.AnyFunSuite

/** The two KG-maintenance contracts, asserted engine-side before the
  * driver's DuckDB gate sees them: the incremental rollup merge and the
  * streaming construction must each equal the batch full recompute
  * row-for-row (their catalog oracle IS the batch rollup SQL — these
  * tests are the same theorem without the external engine).
  */
class KgMaintenanceSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
      r.getLong(3), r.getLong(4))).toSet

  test("kgEdgeRollupDelta: merged old+delta rollup equals the full recompute") {
    val full = asSet(Queries.kgEdgeRollup(spark, dir))
    val merged = asSet(Queries.kgEdgeRollupDelta(spark, dir))
    assert(merged == full)
    assert(full.nonEmpty, "testdata must yield at least one KG edge")
    // the split must be non-trivial on this corpus, or the merge proves
    // nothing: both slices have to contribute documents
    val t = Queries.kgTriples(spark, dir)
    import org.apache.spark.sql.functions.col
    assert(t.filter(col("doc_id") % 4 === 3).limit(1).count() == 1)
    assert(t.filter(col("doc_id") % 4 =!= 3).limit(1).count() == 1)
  }

  test("kgStreamEdges: streaming rollup equals the batch rollup") {
    val batch = asSet(Queries.kgEdgeRollup(spark, dir))
    val streamed = asSet(Queries.kgStreamEdges(spark, dir))
    assert(streamed == batch)
  }
}
