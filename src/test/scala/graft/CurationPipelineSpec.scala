package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed curation pipeline (keep-list → decontam → quality gate →
  * sample → pack): the survivor set must equal the conjunction of the
  * individual stages' verdicts, and the packed layout must be a gapless
  * prefix sum over exactly that set. */
class CurationPipelineSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("pipeline survivors = reps ∖ contaminated ∖ quality-fails, sampled") {
    val docs = Queries.table(spark, dir, "documents")
    val out = Queries.curationPipeline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val outIds = out.map(_._1).toSet
    assert(out.nonEmpty, "the pipeline must keep a non-trivial survivor set")

    // stage-by-stage expected set, recomputed from the operators directly
    val reps = Dedup.keepList(docs, minSharedPct = 80)
      .filter(col("doc_id") === col("keep_id"))
      .collect().map(_.getLong(0)).toSet
    val contaminated = Dedup.decontaminate(
        docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0))
      .collect().map(_.getLong(0)).toSet
    val quality = TextAnalysis.gopherQuality(docs)
      .filter(col("n_words").between(50, 100000) &&
        col("mean_word_len").between(3.0, 10.0))
      .collect().map(_.getLong(0)).toSet
    val coinKept = docs.select(col("doc_id"),
        size(split(col("text"), " ")).as("n"),
        pmod(pmod(lit(Dedup.HashA(0)) * col("doc_id") + lit(Dedup.HashB(0)),
          lit(Dedup.HashP)), lit(1000L)).as("coin"))
      .collect()
      .filter(r => r.getLong(2) < (if (r.getInt(1) < 70) 500L else 750L))
      .map(_.getLong(0)).toSet
    val expected = reps
      .filter(id => id % 5 != 0)
      .diff(contaminated)
      .intersect(quality)
      .intersect(coinKept)
    assert(outIds == expected,
      s"missing=${expected -- outIds} extra=${outIds -- expected}")
  }

  test("packed layout is a gapless prefix sum in doc_id order") {
    val out = Queries.curationPipeline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    var cum = 0L
    out.foreach { case (id, n, start, bin) =>
      assert(start == cum, s"doc $id: start $start != running sum $cum")
      assert(bin == start / 2048, s"doc $id: bin $bin != ${start / 2048}")
      cum += n
    }
  }
}
