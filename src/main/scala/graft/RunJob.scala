package graft

import graft.core._
import graft.materialize.GraphMaterializer
import graft.score.LexiconScorer
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Production job entry point (spark-submit shape):
  *
  *   spark-submit --class graft.RunJob engine.jar \
  *     <docsParquet> <dict> <outDir> [nBuckets]
  *
  * `dict` is either a parquet path with (surface, norm_id, tag) rows and an
  * optional sibling `<dict>_equiv` table of (src, dst) edges, or
  * `synthetic:<nEntities>` for the seeded synthetic dictionary.
  *
  * Writes (all Iceberg-shaped bucketed parquet with lineage — re-running
  * after a crash resumes exactly at the incomplete buckets):
  *   <outDir>/triples   <outDir>/nodes   <outDir>/triggers
  *   <outDir>/quarantine (plain)  and prints one metrics JSON line.
  */
object RunJob {

  def run(spark: SparkSession, docsPath: String, dictSpec: String,
          outDir: String, nBuckets: Int): Map[String, Long] = {
    implicit val s: SparkSession = spark
    import spark.implicits._

    val docs = spark.read.parquet(docsPath).as[Doc]
    val (dict, edges) =
      if (dictSpec.startsWith("synthetic:")) {
        val p = CorpusGen.Params(nDocs = 0,
          nEntities = dictSpec.stripPrefix("synthetic:").toInt)
        (CorpusGen.dictionary(p), spark.createDataset(CorpusGen.equivEdges(p)))
      } else {
        val d = spark.read.parquet(dictSpec).as[DictEntry].collect().toSeq
        val e = try spark.read.parquet(s"${dictSpec}_equiv").as[EquivEdge]
        catch { case _: Throwable => spark.emptyDataset[EquivEdge] }
        (d, e)
      }

    // all three output families are written — persist the fused pass so
    // they share one corpus scan
    val out = KgPipeline.run(docs, dict, edges, LexiconScorer.default,
      persistPass = true)
    val wroteTriples = GraphMaterializer.writeResumable(
      spark, out.triples.toDF(), s"$outDir/triples", nBuckets)
    val wroteNodes = GraphMaterializer.writeResumable(
      spark, out.nodes, s"$outDir/nodes", nBuckets, key = "node_id")
    val wroteTriggers = GraphMaterializer.writeResumable(
      spark, out.triggers.toDF(), s"$outDir/triggers", nBuckets)
    out.quarantine.toDF().write.mode("overwrite").parquet(s"$outDir/quarantine")

    // metrics from the LINEAGE aggregates — three tiny metadata reads, not
    // three post-write full scans of the freshly written tables
    Map(
      "triples" -> GraphMaterializer.lineageRowCount(spark, s"$outDir/triples"),
      "nodes" -> GraphMaterializer.lineageRowCount(spark, s"$outDir/nodes"),
      "triggers" -> GraphMaterializer.lineageRowCount(spark, s"$outDir/triggers"),
      "quarantined" -> out.quarantine.count(),
      "buckets_written_triples" -> wroteTriples,
      "buckets_written_nodes" -> wroteNodes,
      "buckets_written_triggers" -> wroteTriggers)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: RunJob <docsParquet> <dict|synthetic:N> <outDir> [nBuckets]")
    val nBuckets = if (args.length > 3) args(3).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val counts = run(spark, args(0), args(1), args(2), nBuckets)
    println(counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
    spark.stop()
  }
}

/** Production CURATION job entry point (spark-submit shape):
  *
  *   spark-submit --class graft.CurationJob engine.jar \
  *     <docsParquet> <outDir> [nBuckets]
  *
  * Materializes the curation deliverables over a (doc_id, text, ...)
  * corpus table, Iceberg-shaped resumable bucketed parquet like RunJob —
  * re-running after a crash resumes exactly at the incomplete buckets:
  *   <outDir>/keep_list  (doc_id, keep_id)          — the dedup table
  *   <outDir>/packed     (doc_id, stratum, n_tokens, start_offset, bin)
  *                        — the five-stage curation pipeline's output
  *   <outDir>/stats      (per-(lang, source) rollup, plain overwrite —
  *                        a ~|sources|×|langs| reporting table)
  * and prints one metrics JSON line (row counts from lineage aggregates,
  * no post-write re-reads). */
object CurationJob {

  def run(spark: SparkSession, docsPath: String, outDir: String,
          nBuckets: Int): Map[String, Long] = {
    val docs = spark.read.parquet(docsPath)
    val keep = graft.operators.Dedup.keepList(docs, minSharedPct = 80)
    val wroteKeep = GraphMaterializer.writeResumable(
      spark, keep, s"$outDir/keep_list", nBuckets)
    // the pipeline REUSES the keep-list computed above (its CC closure is
    // checkpointed, so `keep` re-evaluates as one cheap join) — without
    // this the job would run the LSH verification + closure twice
    val packed = Queries.curationPipelineOver(docs,
      precomputedKeepList = Some(keep))
    val wrotePacked = GraphMaterializer.writeResumable(
      spark, packed, s"$outDir/packed", nBuckets)
    // reporting rollup only when the corpus carries the grouping columns
    if (Seq("lang", "source").forall(docs.columns.contains))
      Queries.corpusStatsOver(docs)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$outDir/stats")
    Map(
      "keep_list" -> GraphMaterializer.lineageRowCount(spark, s"$outDir/keep_list"),
      "packed" -> GraphMaterializer.lineageRowCount(spark, s"$outDir/packed"),
      "buckets_written_keep_list" -> wroteKeep,
      "buckets_written_packed" -> wrotePacked)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CurationJob <docsParquet> <outDir> [nBuckets]")
    val nBuckets = if (args.length > 2) args(2).toInt else 32
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val counts = run(spark, args(0), args(1), nBuckets)
    println(counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
    spark.stop()
  }
}

/** Standalone evaluation job: gold vs predicted triple tables → micro
  * P/R/F JSON (evalsorel semantics, SURVEY.md §5.1). */
object Evaluate {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: Evaluate <goldParquet> <triplesParquet>")
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    implicit val s: SparkSession = spark
    spark.sparkContext.setLogLevel("WARN")
    val gold: DataFrame = spark.read.parquet(args(0))
    val pred: DataFrame = spark.read.parquet(args(1))
    val r = graft.eval.Evalsorel.evaluate(gold, pred)
    println(f"""{"tp":${r.tp},"fp":${r.fp},"fn":${r.fn},""" +
      f""""precision":${r.precision}%.4f,"recall":${r.recall}%.4f,"f1":${r.f1}%.4f}""")
    spark.stop()
  }
}
