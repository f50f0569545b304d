package graft.streaming

import graft.core._
import graft.nlp.AhoCorasick
import graft.score.RelationScorer
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming ingestion veneer (SURVEY.md §2.8).
  *
  * The reference is strictly batch — its "incremental" unit is the shard,
  * independently processed and resumable (large_scale_prediction_pipeline_
  * tf.py:199, :273-286). The streaming veneer gives the same contract with
  * Spark-native machinery: new document files appearing under a directory
  * are picked up by the file stream source, flow through the IDENTICAL
  * fused extraction pass (stateless — no watermark/state needed for
  * extraction), and append to the triple table; checkpointing makes
  * ingestion exactly-once per file, the streaming analog of the lineage
  * table's exact resume. `Trigger.AvailableNow` drains everything present
  * and stops — shard-batch semantics on streaming rails.
  */
object StreamingIngest {

  /** Streaming triples from a documents directory. Canonicalization joins
    * the (static, broadcast) canonical map against the stream — a
    * stream-static join, supported in append mode. */
  def triples(spark: SparkSession, docsDir: String,
              dict: Broadcast[AhoCorasick], scorer: RelationScorer,
              canonMap: DataFrame,
              config: TaskConfig = TaskConfig.complexTome): DataFrame = {
    import spark.implicits._
    val docSchema = implicitly[org.apache.spark.sql.Encoder[Doc]].schema
    val docs: Dataset[Doc] = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", "64") // bound micro-batch size
      .parquet(docsDir)
      .as[Doc]
    val scored = graft.KgPipeline.scoreCandidates(docs, dict, scorer, config)(spark)
    val positives = scored.filter((s: ScoredPair) => s.score_pos > s.score_neg)
    val canon = graft.canon.ConnectedComponents.withCanonical(
      graft.canon.ConnectedComponents.withCanonical(
        positives.toDF(), "e1_norm", canonMap, "subj"),
      "e2_norm", canonMap, "obj")
    canon.select($"doc_id",
      least($"subj", $"obj").as("subj"),
      lit("Complex_formation").as("pred"),
      greatest($"subj", $"obj").as("obj"),
      $"e1", $"e2", $"score_neg", $"score_pos")
  }

  /** Drain-everything-and-stop run (AvailableNow): writes the streaming
    * triples to a parquet sink with a checkpoint, returns the query for
    * the caller to await. Restarting with the same checkpoint skips
    * already-ingested files — exactly-once per file. */
  def runAvailableNow(out: DataFrame, sinkDir: String, checkpointDir: String): StreamingQuery =
    out.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
