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

  /** Stateful streaming dedup: emit each document the FIRST time its text
    * fingerprint is seen, across micro-batches — `flatMapGroupsWithState`
    * keyed by the fingerprint, a Boolean "seen" state per key. The
    * streaming analog of `Dedup.exact` for continuous ingestion: state is
    * checkpointed with the query, so resume keeps the dedup exact. */
  def dedupStream(docs: Dataset[Doc])(implicit spark: SparkSession): Dataset[Doc] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    docs.groupByKey(d => graft.functions.RollingHashExpr.hash(
        d.spans.filter(_.kind == "text").map(_.text).mkString("\u0000")
          .getBytes("UTF-8")))
      .flatMapGroupsWithState[Boolean, Doc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[Doc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1) }
      }
  }

  /** Streaming session windows: the q14 batch aggregation on streaming
    * rails — watermarked event time + the native `session_window`
    * generator. In append mode Spark finalizes and emits a session only
    * once the watermark passes its end (no late event can merge into it
    * anymore) — exactly-once session rows without a line of custom state
    * code, where the reference has no streaming story at all. */
  def sessionizeStream(events: DataFrame, gap: String = "30 minutes",
                       watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("sw.start")).as("session_start"),
        unix_timestamp(col("sw.end")).as("session_end"),
        col("n_events"))

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
