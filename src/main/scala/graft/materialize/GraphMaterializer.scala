package graft.materialize

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph materialization + lineage/resume (SURVEY.md S5-S9, W2; §7.1
  * modules 8 & 10).
  *
  * Iceberg-shaped tables are emulated as `bucket`-partitioned Parquet with
  * dynamic partition overwrite (no iceberg runtime jar ships in the image;
  * SURVEY.md §7 head note) — swapping in real Iceberg is a format string.
  *
  * Resume contract (the engine analog of the reference's per-shard
  * skip-on-error + `.err.log` fault isolation,
  * large_scale_prediction_pipeline_tf.py:202-236, :273-286):
  *  - output rows are bucketed by `pmod(hash(doc_id), nBuckets)`;
  *  - one Spark job writes all pending buckets via dynamic partition
  *    overwrite (idempotent under retry — a re-run of a bucket replaces it
  *    byte-for-byte, never duplicates);
  *  - lineage rows (bucket, counts, status) are appended only AFTER the
  *    data commit, so a crash between data and lineage re-processes the
  *    bucket — safe because the overwrite is idempotent;
  *  - on restart, buckets already marked ok are anti-joined away from the
  *    input: exact resume with no driver-side loop over buckets.
  */
object GraphMaterializer {

  val BucketCol = "graft_bucket"

  def withBucket(df: DataFrame, nBuckets: Int, key: String = "doc_id"): DataFrame =
    df.withColumn(BucketCol, pmod(hash(col(key)), lit(nBuckets)))

  private def lineagePath(table: String) = s"$table/_lineage"

  /** Buckets recorded ok in a table's lineage (empty frame if none yet). */
  def completedBuckets(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    try spark.read.parquet(lineagePath(table))
      .filter($"status" === "ok").select($"bucket").distinct()
    catch { case _: Throwable => Seq.empty[Int].toDF("bucket") }
  }

  /** Write `df` (must carry doc_id) bucketed, skipping buckets whose
    * lineage row says ok; append lineage for newly written buckets.
    * @return number of buckets written this invocation */
  def writeResumable(spark: SparkSession, df: DataFrame, table: String,
                     nBuckets: Int = 32, key: String = "doc_id"): Long = {
    import spark.implicits._
    val done = completedBuckets(spark, table)
    val pending = withBucket(df, nBuckets, key)
      .join(done.withColumnRenamed("bucket", BucketCol), Seq(BucketCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // per-write option, NOT a session conf mutation: a session-level
      // partitionOverwriteMode=dynamic would silently change the semantics
      // of every later overwrite write in the same shared session
      pending.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BucketCol)
        .parquet(s"$table/data")
      // lineage after the data commit, derived from the PENDING rows (one
      // cached pass) — never by re-reading the output table, which at
      // 100 TB would be a second full scan of every bucket ever written
      val lineage = pending
        .groupBy(col(BucketCol).as("bucket"))
        .agg(countDistinct(col(key)).as("n_docs"), count(lit(1)).as("n_triples"))
        .withColumn("status", lit("ok")).withColumn("error", lit(""))
      val n = lineage.count()
      if (n > 0) lineage.write.mode(SaveMode.Append).parquet(lineagePath(table))
      n
    } finally pending.unpersist()
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$table/data").drop(BucketCol)

  /** Cumulative row count of a table from its LINEAGE — one tiny metadata
    * read, never a re-scan of `<table>/data` (at 100 TB a post-write
    * count() is another full pass over every bucket ever written; the
    * lineage aggregate already has the numbers). One ok row per completed
    * bucket; a bucket re-processed after a crash between data commit and
    * lineage append re-appends the same idempotent counts, so duplicates
    * collapse with max. */
  def lineageRowCount(spark: SparkSession, table: String): Long = {
    import spark.implicits._
    // a table with no lineage yet counts 0; any OTHER failure (corrupt
    // footer, permission, partial write) must surface, not read as "zero
    // rows written" — that would make a failed run look like an empty one
    val p = new org.apache.hadoop.fs.Path(lineagePath(table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0L
    spark.read.parquet(lineagePath(table))
      .filter($"status" === "ok")
      .groupBy($"bucket").agg(max($"n_triples").as("n"))
      .agg(coalesce(sum($"n"), lit(0L))).as[Long].head()
  }

  /** TSV export with the reference's per-file sequential ids (W2):
    * `R{n}` assigned by row_number over (doc_id) ordered by the natural key
    * (large_scale_prediction_pipeline_pt.py:457-516 writeback numbering).
    * 5-col RE format per LargeScaleRelationExtractionPipeline/README.md:36.
    */
  def triplesToTsv(triples: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("subj"), col("obj"), col("e1"), col("e2"))
    triples
      .withColumn("r_id", concat(lit("R"), row_number().over(w)))
      .select(col("doc_id"), col("r_id"),
        concat_ws("\t", col("doc_id"), col("e1"), col("e2"), col("pred"),
          format_number(col("score_pos"), 4)).as("tsv_row"))
  }

  /** brat .ann writeback (S7/S8 byte-format parity — reference:
    * large_scale_prediction_pipeline_pt.py:457-531): one row per doc whose
    * `ann_text` is the standoff content — `T` entity lines
    * (`T{n}\t{tag} {bgn} {end}\t{text}`) followed by `R` relation lines
    * (`R{n}\t{type} Arg1:{e1} Arg2:{e2}`), R-numbering per doc in natural
    * key order (W2). Round-trips through BratParser (tested). */
  def toAnn(mentions: DataFrame, triples: DataFrame): DataFrame = {
    val tLines = mentions.select(col("doc_id"),
      struct(col("bgn"), col("mention_id")).as("ord"),
      concat_ws("\t", col("mention_id"),
        concat(col("tag"), lit(" "), col("bgn"), lit(" "), col("end")),
        col("text")).as("line"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("subj"), col("obj"), col("e1"), col("e2"))
    val rLines = triples
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"),
        struct(lit(Int.MaxValue).as("bgn"), concat(lit("R"), col("rn")).as("mention_id")).as("ord"),
        concat_ws("\t", concat(lit("R"), col("rn")),
          concat(col("pred"), lit(" Arg1:"), col("e1"), lit(" Arg2:"), col("e2")))
          .as("line"))
    tLines.unionByName(rLines)
      .groupBy(col("doc_id"))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("ord"), col("line")))),
          s => s.getField("line"))).as("ann_text"))
  }

  /** The reference's per-output-file TSV header line
    * (large_scale_prediction_pipeline_tf.py:240-244): the task's
    * confidence-index mapping rendered exactly as Python's str(dict) —
    * `# confidence indices:\t{0: 'neg', 1: 'Complex_formation'}`. */
  def confidenceHeader(labels: Seq[String] = Seq("neg", "Complex_formation")): String =
    "# confidence indices:\t" + labels.zipWithIndex
      .map { case (l, i) => s"$i: '$l'" }.mkString("{", ", ", "}")

  /** RE TSV export WITH the header as row 0 — the first thing a user
    * diffing exports against reference shards hits. `ord` is the export
    * sort key (header < every data row); doc_id widens to string so the
    * header row unions cleanly. */
  def triplesToTsvWithHeader(triples: DataFrame,
                             labels: Seq[String] = Seq("neg", "Complex_formation")): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val header = Seq((0, "", confidenceHeader(labels))).toDF("ord", "doc_id", "tsv_row")
    val rows = triplesToTsv(triples)
      .select(lit(1).as("ord"), col("doc_id").cast("string").as("doc_id"),
        col("tsv_row"))
    header.unionByName(rows)
  }

  /** Trigger .ann writeback (the reference re-emits best-trigger spans as
    * standoff T lines — large_scale_explanation_pipeline.py:514-519, with
    * per-file numbering from 1 in example order, :370/:463):
    * `T{n}\tTrigger {bgn} {end}\t{text}`, n per doc over the natural pair
    * key. Round-trips through BratParser (Trigger parses as an entity tag). */
  def triggersToAnn(triggers: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("e1"), col("e2"), col("bgn"), col("end"))
    triggers
      .withColumn("tn", row_number().over(w))
      .select(col("doc_id"), col("tn"),
        concat_ws("\t", concat(lit("T"), col("tn")),
          concat(lit("Trigger "), col("bgn"), lit(" "), col("end")),
          col("text")).as("line"))
      .groupBy(col("doc_id"))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("tn"), col("line")))),
          s => s.getField("line"))).as("ann_text"))
  }

  /** 9-col trigger TSV (S6 / trigger-row format per
    * LargeScaleTriggerDetectionPipeline/README.MD:26 and
    * large_scale_explanation_pipeline.py:490-502):
    * pmid e1 e2 neg_logit pos_logit trigger_score bgn end text.
    * Scores come from the pair's ScoredPair row joined on identity. */
  def triggersToTsv(triggers: DataFrame, scored: DataFrame): DataFrame =
    triggers.join(
        scored.select(col("doc_id"), col("e1"), col("e2"),
          col("score_neg"), col("score_pos")),
        Seq("doc_id", "e1", "e2"))
      .select(col("doc_id"),
        concat_ws("\t", col("doc_id"), col("e1"), col("e2"),
          format_number(col("score_neg"), 4), format_number(col("score_pos"), 4),
          format_number(col("score"), 4),
          col("bgn"), col("end"), col("text")).as("tsv_row"))

  /** Full trigger TSV: every scored pair gets a row. Pairs WITH triggers
    * get the 9-col rows (one per trigger); every other pair — negatives
    * (large_scale_explanation_pipeline.py:383-389) AND positives whose
    * trigger selection failed (invalid explanation :413-427, no valid
    * trigger :433-449 — the reference writes those scores-only too) —
    * gets a scores-only row with empty trigger columns. Expressed as an
    * anti-join against the trigger pairs, so no scored example ever
    * vanishes from the export. */
  def triggersToTsvAll(triggers: DataFrame, scored: DataFrame): DataFrame = {
    val scoreOnly = scored
      .join(triggers.select(col("doc_id"), col("e1"), col("e2")).distinct(),
        Seq("doc_id", "e1", "e2"), "left_anti")
      .select(col("doc_id"),
        concat_ws("\t", col("doc_id"), col("e1"), col("e2"),
          format_number(col("score_neg"), 4), format_number(col("score_pos"), 4),
          lit(""), lit(""), lit(""), lit("")).as("tsv_row"))
    triggersToTsv(triggers, scored).unionByName(scoreOnly)
  }
}
