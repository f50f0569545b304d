package graft

import graft.core.{CandidatePair, Mention, ScoredPair}
import graft.ingest.{DocValidator, ShardReader}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real brat tar.gz shard ingestion parity against the reference's shipped
  * sample shard (BASELINE.md row 5: 525 docs, 17,523 T entities in
  * sample_data/input_1/00000.tar.gz — measured on the reference repo). */
class ShardIngestSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  val sampleShard =
    "/root/reference/LargeScaleRelationExtractionPipeline/sample_data/input_1/00000.tar.gz"

  lazy val shard = ShardReader.parseShardDir(spark, sampleShard)

  test("sample shard parity: 525 docs, 17,523 T entities, zero quarantine") {
    assert(shard.docs.count() == 525)
    assert(shard.goldMentions.count() == 17523)
    assert(shard.quarantine.count() == 0,
      shard.quarantine.take(3).mkString("; "))
  }

  test("AnnotatorNotes STRING ids are captured as norm_ids") {
    // the corpus's entity-linking ground truth rides in '#' notes
    // (brat_json_converter.py:77-78 skips them; the engine keeps them)
    val withNorm = shard.goldMentions.filter(length(col("norm_id")) > 0).count()
    assert(withNorm > 15000, s"only $withNorm mentions carry a STRING id")
    val sample = shard.goldMentions
      .filter(col("doc_id") === "10212000" && col("t_id") === "T1")
      .head()
    assert(sample.norm_id.endsWith("9606.ENSP00000269305"))
  }

  test("ingested docs pass DocValidator and keep the span invariant") {
    val (good, bad) = DocValidator.split(shard.docs)
    assert(good.count() == 525 && bad.count() == 0)
    // span-sequence shape: exactly one text span at offset 0, no media
    val shapes = shard.docs.map { d =>
      (d.spans.length, d.spans.head.kind, d.spans.head.offset,
        d.spans.head.media_ref.isEmpty)
    }.distinct().collect()
    assert(shapes.toSeq == Seq((1, "text", 0, true)))
  }

  test("directory scan ingests all 5 shards in one pass (2,533 docs)") {
    // the shard FOLDER is the reference's SLURM job unit; the engine's
    // binaryFile scan covers it in one distributed pass, shards extracted
    // independently per task (counts per shard: 525/517/500/498/493,
    // measured on the reference repo)
    val all = ShardReader.parseShardDir(spark,
      "/root/reference/LargeScaleRelationExtractionPipeline/sample_data/input_1")
    assert(all.docs.count() == 2533)
    assert(all.quarantine.count() == 0)
    // shard provenance survives into per-doc rows via distinct doc ids
    assert(all.docs.select("doc_id").distinct().count() == 2533)
    // release the shared parse cache once the outputs are materialized —
    // the documented ShardDocs contract
    all.unpersist()
  }

  val reOutputShard =
    "/root/reference/LargeScaleTriggerDetectionPipeline/sample_data/1/06000.tar.gz"

  test("RE-output shard: real R relations parse and round-trip evalsorel at P=R=1") {
    // the trigger pipeline's sample input IS the RE pipeline's output —
    // .ann files with Complex_formation R lines (67 docs, 11,010 T, 466 R
    // in 06000.tar.gz, counted on the reference repo)
    val shard = ShardReader.parseShardDir(spark, reOutputShard)
    assert(shard.docs.count() == 67)
    assert(shard.goldMentions.count() == 11010)
    assert(shard.goldRelations.count() == 466)
    assert(shard.quarantine.count() == 0,
      shard.quarantine.take(3).mkString("; "))
    // representation round-trip: feeding the parsed relations back as
    // predictions must score perfectly (symmetric matching + duplicate
    // dropping must not lose or invent pairs on real data)
    val gold = shard.goldRelations.toDF()
    val pred = gold.select(col("doc_id"), col("rel_type").as("pred"),
      col("arg1_norm").as("subj"), col("arg2_norm").as("obj"),
      lit(0.0).as("score_neg"), lit(1.0).as("score_pos"))
    val r = graft.eval.Evalsorel.evaluate(gold, pred)
    assert(r.fp == 0 && r.fn == 0 && r.precision == 1.0 && r.recall == 1.0,
      s"round-trip must be exact: $r")
  }

  test("trigger detection on real RE-output positives: junk-free, offset-exact") {
    // the R pairs of the RE-output shard are real positives on real
    // biomedical text — window-encode each and run trigger detection;
    // every emitted trigger must be non-junk and its (bgn, end, text) must
    // reconstruct exactly from the document (the C2 invariant on the
    // trigger TSV columns)
    val shard = ShardReader.parseShardDir(spark, reOutputShard)
    val docById = shard.docs.collect().map(d => d.doc_id -> d).toMap
    val mentionsByDoc = shard.goldMentions.collect().groupBy(_.doc_id)
    val rels = shard.goldRelations.collect()
    var windows = 0
    var triggers = 0
    rels.foreach { r =>
      val doc = docById(r.doc_id)
      val text = doc.spans.head.text
      // gold offsets are codepoint-based; restrict to BMP-only docs where
      // they coincide with JVM char offsets
      if (text.codePointCount(0, text.length) == text.length) {
        val ms = mentionsByDoc(r.doc_id)
        def find(arg: String) = ms.find(m => m.norm_id == arg || m.t_id == arg)
        for (a <- find(r.arg1_norm); b <- find(r.arg2_norm); if a.bgn != b.bgn) {
          val (e1, e2) = if (a.bgn <= b.bgn) (a, b) else (b, a)
          val pair = CandidatePair(r.doc_id, e1.t_id, e2.t_id,
            e1.norm_id, e2.norm_id, e1.bgn, e1.end, e2.bgn, e2.end, 0, 0, 0,
            cross_sentence = false)
          val tokens = graft.nlp.Tokenizer.tokenize(text)
          val asMentions = ms.map(m =>
            Mention(m.doc_id, m.t_id, m.tag, m.bgn, m.end, m.text, m.norm_id, 0)).toSeq
          val enc = graft.score.WindowEncoder
            .encodeDoc(tokens, Seq(pair), asMentions, 128).head
          if (enc.fitted) {
            windows += 1
            val sp = ScoredPair(r.doc_id, e1.t_id, e2.t_id, e1.norm_id, e2.norm_id,
              0, enc.tokens, enc.tokenBgns, enc.tokenEnds, 0.0, 1.0)
            graft.triggers.TriggerDetector.triggersFor(sp).foreach { t =>
              triggers += 1
              assert(!graft.triggers.TriggerDetector.isJunk(t.text))
              assert(text.substring(t.bgn, t.end) == t.text,
                s"trigger span must reconstruct: '${text.substring(t.bgn, t.end)}' vs '${t.text}'")
            }
          }
        }
      }
    }
    assert(windows > 200, s"too few fitted real windows: $windows")
    assert(triggers > 200, s"too few triggers: $triggers")
  }

  test("member-integrity check quarantines unpaired members, keeps the rest") {
    // synthesize a shard stream with a missing twin: the reference HALTS
    // the whole shard here (tf.py:308-322); the engine isolates the doc
    val members = Seq(
      ShardReader.ShardMember("s1", "a.ann", "T1\tProtein 0 2\tab"),
      ShardReader.ShardMember("s1", "a.txt", "ab"),
      ShardReader.ShardMember("s1", "orphan.ann", "T1\tProtein 0 1\tx"),
      ShardReader.ShardMember("s1", "readme.md", "ignored")
    ).toDS()
    val (docs, quarantine) = ShardReader.pairMembers(members)
    assert(docs.collect().map(_.doc_id).toSeq == Seq("a"))
    val q = quarantine.collect()
    assert(q.length == 1 && q.head.doc_id == "orphan" &&
      q.head.reason.contains("missing .txt"))
  }

  test("a doc failing brat validation quarantines with its error, shard survives") {
    val members = Seq(
      ShardReader.ShardMember("s1", "good.ann", "T1\tProtein 0 2\tab"),
      ShardReader.ShardMember("s1", "good.txt", "abc"),
      ShardReader.ShardMember("s1", "bad.ann", "T1\tProtein 0 2\tZZ"), // recon mismatch
      ShardReader.ShardMember("s1", "bad.txt", "ab")
    ).toDS()
    val (raw, _) = ShardReader.pairMembers(members)
    // route through the same parse-or-quarantine map parseShardDir uses
    val parsed = raw.map { d =>
      try { graft.ingest.BratParser.parse(d.doc_id, d.ann, d.txt); (d.doc_id, "") }
      catch { case e: Exception => (d.doc_id, e.getMessage) }
    }.collect().toMap
    assert(parsed("good") == "")
    assert(parsed("bad").contains("span text"))
  }

  test("full KG pipeline runs end-to-end on the real shard's documents") {
    // dictionary from the shard's own gold surfaces (top mentions) — proves
    // the ingested Doc shape drives the actual extraction pass
    val dict = shard.goldMentions
      .groupBy(col("text")).count().orderBy(col("count").desc, col("text"))
      .limit(50).collect()
      .map(r => graft.core.DictEntry(r.getString(0), s"str:${r.getString(0)}", "Protein"))
      .toSeq
    val out = KgPipeline.run(shard.docs, dict,
      spark.emptyDataset[graft.core.EquivEdge],
      graft.score.LexiconScorer.default)
    assert(out.scoredAll.count() > 0)
    assert(out.nodes.count() > 0)
  }
}
