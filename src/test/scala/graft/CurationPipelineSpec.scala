package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed curation pipeline (keep-list → decontam → quality gates →
  * sample → pack): the survivor set must equal the conjunction of the
  * individual stages' verdicts, the packed layout must be a gapless
  * prefix sum over exactly that set, and every configured stage must
  * demonstrably bind (repetition gate, line dedup, eval-set switch). */
class CurationPipelineSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("pipeline survivors = reps ∖ contaminated ∖ gate-fails, sampled") {
    val docs = Queries.table(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val out = Queries.curationPipeline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val outIds = out.map(_._1).toSet
    assert(out.nonEmpty, "the pipeline must keep a non-trivial survivor set")

    // stage-by-stage expected set, recomputed from the operators directly:
    // the keep-list runs over the CORPUS slice only (the eval slice is a
    // held-out suite — dedup must never see it)
    val reps = Dedup.keepList(corpus, minSharedPct = 80)
      .filter(col("doc_id") === col("keep_id"))
      .collect().map(_.getLong(0)).toSet
    val contaminated = Dedup.decontaminate(
        corpus, docs.filter(col("doc_id") % 5 === 0))
      .collect().map(_.getLong(0)).toSet
    val quality = TextAnalysis.gopherQuality(corpus)
      .filter(col("n_words").between(50, 100000) &&
        col("mean_word_len").between(3.0, 10.0))
      .collect().map(_.getLong(0)).toSet
    val lowRepetition = TextAnalysis.repetition(corpus)
      .filter(col("bi_dup_frac") <= 0.1)
      .collect().map(_.getLong(0)).toSet
    val coinKept = corpus.select(col("doc_id"),
        size(split(col("text"), " ")).as("n"),
        pmod(pmod(lit(Dedup.HashA(0)) * col("doc_id") + lit(Dedup.HashB(0)),
          lit(Dedup.HashP)), lit(1000L)).as("coin"))
      .collect()
      .filter(r => r.getLong(2) < (if (r.getInt(1) < 70) 500L else 750L))
      .map(_.getLong(0)).toSet
    val expected = reps
      .diff(contaminated)
      .intersect(quality)
      .intersect(lowRepetition)
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

  /** The deterministic sampling coin for a doc id (mirrors
    * Sampling.stratifiedSample); tests pick ids that PASS the coin so the
    * gate under test is the only thing separating survivors. */
  private def coin(id: Long): Long =
    math.floorMod(math.floorMod(Dedup.HashA(0) * id + Dedup.HashB(0),
      Dedup.HashP), 1000L)
  private def coinPassingIds(n: Int, permille: Int): Seq[Long] =
    (1L to 500L).filter(coin(_) < permille).take(n)

  test("repetition gate drops a high-repetition doc the other gates pass") {
    // clean doc: 60 distinct words → bigram dup frac 0. spam doc: the
    // same length but one bigram loop ("spam ham1" ×30) → dup frac
    // 1 − 2/59 ≈ 0.97. Both pass word count (60 ∈ [50, 100k]) and mean
    // word length, and both ids pass the 500‰ short-band coin, so the
    // repetition gate is the only discriminator.
    val Seq(cleanId, spamId) = coinPassingIds(2, 500)
    val clean = (1 to 60).map(i => f"wrd$i%03d").mkString(" ") // 6-char words
    val spam = Seq.fill(30)("spam ham1").mkString(" ")         // 4.0 mean len
    val docs = Seq(cleanId -> clean, spamId -> spam).toDF("doc_id", "text")
    def run(cfg: CurationConfig) =
      Queries.curationPipelineOver(docs, evalSet = None, config = cfg)
        .collect().map(_.getLong(0)).toSet
    val gated = run(CurationConfig())
    assert(gated == Set(cleanId),
      s"the repetition gate must drop the spam doc and keep the clean one: $gated")
    val ungated = run(CurationConfig(maxBigramDupFrac = None))
    assert(ungated == Set(cleanId, spamId),
      s"without the gate both docs survive (coin/quality not the cause): $ungated")
  }

  test("line-dedup stage rewrites text before dedup, gates and packing") {
    // two docs share a boilerplate line; each also carries 59 unique
    // words. With lineDedupMinDocs=2 the banner is stripped EVERYWHERE:
    // packed n_tokens must count only the cleaned words.
    val Seq(idA, idB) = coinPassingIds(2, 500)
    val banner = (1 to 10).map(i => s"ban$i").mkString(" ")
    def body(tag: String) = (1 to 59).map(i => f"$tag$i%02d").mkString(" ")
    val docs = Seq(
      idA -> s"$banner\n${body("aaa")}",
      idB -> s"$banner\n${body("bbb")}").toDF("doc_id", "text")
    val out = Queries.curationPipelineOver(docs, evalSet = None,
        config = CurationConfig(lineDedupMinDocs = Some(2L)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set(idA, idB), s"cleaned docs must survive: ${out.keySet}")
    out.foreach { case (id, n) =>
      assert(n == 59L, s"doc $id: packed n_tokens $n must exclude the banner")
    }
    // without the stage the banner words count (the "\n" splice merges
    // ban10 with the first body word under whitespace tokenization:
    // 9 + 1 + 58 = 68 tokens)
    val raw = Queries.curationPipelineOver(docs, evalSet = None,
        config = CurationConfig())
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    raw.foreach { case (id, n) =>
      assert(n == 68L, s"doc $id: without line dedup n_tokens $n includes the banner")
    }
  }

  test("evalSet = None skips decontamination; an external eval set binds") {
    val Seq(hitId, missId) = coinPassingIds(2, 500)
    // hitId IS an eval entry verbatim; missId shares nothing with eval
    val evalText = (1 to 60).map(i => s"evl$i").mkString(" ")
    val docs = Seq(
      hitId -> evalText,
      missId -> (1 to 60).map(i => s"oth$i").mkString(" ")).toDF("doc_id", "text")
    val eval = Seq(100000L -> evalText).toDF("doc_id", "text")
    val cfg = CurationConfig()
    val without = Queries.curationPipelineOver(docs, None, cfg)
      .collect().map(_.getLong(0)).toSet
    assert(without == Set(hitId, missId),
      s"no eval set → no decontamination: $without")
    val withEval = Queries.curationPipelineOver(docs, Some(eval), cfg)
      .collect().map(_.getLong(0)).toSet
    assert(withEval == Set(missId),
      s"the external eval set must knock out the contaminated doc: $withEval")
  }

  test("redactPii masks survivors after the gates, before packing") {
    // 56 distinct words + "call +1 234 567 8901": 61 tokens raw, the
    // phone is 4 tokens -> 1 mask, so the packed row must carry 58
    // tokens when the stage is on and 61 when off. Redaction must run
    // AFTER dedup (the doc still dedups/gates on its raw text).
    val Seq(id) = coinPassingIds(1, 500)
    val words = (1 to 56).map(i => f"pii$i%03d").mkString(" ")
    val docs = Seq(id -> s"$words call +1 234 567 8901").toDF("doc_id", "text")
    def nTokens(cfg: CurationConfig): Long =
      Queries.curationPipelineOver(docs, None, cfg)
        .collect().map(r => r.getLong(2)).head
    assert(nTokens(CurationConfig()) == 61L)
    assert(nTokens(CurationConfig(redactPii = true)) == 58L)
  }

  test("minClassifierLogit gates on the hashed linear score") {
    val Seq(idA, idB) = coinPassingIds(2, 500)
    val docs = Seq(
      idA -> (1 to 60).map(i => f"cla$i%03d").mkString(" "),
      idB -> (1 to 60).map(i => f"clb$i%03d").mkString(" ")).toDF("doc_id", "text")
    val logits = TextAnalysis.classifierScore(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (top, topLogit) = logits.maxBy(_._2)
    assert(logits(idA) != logits(idB), "test docs must separate")
    def run(cfg: CurationConfig) =
      Queries.curationPipelineOver(docs, None, cfg)
        .collect().map(_.getLong(0)).toSet
    assert(run(CurationConfig()) == Set(idA, idB))
    assert(run(CurationConfig(minClassifierLogit = Some(topLogit))) == Set(top),
      "the threshold at the max logit must keep exactly the top doc")
  }

  test("corpus stats keep groups whose docs all have null text") {
    val docs = Seq(
      (1L, "alpha beta", "en", "s1"),
      (2L, null.asInstanceOf[String], "xx", "s2"),
      (3L, null.asInstanceOf[String], "xx", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = Queries.corpusStatsOver(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    assert(rows.keySet == Set(("en", "s1"), ("xx", "s2")),
      s"the all-null-text group must not vanish from the rollup: ${rows.keySet}")
    assert(rows(("xx", "s2")) == 0L, "no tokens → distinct_tokens 0")
    assert(rows(("en", "s1")) == 2L)
  }

  test("CurationJob.parseConfig threads k=v overrides and rejects unknowns") {
    val c = CurationJob.parseConfig(Seq(
      "minWords=100", "maxBigramDupFrac=none", "lineDedupMinDocs=3",
      "fullGopher=true", "longPermille=600", "seqLen=1024",
      "minMeanWordLen=2.5"))
    assert(c.minWords == 100 && c.maxBigramDupFrac.isEmpty &&
      c.lineDedupMinDocs.contains(3L) && c.fullGopher &&
      c.longPermille == 600 && c.seqLen == 1024 && c.minMeanWordLen == 2.5)
    assert(c.maxWords == 100000, "untouched fields keep their defaults")
    intercept[RuntimeException](CurationJob.parseConfig(Seq("nope=1")))
  }
}
