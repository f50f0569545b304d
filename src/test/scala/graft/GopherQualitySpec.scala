package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** The full Gopher quality rule set (Rae et al. 2021 MassiveText filters)
  * against hand-computed documents — one failing document per rule, one
  * passing all of them. */
class GopherQualitySpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  // 53 4-letter words + "the" + "of": 55 words, 217 word chars,
  // mean 217/55 ≈ 3.95 ∈ [3,10], all alpha, 2 stop hits → PASSES
  private val good = (Seq.fill(53)("word") ++ Seq("the", "of")).mkString(" ")

  private val docs = Seq(
    1L -> good,
    2L -> "too short to pass the word gate",        // n_words 7 < 50
    3L -> "- one\n- two\n- three",                  // all-bullet lines
    4L -> "first line goes on...\nsecond one too...", // all-ellipsis lines
    5L -> "# # # tag",                              // symbol ratio 3/4
    6L -> Seq.fill(60)("a").mkString(" "),          // mean word len 1 < 3
    7L -> good.replace("the", "123").replace("of", "456") // 0 stop hits
  ).toDF("doc_id", "text")

  private lazy val rows = TextAnalysis.gopherQuality(docs).collect()
    .map(r => r.getLong(0) -> r).toMap

  test("the compliant document passes every rule with the expected stats") {
    val r = rows(1L)
    assert(r.getAs[Int]("n_words") == 55)
    assert(r.getAs[Int]("n_stop_hits") == 2)
    assert(r.getAs[Int]("n_symbols") == 0)
    assert(r.getAs[Int]("n_alpha_words") == 55)
    assert(math.abs(r.getAs[Double]("mean_word_len") - 217.0 / 55) < 1e-12)
    assert(r.getAs[Int]("passes_gopher") == 1)
  }

  test("each adversarial document fails, for its specific rule") {
    assert(rows(2L).getAs[Int]("n_words") == 7)
    assert(rows(2L).getAs[Int]("passes_gopher") == 0)
    val bullets = rows(3L)
    assert(bullets.getAs[Int]("n_lines") == 3)
    assert(bullets.getAs[Int]("n_bullet_lines") == 3)
    assert(bullets.getAs[Double]("frac_bullet_lines") == 1.0)
    assert(bullets.getAs[Int]("passes_gopher") == 0)
    val ellipsis = rows(4L)
    assert(ellipsis.getAs[Int]("n_ellipsis_lines") == 2)
    assert(ellipsis.getAs[Double]("frac_ellipsis_lines") == 1.0)
    val symbols = rows(5L)
    assert(symbols.getAs[Int]("n_symbols") == 3)
    assert(symbols.getAs[Double]("symbol_word_ratio") == 0.75)
    assert(symbols.getAs[Int]("passes_gopher") == 0)
    val shortWords = rows(6L)
    assert(shortWords.getAs[Double]("mean_word_len") == 1.0)
    assert(shortWords.getAs[Int]("passes_gopher") == 0)
    val noStops = rows(7L)
    assert(noStops.getAs[Int]("n_stop_hits") == 0)
    // digits-only words also dent the alpha fraction, but 2/55 keeps it ≥ 0.8
    assert(noStops.getAs[Int]("n_alpha_words") == 53)
    assert(noStops.getAs[Int]("passes_gopher") == 0)
  }

  test("the ellipsis symbol count uses non-overlapping triples") {
    // "....." (5 dots) holds exactly one non-overlapping "..."
    val d = Seq(8L -> "word .....").toDF("doc_id", "text")
    val r = TextAnalysis.gopherQuality(d).collect().head
    assert(r.getAs[Int]("n_symbols") == 1)
  }
}
