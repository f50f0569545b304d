package graft

import graft.core._
import graft.pairs.ExampleGenerator
import graft.pairs.ExampleGenerator.{GoldRel, LabeledExample}
import org.scalatest.funsuite.AnyFunSuite

/** Training-mode example generation semantics (reference:
  * example_generation_cross_sentence_MD.py). */
class ExampleGeneratorSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  def m(id: String, bgn: Int, sent: Int): Mention =
    Mention("d1", id, "Protein", bgn, bgn + 4, s"P$id", s"norm$id", sent)

  val cfg: TaskConfig = TaskConfig.complexTome // k=7, undirected

  test("positives never distance-pruned; negatives pruned at k") {
    val mentions = Seq(m("T1", 0, 0), m("T2", 100, 9), m("T3", 200, 10))
    val gold = Seq(GoldRel("d1", "Complex_formation", directed = false, "T1", "T2"))
    val ex = ExampleGenerator.forDoc(mentions, gold, Nil, cfg)
      .map(e => (e.e1, e.e2) -> e).toMap
    // T1-T2: gold positive at sent_dist 9 ≥ k — kept (positives bypass F4)
    assert(ex(("T1", "T2")).labels == Seq("Complex_formation"))
    assert(ex(("T1", "T2")).cross_sentence)
    // T1-T3: negative at dist 10 ≥ 7 — pruned
    assert(!ex.contains(("T1", "T3")))
    // T2-T3: negative at dist 1 < 7 — kept as neg
    assert(ex(("T2", "T3")).labels == Seq("neg"))
  }

  test("equiv expansion replicates positives (J2)") {
    val mentions = Seq(m("T1", 0, 0), m("T2", 10, 0), m("T3", 20, 0))
    val gold = Seq(GoldRel("d1", "Complex_formation", directed = false, "T1", "T3"))
    val ex = ExampleGenerator.forDoc(mentions, gold, Seq(Set("T1", "T2")), cfg)
      .map(e => (e.e1, e.e2) -> e.labels).toMap
    assert(ex(("T1", "T3")) == Seq("Complex_formation"))
    assert(ex(("T2", "T3")) == Seq("Complex_formation"), "equiv replica must be positive")
    assert(ex(("T1", "T2")) == Seq("neg"), "within-equiv pair stays negative")
  }

  test("direction suffix: '>' when Arg1 occurs first, '<' otherwise") {
    val dirCfg = TaskConfig(Set("Protein"),
      Seq(RelationSpec("Regulation", directed = true,
        Seq(("Protein", "Protein")))), Some(7), 128)
    val mentions = Seq(m("T1", 0, 0), m("T2", 10, 0))
    val fwd = ExampleGenerator.forDoc(mentions,
      Seq(GoldRel("d1", "Regulation", directed = true, "T1", "T2")), Nil, dirCfg)
      .find(e => (e.e1, e.e2) == (("T1", "T2"))).get
    assert(fwd.labels == Seq("Regulation>"))
    val bwd = ExampleGenerator.forDoc(mentions,
      Seq(GoldRel("d1", "Regulation", directed = true, "T2", "T1")), Nil, dirCfg)
      .find(e => (e.e1, e.e2) == (("T1", "T2"))).get
    assert(bwd.labels == Seq("Regulation<"))
  }

  test("label sets aggregate sorted per unordered pair (A1)") {
    val multiCfg = TaskConfig(Set("Protein"),
      Seq(RelationSpec("B_rel", directed = false, Seq(("Protein", "Protein"))),
        RelationSpec("A_rel", directed = false, Seq(("Protein", "Protein")))),
      Some(7), 128)
    val mentions = Seq(m("T1", 0, 0), m("T2", 10, 0))
    val ex = ExampleGenerator.forDoc(mentions,
      Seq(GoldRel("d1", "B_rel", directed = false, "T1", "T2"),
        GoldRel("d1", "A_rel", directed = false, "T2", "T1")), Nil, multiCfg)
      .find(e => (e.e1, e.e2) == (("T1", "T2"))).get
    assert(ex.labels == Seq("A_rel", "B_rel"), "sorted label set")
  }

  test("dataset stage + stratified negative downsampling") {
    val mentions = spark.createDataset(Seq(
      m("T1", 0, 0), m("T2", 10, 0), m("T3", 20, 1), m("T4", 30, 2)))
    val gold = spark.createDataset(Seq(
      GoldRel("d1", "Complex_formation", directed = false, "T1", "T2")))
    val equivs = spark.createDataset(Seq.empty[(String, Seq[String])])
    val ex = ExampleGenerator.generate(mentions, gold, equivs, cfg)
    val all = ex.collect()
    assert(all.count(_.labels != Seq("neg")) == 1)
    assert(all.count(_.labels == Seq("neg")) == 5) // C(4,2)-1 within k
    val down = ExampleGenerator.downsampleNegatives(ex, 0.4, seed = 7).collect()
    assert(down.count(_.labels != Seq("neg")) == 1, "positives always kept")
    assert(down.count(_.labels == Seq("neg")) <= 5)
  }
}
