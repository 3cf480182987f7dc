package graft

import graft.ml.{ClassifierEval, RankEval}
import org.apache.spark.sql.functions._

/** Round-12: classifier eval (rank-statistic AUC with tie handling,
  * PR curve / AP, confusion, calibration) and ranking eval
  * (MRR / nDCG@k / P@k / R@k) — hand-computed cases. */
class Batch35Spec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Double, Boolean)]): Double =
    ClassifierEval.rocAuc(rows.toDF("s", "y"), "s", "y")
      .select("auc").as[Double].head()

  test("rocAuc: hand-computed with a tie straddling the classes") {
    // scores asc: 0.1(neg, rank 1), 0.4 tie group (one pos one neg,
    // avg rank 2.5), 0.8(pos, rank 4)
    // U = (2.5 + 4) - 2*3/2 = 3.5 -> AUC = 3.5 / (2*2) = 0.875
    assert(auc(Seq((0.1, false), (0.4, true), (0.4, false), (0.8, true)))
      === 0.875)
  }

  test("rocAuc: 1.0 on perfect separation, 0.0 reversed, 0.5 all-tied") {
    assert(auc(Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false)))
      === 1.0)
    assert(auc(Seq((0.1, true), (0.2, true), (0.8, false), (0.9, false)))
      === 0.0)
    assert(auc(Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false)))
      === 0.5)
  }

  test("prCurve and averagePrecision match the hand-computed step curve") {
    // desc thresholds: 0.9 (pos) -> tp1 fp0 P=1 R=1/2
    //                  0.5 (neg) -> tp1 fp1 P=1/2
    //                  0.3 (pos) -> tp2 fp1 P=2/3 R=1
    val df = Seq((0.9, true), (0.5, false), (0.3, true)).toDF("s", "y")
    val curve = ClassifierEval.prCurve(df, "s", "y")
      .orderBy(col("threshold").desc)
      .as[(Double, Long, Long, Double, Double)].collect()
    assert(curve.toSeq === Seq(
      (0.9, 1L, 0L, 1.0, 0.5),
      (0.5, 1L, 1L, 0.5, 0.5),
      (0.3, 2L, 1L, 0.666667, 1.0)))
    // AP = (1/2)*1 + (1/2)*(2/3) = 5/6
    val ap = ClassifierEval.averagePrecision(df, "s", "y")
      .select("ap").as[Double].head()
    assert(ap === math.rint(5.0 / 6.0 * 1e6) / 1e6)
  }

  test("confusionAtThreshold counts and rates") {
    val df = Seq((0.9, true), (0.8, false), (0.2, true), (0.1, false))
      .toDF("s", "y")
    val c = ClassifierEval.confusionAtThreshold(df, "s", "y", 0.5)
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)].head()
    assert(c === ((1L, 1L, 1L, 1L, 0.5, 0.5, 0.5, 0.5)))
  }

  test("calibrationBins: per-bin counts, exact mean, positive rate") {
    val df = Seq((0.05, false), (0.15, true), (0.15, false), (0.95, true))
      .toDF("s", "y")
    val bins = ClassifierEval.calibrationBins(df, "s", "y", nBins = 10)
      .orderBy("bin").as[(Int, Long, Double, Double)].collect()
    assert(bins.toSeq === Seq(
      (0, 1L, 0.05, 0.0), (1, 2L, 0.15, 0.5), (9, 1L, 0.95, 1.0)))
    // score 1.0 clamps into the last bin
    val edge = ClassifierEval.calibrationBins(
        Seq((1.0, true)).toDF("s", "y"), "s", "y", nBins = 10)
      .as[(Int, Long, Double, Double)].head()
    assert(edge._1 === 9)
  }

  test("classReport and kappaSummary: hand-computed 2-class case") {
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"))
      .toDF("label", "pred")
    val rep = graft.ml.ClassifierEval.classReport(df, "label", "pred")
      .orderBy("class")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    assert(rep(0) === (("a", 2L, 1L, 1L, 1.0, 0.5, 0.666667)))
    assert(rep(1) === (("b", 2L, 3L, 2L, 0.666667, 1.0, 0.8)))
    val s = graft.ml.ClassifierEval.kappaSummary(df, "label", "pred")
      .as[(Long, Double, Double, Double)].head()
    // po = 3/4, pe = (2*1 + 2*3)/16 = 1/2 -> kappa = 1/2
    assert(s === ((4L, 0.75, 0.733334, 0.5)))
  }

  test("kappaSummary: degenerate single-class data yields NULL kappa, not NaN") {
    // p_e = 1 (one class, perfect prediction) makes kappa 0/0 —
    // NULL-on-undefined like rocAuc/classReport
    val df = Seq(("a", "a"), ("a", "a")).toDF("label", "pred")
    val s = graft.ml.ClassifierEval.kappaSummary(df, "label", "pred")
      .as[(Long, Double, Double, Option[Double])].head()
    assert(s._1 === 2L && s._2 === 1.0)
    assert(s._4.isEmpty)
  }

  test("classReport: prediction-only class keeps NULL recall, not zero") {
    val df = Seq(("a", "b"), ("a", "b")).toDF("label", "pred")
    val rep = graft.ml.ClassifierEval.classReport(df, "label", "pred")
      .orderBy("class")
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect()
    assert(rep(0)._1 === "a" && rep(0)._2 === 2L && rep(0)._3 === 0L)
    assert(rep(0)._5.isEmpty) // precision undefined: no predictions
    assert(rep(1)._1 === "b" && rep(1)._2 === 0L && rep(1)._6.isEmpty)
  }

  test("rankingMetrics: hand-computed graded nDCG, MRR, precision/recall") {
    val ranking = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
      .toDF("query", "doc", "rank")
    val qrels = Seq((1L, 20L, 2), (1L, 99L, 1)) // d20 retrieved, d99 missed
      .toDF("query", "doc", "rel")
    val m = RankEval.rankingMetrics(ranking, qrels, "query", "doc",
        "rank", "rel", k = 3)
      .as[(Long, Long, Integer, Double, Double, Double, Double)].head()
    val ln = math.log _
    val dcg = 3.0 / (ln(3.0) / ln(2.0))              // rel 2 at rank 2
    val idcg = 3.0 / 1.0 + 1.0 / (ln(3.0) / ln(2.0)) // [2, 1] ideal
    assert(m._1 === 1L && m._2 === 2L)
    assert(m._3 === 2) // first relevant at rank 2
    assert(m._4 === 0.5) // rr
    assert(m._5 === math.rint(dcg / idcg * 1e6) / 1e6)
    assert(m._6 === 0.333333) // 1 hit of k=3
    assert(m._7 === 0.5)      // 1 of 2 rels
  }

  test("rankingMetrics keeps zero-metric rows for unretrieved queries; summarize averages") {
    val ranking = Seq((1L, 10L, 1)).toDF("query", "doc", "rank")
    val qrels = Seq((1L, 10L, 1), (2L, 50L, 1)).toDF("query", "doc", "rel")
    val m = RankEval.rankingMetrics(ranking, qrels, "query", "doc",
        "rank", "rel", k = 5)
      .orderBy("query")
      .as[(Long, Long, Integer, Double, Double, Double, Double)].collect()
    assert(m.length === 2)
    assert(m(0)._4 === 1.0 && m(0)._5 === 1.0) // query 1 perfect
    assert(m(1)._3 === null && m(1)._4 === 0.0 && m(1)._5 === 0.0)
    val s = RankEval.summarize(
        RankEval.rankingMetrics(ranking, qrels, "query", "doc", "rank",
          "rel", k = 5))
      .as[(Long, Double, Double, Double, Double)].head()
    assert(s._1 === 2L && s._2 === 0.5 && s._3 === 0.5)
  }
}
