package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classifier evaluation at corpus scale — the measurement
  * side of the trained quality filter ([[QualityClassifier]]): once a
  * page-quality model scores a crawl, these are the numbers that
  * decide the deployment threshold.
  *
  * Scale shape: every metric reduces to integer sufficient statistics
  * PER DISTINCT SCORE (one groupBy), then a single ordered pass over
  * the score groups. The ordered pass is a window over |distinct
  * scores| rows — bounded for any quantized/rounded model output
  * (round-6 sigmoids give ≤ 10⁶ groups); for genuinely continuous
  * scores pass `bins` to quantize first (binned AUC/PR, the standard
  * large-scale practice), which also bounds the curve output.
  *
  * Determinism: rank sums and TP/FP counts are exact integers (plus
  * exact dyadic halves for tie mid-ranks); only the final divisions
  * cross into doubles, each rounded to 6 dp — the engine-portable
  * contract used across the stats family.
  *
  * Reference north-star: model-evaluation utilities
  * (gofast/metrics.py family); definitions are the textbook ones
  * (AUC = Mann–Whitney U statistic, Hanley & McNeil 1982; AP =
  * area under the precision-recall step curve).
  */
object ClassifierEval {

  private def prepared(df: DataFrame, scoreCol: String, labelCol: String,
                       bins: Option[Int]): DataFrame = {
    val s0 = col(scoreCol).cast("double")
    val s = bins match {
      case Some(b) =>
        require(b >= 2, s"need >= 2 bins, got $b")
        round(s0 * b) / b.toDouble
      case None => s0
    }
    df.select(s.as("s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
      .filter(col("s").isNotNull)
      .groupBy("s")
      .agg(count(lit(1)).as("c"), sum("y").as("p"))
  }

  /** ROC-AUC via the rank statistic (Mann–Whitney U) with average
    * ranks over ties — exact, no curve interpolation:
    * `AUC = (Σ_pos rank_avg − nP(nP+1)/2) / (nP·nN)`.
    * One row: (n_pos, n_neg, auc). Degenerate inputs (single class)
    * return NULL auc rather than a misleading number. */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String,
             bins: Option[Int] = None): DataFrame = {
    val g = prepared(df, scoreCol, labelCol, bins)
    val wAsc = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g.withColumn("_before", coalesce(sum("c").over(wAsc), lit(0L)))
    ranked.agg(
        sum("p").as("_np"), sum("c").as("_n"),
        sum(col("p").cast("double") *
          (col("_before").cast("double") +
            (col("c").cast("double") + lit(1.0)) / lit(2.0))).as("_rs"))
      .select(col("_np").as("n_pos"), (col("_n") - col("_np")).as("n_neg"),
        // single-class input: AUC undefined -> NULL (ANSI division
        // would throw)
        when(col("_np") > 0 && col("_n") > col("_np"),
          round(
            (col("_rs") - col("_np").cast("double") *
              (col("_np").cast("double") + lit(1.0)) / lit(2.0)) /
            (col("_np").cast("double") *
              (col("_n") - col("_np")).cast("double")), 6)).as("auc"))
  }

  /** Precision-recall curve at every distinct score threshold,
    * descending (predict positive when score >= threshold):
    * (threshold, tp, fp, precision, recall). Bounded output when
    * `bins` quantizes. */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String,
              bins: Option[Int] = None): DataFrame = {
    val g = prepared(df, scoreCol, labelCol, bins)
    val wDesc = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val totals = g.agg(sum("p").as("_npos"))
    g.withColumn("tp", sum("p").over(wDesc))
      .withColumn("fp", sum(col("c") - col("p")).over(wDesc))
      .crossJoin(broadcast(totals))
      .select(col("s").as("threshold"), col("tp"), col("fp"),
        round(col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double"), 6).as("precision"),
        when(col("_npos") > 0, round(col("tp").cast("double") /
          col("_npos").cast("double"), 6)).as("recall"))
  }

  /** Average precision (area under the PR step curve, sklearn's AP):
    * `AP = Σ_t ΔTP_t/nP · P_t` over thresholds descending. One row:
    * (n_pos, n_neg, ap). */
  def averagePrecision(df: DataFrame, scoreCol: String, labelCol: String,
                       bins: Option[Int] = None): DataFrame = {
    val g = prepared(df, scoreCol, labelCol, bins)
    val wDesc = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    g.withColumn("tp", sum("p").over(wDesc))
      .withColumn("fp", sum(col("c") - col("p")).over(wDesc))
      .agg(
        max(col("tp")).as("_npos"),
        sum(col("p").cast("double") *
          (col("tp").cast("double") /
            (col("tp") + col("fp")).cast("double"))).as("_apnum"),
        sum(col("c") - col("p")).as("_nneg"))
      .select(col("_npos").as("n_pos"), col("_nneg").as("n_neg"),
        when(col("_npos") > 0,
          round(col("_apnum") / col("_npos").cast("double"), 6)).as("ap"))
  }

  /** Confusion matrix and derived rates at a fixed threshold
    * (positive when score >= threshold). One row. */
  def confusionAtThreshold(df: DataFrame, scoreCol: String,
                           labelCol: String, threshold: Double): DataFrame = {
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("boolean")
    df.filter(s.isNotNull)
      .agg(
        sum(when(s >= threshold && y, 1L).otherwise(0L)).as("tp"),
        sum(when(s >= threshold && !y, 1L).otherwise(0L)).as("fp"),
        sum(when(s < threshold && !y, 1L).otherwise(0L)).as("tn"),
        sum(when(s < threshold && y, 1L).otherwise(0L)).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        round((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("tn") + col("fn")).cast("double"), 6)
          .as("accuracy"),
        round(col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double"), 6).as("precision"),
        round(col("tp").cast("double") /
          (col("tp") + col("fn")).cast("double"), 6).as("recall"),
        round(lit(2.0) * col("tp").cast("double") /
          (lit(2.0) * col("tp") + col("fp") + col("fn")).cast("double"), 6)
          .as("f1"))
  }

  /** Per-class precision/recall/F1 of a multi-class prediction:
    * (class, n_true, n_pred, tp, precision, recall, f1) — one
    * groupBy(label, pred) count table (|classes|² rows) feeds
    * everything; no second pass over the data. Classes appearing
    * only in predictions get n_true 0 and NULL recall (undefined,
    * not zero). */
  def classReport(df: DataFrame, labelCol: String,
                  predCol: String): DataFrame = {
    val cm = df.groupBy(col(labelCol).cast("string").as("_l"),
        col(predCol).cast("string").as("_p"))
      .agg(count(lit(1)).as("_c"))
    val byTrue = cm.groupBy(col("_l").as("class"))
      .agg(sum("_c").as("n_true"))
    val byPred = cm.groupBy(col("_p").as("class"))
      .agg(sum("_c").as("n_pred"))
    val tp = cm.filter(col("_l") === col("_p"))
      .select(col("_l").as("class"), col("_c").as("tp"))
    byTrue.join(byPred, Seq("class"), "full_outer")
      .join(tp, Seq("class"), "left")
      .select(col("class"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .select(col("class"), col("n_true"), col("n_pred"), col("tp"),
        when(col("n_pred") > 0,
          round(col("tp").cast("double") / col("n_pred").cast("double"), 6))
          .as("precision"),
        when(col("n_true") > 0,
          round(col("tp").cast("double") / col("n_true").cast("double"), 6))
          .as("recall"),
        round(lit(2.0) * col("tp").cast("double") /
          (col("n_true") + col("n_pred")).cast("double"), 6).as("f1"))
  }

  /** Multi-class summary: one row (n, accuracy, macro_f1, kappa).
    * Cohen's κ = (p_o − p_e)/(1 − p_e) with chance agreement
    * p_e = Σ_c n_true(c)·n_pred(c)/n² — exact integer products, two
    * round-6 divisions. Macro-F1 averages per-class F1 over classes
    * with n_true > 0. */
  def kappaSummary(df: DataFrame, labelCol: String,
                   predCol: String): DataFrame = {
    val rep = classReport(df, labelCol, predCol)
    rep.agg(
        sum(col("n_true")).as("_n"),
        sum(col("tp")).as("_tp"),
        // product in DECIMAL(38,0): class counts at web scale overflow
        // a long product silently
        sum(col("n_true").cast(org.apache.spark.sql.types.DecimalType(19, 0)) *
          col("n_pred").cast(org.apache.spark.sql.types.DecimalType(19, 0)))
          .as("_pe_num"),
        avg(when(col("n_true") > 0, col("f1"))).as("_mf1"))
      .select(col("_n").as("n"),
        round(col("_tp").cast("double") / col("_n").cast("double"), 6)
          .as("accuracy"),
        round(col("_mf1"), 6).as("macro_f1"), {
          val pe = col("_pe_num").cast("double") /
            (col("_n").cast("double") * col("_n").cast("double"))
          // p_e = 1 (degenerate single-class data) makes kappa 0/0:
          // NULL-on-undefined, the rocAuc/classReport convention —
          // not the NaN a bare division would emit
          when(pe < 1.0, round(
            (col("_tp").cast("double") / col("_n").cast("double") - pe) /
              (lit(1.0) - pe), 6)).as("kappa")
        })
  }

  /** Reliability diagram input: per equal-width score bin, count,
    * mean score, and positive rate — the calibration check a
    * probability-emitting filter needs before thresholding on it.
    * (bin, n, mean_score, pos_rate), bin ∈ [0, nBins). */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"need >= 2 bins, got $nBins")
    val s = col(scoreCol).cast("double")
    df.filter(s.isNotNull)
      .select(least(floor(s * nBins), lit(nBins - 1)).cast("int").as("bin"),
        s.as("s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        // sum in DECIMAL(28,12): the mean is aggregation-order-exact
        // (the Exact.davg discipline), so round-6 is engine-portable
        round((sum(col("s").cast(org.apache.spark.sql.types
            .DecimalType(28, 12))).cast("double") /
          count(lit(1)).cast("double")), 6).as("mean_score"),
        round(sum("y").cast("double") / count(lit(1)).cast("double"), 6)
          .as("pos_rate"))
  }
}
