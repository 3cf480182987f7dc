package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis (SURVEY §2.4 survival row).
  *
  * Reference: `kaplan_meier_analysis`
  * (gofast/stats/survival_reliability.py:24).
  */
object Survival {

  /** Kaplan–Meier curve: for each distinct event time t,
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) with dᵢ events and nᵢ at-risk at tᵢ.
    *
    * Per-time d/censor counts are one groupBy; the at-risk counts and
    * the running product are ordered windows over DISTINCT times
    * (bounded by time-domain cardinality). The product is exp(Σ ln) —
    * Spark has no product aggregate — rounded to 9 dp for cross-engine
    * determinism.
    */
  /** Decision-curve analysis: net benefit of treating at score ≥ pt,
    * NB(pt) = TP/N − FP/N · pt/(1−pt), over a threshold grid.
    * Reference: `dca_analysis`
    * (gofast/stats/survival_reliability.py:112). One broadcast
    * cross-join of the tiny grid + one aggregation — exact count
    * arithmetic. */
  def decisionCurve(df: DataFrame, scoreCol: String, labelCol: Column,
                    thresholds: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val grid = broadcast(thresholds.toDF("pt"))
    df.select(col(scoreCol).as("_score"),
        when(labelCol, 1L).otherwise(0L).as("_y"))
      .crossJoin(grid)
      .groupBy("pt")
      .agg(
        (sum(when(col("_score") >= col("pt"), col("_y")).otherwise(0L)).cast("double") /
          count(lit(1))).as("tp_rate"),
        (sum(when(col("_score") >= col("pt"), lit(1L) - col("_y")).otherwise(0L)).cast("double") /
          count(lit(1))).as("fp_rate"))
      .withColumn("net_benefit",
        col("tp_rate") - col("fp_rate") * (col("pt") / (lit(1.0) - col("pt"))))
  }

  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: Column)
      : DataFrame = {
    val perTime = df.groupBy(col(durationCol).as("t"))
      .agg(sum(when(eventCol, 1L).otherwise(0L)).as("d"),
           count(lit(1)).as("c"))
    val wOrd = Window.orderBy("t")
    val cumTo = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    // at-risk at t = subjects with duration >= t = reverse running sum.
    val withRisk = perTime.withColumn("n_risk",
      sum("c").over(Window.orderBy(col("t").desc)
        .rowsBetween(Window.unboundedPreceding, 0)))
    // ln(0) is null in Spark (-inf in DuckDB): once a factor hits zero
    // (d == n_risk) the curve is exactly 0 from then on — flag it
    // explicitly so both engines agree.
    val hitZero = max(when(col("d") === col("n_risk"), 1).otherwise(0)).over(cumTo)
    val sumLn = sum(when(col("d") < col("n_risk"),
      log(lit(1.0) - col("d").cast("double") / col("n_risk")))).over(cumTo)
    withRisk
      .withColumn("surv",
        when(hitZero === 1, 0.0).otherwise(round(exp(coalesce(sumLn, lit(0.0))), 9)))
      .select(col("t"), col("d").as("n_events"), col("n_risk"), col("surv"))
  }
}
