package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Ordered-window operators (SURVEY §2.5).
  *
  * Every function REQUIRES partition columns — an unpartitioned ordered
  * window is a single-task global sort, the classic 100 TB OOM (SURVEY
  * §7.4). The reference operates on single in-memory series and never
  * faced this; here the partition key (entity id, series id) is part of
  * the operator contract.
  */
object Windows {

  private def ordered(partitionCols: Seq[String], orderCols: Seq[Column]): WindowSpec = {
    require(partitionCols.nonEmpty, "ordered windows need a partition key at scale")
    Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
  }

  /** k lag columns `<value>_lag{1..k}`.
    * Reference: `create_lag_features` (gofast/utils/ts_utils.py:4088),
    * `LagFeatureGenerator` (gofast/transformers/ts.py:667). */
  def lagFeatures(df: DataFrame, valueCol: String, lags: Seq[Int],
                  partitionCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = ordered(partitionCols, orderCols)
    lags.foldLeft(df)((d, k) =>
      d.withColumn(s"${valueCol}_lag$k", lag(col(valueCol), k).over(w)))
  }

  /** Trailing moving average over the last `window` rows, computed as an
    * exact decimal sum / count so the result is identical under any
    * window-aggregation algorithm (Spark's running frame vs DuckDB's
    * segment tree would disagree in low double bits otherwise).
    * Reference: `moving_average` (gofast/utils/spatial_utils.py:4065),
    * `MovingAverageTransformer` (gofast/transformers/ts.py:453). */
  def movingAverage(df: DataFrame, valueCol: String, window: Int,
                    partitionCols: Seq[String], orderCols: Seq[Column],
                    outName: String): DataFrame = {
    val w = ordered(partitionCols, orderCols).rowsBetween(-(window - 1), 0)
    df.withColumn(outName,
      sum(col(valueCol).cast("decimal(18,6)")).over(w).cast("double") /
        count(col(valueCol)).over(w))
  }

  /** Running (cumulative) sum, exact decimal.
    * Reference: `CumulativeSumTransformer` (gofast/transformers/ts.py:265),
    * `cumulative_ops` (gofast/stats/utils.py:236). */
  def cumulativeSum(df: DataFrame, valueCol: String, partitionCols: Seq[String],
                    orderCols: Seq[Column], outName: String): DataFrame = {
    val w = ordered(partitionCols, orderCols)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outName,
      sum(col(valueCol).cast("decimal(24,6)")).over(w).cast("double"))
  }

  /** Order-d differencing: x − lag(x, d).
    * Reference: `DifferencingTransformer` (gofast/transformers/ts.py:543),
    * `transform_stationarity` (ts_utils.py:3262). */
  def difference(df: DataFrame, valueCol: String, d: Int,
                 partitionCols: Seq[String], orderCols: Seq[Column],
                 outName: String): DataFrame = {
    val w = ordered(partitionCols, orderCols)
    df.withColumn(outName, col(valueCol) - lag(col(valueCol), d).over(w))
  }

  /** rank / dense_rank / percent_rank within a partition.
    * Reference: `rank_data` (gofast/utils/mathext.py:2967). */
  def rankData(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[Column])
      : DataFrame = {
    val w = ordered(partitionCols, orderCols)
    df.withColumn("rank", rank().over(w))
      .withColumn("dense_rank", dense_rank().over(w))
      .withColumn("percent_rank", percent_rank().over(w))
  }

  /** Centered convolution Σ wᵢ·x_{t+i−c}: the Savitzky–Golay /
    * smoothing kernel as a fixed expression tree over lag/lead —
    * codegen'd, no shuffle beyond the window's.
    * Reference: `savgol_filter` (gofast/utils/spatial_utils.py:3937),
    * `smooth1d` (base_utils.py:5221). Rows whose window is incomplete
    * (series edges) yield null, like mode='interp' trimming. */
  def convolve(df: DataFrame, valueCol: String, weights: Seq[Double],
               partitionCols: Seq[String], orderCols: Seq[Column],
               outName: String): DataFrame = {
    require(weights.size % 2 == 1, "need an odd, centered kernel")
    val half = weights.size / 2
    val w = ordered(partitionCols, orderCols)
    val terms = weights.zipWithIndex.map { case (wt, i) =>
      val off = i - half
      val x = if (off < 0) lag(col(valueCol), -off).over(w)
              else if (off > 0) lead(col(valueCol), off).over(w)
              else col(valueCol)
      lit(wt) * x
    }
    df.withColumn(outName, terms.reduce(_ + _))
  }

  /** Trailing rolling sample std over `window` rows, from exact decimal
    * frame sums (deterministic under any window algorithm).
    * Reference: rolling std in `ts_engineering` (ts_utils.py:2482). */
  def rollingStd(df: DataFrame, valueCol: String, window: Int,
                 partitionCols: Seq[String], orderCols: Seq[Column],
                 outName: String): DataFrame = {
    val w = ordered(partitionCols, orderCols).rowsBetween(-(window - 1), 0)
    val c = col(valueCol)
    val n = count(c).over(w).cast("double")
    val s = sum(c.cast("decimal(12,3)")).over(w).cast("double")
    // 3-dp value quantization keeps the squared frame sums inside the
    // 2^53 cast-exact range: the statistic is then bit-exact across
    // engines with NO final rounding (semantics: std of 3-dp values).
    val q = sum((c.cast("decimal(12,3)") * c.cast("decimal(12,3)")).cast("decimal(26,6)"))
      .over(w).cast("double")
    df.withColumn(outName,
      when(n > 1, sqrt((q - s * s / n) / (n - 1))).otherwise(lit(null)))
  }

  /** Average rank (pandas `rank(method='average')`): rank + (ties−1)/2,
    * via the count-over-identical-keys trick — no extra shuffle beyond
    * the window's. */
  def averageRank(df: DataFrame, partitionCols: Seq[String], valueCol: String,
                  outName: String = "avg_rank"): DataFrame = {
    val w = ordered(partitionCols, Seq(col(valueCol)))
    val tieW = Window.partitionBy((partitionCols :+ valueCol).map(col): _*)
    df.withColumn(outName,
      rank().over(w).cast("double") +
        (count(lit(1)).over(tieW).cast("double") - 1.0) / 2.0)
  }
}
