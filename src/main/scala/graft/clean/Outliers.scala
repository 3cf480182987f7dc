package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outlier policies: clip / remove / winsorize.
  *
  * Reference: `handle_outliers_in` (gofast/dataops/quality.py:615),
  * `handle_outliers`/`remove_outliers` (gofast/utils/base_utils.py:566),
  * `OutlierHandler` (gofast/transformers/feature_engineering.py:78).
  *
  * Bounds come from ONE aggregate/quantile pass (driver holds two
  * doubles), the policy is a codegen'd expression — the two-pass
  * "fitted transformer" shape that scales to any data size.
  */
object Outliers {

  /** Exact quantile bounds [qLo, qHi] for a column (sort-based; use
    * `approxBounds` at scale). */
  def quantileBounds(df: DataFrame, column: String,
                     qLo: Double = 0.01, qHi: Double = 0.99): (Double, Double) = {
    val r = df.agg(percentile(col(column), lit(qLo)),
                   percentile(col(column), lit(qHi))).head()
    (r.getDouble(0), r.getDouble(1))
  }

  /** Approximate quantile bounds via Greenwald-Khanna sketch — the
    * 100 TB path (single pass, mergeable, no sort). */
  def approxBounds(df: DataFrame, column: String, qLo: Double = 0.01,
                   qHi: Double = 0.99, relErr: Double = 1e-4): (Double, Double) = {
    val Array(lo, hi) = df.stat.approxQuantile(column, Array(qLo, qHi), relErr)
    (lo, hi)
  }

  /** Clip to [lo, hi] — `least(greatest(...))`, pure expression.
    * Reference: `handle_outliers_in(method='clip')` (quality.py:615). */
  def clip(df: DataFrame, column: String, lo: Double, hi: Double): DataFrame =
    df.withColumn(column, least(greatest(col(column), lit(lo)), lit(hi)))

  /** Remove rows outside [lo, hi].
    * Reference: `handle_outliers_in(method='remove')`. */
  def remove(df: DataFrame, column: String, lo: Double, hi: Double): DataFrame =
    df.filter(col(column).between(lo, hi))

  /** IQR fences: [q1 - k·IQR, q3 + k·IQR], the reference's default
    * outlier rule (base_utils.py:566, k=1.5). */
  def iqrBounds(df: DataFrame, column: String, k: Double = 1.5): (Double, Double) = {
    val r = df.agg(percentile(col(column), lit(0.25)),
                   percentile(col(column), lit(0.75))).head()
    val (q1, q3) = (r.getDouble(0), r.getDouble(1))
    val iqr = q3 - q1
    (q1 - k * iqr, q3 + k * iqr)
  }

  /** Replace values outside [lo, hi] with null (for downstream fill
    * strategies — `handle_outliers(fill='interpolate')` composes this
    * with [[Missing.ffill]]). */
  def nullify(df: DataFrame, column: String, lo: Double, hi: Double): DataFrame =
    df.withColumn(column,
      when(col(column).between(lo, hi), col(column)).otherwise(lit(null)))
}
