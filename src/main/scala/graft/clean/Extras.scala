package graft.clean

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Remaining cleaning/augmentation operators. */
object Extras {

  /** Fill nulls in a categorical/numeric column with its deterministic
    * mode (most frequent, smallest on ties).
    * Reference: `nan_to_mode` (gofast/utils/base_utils.py:5110). */
  def fillMode(df: DataFrame, column: String): DataFrame = {
    val mode = df.filter(col(column).isNotNull)
      .groupBy(col(column)).agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col(column).asc)
      .limit(1).head().get(0)
    df.na.fill(Map(column -> mode))
  }

  /** Numeric columns with few distincts become categorical (string) —
    * `handle_categorical_features` (gofast/dataops/quality.py:325).
    * One HLL pass decides; the cast is a projection. */
  def numericToCategorical(df: DataFrame, maxDistinct: Int = 10): DataFrame = {
    val numeric = df.schema.fields.filter(f =>
      f.dataType.typeName match {
        case "integer" | "long" | "double" | "float" | "short" => true
        case _ => false
      }).map(_.name)
    if (numeric.isEmpty) return df
    val aggs = numeric.map(c => approx_count_distinct(col(c)).as(c))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val toCast = numeric.zipWithIndex.collect {
      case (c, i) if r.getLong(i) <= maxDistinct => c
    }
    toCast.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("string")))
  }

  /** Otsu threshold of a numeric column from an equal-width histogram:
    * maximizes between-class variance. One groupBy for the histogram,
    * O(bins) driver work. Reference: `get_threshold_from(method='otsu')`
    * (gofast/utils/mathext.py:156). */
  def otsuThreshold(df: DataFrame, column: String, bins: Int = 256): Double = {
    val r = df.agg(min(col(column)), max(col(column))).head()
    require(!r.isNullAt(0) && !r.isNullAt(1),
      s"otsuThreshold: no non-null values in $column")
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    // degenerate histogram (constant column): the Df variant guards
    // hi <= lo the same way
    if (hi <= lo) return lo
    val width = (hi - lo) / bins
    val hist = df.filter(col(column).isNotNull).groupBy(
        least(floor((col(column) - lo) / width).cast("int"), lit(bins - 1)).as("b"))
      .agg(count(lit(1)).as("n"))
      .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
    val counts = Array.tabulate(bins)(i => hist.getOrElse(i, 0L).toDouble)
    val total = counts.sum
    val mids = Array.tabulate(bins)(i => lo + (i + 0.5) * width)
    val globalMean = counts.zip(mids).map { case (n, m) => n * m }.sum / total
    var bestT = 0; var bestVar = -1.0
    var w0 = 0.0; var sum0 = 0.0
    for (t <- 0 until bins - 1) {
      w0 += counts(t); sum0 += counts(t) * mids(t)
      val w1 = total - w0
      if (w0 > 0 && w1 > 0) {
        val m0 = sum0 / w0
        val m1 = (globalMean * total - sum0) / w1
        val between = w0 * w1 * (m0 - m1) * (m0 - m1)
        if (between > bestVar) { bestVar = between; bestT = t }
      }
    }
    lo + (bestT + 1) * width
  }

  /** Distributed Otsu: the full split search as a PLAN — histogram
    * groupBy → cumulative class moments over the (≤`bins`-row) bin
    * table via an ordered window → between-class variance per split →
    * argmax by (variance desc, bin asc) limit 1. Unlike
    * [[otsuThreshold]] nothing is collected; the histogram scan is the
    * only pass over the data. Output: one row
    * (bin, threshold, between_var).
    *
    * Determinism: the class moment Σnᵢ·midᵢ is never accumulated in
    * floating point (accumulation order would be engine-dependent).
    * Since midᵢ = lo + (i+0.5)·w, it factors as lo·Σnᵢ + w·(Σnᵢ·i +
    * Σnᵢ/2) — the window sums are exact BIGINT, and every double is
    * then derived through one fixed expression tree, bit-identical on
    * any engine and any row order. */
  def otsuThresholdDf(df: DataFrame, column: String, bins: Int = 32)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.agg(min(col(column)).as("_lo"), max(col(column)).as("_hi"))
    val width = (col("_hi") - col("_lo")) / lit(bins.toDouble)
    val hist = df.crossJoin(broadcast(b))
      .withColumn("bin",
        when(col("_hi") <= col("_lo"), lit(0L)).otherwise(
          least(floor((col(column) - col("_lo")) / width), lit(bins - 1L))))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min("_lo").as("_lo"), min("_hi").as("_hi"))
    val wCum = Window.orderBy("bin")
    val wAll = Window.partitionBy()
    val cum = hist
      .withColumn("_a0", sum(col("n")).over(wCum))
      .withColumn("_b0", sum(col("n") * col("bin")).over(wCum))
      .withColumn("_at", sum(col("n")).over(wAll))
      .withColumn("_bt", sum(col("n") * col("bin")).over(wAll))
    val wd = (col("_hi") - col("_lo")) / lit(bins.toDouble)
    val a0 = col("_a0").cast("double")
    val at = col("_at").cast("double")
    val s0 = col("_lo") * a0 + wd * (col("_b0").cast("double") + a0 * lit(0.5))
    val st = col("_lo") * at + wd * (col("_bt").cast("double") + at * lit(0.5))
    val w1 = at - a0
    val m0 = s0 / a0
    val m1 = (st - s0) / w1
    val between = a0 * w1 * (m0 - m1) * (m0 - m1)
    cum.filter(col("bin") < (bins - 1) && w1 > lit(0.0))
      .select(col("bin"), (col("_lo") + (col("bin") + 1) * wd).as("threshold"),
        between.as("between_var"))
      .orderBy(col("between_var").desc, col("bin").asc)
      .limit(1)
  }

  /** Model-metric delta with vs without outliers: fit the supplied
    * model factory on both frames, return (rmseAll, rmseFiltered).
    * Reference: `assess_outlier_impact` (gofast/dataops/quality.py:887).
    */
  def outlierImpact(df: DataFrame, column: String,
                    fitEval: DataFrame => Double,
                    qLo: Double = 0.01, qHi: Double = 0.99): (Double, Double) = {
    val r = df.stat.approxQuantile(column, Array(qLo, qHi), 1e-3)
    val filtered = df.filter(col(column).between(r(0), r(1)))
    (fitEval(df), fitEval(filtered))
  }

  /** Row augmentation: append `n` jittered copies of each row
    * (gaussian noise on `noiseCols`, deterministic under Spark's seeded
    * randn). Reference: `augment_data`
    * (gofast/dataops/preprocessing.py:3083). */
  def augmentRows(df: DataFrame, noiseCols: Seq[String], sigma: Double,
                  n: Int = 1, seed: Long = 42L): DataFrame = {
    val copies = (1 to n).map { i =>
      // distinct seed PER COLUMN: one shared seed gives every column
      // the same per-row draw — rank-1, perfectly correlated "noise"
      noiseCols.zipWithIndex.foldLeft(df) { case (d, (c, j)) =>
        d.withColumn(c, col(c) + randn(seed + i * 1000003L + j) * sigma)
      }
    }
    copies.foldLeft(df)(_ unionByName _)
  }
}
