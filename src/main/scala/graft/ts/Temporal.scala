package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal pipeline operators (SURVEY §2.11): resampling, calendar
  * features, trend, autocorrelation, classical decomposition.
  *
  * Per-series regressions (trend, ACF) are expressed as exact integer/
  * decimal sufficient statistics per group — one shuffle, no driver
  * loops, no per-group model fitting; the closed forms are identical in
  * the SQL oracle.
  */
object Temporal {

  /** Frequency resample: `groupBy(date_trunc(unit, ts)).agg(...)`.
    * Reference: `resample('D')` inside `ts_engineering`
    * (gofast/utils/ts_utils.py:2482). */
  def resample(df: DataFrame, tsCol: String, unit: String,
               aggs: Seq[Column], keyName: String = "period"): DataFrame =
    df.groupBy(date_trunc(unit, col(tsCol)).as(keyName))
      .agg(aggs.head, aggs.tail: _*)

  /** Calendar feature extraction.
    * Reference: `convert_date_features` (gofast/dataops/quality.py:398),
    * `DateFeatureExtractor` (gofast/transformers/ts.py:989).
    * day_of_week is ISO (Mon=1..Sun=7) — documented, since pandas,
    * Spark and DuckDB all default differently. */
  def dateFeatures(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
      .withColumn("day_of_week", dayofweek(col(tsCol))) // 1=Sunday
      .withColumn("iso_dow", weekday(col(tsCol)) + 1)   // 1=Monday
      .withColumn("quarter", quarter(col(tsCol)))
      .withColumn("hour", hour(col(tsCol)))

  /** Cyclical sin/cos encoding of a bounded integer unit.
    * Reference: `DateTimeCyclicalEncoder` (gofast/transformers/ts.py:887).
    * Rounded to 9 dp: libm sin/cos differ in the last ulp across
    * platforms. */
  def cyclicalEncode(df: DataFrame, unitCol: Column, period: Int,
                     prefix: String): DataFrame =
    df.withColumn(s"${prefix}_sin",
        round(sin(unitCol.cast("double") * (2.0 * math.Pi / period)), 6))
      .withColumn(s"${prefix}_cos",
        round(cos(unitCol.cast("double") * (2.0 * math.Pi / period)), 6))

  /** Per-group OLS trend y = a + b·i over the row index i (1..n in
    * `orderCols` order): slope/intercept from exact sums.
    * Reference: `trend_analysis` linear branch
    * (gofast/utils/ts_utils.py:720); detrending (`trend_ops` :1026) is
    * `y - (a + b*i)` with these coefficients.
    *
    * Σi and Σi² are exact longs, Σy and Σiy exact decimals — the double
    * formula is engine-identical (inputs pre-rounded to 6 dp).
    */
  def trendOls(df: DataFrame, valueCol: String, partitionCols: Seq[String],
               orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    val indexed = df.withColumn("_i", row_number().over(w).cast("long"))
    val n = count(lit(1)).cast("double")
    // decimal carriers for the index sums too: sum(i^2) ~ n^3/3 blows
    // past int64 at ~3M rows per group (ANSI throw / silent wrap);
    // for sums that fit, the decimal total is the same exact integer,
    // so the double cast — and the oracle hash — are unchanged
    val si = sum(col("_i").cast("decimal(28,0)")).cast("double")
    val sii = sum((col("_i") * col("_i")).cast("decimal(38,0)")).cast("double")
    val sy = sum(col(valueCol).cast("decimal(18,6)")).cast("double")
    val siy = sum((col("_i").cast("decimal(10,0)") * col(valueCol).cast("decimal(18,6)"))
      .cast("decimal(32,6)")).cast("double")
    val slope = (n * siy - si * sy) / (n * sii - si * si)
    indexed.groupBy(partitionCols.map(col): _*)
      .agg(slope.as("slope"), ((sy - slope * si) / n).as("intercept"),
           count(lit(1)).as("n"))
  }

  /** Autocorrelation at `lags`, per group: Pearson corr of (y, lag_k(y))
    * over the overlapping rows, from exact decimal cross-moments.
    * Reference: `ts_corr_analysis` ACF (gofast/utils/ts_utils.py:2913).
    * Rounded to 9 dp (moment sums can exceed the cast-exact range). */
  def acf(df: DataFrame, valueCol: String, lags: Seq[Int],
          partitionCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    val withLags = lags.foldLeft(df)((d, k) =>
      d.withColumn(s"_lag$k", lag(col(valueCol), k).over(w)))
    def corrOf(k: Int): Column = {
      // 3-dp quantization keeps every moment's unscaled sum within a
      // compact long (fast non-boxed decimal path) and below 2^53, so
      // the double casts are exact at any realistic series length.
      val x = col(valueCol).cast("decimal(12,3)")
      val y = col(s"_lag$k").cast("decimal(12,3)")
      val m = col(s"_lag$k").isNotNull
      val n = sum(when(m, 1L).otherwise(0L)).cast("double")
      val sx = sum(when(m, x)).cast("double")
      val sy = sum(when(m, y)).cast("double")
      val sxy = sum(when(m, (x * y).cast("decimal(28,6)"))).cast("double")
      val sxx = sum(when(m, (x * x).cast("decimal(28,6)"))).cast("double")
      val syy = sum(when(m, (y * y).cast("decimal(28,6)"))).cast("double")
      round((n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
    }
    withLags.groupBy(partitionCols.map(col): _*)
      .agg(corrOf(lags.head).as(s"acf${lags.head}"),
           lags.tail.map(k => corrOf(k).as(s"acf$k")): _*)
  }

  /** Per-row detrending y − (a + b·i) with per-group OLS coefficients
    * computed from window sufficient statistics — trend removal in ONE
    * shuffle, no join back. Reference: `trend_ops(method='remove')`
    * (gofast/utils/ts_utils.py:1026). */
  def detrend(df: DataFrame, valueCol: String, partitionCols: Seq[String],
              orderCols: Seq[Column], outName: String): DataFrame = {
    val wOrd = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    val wAll = Window.partitionBy(partitionCols.map(col): _*)
    val indexed = df.withColumn("_i", row_number().over(wOrd).cast("long"))
    val n = count(lit(1)).over(wAll).cast("double")
    val si = sum(col("_i").cast("decimal(28,0)")).over(wAll).cast("double")
    val sii = sum((col("_i") * col("_i")).cast("decimal(38,0)"))
      .over(wAll).cast("double")
    val sy = sum(col(valueCol).cast("decimal(18,6)")).over(wAll).cast("double")
    val siy = sum((col("_i").cast("decimal(10,0)") * col(valueCol).cast("decimal(18,6)"))
      .cast("decimal(32,6)")).over(wAll).cast("double")
    val slope = (n * siy - si * sy) / (n * sii - si * si)
    val intercept = (sy - slope * si) / n
    indexed.withColumn(outName,
        col(valueCol) - (intercept + slope * col("_i").cast("double")))
      .drop("_i")
  }

  /** Batch sessionization: a new session starts when the gap to the
    * previous event exceeds `gapSeconds`; session_id is the running
    * count of session starts per key (the batch analog of
    * `session_window`, SURVEY §2.12). Two stacked windows over one
    * shuffle on the key. */
  def sessionize(df: DataFrame, tsCol: String, keyCols: Seq[String],
                 gapSeconds: Long, orderTiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol) +: orderTiebreak): _*)
    val isStart = when(
      unix_micros(col(tsCol)) -
        lag(unix_micros(col(tsCol)), 1).over(w) > gapSeconds * 1000000L ||
        lag(col(tsCol), 1).over(w).isNull, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(isStart).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** PACF via Durbin–Levinson from the ACF vector (SURVEY §2.11:
    * `ts_corr_analysis` PACF branch, gofast/utils/ts_utils.py:2913 —
    * "PACF via Durbin-Levinson on driver from ACF vector"). The ACF is
    * distributed ([[acf]]); the recursion is O(groups·m²) driver work
    * on one tiny collected row per group. */
  def pacf(df: DataFrame, valueCol: String, maxLag: Int,
           partitionCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val acfDf = acf(df, valueCol, 1 to maxLag, partitionCols, orderCols)
    val spark = df.sparkSession
    import spark.implicits._
    val rows = acfDf.collect().map { r =>
      val key = (0 until partitionCols.size).map(r.get(_).toString)
      // a constant series yields null ACF — fail loud per group rather
      // than letting unboxToDouble fabricate 0.0 correlations
      require((1 to maxLag).forall(k => !r.isNullAt(r.fieldIndex(s"acf$k"))),
        s"pacf: null ACF for group ${key.mkString(",")} (constant or " +
          "too-short series)")
      val rho = (1 to maxLag).map(k => r.getAs[Double](s"acf$k")).toArray
      // Durbin–Levinson: phi(k,k) is the PACF at lag k.
      val phi = Array.ofDim[Double](maxLag + 1, maxLag + 1)
      phi(1)(1) = rho(0)
      for (k <- 2 to maxLag) {
        val num = rho(k - 1) -
          (1 until k).map(j => phi(k - 1)(j) * rho(k - 1 - j)).sum
        val den = 1.0 -
          (1 until k).map(j => phi(k - 1)(j) * rho(j - 1)).sum
        phi(k)(k) = num / den
        for (j <- 1 until k)
          phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j)
      }
      (key, (1 to maxLag).map(k => phi(k)(k)))
    }
    // one output column PER partition key — collapsing composite keys
    // to the first column merged distinct groups into one ambiguous row
    val spark2 = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      partitionCols.map(c =>
        org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType, true)) ++ Seq(
        org.apache.spark.sql.types.StructField("lag",
          org.apache.spark.sql.types.IntegerType, false),
        org.apache.spark.sql.types.StructField("pacf",
          org.apache.spark.sql.types.DoubleType, false)))
    val outRows = rows.toSeq.flatMap { case (key, ps) =>
      ps.zipWithIndex.map { case (p, i) =>
        // Seq(i + 1, p) would widen the Int to Double (numeric
        // unification) and break the row encoder — keep Any
        org.apache.spark.sql.Row.fromSeq(key ++ Seq[Any](i + 1, p))
      }
    }
    spark2.createDataFrame(
      spark2.sparkContext.parallelize(outRows, 1), schema)
  }

  /** Classical additive decomposition on a regular series:
    * trend = centered (2k+1)-row MA, seasonal = phase mean of (y−trend)
    * minus its grand mean, resid = y − trend − seasonal.
    * Reference: `decompose_ts(method='additive')`
    * (gofast/utils/ts_utils.py:2263). Two window passes + one broadcast
    * join on phase — no per-group collection; series length unbounded.
    */
  def decomposeClassical(df: DataFrame, valueCol: String, period: Int,
                         partitionCols: Seq[String], orderCols: Seq[Column])
      : DataFrame = {
    val half = period / 2
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    val frame = w.rowsBetween(-half, half)
    val withTrend = df
      .withColumn("_i", row_number().over(w))
      .withColumn("trend",
        sum(col(valueCol).cast("decimal(18,6)")).over(frame).cast("double") /
          count(col(valueCol)).over(frame))
      .withColumn("_phase", pmod(col("_i"), lit(period)))
    val phaseKey = partitionCols :+ "_phase"
    val detr = col(valueCol) - col("trend")
    val phaseMeans = withTrend.groupBy(phaseKey.map(col): _*)
      .agg(avg(detr).as("_pmean"))
    val grand = avg(col("_pmean")).over(
      Window.partitionBy(partitionCols.map(col): _*))
    val seasonal = phaseMeans.withColumn("seasonal", col("_pmean") - grand)
      .drop("_pmean")
    withTrend.join(broadcast(seasonal), phaseKey, "left")
      .withColumn("resid", col(valueCol) - col("trend") - col("seasonal"))
      .drop("_i", "_phase")
  }
}
