package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Descriptive statistics re-expressed as exact-decimal sufficient
  * statistics + deterministic double arithmetic.
  *
  * Reference: gofast/stats/descriptive.py (`mean` :1580, `var` :780,
  * `std` :923, `quartiles` :1084, `iqr` :1781, `get_range` :2069,
  * `mode` :664, `hmean` :1916, `skew` :251, `kurtosis` :390,
  * `gini_coeffs` :51, `z_scores` :2356, `corr` :177).
  *
  * Why moments instead of the built-ins: `stddev`/`corr`/`skewness`
  * stream doubles, so their low bits depend on partition merge order —
  * fine for analytics, fatal for a bit-exact oracle compare, and a real
  * reproducibility problem across cluster topologies at 100 TB. Fixed-
  * point (2-decimal) inputs have exact decimal power sums; every
  * statistic below is a closed-form double expression over those sums,
  * so any partitioning yields the identical result. One aggregate pass,
  * map-side partials intact.
  */
object Descriptive {

  /** x·100 as an exact long for 2-decimal inputs — keeps per-row moment
    * products in codegen'd integer arithmetic (Spark's decimal multiply
    * boxes to java.math.BigDecimal on EVERY row; long·long is a single
    * JIT instruction). The decimal(38,0) accumulator stays on the
    * compact-long fast path until the running sum exceeds 2⁶³. */
  private[stats] def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Exact de-scaled cross-moment Σa·b via cents products. */
  private[stats] def crossSum(a: Column, b: Column): Column =
    sum((cents(a) * cents(b)).cast("decimal(38,0)")).cast("double") / 10000.0

  /** Exact power sum Σ xᵏ for 2-decimal inputs, de-scaled to value
    * units. k ≤ 2 runs on scaled-long products (codegen'd); k = 3, 4
    * stay decimal — a 4th power of cents overflows int64 for values
    * above ~550. Intermediate casts keep precision ≤ 38 on both Spark
    * and DuckDB. */
  private def powerSum(c: Column, k: Int): Column = k match {
    case 1 => sum(cents(c).cast("decimal(38,0)")).cast("double") / 100.0
    case 2 => crossSum(c, c)
    case 3 => sum((c.cast("decimal(12,2)") * c.cast("decimal(12,2)") * c.cast("decimal(12,2)")).cast("decimal(30,6)")).cast("double")
    case 4 => sum(((c.cast("decimal(9,2)") * c.cast("decimal(9,2)")).cast("decimal(18,4)") *
                   (c.cast("decimal(9,2)") * c.cast("decimal(9,2)")).cast("decimal(18,4)")).cast("decimal(36,8)")).cast("double")
  }

  /** n, mean, sample variance, sample stddev from exact moments. */
  def momentAggs(c: Column): Seq[Column] = {
    val n = count(c).cast("double")
    val sx = powerSum(c, 1)
    val sxx = powerSum(c, 2)
    val mean = sx / n
    val varS = (sxx - sx * sx / n) / (n - 1)
    Seq(count(c).as("n"), mean.as("mean"), varS.as("var_samp"),
        sqrt(varS).as("std_samp"))
  }

  /** Population skewness and excess kurtosis from exact moments
    * (formula written identically in the SQL oracle). */
  def shapeAggs(c: Column): Seq[Column] = {
    val n = count(c).cast("double")
    val s1 = powerSum(c, 1); val s2 = powerSum(c, 2)
    val s3 = powerSum(c, 3); val s4 = powerSum(c, 4)
    val mu = s1 / n
    val m2 = s2 / n - mu * mu
    val m3 = s3 / n - lit(3.0) * mu * (s2 / n) + lit(2.0) * mu * mu * mu
    val m4 = s4 / n - lit(4.0) * mu * (s3 / n) + lit(6.0) * mu * mu * (s2 / n) -
      lit(3.0) * mu * mu * mu * mu
    // s3/s4 exceed the 2^53 range where decimal→double casts are
    // bit-identical across engines (DuckDB's cast double-rounds), so the
    // final O(1) statistics are rounded to 9 dp — noise floor is ~1e-14.
    Seq(round(m3 / (m2 * sqrt(m2)), 9).as("skew"),
        round(m4 / (m2 * m2) - lit(3.0), 9).as("kurt"))
  }

  /** Exact percentiles (sort-based, linear interpolation — pandas/
    * DuckDB `quantile_cont` semantics). Approximate at-scale variant:
    * `percentile_approx`. */
  def quantileAggs(c: Column, qs: Seq[Double]): Seq[Column] =
    qs.map(q => percentile(c, lit(q)).as(s"q${(q * 100).round}"))

  /** Long-form describe: one row per column with n/mean/std/min/max
    * from exact moments — pandas `describe` (descriptive.py:2224) /
    * `df.summary()` with deterministic floats. One aggregate pass for
    * ALL columns. */
  def describeExact(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      val n = count(col(c)).cast("double")
      val sx = powerSum(col(c), 1)
      val sxx = powerSum(col(c), 2)
      Seq(count(col(c)).as(s"${c}__n"),
        (sx / n).as(s"${c}__mean"),
        round(sqrt((sxx - sx * sx / n) / (n - 1)), 9).as(s"${c}__std"),
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    cols.zipWithIndex.map { case (c, i) =>
      (c, r.getLong(5 * i), r.getDouble(5 * i + 1), r.getDouble(5 * i + 2),
        r.getDouble(5 * i + 3), r.getDouble(5 * i + 4))
    }.toDF("column", "n", "mean", "std", "min", "max")
  }

  /** Deterministic mode: most frequent value, smallest value on ties.
    * Reference: `mode` (descriptive.py:664). Two shuffles (value counts,
    * then per-group argmax) — no driver collect. */
  def modeDet(df: DataFrame, groupCols: Seq[String], valueCol: String,
              outName: String = "mode"): DataFrame = {
    val counts = df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("_cnt"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("_cnt").desc, col(valueCol).asc)
    counts.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select((groupCols.map(col) :+ col(valueCol).as(outName)): _*)
  }

  /** Harmonic mean n / Σ(1/x). Double-sum based (no fixed-point form
    * exists); round to `scale` for cross-engine compares. */
  def hmean(c: Column, scale: Int = 6): Column =
    round(count(c).cast("double") / sum(lit(1.0) / c), scale)

  /** Gini coefficient via sorted cumulative formula:
    * G = (2·Σ i·xᵢ) / (n·Σx) − (n+1)/n over ascending xᵢ.
    * Reference: `gini_coeffs` (descriptive.py:51). The rank is a
    * windowed row_number — ties contribute identically regardless of
    * order, so no tiebreaker is needed. Global sort: intended for
    * per-group use at scale (pass groupCols).
    */
  def gini(df: DataFrame, valueCol: String, groupCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(valueCol).asc)
    val ranked = df.withColumn("_i", row_number().over(w).cast("long"))
    val g = if (groupCols.nonEmpty) ranked.groupBy(groupCols.map(col): _*)
            else ranked.groupBy()
    val n = count(lit(1)).cast("double")
    val sx = sum(col(valueCol).cast("decimal(18,2)")).cast("double")
    val six = sum((col("_i").cast("decimal(10,0)") * col(valueCol).cast("decimal(18,2)"))
      .cast("decimal(32,2)")).cast("double")
    g.agg(round(lit(2.0) * six / (n * sx) - (n + lit(1.0)) / n, 9).as("gini"))
  }

  /** Per-row z-scores from exact global moments — one agg pass, then a
    * streaming projection (no second shuffle; moments broadcast via a
    * cross join of the 1-row aggregate).
    * Reference: `z_scores` (descriptive.py:2356). */
  def zscores(df: DataFrame, valueCol: String, outName: String = "z"): DataFrame = {
    val n = count(col(valueCol)).cast("double")
    val sx = powerSum(col(valueCol), 1)
    val sxx = powerSum(col(valueCol), 2)
    // mean/std become TWO rounded driver scalars; the per-row projection
    // is then exact IEEE arithmetic — no per-row rounding, so the
    // round-boundary risk is O(1) per query instead of O(rows).
    val r = df.agg(sx.as("_sx"), sxx.as("_sxx"), n.as("_n")).head()
    val (sxv, sxxv, nv) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mean = r9(sxv / nv)
    val std = r9(math.sqrt((sxxv - sxv * sxv / nv) / (nv - 1)))
    df.withColumn(outName, (col(valueCol) - lit(mean)) / lit(std))
  }

  /** Information value of a categorical feature vs a binary target:
    * IV = Σ_cat (good%−bad%)·ln(good%/bad%), smoothed by +0.5 per cell
    * to keep logs finite. Reference: `calculate_binary_iv`
    * (gofast/utils/mathext.py:3710). Exact count arithmetic + one ln —
    * rounded 6 dp for engine portability. */
  def binaryIV(df: DataFrame, featureCol: String, target: Column): DataFrame = {
    val perCat = df.groupBy(col(featureCol))
      .agg(sum(when(target, 1L).otherwise(0L)).as("_g"),
           sum(when(target, 0L).otherwise(1L)).as("_b"))
    val tot = Window.partitionBy()
    val gPct = (col("_g").cast("double") + 0.5) /
      (sum("_g").over(tot).cast("double") + 0.5)
    val bPct = (col("_b").cast("double") + 0.5) /
      (sum("_b").over(tot).cast("double") + 0.5)
    perCat.withColumn("_term", (gPct - bPct) * log(gPct / bPct))
      .agg(round(sum("_term"), 6).as("iv"))
  }

  /** Pearson correlation from exact decimal cross-moments.
    * Reference: `corr` (descriptive.py:177), `correlation`
    * (relationships.py:32). */
  def corrExact(x: Column, y: Column): Column = {
    val n = count(lit(1)).cast("double")
    val sx = powerSum(x, 1)
    val sy = powerSum(y, 1)
    val sxy = crossSum(x, y)
    val sxx = crossSum(x, x)
    val syy = crossSum(y, y)
    // squared sums can exceed the 2^53 cast-exact range for wide-valued
    // columns, where Spark's and DuckDB's decimal->double casts differ in
    // the last bit -> round the O(1) statistic.
    round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
  }

  /** Sample covariance from exact decimal cross-moments. */
  def covExact(x: Column, y: Column): Column = {
    val n = count(lit(1)).cast("double")
    val sx = powerSum(x, 1)
    val sy = powerSum(y, 1)
    val sxy = crossSum(x, y)
    round((sxy - sx * sy / n) / (n - 1), 9)
  }
}
