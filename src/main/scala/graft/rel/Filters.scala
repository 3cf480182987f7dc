package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-filtering operators.
  *
  * Re-expresses the reference's eager filter surface as lazy Catalyst
  * predicates so pushdown/pruning happen for free: a `filter` over a
  * parquet scan lands in `PushedFilters` and never materializes the
  * rows it drops — the reference (pandas) always materializes first.
  */
object Filters {

  /** Single-predicate filter `column <op> value`.
    * Reference: `filter_df` (gofast/utils/data_utils.py:1187) with
    * op ∈ {==, !=, >, <, >=, <=}. Unknown op throws (the reference
    * raises ValueError).
    */
  def filterDf(df: DataFrame, column: String, op: String, value: Any): DataFrame = {
    val c = col(column)
    val pred = op match {
      case "==" => c === lit(value)
      case "!=" => c =!= lit(value)
      case ">"  => c > lit(value)
      case "<"  => c < lit(value)
      case ">=" => c >= lit(value)
      case "<=" => c <= lit(value)
      case other => throw new IllegalArgumentException(s"unsupported op: $other")
    }
    df.filter(pred)
  }

  /** String-predicate filter — the lazy `Data.filter(condition=...)` path
    * (gofast/dataops/core.py:143, executes `df.query`). Spark's `expr`
    * parses the same comparison/boolean surface.
    */
  def filterExpr(df: DataFrame, condition: String): DataFrame =
    df.filter(expr(condition))

  /** Membership filter + extra per-column conditions + optional sort.
    * Reference: `group_and_filter` (gofast/dataops/transformation.py:548).
    */
  def groupAndFilter(df: DataFrame, column: String, groups: Seq[Any],
                     conditions: Seq[Column] = Nil,
                     sortBy: Seq[Column] = Nil): DataFrame = {
    val base = df.filter(col(column).isin(groups: _*))
    val conditioned = conditions.foldLeft(base)(_ filter _)
    if (sortBy.nonEmpty) conditioned.orderBy(sortBy: _*) else conditioned
  }

  /** Remove rows whose `column` matches any of `labels`.
    * Reference: `pop_labels_in` (gofast/utils/data_utils.py:2926). */
  def popLabels(df: DataFrame, column: String, labels: Seq[Any]): DataFrame =
    df.filter(!col(column).isin(labels: _*))

  /** Overwrite `targets` columns with `fill` on rows where `refCol`
    * matches `refValue`. Reference: `mask_by_reference`
    * (gofast/utils/data_utils.py:6283), exact-match branch.
    */
  def maskByReference(df: DataFrame, refCol: String, refValue: Any,
                      targets: Seq[String], fill: Any): DataFrame = {
    val cond = col(refCol) === lit(refValue)
    targets.foldLeft(df) { (d, t) =>
      d.withColumn(t, when(cond, lit(fill)).otherwise(col(t)))
    }
  }

  /** Datetime-granularity membership filter.
    * Reference: `filter_by_period` (gofast/utils/ts_utils.py:52) —
    * keep rows whose ts truncated to `granularity`
    * (year|quarter|month|week|day|hour) is in `periods` (as strings of
    * the truncated timestamp's date/hour). Implemented as
    * `date_trunc(g, ts) IN (...)`, a codegen'd predicate that pushes
    * into the scan for partition-pruned layouts at scale.
    */
  def filterByPeriod(df: DataFrame, tsCol: String, granularity: String,
                     periods: Seq[String]): DataFrame =
    df.filter(date_trunc(granularity, col(tsCol)).cast("string").isin(periods: _*))

  /** Column projection by explicit names and/or a regex.
    * Reference: `select_features` (gofast/utils/base_utils.py:2782). */
  def selectFeatures(df: DataFrame, names: Seq[String] = Nil,
                     regex: Option[String] = None): DataFrame = {
    val byRegex = regex.toSeq.flatMap(r => df.columns.filter(_.matches(r)))
    val cols = (names ++ byRegex).distinct
    df.select(cols.map(col): _*)
  }

  /** 2-D box filter — the spatial position/zone filters
    * (`filter_position` gofast/utils/spatial_utils.py:1813,
    * `extract_zones_from` :2036) generalized to any two numeric axes.
    * Pure range predicates: push down to the scan and partition-prune
    * on spatially-partitioned layouts. */
  def boxFilter(df: DataFrame, xCol: String, yCol: String,
                xRange: (Double, Double), yRange: (Double, Double)): DataFrame =
    df.filter(col(xCol).between(xRange._1, xRange._2) &&
      col(yCol).between(yRange._1, yRange._2))

  /** Custom-callable predicate filter — the reference's `operator`
    * escape hatch (`filter_df(operator=callable)`,
    * gofast/utils/data_utils.py:1220). A Scala closure becomes a UDF;
    * prefer [[filterExpr]] (codegen'd) whenever the predicate is
    * expressible. */
  def filterDfFn(df: DataFrame, column: String, pred: Double => Boolean): DataFrame = {
    val u = udf(pred)
    df.filter(u(col(column).cast("double")))
  }

  /** Z-score / IQR noise filter on one numeric column.
    * Reference: `filter_data` (gofast/utils/data_utils.py:2075). The
    * bounds come from one aggregate pass (sufficient statistics), the
    * filter from a second streaming pass — no driver-side loop, scales
    * linearly.
    */
  def filterOutliersZ(df: DataFrame, column: String, z: Double = 3.0): DataFrame = {
    val r = df.agg(avg(col(column)).as("mu"), stddev_samp(col(column)).as("sd")).head()
    // empty / single-row input: stddev_samp is null — nothing can be
    // an outlier, return the input instead of an NPE on getDouble
    if (r.isNullAt(0) || r.isNullAt(1)) df
    else {
      val (mu, sd) = (r.getDouble(0), r.getDouble(1))
      df.filter(col(column).between(mu - z * sd, mu + z * sd))
    }
  }
}
