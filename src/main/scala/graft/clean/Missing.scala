package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-data policies — the reference's most developed domain.
  *
  * Reference: `handle_nans` (gofast/utils/data_utils.py:103),
  * `handle_missing_data` (gofast/dataops/quality.py:728), `Missing`
  * (gofast/dataops/core.py:895), `fill_NaN` ffill/bfill
  * (gofast/utils/base_utils.py:1513).
  *
  * Spark note: pandas NaN maps to SQL null here; all fills are
  * expression-level (codegen'd, no shuffle) except the stat fills,
  * which take one aggregate pass first.
  */
object Missing {

  /** Drop rows with nulls in `cols` (all cols when empty), keeping rows
    * with at least `minNonNull` non-null values when given.
    * Reference: `handle_missing_data(method='drop_rows')`. */
  def dropNulls(df: DataFrame, cols: Seq[String] = Nil,
                minNonNull: Option[Int] = None): DataFrame =
    (cols, minNonNull) match {
      case (Nil, None)    => df.na.drop()
      case (cs, None)     => df.na.drop(cs)
      case (Nil, Some(k)) => df.na.drop(k)
      case (cs, Some(k))  => df.na.drop(k, cs)
    }

  /** Constant fill per column. Reference: `handle_nans(fill_value=...)`. */
  def fillConst(df: DataFrame, fills: Map[String, Any]): DataFrame =
    df.na.fill(fills)

  /** Fill numeric columns with their exact-decimal mean (one aggregate
    * pass for all columns). Reference: `handle_missing_data
    * (method='fill_mean')` (quality.py:728). */
  def fillMean(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c =>
      (sum(col(c).cast("decimal(18,2)")).cast("double") / count(col(c))).as(c))
    val means = df.agg(aggs.head, aggs.tail: _*).head()
    // a column that is entirely null has a null mean: leave it as-is
    // (nothing to impute FROM) instead of an NPE on getDouble
    df.na.fill(cols.zipWithIndex.collect {
      case (c, i) if !means.isNullAt(i) => c -> means.getDouble(i)
    }.toMap)
  }

  /** Forward-fill: replace null with the last non-null value within
    * `partitionCols`, ordered by `orderCols`.
    *
    * Reference: `fill_NaN(method='ffill')` (base_utils.py:1513).
    * partitionCols is REQUIRED: an unpartitioned ordered window is a
    * single-task sort at scale (SURVEY §7.4). */
  def ffill(df: DataFrame, valueCol: String, partitionCols: Seq[String],
            orderCols: Seq[Column], outName: String): DataFrame = {
    require(partitionCols.nonEmpty, "ffill needs a partition key at scale")
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outName, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Backward-fill — mirror of [[ffill]]. */
  def bfill(df: DataFrame, valueCol: String, partitionCols: Seq[String],
            orderCols: Seq[Column], outName: String): DataFrame = {
    require(partitionCols.nonEmpty, "bfill needs a partition key at scale")
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.withColumn(outName, first(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Per-column null counts and ratios, one aggregate pass.
    * Reference: `check_missing_data` (quality.py:1127). Output: one row
    * per column (column, n_null, null_ratio). */
  def missingReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
          count(lit(1)).as(s"${c}__n"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    cols.zipWithIndex.map { case (c, i) =>
      val nulls = r.getLong(2 * i); val n = r.getLong(2 * i + 1)
      (c, nulls, nulls.toDouble / n)
    }.toDF("column", "n_null", "null_ratio")
  }

  /** Drop columns whose distinct-value ratio exceeds `threshold`
    * (unique-identifier pruning). Reference:
    * `handle_unique_identifiers` (gofast/dataops/management.py:41).
    * Uses HLL sketches (approx) by default — exact distinct per column
    * would be one shuffle each at scale. */
  def dropHighCardinality(df: DataFrame, threshold: Double = 0.9,
                          approx: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.map { c =>
      val d = if (approx) approx_count_distinct(col(c)) else count_distinct(col(c))
      (d.cast("double") / count(lit(1))).as(c)
    }
    val ratios = df.agg(aggs.head, aggs.tail: _*).head()
    val keep = cols.zipWithIndex.collect {
      case (c, i) if ratios.getDouble(i) <= threshold => c
    }
    df.select(keep.map(col): _*)
  }
}
