package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped-aggregation operators.
  *
  * Re-expresses the reference's eager pandas groupby surface
  * (`gofast/utils/data_utils.py:1379` `group_and_aggregate`,
  * `gofast/dataops/transformation.py:663` `smart_group`) as lazy
  * DataFrame plans. Catalyst/Tungsten provide partial (map-side)
  * aggregation, hash-agg with sort fallback, and AQE shuffle sizing —
  * none of which the reference has — so the scale path is free once the
  * plan is declarative.
  */
object Aggregates {

  /** GROUP BY `by` with named aggregation expressions.
    *
    * Reference: `group_and_aggregate` (gofast/utils/data_utils.py:1379) —
    * `agg_func` dict of col -> [fns]. Here the dict is a list of already
    * aliased Columns, which subsumes the str/dict/callable forms.
    */
  def groupAndAggregate(df: DataFrame, by: Seq[String], aggs: Seq[Column],
                        dropNaKeys: Boolean = false): DataFrame = {
    val base = if (dropNaKeys) df.na.drop(by) else df
    base.groupBy(by.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** GROUP BY + aggregations + HAVING + ORDER BY + optional pre-group fill.
    *
    * Reference: `smart_group` (gofast/dataops/transformation.py:663-842):
    * group_by, aggregations, having (post-agg filter), fill_na, sort_by.
    * The HAVING predicate lands after the aggregate in the logical plan;
    * Catalyst keeps the single shuffle.
    */
  def smartGroup(df: DataFrame, by: Seq[String], aggs: Seq[Column],
                 having: Option[Column] = None,
                 sortBy: Seq[Column] = Nil,
                 fillNa: Map[String, Any] = Map.empty): DataFrame = {
    val filled = if (fillNa.nonEmpty) df.na.fill(fillNa) else df
    val grouped = filled.groupBy(by.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val had = having.map(grouped.filter).getOrElse(grouped)
    if (sortBy.nonEmpty) had.orderBy(sortBy: _*) else had
  }

  /** Per-bin statistic of `y` grouped by equal-width bins of `x`.
    *
    * Reference: `binning_statistic` (gofast/utils/base_utils.py:4659).
    * Bin id is a codegen'd expression, so binning + agg is one shuffle.
    */
  def binningStatistic(df: DataFrame, x: String, y: String,
                       lo: Double, width: Double,
                       stats: Seq[Column => Column] = Seq(avg, c => count(c).cast("double")),
                       statNames: Seq[String] = Seq("mean_y", "count_y")): DataFrame = {
    val bin = floor((col(x) - lit(lo)) / lit(width)).cast("long").as("bin")
    val aggs = stats.zip(statNames).map { case (f, n) => f(col(y)).as(n) }
    df.select(bin, col(y))
      .groupBy("bin").agg(aggs.head, aggs.tail: _*)
  }

  /** Value counts of a categorical column.
    * Reference: `category_count` (gofast/utils/base_utils.py:4731). */
  def categoryCount(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("n"))

  /** Distinct counts + uniqueness ratio per listed column.
    * Reference: `check_unique_values` (gofast/dataops/quality.py:1568).
    * One aggregate pass over the data for all columns (no per-column scan).
    * At scale, pass approx=true for HLL sketches instead of exact distinct.
    */
  def uniqueStats(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    val aggs = cols.flatMap { c =>
      val d = if (approx) approx_count_distinct(col(c)) else count_distinct(col(c))
      Seq(d.as(s"${c}_distinct"))
    } :+ count(lit(1)).as("n_rows")
    df.agg(aggs.head, aggs.tail: _*)
  }
}
