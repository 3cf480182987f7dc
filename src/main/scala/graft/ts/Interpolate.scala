package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap interpolation over ordered series (SURVEY §2.5).
  *
  * Reference: `interpolate_grid`/`interpolate_data`
  * (gofast/utils/base_utils.py:1287, :1392), `fill_NaN('interpolate')`.
  *
  * Linear interpolation = carry the last known (value, position) forward
  * and the next known backward with two frame-bounded windows, then
  * lerp — two window passes, no per-group collection, unbounded series.
  */
object Interpolate {

  /** Linear interpolation of nulls in `valueCol` over row position
    * within `partitionCols` (ordered by `orderCols`). Edge nulls (no
    * neighbor on one side) fall back to the available side (pandas
    * `interpolate(limit_direction='both')`). */
  def linear(df: DataFrame, valueCol: String, partitionCols: Seq[String],
             orderCols: Seq[Column], outName: String): DataFrame = {
    require(partitionCols.nonEmpty, "interpolation needs a partition key at scale")
    val part = Window.partitionBy(partitionCols.map(col): _*)
    val wOrd = part.orderBy(orderCols: _*)
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = wOrd.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val pos = row_number().over(wOrd).cast("double")
    val known = when(v.isNotNull, struct(pos.as("p"), v.as("v")))
    val prev = last(known, ignoreNulls = true).over(wPrev)
    val next = first(known, ignoreNulls = true).over(wNext)
    df.withColumn("_pos", pos)
      .withColumn("_prev", prev).withColumn("_next", next)
      .withColumn(outName,
        when(v.isNotNull, v)
          .when(col("_prev").isNull, col("_next.v"))
          .when(col("_next").isNull, col("_prev.v"))
          .otherwise(col("_prev.v") +
            (col("_next.v") - col("_prev.v")) *
              (col("_pos") - col("_prev.p")) / (col("_next.p") - col("_prev.p"))))
      .drop("_pos", "_prev", "_next")
  }
}
