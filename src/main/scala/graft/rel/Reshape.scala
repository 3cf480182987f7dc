package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pivot / melt / replication reshapes.
  *
  * Reference: `to_wide` (gofast/utils/data_utils.py:4762), `to_long`
  * (:4979), `repeat_feature_accross` (:5197), `to_categories` (:5927).
  */
object Reshape {

  /** Long→wide pivot: one row per `idCols`, one column per distinct
    * `pivotCol` value, cell = `agg` of `valueExpr`.
    *
    * Reference: `to_wide` (data_utils.py:4762), aggfunc='first' default;
    * here any aggregate Column builder. `pivotValues`, when supplied,
    * avoids the extra distinct-values job AND fixes column order —
    * always pass it in production at scale.
    */
  def toWide(df: DataFrame, idCols: Seq[String], pivotCol: String,
             agg: Column, pivotValues: Seq[Any] = Nil): DataFrame = {
    val g = df.groupBy(idCols.map(col): _*)
    val p = if (pivotValues.nonEmpty) g.pivot(pivotCol, pivotValues) else g.pivot(pivotCol)
    p.agg(agg)
  }

  /** Wide→long melt of `valueCols` into (`varName`, `valName`) rows.
    * Reference: `to_long` (data_utils.py:4979). Uses the native unpivot
    * operator (a Generator — no shuffle, no data blow-up beyond the
    * k× row multiplication itself). Null cells are dropped, matching
    * pandas `melt` + `dropna` and making pivot∘unpivot a clean inverse.
    */
  def toLong(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
             varName: String = "variable", valName: String = "value"): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray, varName, valName)
      .filter(col(valName).isNotNull)

  /** Replicate each row across `n` sequence values (e.g. per-year copies).
    * Reference: `repeat_feature_accross` (data_utils.py:5197). `explode`
    * is a Generator — runs inside the same stage, no shuffle.
    */
  def repeatAcross(df: DataFrame, seqName: String, from: Int, to: Int): DataFrame =
    df.withColumn(seqName, explode(sequence(lit(from), lit(to))))

  /** Numeric → categorical label by equal-width bins over [lo, hi).
    * Reference: `to_categories` (data_utils.py:5927), equal_range mode.
    * Pure expression — codegen'd, no shuffle. Values outside the range
    * clamp into the edge bins, as the reference does.
    */
  def toCategories(df: DataFrame, column: String, lo: Double, hi: Double,
                   nBins: Int, labels: Seq[String], outCol: String): DataFrame = {
    require(labels.size == nBins, "one label per bin")
    val width = (hi - lo) / nBins
    val rawBin = floor((col(column) - lit(lo)) / lit(width)).cast("int")
    val bin = least(greatest(rawBin, lit(0)), lit(nBins - 1))
    val labelMap = map(labels.zipWithIndex.flatMap {
      case (l, i) => Seq(lit(i), lit(l))
    }: _*)
    df.withColumn(outCol, labelMap(bin))
  }

  /** Melt quantile-encoded wide columns (`<prefix>_q<level>`, the
    * reference's `pred_q0.5` convention) into long rows
    * (idCols…, q double, <prefix>). The level is parsed from the
    * column NAME — schema work on the driver; the data path is one
    * explode (no shuffle).
    * Reference: `melt_q_data` / `reshape_quantile_data`
    * (gofast/utils/q_utils.py:229, :32). */
  def meltQ(df: DataFrame, idCols: Seq[String], prefix: String): DataFrame = {
    val tag = prefix + "_q"
    // numeric-suffix match, not bare startsWith: a column like
    // `pred_quality` must not slip in and explode the toDouble sort
    val qCols = df.columns
      .filter(c => c.startsWith(tag) &&
        scala.util.Try(c.stripPrefix(tag).toDouble).isSuccess)
      .sortBy(_.stripPrefix(tag).toDouble)
    require(qCols.nonEmpty, s"no columns named $tag<level>")
    val structs = qCols.map { c =>
      struct(lit(c.stripPrefix(tag).toDouble).as("q"),
        col(s"`$c`").cast("double").as(prefix))
    }
    df.select(idCols.map(col) :+ explode(array(structs: _*)).as("_s"): _*)
      .select(idCols.map(col) :+ col("_s.q").as("q") :+ col(s"_s.$prefix"): _*)
  }

  /** Inverse of [[meltQ]]: long (idCols…, q, <prefix>) back to wide
    * `<prefix>_q<level>` columns. `levels` fixes the pivot values (no
    * distinct-scan job) and the output column order.
    * Reference: `pivot_q_data` (gofast/utils/q_utils.py:532). */
  def pivotQ(df: DataFrame, idCols: Seq[String], prefix: String,
             levels: Seq[Double]): DataFrame = {
    val wide = df.groupBy(idCols.map(col): _*)
      .pivot("q", levels).agg(first(prefix))
    levels.foldLeft(wide) { (d, q) =>
      val from = q.toString
      d.withColumnRenamed(from, s"${prefix}_q$q")
    }
  }
}
