package graft.encode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical encodings and numeric scalings (SURVEY §2.9 encoding +
  * math). Every encoder is fit-then-transform: the "fit" is one
  * aggregate pass producing a small broadcastable table or a handful of
  * driver scalars; the transform is a codegen'd expression.
  */
object Encoders {

  /** Min-max scaling to [0,1] from one exact min/max pass.
    * Reference: `minmax_scaler` (gofast/utils/mathext.py:4566),
    * `scale_data('minmax')` (quality.py:502). */
  def minmaxScale(df: DataFrame, column: String, outName: String): DataFrame = {
    val r = df.agg(min(col(column)), max(col(column))).head()
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    df.withColumn(outName, (col(column) - lit(lo)) / lit(hi - lo))
  }

  /** Robust scaling (x − median)/IQR via exact percentiles.
    * Reference: `standard_scaler` family (mathext.py:4515). */
  def robustScale(df: DataFrame, column: String, outName: String): DataFrame = {
    val r = df.agg(percentile(col(column), lit(0.5)),
                   percentile(col(column), lit(0.25)),
                   percentile(col(column), lit(0.75))).head()
    val (med, q1, q3) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    df.withColumn(outName, (col(column) - lit(med)) / lit(q3 - q1))
  }

  /** One-hot indicator columns for a known category list (pass the
    * domain explicitly at scale — a distinct scan otherwise).
    * Reference: `soft_encoder` (ml/preprocessing.py:1233),
    * `CategoricalEncoder` (feature_engineering.py:4374). */
  def oneHot(df: DataFrame, column: String, categories: Seq[String],
             prefix: String): DataFrame =
    categories.foldLeft(df)((d, c) =>
      d.withColumn(s"${prefix}_$c",
        when(col(column) === c, 1).otherwise(0)))

  /** Frequency encoding: category → its row count.
    * Reference: `CategoryFrequencyEncoder` (feature_engineering.py:5133).
    * The count table is a broadcast join — never a shuffle of the fact
    * side. */
  def frequencyEncode(df: DataFrame, column: String, outName: String): DataFrame = {
    val counts = df.groupBy(col(column)).agg(count(lit(1)).as(outName))
    // LEFT join: an equi-join never matches null keys, so an inner
    // join silently deleted every null-category row from the encoded
    // frame; nulls pass through with a null count instead
    df.join(broadcast(counts), Seq(column), "left")
  }

  /** Deterministic label encoding: alphabetical index of the category.
    * Reference: `encode_target`/label_encode (dataops/preprocessing.py:128).
    * The dictionary is a windowed dense_rank over the DISTINCT frame
    * (tiny), broadcast back — the fact table is never globally sorted. */
  def labelEncode(df: DataFrame, column: String, outName: String): DataFrame = {
    val dict = df.select(col(column)).distinct()
      .withColumn(outName,
        (dense_rank().over(Window.orderBy(col(column))) - 1).cast("int"))
    // LEFT join: see frequencyEncode — null categories must survive
    df.join(broadcast(dict), Seq(column), "left")
  }

  /** Inverse min-max scaling: x·(hi−lo)+lo.
    * Reference: `denormalize(_in)` (gofast/core/array_manager.py:2953,
    * gofast/utils/ext.py:1891). */
  def denormalize(c: Column, lo: Double, hi: Double): Column =
    c * (hi - lo) + lo

  /** Threshold binarization. Reference: `Target.binarize`
    * (dataops/preprocessing.py:265), ML `Binarizer`. */
  def binarize(c: Column, threshold: Double): Column =
    when(c > threshold, 1).otherwise(0)

  /** Dictionary remap via a map literal.
    * Reference: `map_values` (gofast/utils/base_utils.py:78). */
  def mapValues(c: Column, mapping: Map[String, Int]): Column =
    element_at(
      map(mapping.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
      c)

  /** Threshold-chain labeling: first (bound, label) whose bound exceeds
    * the value. Reference: `smart_label_classifier`
    * (gofast/utils/ml/utils.py:902). */
  def thresholdLabel(c: Column, bounds: Seq[(Double, String)],
                     fallback: String): Column =
    bounds.foldRight(lit(fallback): Column) { case ((b, l), acc) =>
      when(c <= b, l).otherwise(acc)
    }
}
