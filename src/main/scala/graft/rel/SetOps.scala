package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set operations over frames and column value-sets.
  *
  * Reference: `Frames.concat` (gofast/dataops/core.py:579),
  * `compute_set_operation` (gofast/utils/base_utils.py:4278),
  * `find_intersection` (:4340), `find_unique_elements` (:4379),
  * `generate_comparison` (gofast/utils/data_utils.py:647).
  */
object SetOps {

  /** Vertical concat of n frames, aligning columns by name and allowing
    * missing columns (null-filled) — pandas `concat(axis=0)` semantics.
    * Reference: `Frames.concat` (gofast/dataops/core.py:579). */
  def concatRows(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Distinct union of two columns' value sets.
    * Reference: `compute_set_operation('union')` (base_utils.py:4278). */
  def unionValues(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
                  outName: String = "value"): DataFrame =
    a.select(col(aCol).as(outName)).union(b.select(col(bCol).as(outName))).distinct()

  /** Set intersection of two columns' value sets.
    * Reference: `find_intersection` (base_utils.py:4340). */
  def intersectValues(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
                      outName: String = "value"): DataFrame =
    a.select(col(aCol).as(outName)).intersect(b.select(col(bCol).as(outName)))

  /** Values in `a` not in `b` (set difference).
    * Reference: `find_unique_elements` (base_utils.py:4379). */
  def exceptValues(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
                   outName: String = "value"): DataFrame =
    a.select(col(aCol).as(outName)).except(b.select(col(bCol).as(outName)))

  /** Element-wise arithmetic between two frames aligned on `keys` —
    * `Frames.add` / `MergeableFrames` (gofast/dataops/core.py:593,
    * :766). Output: keys + op(colA, colB) per listed column. */
  def elementWise(a: DataFrame, b: DataFrame, keys: Seq[String],
                  cols: Seq[String],
                  op: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column)
      : DataFrame = {
    val bRenamed = cols.foldLeft(b)((d, c) => d.withColumnRenamed(c, s"${c}__b"))
    val joined = a.join(bRenamed, keys)
    val out = keys.map(col) ++ cols.map(c => op(col(c), col(s"${c}__b")).as(c))
    joined.select(out: _*)
  }

  /** Frame equality as a count of asymmetric rows (0 == equal, multiset
    * semantics): Σ_values |count_a − count_b| ==
    * exceptAll(a,b).count + exceptAll(b,a).count, computed as ONE
    * tagged-union groupBy — one shuffle of a+b and one job, where the
    * two exceptAll jobs each shuffled BOTH inputs (4 input shuffles,
    * 2 actions). Reference: `Frames.compare`
    * (gofast/dataops/core.py:588). */
  def symmetricDiffCount(a: DataFrame, b: DataFrame): Long = {
    require(a.columns.toSeq == b.columns.toSeq,
      s"frames must share a schema: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val cols = a.columns.toSeq.map(col)
    val tagged = a.select(cols :+ lit(1L).as("_ca") :+ lit(0L).as("_cb"): _*)
      .unionByName(
        b.select(cols :+ lit(0L).as("_ca") :+ lit(1L).as("_cb"): _*))
    tagged.groupBy(a.columns.map(col).toSeq: _*)
      .agg(sum("_ca").as("_sa"), sum("_cb").as("_sb"))
      .agg(coalesce(sum(abs(col("_sa") - col("_sb"))), lit(0L)))
      .head().getLong(0)
  }

  /** Row-level dataset diff: one full-outer join on `keys`, each value
    * column surfaced as `<c>_a` / `<c>_b`, and a status column —
    * only_a / only_b / same / diff (null-safe comparisons).
    * Reference: `generate_comparison` (gofast/utils/data_utils.py:647).
    * The single equi-join shuffle is the whole cost; Catalyst picks
    * broadcast vs sort-merge by side size. */
  def compareFrames(a: DataFrame, b: DataFrame, keys: Seq[String],
                    cols: Seq[String]): DataFrame = {
    val aa = a.select(keys.map(col) ++ cols.map(c => col(c).as(s"${c}_a")): _*)
      .withColumn("_in_a", lit(true))
    val bb = b.select(keys.map(col) ++ cols.map(c => col(c).as(s"${c}_b")): _*)
      .withColumn("_in_b", lit(true))
    val allSame = cols.map(c => col(s"${c}_a") <=> col(s"${c}_b"))
      .reduceOption(_ && _).getOrElse(lit(true))
    aa.join(bb, keys, "full_outer")
      .withColumn("status",
        when(col("_in_a").isNull, "only_b")
          .when(col("_in_b").isNull, "only_a")
          .when(allSame, "same")
          .otherwise("diff"))
      .drop("_in_a", "_in_b")
  }
}
