package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling, splits, and top-k.
  *
  * Reference: `random_sampling` (gofast/utils/data_utils.py:3524),
  * `split_train_test_by_id` (gofast/core/array_manager.py:2356),
  * `ts_split` (gofast/utils/ts_utils.py:3577), geo top-k
  * (gofast/geo/system.py:499).
  */
object Sampling {

  /** Fraction sample, optionally with replacement.
    * Reference: `random_sampling`/`resample_data` (data_utils.py:3524,
    * :3187). Per-partition Bernoulli/Poisson — no shuffle. */
  def sample(df: DataFrame, fraction: Double, seed: Long = 42L,
             withReplacement: Boolean = false): DataFrame =
    df.sample(withReplacement, fraction, seed)

  /** Deterministic id-hash split: stable train/test membership under
    * appends, the property `split_train_test_by_id`
    * (gofast/core/array_manager.py:2356, crc32(id) % 100) exists for.
    * `keep` of `outOf` buckets by `id % outOf` — engine-portable (same
    * result in any SQL engine, unlike hash functions).
    */
  def splitByIdMod(df: DataFrame, idCol: String, keep: Int, outOf: Int = 100,
                   invert: Boolean = false): DataFrame = {
    val bucket = pmod(col(idCol), lit(outOf))
    df.filter(if (invert) bucket >= keep else bucket < keep)
  }

  /** Time-ordered split: rows strictly before `cutoff` (train side).
    * Reference: `ts_split` (ts_utils.py:3577). A pure filter —
    * partition-prunes on date-partitioned layouts. */
  def timeSplit(df: DataFrame, tsCol: String, cutoff: String,
                test: Boolean = false): DataFrame =
    if (test) df.filter(col(tsCol) >= lit(cutoff))
    else df.filter(col(tsCol) < lit(cutoff))

  /** Top-k rows per group by `order` (with deterministic tiebreakers in
    * `order`). Reference: `nsmallest(n_neighbors)` per point
    * (gofast/geo/system.py:499).
    *
    * Two exact phases: (1) top-k within (group, input-partition) — the
    * window parallelism is groups × partitions, so a low-cardinality
    * group column (the classic few-groups skew) never serializes onto
    * one task and each task sorts only its slice; (2) top-k per group
    * over the ≤ k·P surviving rows. Any partition's local top-k is a
    * superset of its contribution to the global top-k, so phase 2 is
    * exact regardless of row placement.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                   k: Int, rankName: String = "rk"): DataFrame = {
    val local = Window
      .partitionBy((groupCols.map(col) :+ spark_partition_id()): _*)
      .orderBy(order: _*)
    val survivors = df
      .withColumn("_lrk", row_number().over(local))
      .filter(col("_lrk") <= k).drop("_lrk")
    val global = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    survivors.withColumn(rankName, row_number().over(global))
      .filter(col(rankName) <= k)
  }

  /** Stratified sample: per-stratum fractions without replacement.
    * Reference: `stratify_categories`/`groupwise_train_test_split`
    * (gofast/utils/ml/utils.py:610, :43). */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[Any, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Split into `n` disjoint batches (random, seed-deterministic) —
    * `batch_sampling` (data_utils.py:5677) without replacement. */
  def batches(df: DataFrame, n: Int, seed: Long = 42L): Array[DataFrame] =
    df.randomSplit(Array.fill(n)(1.0), seed)

  /** Bootstrap-duplicate every row n times.
    * Reference: `replace_data` (data_utils.py:4642). explode of a
    * repeated array — stays in-stage, no union chain. */
  def replicateRows(df: DataFrame, n: Int): DataFrame =
    df.withColumn("_rep", explode(array_repeat(lit(1), n))).drop("_rep")

  /** Deterministic bootstrap CI of the mean (reference: `bootstrap`,
    * gofast/stats/inferential.py:1713; `uniform_sampling`, probs.py:504).
    *
    * `b` resamples of size n with replacement, where draw i of
    * replicate r picks row ((r·n + i)·2654435761 mod 1000003) mod n —
    * a Knuth multiplicative hash instead of RNG state, so the draw set
    * is identical on every engine and cluster size. Requires `idCol`
    * DENSE in [0, n) (the driver's synthetic keys are). Products stay
    * < 2⁶³ for b·n up to ~3.5e9 draws.
    *
    * Plan: b×n draw rows (a crossJoin of the table's id column with
    * `range(b)`) → broadcast-join the value column → one groupBy(b) of
    * exact-decimal sums → exact percentiles over the b means. The only
    * driver value is n. Output: one row (ci_lo, ci_med, ci_hi). */
  def bootstrapMeanCi(df: DataFrame, idCol: String, valueCol: String,
                      b: Int, ps: Seq[Double] = Seq(0.025, 0.5, 0.975))
      : DataFrame = {
    val spark = df.sparkSession
    val n = df.count()
    val reps = spark.range(b).select(col("id").as("_r"))
    val draws = df.select(col(idCol).cast("long").as("_i")).crossJoin(reps)
      .select(col("_r"),
        ((((col("_r") * n + col("_i")) * lit(2654435761L)) % lit(1000003L))
          % lit(n)).as("_idx"))
    val dim = df.select(col(idCol).cast("long").as("_idx"),
      col(valueCol).cast("decimal(12,2)").as("_v"))
    val means = draws.join(broadcast(dim), "_idx")
      .groupBy("_r")
      .agg((sum("_v").cast("double") / lit(n.toDouble)).as("_mean"))
    val q = means.agg(
      percentile(col("_mean"), array(ps.map(lit): _*)).as("_q"))
    q.select(
      element_at(col("_q"), 1).as("ci_lo"),
      element_at(col("_q"), 2).as("ci_med"),
      element_at(col("_q"), 3).as("ci_hi"))
  }
}
