package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Output-stage operators of a training-data pipeline: pack the
  * curated corpus into token-budgeted shards and fix a deterministic
  * global training order.
  */
object Shards {

  /** Assign every document to a token-budgeted output shard:
    * `shard = ⌊ exclusive-prefix-sum(tokens) / shardTokens ⌋` over the
    * corpus in (orderCol asc) order — documents stay contiguous, each
    * shard carries ≈ shardTokens tokens (a document never splits; the
    * doc that crosses a boundary belongs to the shard its FIRST token
    * falls in, the [[Chunk.chunkBySentences]] rule).
    *
    * The naive formulation is ONE global window cumsum — a single-task
    * sort at 100 TB. This is the distributed two-level prefix sum
    * instead: `bucketExpr` (caller-chosen, MONOTONE in orderCol — e.g.
    * `floor(doc_id / 1e6)` for dense ids, a date column for
    * time-ordered corpora) splits the corpus into buckets; per-bucket
    * token totals aggregate map-side into a BOUNDED bucket table, the
    * exclusive bucket offsets are one window over THAT table, and each
    * row adds its within-bucket cumsum (window keyed by bucket) to its
    * bucket's offset. Identical result to the global window —
    * exclusive_prefix(row) = bucket_offset + within_prefix(row) — with
    * every shuffle keyed by bucket.
    *
    * All arithmetic is exact BIGINT, so an external engine replaying
    * the single-window form lands on identical shard ids. Output: the
    * input plus `shard` (0-based). */
  def packShards(df: DataFrame, idCol: String, tokenCol: String,
                 shardTokens: Long, bucketExpr: Column): DataFrame = {
    require(shardTokens > 0, "shardTokens must be positive")
    // a NULL bucket key must fail LOUDLY: the offsets equi-join below
    // never matches null == null, so a null-bucketed document would
    // silently VANISH from the output — and even a null-safe join
    // couldn't save it, since Spark and external engines order nulls
    // differently and the bucket-offset window would diverge
    val spark = df.sparkSession
    import org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull
    import org.apache.spark.sql.GraftColumnBridge
    val withB = df.withColumn("_bk",
      GraftColumnBridge.toColumn(AssertNotNull(
        GraftColumnBridge.toExpr(spark, bucketExpr.cast("long")))))
    val offsets = withB.groupBy("_bk")
      .agg(sum(col(tokenCol).cast("long")).as("_bt"))
      .withColumn("_off",
        coalesce(sum(col("_bt")).over(
          Window.orderBy("_bk")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_bt")
    val w = Window.partitionBy("_bk").orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(offsets, Seq("_bk"))
      .withColumn("_cum",
        col("_off") + sum(col(tokenCol).cast("long")).over(w))
      // `div`, not `/`: Spark's `/` is double division, and exact
      // BIGINT arithmetic end-to-end is what lets the single-window
      // oracle replay shard ids bit-for-bit at any corpus size
      .withColumn("shard",
        expr(s"(_cum - CAST(`$tokenCol` AS BIGINT)) div ${shardTokens}L"))
      .drop("_bk", "_off", "_cum")
  }

  /** Deterministic seeded global shuffle — the final "randomize
    * training order" step: order = md5(seed ‖ id), a pure function of
    * row identity (stable under repartitioning, reproducible across
    * runs and engines — the [[graft.rel.Sampling]] portable-draw
    * convention). Returns the input plus `shuffle_key`; writing it out
    * sorted by (shuffle_key, id) IS the shuffled corpus, and Spark's
    * range-partitioned sort keeps that a distributed operation.
    * Ties are impossible in practice (128-bit hash) and broken by id
    * for determinism anyway. */
  def shuffleOrder(df: DataFrame, idCol: String, seed: Long): DataFrame =
    df.withColumn("shuffle_key",
      md5(concat_ws("-", lit(seed), col(idCol).cast("string"))))
}
