package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based primitives for cardinality-heavy work at scale
  * (SURVEY §2.13 "a novel sketch" custom-operator slot; north-star
  * scale list).
  *
  * Both sketches are mergeable one-pass structures from Spark's stat
  * functions; the value added here is the OPERATOR shape: heavy-hitter
  * reporting and bloom-accelerated semi-joins.
  */
object Sketches {

  /** Approximate heavy hitters: estimate counts of the `candidates`
    * values from one count-min pass (ε relative error, δ confidence).
    * For unknown candidates, combine with [[Skew.keySkewReport]] on a
    * sample. Reference adjacency: `category_count`/value counts at a
    * scale where exact groupBy is wasteful. */
  def heavyHitters(df: DataFrame, column: String, candidates: Seq[String],
                   eps: Double = 0.001, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    val sketch = df.stat.countMinSketch(col(column), eps, confidence, seed)
    val spark = df.sparkSession
    import spark.implicits._
    candidates.map(v => (v, sketch.estimateCount(v)))
      .toDF(column, "est_count")
  }

  /** EXACT heavy hitters with a count-min prefilter: one sketch pass
    * over the column, then only rows whose key the sketch estimates at
    * `minCount` or more enter the groupBy shuffle, then the exact
    * count re-checks the survivors. Count-min only OVER-estimates, so
    * the prune has no false negatives and the result equals the plain
    * `GROUP BY ... HAVING count(*) >= minCount` bit-for-bit — but at
    * 100 TB with a long-tailed key domain the shuffle carries only the
    * rows of candidate-heavy keys instead of the whole table.
    * Reference adjacency: `category_count` thresholded reporting
    * (gofast/dataops/inspection.py value-counts family). */
  def heavyHittersExact(df: DataFrame, column: String, minCount: Long,
                        eps: Double = 1e-4, confidence: Double = 0.99,
                        seed: Int = 42): DataFrame = {
    // sketch and probe must hash the SAME representation (see
    // bloomSemiJoin below) — both sides go through a string cast.
    // NULL keys cannot enter the sketch, so they BYPASS the prefilter
    // (always admitted) and the exact count decides — a null-key group
    // is a legal GROUP BY group and dropping it would break the
    // equals-the-plain-plan contract.
    val keyed = df.select(col(column).cast("string").as("_k"))
      .filter(col("_k").isNotNull)
    val sketch = keyed.stat.countMinSketch(col("_k"), eps, confidence, seed)
    val bc = df.sparkSession.sparkContext.broadcast(sketch)
    val maybeHeavy = udf((k: String) =>
      k == null || bc.value.estimateCount(k) >= minCount)
    df.filter(maybeHeavy(col(column).cast("string")))
      .groupBy(col(column))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Misra–Gries candidate generation, per partition (Misra & Gries,
    * "Finding repeated elements", Sci. Comput. Program. 1982): each
    * partition keeps at most `capacity` counters; a key whose
    * partition-local count exceeds n_p/(capacity+1) is guaranteed to
    * survive. By the averaging argument, any key with GLOBAL count
    * ≥ N/(capacity+1) is locally that frequent in at least one
    * partition — so the union of per-partition survivors contains
    * every global heavy hitter at that threshold, in at most
    * #partitions × capacity rows (never key-domain-sized). The
    * decrement-all step amortizes to O(n) per partition: each round
    * retires capacity+1 units of total count. */
  def candidateKeys(df: DataFrame, column: String,
                    capacity: Int = 256): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(column).cast("string").as("_k"))
      .filter(col("_k").isNotNull)
      .as[String]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { k =>
          m.get(k) match {
            case Some(c) => m(k) = c + 1
            case None if m.size < capacity => m(k) = 1L
            case None =>
              val dead = List.newBuilder[String]
              m.keysIterator.foreach { kk =>
                val c = m(kk) - 1
                if (c == 0) dead += kk else m(kk) = c
              }
              dead.result().foreach(m.remove)
          }
        }
        m.keysIterator
      }
      .toDF("_k").distinct()
  }

  /** Fully-approximate heavy hitters — the count-min member of the
    * sketch trio (HLL++ `uniqueStatsApprox`, GK `quantilesApprox`):
    * Misra–Gries candidates per partition (bounded, no key-domain
    * shuffle), then ONE count-min pass estimates each candidate's
    * count; keys estimated at `minCount` or more are reported with
    * their estimate. Count-min only OVER-estimates, so provided
    * `capacity ≥ N/minCount` (the [[candidateKeys]] guarantee) the
    * output keys are a SUPERSET of the exact
    * `GROUP BY ... HAVING count ≥ minCount` keys, and each estimate
    * obeys exact ≤ est ≤ exact + ε·N with probability ≥ confidence —
    * both bounds asserted in RelSpec against [[heavyHittersExact]].
    * Unlike the exact twin, no second pass over the data: at 100 TB
    * the whole answer is two scans and zero wide shuffles.
    * Output: (column, est_count). */
  def heavyHittersApprox(df: DataFrame, column: String, minCount: Long,
                         capacity: Int = 256, eps: Double = 1e-4,
                         confidence: Double = 0.99,
                         seed: Int = 42): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val keyed = df.select(col(column).cast("string").as("_k"))
      .filter(col("_k").isNotNull)
    val sketch = keyed.stat.countMinSketch(col("_k"), eps, confidence, seed)
    val bc = df.sparkSession.sparkContext.broadcast(sketch)
    // sketch/probe hash the same string representation (the
    // heavyHittersExact discipline)
    val est = udf((k: String) => bc.value.estimateCount(k))
    // the candidate pass stringified the key; restore the input type
    // so the output schema matches the exact twin's
    val keyType = df.schema(column).dataType
    candidateKeys(df, column, capacity)
      .select(col("_k").cast(keyType).as(column),
        est(col("_k")).as("est_count"))
      .filter(col("est_count") >= minCount)
  }

  /** Bloom-accelerated semi-join: build a bloom filter over the
    * (deduplicated) build-side keys, pre-filter the probe side with
    * `might_contain` (no false negatives), then run the exact
    * semi-join on the survivors. At 100 TB this sends a few MB of
    * bitset to every executor instead of shuffling the probe side on
    * keys that cannot match.
    *
    * @param expectedKeys sizing for the filter (build-side distinct)
    * @param fpp          false-positive probability (probe overshoot)
    */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                    buildKey: String, expectedKeys: Long,
                    fpp: Double = 0.01): DataFrame = {
    // build and probe must hash the SAME representation: the filter is
    // built over xxhash64(key) longs and probed with the same hash, so
    // the no-false-negative contract holds for ANY key type (building
    // over native strings but probing a long cast silently dropped
    // every string match)
    val bloom = build.select(xxhash64(col(buildKey)).as("_h"))
      .stat.bloomFilter(col("_h"), expectedKeys, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    val prefiltered = probe.filter(mightContain(xxhash64(col(probeKey))))
    Joins.semiJoin(prefiltered, build, probeKey, buildKey)
  }
}
