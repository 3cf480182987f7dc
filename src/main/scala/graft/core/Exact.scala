package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic numeric helpers for oracle-comparable results.
  *
  * Floating-point aggregation order in Spark depends on partitioning, so a
  * plain `sum(double)` is not bit-reproducible against a single-node oracle.
  * For money/quantity columns (exactly 2 decimal digits) we sum in decimal —
  * exact in any engine, identical `double` after the final cast. For
  * genuinely real-valued statistics (stddev, corr, ...) we round to a fixed
  * scale well above the accumulated fp error.
  *
  * At 100 TB this matters beyond testing: decimal sums make partial
  * (map-side) aggregation exact and re-runs reproducible across cluster
  * topologies.
  */
object Exact {
  private val Money = DecimalType(18, 2)

  /** Exact sum of a 2-decimal double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast("double")

  /** Exact mean of a 2-decimal double column, returned as double. */
  def davg(c: Column): Column = sum(c.cast(Money)).cast("double") / count(c)

  /** Exact sum of a product of two 2-decimal columns (price * (1-disc)). */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(Money) * b.cast(Money)).cast("double")

  /** Round a statistic to `scale` decimals (fp-noise tolerance vs oracle). */
  def stat(c: Column, scale: Int = 6): Column = round(c, scale)
}
