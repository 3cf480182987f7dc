package graft.stats

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Weighted median as a typed Aggregator (usable via `functions.udaf`).
  *
  * Reference: `wmedian` (gofast/stats/descriptive.py:517) — smallest
  * value whose cumulative weight reaches half the total ("lower"
  * weighted median; the reference's sort-by-value cumulative-weight
  * definition).
  *
  * The buffer maps distinct value → summed weight, so memory scales with
  * the value-domain cardinality, not row count (quantities/prices have
  * small domains; for unbounded domains pre-bucket the value first).
  * Weights accumulate in BigDecimal so the half-total threshold compare
  * `2·cw ≥ total` is exact regardless of partition merge order — a
  * double accumulator could flip the answer on symmetric data.
  */
class WeightedMedian extends Aggregator[(Double, Double), Map[Double, BigDecimal], Double] {
  def zero: Map[Double, BigDecimal] = Map.empty

  def reduce(b: Map[Double, BigDecimal], in: (Double, Double)): Map[Double, BigDecimal] = {
    val (v, w) = in
    b.updated(v, b.getOrElse(v, BigDecimal(0)) + BigDecimal(w))
  }

  def merge(a: Map[Double, BigDecimal], b: Map[Double, BigDecimal]): Map[Double, BigDecimal] =
    b.foldLeft(a) { case (m, (v, w)) => m.updated(v, m.getOrElse(v, BigDecimal(0)) + w) }

  def finish(m: Map[Double, BigDecimal]): Double = {
    if (m.isEmpty) return Double.NaN
    val total = m.values.sum
    var cum = BigDecimal(0)
    for ((v, w) <- m.toSeq.sortBy(_._1)) {
      cum += w
      if (cum * 2 >= total) return v
    }
    m.keys.max
  }

  def bufferEncoder: Encoder[Map[Double, BigDecimal]] =
    Encoders.kryo[Map[Double, BigDecimal]]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
