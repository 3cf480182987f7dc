package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spatial helpers: haversine distance + nearest-point join.
  *
  * Reference: the lon/lat operator family — `filter_position`
  * (gofast/utils/spatial_utils.py:1813), `extract_zones_from` (:2036),
  * `dual_merge` closest-coordinate merge (:2318), nearest-neighbor
  * lookup (gofast/geo/system.py:499).
  *
  * Scale design: distance is a pure codegen'd column expression; the
  * nearest join is a (optionally banded) join + per-left-row top-1
  * window — the same exact two-phase pattern as [[Joins.nearestJoin]],
  * never a driver-side loop.
  */
object Spatial {

  /** Great-circle distance in km (haversine, Earth diameter 12742 km).
    * Trig outputs are libm-dependent in the last ulp — round the result
    * (e.g. 3 dp ≈ meter precision) before using it as a sort/join key
    * that must be engine-portable. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column)
      : Column = {
    val sdlat = sin(radians((lat2 - lat1) / 2))
    val sdlon = sin(radians((lon2 - lon1) / 2))
    lit(12742.0) * asin(sqrt(
      sdlat * sdlat + cos(radians(lat1)) * cos(radians(lat2)) * sdlon * sdlon))
  }

  /** For each left row, the nearest right row by haversine distance.
    * Deterministic: distance rounded to `roundDp`, ties broken by
    * `rightId` ascending. Cross-join bounded by the caller (filter the
    * left side, or band on a lat bucket for large rights). */
  def nearestByHaversine(left: DataFrame, right: DataFrame,
                         leftId: String, rightId: String,
                         latL: String, lonL: String,
                         latR: String, lonR: String,
                         roundDp: Int = 3): DataFrame = {
    val d = left.crossJoin(right)
      .withColumn("dist_km",
        round(haversineKm(col(latL), col(lonL), col(latR), col(lonR)), roundDp))
    val w = Window.partitionBy(leftId)
      .orderBy(col("dist_km").asc, col(rightId).asc)
    d.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_rn")
  }
}
