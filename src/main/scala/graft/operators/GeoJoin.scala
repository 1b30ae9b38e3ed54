package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geo nearest-neighbor join: each point matched to its k closest stations
  * by great-circle distance — the "nearest weather station / sensor /
  * warehouse to each record" lookup that ties a large fact table to a small
  * geo dimension (the reference resolves city -> coordinates through its
  * geocoding step, geo.py; this is the set-scale generalization).
  *
  * Scale shape: the station dimension is broadcast (it is a dimension —
  * thousands of rows at most), distances are computed scan-side, and the
  * per-point top-k is a map-side-combining groupBy whose state is bounded
  * by |stations| per point — each point's candidate rows are generated
  * together by the broadcast join, so partial aggregation completes
  * locally and the one shuffle carries a single aggregated row per point.
  * No |points x stations| shuffle, no window over a fat partition.
  *
  * Reproducibility: distances are rounded to 6 decimals of km (mm
  * precision) BEFORE ranking, and ranks tie-break on station name — so an
  * ulp-level libm difference between engines cannot flip a near-tie's
  * order. */
object GeoJoin {

  /** Great-circle distance in km (haversine, R = 6371), written in one
    * fixed evaluation order so any engine mirrors it bit-for-bit. */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val sdLat = sin(radians(lat2 - lat1) / 2)
    val sdLon = sin(radians(lon2 - lon1) / 2)
    val h = sdLat * sdLat +
      cos(radians(lat1)) * cos(radians(lat2)) * (sdLon * sdLon)
    lit(2.0) * lit(6371.0) * asin(sqrt(h))
  }

  /** k nearest stations per point. `points` must expose (idCol, lat, lon);
    * `stations` (name, lat, lon). Output: (idCol, rank, station, dist_km),
    * rank 1-based by (rounded distance, station name). */
  def nearestK(points: DataFrame, idCol: String, stations: DataFrame,
               k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val joined = points.crossJoin(broadcast(stations.select(
      col("name").as("__st_name"),
      col("lat").as("__st_lat"), col("lon").as("__st_lon"))))
    joined
      .withColumn("__dist_km", round(haversineKm(col("lat"), col("lon"),
        col("__st_lat"), col("__st_lon")), 6))
      .groupBy(col(idCol))
      .agg(slice(array_sort(collect_list(
        struct(col("__dist_km"), col("__st_name")))), 1, k).as("__top"))
      .select(col(idCol), posexplode(col("__top")))
      .select(col(idCol), (col("pos") + 1).cast("int").as("rank"),
        col("col.__st_name").as("station"),
        col("col.__dist_km").as("dist_km"))
  }
}
