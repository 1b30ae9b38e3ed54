package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4/S5 — the geocoding source as an offline city dimension table.
  *
  * The reference resolves city → (lat, lon, timezone) through a geocoding
  * API: first-match for ingest (utils.py:329-345, raising on no result) and
  * top-k(5) search for the UI (web.py:123-151, failing SOFT to `[]` on any
  * error). Network is out of scope here, so the same contract runs over a
  * dimension DataFrame — the 100 TB-native shape anyway: a broadcastable dim
  * joined or probed instead of a per-row service call.
  */
object GeocodeSource {

  case class Geo(name: String, lat: Double, lon: Double, timezone: String)

  /** Built-in offline dimension: a handful of Indonesian cities (public
    * geographic coordinates), enough for the CLI to resolve without network
    * — the analog of the reference's bundled sample payloads. */
  def builtinDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("Jakarta", -6.2088, 106.8456, "Asia/Jakarta"),
      ("Bandung", -6.9175, 107.6191, "Asia/Jakarta"),
      ("Surabaya", -7.2575, 112.7521, "Asia/Jakarta"),
      ("Medan", 3.5952, 98.6722, "Asia/Jakarta"),
      ("Semarang", -6.9667, 110.4167, "Asia/Jakarta"),
      ("Yogyakarta", -7.7956, 110.3695, "Asia/Jakarta"),
      ("Makassar", -5.1477, 119.4327, "Asia/Makassar"),
      ("Denpasar", -8.6500, 115.2167, "Asia/Makassar"))
      .toDF("name", "lat", "lon", "tz")
  }

  /** Deterministic synthetic dimension derived from the nation table — the
    * gate-testable stand-in (same arithmetic mirrors into oracle SQL). */
  def fromNations(nation: DataFrame): DataFrame =
    nation.select(
      col("n_name").as("name"),
      (lit(-8.0) + col("n_nationkey") * 0.7).as("lat"),
      (lit(95.0) + col("n_nationkey") * 1.3).as("lon"),
      lit("Asia/Jakarta").as("tz"))

  /** S5 — top-k prefix search, exact name first then alphabetical; fail-soft:
    * a blank query (or any evaluation error at the serving boundary) yields
    * zero rows rather than an error, per web.py:133-136. */
  def searchTopK(dim: DataFrame, query: String, k: Int = 5): DataFrame = {
    val q = query.trim.toLowerCase
    if (q.isEmpty) dim.limit(0)
    else dim
      .filter(lower(col("name")).startsWith(q))
      .withColumn("exactness", when(lower(col("name")) === q, 0).otherwise(1))
      .orderBy(col("exactness"), col("name"))
      .limit(k)
      .drop("exactness")
  }

  /** S4 — first-match geocode. The reference raises on no result
    * (utils.py:337); the engine-side contract is Option so callers choose
    * fail-soft (CLI slug fallback) or fail-hard. The collect is the serving
    * boundary: at most one row. */
  def firstMatch(dim: DataFrame, city: String): Option[Geo] =
    searchTopK(dim, city, k = 1).collect().headOption.map { r =>
      Geo(r.getAs[String]("name"), r.getAs[Double]("lat"),
        r.getAs[Double]("lon"), r.getAs[String]("tz"))
    }
}
