package graft.core

/** Engine configuration with the reference's defaults
  * (/root/reference/src/etl_weather/config.py:4-8: Bandung / 7 / Asia/Jakarta),
  * overridable from environment variables the way the reference reads `.env`.
  */
case class Config(
    city: String = "Bandung",
    days: Int = 7,
    timezone: String = "Asia/Jakarta",
    dataDir: String = "data") {
  require(days >= 1 && days <= 16, "days harus 1-16") // fetch.py:98-99
  def rawDir: String = s"$dataDir/raw"
  def processedDir: String = s"$dataDir/processed"
  def samplesDir: String = s"$dataDir/samples"
  def reportsDir: String = s"$dataDir/reports"
}

object Config {
  /** Environment override chain mirroring pydantic BaseSettings. */
  def fromEnv(env: Map[String, String] = sys.env): Config = Config(
    city = env.getOrElse("GRAFT_CITY", "Bandung"),
    days = env.get("GRAFT_DAYS").map(_.toInt).getOrElse(7),
    timezone = env.getOrElse("GRAFT_TIMEZONE", "Asia/Jakarta"),
    dataDir = env.getOrElse("GRAFT_DATA_DIR", "data"))
}
