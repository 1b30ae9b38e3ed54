package graft.weather

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{Config, GraftSession}
import graft.sources.{GeocodeSource, Ingest}

/** The reference's CLI surface (cli.py:20-109: fetch | transform | report |
  * all), network-free: `fetch` stages sample payloads into the raw zone with
  * the snapshot+latest dual-write; `transform` materializes the processed
  * zone (parquet primary, CSV compat); `report` renders the summary HTML.
  *
  * `serveDaily` is the web layer's cache-or-compute read path (T1,
  * web.py:344-363): serve the materialized processed zone if present, else
  * run the pipeline first; `refresh=true` always re-runs.
  */
object WeatherCli {

  private val TsFmt = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss")

  /** S4 — resolve a city against a geocode dimension, fail-soft: the
    * reference's fetch.run geocodes first (fetch.py:88 → utils.py:329-345);
    * offline the dim is the built-in city table (or a caller-supplied stub,
    * the test_fetch.py:21-38 pattern). None → caller falls back to the slug
    * identity, keeping the pipeline runnable for unknown cities. */
  def resolve(spark: SparkSession, city: String,
              dim: Option[org.apache.spark.sql.DataFrame] = None): Option[GeocodeSource.Geo] =
    GeocodeSource.firstMatch(
      dim.getOrElse(GeocodeSource.builtinDim(spark)), city)

  /** fetch --offline parity (fetch.py:85-139): read `<slug>_{weather,air}
    * .json` from the samples dir (falling back to the embedded minimal
    * fixtures so the pipeline always has data) through the S3 retry/backoff
    * ingest interface, then snapshot+latest write into the raw zone.
    * Returns (weatherLatest, airLatest). */
  def fetch(cfg: Config, sampleDir: Option[String] = None): (String, String) = {
    val slug = WeatherSources.slug(cfg.city)
    val sdir = sampleDir.getOrElse(cfg.samplesDir)
    def payload(kind: String, fallback: String): String =
      Ingest.retry() { _ =>
        val p = Paths.get(sdir, s"${slug}_$kind.json")
        if (Files.exists(p)) Files.readString(p) else fallback
      }
    val ts = LocalDateTime.now().format(TsFmt)
    val (_, wLatest) = WeatherSources.writeRawSnapshot(cfg.rawDir, slug, "weather",
      payload("weather", graft.queries.DocQueries.FixtureWeatherJson), ts)
    val (_, aLatest) = WeatherSources.writeRawSnapshot(cfg.rawDir, slug, "air",
      payload("air", graft.queries.DocQueries.FixtureAirJson), ts)
    (wLatest, aLatest)
  }

  /** transform parity (transform.py:51-117,120-195): raw latest -> daily and
    * hourly tables, written as parquet (primary) and CSV (compat). Returns
    * the daily frame. */
  def transform(spark: SparkSession, cfg: Config): DataFrame = {
    val slug = WeatherSources.slug(cfg.city)
    val rawW = WeatherSources.readRaw(spark, s"${cfg.rawDir}/${slug}_weather.json")
    val rawA = WeatherSources.readRaw(spark, s"${cfg.rawDir}/${slug}_air.json")
    val daily = WeatherTransform.withAlertFlags(WeatherTransform.daily(rawW, rawA))
    val hourly = WeatherTransform.hourly(rawW, rawA)
    WeatherSources.writeProcessed(daily, cfg.processedDir, s"${slug}_daily")
    WeatherSources.writeProcessed(hourly, cfg.processedDir, s"${slug}_hourly")
    WeatherSources.writeCsvCompat(daily, s"${cfg.processedDir}/${slug}_daily_csv")
    WeatherSources.writeCsvCompat(hourly, s"${cfg.processedDir}/${slug}_hourly_csv")
    daily
  }

  /** report parity (report.py:69-177): summary + the three Vega-Lite charts
    * over the processed daily table -> HTML file. Returns the report path. */
  def report(spark: SparkSession, cfg: Config): Option[String] = {
    val slug = WeatherSources.slug(cfg.city)
    val daily = spark.read.parquet(s"${cfg.processedDir}/${slug}_daily.parquet")
    WeatherReport.summary(daily).map { s =>
      val charts = WeatherViz.chartsToHtml(WeatherViz.vegaLiteSpecs(daily))
      Files.createDirectories(Paths.get(cfg.reportsDir))
      val out = Paths.get(cfg.reportsDir, s"$slug.html")
      Files.writeString(out, WeatherReport.renderHtml(cfg.city, s, charts))
      out.toString
    }
  }

  /** T1 — cache-or-compute: the /data/daily read path (web.py:344-353). */
  def serveDaily(spark: SparkSession, cfg: Config, refresh: Boolean = false): DataFrame = {
    val slug = WeatherSources.slug(cfg.city)
    val processed = s"${cfg.processedDir}/${slug}_daily.parquet"
    if (refresh || !Files.exists(Paths.get(processed))) {
      fetch(cfg)
      transform(spark, cfg)
    }
    spark.read.parquet(processed)
  }

  /** T1 — the /data/hourly read path (web.py:356-363): same cache-or-compute
    * contract as [[serveDaily]] over the hourly processed table. */
  def serveHourly(spark: SparkSession, cfg: Config, refresh: Boolean = false): DataFrame = {
    val slug = WeatherSources.slug(cfg.city)
    val processed = s"${cfg.processedDir}/${slug}_hourly.parquet"
    if (refresh || !Files.exists(Paths.get(processed))) {
      fetch(cfg)
      transform(spark, cfg)
    }
    spark.read.parquet(processed)
  }

  /** S12 — JSON records payload {city, count, data} (web.py:376-377). The
    * `collect` here is the serving boundary, not a data-path collect: the
    * frame is one city's daily rows. */
  def recordsJson(df: DataFrame, city: String): String = {
    val rows = df.toJSON.collect()
    s"""{"city": "${city}", "count": ${rows.length}, "data": [${rows.mkString(",")}]}"""
  }

  def main(args: Array[String]): Unit = {
    val cmd = args.headOption.getOrElse("all")
    val cfg = Config.fromEnv()
    lazy val spark = GraftSession.local("graft-cli")
    cmd match {
      case "fetch" =>
        val (w, a) = fetch(cfg)
        println(s"Selesai ambil data. Latest: $w , $a")
      case "transform" =>
        val n = transform(spark, cfg).count()
        println(s"Transform selesai: $n baris daily untuk ${cfg.city}")
      case "report" =>
        println(report(spark, cfg).fold("Tidak ada data untuk laporan")(p => s"Laporan: $p"))
      case "all" =>
        fetch(cfg); transform(spark, cfg)
        println(report(spark, cfg).fold("Tidak ada data untuk laporan")(p => s"Laporan: $p"))
      case other =>
        System.err.println(s"Perintah tidak dikenal: $other (fetch|transform|report|all)")
        sys.exit(1)
    }
  }
}
