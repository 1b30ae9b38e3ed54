package graft.weather

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.WeatherFunctions

/** Report-stage summary aggregates (report.py:69-177) as one distributed
  * aggregation plus a deterministic argmax — the only `collect()` is the
  * single summary row, so the pattern survives any input size.
  */
object WeatherReport {

  case class Summary(
      periodStart: java.sql.Date,
      periodEnd: java.sql.Date,
      maxTemp: Option[Double],
      minTemp: Option[Double],
      pm25Avg: Option[Double],
      wettestDate: Option[java.sql.Date],
      wettestRain: Double,
      rainyDays: Long,
      pm25Category: String,
      recommendation: String)

  /** A5 global aggregates + A6 argmax (first max by date order, matching
    * pandas idxmax tie semantics, report.py:93) + A7 rainy-day count +
    * F2/F6 derived strings — in two jobs over the daily frame. */
  def summaryFrame(daily: DataFrame): DataFrame = {
    val wettest = daily
      .filter(col("total_rain").isNotNull)
      // idxmax = first max in row order; explicit tie-break for determinism
      .orderBy(desc("total_rain"), asc("date"))
      .limit(1)
      .select(col("date").as("wettest_date"), col("total_rain").as("wettest_rain"))
    val agg = daily.agg(
      min("date").as("period_start"),
      max("date").as("period_end"),
      max("temp_max").as("max_temp"),
      min("temp_min").as("min_temp"),
      avg("pm25_avg").as("pm25_avg"),
      sum(when(col("total_rain") > 0, 1).otherwise(0)).as("rainy_days"))
    agg.crossJoin(wettest)
      .withColumn("pm25_category", WeatherFunctions.pm25Category(col("pm25_avg")))
      .withColumn("recommendation", WeatherFunctions.recommendation(
        coalesce(col("max_temp"), lit(0.0)),
        coalesce(col("pm25_avg"), lit(0.0)),
        col("rainy_days")))
  }

  def summary(daily: DataFrame): Option[Summary] = {
    val rows = summaryFrame(daily).collect()
    rows.headOption.map { r: Row =>
      def optD(n: String): Option[Double] =
        if (r.isNullAt(r.fieldIndex(n))) None else Some(r.getAs[Double](n))
      Summary(
        periodStart = r.getAs[java.sql.Date]("period_start"),
        periodEnd = r.getAs[java.sql.Date]("period_end"),
        maxTemp = optD("max_temp"),
        minTemp = optD("min_temp"),
        pm25Avg = optD("pm25_avg"),
        wettestDate = Option(r.getAs[java.sql.Date]("wettest_date")),
        wettestRain = Option(r.getAs[Any]("wettest_rain")).fold(0.0)(_.asInstanceOf[Double]),
        rainyDays = r.getAs[Long]("rainy_days"),
        pm25Category = r.getAs[String]("pm25_category"),
        recommendation = r.getAs[String]("recommendation"))
    }
  }

  /** S11 — HTML render of the summary (the reference's Jinja2 template,
    * report.py:117-176), with the chart section (`{% for c in charts %}`,
    * report.py:119-138) fed by [[WeatherViz]] Vega-Lite fragments.
    * Driver-side string templating over one collected row + |days|-bounded
    * chart data; not a relational op. */
  def renderHtml(city: String, s: Summary, chartsHtml: Seq[String] = Nil): String = {
    // vega runtime rides once in the head, same CDN trio altair's to_html
    // embeds; the specs themselves are inline and self-contained
    val head = if (chartsHtml.isEmpty) "" else
      """|<script src="https://cdn.jsdelivr.net/npm/vega@5"></script>
         |<script src="https://cdn.jsdelivr.net/npm/vega-lite@5"></script>
         |<script src="https://cdn.jsdelivr.net/npm/vega-embed@6"></script>""".stripMargin
    val charts = if (chartsHtml.isEmpty) "" else
      s"\n<h2>Grafik</h2>\n${chartsHtml.mkString("\n")}"
    s"""<!doctype html><html><head><meta charset="utf-8">
       |<title>Laporan Cuaca — $city</title>$head</head><body>
       |<h1>Laporan Cuaca &amp; Kualitas Udara: $city</h1>
       |<p>Periode: ${s.periodStart} — ${s.periodEnd}</p>
       |<ul>
       |<li>Suhu maks: ${s.maxTemp.fold("-")(v => f"$v%.1f")} °C</li>
       |<li>Suhu min: ${s.minTemp.fold("-")(v => f"$v%.1f")} °C</li>
       |<li>Rata-rata PM2.5: ${s.pm25Avg.fold("-")(v => f"$v%.1f")} µg/m³ (${s.pm25Category})</li>
       |<li>Hari terbasah: ${s.wettestDate.getOrElse("-")} (${f"${s.wettestRain}%.1f"} mm)</li>
       |<li>Jumlah hari hujan: ${s.rainyDays}</li>
       |</ul>$charts
       |<p><strong>Rekomendasi:</strong> ${s.recommendation}</p>
       |</body></html>""".stripMargin
  }
}
