package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.WeatherFunctions
import graft.weather.{Compare, WeatherReport, WeatherSources, WeatherTransform}

/** Inventory entries for the reference's report/compare analytics and the
  * scalar-function variants, each with a DuckDB oracle. Weather-shaped ops
  * run over the reference's minimal fixtures (literal-value oracles);
  * compare-shaped ops run over a per-"city" daily series derived from the
  * events table (city := event_type, value := integer event count, so every
  * double aggregate is an exact integer sum and both engines agree bitwise).
  */
object WeatherQueries {

  /** daily (city, date, value) series from events — the compare pipeline's
    * input shape (web.py:478-507 builds the same thing per city). */
  private def cityDaily(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)
      .groupBy(col("event_type").as("city"), to_date(col("ts")).as("date"))
      .agg(count(lit(1)).cast("double").as("value"))

  private val CityDailySql =
    """SELECT event_type AS city, CAST(ts AS DATE) AS date,
      | CAST(count(*) AS DOUBLE) AS value
      |FROM events GROUP BY 1, 2""".stripMargin

  val all: Seq[(String, Q)] = Seq(

    // ---- F3+F4+F5: the categorizer label variants (English 6-level, 4-level
    //      badge class, 3-level AQI status) over the events value column.
    "q_f_category_variants" -> Q(
      (s, d) => Tables.events(s, d)
        .select(col("event_id"), col("value"),
          WeatherFunctions.pm25Category(col("value"),
            WeatherFunctions.LabelsEn, "Unknown").as("category_en"),
          WeatherFunctions.pm25Badge(col("value")).as("badge"),
          WeatherFunctions.aqiStatus(col("value")).as("aqi_status"))
        .orderBy("event_id"),
      Some("""SELECT event_id, value,
        | CASE WHEN value IS NULL THEN 'Unknown'
        |  WHEN value <= 12 THEN 'Good'
        |  WHEN value <= 35.4 THEN 'Moderate'
        |  WHEN value <= 55.4 THEN 'Unhealthy (sensitive)'
        |  WHEN value <= 150.4 THEN 'Unhealthy'
        |  WHEN value <= 250.4 THEN 'Very Unhealthy'
        |  ELSE 'Hazardous' END AS category_en,
        | CASE WHEN value IS NULL THEN 'neutral'
        |  WHEN value <= 12 THEN 'good'
        |  WHEN value <= 35.4 THEN 'neutral'
        |  WHEN value <= 55.4 THEN 'warn'
        |  ELSE 'bad' END AS badge,
        | CASE WHEN value <= 12 THEN 'Baik'
        |  WHEN value <= 35.4 THEN 'Sedang'
        |  ELSE 'Tidak Sehat' END AS aqi_status
        |FROM events ORDER BY event_id""".stripMargin)),

    // ---- A5+A6+A7+F2+F6: the full report summary over the fixture daily
    //      frame (report.py:69-177), literal oracle from FIXTURES.md golden.
    "q_weather_summary" -> Q(
      (s, _) => WeatherReport.summaryFrame(WeatherTransform.daily(
          WeatherSources.rawFromJson(s, DocQueries.FixtureWeatherJson),
          WeatherSources.rawFromJson(s, DocQueries.FixtureAirJson))),
      Some("""SELECT CAST('2025-01-01' AS DATE) AS period_start,
        | CAST('2025-01-02' AS DATE) AS period_end,
        | CAST(26.5 AS DOUBLE) AS max_temp, CAST(24.0 AS DOUBLE) AS min_temp,
        | CAST(27.5 AS DOUBLE) AS pm25_avg, CAST(2 AS BIGINT) AS rainy_days,
        | CAST('2025-01-02' AS DATE) AS wettest_date,
        | CAST(2.4 AS DOUBLE) AS wettest_rain,
        | 'Sedang' AS pm25_category,
        | 'Kondisi relatif aman. Tetap pantau perubahan cuaca harian.' AS recommendation""".stripMargin)),

    // ---- §2.6 gap resolution: derived daily alert flags over the fixture
    //      daily frame.
    "q_weather_alerts" -> Q(
      (s, _) => WeatherTransform.withAlertFlags(WeatherTransform.daily(
          WeatherSources.rawFromJson(s, DocQueries.FixtureWeatherJson),
          WeatherSources.rawFromJson(s, DocQueries.FixtureAirJson)))
        .select("date", "temp_max", "total_rain", "pm25_avg",
          "is_hot_day", "is_heavy_rain", "is_unhealthy_pm25")
        .orderBy("date"),
      Some("""SELECT CAST('2025-01-01' AS DATE) AS date,
        |  CAST(26.5 AS DOUBLE) AS temp_max, CAST(0.1 AS DOUBLE) AS total_rain,
        |  CAST(15.0 AS DOUBLE) AS pm25_avg,
        |  false AS is_hot_day, false AS is_heavy_rain, false AS is_unhealthy_pm25
        |UNION ALL
        |SELECT CAST('2025-01-02' AS DATE),
        |  CAST(24.0 AS DOUBLE), CAST(2.4 AS DOUBLE), CAST(40.0 AS DOUBLE),
        |  false, false, true
        |ORDER BY date""".stripMargin)),

    // ---- W2+W3 in the compare shape (app.js:851-872): per-city centered
    //      smoothing and min-max normalization of the daily series.
    "q_compare_series" -> Q(
      (s, d) => Compare.minMaxNormalize(
          Compare.smooth(cityDaily(s, d), "value", "smooth3"),
          "value", "norm")
        .orderBy("city", "date"),
      Some(s"""WITH daily AS ($CityDailySql)
        |SELECT city, date, value,
        | avg(value) OVER (PARTITION BY city ORDER BY date
        |   ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS smooth3,
        | (value - min(value) OVER w) /
        |  (CASE WHEN max(value) OVER w - min(value) OVER w = 0 THEN 1.0
        |   ELSE max(value) OVER w - min(value) OVER w END) AS norm
        |FROM daily
        |WINDOW w AS (PARTITION BY city)
        |ORDER BY city, date""".stripMargin)),

    // ---- U1+A9+W4+A10 composed: ranked per-city summary and the
    //      top-vs-second percent difference (the compare endpoint's tail).
    "q_compare_top_diff" -> Q(
      (s, d) => Compare.topPairPctDiff(Compare.rankedSummary(cityDaily(s, d), "value")),
      Some(s"""WITH daily AS ($CityDailySql),
        |g AS (SELECT city, avg(value) AS avg_value, max(value) AS max_value
        |  FROM daily GROUP BY 1),
        |r AS (SELECT city, avg_value,
        |  row_number() OVER (ORDER BY avg_value DESC, city ASC) AS rank,
        |  lead(avg_value) OVER (ORDER BY avg_value DESC, city ASC) AS next_avg
        |  FROM g)
        |SELECT city AS top_city, avg_value AS top_avg, next_avg AS second_avg,
        | (avg_value - next_avg) / abs(next_avg) * 100.0 AS pct_diff
        |FROM r WHERE rank = 1 AND next_avg IS NOT NULL""".stripMargin)),

    // ---- Weather-transform fixture parity (P1/A1-A4 over the reference's
    //      minimal fixtures; literal-value oracles). Moved here from the
    //      DocQueries tail so the whole weather family occupies one suite
    //      position — these two spent r10-r12 at the very end of the
    //      154-gate suite, where the bench kept reading them through ~150
    //      gates of doc-pipeline residue.
    "q_weather_daily" -> Q(
      (s, _) => WeatherTransform.daily(
          WeatherSources.rawFromJson(s, DocQueries.FixtureWeatherJson),
          WeatherSources.rawFromJson(s, DocQueries.FixtureAirJson))
        .orderBy("date"),
      Some("""SELECT CAST('2025-01-01' AS DATE) AS date,
        |  CAST(25.0 AS DOUBLE) AS temp_min, CAST(26.5 AS DOUBLE) AS temp_max,
        |  CAST(0.1 AS DOUBLE) AS total_rain, CAST(15.0 AS DOUBLE) AS pm25_avg,
        |  CAST(27.5 AS DOUBLE) AS pm10_avg, 'Sedang' AS pm25_category,
        |  CAST(NULL AS VARCHAR) AS sunrise, CAST(NULL AS VARCHAR) AS sunset
        |UNION ALL
        |SELECT CAST('2025-01-02' AS DATE),
        |  CAST(24.0 AS DOUBLE), CAST(24.0 AS DOUBLE),
        |  CAST(2.4 AS DOUBLE), CAST(40.0 AS DOUBLE),
        |  CAST(60.0 AS DOUBLE), 'Tidak sehat (sensitif)',
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |ORDER BY date""".stripMargin)),

    // ---- §2.6 optional gap closed at the oracle level: a payload WITH the
    //      daily block emits real sunrise/sunset strings on the daily rows
    //      (the null path is q_weather_daily; the ragged-array guard is
    //      spec'd in WeatherTransformSpec).
    "q_weather_daily_sun" -> Q(
      (s, _) => WeatherTransform.daily(
          WeatherSources.rawFromJson(s, DocQueries.FixtureWeatherSunJson),
          WeatherSources.rawFromJson(s, DocQueries.FixtureAirJson))
        .orderBy("date"),
      Some("""SELECT CAST('2025-01-01' AS DATE) AS date,
        |  CAST(25.0 AS DOUBLE) AS temp_min, CAST(26.5 AS DOUBLE) AS temp_max,
        |  CAST(0.1 AS DOUBLE) AS total_rain, CAST(15.0 AS DOUBLE) AS pm25_avg,
        |  CAST(27.5 AS DOUBLE) AS pm10_avg, 'Sedang' AS pm25_category,
        |  '2025-01-01T05:58' AS sunrise, '2025-01-01T18:05' AS sunset
        |UNION ALL
        |SELECT CAST('2025-01-02' AS DATE),
        |  CAST(24.0 AS DOUBLE), CAST(24.0 AS DOUBLE),
        |  CAST(2.4 AS DOUBLE), CAST(40.0 AS DOUBLE),
        |  CAST(60.0 AS DOUBLE), 'Tidak sehat (sensitif)',
        |  '2025-01-02T05:59', '2025-01-02T18:06'
        |ORDER BY date""".stripMargin)),

    "q_weather_hourly" -> Q(
      (s, _) => WeatherTransform.hourly(
          WeatherSources.rawFromJson(s, DocQueries.FixtureWeatherJson),
          WeatherSources.rawFromJson(s, DocQueries.FixtureAirJson))
        .withColumn("time", col("time").cast("timestamp_ntz"))
        .orderBy("time"),
      Some {
        val rows = Seq(
          ("2025-01-01 00:00:00", "25.0", "0.0", "10.0", "25.0", "2025-01-01"),
          ("2025-01-01 01:00:00", "26.5", "0.1", "20.0", "30.0", "2025-01-01"),
          ("2025-01-02 00:00:00", "24.0", "2.4", "40.0", "60.0", "2025-01-02"))
        rows.map { case (t, temp, rain, pm25, pm10, dt) =>
          s"""SELECT CAST('$t' AS TIMESTAMP) AS time, CAST($temp AS DOUBLE) AS temp,
             | CAST($rain AS DOUBLE) AS rain, CAST(NULL AS DOUBLE) AS rh,
             | CAST(NULL AS DOUBLE) AS wind, CAST(NULL AS DOUBLE) AS feels_like,
             | CAST(NULL AS DOUBLE) AS wcode, CAST(NULL AS DOUBLE) AS dew_point,
             | CAST(NULL AS DOUBLE) AS wind_dir, CAST($pm25 AS DOUBLE) AS pm25,
             | CAST($pm10 AS DOUBLE) AS pm10, CAST('$dt' AS DATE) AS date""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY time")
      }))
}
