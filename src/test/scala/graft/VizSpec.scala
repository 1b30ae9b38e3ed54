package graft

import graft.queries.DocQueries
import graft.weather.{WeatherSources, WeatherTransform, WeatherViz}

/** Vega-Lite chart-spec generation over the reference fixtures (FIXTURES.md
  * frame: 2 days), mirroring viz.py:22-209. */
class VizSpec extends SparkSpec {

  private lazy val daily = WeatherTransform.daily(
    WeatherSources.rawFromJson(spark, DocQueries.FixtureWeatherJson),
    WeatherSources.rawFromJson(spark, DocQueries.FixtureAirJson))

  private lazy val specs = WeatherViz.vegaLiteSpecs(daily)

  test("chart frame derives temp_avg, null-headed rain MA, and AQI status") {
    val rows = WeatherViz.chartFrame(daily).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Double]("temp_avg")).toSeq == Seq(25.75, 24.0))
    // pandas rolling(7): first 6 rows null — the fixture has only 2 days
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("rain_ma7"))))
    assert(rows.map(_.getAs[String]("aqi_status")).toSeq ==
      Seq("Sedang", "Tidak Sehat")) // 15.0 -> Sedang, 40.0 -> Tidak Sehat
  }

  test("golden temp chart spec for the fixture frame") {
    val golden =
      """{"$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        |"title": {"text": "Suhu Harian (Minimum & Maksimum)", "fontSize": 16, "anchor": "middle"},
        |"width": "container", "height": 300,
        |"data": {"values": [{"date": "2025-01-01", "temp_min": 25.0, "temp_max": 26.5, "temp_avg": 25.75}, {"date": "2025-01-02", "temp_min": 24.0, "temp_max": 24.0, "temp_avg": 24.0}]},""".stripMargin
    assert(specs.head.startsWith(golden), s"got:\n${specs.head.take(600)}")
    // the five layers: band area + max/min lines + max/min points
    assert(specs.head.sliding(8).count(_ == "\"mark\": ") == 5)
    assert(specs.head.contains("\"color\": {\"value\": \"#ff7f0e\"}"))
    assert(specs.head.contains("\"color\": {\"value\": \"#1f77b4\"}"))
    assert(specs.head.contains("\"scale\": {\"zero\": false}"))
  }

  test("rain chart carries the intensity color scale and dashed MA line") {
    val rain = specs(1)
    assert(rain.contains("\"domain\": [0, 5, 20, 50, 100]"))
    assert(rain.contains(
      "\"range\": [\"#c6dbef\", \"#9ecae1\", \"#6baed6\", \"#3182bd\", \"#08519c\"]"))
    assert(rain.contains("\"strokeDash\": [4, 4]"))
    assert(rain.contains("\"rain_ma7\": null")) // null head survives into data
    assert(rain.contains("Total Curah Hujan Harian"))
  }

  test("pm25 chart carries threshold bands and category color scale") {
    val pm = specs(2)
    assert(pm.contains(
      "{\"level\": \"Baik\", \"start\": 0.0, \"end\": 12.0}"))
    assert(pm.contains(
      "{\"level\": \"Sedang\", \"start\": 12.0, \"end\": 35.4}"))
    assert(pm.contains(
      "{\"level\": \"Tidak Sehat\", \"start\": 35.4, \"end\": 100.0}"))
    assert(pm.contains(
      "\"domain\": [\"Baik\", \"Sedang\", \"Tidak Sehat\"]"))
    assert(pm.contains(
      "\"range\": [\"#2ca02c\", \"#ffbb78\", \"#d62728\"]"))
    assert(pm.contains("\"aqi_status\": \"Tidak Sehat\""))
  }

  test("rain MA fills in from day 7 with pandas rolling(7) semantics") {
    val s = spark
    import s.implicits._
    val ten = (1 to 10).map(i =>
      (java.sql.Date.valueOf(f"2025-01-$i%02d"), 20.0, 30.0, i.toDouble, 10.0))
      .toDF("date", "temp_min", "temp_max", "total_rain", "pm25_avg")
    val ma = WeatherViz.chartFrame(ten).select("rain_ma7")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(ma.take(6).forall(_.isEmpty)) // first 6 rows null
    assert(ma(6).contains(4.0))  // mean(1..7)
    assert(ma(9).contains(7.0))  // mean(4..10)
  }

  test("non-finite doubles encode as JSON null, never bare NaN/Infinity tokens") {
    val s = spark
    import s.implicits._
    val bad = Seq(
      (java.sql.Date.valueOf("2025-01-01"), Double.NaN, 30.0, Double.PositiveInfinity, Double.NaN),
      (java.sql.Date.valueOf("2025-01-02"), 20.0, 25.0, 1.5, 12.0))
      .toDF("date", "temp_min", "temp_max", "total_rain", "pm25_avg")
    for (spec <- WeatherViz.vegaLiteSpecs(bad)) {
      assert(!spec.contains("NaN") && !spec.contains("Infinity"),
        s"invalid JSON token in spec:\n${spec.take(400)}")
    }
  }

  test("report html embeds the three charts and the vega runtime") {
    import graft.weather.WeatherReport
    val s = WeatherReport.summary(daily).get
    val html = WeatherReport.renderHtml("TestCity", s,
      WeatherViz.chartsToHtml(specs))
    assert(html.contains("<h2>Grafik</h2>"))
    assert(html.contains("vegaEmbed(\"#chart_1\""))
    assert(html.contains("vegaEmbed(\"#chart_3\""))
    assert(html.contains("vega-embed@6"))
    // specs are valid enough JSON to round-trip the schema marker
    assert(html.contains("vega-lite/v5.json"))
  }
}
