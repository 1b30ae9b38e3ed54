package graft.weather

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.WeatherFunctions
import graft.operators.Windows

/** S11 viz layer — Vega-Lite chart specs over the daily frame, mirroring the
  * reference's three Altair charts (viz.py:22-209: `chart_temp`, `chart_rain`,
  * `chart_pm25`) and their embedding in the HTML report (report.py:110-138).
  *
  * Split of labor: the derived series (temp_avg, 7-day trailing rain MA with
  * pandas `rolling(7)` null-head semantics, AQI status category) are computed
  * DISTRIBUTED as Column expressions / window functions over the daily frame;
  * only the final |days|-bounded rows are collected into the spec's inline
  * `data.values` — the same driver-side templating boundary as the summary
  * row. Altair emits Vega-Lite JSON under the hood, so emitting the spec
  * directly is the engine-native equivalent of `alt.Chart(...).to_html()`.
  */
object WeatherViz {

  /** Chart colors and thresholds from viz.py (behavioral spec constants). */
  private val TempAreaColor = "#3182bd"
  private val TempMaxColor = "#ff7f0e"
  private val TempMinColor = "#1f77b4"
  private val RainDomain = Seq(0, 5, 20, 50, 100)
  private val RainRange = Seq("#c6dbef", "#9ecae1", "#6baed6", "#3182bd", "#08519c")
  private val AqiDomain = Seq("Baik", "Sedang", "Tidak Sehat")
  private val AqiRange = Seq("#2ca02c", "#ffbb78", "#d62728")
  /** AQI background bands (viz.py:141-146). */
  private val AqiBands = Seq(
    ("Baik", 0.0, 12.0), ("Sedang", 12.0, 35.4), ("Tidak Sehat", 35.4, 100.0))

  /** The chart input series, derived distributed over the daily frame:
    * temp_avg = (min+max)/2 (viz.py:27), rain_ma7 = pandas rolling(7).mean()
    * with null head (viz.py:77), aqi_status with the viz thresholds and the
    * "Tidak ada data" null label (viz.py:126-136). */
  def chartFrame(daily: DataFrame): DataFrame =
    Windows.trailingAvg(
        daily.select(
          col("date"), col("temp_min"), col("temp_max"), col("total_rain"),
          col("pm25_avg"),
          ((col("temp_min") + col("temp_max")) / 2).as("temp_avg"),
          when(col("pm25_avg").isNull, "Tidak ada data")
            .otherwise(WeatherFunctions.aqiStatus(col("pm25_avg"))).as("aqi_status")),
        "date", "total_rain", n = 7, outCol = "rain_ma7")
      .orderBy("date")

  /** All three specs in viz.py order: temp, rain, pm25. The collect is the
    * report boundary — |days| rows by construction. */
  def vegaLiteSpecs(daily: DataFrame): Seq[String] = {
    val rows = chartFrame(daily).collect()
    Seq(chartTemp(rows), chartRain(rows), chartPm25(rows))
  }

  // ---------------------------- JSON helpers -------------------------------

  private def jq(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jnum(v: Any): String = v match {
    case null => "null"
    // bare NaN/Infinity tokens are invalid JSON and would break the whole
    // inline spec at vegaEmbed parse time — encode as null like Altair does
    case d: Double if d.isNaN || d.isInfinite => "null"
    case f: Float if f.isNaN || f.isInfinite => "null"
    // Locale.ROOT: the f-interpolator uses the JVM default locale, and a
    // comma-decimal locale (id_ID) would emit "12,0" — an invalid JSON token
    case d: Double =>
      if (d == d.floor) String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))
      else d.toString
    case x => x.toString
  }

  private def dataValues(rows: Array[Row], fields: Seq[String]): String =
    rows.map { r =>
      fields.map { f =>
        val v = r.get(r.fieldIndex(f))
        val enc = v match {
          case null => "null"
          case s: String => jq(s)
          case d: java.sql.Date => jq(d.toString)
          case t: java.sql.Timestamp => jq(t.toLocalDateTime.toLocalDate.toString)
          case other => jnum(other)
        }
        s"${jq(f)}: $enc"
      }.mkString("{", ", ", "}")
    }.mkString("[", ", ", "]")

  private def xDate: String =
    s"""{"field": "date", "type": "temporal", "title": "Tanggal", "axis": {"labelAngle": -45, "grid": true}}"""

  private def tip(field: String, typ: String, title: String, fmt: Option[String]): String =
    s"""{"field": ${jq(field)}, "type": ${jq(typ)}, "title": ${jq(title)}${fmt.fold("")(f => s""", "format": ${jq(f)}""")}}"""

  private def spec(title: String, dataJson: String, layers: Seq[String]): String =
    s"""{"$$schema": "https://vega.github.io/schema/vega-lite/v5.json",
       |"title": {"text": ${jq(title)}, "fontSize": 16, "anchor": "middle"},
       |"width": "container", "height": 300,
       |"data": {"values": $dataJson},
       |"layer": [${layers.mkString(",\n")}],
       |"config": {"axis": {"labelFontSize": 12, "titleFontSize": 14, "grid": true}, "view": {"strokeWidth": 0}}}""".stripMargin

  // ---------------------------- the three charts ---------------------------

  /** viz.py:24-73 — min/max band area + min/max lines + points. */
  def chartTemp(rows: Array[Row]): String = {
    val data = dataValues(rows, Seq("date", "temp_min", "temp_max", "temp_avg"))
    val tooltips = Seq(
      tip("date", "temporal", "Tanggal", Some("%Y-%m-%d")),
      tip("temp_min", "quantitative", "Suhu Min (°C)", Some(".1f")),
      tip("temp_max", "quantitative", "Suhu Max (°C)", Some(".1f")),
      tip("temp_avg", "quantitative", "Suhu Rata-rata (°C)", Some(".1f"))).mkString("[", ", ", "]")
    val area =
      s"""{"mark": {"type": "area", "opacity": 0.3, "color": ${jq(TempAreaColor)}},
         |"encoding": {"x": $xDate,
         | "y": {"field": "temp_min", "type": "quantitative", "title": "Suhu (°C)", "scale": {"zero": false}},
         | "y2": {"field": "temp_max"},
         | "tooltip": $tooltips}}""".stripMargin
    def line(field: String, color: String) =
      s"""{"mark": {"type": "line", "strokeWidth": 2},
         |"encoding": {"x": $xDate,
         | "y": {"field": ${jq(field)}, "type": "quantitative", "title": "Suhu (°C)"},
         | "color": {"value": ${jq(color)}}}}""".stripMargin
    def pts(field: String, color: String) =
      s"""{"mark": {"type": "circle", "size": 50},
         |"encoding": {"x": $xDate,
         | "y": {"field": ${jq(field)}, "type": "quantitative"},
         | "color": {"value": ${jq(color)}}}}""".stripMargin
    spec("Suhu Harian (Minimum & Maksimum)", data,
      Seq(area, line("temp_max", TempMaxColor), line("temp_min", TempMinColor),
        pts("temp_max", TempMaxColor), pts("temp_min", TempMinColor)))
  }

  /** viz.py:76-121 — intensity-scaled bars + dashed 7-day MA line. */
  def chartRain(rows: Array[Row]): String = {
    val data = dataValues(rows, Seq("date", "total_rain", "rain_ma7"))
    val barTips = Seq(
      tip("date", "temporal", "Tanggal", Some("%Y-%m-%d")),
      tip("total_rain", "quantitative", "Curah Hujan", Some(".1f")),
      tip("rain_ma7", "quantitative", "Rata-rata 7 Hari", Some(".1f"))).mkString("[", ", ", "]")
    val bars =
      s"""{"mark": {"type": "bar"},
         |"encoding": {"x": $xDate,
         | "y": {"field": "total_rain", "type": "quantitative", "title": "Curah Hujan (mm)"},
         | "color": {"field": "total_rain", "type": "quantitative",
         |  "scale": {"domain": ${RainDomain.mkString("[", ", ", "]")}, "range": ${RainRange.map(jq).mkString("[", ", ", "]")}},
         |  "legend": {"title": "Intensitas Hujan (mm)"}},
         | "tooltip": $barTips}}""".stripMargin
    val maLine =
      s"""{"mark": {"type": "line", "color": "red", "strokeWidth": 2, "strokeDash": [4, 4]},
         |"encoding": {"x": $xDate,
         | "y": {"field": "rain_ma7", "type": "quantitative"},
         | "tooltip": [${tip("rain_ma7", "quantitative", "Rata-rata 7 Hari", Some(".1f"))}]}}""".stripMargin
    spec("Total Curah Hujan Harian", data, Seq(bars, maLine))
  }

  /** viz.py:124-209 — AQI background bands + category-colored line/points. */
  def chartPm25(rows: Array[Row]): String = {
    val data = dataValues(rows, Seq("date", "pm25_avg", "aqi_status"))
    val bandValues = AqiBands.map { case (level, start, end) =>
      s"""{"level": ${jq(level)}, "start": ${jnum(start)}, "end": ${jnum(end)}}"""
    }.mkString("[", ", ", "]")
    val aqiScale =
      s""""scale": {"domain": ${AqiDomain.map(jq).mkString("[", ", ", "]")}, "range": ${AqiRange.map(jq).mkString("[", ", ", "]")}}"""
    val bands =
      s"""{"data": {"values": $bandValues},
         |"mark": {"type": "rect", "opacity": 0.2},
         |"encoding": {"y": {"field": "start", "type": "quantitative", "title": "PM2.5 (µg/m³)"},
         | "y2": {"field": "end"},
         | "color": {"field": "level", "type": "nominal", $aqiScale,
         |  "legend": {"title": "Kategori Kualitas Udara"}}}}""".stripMargin
    val line =
      s"""{"mark": {"type": "line", "strokeWidth": 2},
         |"encoding": {"x": $xDate,
         | "y": {"field": "pm25_avg", "type": "quantitative", "title": "PM2.5 (µg/m³)", "scale": {"zero": true}},
         | "color": {"field": "aqi_status", "type": "nominal", $aqiScale, "legend": null}}}""".stripMargin
    val tooltips = Seq(
      tip("date", "temporal", "Tanggal", Some("%Y-%m-%d")),
      tip("pm25_avg", "quantitative", "PM2.5", Some(".1f")),
      tip("aqi_status", "nominal", "Status Kualitas Udara", None)).mkString("[", ", ", "]")
    val points =
      s"""{"mark": {"type": "circle", "size": 60},
         |"encoding": {"x": $xDate,
         | "y": {"field": "pm25_avg", "type": "quantitative"},
         | "color": {"field": "aqi_status", "type": "nominal", $aqiScale, "legend": null},
         | "tooltip": $tooltips}}""".stripMargin
    spec("Rata-rata PM2.5 Harian dan Kategori Kualitas Udara", data,
      Seq(bands, line, points))
  }

  /** Embeddable HTML fragments, one per chart — the engine-native analog of
    * `charts_to_html` (viz.py:216-218): an inline spec plus a vega-embed
    * call; the runtime script tags ride once in the report head. */
  def chartsToHtml(specs: Seq[String]): Seq[String] =
    specs.zipWithIndex.map { case (s, i) =>
      s"""<div id="chart_${i + 1}"></div>
         |<script>vegaEmbed("#chart_${i + 1}", $s);</script>""".stripMargin
    }
}
