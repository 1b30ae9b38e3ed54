package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar functions from the reference, expressed as pure Column expressions
  * (no UDFs — every one of these stays inside whole-stage codegen and is
  * constant-folded / pushed down by Catalyst).
  */
object WeatherFunctions {

  /** PM2.5 thresholds shared by every categorizer variant in the reference
    * (transform.py:38-48, report.py:52-66, app.js:237-246 — same numbers,
    * different labels/languages). Encoded once, labels parameterized.
    */
  val Pm25Thresholds: Seq[Double] = Seq(12.0, 35.4, 55.4, 150.4, 250.4)

  val LabelsId: Seq[String] = Seq(
    "Baik", "Sedang", "Tidak sehat (sensitif)", "Tidak sehat",
    "Sangat tidak sehat", "Berbahaya")
  val LabelsEn: Seq[String] = Seq(
    "Good", "Moderate", "Unhealthy (sensitive)", "Unhealthy",
    "Very Unhealthy", "Hazardous")

  /** 6-level PM2.5 categorizer (F2/F3): null -> unknown label, else the first
    * threshold bucket the value falls under. transform.py:32-48. */
  def pm25Category(value: Column,
                   labels: Seq[String] = LabelsId,
                   unknown: String = "Tidak diketahui"): Column = {
    val chained = Pm25Thresholds.zip(labels).foldLeft(when(value.isNull, unknown)) {
      case (acc, (thr, label)) => acc.when(value <= thr, label)
    }
    chained.otherwise(labels.last)
  }

  /** 4-level badge class (F4, app.js:301-309). */
  def pm25Badge(value: Column): Column =
    when(value.isNull, "neutral")
      .when(value <= 12.0, "good")
      .when(value <= 35.4, "neutral")
      .when(value <= 55.4, "warn")
      .otherwise("bad")

  /** 3-level AQI chart status (F5, viz.py:126-136 / app.js:602). */
  def aqiStatus(value: Column): Column =
    when(value <= 12.0, "Baik").when(value <= 35.4, "Sedang").otherwise("Tidak Sehat")

  /** WMO weather-code decoder (F7, app.js:169-185). */
  def weatherCodeLabel(code: Column): Column = {
    val c = code.cast("int")
    when(c === 0, "Clear")
      .when(c === 1, "Mostly Clear")
      .when(c === 2, "Partly Cloudy")
      .when(c === 3, "Cloudy")
      .when(c.isin(45, 48), "Fog")
      .when(c.between(51, 57), "Drizzle")
      .when(c.between(61, 67), "Rain")
      .when(c.between(71, 77), "Snow")
      .when(c.between(80, 82), "Showers")
      .when(c.isin(85, 86), "Snow Showers")
      .when(c.isin(95, 96, 99), "Thunderstorms")
      .otherwise("Unknown")
  }

  /** WMO weather-code emoji decoder (F7 variant, app.js:283-299) — the daily
    * cards show this beside the text label; groupings differ from the label
    * map (80-82 shares the rain emoji, 85/86 the snow one, 96/99 collapse
    * into the single thunderstorm glyph). Every glyph except U+26C5 carries
    * the U+FE0F variation selector, exactly as the reference source does;
    * null/unmapped codes get the thermometer fallback. */
  /** Glyphs built from explicit codepoints (not source literals): the U+FE0F
    * variation selector is invisible in an editor, and dropping it would
    * silently change every downstream byte hash. */
  private def em(cps: Int*): String = cps.flatMap(Character.toChars(_)).mkString
  val WeatherEmoji: Map[String, String] = Map(
    "sun"     -> em(0x2600, 0xFE0F),  // ☀️
    "sunCld"  -> em(0x1F324, 0xFE0F), // 🌤️
    "partCld" -> em(0x26C5),          // ⛅  (no selector in the reference)
    "cloud"   -> em(0x2601, 0xFE0F),  // ☁️
    "fog"     -> em(0x1F32B, 0xFE0F), // 🌫️
    "drizzle" -> em(0x1F326, 0xFE0F), // 🌦️
    "rain"    -> em(0x1F327, 0xFE0F), // 🌧️
    "snow"    -> em(0x1F328, 0xFE0F), // 🌨️
    "storm"   -> em(0x26C8, 0xFE0F),  // ⛈️
    "thermo"  -> em(0x1F321, 0xFE0F)) // 🌡️
  def weatherCodeEmoji(code: Column): Column = {
    val c = code.cast("int")
    when(c === 0, WeatherEmoji("sun"))
      .when(c === 1, WeatherEmoji("sunCld"))
      .when(c === 2, WeatherEmoji("partCld"))
      .when(c === 3, WeatherEmoji("cloud"))
      .when(c.isin(45, 48), WeatherEmoji("fog"))
      .when(c.between(51, 57), WeatherEmoji("drizzle"))
      .when(c.between(61, 67), WeatherEmoji("rain"))
      .when(c.between(71, 77), WeatherEmoji("snow"))
      .when(c.between(80, 82), WeatherEmoji("rain"))
      .when(c.isin(85, 86), WeatherEmoji("snow"))
      .when(c.isin(95, 96, 99), WeatherEmoji("storm"))
      .otherwise(WeatherEmoji("thermo"))
  }

  val CompassPoints: Seq[String] = Seq(
    "N", "NNE", "NE", "ENE", "E", "ESE", "SE", "SSE",
    "S", "SSW", "SW", "WSW", "W", "WNW", "NW", "NNW")

  /** 16-point compass label (F8, app.js:187-194):
    * idx = round(((d % 360) + 360) % 360 / 22.5) % 16. */
  def compass16(degrees: Column): Column = {
    val norm = pmod(degrees.cast("double"), lit(360.0))
    val idx = pmod(round(norm / 22.5), lit(16)).cast("int")
    element_at(array(CompassPoints.map(lit): _*), idx + 1)
  }

  /** Derived daily alert flags (SURVEY §2.6 gap resolution — consumed by the
    * reference frontend but never produced by its backend; thresholds grounded
    * in reference constants report.py:39, viz.py:145, viz.py:89). */
  def isHotDay(tempMax: Column): Column = tempMax > 33.0
  def isUnhealthyPm25(pm25Avg: Column): Column = pm25Avg > 35.4
  def isHeavyRain(totalRain: Column): Column = totalRain > 20.0

  /** F13 — search-hit highlight (app.js:417-421): the query has its regex
    * metacharacters escaped, then the FIRST case-insensitive occurrence is
    * wrapped in the highlight span, preserving the matched text's case. The
    * first-match-only semantics of JS `String.replace` with a non-global
    * regex are reproduced by capturing the remainder with a dotall `(.*)`
    * tail — the whole match then consumes to end-of-string, so exactly one
    * replacement can happen. */
  def highlightFirst(text: Column, query: String): Column = {
    val quoted = query.replaceAll("""[.*+?^$(){}|\[\]\\]""", """\\$0""")
    regexp_replace(text, s"(?is)($quoted)(.*)",
      "<span class=\"highlight\">$1</span>$2")
  }

  /** Recommendation rules (F6, report.py:28-49): advice sentences joined in
    * rule order (pm2.5 rules are mutually exclusive — if/elif in the
    * reference), falling back to the default sentence when no rule fires. */
  def recommendation(maxTemp: Column, pm25Avg: Column, rainyDays: Column): Column = {
    val parts = concat_ws(" ",
      when(pm25Avg > 55.4,
        lit("Kualitas udara buruk. Gunakan masker saat di luar, batasi aktivitas outdoor."))
        .when(pm25Avg > 35.4,
          lit("Kualitas udara sedang–buruk bagi kelompok sensitif. Kurangi paparan di luar.")),
      when(maxTemp > 33.0,
        lit("Cuaca panas. Hindari aktivitas berat siang hari dan perbanyak minum.")),
      when(rainyDays >= 3,
        lit("Beberapa hari hujan. Siapkan jas hujan/penutup barang jika beraktivitas di luar.")))
    when(length(parts) > 0, parts)
      .otherwise(lit("Kondisi relatif aman. Tetap pantau perubahan cuaca harian."))
  }
}
