package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{Slugify, WeatherFunctions}
import graft.weather.{WeatherSources, WeatherTransform}

/** Property-based invariants (SURVEY §5.2): random ragged raw payloads and
  * arbitrary measurement values must never break the pipeline's shape
  * guarantees, whatever the field lengths or value ranges.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  /** Raw payload with `nHours` time stamps and per-field arrays whose lengths
    * may disagree with the spine (the ragged case transform.py:24-28 guards). */
  private def rawJson(nHours: Int, fieldLens: Map[String, Int]): String = {
    val times = (0 until nHours)
      .map(h => s""""2025-01-0${1 + h / 24}T${f"${h % 24}%02d"}:00"""")
      .mkString("[", ",", "]")
    val fields = fieldLens.map { case (f, len) =>
      s""""$f": ${(1 to len).map(i => s"$i.0").mkString("[", ",", "]")}"""
    }
    (Seq(s""""time": $times""") ++ fields).mkString("""{"hourly": {""", ",", "}}")
  }

  test("pivot invariant: row count == |time|, ragged fields null only themselves") {
    check(Prop.forAll(Gen.choose(1, 8), Gen.choose(0, 10), Gen.choose(0, 10)) {
      (n: Int, lenTemp: Int, lenRain: Int) =>
        val raw = WeatherSources.rawFromJson(spark,
          rawJson(n, Map("temperature_2m" -> lenTemp, "precipitation" -> lenRain)))
        val rows = WeatherTransform
          .hourlyFrame(raw, WeatherTransform.DailyWeatherFields).collect()
        rows.length == n &&
          rows.forall(r => (r.getAs[String]("temp") != null) == (lenTemp == n)) &&
          rows.forall(r => (r.getAs[String]("rain") != null) == (lenRain == n))
    }, n = 15)
  }

  test("daily invariant: temp_min <= temp_max; total_rain never null") {
    check(Prop.forAll(Gen.choose(1, 8)) { n: Int =>
      val raw = WeatherSources.rawFromJson(spark,
        rawJson(n, Map("temperature_2m" -> n, "precipitation" -> n)))
      val air = WeatherSources.emptyRaw(spark)
      WeatherTransform.daily(raw, air).collect().forall { r =>
        val mn = r.getAs[java.lang.Double]("temp_min")
        val mx = r.getAs[java.lang.Double]("temp_max")
        (mn == null || mx == null || mn <= mx) &&
          !r.isNullAt(r.fieldIndex("total_rain")) // fillna(0.0) parity
      }
    }, n = 10)
  }

  test("pm25 categorizer is total and picks the first matching threshold") {
    val labels = WeatherFunctions.LabelsId
    // evaluated via Spark once over a generated batch (row-per-value), so the
    // property exercises the real when-chain, not a Scala re-implementation
    val values = Gen.listOfN(200, Gen.choose(-50.0, 400.0)).sample.get
    val got = values.toDF("pm25")
      .select(WeatherFunctions.pm25Category(col("pm25"))).as[String].collect()
    values.zip(got).foreach { case (v, label) =>
      val expected = WeatherFunctions.Pm25Thresholds.indexWhere(v <= _) match {
        case -1 => labels.length - 1
        case i => i
      }
      assert(label == labels(expected), s"value $v")
    }
  }

  test("slugify is idempotent and produces only [a-z0-9-], never empty") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s: String =>
      val slug = Slugify.slugify(s)
      slug.nonEmpty &&
        (slug.matches("[a-z0-9-]+") || slug == "city") &&
        Slugify.slugify(slug) == slug
    }, n = 100)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
