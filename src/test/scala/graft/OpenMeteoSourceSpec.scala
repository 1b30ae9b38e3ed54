package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.DocQueries
import graft.weather.WeatherSources

class OpenMeteoSourceSpec extends SparkSpec {
  import spark.implicits._

  private def rawDir(): String = {
    val dir = Files.createTempDirectory("openmeteo")
    dir.toFile.deleteOnExit()
    WeatherSources.writeRawSnapshot(dir.toString, "bandung", "weather",
      DocQueries.FixtureWeatherJson, "20250101T000000")
    WeatherSources.writeRawSnapshot(dir.toString, "bandung", "air",
      DocQueries.FixtureAirJson, "20250101T000000")
    dir.toString
  }

  test("openmeteo source pivots raw struct-of-arrays into hourly rows") {
    val df = spark.read.format("openmeteo").load(rawDir())
    val rows = df.orderBy("kind", "time").collect()
    assert(rows.length == 6) // 3 hours x (weather + air); snapshots skipped
    assert(rows.forall(_.getAs[String]("city") == "bandung"))
    val weather = rows.filter(_.getAs[String]("kind") == "weather")
    assert(weather.map(_.getAs[java.lang.Double]("temperature_2m")).toSeq ==
      Seq(25.0, 26.5, 24.0))
    assert(weather.forall(r => r.isNullAt(r.fieldIndex("pm2_5"))))
    val air = rows.filter(_.getAs[String]("kind") == "air")
    assert(air.map(_.getAs[java.lang.Double]("pm10")).toSeq == Seq(25.0, 30.0, 60.0))
  }

  test("column pruning pushes into the reader (scan reads only selected cols)") {
    val df = spark.read.format("openmeteo").load(rawDir())
      .select("city", "time")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("ReadSchema: struct<city:string,time:string>"),
      s"pruned schema not pushed:\n$scanDesc")
    assert(df.distinct().count() == 3)
  }

  test("feeds the transform pipeline end-to-end") {
    val df = spark.read.format("openmeteo").load(rawDir())
    val hourly = df.filter(col("kind") === "weather")
      .select(col("time"), col("temperature_2m").as("temp"),
        col("precipitation").as("rain"))
      .withColumn("time", col("time").cast("timestamp"))
      .withColumn("date", to_date(col("time")))
    val daily = graft.weather.WeatherTransform.dailyFromHourly(
      hourly.withColumn("pm25", lit(null).cast("double"))
        .withColumn("pm10", lit(null).cast("double")))
      .orderBy("date").collect()
    assert(daily.length == 2)
    assert(daily(0).getAs[Double]("temp_max") == 26.5)
    assert(daily(1).getAs[Double]("total_rain") == 2.4)
  }
}
