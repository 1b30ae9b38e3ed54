package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Design notes (100 TB north star):
  *  - AQE stays on (Spark 4 default): runtime partition coalescing, skew-join
  *    splitting and dynamic broadcast decisions replace hand-tuned shuffle
  *    partition counts on a real cluster.
  *  - `spark.sql.ansi.enabled=false`: the reference semantics are pandas-style
  *    "coerce, don't throw" (`pd.to_numeric(errors="coerce")`,
  *    /root/reference/src/etl_weather/transform.py:79-80), i.e. invalid cast
  *    -> null. Non-ANSI cast has exactly those semantics.
  *  - Session timezone pinned UTC and timestamps kept NTZ: the reference's
  *    timestamps are city-local wall clock with no offset
  *    (tests/fixtures/weather_min.json:3); values must never shift.
  */
object GraftSession {
  def builder(appName: String = "graft", cores: String = "*"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply the engine's semantic configs to an externally-built session. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}
