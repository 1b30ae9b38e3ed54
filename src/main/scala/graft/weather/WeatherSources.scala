package graft.weather

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Slugify

/** Sources and sinks around the weather pipeline (SURVEY §2.1).
  *
  * Raw zone layout mirrors the reference's snapshot + "latest" dual-write
  * (fetch.py:101-105,129-132): every ingest appends a timestamped snapshot and
  * refreshes a stable `latest` alias, giving an append-only history that a
  * Structured Streaming file source can tail (graft.streaming).
  */
object WeatherSources {

  /** S7 — offline/tolerant raw JSON scan. multiLine because Open-Meteo
    * payloads are single JSON documents, not JSONL. Missing files fall back
    * to an empty frame with the fail-soft shape of web.py:440 (`hourly.time`
    * = []), so downstream joins yield nulls instead of erroring. */
  def readRaw(spark: SparkSession, path: String): DataFrame = {
    if (Files.exists(Paths.get(path)))
      spark.read.option("multiLine", "true").json(path)
    else emptyRaw(spark)
  }

  def emptyRaw(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.read.option("multiLine", "true")
      .json(Seq("""{"hourly": {"time": []}}""").toDS())
  }

  /** Parse a raw payload already held as a string (embedded fixtures, HTTP
    * bodies handed over by the ingest client). */
  def rawFromJson(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    spark.read.option("multiLine", "true").json(Seq(json).toDS())
  }

  /** S8 — snapshot + latest dual-write of a raw payload (driver-side, the
    * payload is one small JSON document per city per fetch). */
  def writeRawSnapshot(rawDir: String, slug: String, kind: String,
                       payload: String, ts: String): (String, String) = {
    val dir = Paths.get(rawDir)
    Files.createDirectories(dir)
    val snap = dir.resolve(s"${slug}_${kind}_$ts.json")
    val latest = dir.resolve(s"${slug}_$kind.json")
    Files.writeString(snap, payload)
    Files.copy(snap, latest, StandardCopyOption.REPLACE_EXISTING)
    (snap.toString, latest.toString)
  }

  /** S9 — processed-zone sinks. Parquet is the primary format (columnar,
    * splittable, predicate-pushdown-able at scale); CSV kept for reference
    * compatibility (transform.py:112-115). Partitioning by city keeps every
    * per-city query pruned to one directory at 100 TB. */
  def writeProcessed(df: DataFrame, dir: String, name: String,
                     partitionByCity: Boolean = false): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionByCity && df.columns.contains("city")) w.partitionBy("city") else w)
      .parquet(s"$dir/$name.parquet")
  }

  def writeCsvCompat(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  /** Size-aware compacting parquet write — the small-files guard: a shuffle-
    * heavy job ends with as many files as shuffle partitions (tiny files ×
    * thousands of jobs is the classic lakehouse pathology; every downstream
    * scan then pays per-file open/footer costs). Target file count comes
    * from Catalyst's size estimate for the plan, so callers don't hand-tune
    * partition counts per dataset. Estimates are rough (pre-compression
    * row-size arithmetic) — fine for a file-count decision. */
  def writeCompacted(df: DataFrame, path: String,
                     targetFileBytes: Long = 128L << 20,
                     maxFiles: Int = 10000): Unit = {
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val unknown = BigInt(df.sparkSession.sessionState.conf.defaultSizeInBytes)
    targetFileCount(estBytes, targetFileBytes, unknown, maxFiles) match {
      // coalesce never increases partition count, so no need to inspect the
      // current layout (which would instantiate the RDD lineage)
      case Some(n) => df.coalesce(n).write.mode(SaveMode.Overwrite).parquet(path)
      // size estimate is the no-stats sentinel: keep the current layout
      // rather than coalescing on garbage
      case None => df.write.mode(SaveMode.Overwrite).parquet(path)
    }
  }

  /** File-count decision for [[writeCompacted]], clamped to [1, maxFiles];
    * `None` when the estimate is the no-stats sentinel (>= the session's
    * defaultSizeInBytes, i.e. "unknown" — relations without stats report
    * Long.MaxValue, which would overflow a naive toInt into coalesce(0)). */
  def targetFileCount(estBytes: BigInt, targetFileBytes: Long,
                      unknownSentinel: BigInt, maxFiles: Int = 10000): Option[Int] = {
    if (estBytes >= unknownSentinel) None
    else Some((estBytes / targetFileBytes + 1).min(maxFiles).max(1).toInt)
  }

  /** S10 — CSV scan with date parsing and the reference's fallback-without-
    * parsing behavior (web.py:25-34): columns that fail to parse stay
    * strings rather than failing the read. */
  def readCsv(spark: SparkSession, path: String, dateCols: Seq[String]): DataFrame = {
    val df = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    dateCols.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d.withColumn(c, col(c).cast("timestamp")) else d
    }
  }

  def slug(city: String): String = Slugify.slugify(city)
}
