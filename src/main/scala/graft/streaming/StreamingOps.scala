package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming formulations of the engine's incremental semantics
  * (SURVEY §2.9): the reference's raw zone is append-only (snapshot dual-
  * write, fetch.py:101-105), which is exactly a streaming file source; the
  * daily rollup becomes a watermarked tumbling-window aggregation, and
  * sessionization becomes typed state on a KeyValueGroupedDataset.
  */
object StreamingOps {

  /** Raw-zone hourly schema for the streaming reader (matches the pivoted
    * hourly table; streaming JSON sources must declare their schema). */
  val HourlySchema: StructType = StructType(Seq(
    StructField("city", StringType),
    StructField("time", TimestampType),
    StructField("temp", DoubleType),
    StructField("rain", DoubleType),
    StructField("pm25", DoubleType),
    StructField("pm10", DoubleType)))

  /** T2 — tail the append-only raw zone as a stream of hourly rows. */
  def readHourlyStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(HourlySchema).json(dir)

  /** A1 as a stream: per-(city, day) rollup with a watermark for late hours.
    * Watermark bounds state: days older than the horizon are finalized and
    * evicted, so state size is O(cities x horizon) regardless of input. */
  def dailyRollup(hourly: DataFrame, watermark: String = "2 days"): DataFrame =
    hourly
      .withWatermark("time", watermark)
      .groupBy(col("city"), window(col("time"), "1 day").as("day"))
      .agg(
        min("temp").as("temp_min"),
        max("temp").as("temp_max"),
        sum("rain").as("total_rain"),
        avg("pm25").as("pm25_avg"),
        avg("pm10").as("pm10_avg"))
      .select(col("city"), col("day.start").cast("date").as("date"),
        col("temp_min"), col("temp_max"), col("total_rain"),
        col("pm25_avg"), col("pm10_avg"))

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long, value_sum: Double)

  /** Gap-based streaming sessionization: a session closes when a later event
    * arrives past the gap, or (with ProcessingTimeTimeout, the production
    * default) when no event arrives for `gapMs` at all. Custom state via
    * flatMapGroupsWithState — the streaming twin of operators.Sessionize.
    * Tests pass NoTimeout: a processing-time timeout makes the micro-batch
    * trigger poll continuously, which busy-loops under processAllAvailable. */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout())
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val useTimeout = timeout != GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(s.copy(end = t, n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed ::= SessionOut(user, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** T4 — streaming current-conditions view: the latest hourly row per city,
    * continuously maintained (the streaming twin of AsOfJoin.nearestTo's
    * "conditions closest to now"). max_by keeps exactly one row of state per
    * city; Complete output re-emits the small per-city table each batch. */
  def currentConditions(hourly: DataFrame): DataFrame =
    hourly
      .groupBy(col("city"))
      .agg(max_by(
        struct(col("time"), col("temp"), col("rain"), col("pm25"), col("pm10")),
        col("time")).as("latest"))
      .select(col("city"), col("latest.time").as("time"),
        col("latest.temp").as("temp"), col("latest.rain").as("rain"),
        col("latest.pm25").as("pm25"), col("latest.pm10").as("pm10"))

  /** Streaming exact dedup — the incremental twin of `Dedup.exact`, the shape
    * an always-on ingest pipeline needs (batch dedup requires re-reading the
    * corpus; this keeps one state row per content hash inside the watermark
    * horizon and emits only first-seen documents). `dropDuplicates` keyed on
    * the content hash; the event-time watermark bounds state so it is
    * O(distinct hashes per horizon), not O(corpus).
    * `dropDuplicatesWithinWatermark` dedups on the hash ALONE while still
    * evicting state past the watermark — plain `dropDuplicates` would need
    * the event-time column in the key (wrong semantics) or keep state
    * forever. */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
                  watermark: String = "1 day"): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming INCREMENTAL exact dedup against a STATIC corpus index — the
    * streaming twin of [[graft.operators.Dedup.exactIncrement]]: a document
    * survives when its content hash matches no corpus document AND it is
    * the first occurrence within the stream's watermark horizon.
    * `corpusHashes` is a static `content_hash` frame (in a deployed
    * pipeline the stored index column of the ingested corpus).
    *
    * The corpus probe runs BEFORE the stateful dedup, so corpus-matched
    * documents never enter the state store — state stays O(distinct NEW
    * hashes per horizon). The stream-static anti-join re-resolves the
    * static side per micro-batch, so a periodically-compacted index parquet
    * is picked up without a restart; per-batch cost scales with the batch,
    * and the index side is never collected to the driver. */
  def dedupStreamIncrement(docs: DataFrame, corpusHashes: DataFrame,
                           tsCol: String, textCol: String,
                           watermark: String = "1 day"): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .join(corpusHashes, Seq("content_hash"), "left_anti")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming curation pass — the scan-stage curation suite (quality score,
    * language id, PII redaction, deterministic train/valid/test split)
    * applied to an unbounded document stream. Entirely STATELESS: every
    * expression is a pure function of the row, so this runs in append mode
    * with no watermark and no state store, at ingest rate. The expressions
    * are the very same Column trees the batch gates run — one definition of
    * "clean" for both arrival modes, which is the point (a curation rule
    * that disagrees between backfill and live ingest poisons the corpus). */
  def curateStream(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", minQuality: Double = 0.6,
                   lang: String = "en", salt: String = ""): DataFrame = {
    import graft.functions.{Redact, TextFunctions}
    docs
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("lang_guess", TextFunctions.langId(col(textCol)))
      .filter(col("quality") >= minQuality && col("lang_guess") === lang)
      .withColumn(textCol, Redact.redactPii(col(textCol)))
      .withColumn("split", graft.operators.Sampling.split(col(idCol), salt = salt))
  }

  /** Sink helper: append the streaming rollup to a partitioned parquet zone. */
  def writeDaily(rollup: DataFrame, outDir: String, checkpoint: String) =
    rollup.writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .partitionBy("city")
}
