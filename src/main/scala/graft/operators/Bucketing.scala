package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time, join shuffle-free
  * forever after.
  *
  * At 100 TB the dominant cost of a fact-fact join is shuffling both sides on
  * the key. Writing both tables bucketed by that key (same bucket count)
  * makes every later join/aggregation on the key exchange-free: Spark reads
  * matching buckets co-located and sort-merges them directly. This is the
  * standard layout for repeatedly-joined fact tables (orders x lineitem).
  *
  * Bucketed writes go through the session catalog (`saveAsTable`) — bucket
  * metadata lives in the metastore, not the parquet files.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted table named `table`. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
