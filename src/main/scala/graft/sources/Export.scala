package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Training-data delivery: sharded JSONL export — the format most training
  * loaders stream — with a manifest the loader can schedule from.
  */
object Export {

  /** Export `df` as `shards` JSONL shard directories under `path`
    * (`shard=N/part-*.txt`, one JSON object per line) and return the
    * manifest (shard, n_rows, n_bytes) the loader consumes.
    *
    * Delivery contract:
    *  - shard assignment is the stable md5 hash bucket of `idCol` — a row
    *    lands in the same shard on every run, engine, and cluster size
    *    (resuming or re-exporting never reshuffles the corpus across
    *    shards);
    *  - rows WITHIN a shard are ordered by `idCol`, so shard bytes are
    *    deterministic end to end (re-export produces identical files —
    *    checked in `SinksSpec`);
    *  - `repartition` on the shard key keeps each shard's rows in one
    *    write task (one part file per shard, no tiny-file spray), while
    *    shards themselves spread across the cluster — the parallel unit is
    *    the shard, the standard layout for a streaming loader.
    *
    * The manifest is computed from the same frame that was written (count
    * + byte partial-aggs, no second read of the output). */
  def jsonlSharded(df: DataFrame, idCol: Column, shards: Int, path: String,
                   salt: String = ""): DataFrame = {
    require(shards > 0, "shards must be positive")
    val json = to_json(struct(df.columns.map(col): _*))
    val staged = df
      .withColumn("__shard", Sampling.hashBucket(idCol.cast("string"), shards, salt))
      .withColumn("__json", json)
    staged
      .repartition(shards, col("__shard"))
      .sortWithinPartitions(col("__shard"), idCol)
      .select(col("__shard").as("shard"), col("__json").as("value"))
      .write.partitionBy("shard").mode("overwrite").text(path)
    staged.groupBy(col("__shard").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(length(col("__json")).cast("long") + lit(1L)).as("n_bytes"))
      .orderBy("shard")
  }

  /** Loader side of [[jsonlSharded]]: read the shard directories back into
    * rows of `schema` plus the `shard` column (recovered from the
    * `shard=N/` partition layout by the text source — no re-hashing).
    * `columnNameOfCorruptRecord` rows surface as all-null rows under
    * PERMISSIVE parsing; use [[validateShards]] to catch them against the
    * manifest rather than silently training on nulls. */
  def readJsonlSharded(spark: org.apache.spark.sql.SparkSession, path: String,
                       schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.text(path)
      .select(col("shard").cast("long").as("shard"),
        from_json(col("value"), schema).as("row"))
      .select(col("shard"), col("row.*"))

  /** Manifest validation: per-shard row counts of a re-read export vs the
    * manifest [[jsonlSharded]] returned (or persisted). Returns
    * (shard, expected_rows, actual_rows, ok) with a full-outer join so a
    * MISSING shard directory and an UNEXPECTED extra shard both surface
    * (expected/actual null-padded to 0). The check is one partial-agg count
    * over the re-read frame against the shards-bounded manifest — the
    * pre-flight a training job runs before touching the data. */
  def validateShards(readBack: DataFrame, manifest: DataFrame): DataFrame = {
    val actual = readBack.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("actual_rows"))
    manifest.select(col("shard").cast("long").as("shard"),
        col("n_rows").as("expected_rows"))
      .join(actual, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("expected_rows"), lit(0L)).as("expected_rows"),
        coalesce(col("actual_rows"), lit(0L)).as("actual_rows"))
      .withColumn("ok", col("expected_rows") === col("actual_rows"))
      .orderBy("shard")
  }
}
