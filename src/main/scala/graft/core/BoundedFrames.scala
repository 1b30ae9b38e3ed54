package graft.core

import org.apache.spark.sql.DataFrame

/** Driver-side materialization for BOUNDED model frames. */
object BoundedFrames {

  /** Materialize a bounded model frame (vocab-capped counts, bucket-capped
    * weights, centroid tables — anything a consumer would broadcast) as a
    * driver-local DataFrame.
    *
    * Model frames are broadcast to every consumer anyway, so the driver
    * holds their rows either way; but carried as DISTRIBUTED lineage, each
    * broadcast RE-RUNS the training aggregation that produced them — and a
    * consumer deriving several broadcasts from one scored frame pays it
    * several times. A local relation broadcasts from driver memory with a
    * flat plan, and train-time lineage (often over frames the trainer
    * unpersists on exit) is severed exactly once, at training time.
    *
    * Values are untouched — this is the same bounded collect every
    * broadcast of the frame would perform. Callers own the bound: only
    * frames whose row count is capped by construction (vocabCap,
    * bigramCap, buckets, nLists) belong here. Heap budget: caps in this
    * repo are <= a few thousand rows of scalar columns (~100-300 bytes per
    * collected Row), so a localized frame holds well under 1 MB of driver
    * heap — five decimal orders below the 8 GB default driver JVM
    * (build.sbt SPARK_DRIVER_MEM); even a 10k-row cap would stay
    * metadata-sized. Anything corpus-scaled stays distributed by the
    * broadcast contract above. */
  def localize(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }
}
