package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-dense operators (hashing, shingling,
  * vector math): work per input byte is large, so the stage must never run
  * narrower than the cluster.
  *
  * At 100 TB the scan naturally yields thousands of input splits and this is
  * a no-op; the guard exists for the opposite regime — a small or
  * single-file input (local bench, a dimension-sized corpus slice) where one
  * task would otherwise serialize all the CPU work behind one core.
  */
object Parallelism {
  /** Repartition `df` up to the session's default parallelism iff its input
    * would scan as fewer splits; otherwise pass through untouched (no shuffle
    * added on well-partitioned inputs).
    *
    * The decision is driver-side metadata only — file count, and file sizes
    * only when the count is already below target (a bounded number of
    * `getFileStatus` calls) — so the guard never instantiates the physical
    * RDD lineage or plans the query twice. At 100 TB, `inputFiles.length >=
    * target` short-circuits on the catalog's file index. */
  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.length >= target) df
    else if (files.isEmpty) {
      // no file-based input (in-memory fixture / computed relation): no file
      // metadata to reason from, so pay the cheap getNumPartitions check
      // (these relations are small by construction) rather than stacking an
      // unconditional shuffle on top of an already-wide computed frame
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    } else {
      val conf = spark.sparkContext.hadoopConfiguration
      val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
      val totalBytes = files.iterator.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(conf).getFileStatus(p).getLen
      }.sum
      // parquet row groups split at ~maxPartitionBytes; an estimate is all
      // the guard needs (it only has to catch the scans-narrow regime)
      val estSplits = math.max(1L, (totalBytes + maxSplit - 1) / maxSplit)
      if (estSplits < target) df.repartition(target) else df
    }
  }
}
