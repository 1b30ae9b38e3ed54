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
    * The decision is driver-side only — file count, file sizes when the
    * count is already below target (a bounded number of `getFileStatus`
    * calls), and for file-less relations the PLANNED physical output
    * partitioning — so the guard never executes a stage of the query. At
    * 100 TB, `inputFiles.length >= target` short-circuits on the catalog's
    * file index. */
  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.length >= target) df
    else if (files.isEmpty) {
      // no file-based input (in-memory fixture / computed relation): read the
      // PLANNED physical output partitioning rather than forcing .rdd — under
      // AQE, .rdd eagerly executes every upstream shuffle stage just to count
      // partitions (for JDBC/Kafka/derived frames, not just tiny fixtures).
      // sparkPlan only plans; an already-wide computed frame (shuffle on top)
      // reports its exchange partitioning and passes through shuffle-free,
      // while local/unknown-partitioned relations report 0 and fan out.
      val planned = df.queryExecution.sparkPlan.outputPartitioning.numPartitions
      if (planned >= target) df else df.repartition(target)
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
