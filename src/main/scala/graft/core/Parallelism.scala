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
  /** Repartition `df` up to the session's default parallelism iff its plan
    * currently yields fewer partitions; otherwise pass through untouched
    * (no shuffle added on well-partitioned inputs). */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
