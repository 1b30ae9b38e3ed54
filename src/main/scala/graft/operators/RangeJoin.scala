package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join without an equi key: point t ∈ [start, end].
  *
  * Spark plans a bare non-equi join as broadcast-nested-loop or cartesian —
  * O(|points|·|intervals|) compares, the classic 100 TB killer. Bucketing
  * time manufactures an equi key: every interval explodes into one row per
  * covered bucket, every point maps to its single bucket, and the join
  * becomes a plain hash join on the bucket id with the exact predicate
  * evaluated bucket-locally. A point's bucket is unique, so each matching
  * (point, interval) pair is produced exactly once — no distinct needed.
  *
  * Pick `bucketSeconds` near the median interval length: too small explodes
  * the interval side (rows ≈ Σ len/bucket), too large degrades bucket
  * selectivity toward the cross product.
  */
object RangeJoin {

  /** Epoch seconds for bucket derivation only (TIMESTAMP_NTZ has no direct
    * long cast; the session runs UTC, so the round-trip is deterministic —
    * and the exact predicate below compares the original values anyway). */
  private def epochS(c: org.apache.spark.sql.Column) =
    c.cast("timestamp").cast("long")

  def pointInInterval(points: DataFrame, tCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketSeconds: Long = 86400L): DataFrame = {
    val p = points.withColumn("__b",
      floor(epochS(col(tCol)) / bucketSeconds))
    val iv = intervals.withColumn("__b",
      explode(sequence(
        floor(epochS(col(startCol)) / bucketSeconds),
        floor(epochS(col(endCol)) / bucketSeconds))))
    p.join(iv, Seq("__b"))
      .filter(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("__b")
  }
}
