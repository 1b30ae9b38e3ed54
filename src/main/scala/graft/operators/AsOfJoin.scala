package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins (J3 generalized from app.js:754-761's nearest-hour lookup).
  *
  * Scale design: the backward as-of join is the union-and-window formulation
  * — tag both sides, union, and carry the most recent right-side row forward
  * with `last(..., ignoreNulls)` over (key, time). One shuffle on the key,
  * no range explosion, no per-key collect; this is the standard trick used
  * at terabyte scale instead of a point-lookup loop.
  */
object AsOfJoin {

  /** For each left row, attach the latest right row with
    * `right.time <= left.time` and the same key. Right value columns come
    * back null when no prior right row exists. */
  def backward(left: DataFrame, right: DataFrame, key: String, time: String,
               rightCols: Seq[String]): DataFrame = {
    val leftTagged = left.withColumn("__side", lit(1))
    val rightTagged = right.withColumn("__side", lit(0))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      // right rows sort before left rows at equal timestamps => "<=" semantics
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(when(col("__side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    // drop only the right-only carrier columns — shared names (e.g. the time
    // column itself) belong to the surviving left rows
    val dropCols = rightCols.filterNot(left.columns.contains)
    carried.filter(col("__side") === 1)
      .drop("__side").drop(dropCols: _*)
  }

  /** Nearest-row lookup (the literal app.js semantics): for each key, the
    * single row minimizing |time - at|, ties broken by earliest time.
    * Implemented as a window rank so it stays one shuffle at any size. */
  def nearestTo(df: DataFrame, key: String, time: String, at: Column): DataFrame = {
    // via TimestampType: NTZ columns have no direct numeric cast; with the
    // session pinned UTC the epoch seconds equal the wall-clock seconds.
    val diff = abs(col(time).cast("timestamp").cast("double") -
      at.cast("timestamp").cast("double"))
    val w = Window.partitionBy(key).orderBy(diff.asc, col(time).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
