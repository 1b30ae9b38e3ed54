package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: densify a keyed series to a fixed grid and
  * forward-fill gaps — the standard repair step before windowed features
  * when sensor/ingest gaps would otherwise skew frame-based aggregates.
  *
  * Scale shape: the grid is generated per key with `sequence` + `explode`
  * (rows grow by gap size, not key count), the fill is one `last(...,
  * ignoreNulls)` window pass per column — a single shuffle on the key.
  */
object Resample {

  /** Densify `df` to one row per `step` interval per key between each key's
    * min and max timestamp, forward-filling `valueCols` from the most recent
    * observed row. Adds `is_observed` marking original rows. */
  def fillForward(df: DataFrame, keyCol: String, tsCol: String,
                  valueCols: Seq[String], step: String = "1 hour"): DataFrame = {
    val grid = df.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__t0"), max(col(tsCol)).as("__t1"))
      .select(col(keyCol),
        explode(sequence(col("__t0"), col("__t1"), expr(s"INTERVAL $step")))
          .as(tsCol))
    val joined = grid.join(df.withColumn("__obs", lit(true)),
      Seq(keyCol, tsCol), "left_outer")
    val w = Window.partitionBy(keyCol).orderBy(tsCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.withColumn("is_observed", coalesce(col("__obs"), lit(false)))
      .drop("__obs")
  }
}
