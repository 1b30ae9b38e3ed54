package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent (bit-reproducible) aggregates over double columns.
  *
  * A plain `sum(double)` depends on partial-aggregation order, so the same
  * query can return different last bits run-to-run (and will not hash-match a
  * single-threaded oracle). Money-like inputs here carry <= 2 decimal places,
  * so summing as decimal is exact, associative, and engine-independent; the
  * final cast back to double is deterministic. This is also the right answer
  * at 100 TB: decimal partial aggregates are still map-side combinable.
  */
object ExactAgg {
  def sumD(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Mean computed as exact decimal sum / non-null count — identical
    * arithmetic in any engine, unlike avg(double). */
  def avgD(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double") / count(c)

  /** DuckDB-oracle SQL fragments with the same arithmetic. */
  def sumSql(col: String, scale: Int = 2): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE)"
  def avgSql(col: String, scale: Int = 2): String =
    s"(CAST(sum(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE) / count($col))"
}
