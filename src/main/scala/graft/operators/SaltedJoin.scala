package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join by key salting.
  *
  * A shuffle join hash-partitions by key, so one hot key lands every one of
  * its rows on a single reducer; at 100 TB that reducer runs for hours or
  * OOMs. Salting splits each key's rows across `factor` sub-partitions: the
  * big side gets a per-row salt in [0, factor), the other side is replicated
  * once per salt value, and the join key becomes (key, salt). The result is
  * row-identical to the plain join — only the partitioning changes.
  *
  * AQE's skew-join splitting (on by default in [[graft.core.GraftSession]])
  * already handles sort-merge-join skew at runtime; explicit salting remains
  * the right lever when a skewed key feeds a grouped aggregation, or when a
  * broadcast is impossible and AQE's post-shuffle splitting can't apply.
  */
object SaltedJoin {

  /** Inner equi-join of `big` (skewed) with `small` on `keys`, salted
    * `factor` ways. `small` is replicated `factor` times — keep factor small
    * (4-16) and the right side the smaller input. */
  def inner(big: DataFrame, small: DataFrame, keys: Seq[String], factor: Int): DataFrame = {
    require(factor >= 1, "salt factor >= 1")
    // per-row salt; any row-varying value works because the salt never
    // affects the join result, only which reducer handles the row
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    saltedBig.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
