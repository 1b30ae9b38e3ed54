package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, as pure Column
  * expressions (whole-stage-codegen'd; no UDF serialization per row).
  *
  * All folds are sequential left-to-right over the array after widening each
  * element to double — the summation order is defined, so results are
  * bit-reproducible across engines and run sizes (important both for the
  * DuckDB oracle and for re-runs of a 100 TB job).
  */
object VectorFunctions {
  private def asD(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asD(a), asD(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2Sq(a: Column): Column =
    aggregate(asD(a), lit(0.0), (acc, v) => acc + v * v)

  def norm2(a: Column): Column = sqrt(norm2Sq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** L2-normalize to a unit vector (zero vectors pass through unchanged) —
    * the standard embedding preprocessing before cosine/IP search. The norm
    * rides in via `array_repeat` as an ARGUMENT array: a lambda that merely
    * captured `norm2(v)` would re-fold the whole vector once per element
    * (O(d²)/row). */
  def normalize(a: Column): Column = {
    val v = asD(a)
    zip_with(v, array_repeat(norm2(v), size(v)),
      (x, n) => when(n > 0.0, x / n).otherwise(x))
  }

  /** Sign-bit LSH bucket over the first `bits` dimensions: cheap deterministic
    * bucketing for approximate nearest-neighbor (candidates only form within a
    * bucket, so the pair join is bucket-local instead of a full cross join).
    * Bucket id is the concatenated sign pattern, e.g. "+-++-+-+".
    */
  def signBucket(a: Column, bits: Int): Column =
    concat(
      (0 until bits).map { d =>
        when(element_at(asD(a), d + 1) >= 0.0, "+").otherwise("-")
      }: _*)
}
