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
