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

  /** Symmetric int8 scalar quantization scale: 127 / max|v| (1.0 for the
    * zero vector). Max is order-independent, so the fold is exact on any
    * engine. */
  def quantScaleI8(a: Column): Column = {
    val maxAbs = aggregate(asD(a), lit(0.0), (acc, x) => greatest(acc, abs(x)))
    when(maxAbs > 0.0, lit(127.0) / maxAbs).otherwise(lit(1.0))
  }

  /** Quantize to int8 codes with the given scale: q_i = round(v_i * scale)
    * ∈ [-127, 127]. 4× memory/IO vs float32 — the standard first compression
    * step for an embedding store at scale; pair with [[dequantizeI8]] or
    * integer dot products. The scale rides in as an argument array (a
    * captured lambda expression would re-evaluate it per element). */
  def quantizeI8(a: Column, scale: Column): Column = {
    val v = asD(a)
    zip_with(v, array_repeat(scale, size(v)),
      (x, s) => round(x * s).cast("tinyint"))
  }

  def dequantizeI8(q: Column, scale: Column): Column =
    zip_with(q, array_repeat(scale, size(q)),
      (x, s) => x.cast("double") / s)

  /** Fixed seeded random hyperplanes with ±1 (Rademacher) entries, drawn once
    * from a seeded PRNG — the same constants generate both the Spark plan and
    * any mirroring oracle SQL (the `Dedup.HashParams` pattern). ±1 entries
    * instead of Gaussians keep every product an exact sign-flip of the input
    * double, so the sequential-fold dot product is bit-reproducible across
    * engines with no float-literal round-tripping. */
  def signPlanes(bits: Int, dim: Int, seed: Long = 42L): IndexedSeq[Array[Int]] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.fill(bits)(Array.fill(dim)(if (rnd.nextBoolean()) 1 else -1))
  }

  /** Sign-LSH bucket from `bits` random-hyperplane projections: bit i is the
    * sign of v · plane_i. Bucket id is the concatenated sign pattern, e.g.
    * "+-++-+-+" — candidates only form within a bucket, so the pair join is
    * bucket-local instead of a full cross join.
    *
    * Random hyperplanes, NOT the signs of the first `bits` dimensions: real
    * embedding dimensions are correlated/anisotropic, so leading-dim signs
    * skew badly (worst case one bucket holds most of the corpus and the
    * "bucket-local" join degenerates toward quadratic). Each projection mixes
    * ALL `dim` dimensions with ±1 weights, which balances buckets under any
    * fixed rotation/scaling of the embedding space. */
  def hyperplaneBucket(a: Column, bits: Int, dim: Int, seed: Long = 42L): Column = {
    val v = asD(a)
    // native vec_dot kernel: the zip_with+aggregate formulation is
    // CodegenFallback, which put `bits` interpreted folds on every SCAN row
    // of the corpus. Same left-to-right arithmetic — identical signs.
    // Callers ensure GraftExtensions.register ran (the operators and the
    // shared test session both do).
    concat(signPlanes(bits, dim, seed).map { p =>
      val proj = VecCosine.dot(v, array(p.toIndexedSeq.map(x => lit(x.toDouble)): _*))
      when(proj >= 0.0, "+").otherwise("-")
    }: _*)
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions with a
    * ±1 (Achlioptas) matrix: out_j = (v · plane_j) / sqrt(outDim). The
    * standard cheap compression in front of ANN at scale — 100 TB of
    * 4096-dim embeddings shrink 64-256× in the scan stage (zero shuffles,
    * native codegen'd dot kernels) while approximately preserving pairwise
    * distances, so the candidate search runs on the small vectors and only
    * re-ranking (see `Similarity.searchIvfRerank`) touches the originals.
    *
    * Same determinism story as [[hyperplaneBucket]]: seeded ±1 rows make
    * every output an exact sign-flipped sequential fold of the input —
    * bit-reproducible on any engine (sqrt(outDim) is one IEEE op). The
    * projection matrix is outDim×dim plan literals — both are MODEL
    * constants (unlike a data-scaled centroid set), so the plan stays
    * constant-sized at any corpus scale. */
  def randomProject(a: Column, outDim: Int, dim: Int, seed: Long = 42L): Column = {
    val v = asD(a)
    val scale = sqrt(lit(outDim.toDouble))
    array(signPlanes(outDim, dim, seed).map { p =>
      VecCosine.dot(v, array(p.toIndexedSeq.map(x => lit(x.toDouble)): _*)) / scale
    }: _*)
  }
}
