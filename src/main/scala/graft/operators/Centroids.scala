package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key mean embeddings (label/domain/source centroids — the profile
  * vectors behind mixture balancing, outlier scoring, and cheap classifier
  * seeds).
  *
  * Scale shape: one posexplode turns (key, vec[dim]) into dim-wise rows that
  * partial-aggregate map-side before the single (key, pos) shuffle; the
  * centroid is reassembled from at most `dim` rows per key. No collect, no
  * per-key state beyond the dim-bounded struct list.
  *
  * Determinism: the fast path uses plain double `avg`, whose last bits
  * depend on partial-aggregation order (fine for analytics; documented). For
  * bit-reproducible validation against another engine, [[exactDimMean]]
  * folds one dimension's values SEQUENTIALLY in id order — exact, but its
  * collect_list is bounded by the group size, so reserve it for validation
  * queries, not corpus-wide jobs.
  */
object Centroids {

  /** (key, centroid: array<double>, n_vecs, dims_consistent) — fast
    * distributed path.
    *
    * Ragged-dim contract: the per-dimension mean is only a group centroid if
    * every vector in the group has the same length. When they don't (mixed
    * embedding models, truncated rows, empty arrays, NULL vectors), each
    * dimension averages over a DIFFERENT subset — `dims_consistent` is false
    * for such keys, `n_vecs` reports the max per-dimension count, and the
    * centroid values are still emitted so callers can inspect what mixed.
    * Filter on `dims_consistent` before trusting the vector.
    *
    * Empty/NULL vectors would be invisible to a plain posexplode (it emits
    * no rows for them), so every input row gets a sentinel element prepended
    * at pos 0: the pos-0 group counts ALL rows in the key — including the
    * empty and NULL ones — and the guard additionally requires that the real
    * dimensions' count equals that row count. A group of 99 length-768
    * vectors plus one NULL is flagged, not silently averaged over 99.
    * A key whose vectors are ALL empty/NULL emits an empty centroid with
    * n_vecs = 0 and dims_consistent = false. Same scale shape: the sentinel
    * is one extra element per row before the single (key, pos) shuffle. */
  def meanByKey(df: DataFrame, keyCol: String, vecCol: String): DataFrame = {
    val sentinel = array(lit(null).cast("double"))
    val real = col("pos") > 0
    df.select(col(keyCol).as("key"),
        posexplode(concat(sentinel,
          coalesce(col(vecCol).cast("array<double>"), array()))).as(Seq("pos", "v")))
      .groupBy("key", "pos")
      .agg(avg(col("v")).as("m"), count(lit(1)).as("n"))
      .groupBy("key")
      .agg(
        transform(array_sort(collect_list(when(real, struct(col("pos"), col("m"))))),
          s => s.getField("m")).as("centroid"),
        coalesce(max(when(real, col("n"))), lit(0L)).as("n_vecs"),
        (coalesce(min(when(real, col("n"))), lit(0L)) ===
          coalesce(max(when(real, col("n"))), lit(0L)) &&
          coalesce(max(when(real, col("n"))), lit(0L)) ===
          max(when(col("pos") === 0, col("n")))).as("dims_consistent"))
  }

  /** Exact mean of `value` over the group, folded in `orderId` order —
    * identical arithmetic to a single-threaded left-to-right sum (DuckDB:
    * list(v ORDER BY id) folded via list_dot_product with a ones vector). */
  def exactDimMean(orderId: Column, value: Column): Column = {
    val sorted = array_sort(collect_list(struct(orderId.as("i"), value.as("v"))))
    aggregate(transform(sorted, s => s.getField("v")), lit(0.0),
      (acc, x) => acc + x) / size(sorted)
  }
}
