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
    * embedding models, truncated rows), each dimension averages over a
    * DIFFERENT subset — `dims_consistent` is false for such keys (some
    * dimension's count differs from the group's max), `n_vecs` reports the
    * max count seen, and the centroid values are still emitted so callers can
    * inspect what mixed. Filter on `dims_consistent` before trusting the
    * vector. */
  def meanByKey(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    df.select(col(keyCol).as("key"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
      .groupBy("key", "pos")
      .agg(avg(col("v")).as("m"), count(lit(1)).as("n"))
      .groupBy("key")
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"),
        max(col("n")).as("n_vecs"),
        (min(col("n")) === max(col("n"))).as("dims_consistent"))

  /** Exact mean of `value` over the group, folded in `orderId` order —
    * identical arithmetic to a single-threaded left-to-right sum (DuckDB:
    * list(v ORDER BY id) folded via list_dot_product with a ones vector). */
  def exactDimMean(orderId: Column, value: Column): Column = {
    val sorted = array_sort(collect_list(struct(orderId.as("i"), value.as("v"))))
    aggregate(transform(sorted, s => s.getField("v")), lit(0.0),
      (acc, x) => acc + x) / size(sorted)
  }
}
