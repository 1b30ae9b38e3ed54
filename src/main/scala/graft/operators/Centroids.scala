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

  /** Exact UPPER-TRIANGLE covariance of an embedding corpus — (i, j, cov)
    * with 0-based dims, i ≤ j: the sufficient statistic behind the
    * spectral diagnostics ([[topPrincipalComponent]]) and whitening.
    * Population covariance (divide by n), means and cell sums both as
    * round-9 decimal accumulations — order-independent, so the matrix is
    * bit-reproducible on any engine and partitioning.
    *
    * Scale shape: one dim-wise pass for the means (partial-agg, dim-bounded
    * shuffle), then one scan exploding each row to its dim(dim+1)/2 pair
    * products, partial-aggregated map-side before the (dim²)-bounded
    * shuffle. Nothing corpus-sized is shuffled; the output is model-sized
    * by construction. Rows whose vector length ≠ `dim` are dropped (a
    * ragged row would corrupt every cell it touches). */
  def covarianceUpper(embeddings: DataFrame, vecCol: String,
                      dim: Int): DataFrame = {
    require(dim > 0, "dim must be positive")
    // fan out FIRST: the embedding table is one small parquet file at test
    // scales, and without this the dim(dim+1)/2-per-row pair stream
    // explodes inside a near-single-task stage
    val e = graft.core.Parallelism.fanOut(embeddings
      .select(col(vecCol).cast("array<double>").as("__v"))
      .filter(size(col("__v")) === dim &&
        forall(col("__v"), x => x.isNotNull)))
    val mu = e.select(posexplode(col("__v")).as(Seq("i", "x")))
      .groupBy("i")
      .agg((sum(round(col("x"), 9).cast("decimal(28,9)")).cast("double") /
        count(lit(1))).as("mu"))
    val muArr = mu.groupBy()
      .agg(transform(array_sort(collect_list(struct(col("i"), col("mu")))),
        s => s.getField("mu")).as("__mu"))
    // the hot pair stream carries ONE flat double per product (posexplode
    // index = upper-triangle position) instead of an (i,j,p) struct —
    // building n·dim(dim+1)/2 structs per scan measurably dominated the
    // gate (9.3 s solo at sf0.1); the (i,j) labels join onto the
    // dim(dim+1)/2-row RESULT, never the corpus-sized stream. Identical
    // products, rounds, and groups — bit-identical output.
    val spark = embeddings.sparkSession
    import spark.implicits._
    val posMap = broadcast(
      (0 until dim).flatMap(i => (i until dim).map(j => (i.toLong, j.toLong)))
        .zipWithIndex.map { case ((i, j), pos) => (pos, i, j) }
        .toDF("pos", "i", "j"))
    e.crossJoin(broadcast(muArr))
      .select(posexplode(flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
        transform(sequence(i, lit(dim - 1)), j =>
          (element_at(col("__v"), i + lit(1)) -
              element_at(col("__mu"), i + lit(1))) *
            (element_at(col("__v"), j + lit(1)) -
              element_at(col("__mu"), j + lit(1))))))).as(Seq("pos", "p")))
      .groupBy("pos")
      .agg((sum(round(col("p"), 9).cast("decimal(28,9)")).cast("double") /
        count(lit(1))).as("cov"))
      .join(posMap, Seq("pos"))
      .select(col("i"), col("j"), col("cov"))
  }

  /** TOP PRINCIPAL COMPONENT of an embedding corpus by the power method —
    * the spectral health check a representation pipeline watches: a
    * dominant component carrying most of the variance means embeddings
    * collapse toward a line (anisotropy — the known failure mode of
    * untuned sentence embeddings), and its loadings say which dimensions
    * dominate retrieval distances.
    *
    * The corpus-scaled work is the [[covarianceUpper]] pass; the dim×dim
    * matrix then COLLECTS (model-sized, like centroid tables) and the
    * fixed-`iters` power iteration runs locally with arithmetic an engine
    * can replay exactly: v₀ = 1/√dim, each matvec entry a round-9 decimal
    * sum of round-9 products, each norm the √ of a round-9 decimal sum of
    * round-9 squares, one division per entry. No convergence test — a
    * FIXED iteration count is what makes the result a pure function of
    * the input (the oracle unrolls the same ten steps).
    *
    * Output: one row per dimension (i, loading, eigenvalue,
    * variance_share) — `eigenvalue` is the final matvec norm (the Rayleigh
    * estimate under power iteration), `variance_share` divides it by the
    * trace. */
  def topPrincipalComponent(embeddings: DataFrame, vecCol: String, dim: Int,
                            iters: Int = 10): DataFrame = {
    require(iters >= 1, "need at least one power iteration")
    val spark = embeddings.sparkSession
    import spark.implicits._
    def round9(x: Double): Double =
      if (x.isNaN || x.isInfinite) x
      else java.math.BigDecimal.valueOf(x)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    def decSum(xs: Seq[Double]): Double =
      xs.map(x => java.math.BigDecimal.valueOf(round9(x))
          .setScale(9, java.math.RoundingMode.HALF_UP))
        .foldLeft(java.math.BigDecimal.ZERO)(_ add _).doubleValue()
    // model-sized collect: dim(dim+1)/2 cells, the centroid-table contract
    val cells = covarianceUpper(embeddings, vecCol, dim).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
    val c = Array.ofDim[Double](dim, dim)
    cells.foreach { case (i, j, v) => c(i)(j) = v; c(j)(i) = v }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(i =>
        decSum((0 until dim).map(j => c(i)(j) * v(j))))
      lambda = math.sqrt(decSum(w.map(x => x * x)))
      v = w.map(_ / lambda)
    }
    val trace = decSum((0 until dim).map(i => c(i)(i)))
    val share = if (trace != 0.0) lambda / trace else Double.NaN
    v.toIndexedSeq.zipWithIndex
      .map { case (l, i) => (i.toLong, l, lambda, share) }
      .toDF("i", "loading", "eigenvalue", "variance_share")
  }

  /** ALL-BUT-THE-TOP post-processing (Mu & Viswanath, ICLR 2018): subtract
    * the corpus mean and project out the top principal component — the
    * standard fix for anisotropic embeddings (the dominant direction is
    * shared energy that drowns cosine distances; removing it measurably
    * improves retrieval). Composes [[covarianceUpper]]'s means and
    * [[topPrincipalComponent]]'s direction; both are MODEL-SIZED, so the
    * rewrite itself is pure scan-stage arithmetic: per row,
    * `x' = (x − μ) − round9(v·(x − μ)) · v` with the dot product a
    * sequential left-to-right fold — bit-reproducible, oracle-gated.
    * Output: the input's id column plus `embedding` (the processed
    * vector, one `round(·, 9)` per element so both engines emit identical
    * parquet doubles). Rows whose vector length ≠ dim pass through
    * unprocessed=NULL (they never entered the statistics either). */
  def removeTopComponent(embeddings: DataFrame, idCol: String, vecCol: String,
                         dim: Int, iters: Int = 10): DataFrame = {
    val stats = topPrincipalComponent(embeddings, vecCol, dim, iters)
      .orderBy("i").collect().map(_.getAs[Double]("loading"))
    // per-dim means, model-sized, the covariance pass's exact arithmetic
    val e = embeddings.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val mu = graft.core.Parallelism.fanOut(e.filter(size(col("__v")) === dim))
      .select(posexplode(col("__v")).as(Seq("i", "x")))
      .groupBy("i")
      .agg((sum(round(col("x"), 9).cast("decimal(28,9)")).cast("double") /
        count(lit(1))).as("mu"))
      .orderBy("i").collect().map(_.getAs[Double]("mu"))
    val vLit = array(stats.map(lit): _*)
    val muLit = array(mu.map(lit): _*)
    // stage the centered vector and its dot product as their own projected
    // columns: inlining `dot` into the rewrite lambda re-evaluates the
    // 64-fold aggregate once PER ELEMENT unless codegen CSE saves it —
    // staged, it computes once per row; fanOut splits the one-file scan
    val staged = graft.core.Parallelism.fanOut(e)
      .withColumn("__c", zip_with(col("__v"), muLit, (x, m) => x - m))
      // sequential fold dot product, round-9 pinned (the cross-engine contract)
      .withColumn("__dot", round(aggregate(
        zip_with(col("__c"), vLit, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x), 9))
    staged.select(col(idCol),
      when(size(col("__v")) === dim,
        zip_with(col("__c"), vLit, (c, vv) => round(c - col("__dot") * vv, 9)))
        .as("embedding"))
  }
}
