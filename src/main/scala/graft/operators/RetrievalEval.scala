package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation over a relevance-labeled query set — the
  * measurement half of the similarity-search family: the engine builds
  * retrievers ([[Similarity.searchIvf]], [[Similarity.rrfFuse]], BM25) and
  * this scores them with the standard IR metrics (recall@k, precision@k,
  * MRR, nDCG@k), the numbers an embedding/retrieval training loop actually
  * tracks. Inputs are frames, not models, so ANY ranking — exact, ANN,
  * fused, reranked — evaluates through one code path.
  *
  * Determinism: DCG/IDCG contributions (`rel / log2(rank+1)`, graded
  * gains) are rounded to 12 decimals and summed as decimal(28,12) — order
  * independent — and each final ratio is one IEEE division of exact
  * operands, so results are bit-reproducible on any engine (the oracle
  * gates hash them).
  */
object RetrievalEval {

  /** Per-query metrics at cutoff `k`.
    *
    * `ranking`: (query_id, nbr_id, rank) — a retriever's output; rows with
    * rank > k are ignored, so passing a deeper ranking is safe.
    * `qrels`: (query_id, doc_id, rel) graded relevance; only rel > 0 rows
    * count as relevant, and `rel` is the nDCG gain.
    *
    * Output: (query_id, n_relevant, n_retrieved, n_hits, recall_at_k,
    * precision_at_k, mrr, ndcg_at_k) — one row per query appearing in
    * EITHER input (full outer): a query with no relevant docs has null
    * recall/ndcg (undefined, not zero); a query never retrieved scores
    * zeros against its relevant set.
    *
    * Scale shape: the ranking side is (queries × k)-bounded by
    * construction; the qrels side partial-aggregates per query before its
    * one shuffle. The pair join is an equi-join on (query_id, nbr_id) —
    * nothing corpus-sized is scanned, let alone crossed. */
  def perQuery(ranking: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val zeroD = lit(0).cast("decimal(28,12)")
    val r = ranking.select(col("query_id"), col("nbr_id"),
        col("rank").cast("long").as("rank"))
      .filter(col("rank") <= k)
    val q = qrels
      .select(col("query_id"), col("doc_id").as("nbr_id"),
        col("rel").cast("double").as("rel"))
      .filter(col("rel") > 0)
    val retrieved = r.join(q, Seq("query_id", "nbr_id"), "left_outer")
      .groupBy("query_id")
      .agg(
        count(lit(1)).as("n_retrieved"),
        sum(when(col("rel").isNotNull, lit(1L)).otherwise(lit(0L))).as("n_hits"),
        min(when(col("rel").isNotNull, col("rank"))).as("__first_hit"),
        sum(coalesce(
          round(col("rel") / log2(col("rank") + 1), 12).cast("decimal(28,12)"),
          zeroD)).as("__dcg"))
    // ideal ranking from qrels alone: gains descending, doc id ascending
    // (a total order, so IDCG is unique) — rank window over per-query
    // groups bounded by that query's label count
    val wIdeal = Window.partitionBy("query_id").orderBy(desc("rel"), asc("nbr_id"))
    val ideal = q.withColumn("__ir", row_number().over(wIdeal))
      .groupBy("query_id")
      .agg(
        count(lit(1)).as("n_relevant"),
        sum(when(col("__ir") <= k,
            round(col("rel") / log2(col("__ir") + 1), 12).cast("decimal(28,12)"))
          .otherwise(zeroD)).as("__idcg"))
    retrieved.join(ideal, Seq("query_id"), "full_outer")
      .select(
        col("query_id"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("n_retrieved"), lit(0L)).as("n_retrieved"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(col("n_relevant").isNotNull,
            coalesce(col("n_hits"), lit(0L)).cast("double") /
              col("n_relevant").cast("double"))
          .as("recall_at_k"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("precision_at_k"),
        coalesce(lit(1.0) / col("__first_hit"), lit(0.0)).as("mrr"),
        when(col("n_relevant").isNotNull,
            round(coalesce(col("__dcg"), zeroD).cast("double") /
              col("__idcg").cast("double"), 9))
          .as("ndcg_at_k"))
  }

  /** Macro-averaged summary of [[perQuery]] — the one-row scoreboard:
    * means over the queries where each metric is DEFINED (recall/nDCG skip
    * no-relevant queries rather than diluting them), as exact decimal
    * means of round12 contributions, plus the query counts that say what
    * was averaged. */
  def summary(perQuery: DataFrame): DataFrame =
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      sum(when(col("recall_at_k").isNotNull, lit(1L)).otherwise(lit(0L)))
        .as("n_evaluable"),
      (sum(round(col("recall_at_k"), 12).cast("decimal(28,12)")).cast("double") /
        sum(when(col("recall_at_k").isNotNull, lit(1L)).otherwise(lit(0L))))
        .as("mean_recall"),
      (sum(round(col("precision_at_k"), 12).cast("decimal(28,12)")).cast("double") /
        count(lit(1))).as("mean_precision"),
      (sum(round(col("mrr"), 12).cast("decimal(28,12)")).cast("double") /
        count(lit(1))).as("mean_mrr"),
      (sum(round(col("ndcg_at_k"), 12).cast("decimal(28,12)")).cast("double") /
        sum(when(col("ndcg_at_k").isNotNull, lit(1L)).otherwise(lit(0L))))
        .as("mean_ndcg"))
}
