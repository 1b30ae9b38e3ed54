package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Parallelism
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with the (small) query set broadcast —
  * one pass over the corpus, one shuffle for the per-query rank. Scale path:
  * sign-LSH bucketing (queries only scan their bucket) trades recall for a
  * corpus-partition-local join; with 8 sign bits the candidate set is ~1/256
  * of the corpus per query.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. `queries` is assumed
    * small (it is broadcast); ties broken by neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = Parallelism.fanOut(
      corpus.select(col("vec_id").as("nbr_id"), col("embedding").as("nbr_v")))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_v"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        VectorFunctions.cosine(col("q_v"), col("nbr_v")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Bucketed ANN: neighbors are only searched inside the query's sign-LSH
    * bucket. Same output shape as bruteForceTopK; recall < 1 by design. */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                   bucketBits: Int = 8): DataFrame = {
    val c = Parallelism.fanOut(
      corpus.select(col("vec_id").as("nbr_id"), col("embedding").as("nbr_v")))
      .select(col("nbr_id"), col("nbr_v"),
        VectorFunctions.signBucket(col("nbr_v"), bucketBits).as("bucket"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_v"),
      VectorFunctions.signBucket(col("embedding"), bucketBits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        VectorFunctions.cosine(col("q_v"), col("nbr_v")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
