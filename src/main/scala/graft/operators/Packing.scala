package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget bins (the batching step before writing pre-training
  * sequences — packing short documents together instead of padding each one
  * is a 2-5x token-efficiency win).
  *
  * Exact capacity-constrained bin packing is inherently sequential, so the
  * distributed formulation packs CONTIGUOUSLY in a deterministic order inside
  * hash shards:
  *  - shard = md5-bucket of the id (pure function of the row — reproducible
  *    across engines, runs, and cluster sizes, like [[Sampling]]);
  *  - within a shard, documents are laid out in id order and a bin closes
  *    when the running token total passes the budget: bin = floor(exclusive
  *    prefix sum / budget). A document straddling the boundary lands in the
  *    bin where it starts, so a bin can overflow by at most one document —
  *    the standard streaming approximation.
  *
  * Scale shape: ONE shuffle (the shard window); each shard's window is
  * |corpus|/shards rows, so parallelism is chosen by the caller, not bounded
  * by a single global sort. No driver-side state.
  */
object Packing {

  /** Bin assignment. Output: every input row plus (shard, bin, tokens_before)
    * where `bin` is shard-local and `tokens_before` is the exclusive prefix
    * sum inside the bin's shard — enough for a writer to lay out sequences
    * deterministically. */
  def packBins(docs: DataFrame, idCol: String, tokenCount: Column,
               budgetTokens: Long, shards: Int = 1024,
               salt: String = ""): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val withShard = docs
      .withColumn("__tokens", tokenCount.cast("long"))
      .withColumn("shard", Sampling.hashBucket(col(idCol), shards, salt))
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withShard
      .withColumn("tokens_before", coalesce(sum(col("__tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("tokens_before") / budgetTokens))
      .drop("__tokens")
  }

  /** Materialize packed sequences: one row per (shard, bin) with the member
    * documents concatenated in id order. Safe to assemble distributed — a
    * bin's content is bounded by the token budget (+ one straddling doc), so
    * the collect_list is budget-bounded, never corpus-bounded. */
  def materialize(packed: DataFrame, idCol: String, textCol: String,
                  sep: String = "\n\n"): DataFrame =
    packed
      .groupBy("shard", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(idCol).as("i"), col(textCol).as("t")))),
            s => s.getField("t")),
          sep).as("sequence"))

  /** Per-bin layout summary (what a sequence writer consumes): document
    * count, token fill, and fill ratio vs budget. */
  def binStats(packed: DataFrame, tokenCount: Column,
               budgetTokens: Long): DataFrame =
    packed
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount.cast("long")).as("n_tokens"))
      .withColumn("fill_ratio", col("n_tokens").cast("double") / budgetTokens)
}
