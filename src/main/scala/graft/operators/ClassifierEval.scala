package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Threshold-free quality-filter evaluation: ROC-AUC and average precision
  * of a binary scorer against (pseudo-)labels, per group — the acceptance
  * test a learned data filter needs BEFORE anyone picks its threshold
  * (the calibration gate answers "is 0.8 really 80%?"; this answers "does
  * the score order documents at all?"). Complements
  * [[RetrievalEval]] (ranking metrics per query) and the
  * `q_text_nb_calibration` reliability curve.
  *
  * Exactness: both metrics are computed from per-distinct-score class
  * counts with ORDER-FREE arithmetic, so they hash-match a single-threaded
  * oracle bit-for-bit:
  *  - ROC-AUC via the Mann-Whitney U statistic kept in INTEGERS until one
  *    final division — `2·U = Σ_s np(s)·(2·negBelow(s) + nn(s))` (the
  *    `nn/2` tie credit doubled away), `auc = 2U / (2·NP·NN)`.
  *  - Average precision in the threshold-sweep form
  *    `AP = Σ_s ΔR(s)·P(s)` over distinct scores descending; each term
  *    `np·TP/(TP+FP)` is rounded to 12 places and summed as DECIMAL
  *    (exact, associative), one final division by NP.
  *
  * Scale shape: one shuffle groups the corpus to its distinct (group,
  * score) class counts; the cumulative below-score sums that both metrics
  * need never window a corpus-scale partition — the same two-phase
  * sharded-cumsum shape as `Curation.rankNormalizeBySource`: per-group
  * score-quantile thresholds (one agg, broadcast), scan-stage shard
  * membership, per-(group, shard) count offsets (broadcast), and windows
  * only over (group, shard) slices of the DISTINCT-SCORE frame (already
  * ≪ corpus). Final metrics are one partial-agg fold per group. */
object ClassifierEval {

  /** Per-`groupCol` binary metrics of `score` against boolean `label`:
    * `n`, `n_pos`, `n_neg`, `auc_roc`, `avg_precision` (both rounded to 9;
    * null when a group lacks a class — AUC needs both, AP needs a
    * positive). Ties in `score` are handled exactly (trapezoidal tie
    * credit for AUC, block thresholds for AP). */
  def binaryMetricsBy(df: DataFrame, groupCol: String, score: Column,
                      label: Column, shards: Int = 8,
                      scope: graft.core.CacheScope.Handle =
                        graft.core.CacheScope.detached): DataFrame = {
    require(shards > 1, "shards must be > 1")
    // Persisted (lazily): four downstream frames derive from g (shard
    // thresholds, per-shard offsets, group totals, the sharded cumsums) and
    // each is broadcast separately — without the persist every broadcast
    // RE-RUNS the caller's scoring pipeline upstream of `df`. g is the
    // distinct-(group, score) class-count frame: ≪ corpus, cache-safe.
    // Pinned into `scope` so a long-lived session can release it once the
    // metrics are materialized (default detached = external cache sweep).
    val g = scope.pin(df.groupBy(col(groupCol), score.as("__v"))
      .agg(sum(when(label, 1L).otherwise(0L)).as("__np"),
        sum(when(label, 0L).otherwise(1L)).as("__nn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // materialize BEFORE the fan-out below: the broadcast subplans (ths,
    // offsets, totals) evaluate CONCURRENTLY inside the caller's one action,
    // and a still-cold lazy persist lets each of them re-run the caller's
    // full scoring pipeline (profiled on q_eval_classifier_auc: the scoring
    // chain's stages executed three times per run). One count() pays the
    // chain exactly once; everything downstream reads the cache.
    g.count()
    // shard thresholds need only monotonicity (shard ranges stay contiguous
    // in score); exact percentile over the distinct-score frame is cheap.
    // ths / offsets / totals are all GROUP-ALPHABET-bounded (≤ groups or
    // groups×shards rows by construction) and each is broadcast downstream:
    // localize them (the BoundedFrames convention) so they evaluate
    // sequentially against the materialized g — as lazy broadcast subplans
    // they all fire concurrently inside the caller's one action, and the
    // profiled result was the g aggregation chain executing several times
    // in parallel instead of once (q_eval_classifier_auc, r19).
    val ths = graft.core.BoundedFrames.localize(
      g.groupBy(col(groupCol).as("__ce_g"))
        .agg(percentile(col("__v"), lit(1.0 / shards)).as("__t1"),
          (2 until shards).map(i =>
            percentile(col("__v"), lit(i.toDouble / shards)).as(s"__t$i")): _*))
    val shard = (1 until shards)
      .map(i => when(col("__v") > col(s"__t$i"), 1).otherwise(0))
      .reduce(_ + _)
    val sharded = g.join(broadcast(ths), col(groupCol) === col("__ce_g"))
      .withColumn("__shard", shard)
      .drop("__ce_g").drop((1 until shards).map(i => s"__t$i"): _*)
    // per-(group, shard) class totals -> below-shard offsets + group totals
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val perShard = sharded.groupBy(col(groupCol), col("__shard"))
      .agg(sum("__np").as("__snp"), sum("__nn").as("__snn"))
    val offsets = graft.core.BoundedFrames.localize(perShard
      .withColumn("__offp", coalesce(sum("__snp").over(wOff), lit(0L)))
      .withColumn("__offn", coalesce(sum("__snn").over(wOff), lit(0L)))
      .select(col(groupCol), col("__shard"), col("__offp"), col("__offn")))
    val totals = graft.core.BoundedFrames.localize(perShard.groupBy(col(groupCol))
      .agg(sum("__snp").as("__gtp"), sum("__snn").as("__gtn")))
    // intra-shard strict-below cumsums; __v is distinct within a group, so
    // the window order is total without a tie-break column
    val wIn = Window.partitionBy(col(groupCol), col("__shard"))
      .orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, -1)
    val cum = sharded
      .withColumn("__cpIn", coalesce(sum("__np").over(wIn), lit(0L)))
      .withColumn("__cnIn", coalesce(sum("__nn").over(wIn), lit(0L)))
      .join(broadcast(offsets), Seq(groupCol, "__shard"))
      .join(broadcast(totals), Seq(groupCol))
      .withColumn("__cpb", col("__offp") + col("__cpIn"))
      .withColumn("__cnb", col("__offn") + col("__cnIn"))
    // per-distinct-score contributions, exact: integer U2; decimal AP terms
    val tp = col("__gtp") - col("__cpb")           // positives at v >= s
    val fp = col("__gtn") - col("__cnb")           // negatives at v >= s
    val contrib = cum
      .withColumn("__u2", col("__np") * (lit(2L) * col("__cnb") + col("__nn")))
      .withColumn("__ap",
        round(col("__np") * tp / (tp + fp), 12).cast("decimal(38,12)"))
    contrib.groupBy(col(groupCol))
      .agg(
        (sum(col("__np")) + sum(col("__nn"))).as("n"),
        sum("__np").as("n_pos"),
        sum("__nn").as("n_neg"),
        round(sum("__u2").cast("double") /
          (lit(2.0) * first("__gtp") * first("__gtn")), 9).as("__auc"),
        round(sum("__ap").cast("double") / first("__gtp"), 9).as("__apv"))
      .withColumn("auc_roc",
        when(col("n_pos") > 0 && col("n_neg") > 0, col("__auc")))
      .withColumn("avg_precision", when(col("n_pos") > 0, col("__apv")))
      .drop("__auc", "__apv")
  }
}
