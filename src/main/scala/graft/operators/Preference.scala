package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{BoundedFrames, CacheScope}

/** Preference-data construction and fitting — the RLHF/DPO half of a
  * training-data pipeline: turn scored candidate completions into
  * chosen/rejected pairs, and fit Bradley–Terry strengths over the pairwise
  * outcomes (the standard "which source/model wins head-to-head" ranking).
  *
  * Scale shape: [[preferencePairs]] is one window over the prompt key
  * (candidate sets are small per prompt — skew-free by construction);
  * [[bradleyTerry]] folds the comparison stream ONCE into its
  * items²-bounded win matrix, localizes it (the
  * [[graft.core.BoundedFrames.localize]] model-frame contract), and runs
  * every MM iteration over local relations — the corpus-scaled work is the
  * single pass that built the comparisons.
  */
object Preference {

  /** Chosen/rejected pairs per prompt: the top-scored candidate (ties to
    * the smallest id — deterministic on any engine) is chosen against every
    * other candidate whose margin `chosen_score - score >= minMargin`.
    * Output: (promptCol, chosen_id, rejected_id, margin) plus any `carry`
    * columns taken from the REJECTED row (e.g. its source/model label).
    * One window, no self-pairs, prompts with a single candidate drop out. */
  def preferencePairs(cands: DataFrame, promptCol: String, idCol: String,
                      scoreCol: String, minMargin: Double = 0.0,
                      carry: Seq[String] = Nil,
                      carryChosen: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(promptCol)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val carryCols = carry.map(c => col(c))
    val chosenCols = carryChosen.map(c => col(s"chosen_$c"))
    val withChosen = carryChosen.foldLeft(
      cands
        .withColumn("__chosen_id", first(col(idCol)).over(w))
        .withColumn("__chosen_score", first(col(scoreCol)).over(w))) {
      (df, c) => df.withColumn(s"chosen_$c", first(col(c)).over(w))
    }
    withChosen
      .filter(col(idCol) =!= col("__chosen_id"))
      .withColumn("margin", col("__chosen_score") - col(scoreCol))
      .filter(col("margin") >= minMargin)
      .select(Seq(col(promptCol), col("__chosen_id").as("chosen_id"),
        col(idCol).as("rejected_id"), col("margin")) ++
        carryCols ++ chosenCols: _*)
  }

  /** Group-relative advantage normalization (the GRPO/RLOO reward shape):
    * each candidate's reward is z-scored WITHIN its prompt group,
    *
    *   advantage = (r - mean_prompt) / (std_prompt + eps),
    *
    * so a prompt whose candidates all score high contributes the same
    * gradient scale as a hard prompt — the normalization that makes
    * group-sampled RL rewards comparable across prompts. The mean folds as
    * a round-9 DECIMAL(38,9) sum and the variance as a round-12
    * DECIMAL(38,12) sum of raw squared deviations (order-free,
    * engine-exact — see the in-body note on the rounding lattice);
    * population variance (÷ n); single-candidate groups get advantage 0
    * (std 0, centered 0). Output: input columns + (mean_r, std_r,
    * advantage). One prompt-keyed partial agg + a broadcast-size join back. */
  def groupAdvantage(cands: DataFrame, promptCol: String, rewardCol: String,
                     eps: Double = 1e-6): DataFrame = {
    val r9 = round(col(rewardCol), 9).cast("decimal(38,9)")
    val stats = cands.groupBy(col(promptCol)).agg(
      (sum(r9).cast("double") / count(lit(1))).as("mean_r"),
      count(lit(1)).as("__n"))
    val withMean = cands.join(stats, Seq(promptCol))
    // square the RAW deviation and round at 12: rounding the deviation
    // first quantizes it to a 9-decimal lattice whose squares sit exactly
    // on .5 rounding boundaries, where engines' round() implementations
    // disagree in the last ulp (observed on 10/450 gate rows); the raw
    // product is off-lattice, so a 12-decimal round has no ties to break
    val dev2 = {
      val d = col(rewardCol) - col("mean_r")
      round(d * d, 12).cast("decimal(38,12)")
    }
    val varF = withMean.groupBy(col(promptCol)).agg(
      (sum(dev2).cast("double") / count(lit(1))).as("__var"))
    withMean.join(varF, Seq(promptCol))
      .withColumn("std_r", sqrt(col("__var")))
      .withColumn("advantage",
        round((col(rewardCol) - col("mean_r")) / (col("std_r") + lit(eps)), 9))
      .drop("__n", "__var")
  }

  /** Best-of-n rejection sampling (the RFT/RAFT curation shape): per
    * prompt, keep the single highest-reward candidate — ties to the
    * smallest id, deterministic on any engine — and only when it clears
    * the absolute floor `minScore` (a prompt whose best sample is still
    * bad contributes nothing; keeping it would distill failure modes).
    * Output: one row per surviving prompt with the winner's id/score plus
    * the group diagnostics SFT curation reports alongside the pick —
    * candidate count and group-mean reward (how selective the floor was).
    *
    * Scale shape: ONE prompt-keyed partial aggregation (max_by for the
    * winner, count/decimal-sum for the diagnostics) — no window, no join;
    * group state is O(1) per prompt. The mean folds as a round-9 DECIMAL
    * sum (order-free, engine-exact). */
  def bestOfN(cands: DataFrame, promptCol: String, idCol: String,
              scoreCol: String, minScore: Double,
              carry: Seq[String] = Nil): DataFrame = {
    val winner = struct(col(scoreCol).as("s"),
      (-col(idCol)).as("negId"))
    val r9 = round(col(scoreCol), 9).cast("decimal(38,9)")
    val aggs = Seq(
      max_by(col(idCol), winner).as("chosen_id"),
      max(col(scoreCol)).as("chosen_score"),
      count(lit(1)).as("n_cands"),
      // no round: the quotient of an exact decimal sum and an exact count
      // is ONE IEEE division — already engine-identical, and a round-9
      // would sit ties exactly on the sum's 1e-9/n quotient lattice
      (sum(r9).cast("double") / count(lit(1))).as("mean_score")) ++
      carry.map(c => max_by(col(c), winner).as(s"chosen_$c"))
    cands.groupBy(col(promptCol))
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("chosen_score") >= minScore)
  }

  /** DPO pair screen — the data-quality guards applied to chosen/rejected
    * pairs before preference training: drop NEAR-IDENTICAL pairs (token-set
    * jaccard >= `maxJaccard` — no learnable contrast) and LENGTH-SKEWED
    * pairs (longer/shorter token ratio > `maxLenRatio` — the model would
    * learn length, not quality). Expects the pair frame joined with both
    * sides' texts as `chosen_text` / `rejected_text`; emits the diagnostic
    * columns and a `keep` verdict, all scan-stage. */
  def screenPairs(pairs: DataFrame, maxJaccard: Double = 0.9,
                  maxLenRatio: Double = 3.0): DataFrame = {
    val ta = array_distinct(graft.functions.TextFunctions.tokens(col("chosen_text")))
    val tb = array_distinct(graft.functions.TextFunctions.tokens(col("rejected_text")))
    val inter = size(array_intersect(ta, tb))
    val uni = size(array_union(ta, tb))
    val la = size(graft.functions.TextFunctions.tokens(col("chosen_text")))
    val lb = size(graft.functions.TextFunctions.tokens(col("rejected_text")))
    pairs
      .withColumn("jaccard",
        when(uni > 0, inter.cast("double") / uni).otherwise(lit(1.0)))
      .withColumn("len_ratio",
        when(least(la, lb) > 0,
          greatest(la, lb).cast("double") / least(la, lb))
          .otherwise(lit(Double.MaxValue)))
      .withColumn("keep",
        col("jaccard") < maxJaccard && col("len_ratio") <= maxLenRatio)
  }

  /** Bradley–Terry strength fit over (winner, loser) comparison rows via
    * the classic MM update,
    *
    *   pi_i <- W_i / sum_j n_ij / (pi_i + pi_j),   normalized to sum 1,
    *
    * run for a FIXED `iters` with the engine's reproducibility discipline:
    * every division rounded to 9 decimals, every sum an exact
    * DECIMAL(38,9) fold, the normalizer a driver scalar (items-bounded,
    * like the HITS/PageRank norms) — so any SQL engine unrolling the same
    * iterations hashes bit-identically.
    *
    * `alpha` adds Laplace pseudo-counts to BOTH directions of every
    * observed pair (w'_ij = w_ij + alpha), keeping every met item's
    * strength positive even with a lopsided win matrix — without it a
    * never-winning item hits 0 and poisons later denominators.
    * Self-comparisons (winner == loser) are dropped. Output: (item,
    * strength), uniform start 1/|items|.
    *
    * `scope` is accepted for source compatibility but never pinned into:
    * after the one corpus fold, every table here (win matrix, strengths)
    * is an items-bounded LOCAL relation — nothing distributed survives the
    * call. */
  def bradleyTerry(comparisons: DataFrame, winnerCol: String, loserCol: String,
                   iters: Int = 3, alpha: Double = 1.0,
                   scope: CacheScope.Handle = CacheScope.detached): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val sym = comparisons
      .filter(col(winnerCol) =!= col(loserCol))
      .select(col(winnerCol).as("i"), col(loserCol).as("j"))
    // ONE corpus-scale pass: fold the comparison stream to its ordered
    // win-count matrix c(i, j) — bounded by distinct item PAIRS (items²,
    // the sources/models being ranked, not the corpus) — and localize it
    // (the [[graft.core.BoundedFrames.localize]] contract). Every MM
    // iteration below is then pure local-relation arithmetic: carried as
    // distributed lineage instead, each iteration re-paid persist+count
    // jobs and re-broadcast a frame the driver already held, and `wins`
    // re-ran the whole upstream pairs pipeline a second time.
    val cnt = BoundedFrames.localize(sym.groupBy("i", "j")
      .agg(count(lit(1)).cast("double").as("c")))
    // n_ij (total meetings, symmetric): each ordered (i, j) counts wins in
    // both roles; + 2*alpha smoothing. c values are exact integer doubles,
    // so sum("c") == the count the union-groupBy form produced.
    val nm = BoundedFrames.localize(
      cnt.unionByName(cnt.select(col("j").as("i"), col("i").as("j"), col("c")))
        .groupBy("i", "j")
        .agg((sum("c") + lit(2.0 * alpha)).as("n")))
    // W_i = observed wins + alpha per distinct opponent met
    val wins = cnt.groupBy("i").agg(sum("c").as("__w"))
    val deg = nm.groupBy("i").agg(count(lit(1)).cast("double").as("__deg"))
    val W = BoundedFrames.localize(deg.join(wins, Seq("i"), "left")
      .select(col("i"),
        (coalesce(col("__w"), lit(0.0)) + lit(alpha) * col("__deg")).as("W")))
    val nItems = W.count()
    var pi = W.select(col("i"), round(lit(1.0) / nItems, 9).as("s"))
    for (_ <- 1 to iters) {
      val terms = nm
        .join(pi.select(col("i").as("__ii"), col("s").as("__si")),
          nm("i") === col("__ii"))
        .join(pi.select(col("i").as("__jj"), col("s").as("__sj")),
          nm("j") === col("__jj"))
        .select(nm("i").as("i"),
          round(col("n") / (col("__si") + col("__sj")), 9)
            .cast("decimal(38,9)").as("t"))
      val denom = terms.groupBy("i").agg(sum("t").as("den"))
      val raw = BoundedFrames.localize(W.join(denom, Seq("i"))
        .select(col("i"), round(col("W") / col("den").cast("double"), 9).as("r")))
      val tot = raw.agg(sum(col("r").cast("decimal(38,9)"))).head.getDecimal(0)
      pi = BoundedFrames.localize(raw
        .select(col("i"), round(col("r") / lit(tot).cast("double"), 9).as("s")))
    }
    pi.select(col("i").as("item"), col("s").as("strength"))
  }
}
