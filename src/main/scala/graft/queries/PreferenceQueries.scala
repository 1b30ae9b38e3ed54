package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Parallelism, Tables}
import graft.functions.TextFunctions
import graft.operators.Preference

/** Preference-data gates over [[graft.operators.Preference]].
  *
  * Candidate sets are synthesized deterministically from `documents`:
  * prompt key `doc_id % 50` groups the corpus into 50 prompts with the
  * corpus-size-scaled candidate count per prompt, scored by the engine's
  * quality heuristic. [[Preference.preferencePairs]] turns each prompt's
  * top candidate into chosen/rejected rows; the pairs' (chosen source,
  * rejected source) outcomes feed the Bradley–Terry fit — "which source
  * wins head-to-head quality comparisons", the pairwise-rank view of the
  * corpus the per-source mean can't give (BT weighs who you beat, not how
  * often you win).
  */
object PreferenceQueries {

  private val NPrompts = 50
  private val MinMargin = 0.05
  private val BtIters = 3
  private val BtAlpha = 1.0

  private def docsP(s: SparkSession, d: String): DataFrame =
    Parallelism.fanOut(Tables.documents(s, d))

  /** Candidates scored by type-token ratio (lexical diversity): the
    * continuous score a preference margin needs — the corpus's rule-based
    * quality score steps in 0.2 increments and is nearly constant across
    * documents, which would leave the pair space empty. */
  private def candidates(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    docsP(s, d).select(
      (col("doc_id") % NPrompts).as("prompt"),
      col("doc_id").as("cand_id"),
      col("source"),
      when(size(toks) > 0,
        size(array_distinct(toks)).cast("double") / size(toks))
        .otherwise(lit(0.0)).as("quality"))
  }

  /** Candidate CTE (ends in `cand`), mirroring [[candidates]]. */
  private lazy val CandSql =
    s"""tq AS (SELECT doc_id, source, ${DocQueries.ToksSql} AS toks
       |  FROM documents),
       |cand AS (SELECT doc_id % $NPrompts AS prompt, doc_id AS cand_id,
       |  source,
       |  CASE WHEN len(toks) > 0
       |    THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
       |    ELSE CAST(0.0 AS DOUBLE) END AS quality
       |  FROM tq)""".stripMargin

  /** Chosen/rejected pair CTE (ends in `pairs`), mirroring
    * [[Preference.preferencePairs]] incl. the (score DESC, id ASC)
    * deterministic tie-break. */
  private lazy val PairsSql =
    s"""$CandSql,
       |pr AS (SELECT prompt, cand_id, source, quality,
       |  first_value(cand_id) OVER wx AS chosen_id,
       |  first_value(quality) OVER wx AS chosen_q,
       |  first_value(source) OVER wx AS chosen_source
       |  FROM cand
       |  WINDOW wx AS (PARTITION BY prompt ORDER BY quality DESC, cand_id ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |pairs AS (SELECT prompt, chosen_id, cand_id AS rejected_id,
       |  chosen_q - quality AS margin, source, chosen_source
       |  FROM pr WHERE cand_id <> chosen_id
       |    AND chosen_q - quality >= CAST($MinMargin AS DOUBLE))""".stripMargin

  /** Unrolled Bradley–Terry MM iterations over a `pairs` CTE exposing
    * (chosen_source, source) outcomes — mirrors [[Preference.bradleyTerry]]
    * arithmetic exactly (9-decimal rounds, DECIMAL(38,9) folds). */
  private def btCtes(iters: Int, alpha: Double): String = {
    def iter(k: Int): String =
      s"""t$k AS (SELECT nm.i,
         |  sum(CAST(round(nm.n / (bi.s + bj.s), 9) AS DECIMAL(38,9))) AS den
         |  FROM nm JOIN b${k - 1} bi ON bi.i = nm.i
         |    JOIN b${k - 1} bj ON bj.i = nm.j GROUP BY 1),
         |r$k AS (SELECT wt.i, round(wt.W / CAST(den AS DOUBLE), 9) AS r
         |  FROM wt JOIN t$k ON t$k.i = wt.i),
         |s$k AS (SELECT sum(CAST(r AS DECIMAL(38,9))) AS tot FROM r$k),
         |b$k AS (SELECT i, round(r / CAST(tot AS DOUBLE), 9) AS s
         |  FROM r$k CROSS JOIN s$k)""".stripMargin
    s"""sym AS (SELECT chosen_source AS i, source AS j FROM pairs
       |  WHERE chosen_source <> source),
       |nm AS (SELECT i, j,
       |  CAST(count(*) AS DOUBLE) + CAST(${2.0 * alpha} AS DOUBLE) AS n
       |  FROM (SELECT i, j FROM sym UNION ALL SELECT j AS i, i AS j FROM sym)
       |  GROUP BY 1, 2),
       |wv AS (SELECT i, CAST(count(*) AS DOUBLE) AS w_obs FROM sym GROUP BY 1),
       |dg AS (SELECT i, CAST(count(*) AS DOUBLE) AS deg FROM nm GROUP BY 1),
       |wt AS (SELECT dg.i,
       |  coalesce(w_obs, CAST(0.0 AS DOUBLE)) + CAST($alpha AS DOUBLE) * deg AS W
       |  FROM dg LEFT JOIN wv ON wv.i = dg.i),
       |ni AS (SELECT count(*) AS n_items FROM wt),
       |b0 AS (SELECT i, round(CAST(1.0 AS DOUBLE) / n_items, 9) AS s
       |  FROM wt CROSS JOIN ni),
       |${(1 to iters).map(iter).mkString(",\n")}""".stripMargin
  }

  val all: Seq[(String, Q)] = Seq(

    // ---- chosen/rejected preference pairs: top candidate per prompt vs
    //      every candidate at least MinMargin below it
    "q_pref_pairs" -> Q(
      (s, d) => Preference.preferencePairs(candidates(s, d),
          "prompt", "cand_id", "quality", minMargin = MinMargin,
          carry = Seq("source"), carryChosen = Seq("source"))
        .orderBy("prompt", "rejected_id"),
      Some(s"""WITH $PairsSql
        |SELECT prompt, chosen_id, rejected_id, margin, source, chosen_source
        |FROM pairs ORDER BY prompt, rejected_id""".stripMargin)),

    // ---- GRPO-style group-relative advantages: per-prompt z-scored
    //      rewards (decimal mean/variance folds, population variance,
    //      eps guard) — the normalization that makes
    //      group-sampled RL rewards comparable across prompts
    "q_pref_grpo_advantage" -> Q(
      (s, d) => Preference.groupAdvantage(candidates(s, d), "prompt", "quality")
        .orderBy("prompt", "cand_id"),
      Some(s"""WITH $CandSql,
        |st AS (SELECT prompt,
        |  CAST(sum(CAST(round(quality, 9) AS DECIMAL(38,9))) AS DOUBLE)
        |    / count(*) AS mean_r
        |  FROM cand GROUP BY 1),
        |wm AS (SELECT cand.*, mean_r FROM cand JOIN st USING (prompt)),
        |vr AS (SELECT prompt,
        |  CAST(sum(CAST(round((quality - mean_r) * (quality - mean_r), 12)
        |    AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS v
        |  FROM wm GROUP BY 1)
        |SELECT wm.prompt, cand_id, source, quality, mean_r,
        |  sqrt(v) AS std_r,
        |  round((quality - mean_r) / (sqrt(v) + CAST(1e-6 AS DOUBLE)), 9)
        |    AS advantage
        |FROM wm JOIN vr ON vr.prompt = wm.prompt
        |ORDER BY wm.prompt, cand_id""".stripMargin)),

    // ---- DPO pair screen: drop near-identical pairs (token-set jaccard
    //      >= 0.9 — no learnable contrast; the corpus's exact-dup pairs
    //      land here) and length-skewed pairs (ratio > 3 — the model would
    //      learn length, not quality)
    "q_pref_screen" -> Q(
      (s, d) => {
        val docs = docsP(s, d).select(col("doc_id"), col("text"))
        val pairs = Preference.preferencePairs(candidates(s, d),
          "prompt", "cand_id", "quality", minMargin = MinMargin,
          carry = Seq("source"), carryChosen = Seq("source"))
        val withTexts = pairs
          .join(docs.select(col("doc_id").as("chosen_id"),
            col("text").as("chosen_text")), Seq("chosen_id"))
          .join(docs.select(col("doc_id").as("rejected_id"),
            col("text").as("rejected_text")), Seq("rejected_id"))
        Preference.screenPairs(withTexts)
          .select("prompt", "chosen_id", "rejected_id", "jaccard",
            "len_ratio", "keep")
          .orderBy("prompt", "rejected_id")
      },
      Some(s"""WITH $PairsSql,
        |ct AS (SELECT doc_id, ${DocQueries.ToksSql} AS tk FROM documents),
        |j AS (SELECT p.prompt, p.chosen_id, p.rejected_id,
        |  list_distinct(a.tk) AS ta, list_distinct(b.tk) AS tb,
        |  len(a.tk) AS la, len(b.tk) AS lb
        |  FROM pairs p JOIN ct a ON a.doc_id = p.chosen_id
        |  JOIN ct b ON b.doc_id = p.rejected_id),
        |m AS (SELECT prompt, chosen_id, rejected_id, la, lb,
        |  len(list_filter(ta, t -> list_contains(tb, t))) AS inter,
        |  len(ta) + len(tb) - len(list_filter(ta, t -> list_contains(tb, t)))
        |    AS uni
        |  FROM j),
        |sc AS (SELECT prompt, chosen_id, rejected_id,
        |  CASE WHEN uni > 0 THEN CAST(inter AS DOUBLE) / uni
        |    ELSE CAST(1.0 AS DOUBLE) END AS jaccard,
        |  CASE WHEN least(la, lb) > 0
        |    THEN CAST(greatest(la, lb) AS DOUBLE) / least(la, lb)
        |    ELSE CAST(1.7976931348623157e308 AS DOUBLE) END AS len_ratio
        |  FROM m)
        |SELECT prompt, chosen_id, rejected_id, jaccard, len_ratio,
        |  (jaccard < CAST(0.9 AS DOUBLE) AND len_ratio <= CAST(3.0 AS DOUBLE))
        |    AS keep
        |FROM sc ORDER BY prompt, rejected_id""".stripMargin)),

    // ---- Best-of-n rejection sampling (RFT/RAFT): per prompt keep the
    //      top-reward candidate when it clears the absolute floor; group
    //      diagnostics ride along. One partial agg, no window.
    "q_pref_best_of_n" -> Q(
      (s, d) => Preference.bestOfN(candidates(s, d),
          "prompt", "cand_id", "quality", minScore = 0.7,
          carry = Seq("source"))
        .orderBy("prompt"),
      Some(s"""WITH $CandSql,
        |w AS (SELECT prompt, cand_id, source, quality,
        |  first_value(cand_id) OVER wx AS chosen_id,
        |  first_value(quality) OVER wx AS chosen_score,
        |  first_value(source) OVER wx AS chosen_source
        |  FROM cand
        |  WINDOW wx AS (PARTITION BY prompt ORDER BY quality DESC, cand_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |g AS (SELECT prompt, max(chosen_id) AS chosen_id,
        |  max(chosen_score) AS chosen_score,
        |  CAST(count(*) AS BIGINT) AS n_cands,
        |  CAST(sum(CAST(round(quality, 9) AS DECIMAL(38,9))) AS DOUBLE)
        |    / count(*) AS mean_score,
        |  max(chosen_source) AS chosen_source
        |  FROM w GROUP BY 1)
        |SELECT prompt, chosen_id, chosen_score, n_cands, mean_score,
        |  chosen_source
        |FROM g WHERE chosen_score >= CAST(0.7 AS DOUBLE)
        |ORDER BY prompt""".stripMargin)),

    // ---- Bradley–Terry source strengths over the pair outcomes
    "q_pref_bradley_terry" -> Q(
      (s, d) => {
        val pairs = Preference.preferencePairs(candidates(s, d),
          "prompt", "cand_id", "quality", minMargin = MinMargin,
          carry = Seq("source"), carryChosen = Seq("source"))
        Preference.bradleyTerry(pairs, "chosen_source", "source",
            iters = BtIters, alpha = BtAlpha)
          .orderBy("item")
      },
      Some(s"""WITH $PairsSql,
        |${btCtes(BtIters, BtAlpha)}
        |SELECT i AS item, s AS strength FROM b$BtIters ORDER BY item""".stripMargin))
  )
}
