package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Parallelism
import graft.functions.TextFunctions

/** Data Selection via Importance Resampling (DSIR — Xie et al. 2023):
  * re-weight a raw web corpus toward a small TARGET corpus using hashed
  * n-gram features, then sample by importance weight. The published recipe
  * for "make the pretraining mixture look like Wikipedia/books without a
  * trained classifier".
  *
  * Model: both corpora are reduced to token-hash-bucket distributions
  * (`buckets` cells, add-one smoothed). A document's log importance weight
  * is the sum over its tokens of `ln(p_target(bucket) / p_raw(bucket))` —
  * a bag-of-hashed-unigrams likelihood ratio. Sampling uses the Gumbel
  * top-k trick (argmax of `logw + Gumbel` ~ sampling without replacement
  * proportional to `w`) with DETERMINISTIC hash-derived Gumbel noise, so
  * the selection is reproducible and oracle-checkable.
  *
  * Scale design: the model is one `buckets`-row frame (two groupBy-count
  * aggregations, map-side combined; `buckets` is a few thousand — always
  * broadcastable). Scoring explodes tokens once in the scan stage, joins
  * the broadcast model, and aggregates per doc (one shuffle). Selection is
  * a distributed top-k (TakeOrdered — per-partition pruning; only k rows
  * reach the driver). Nothing corpus-sized is ever collected or shuffled
  * beyond the per-doc aggregation.
  *
  * Oracle parity: per-token log-ratios are rounded to 9 decimals ONCE in
  * the bucket model and summed as decimal(28,9) per document — exact,
  * commutative addition, so results are partition-order independent and
  * bit-mirrorable (see [[LanguageModel]] for the ln cross-engine note).
  */
object Importance {

  /** 2^60 as an exact double — the fp60 hash range. */
  private val Fp60Range = 1152921504606846976.0d

  /** Token-hash-bucket feature: fp60(token || salt) mod buckets. */
  def tokenBucket(tok: Column, buckets: Int, salt: String): Column =
    pmod(Dedup.tokenFp60(concat(tok, lit(salt))), lit(buckets.toLong))

  /** (doc_id, b) — one row per token occurrence with its feature bucket. */
  private def tokenBuckets(docs: DataFrame, idCol: String, textCol: String,
                           buckets: Int, salt: String): DataFrame =
    // fanOut the raw text, tokenize after the exchange: expressions in the
    // pre-repartition projection run in the (often single-task) scan stage
    Parallelism.fanOut(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"), tokenBucket(col("tok"), buckets, salt).as("b"))

  /** The bucket log-likelihood-ratio model: (b, lr) where
    * `lr = round(ln( ((ct+1)/(Nt+B)) / ((cr+1)/(Nr+B)) ), 9)` as
    * decimal(28,9). Buckets covering the RAW corpus are all present (the
    * raw side spans every scorable token), so scoring can inner-join. */
  def bucketModel(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, buckets: Int, salt: String): DataFrame = {
    val bt = tokenBuckets(target, idCol, textCol, buckets, salt)
      .groupBy("b").agg(count(lit(1)).as("ct"))
    val br = tokenBuckets(raw, idCol, textCol, buckets, salt)
      .groupBy("b").agg(count(lit(1)).as("cr"))
    // two single-row metadata aggregates (the model is train-once)
    val nt = Option(bt.agg(sum("ct")).head.get(0)).fold(0L)(_.asInstanceOf[Long])
    val nr = Option(br.agg(sum("cr")).head.get(0)).fold(0L)(_.asInstanceOf[Long])
    val pT = (coalesce(col("ct"), lit(0L)).cast("double") + lit(1.0)) /
      lit((nt + buckets).toDouble)
    val pR = (coalesce(col("cr"), lit(0L)).cast("double") + lit(1.0)) /
      lit((nr + buckets).toDouble)
    // buckets-bounded model: localized so every broadcast is flat instead
    // of re-running both corpus tokenizations (BoundedFrames.localize)
    graft.core.BoundedFrames.localize(br.join(bt, Seq("b"), "left")
      .select(col("b"), round(log(pT / pR), 9).cast("decimal(28,9)").as("lr")))
  }

  /** Per-document log importance weight under the hashed-unigram model:
    * (doc_id, n_tokens, logw). Zero-token docs produce no row. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, docs: DataFrame = null,
                        buckets: Int = 4096, salt: String = ":ds1"): DataFrame = {
    val scoreDocs = Option(docs).getOrElse(raw)
    val m = broadcast(bucketModel(raw, target, idCol, textCol, buckets, salt))
    tokenBuckets(scoreDocs, idCol, textCol, buckets, salt)
      .join(m, Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lr").as("slw"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("slw").cast("double"), 6).as("logw"),
        col("slw"))
  }

  /** Deterministic standard-Gumbel noise from the doc id: u = (fp60 + 0.5)
    * / 2^60 is uniform on (0,1), g = -ln(-ln(u)). */
  private def gumbel(id: Column, salt: String): Column = {
    val u = (Dedup.tokenFp60(concat(id.cast("string"), lit(salt)))
      .cast("double") + lit(0.5)) / lit(Fp60Range)
    -log(-log(u))
  }

  /** Gumbel top-k importance resampling: keep the `k` documents maximizing
    * `logw + Gumbel(doc)` — a without-replacement sample proportional to
    * the importance weights, derandomized through the hash so any engine
    * reproduces the exact selection. Output (doc_id, n_tokens, logw, score)
    * in selection order. */
  def resampleTopK(raw: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, k: Int, buckets: Int = 4096,
                   salt: String = ":ds1", gumbelSalt: String = ":dsg1"): DataFrame =
    importanceWeights(raw, target, idCol, textCol, buckets = buckets, salt = salt)
      .select(col("doc_id"), col("n_tokens"), col("logw"),
        round(col("slw").cast("double") +
          gumbel(col("doc_id"), gumbelSalt), 6).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
}
