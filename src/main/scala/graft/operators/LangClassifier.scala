package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED language identification: a multiclass (one-vs-all-in-one)
  * multinomial Naive Bayes over the SHARED hashed-token feature fold — the
  * fastText-style supervised lang-id tier above
  * [[graft.functions.TextFunctions.langId]]'s fixed marker heuristic. The
  * published pretraining pipelines (CCNet, fastText lang-id) train exactly
  * this shape: per-language token distributions from a labeled split, then
  * an argmax posterior per document.
  *
  * Model: per language ℓ, add-one-smoothed bucket likelihoods
  * `llk(ℓ,b) = ln((c(ℓ,b)+1)/(t(ℓ)+B))` over [[QualityClassifier.tokenFold]]
  * buckets, a default `ln(1/(t(ℓ)+B))` for unseen buckets, and a
  * Laplace-smoothed doc-count prior `ln((n(ℓ)+1)/(N+K))`. A document's
  * posterior for ℓ is the prior plus the cnt-weighted bucket sum; the
  * prediction is the argmax with ties broken to the LEXICOGRAPHICALLY
  * SMALLEST language (deterministic on both engines).
  *
  * Scale design: the model is ONE buckets-bounded WIDE frame (one llk
  * column per language — the label alphabet is the bound, ≤ a few hundred
  * for lang-id), broadcast to scoring; a doc's K scores are K decimal sum
  * aggregates in the SAME groupBy pass (no row blowup by K — the long
  * (b, lang) form would explode every token edge K ways). Per-language
  * totals and doc counts are label-alphabet-bounded collects (the
  * documented bounded-frame convention). Scoring pays one shuffle (the
  * per-doc groupBy); the argmax is a scan-stage struct max.
  *
  * Oracle parity: the [[QualityClassifier]] decimal discipline — per-bucket
  * llk rounds to 9 decimals ONCE into decimal(19,9) so the llk×cnt product
  * is (30,9)-exact, per-doc sums are order-independent decimal, the argmax
  * compares decimals exactly, and only the reported score rounds to 6 as a
  * double. */
object LangClassifier {

  /** Trained model: the buckets-bounded wide llk frame (column `llk_i` =
    * language `langs(i)`), per-language default/prior decimal constants,
    * and the fold contract it was built under. */
  case class LangNbModel(wide: DataFrame, langs: Seq[String],
                         defaults: Seq[Column], priors: Seq[Column],
                         buckets: Int, salt: String)

  private def dec919(c: Column): Column = round(c, 9).cast("decimal(19,9)")

  /** Train from a shared [[QualityClassifier.tokenFold]] frame plus a
    * (doc_id, lang) label frame. The label alphabet (distinct langs, with
    * token totals and doc counts) is collected — bounded by the number of
    * LANGUAGES, not the corpus. Languages are sorted so column order,
    * tie-breaks, and reloads are deterministic. */
  def trainLangNb(fold: DataFrame, labels: DataFrame, buckets: Int = 4096,
                  salt: String = ":bk1"): LangNbModel = {
    QualityClassifier.assertFoldMatches(fold, buckets, salt, "trainLangNb")
    val joined = fold.join(labels.select(col("doc_id"), col("lang")),
      Seq("doc_id"))
    val counts = joined.groupBy("b", "lang").agg(sum("cnt").as("c"))
    // label-alphabet-bounded collects: token mass + doc count per language
    val tokTotals: Map[String, Long] = counts.groupBy("lang")
      .agg(sum("c").as("t")).collect()
      .map(r => r.getString(0) ->
        r.getAs[java.math.BigDecimal]("t").longValueExact()).toMap
    val docCounts: Map[String, Long] = labels.groupBy("lang")
      .agg(count(lit(1)).as("nd")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val langs = docCounts.keys.toSeq.sorted
    val nDocs = docCounts.values.sum
    val k = langs.length
    require(k > 0, "trainLangNb needs at least one labeled language")
    val wide = counts.groupBy("b").pivot("lang", langs).agg(first("c"))
    val llkCols = langs.zipWithIndex.map { case (l, i) =>
      val denom = lit((tokTotals.getOrElse(l, 0L) + buckets).toDouble)
      dec919(log((coalesce(col(s"`$l`"), lit(0).cast("decimal(20,0)"))
        .cast("double") + lit(1.0)) / denom)).as(s"llk_$i")
    }
    LangNbModel(
      wide.select(col("b") +: llkCols: _*),
      langs,
      defaults = langs.map { l =>
        dec919(log(lit(1.0) /
          lit((tokTotals.getOrElse(l, 0L) + buckets).toDouble)))
      },
      priors = langs.map { l =>
        dec919(log(lit((docCounts(l) + 1).toDouble) /
          lit((nDocs + k).toDouble)))
      },
      buckets, salt)
  }

  /** Score every document: (doc_id, n_tokens, lang_pred, score). One
    * broadcast of the wide model, one groupBy shuffle carrying all K
    * decimal sums, a scan-stage struct-argmax. Token-less documents
    * (absent from the fold) score the priors alone — every input row gets
    * a prediction, which is what a routing stage needs. */
  def scoreLang(docs: DataFrame, idCol: String, fold: DataFrame,
                m: LangNbModel): DataFrame = {
    QualityClassifier.assertFoldMatches(fold, m.buckets, m.salt, "scoreLang")
    val sums = m.langs.indices.map { i =>
      sum(coalesce(col(s"llk_$i"), m.defaults(i)).cast("decimal(19,9)") *
        col("cnt")).as(s"s_$i")
    }
    val perDoc = fold
      .join(broadcast(m.wide), Seq("b"), "left")
      .groupBy("doc_id")
      .agg(sum("cnt").cast("long").as("n_tokens"), sums: _*)
    // struct max = argmax with deterministic ties: equal scores fall to
    // the largest -i, i.e. the lexicographically smallest language
    val entries = m.langs.indices.map { i =>
      struct(
        (coalesce(col(s"s_$i").cast("decimal(28,9)"),
          lit(0).cast("decimal(28,9)")) +
          m.priors(i).cast("decimal(28,9)")).as("s"),
        lit(-i).as("ni"))
    }
    val langArr = array(m.langs.map(lit): _*)
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc.hint("shuffle_hash"), Seq("doc_id"), "left")
      .withColumn("__best", array_max(array(entries: _*)))
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        element_at(langArr, -col("__best.ni") + 1).as("lang_pred"),
        round(col("__best.s"), 6).cast("double").as("score"))
  }
}
