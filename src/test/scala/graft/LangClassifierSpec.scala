package graft

import org.apache.spark.sql.functions._

import graft.operators.{LangClassifier, QualityClassifier}

/** Trained multiclass NB lang-id: hand-checkable separation, prior-only
  * prediction for token-less docs, deterministic tie-breaking, and the
  * fold-provenance fail-fast. */
class LangClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "der hund und die katze und der vogel", "de"),
    (2L, "die sonne und der mond", "de"),
    (3L, "the dog and the cat and the bird", "en"),
    (4L, "the sun and the moon", "en"),
    (5L, "el perro y el gato y el sol", "es"),
    (6L, "la luna y el cielo", "es")).toDF("doc_id", "text", "lang")

  private def foldOf(df: org.apache.spark.sql.DataFrame) =
    QualityClassifier.tokenFold(df, "doc_id", "text", buckets = 4096,
      salt = ":lit")

  test("separable vocabularies classify correctly; langs sorted") {
    val fold = foldOf(docs)
    val m = LangClassifier.trainLangNb(fold, docs.select("doc_id", "lang"),
      buckets = 4096, salt = ":lit")
    assert(m.langs == Seq("de", "en", "es"))
    val test = Seq((10L, "der hund und die sonne"),
      (11L, "the cat and the moon"), (12L, "el gato y la luna"))
      .toDF("doc_id", "text")
    val got = LangClassifier.scoreLang(test, "doc_id", foldOf(test), m)
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[String]("lang_pred")).toSeq ==
      Seq("de", "en", "es"))
    assert(got.forall(_.getAs[Long]("n_tokens") > 0))
  }

  test("token-less doc predicts the prior argmax") {
    val skewed = docs.union(Seq(
      (7L, "the a b c", "en"), (8L, "the d e f", "en")).toDF())
    val fold = foldOf(skewed)
    val m = LangClassifier.trainLangNb(fold,
      skewed.select("doc_id", "lang"), buckets = 4096, salt = ":lit")
    val test = Seq((20L, "")).toDF("doc_id", "text")
    val got = LangClassifier.scoreLang(test, "doc_id", foldOf(test), m)
      .collect()
    assert(got.length == 1)
    // en has 4 docs vs 2/2: the largest prior wins with no tokens
    assert(got(0).getAs[String]("lang_pred") == "en")
    assert(got(0).getAs[Long]("n_tokens") == 0L)
  }

  test("exact score ties break to the lexicographically smallest language") {
    // two languages with MIRRORED single-doc corpora: a test doc with one
    // token unseen in both trains scores default+prior identically
    val train = Seq((1L, "aa bb", "xx"), (2L, "aa bb", "yy"))
      .toDF("doc_id", "text", "lang")
    val m = LangClassifier.trainLangNb(foldOf(train),
      train.select("doc_id", "lang"), buckets = 4096, salt = ":lit")
    val test = Seq((3L, "zz")).toDF("doc_id", "text")
    val got = LangClassifier.scoreLang(test, "doc_id", foldOf(test), m)
      .collect()
    assert(got(0).getAs[String]("lang_pred") == "xx")
  }

  test("scoreLang's SCORING path pays exactly two doc_id exchanges") {
    val fold = foldOf(docs)
    val m = LangClassifier.trainLangNb(fold, docs.select("doc_id", "lang"),
      buckets = 4096, salt = ":lit")
    val plan = LangClassifier.scoreLang(docs.select("doc_id"), "doc_id",
      fold, m).queryExecution.executedPlan.toString
    // the SCORING path partitions on doc_id alone: (1) the per-doc
    // groupBy over the fold, (2) the docs side of the final join (the
    // perDoc side reuses the groupBy partitioning). The fold build's
    // (doc_id, b) and the one-time model lineage's (b[, lang]) exchanges
    // are composite/other keys — excluded by the single-key pattern. The
    // K per-language scores add NO exchanges because they are K agg
    // columns in the one groupBy pass, not a K-way row blowup.
    val nDocShuffles =
      """Exchange hashpartitioning\(doc_id#\d+L?, \d+\)""".r
        .findAllIn(plan).length
    assert(nDocShuffles == 2,
      s"expected 2 doc_id-only exchanges in scoreLang, got $nDocShuffles:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastHashJoin"), s"model must broadcast:\n$plan")
  }

  test("fold built under a different salt fails fast") {
    val wrong = QualityClassifier.tokenFold(docs, "doc_id", "text",
      buckets = 4096, salt = ":other")
    val e = intercept[IllegalArgumentException] {
      LangClassifier.trainLangNb(wrong, docs.select("doc_id", "lang"),
        buckets = 4096, salt = ":lit")
    }
    assert(e.getMessage.contains("feature space"))
  }

  test("char 3-5-grams separate same-script morphology the token model cannot") {
    // Two same-script "languages" distinguished ONLY by suffix morphology
    // (-ção/-ções vs -ción/-ciones). Held-out docs use UNSEEN words with
    // the same morphology: every test token is OOV to the token-unigram
    // model, so all its per-token scores collapse to the per-language
    // default llk — with training token mass and doc counts balanced, the
    // two languages tie exactly and the tie-break sends EVERY doc to the
    // lexicographically smaller label (half wrong). The char-gram model
    // has seen the suffix subwords in training and separates both.
    val train = Seq(
      (1L, "informação nação atenção", "pt"),
      (2L, "situações condições posições", "pt"),
      (3L, "información nación atención", "es"),
      (4L, "situaciones condiciones posiciones", "es"))
      .toDF("doc_id", "text", "lang")
    val test = Seq(
      (10L, "educação operações"),
      (11L, "educación operaciones")).toDF("doc_id", "text")
    val labels = train.select("doc_id", "lang")

    val tokM = LangClassifier.trainLangNb(
      QualityClassifier.tokenFold(train, "doc_id", "text", 4096, ":sep"),
      labels, 4096, ":sep")
    val tokPred = LangClassifier.scoreLang(test, "doc_id",
        QualityClassifier.tokenFold(test, "doc_id", "text", 4096, ":sep"),
        tokM)
      .orderBy("doc_id").collect().map(_.getAs[String]("lang_pred")).toSeq
    // every test token is unseen -> exact score tie -> both fall to 'es'
    assert(tokPred == Seq("es", "es"),
      s"token-unigram model should collapse on OOV morphology, got $tokPred")

    val chM = LangClassifier.trainLangNb(
      QualityClassifier.charGramFold(train, "doc_id", "text", 4096, ":sepc"),
      labels, 4096, ":sepc")
    val chPred = LangClassifier.scoreLang(test, "doc_id",
        QualityClassifier.charGramFold(test, "doc_id", "text", 4096, ":sepc"),
        chM)
      .orderBy("doc_id").collect().map(_.getAs[String]("lang_pred")).toSeq
    assert(chPred == Seq("pt", "es"),
      s"char-gram model should separate the morphology, got $chPred")
  }

  test("charGramFold emits fastText-style boundary-marked occurrence counts") {
    // "ab cd" -> tokens <ab>, <cd>: each contributes 3-grams {<ab, ab>} /
    // {<cd, cd>} and 4-gram {<ab>} / {<cd>}; maxN=5 adds nothing at len 4.
    // 'ab ab' doubles the <ab> counts — occurrences, not distinct grams.
    val df = Seq((1L, "ab cd"), (2L, "ab ab")).toDF("doc_id", "text")
    val fold = QualityClassifier.charGramFold(df, "doc_id", "text",
      buckets = 1 << 20, salt = ":cg")
    val tot = fold.groupBy("doc_id")
      .agg(sum(col("cnt")).cast("long").as("n"))
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(tot == Seq(6L, 6L), s"3 grams per 4-char token, got $tot")
    // doc 2's buckets are doc 1's <ab> buckets with cnt 2
    val d2 = fold.filter(col("doc_id") === 2L)
      .select("b", "cnt").collect()
      .map(r => (r.getAs[Number]("b").longValue,
        r.getAs[java.math.BigDecimal]("cnt").longValueExact())).toMap
    assert(d2.values.toSet == Set(2L), s"expected doubled counts, got $d2")
    assert(d2.size == 3)
  }
}
