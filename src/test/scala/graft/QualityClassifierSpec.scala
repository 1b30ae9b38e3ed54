package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

/** Naive-Bayes quality filter: hand-computed model on a tiny labeled split,
  * the prior-only verdict for token-less docs, and the separation property
  * (docs made of good-class tokens keep, bad-class tokens drop). */
class QualityClassifierSpec extends SparkSpec {

  private val B = 64

  private def df(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hand-computed two-token model scores exactly") {
    val pos = df(Seq((1L, "good good"), (2L, "good fine")))
    val neg = df(Seq((3L, "bad bad bad")))
    val m = QualityClassifier.train(pos, neg, "doc_id", "text", buckets = B)
    // class-conditional token totals: np = 4, nn = 3
    val scored = QualityClassifier.score(df(Seq((10L, "good"), (11L, "bad"))),
      "doc_id", "text", m).orderBy("doc_id").collect()
    val prior = BigDecimal(math.log(3.0 / 2.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    // p(good|pos) = (3+1)/(4+64); p(good|neg) = (0+1)/(3+64)
    val llrGood = BigDecimal(math.log((4.0 / 68.0) / (1.0 / 67.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val llrBad = BigDecimal(math.log((1.0 / 68.0) / (4.0 / 67.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expGood = (llrGood + prior).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expBad = (llrBad + prior).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scored(0).getAs[Double]("log_odds") === expGood)
    assert(scored(0).getAs[Boolean]("keep"))
    assert(scored(1).getAs[Double]("log_odds") === expBad)
    assert(!scored(1).getAs[Boolean]("keep"))
  }

  test("token-less documents get the prior-only verdict") {
    val pos = df(Seq((1L, "alpha beta")))
    val neg = df(Seq((2L, "gamma"), (3L, "delta")))
    val m = QualityClassifier.train(pos, neg, "doc_id", "text", buckets = B)
    val r = QualityClassifier.score(df(Seq((9L, "   "))), "doc_id", "text", m)
      .collect().head
    assert(r.getAs[Long]("n_tokens") === 0L)
    // prior = ln((1+1)/(2+1)) < 0 → drop
    val prior = BigDecimal(math.log(2.0 / 3.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    assert(r.getAs[Double]("log_odds") ===
      prior.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("classifier separates class-pure documents on a generated split") {
    val goodWords = Seq("clear", "prose", "reads", "well", "structured")
    val badWords = Seq("zzspam", "xxjunk", "qqnoise", "vvgarbled", "kkrandom")
    val pos = df((0 until 20).map(i =>
      (i.toLong, (0 until 8).map(j => goodWords((i + j) % 5)).mkString(" "))))
    val neg = df((0 until 20).map(i =>
      (100L + i, (0 until 8).map(j => badWords((i + j) % 5)).mkString(" "))))
    val m = QualityClassifier.train(pos, neg, "doc_id", "text", buckets = 1024)
    val probe = df(Seq((500L, "prose reads well"), (501L, "xxjunk qqnoise kkrandom")))
    val r = QualityClassifier.score(probe, "doc_id", "text", m)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Boolean]("keep"), "good-token doc dropped")
    assert(!r(1).getAs[Boolean]("keep"), "bad-token doc kept")
  }

  test("persisted model scores bit-identically to the in-memory one") {
    val pos = df(Seq((1L, "good clean prose here"), (2L, "clean good text")))
    val neg = df(Seq((3L, "spam spam buy now"), (4L, "buy spam click")))
    val m = QualityClassifier.train(pos, neg, "doc_id", "text", buckets = B)
    val dir = java.nio.file.Files.createTempDirectory("nb").toString + "/m"
    QualityClassifier.save(m, dir)
    val docs = df(Seq((10L, "good clean buy"), (11L, "spam click now"), (12L, "")))
    def scored(model: QualityClassifier.NbModel) =
      QualityClassifier.score(docs, "doc_id", "text", model)
        .collect().map(r => (r.getLong(0), r.getAs[Double]("log_odds"),
          r.getAs[Boolean]("keep"))).toSet
    assert(scored(m) == scored(QualityClassifier.load(spark, dir)))
  }
}
