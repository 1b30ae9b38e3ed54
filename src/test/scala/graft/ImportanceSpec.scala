package graft

import org.apache.spark.sql.functions._

import graft.operators.Importance

/** DSIR hashed-unigram importance weighting. */
class ImportanceSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "clean"),
      (2L, "the quick brown fox likes the quiet brown dog", "clean"),
      (3L, "zzz qqq xxx vvv kkk jjj www ggg hhh nnn", "junk"),
      (4L, "the brown fox and the brown dog", "web"),
      (5L, "qqq zzz vvv xxx kkk nnn hhh ggg www jjj", "web")
    ).toDF("doc_id", "text", "source")
  }

  test("weights rank target-like docs above disjoint-vocab docs") {
    val raw = corpus
    val target = corpus.filter(col("source") === "clean")
    val w = Importance.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 4 shares the target's vocabulary; doc 5 is the junk vocabulary
    assert(w(4L) > w(5L), s"expected target-like > junk-like: $w")
    assert(w(1L) > w(3L))
  }

  test("resampleTopK is deterministic, k-bounded, and favors high weights") {
    val raw = corpus
    val target = corpus.filter(col("source") === "clean")
    val a = Importance.resampleTopK(raw, target, "doc_id", "text", k = 3)
      .collect().map(_.getLong(0)).toSeq
    val b = Importance.resampleTopK(raw, target, "doc_id", "text", k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "hash-derandomized selection must be reproducible")
    assert(a.size == 3)
    // the two pure-junk docs cannot BOTH beat every clean/web doc: with
    // weights this far apart the Gumbel noise (scale ~1) cannot promote
    // logw gaps of several units
    assert(!(a.contains(3L) && a.contains(5L)), s"junk docs dominated: $a")
  }

  test("scoring docs defaults to the raw corpus; zero-token docs drop") {
    import spark.implicits._
    val raw = corpus.union(Seq((6L, "", "web")).toDF("doc_id", "text", "source"))
    val target = corpus.filter(col("source") === "clean")
    val w = Importance.importanceWeights(raw, target, "doc_id", "text")
    assert(w.count() == 5L) // the empty doc produces no row
    assert(w.columns.take(3).toSeq == Seq("doc_id", "n_tokens", "logw"))
  }
}
