package graft

import org.apache.spark.sql.functions._
import graft.operators.MultiMatch

class MultiMatchSpec extends SparkSpec {

  /** Overlap-inclusive occurrence count (advance by ONE after a hit). */
  private def brute(text: String, p: String): Long = {
    var c = 0L
    var i = text.indexOf(p)
    while (i >= 0) { c += 1; i = text.indexOf(p, i + 1) }
    c
  }

  test("automaton: suffix outputs collapse, fail transitions, overlap") {
    val ac = MultiMatch.compile(Seq("aab", "ab", "b", "a a"))
    // "aaab": aab ends @3, ab ends @3, b ends @3 — one scan reports all
    assert(ac.countsIn("aaab").toSeq == Seq(1L, 1L, 1L, 0L))
    // self-overlapping phrase: "a a a" contains "a a" at 0 and 2
    assert(ac.countsIn("a a a")(3) == 2L)
    assert(ac.countsIn("abab").toSeq == Seq(0L, 2L, 2L, 0L))
    assert(ac.countsIn(null).toSeq == Seq(0L, 0L, 0L, 0L))
    assert(ac.countsIn("").toSeq == Seq(0L, 0L, 0L, 0L))
  }

  test("automaton equals brute force on seeded word salad") {
    val vocab = Array("a", "ab", "table", "fast", "b", "aa")
    val rnd = new scala.util.Random(7)
    val pats = Seq("a a", "table table", "ab a", "b ab", "aa", "zzz")
    val ac = MultiMatch.compile(pats)
    (0 until 200).foreach { _ =>
      val text = Seq.fill(30)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val got = ac.countsIn(text).toSeq
      val want = pats.map(brute(text, _))
      assert(got == want, s"text=$text")
    }
  }

  test("matchCounts sparse, screenFlags total, profile keeps zero-hit rows") {
    import spark.implicits._
    val docs = Seq((1L, "a a a table table"), (2L, "no hits here"),
      (3L, null: String)).toDF("doc_id", "text")
    val pats = Seq("a a", "table table", "zz")
    val mc = MultiMatch.matchCounts(docs, "doc_id", "text", pats)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(mc == Map((1L, "a a") -> 2L, (1L, "table table") -> 1L))
    val sf = MultiMatch.screenFlags(docs, "doc_id", "text", pats)
      .select("doc_id", "n_hits", "n_patterns", "has_hit")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(sf == Map(1L -> ((3L, 2L, true)), 2L -> ((0L, 0L, false)),
      3L -> ((0L, 0L, false))))
    val pp = MultiMatch.patternProfile(docs, "doc_id", "text", pats)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toSeq
    assert(pp == Seq("a a" -> ((1L, 2L)), "table table" -> ((1L, 1L)),
      "zz" -> ((0L, 0L))))
  }

  test("one corpus scan regardless of pattern count: single text subtree") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val pats = (1 to 64).map(i => s"pat$i")
    // the scan is one typed mapPartitions over (id, text) — the plan holds
    // exactly one scan of the input regardless of |patterns|
    val plan = MultiMatch.matchCounts(docs, "doc_id", "text", pats)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("MapPartitions") || plan.contains("mapPartitions"))
    assert(!plan.toLowerCase.contains("union"),
      s"per-pattern passes would union:\n$plan")
  }

  test("rejects empty list, empty pattern, duplicates") {
    intercept[IllegalArgumentException](MultiMatch.compile(Nil))
    intercept[IllegalArgumentException](MultiMatch.compile(Seq("a", "a")))
    intercept[IllegalArgumentException](MultiMatch.compile(Seq("")))
  }
}
