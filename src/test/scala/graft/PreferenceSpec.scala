package graft

import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.operators.Preference

/** Preference pairs + Bradley–Terry: determinism, ordering sanity, and an
  * arithmetic-exact JVM mirror of the MM iterations. */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("preferencePairs: top candidate chosen, margin filter, id tie-break") {
    val cands = Seq(
      (1L, 10L, "a", 0.9), (1L, 11L, "b", 0.6), (1L, 12L, "c", 0.88),
      (2L, 20L, "a", 0.5), (2L, 21L, "b", 0.5), // tie -> 20 chosen
      (3L, 30L, "c", 0.7) // single candidate -> no pairs
    ).toDF("prompt", "cand_id", "source", "score")
    val p = Preference.preferencePairs(cands, "prompt", "cand_id", "score",
      minMargin = 0.1, carry = Seq("source"), carryChosen = Seq("source"))
      .collect()
    // prompt 1: only 11 clears the 0.1 margin (12 is 0.02 below)
    // prompt 2: tie margin 0.0 < 0.1 -> dropped
    assert(p.length == 1)
    assert(p(0).getAs[Long]("chosen_id") == 10L)
    assert(p(0).getAs[Long]("rejected_id") == 11L)
    assert(math.abs(p(0).getAs[Double]("margin") - 0.3) < 1e-12)
    assert(p(0).getAs[String]("source") == "b")
    assert(p(0).getAs[String]("chosen_source") == "a")
    // with no margin floor, the tie goes to the smaller id
    val tie = Preference.preferencePairs(cands, "prompt", "cand_id", "score")
      .filter($"prompt" === 2L).collect()
    assert(tie.length == 1 && tie(0).getAs[Long]("chosen_id") == 20L)
  }

  /** JVM mirror of the documented MM update with the engine's exact
    * rounding discipline (round-9 divisions, exact decimal folds). */
  private def btMirror(comps: Seq[(String, String)], iters: Int,
                       alpha: Double): Map[String, Double] = {
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sym = comps.filter(c => c._1 != c._2)
    val met = sym ++ sym.map(c => (c._2, c._1))
    val nm = met.groupBy(identity).map { case (k, v) =>
      k -> (v.size.toDouble + 2.0 * alpha) }
    val wObs = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val deg = nm.keys.toSeq.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val items = deg.keys.toSeq.sorted
    val w = items.map(i => i -> (wObs.getOrElse(i, 0.0) + alpha * deg(i))).toMap
    var pi = items.map(i => i -> r9(1.0 / items.size)).toMap
    for (_ <- 1 to iters) {
      val den = items.map { i =>
        val terms = nm.collect { case ((a, b), n) if a == i =>
          BigDecimal(r9(n / (pi(a) + pi(b)))).setScale(9) }
        i -> terms.sum
      }.toMap
      val raw = items.map(i => i -> r9(w(i) / den(i).toDouble)).toMap
      val tot = items.map(i => BigDecimal(raw(i)).setScale(9)).sum
      pi = items.map(i => i -> r9(raw(i) / tot.toDouble)).toMap
    }
    pi
  }

  test("bradleyTerry matches the JVM mirror bit-for-bit on a small tournament") {
    // a beats b 3x, b beats c 2x, a beats c 1x, c beats a 1x
    val comps = Seq(("a", "b"), ("a", "b"), ("a", "b"), ("b", "c"),
      ("b", "c"), ("a", "c"), ("c", "a"))
    val scope = CacheScope.handle()
    val got = Preference.bradleyTerry(comps.toDF("winner", "loser"),
        "winner", "loser", iters = 3, alpha = 1.0, scope = scope)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    scope.release()
    val want = btMirror(comps, iters = 3, alpha = 1.0)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(v == want(k), s"item $k: $v vs ${want(k)}") }
    // dominance order: a > b > c
    assert(got("a") > got("b") && got("b") > got("c"))
    // normalized (to rounding)
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
  }

  test("bradleyTerry: smoothing keeps a never-winning item positive") {
    val comps = Seq(("a", "b"), ("a", "b"), ("a", "c"))
    val scope = CacheScope.handle()
    val got = Preference.bradleyTerry(comps.toDF("w", "l"), "w", "l",
        iters = 2, alpha = 1.0, scope = scope)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    scope.release()
    assert(got("b") > 0.0 && got("c") > 0.0)
    assert(got("a") > got("b"))
  }

  test("groupAdvantage: z-scores within prompt, zero for singletons") {
    val cands = Seq(
      (1L, 10L, 1.0), (1L, 11L, 2.0), (1L, 12L, 3.0), // mean 2, std sqrt(2/3)
      (2L, 20L, 5.0)                                  // singleton
    ).toDF("prompt", "cand_id", "reward")
    val out = Preference.groupAdvantage(cands, "prompt", "reward")
      .collect().map(r => r.getAs[Long]("cand_id") ->
        ((r.getAs[Double]("mean_r"), r.getAs[Double]("std_r"),
          r.getAs[Double]("advantage")))).toMap
    assert(out(11L)._1 == 2.0 && math.abs(out(11L)._3) < 1e-8)
    assert(math.abs(out(10L)._2 - math.sqrt(2.0 / 3.0)) < 1e-9)
    assert(out(10L)._3 < 0 && out(12L)._3 > 0)
    assert(math.abs(out(10L)._3 + out(12L)._3) < 1e-8, "symmetric deviations")
    // singleton: std 0, centered 0 -> advantage 0 (eps guard, no NaN)
    assert(out(20L)._2 == 0.0 && out(20L)._3 == 0.0)
  }

  test("screenPairs: near-identical and length-skewed pairs flagged, clean pair kept") {
    val pairs = Seq(
      (1L, 10L, 11L, "alpha beta gamma delta", "alpha beta gamma delta"),
      (1L, 10L, 12L, "alpha beta gamma delta", "epsilon zeta"),
      (2L, 20L, 21L, "one two three four five six seven eight nine", "one two"),
      (3L, 30L, 31L, "", "")
    ).toDF("prompt", "chosen_id", "rejected_id", "chosen_text", "rejected_text")
    val out = Preference.screenPairs(pairs)
      .collect().map(r => r.getAs[Long]("rejected_id") ->
        ((r.getAs[Double]("jaccard"), r.getAs[Double]("len_ratio"),
          r.getAs[Boolean]("keep")))).toMap
    assert(out(11L)._1 == 1.0 && !out(11L)._3, "identical pair must drop")
    assert(out(12L)._1 == 0.0 && out(12L)._2 == 2.0 && out(12L)._3)
    assert(out(21L)._2 == 4.5 && !out(21L)._3, "length skew must drop")
    assert(out(31L)._1 == 1.0 && !out(31L)._3, "empty-vs-empty drops")
  }

  test("bestOfN: winner per prompt, id tie-break, floor drops weak groups, carry rides") {
    val cands = Seq(
      ("p1", 1L, 0.9, "mA"), ("p1", 2L, 0.6, "mB"), ("p1", 3L, 0.9, "mC"),
      ("p2", 4L, 0.4, "mA"), ("p2", 5L, 0.3, "mB"),
      ("p3", 6L, 0.8, "mB"))
      .toDF("prompt", "cand_id", "quality", "model")
    val out = Preference.bestOfN(cands, "prompt", "cand_id", "quality",
        minScore = 0.7, carry = Seq("model"))
      .collect().map(r => r.getAs[String]("prompt") -> r).toMap
    // p2's best (0.4) is under the floor: the whole group drops
    assert(out.keySet == Set("p1", "p3"))
    // tie at 0.9 between ids 1 and 3 breaks to the SMALLER id
    assert(out("p1").getAs[Long]("chosen_id") == 1L)
    assert(out("p1").getAs[String]("chosen_model") == "mA")
    assert(out("p1").getAs[Long]("n_cands") == 3L)
    assert(out("p1").getAs[Double]("mean_score") == 2.4 / 3)
    assert(out("p3").getAs[Long]("chosen_id") == 6L)
    assert(out("p3").getAs[Long]("n_cands") == 1L)
  }

  test("bradleyTerry holds no distributed caches at all") {
    // the localized rewrite keeps every iteration table as an items-bounded
    // local relation: nothing is persisted, so a tracking scope stays empty
    // (release remains a safe no-op for callers written against the old
    // persist-per-iteration shape)
    val scope = CacheScope.handle()
    Preference.bradleyTerry(Seq(("a", "b"), ("b", "a")).toDF("w", "l"),
      "w", "l", iters = 1, scope = scope).count()
    assert(scope.pinnedCount == 0)
    scope.release()
    assert(scope.pinnedCount == 0)
  }
}
