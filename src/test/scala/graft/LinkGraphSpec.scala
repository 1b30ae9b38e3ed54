package graft

import org.apache.spark.sql.functions._

import graft.operators.LinkGraph

/** Link-graph authority ops: hand-computed PageRank on a known graph, the
  * production (decimal-sum) vs gate (ordered fold) mode agreement, dangling
  * semantics, and the degree profile. */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  // a -> b, a -> c, b -> c, c -> a : classic 3-node cycle with a double-out a
  private def triangle = Seq(
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")).toDF("src", "dst")

  test("one iteration matches the hand-computed update") {
    val r = LinkGraph.pageRank(triangle, iters = 1, orderIndependent = false)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // r0 = 1/3 each (round9: 0.333333333). base = 0.15/3 = 0.05.
    // a: inflow from c (outdeg 1): 0.333333333 -> 0.05 + 0.85*0.333333333
    val third = BigDecimal(1.0 / 3).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    def expect(inflow: Double) =
      BigDecimal(0.15 / 3 + 0.85 * inflow)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r("a") == expect(third))
    assert(r("b") == expect(third / 2))
    assert(r("c") == expect(third / 2 + third))
    assert(r.size == 3)
  }

  test("incremental edge-append re-rank is bit-equal to full recompute") {
    // two crawl waves over a shared domain space; wave2 repeats an edge so
    // the merge must ADD weights, not dedupe them
    val wave1 = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val wave2 = Seq(("c", "a"), ("a", "b"), ("d", "a")).toDF("src", "dst")
    val full = wave1.unionByName(wave2)
    // state maintenance: merge(weighted(w1), w2) == weighted(w1 ∪ w2)
    val merged = LinkGraph.mergeWeightedEdges(
      LinkGraph.weightedEdges(wave1), wave2)
    val direct = LinkGraph.weightedEdges(full)
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("src", "dst").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(triples(merged) == triples(direct))
    // re-rank from the merged state == recompute from the raw merged edges,
    // in both fold modes
    for (oi <- Seq(true, false)) {
      val inc = LinkGraph.pageRankWeighted(merged, iters = 3,
          orderIndependent = oi)
        .orderBy("domain").collect().map(r => (r.getString(0), r.getDouble(1)))
      val re = LinkGraph.pageRank(full, iters = 3, orderIndependent = oi)
        .orderBy("domain").collect().map(r => (r.getString(0), r.getDouble(1)))
      assert(inc.nonEmpty && inc.sameElements(re), s"mode oi=$oi diverged")
    }
    // HITS from the same merged state == recompute over the raw edge union
    val hitsInc = LinkGraph.hitsWeighted(merged, iters = 2)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val hitsRe = LinkGraph.hits(full, iters = 2)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(hitsInc.nonEmpty && hitsInc == hitsRe)
  }

  test("production decimal-sum mode equals the ordered-fold gate mode") {
    // a denser deterministic graph incl. parallel edges (weights) and a hub
    val edges = spark.range(0, 400).select(
      concat(lit("d"), (col("id") % 23).cast("string")).as("src"),
      explode(array(
        concat(lit("d"), ((col("id") * 7 + 3) % 23).cast("string")),
        concat(lit("d"), ((col("id") * 11 + 1) % 23).cast("string")),
        concat(lit("d"), (col("id") % 3).cast("string")))).as("dst"))
    val exact = LinkGraph.pageRank(edges, iters = 4, orderIndependent = false)
    val prod = LinkGraph.pageRank(edges, iters = 4, orderIndependent = true)
    val joined = exact.withColumnRenamed("rank", "r_fold")
      .join(prod.withColumnRenamed("rank", "r_sum"), "domain")
    assert(joined.count() == 23)
    // round9 is applied per iteration in both modes; with contributions well
    // above the grain the two aggregation orders agree exactly here
    assert(joined.filter(col("r_fold") =!= col("r_sum")).count() == 0)
  }

  test("dangling nodes keep the base rank; mass is dropped not redistributed") {
    val edges = Seq(("a", "b"), ("b", "sink")).toDF("src", "dst")
    val r = LinkGraph.pageRank(edges, iters = 2)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // sink has no out-edges: it receives but never contributes; a receives
    // nothing -> base only after iter 1
    assert(r("sink") > r("a"))
    assert(r("a") == BigDecimal(0.15 / 3)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // total mass < 1: the sink's inflow leaked out (documented contract)
    assert(r.values.sum < 1.0)
  }

  test("hub domains outrank leaf domains; ranks positive") {
    val edges = spark.range(0, 300).select(
      concat(lit("d"), (col("id") % 30).cast("string")).as("src"),
      concat(lit("hub"), (col("id") % 2).cast("string")).as("dst"))
    val r = LinkGraph.pageRank(edges, iters = 3)
    val hub = r.filter(col("domain").startsWith("hub"))
      .agg(min("rank")).head.getDouble(0)
    val leaf = r.filter(!col("domain").startsWith("hub"))
      .agg(max("rank")).head.getDouble(0)
    assert(hub > leaf)
    assert(r.filter(col("rank") <= 0).count() == 0)
  }

  test("personalized PageRank: zero-teleport non-seeds rank only via inlinks") {
    // seeds: a only. Graph: a -> b, b -> c, c has no outlinks (dangling).
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val seeds = Seq(("a", 1.0)).toDF("node", "weight")
    val r = LinkGraph.personalizedPageRank(edges, seeds, iters = 2,
        orderIndependent = false)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    def r9(v: Double) =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // r0: a=1, b=0, c=0. iter1: a = 0.15*1; b = 0.15*0 + 0.85*(1/1) = 0.85;
    // c = 0.85*0 = 0. iter2: a = 0.15; b = 0.85*0.15; c = 0.85*0.85.
    assert(r("a") == r9(0.15 * 1.0))
    assert(r("b") == r9(0.85 * 0.15))
    assert(r("c") == r9(0.85 * 0.85))
    // seed-free dead ends hold zero rank, unlike uniform PageRank's floor
    val noSeedPath = LinkGraph.personalizedPageRank(
        Seq(("x", "y"), ("a", "b")).toDF("src", "dst"),
        seeds, iters = 3).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(noSeedPath("x") == 0.0 && noSeedPath("y") == 0.0)
    assert(noSeedPath("a") > 0 && noSeedPath("b") > 0)
  }

  test("personalized modes agree like the uniform ones") {
    val edges = spark.range(0, 300).select(
      concat(lit("d"), (col("id") % 19).cast("string")).as("src"),
      explode(array(
        concat(lit("d"), ((col("id") * 5 + 2) % 19).cast("string")),
        concat(lit("d"), (col("id") % 4).cast("string")))).as("dst"))
    val seeds = Seq(("d0", 0.5), ("d1", 0.5)).toDF("node", "weight")
    val fold = LinkGraph.personalizedPageRank(edges, seeds, iters = 3,
      orderIndependent = false).withColumnRenamed("rank", "r_fold")
    val prod = LinkGraph.personalizedPageRank(edges, seeds, iters = 3,
      orderIndependent = true).withColumnRenamed("rank", "r_sum")
    val joined = fold.join(prod, "domain")
    assert(joined.filter(col("r_fold") =!= col("r_sum")).count() == 0)
  }

  test("degreeProfile counts distinct neighbors and occurrence weights") {
    val edges = Seq(
      ("a", "b"), ("a", "b"), ("a", "c"), ("c", "a")).toDF("src", "dst")
    val m = LinkGraph.degreeProfile(edges).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(m("a") == ((2L, 3L, 1L, 1L))) // out: {b(w2), c(w1)}; in: {c(w1)}
    assert(m("b") == ((0L, 0L, 1L, 2L)))
    assert(m("c") == ((1L, 1L, 1L, 1L)))
  }

  /** JVM mirror of one HITS run with the operator's exact arithmetic:
    * round9 via BigDecimal HALF_UP (Spark's round), exact BigDecimal
    * contribution sums (the DECIMAL(38,9) fold), double division. */
  private def hitsRef(edges: Seq[(String, String)], iters: Int)
  : Map[String, (Double, Double)] = {
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w = edges.groupBy(identity).map { case ((s, d), es) => (s, d, es.size.toLong) }.toSeq
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var hub = nodes.map(_ -> r9(1.0 / nodes.size)).toMap
    var auth = hub
    def half(scores: Map[String, Double], fromSrc: Boolean): Map[String, Double] = {
      val raw = w.groupBy(e => if (fromSrc) e._2 else e._1)
        .map { case (nd, es) =>
          nd -> es.map { case (s, d, wt) =>
            BigDecimal(r9(scores(if (fromSrc) s else d) * wt)) }.sum
        }
      val tot = raw.values.sum.toDouble
      nodes.map(nd => nd ->
        r9(raw.get(nd).map(_.toDouble).getOrElse(0.0) / tot)).toMap
    }
    for (_ <- 1 to iters) {
      auth = half(hub, fromSrc = true)
      hub = half(auth, fromSrc = false)
    }
    nodes.map(nd => nd -> ((auth(nd), hub(nd)))).toMap
  }

  test("HITS: hubs and authorities separate on a bipartite-ish graph; matches the jvm mirror") {
    // 1 and 2 point at {3, 4}; 3 points at 4 - so 1/2 are pure hubs,
    // 4 the strongest authority; duplicate edge (1->3) is weight
    val edges = Seq(("h1", "c3"), ("h1", "c3"), ("h1", "c4"),
      ("h2", "c3"), ("h2", "c4"), ("c3", "c4"))
    val got = LinkGraph.hits(edges.toDF("src", "dst"), iters = 3).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got == hitsRef(edges, 3))
    // structure: pure hubs have zero authority; c4 beats c3 in authority
    // is false (c3 carries the duplicate inlink) - assert the real order
    assert(got("h1")._1 == 0.0 && got("h2")._1 == 0.0)
    assert(got("c4")._2 == 0.0) // sink: no out-edges, zero hub
    assert(got("h1")._2 > got("c3")._2, "dup-weighted hub must lead")
    assert(got.values.forall { case (a, h) => a >= 0 && h >= 0 })
  }

  test("label propagation: frontier radius, clamped seeds, weight votes, smallest-label ties") {
    // chain a-b-c-d seeded at both ends; isolated pair e-f unreached
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("e", "f"),
      // g sits between two single-weight labeled neighbors -> label tie;
      // h gets a double-weight edge from d's side -> weight beats count
      ("a", "g"), ("d", "g"), ("d", "h"), ("d", "h"), ("a", "h")
    ).toDF("src", "dst")
    val seeds = Seq(("a", "x"), ("d", "y")).toDF("node", "label")
    def run(iters: Int) = LinkGraph.labelPropagation(edges, seeds, iters)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    val one = run(1)
    // radius 1: b sees a, c sees d, g ties x/y -> smallest 'x',
    // h: weight 2 from d beats 1 from a -> 'y'; e/f unlabeled
    assert(one("b").contains("x") && one("c").contains("y"))
    assert(one("g").contains("x"), "tie must break to the smallest label")
    assert(one("h").contains("y"), "weight 2 must beat weight 1")
    assert(one("e").isEmpty && one("f").isEmpty)
    // seeds clamp under any pressure
    assert(one("a").contains("x") && one("d").contains("y"))
    val two = run(2)
    // synchronous update: c now sees b(x,1) vs d(y,1) - a tie, so the
    // deterministic smallest-label rule flips it to x (the documented
    // LPA tie schedule; the oracle unrolls the identical rounds)
    assert(two("b").contains("x") && two("c").contains("x"))
    assert(two("h").contains("y"), "weighted vote stays stable")
    assert(two("e").isEmpty && two("f").isEmpty, "disconnected stays null")
  }

  test("triangles: K4 fully clustered, star at zero, mixed graph exact") {
    // K4: every node degree 3, 3 triangles each, clustering 1.0
    val k4 = (for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b
    } yield (a, b)).toDF("src", "dst")
    val t4 = LinkGraph.triangles(k4).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(t4.size == 4)
    t4.values.foreach { case (deg, t, c) =>
      assert(deg == 3L && t == 3L && c == 1.0)
    }
    // star: hub degree n, zero triangles, zero clustering everywhere
    val star = (1 to 6).map(i => ("hub", s"leaf$i")).toDF("src", "dst")
    LinkGraph.triangles(star).collect().foreach { r =>
      assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0)
    }
    // mixed: triangle a-b-c plus pendant d on a; direction, multi-edges
    // and self-loops must not change the simple-graph answer
    val mixed = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
      ("a", "d"), ("a", "a")).toDF("src", "dst")
    val tm = LinkGraph.triangles(mixed).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(tm("a") == ((3L, 1L, 1.0 * 2 / 6)))
    assert(tm("b") == ((2L, 1L, 1.0)))
    assert(tm("c") == ((2L, 1L, 1.0)))
    assert(tm("d") == ((1L, 0L, 0.0)))
  }

  test("triangles: degree-ordered enumeration matches the naive count") {
    // circulant graph (i, i+1) + (i, i+2) mod 23 — every i closes the
    // triangle {i, i+1, i+2} — plus deterministic chord noise
    val edges = ((0 until 23).flatMap { i =>
      Seq((s"n$i", s"n${(i + 1) % 23}"), (s"n$i", s"n${(i + 2) % 23}"))
    } ++ (0 until 40).map { k =>
      (s"n${(k * 7 + 1) % 23}", s"n${(k * 11 + 5) % 23}")
    }).toDF("src", "dst")
    val got = LinkGraph.triangles(edges)
      .agg(sum($"n_triangles")).head.getLong(0)
    // naive: distinct ordered a<b<c closures, each triangle counted once,
    // times 3 for the per-node sum
    val und = edges.filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .distinct()
    val naive = und.as("e1")
      .join(und.as("e2"), col("e2.a") === col("e1.b"))
      .join(und.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"), "left_semi")
      .count() * 3
    assert(got == naive && got > 0)
  }

  test("HITS leaves no persistent RDDs behind (detached scope)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    LinkGraph.hits(edges, iters = 2).collect()
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
