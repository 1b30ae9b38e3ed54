package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph authority scoring for web-crawl curation.
  *
  * Web pipelines rank DOMAINS before they rank documents: a crawl frontier
  * is prioritized (and a screened corpus re-weighted) by link authority,
  * because inlink structure is the one quality signal that exists before any
  * content is fetched. The reference has no graph operators (its web layer
  * serves city data, web.py:344-377); this family extends the engine's
  * web-curation front end (Curation.domainEdges / screenDomains) the way a
  * 100 TB crawl needs — the public precedent is CommonCrawl's domain-level
  * ranking releases (PageRank + harmonic centrality over the domain graph).
  *
  * Scale shape: PageRank here is the standard iterative dataflow form —
  * edges are pre-aggregated to (src, dst, weight) once (one shuffle),
  * out-degrees ride a second small aggregate, and each iteration is ONE
  * shuffle join (ranks ⋈ edges on src, both sides partitioned by the join
  * key) plus one aggregation by dst. The rank frame is |domains|-sized —
  * orders of magnitude smaller than the document corpus. Each iteration's
  * ranks are persisted and MATERIALIZED before the previous iteration's
  * cache is dropped (the persist-swap loop), so no iteration ever recomputes
  * its predecessors; internal persists pin into the caller's
  * [[graft.core.CacheScope]] handle per the engine-wide release contract.
  * Curation ranking runs a handful of iterations, so plan nesting stays
  * shallow; a long-horizon run (50+ iterations) should swap the persist for
  * `checkpoint` to cut lineage and survive driver restarts — noted here
  * rather than defaulted, because checkpointing needs a cluster-visible
  * directory the operator cannot invent.
  *
  * Determinism contract: ranks are rounded to 9 decimals each iteration (the
  * engine-wide round9 fold convention, see DocQueries). Two inflow
  * aggregation modes:
  *  - `orderIndependent = true` (production default): per-edge contributions
  *    cast to DECIMAL(38,18) and summed — exact decimal addition is
  *    associative/commutative, so partial aggregation (map-side combine)
  *    stays enabled and the result is identical under any partitioning; at
  *    web scale a hub domain's million inlinks fold map-side.
  *  - `orderIndependent = false`: a sequential double fold over
  *    contributions ordered by source domain — the bit-reproducible-on-any-
  *    engine shape the DuckDB oracle mirrors (list_reduce ORDER BY src).
  *    Collects each destination's contribution list into one row, so it is
  *    the GATE path, not the hub-scale path.
  * Both modes agree to well below the round9 grain on real graphs; the gate
  * pins the fold path, LinkGraphSpec pins mode agreement.
  *
  * Dangling mass: nodes with no out-edges simply stop contributing (their
  * mass is dropped, not redistributed) — the simplified PageRank variant;
  * ranks then need not sum to 1, which is irrelevant for ordering. Documented
  * rather than hidden: redistribution needs an extra global sum per
  * iteration and changes no ordering on link graphs whose dangling tail is
  * thin.
  */
object LinkGraph {

  /** PageRank over an edge LIST (src, dst) — duplicate rows are weight
    * (occurrence counts are the signal, matching Curation.domainEdges).
    * Returns (domain, rank) — one row per node appearing as src or dst.
    *
    * @param iters   fixed iteration count (curation ranking converges for
    *                ordering purposes in a handful of iterations; CommonCrawl
    *                publishes fixed-iteration runs too)
    * @param damping the standard 0.85 */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               orderIndependent: Boolean = true,
               scope: graft.core.CacheScope.Handle =
                 graft.core.CacheScope.detached): DataFrame =
    pageRankLoop(weightedEdges(edges), iters, damping, orderIndependent,
      scope, teleport = None)

  /** The weighted-edge STATE a crawl frontier maintains between ranking
    * runs: (src, dst, weight) with weight = occurrence count. One shuffle;
    * the frame is domain-PAIR-bounded — orders of magnitude smaller than
    * the crawl it summarizes, and the only thing [[pageRankWeighted]] needs
    * to re-rank. */
  def weightedEdges(edges: DataFrame): DataFrame =
    edges.groupBy("src", "dst").agg(count(lit(1)).cast("long").as("weight"))

  /** Edge-append increment for the maintained state: fold a NEW batch of
    * raw edges (a crawl wave's outlinks) into an existing weighted state.
    * Counts add, so `merge(weighted(a), b) == weighted(a ∪ b)` exactly —
    * which is what makes incremental re-ranking hash-equal to a full
    * recompute on the merged edge set (the `q_dedup_*_increment` contract).
    * One shuffle on (src, dst); the delta aggregates map-side before it
    * ever meets the state. */
  def mergeWeightedEdges(state: DataFrame, deltaEdges: DataFrame): DataFrame =
    state.unionByName(weightedEdges(deltaEdges))
      .groupBy("src", "dst").agg(sum("weight").cast("long").as("weight"))

  /** PageRank over a maintained weighted-edge state — the incremental
    * re-rank path: a frontier appends edges via [[mergeWeightedEdges]] and
    * re-ranks from the merged state, skipping the full-corpus edge
    * extraction/aggregation pass (at crawl scale: the pass that reads every
    * fetched page again). Iteration arithmetic is identical to
    * [[pageRank]], so ranks are bit-equal to a recompute over the merged
    * edge list. */
  def pageRankWeighted(weighted: DataFrame, iters: Int, damping: Double = 0.85,
                       orderIndependent: Boolean = true,
                       scope: graft.core.CacheScope.Handle =
                         graft.core.CacheScope.detached): DataFrame =
    pageRankLoop(weighted, iters, damping, orderIndependent, scope,
      teleport = None)

  /** PERSONALIZED PageRank — the focused-crawl variant: the teleport
    * distribution concentrates on `seeds` (node, weight; weights should sum
    * to 1) instead of spreading uniformly, so rank measures authority AS
    * SEEN FROM the seed topic/domains. r0 = round9(seedWeight) and the base
    * term is (1−d)·seedWeight(v) — zero for non-seeds, which therefore rank
    * only through inlink mass. Same iteration shape, modes, and dangling
    * contract as [[pageRank]]; the seed frame is seed-list-sized and joins
    * the node universe once up front. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int,
                           damping: Double = 0.85,
                           orderIndependent: Boolean = true,
                           scope: graft.core.CacheScope.Handle =
                             graft.core.CacheScope.detached): DataFrame =
    pageRankLoop(weightedEdges(edges), iters, damping, orderIndependent,
      scope, teleport = Some(seeds.select(col("node"), col("weight"))))

  private def pageRankLoop(weighted: DataFrame, iters: Int, damping: Double,
                           orderIndependent: Boolean,
                           scope: graft.core.CacheScope.Handle,
                           teleport: Option[DataFrame]): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val w = weighted.persist()
    val nodes0 = w.select(col("src").as("node"))
      .union(w.select(col("dst").as("node"))).distinct()
    // per-node teleport mass: uniform 1/n, or the seed weights (0 elsewhere)
    val nodes = teleport match {
      case Some(sd) => nodes0
        .join(sd.withColumnRenamed("node", "seed_node"),
          nodes0("node") === col("seed_node"), "left")
        .select(col("node"),
          coalesce(col("weight").cast("double"), lit(0.0)).as("tele"))
        .persist()
      case None => nodes0.withColumn("tele", lit(Double.NaN)).persist()
    }
    val n = nodes.count() // one scalar: the node-universe cardinality
    // r0 mass and the per-iteration base term; the uniform case keeps the
    // original single-division arithmetic ((1−d)/n, not (1−d)·(1/n)) so the
    // unrolled oracle mirrors stay bit-identical
    val (tele, base) = teleport match {
      case Some(_) => (col("tele"), lit(1.0 - damping) * col("tele"))
      case None => (lit(1.0) / n, lit((1.0 - damping) / n))
    }
    val outdeg = w.groupBy("src").agg(sum("weight").as("outdeg"))
    val wd = w.join(outdeg, "src") // (src, dst, weight, outdeg)
      .persist()
    var ranks = nodes.select(col("node"), round(tele, 9).as("rank"))
    var prev: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val contribs = wd.join(ranks, wd("src") === ranks("node"))
        .select(col("dst"), col("src"),
          (col("rank") / col("outdeg") * col("weight")).as("contrib"))
      val inflow =
        if (orderIndependent)
          contribs.groupBy("dst").agg(
            sum(col("contrib").cast("decimal(38,18)")).cast("double").as("inflow"))
        else
          contribs.groupBy("dst").agg(
            aggregate(
              transform(
                array_sort(collect_list(struct(col("src"), col("contrib")))),
                x => x.getField("contrib")),
              lit(0.0), (acc: Column, x: Column) => acc + x).as("inflow"))
      val next = scope.pin(
        nodes.join(inflow, nodes("node") === inflow("dst"), "left")
          .select(col("node"),
            round(base +
              lit(damping) * coalesce(col("inflow"), lit(0.0)), 9).as("rank"))
          .persist())
      next.count() // materialize BEFORE dropping the previous iteration
      prev.foreach(_.unpersist(blocking = false))
      prev = Some(next)
      ranks = next
    }
    // the final ranks frame is materialized: every upstream cache can go;
    // the last iteration's persist stays pinned in `scope` for the caller
    w.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    wd.unpersist(blocking = false)
    ranks.select(col("node").as("domain"), col("rank"))
  }

  /** HITS hubs-and-authorities over an edge LIST (src, dst; duplicates are
    * weight) — the second classic link metric beside [[pageRank]], and the
    * complementary one for crawl curation: PageRank finds globally endorsed
    * domains, HITS separates DIRECTORY-like hubs (link out to good content)
    * from CONTENT authorities (linked from good hubs) — a frontier
    * scheduler wants to fetch from hubs and keep documents from
    * authorities. Returns (domain, authority, hub), one row per node.
    *
    * Arithmetic contract (bit-reproducible on any engine, no fold mode
    * needed): each half-step's per-edge contribution is `round9(score ·
    * weight)` cast to DECIMAL(38,9) and summed — exact, associative, so
    * map-side combine stays on and the result is partitioning-independent;
    * scores are L1-normalized (divide by the exact decimal total, one
    * double division) and rounded to 9 each half-step. L1 instead of
    * Kleinberg's L2 norm: the induced RANKING is identical (normalization
    * is a positive scalar per step), and it keeps every intermediate a
    * 9-decimal value — no sqrt, no unroundable doubles for the oracle to
    * chase. Dangling sides score 0 through the norm, never NULL.
    *
    * Scale shape: same dataflow as [[pageRank]] — the weighted edge frame
    * is aggregated once; each half-step is ONE shuffle join (edges ⋈
    * scores on the propagating side) + a partial aggregation, plus a
    * 1-row total broadcast back for the norm; the score frames are
    * |domains|-sized. Persist-swap per iteration, pinned in the caller's
    * CacheScope; same checkpoint note as PageRank for long horizons. */
  def hits(edges: DataFrame, iters: Int,
           scope: graft.core.CacheScope.Handle =
             graft.core.CacheScope.detached): DataFrame =
    hitsWeighted(edges.groupBy("src", "dst").agg(count(lit(1)).as("weight")),
      iters, scope)

  /** HITS over a MAINTAINED weighted-edge state ([[weightedEdges]] /
    * [[mergeWeightedEdges]] / the streaming delta log) — the incremental
    * re-rank path, exactly the [[pageRankWeighted]] contract: counts add,
    * so scores off the merged state are bit-equal to a full recompute on
    * the merged edge list, and the full-corpus edge extraction pass is
    * skipped. */
  def hitsWeighted(weighted: DataFrame, iters: Int,
                   scope: graft.core.CacheScope.Handle =
                     graft.core.CacheScope.detached): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val w = weighted.persist()
    val nodes = w.select(col("src").as("node"))
      .union(w.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    // Half-step: propagate `scores` across edges from `from` to `to` and
    // SUM — the L1 normalization is NOT applied here but folded lazily
    // into the consumer (the next half-step's score expression, or the
    // final presentation join), halving the per-iteration
    // materializations: the norm-total collect is the one action per
    // half-step, and it doubles as the raw frame's materializer. The norm
    // total comes back as a 1-row driver scalar (bounded, like `n` above)
    // rather than a broadcast-crossJoin branch: a second plan branch over
    // `raw` doubles the captured plan tree per half-step, which compounds
    // to an exponentially-sized plan string across iterations (AQE's
    // plan-update explain OOMed the driver before any task ran).
    //
    // Mid-loop score frames carry only nodes WITH inflow: a node absent
    // from `raw` has score round9(0/tot) = 0 and its outgoing per-edge
    // contributions are round9(0·w) = 0 — dropping them changes no sum and
    // no norm total, so the schedule is bit-identical to landing every
    // half-step on the node universe (the oracle's form); the universe
    // join happens once, in the final presentation.
    def halfStep(scores: DataFrame, from: String,
                 to: String): (DataFrame, java.math.BigDecimal) = {
      val raw = scope.pin(w.join(scores, w(from) === scores("node"))
        .groupBy(w(to).as("__to"))
        .agg(sum(round(col("score") * col("weight"), 9)
          .cast("decimal(38,9)")).as("__raw"))
        .persist())
      // the ONE action: exact decimal total; materializes the raw cache
      val tot = raw.agg(sum("__raw")).head.getDecimal(0)
      (raw, tot)
    }
    // lazily-normalized score view of a half-step result
    def scoresOf(step: (DataFrame, java.math.BigDecimal)): DataFrame =
      step._1.select(col("__to").as("node"),
        round(col("__raw").cast("double") / lit(step._2).cast("double"), 9)
          .as("score"))
    var hub = nodes.select(col("node"), round(lit(1.0) / n, 9).as("score"))
    var auth: DataFrame = null
    var stepA: (DataFrame, java.math.BigDecimal) = null
    var stepH: (DataFrame, java.math.BigDecimal) = null
    for (_ <- 1 to iters) {
      val prevA = stepA
      stepA = halfStep(hub, "src", "dst")
      // the previous auth raw fed only the hub step that is already
      // materialized (its successor's tot collect ran) — release it
      if (prevA != null) prevA._1.unpersist(blocking = false)
      auth = scoresOf(stepA)
      val prevH = stepH
      stepH = halfStep(auth, "dst", "src")
      if (prevH != null) prevH._1.unpersist(blocking = false)
      hub = scoresOf(stepH)
    }
    w.unpersist(blocking = false)
    scope.pin(nodes) // the presentation join below reads it lazily
    // land on the full node universe once: dangling sides score 0 through
    // the norm, never NULL (the documented contract)
    def landed(step: (DataFrame, java.math.BigDecimal), as: String): DataFrame =
      nodes.join(step._1, nodes("node") === col("__to"), "left")
        .select(col("node").as("domain"),
          round(coalesce(col("__raw").cast("double"), lit(0.0)) /
            lit(step._2).cast("double"), 9).as(as))
    landed(stepA, "authority").join(landed(stepH, "hub"), Seq("domain"))
  }

  /** Semi-supervised LABEL PROPAGATION over the (symmetrized) link graph —
    * the taxonomy bootstrapper for crawl curation: hand-label a few seed
    * domains (news / reference / forum / spam…), propagate along links,
    * and every reachable domain gets the topic its neighborhood votes
    * for — labels documents by domain before any content classifier
    * exists. Seeds stay CLAMPED; a non-seed takes the label with the
    * highest summed (undirected, multiplicity-weighted) edge weight among
    * its labeled neighbors, ties broken by the SMALLEST label string —
    * integer vote weights + a total tie order make every iteration fully
    * deterministic, so the unrolled oracle hash-checks the whole schedule.
    * Nodes with no labeled neighbor stay unlabeled (null) until the
    * frontier reaches them; `iters` bounds the propagation radius.
    *
    * Scale shape: edges aggregate once to (a, b, weight) in both
    * directions (one shuffle); each iteration is ONE shuffle join
    * (labels ⋈ edges on the labeled side) + one (node, label) partial
    * aggregation + one min-struct argmax per node — no windows, no
    * cartesian; label frames are |domains|-sized, persist-swapped like
    * [[pageRank]]. */
  def labelPropagation(edges: DataFrame, seeds: DataFrame, iters: Int,
                       scope: graft.core.CacheScope.Handle =
                         graft.core.CacheScope.detached): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // undirected voting: each edge list row counts once per direction
    val sym = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
    val w = sym.groupBy("a", "b").agg(count(lit(1)).as("weight")).persist()
    val nodes = w.select(col("a").as("node")).distinct().persist()
    val sd = seeds.select(col("node").as("seed_node"), col("label").as("seed_label"))
    var labels = nodes
      .join(broadcast(sd), nodes("node") === col("seed_node"), "left")
      .select(col("node"), col("seed_label").as("label"))
    var prev: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      // votes: labeled neighbors of b vote (label, summed weight)
      val votes = w.join(labels, w("a") === labels("node"))
        .filter(col("label").isNotNull)
        .groupBy(col("b"), col("label"))
        .agg(sum("weight").as("__w"))
      // argmax with (weight desc, label asc) total order
      val winner = votes.groupBy(col("b"))
        .agg(min(struct((-col("__w")).as("nw"), col("label").as("l")))
          .as("__best"))
        .select(col("b"), col("__best.l").as("win_label"))
      val next = scope.pin(nodes
        .join(winner, nodes("node") === col("b"), "left")
        .join(broadcast(sd), nodes("node") === col("seed_node"), "left")
        .select(col("node"),
          coalesce(col("seed_label"), col("win_label")).as("label"))
        .persist())
      next.count()
      prev.foreach(_.unpersist(blocking = false))
      prev = Some(next)
      labels = next
    }
    w.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    labels.select(col("node").as("domain"), col("label"))
  }

  /** Per-node triangle count + local clustering coefficient over the
    * UNDIRECTED simple graph induced by the edges (direction, weights,
    * multi-edges and self-loops dropped). The two signals a crawl-graph
    * audit wants next to degree: triangles separate genuine communities
    * from star-shaped link farms (a spam hub has huge degree and near-zero
    * clustering), and `clustering = 2T / (deg (deg-1))` normalizes that per
    * node.
    *
    * Scale shape: the classic degree-ordered node-iterator. Every edge is
    * oriented from its lower (degree, id) endpoint to the higher one, so
    * wedges are enumerated only at each triangle's LOWEST-degree apex —
    * out-degrees under this orientation are bounded by O(sqrt(|E|))
    * regardless of hub size (a 10^7-degree hub generates no wedges; its
    * low-degree neighbors each generate few), which is what keeps the pair
    * space from exploding at crawl scale. Wedge closure is a pure
    * equi-join on the oriented (u, v) pair: the orientation is a total
    * order, so a wedge's two far endpoints close in exactly one known
    * direction and each triangle is found exactly once. Three shuffles
    * (simple-edges distinct, degree agg, closure join) + the wedge
    * self-join on the oriented frame. */
  def triangles(edges: DataFrame,
                scope: graft.core.CacheScope.Handle =
                  graft.core.CacheScope.detached): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("n")).union(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).cast("long").as("deg"))
    val dj = und
      .join(deg.select(col("n").as("a"), col("deg").as("__da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("deg").as("__db")), Seq("b"))
    // orient low (deg, id) -> high; carry the far endpoint's degree so the
    // wedge pair order below needs no extra join
    val oriented = scope.pin(dj.select(
        when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("__db").as("dv")))
          .otherwise(
            struct(col("b").as("u"), col("a").as("v"), col("__da").as("dv")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .persist())
    oriented.count()
    // wedges (u; y, z) with y before z in the SAME (deg, id) order the
    // orientation uses => the closing simple edge is oriented y -> z
    val e1 = oriented.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val e2 = oriented.select(col("u"), col("v").as("z"), col("dv").as("dz"))
    val tri = e1.join(e2, Seq("u"))
      .filter(col("dy") < col("dz") ||
        (col("dy") === col("dz") && col("y") < col("z")))
      .join(oriented.select(col("u").as("y"), col("v").as("z")), Seq("y", "z"),
        "left_semi")
      .select(col("u").as("x"), col("y"), col("z"))
    val perNode = tri.select(col("x").as("n"))
      .union(tri.select(col("y").as("n")))
      .union(tri.select(col("z").as("n")))
      .groupBy("n").agg(count(lit(1)).cast("long").as("n_triangles"))
    deg.join(perNode, Seq("n"), "left")
      .select(col("n").as("domain"), col("deg").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") > 1,
          (lit(2.0) * coalesce(col("n_triangles"), lit(0L))) /
            (col("deg") * (col("deg") - 1)).cast("double"))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** In/out degree + weighted-rank join surface: the rank table decorated
    * with the degree signals a frontier scheduler consumes alongside it. */
  def degreeProfile(edges: DataFrame): DataFrame = {
    val w = edges.groupBy("src", "dst").agg(count(lit(1)).as("weight"))
    val out = w.groupBy(col("src").as("domain"))
      .agg(sum("weight").as("out_weight"),
        count(lit(1)).as("out_degree"))
    val in = w.groupBy(col("dst").as("domain"))
      .agg(sum("weight").as("in_weight"),
        count(lit(1)).as("in_degree"))
    out.join(in, Seq("domain"), "full_outer")
      .select(col("domain"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("out_weight"), lit(0L)).as("out_weight"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"),
        coalesce(col("in_weight"), lit(0L)).as("in_weight"))
  }
}
