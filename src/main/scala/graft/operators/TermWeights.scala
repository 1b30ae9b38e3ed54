package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.Parallelism
import graft.functions.TextFunctions

/** Corpus term weighting (TF-IDF family) for training-data pipelines —
  * feature extraction for clustering/curation stages, per-document keyword
  * summaries, topical quality signals.
  *
  * Scale design (100 TB):
  *  - term frequencies partial-aggregate map-side before the one
  *    (doc, term) shuffle;
  *  - document frequency is a partial-aggregable groupBy joined back
  *    shuffle_hash on the term key — never a broadcast join (the
  *    distinct-term table grows with the corpus, so broadcasting it would
  *    overflow the driver) and never a window over the term key (term
  *    frequencies are zipfian, so a stopword's window partition is
  *    corpus-sized on one task, and AQE cannot split a window partition —
  *    it only splits join/agg shuffles; the groupBy collapses each map
  *    partition to one row per term before anything moves);
  *  - the corpus size is the only driver-scale value, attached as a 1-row
  *    broadcast;
  *  - idf is the LINEAR ratio n_docs/df, not log(n_docs/df): per document
  *    the induced ranking is identical (log is monotone), and the
  *    arithmetic stays exactly reproducible across engines — IEEE double
  *    multiply/divide are exactly rounded, while transcendental log is
  *    correctly-rounded in neither the JVM nor C++ libm, so two engines
  *    can disagree in the last ulp. Callers that need the log form for
  *    downstream math can apply it to the returned ratio.
  */
object TermWeights {

  /** Top-k terms per document by tf-idf. Returns one row per (doc, term)
    * with `tf` (term count in the doc), `df` (documents containing the
    * term), `tf_idf` = tf * n_docs / df, and the 1-based `rank` within the
    * document (ties broken by term for determinism). */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int,
                tokens: Column => Column = TextFunctions.tokens,
                scope: graft.core.CacheScope.Handle =
                  graft.core.CacheScope.detached): DataFrame = {
    val toks = Parallelism.fanOut(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), explode(tokens(col(textCol))).as("tok"))
    // tf is read twice below (the scored rows and the df aggregation);
    // persist + materialize so the tokenize/explode pipeline runs once and
    // the branches don't race to populate the cache (see Dedup.jaccardPairs)
    val tf = scope.pin(toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    tf.count()
    // tf has one row per (doc, term), so counting rows per term IS the
    // document frequency; see the scale note above for why this is a
    // groupBy + shuffle_hash join and not a window or a broadcast
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val withDf = tf.hint("shuffle_hash").join(df.hint("shuffle_hash"), "tok")
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = withDf.crossJoin(broadcast(n)) // 1-row scalar, broadcast
      .withColumn("tf_idf", col("tf").cast("double") * col("n_docs") / col("df"))
    val w = Window.partitionBy("doc_id").orderBy(desc("tf_idf"), col("tok"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "tok", "tf", "df", "tf_idf", "rank")
  }

  /** Corpus-wide top-k word n-grams by occurrence count — the vocabulary-
    * induction primitive (wordpiece/BPE seeding, stopword discovery,
    * boilerplate n-gram lists all start from this frequency table). Every
    * OCCURRENCE counts (positional shingles, not per-doc distinct); ties
    * break lexicographically for a total output order.
    *
    * Scale shape: the count is a partial-aggregable groupBy — map-side
    * combine collapses each task's zipfian head before the ONE shuffle on
    * the n-gram — and the global top-k compiles to TakeOrderedAndProject
    * (pinned in PlanSpec): each partition ships only its local top-k to a
    * driver-side k-row heap, never a sort of the whole vocabulary. The
    * driver holds k rows — a parameter, not a corpus scale. */
  def ngramTopK(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    Parallelism.fanOut(docs.select(col(textCol)))
      .select(explode(TextFunctions.shingles(col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(desc("n_occurrences"), col("ngram"))
      .limit(k)

  /** Okapi BM25 retrieval: the top-k corpus documents per query, scored by
    * the standard saturated-tf formula
    * `sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))` with
    * `idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)`. This is the
    * data-selection retrieval primitive: fetch the corpus documents most
    * similar to a benchmark prompt (retrieval-based decontamination) or to
    * a target-domain seed set (retrieval-augmented data curation).
    *
    * `queries` is a BOUNDED frame (benchmark prompts / seed set — a recipe
    * input, not a corpus scale) of (`queryIdCol`, `queryTextCol`).
    *
    * Scale shape (100 TB corpus, bounded query set):
    *  - tf / dl / df come from the same partial-agg groupBys as
    *    [[tfIdfTopK]] (one (doc, term) shuffle; df joined back
    *    shuffle_hash on the term, never broadcast and never a window over
    *    the zipfian term key);
    *  - the query-term table IS broadcast — it is the one genuinely small
    *    side — so matching costs no extra shuffle of the corpus;
    *  - per-(query, doc) scores partial-aggregate map-side before the one
    *    (query, doc) shuffle;
    *  - the final per-query top-k uses the two-phase exact rank of
    *    [[Curation.capPerKey]]: a single `Window.partitionBy(query_id)`
    *    would funnel every matching document of one query through one
    *    task (with few queries, that is the whole corpus); phase 1 ranks
    *    within (query, hash-shard of doc_id), phase 2 re-ranks the
    *    <= shards*k survivors.
    *
    * Oracle parity: each term contribution is computed as doubles in one
    * fixed parenthesization, rounded to 9 decimals, and summed as
    * decimal(28,9) — exact, commutative addition, so the per-(query, doc)
    * score is partition-order-independent and ln is the only
    * transcendental (bit-stable across engines on these rational inputs,
    * see LanguageModel). Ranks tie-break by doc_id. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, queryIdCol: String, queryTextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75,
               tokens: Column => Column = TextFunctions.tokens,
               shards: Int = 64): DataFrame = {
    val toks = Parallelism.fanOut(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), explode(tokens(col(textCol))).as("tok"))
    // tf feeds three consumers (df, dl, scoring); persist + materialize so
    // the tokenize/explode pipeline runs once (see tfIdfTopK)
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    tf.count()
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    // N counts ALL docs (token-less docs have no tf rows but belong in N
    // and in avgdl's denominator); avgdl = total tokens / N in one exact
    // IEEE division. 1-row scalar -> broadcast.
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(tf.agg(coalesce(sum("tf"), lit(0L)).as("total_toks")))
      .select(col("n_docs"),
        (col("total_toks").cast("double") / col("n_docs")).as("avgdl"))
    val qterms = queries
      .select(col(queryIdCol).as("query_id"), col(queryTextCol).as("qtext"))
      .select(col("query_id"), explode(tokens(col("qtext"))).as("tok"))
      .distinct()
    val matched = tf
      .join(broadcast(qterms), "tok")
      .hint("shuffle_hash").join(df.hint("shuffle_hash"), "tok")
      .hint("shuffle_hash").join(dl.hint("shuffle_hash"), "doc_id")
      .crossJoin(broadcast(stats))
    val idf = log((col("n_docs").cast("double") - col("df") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val sat = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl"))))
    val perQueryDoc = matched
      .select(col("query_id"), col("doc_id"),
        round(idf * sat, 9).cast("decimal(28,9)").as("contrib"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum("contrib").cast("decimal(28,9)").as("score_d"))
    val shard = Sampling.hashBucket(col("doc_id").cast("string"), shards, "bm25shard")
    val order = Seq(desc("score_d"), col("doc_id"))
    val w1 = Window.partitionBy(col("query_id"), shard).orderBy(order: _*)
    val w2 = Window.partitionBy(col("query_id")).orderBy(order: _*)
    perQueryDoc
      .withColumn("rank", row_number().over(w1)).filter(col("rank") <= k)
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("n_terms"),
        // round to 6 while still DECIMAL (half-away-from-zero in both
        // engines), then cast: a +/-1e6-scale 6-decimal value converts to
        // double exactly, so the cast itself cannot diverge (see
        // QualityClassifier for the full rationale)
        round(col("score_d"), 6).cast("double").as("score"), col("rank"))
  }

  /** TextRank keyword extraction — corpus-level keyword ranking via
    * PageRank over the token CO-OCCURRENCE graph (Mihalcea & Tarau):
    * stopwords and sub-`minLen` tokens drop first, the FILTERED token
    * sequence contributes its adjacent pairs in both directions, and
    * [[LinkGraph.pageRank]] (fold mode for the oracle gates) ranks the
    * vocabulary graph. Output: top-`k` (token, rank) by (rank DESC, token).
    *
    * Scale shape: edge generation is scan-stage (zip over the filtered
    * array); the graph the iterations run on is VOCABULARY-sized, not
    * corpus-sized — the corpus term is the one pre-aggregation of edge
    * weights inside pageRank. */
  def textRankKeywords(docs: DataFrame, textCol: String, k: Int,
                       iters: Int = 2, minLen: Int = 3,
                       stopwords: Seq[String] =
                         graft.functions.TextFunctions.Stopwords,
                       orderIndependent: Boolean = true): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    val stopArr = array(stopwords.map(lit): _*)
    val kept = filter(toks,
      t => length(t) >= minLen && !array_contains(stopArr, t))
    val n1 = greatest(size(col("__kt")) - 1, lit(0))
    val pairs = Parallelism.fanOut(docs)
      .select(kept.as("__kt"))
      .select(explode(zip_with(
        slice(col("__kt"), lit(1), n1), slice(col("__kt"), lit(2), n1),
        (a, b) => struct(a.as("src"), b.as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
    val edges = pairs.union(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    LinkGraph.pageRank(edges, iters = iters,
        orderIndependent = orderIndependent)
      .orderBy(desc("rank"), asc("domain"))
      .limit(k)
      .select(col("domain").as("token"), col("rank"))
  }
}
