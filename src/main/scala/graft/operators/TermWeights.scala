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
                tokens: Column => Column = TextFunctions.tokens): DataFrame = {
    val toks = Parallelism.fanOut(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), explode(tokens(col(textCol))).as("tok"))
    // tf is read twice below (the scored rows and the df aggregation);
    // persist + materialize so the tokenize/explode pipeline runs once and
    // the branches don't race to populate the cache (see Dedup.jaccardPairs)
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
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
}
