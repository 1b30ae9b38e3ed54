package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-pattern substring matching at blocklist scale — Aho–Corasick.
  *
  * Reference behavior: the reference's policy screens match a phrase list
  * against every document (the C4 badwords rule; `webui/static/app.js`-side
  * highlight terms are the same shape). [[Curation.blocklistFlags]] covers
  * single-TOKEN lists with a broadcast join, and [[Curation.syntheticScreen]]
  * covers a dozen literals with a codegen'd `contains` chain — but a real
  * phrase blocklist runs to tens of thousands of entries that span token
  * boundaries ("as an ai language model") or carry punctuation
  * ("<|im_start|>"). A contains-chain is O(patterns × text) per document and
  * stops whole-stage-codegenning past a few dozen predicates; per-pattern
  * passes re-read the corpus |patterns| times. Aho–Corasick builds a
  * goto/fail automaton over the pattern set once and scans each document
  * ONCE regardless of pattern count: O(text + matches).
  *
  * Semantics: counts EVERY occurrence end position — overlapping included,
  * the classic automaton definition ("a a a" contains "a a" twice; "abab"
  * contains "ab" twice). Matching is case-sensitive byte-for-byte on UTF-16
  * code units; lowercase both sides upstream for case-insensitive screens.
  *
  * Scale shape: the pattern list is collected to the driver (bounded —
  * phrase lists are model-sized, the [[LanguageModel]] broadcast-model
  * contract) and the COMPILED automaton is broadcast; the scan is a
  * partition-local typed map with zero shuffles — the only shuffled rows
  * are the sparse (doc, pattern) hits, folded by one partial agg. At 100 TB
  * the corpus never moves; per-pattern cost is independent of list size.
  */
object MultiMatch {

  /** Compiled goto/fail automaton. Nodes are trie states; `next` is the
    * sparse goto map per state (unicode alphabet — a dense transition table
    * is not feasible), `fail` the longest-proper-suffix link, `out` the
    * pattern ids ending at the state WITH fail-chain outputs collapsed in
    * (so the scan never walks fail links just to report). */
  private[graft] final class Automaton(
      val patterns: Array[String],
      next: Array[java.util.HashMap[Char, Integer]],
      fail: Array[Int],
      out: Array[Array[Int]]) extends Serializable {

    /** Occurrence count per pattern id in `text` (overlapping included). */
    def countsIn(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      if (text == null) return counts
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        var g = next(s).get(c)
        while (g == null && s != 0) { s = fail(s); g = next(s).get(c) }
        s = if (g == null) 0 else g.intValue()
        val o = out(s)
        var j = 0
        while (j < o.length) { counts(o(j)) += 1L; j += 1 }
        i += 1
      }
      counts
    }
  }

  /** Build the automaton: trie insert, then BFS fail links (root's children
    * fail to root; child fail = goto(fail(parent), c) walked up), collapsing
    * outputs along the way. O(total pattern chars) states. */
  private[graft] def compile(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "need at least one pattern")
    require(patterns.forall(p => p != null && p.nonEmpty),
      "patterns must be non-empty")
    require(patterns.distinct.length == patterns.length,
      "patterns must be distinct")
    val pats = patterns.toArray
    val next = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Integer]())
    val ownOut = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    pats.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      p.foreach { c =>
        val g = next(s).get(c)
        if (g == null) {
          next += new java.util.HashMap[Char, Integer]()
          ownOut += Nil
          next(s).put(c, next.length - 1)
          s = next.length - 1
        } else s = g.intValue()
      }
      ownOut(s) = id :: ownOut(s)
    }
    val n = next.length
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    out(0) = ownOut(0).reverse.toArray
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).forEach { (_, v) =>
      fail(v) = 0
      queue += v
    }
    // BFS guarantees fail(v) (a shorter state) is finalized before v
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      out(u) = (ownOut(u).reverse ++ out(fail(u))).toArray
      next(u).forEach { (c, v) =>
        var f = fail(u)
        var g = next(f).get(c)
        while (g == null && f != 0) { f = fail(f); g = next(f).get(c) }
        fail(v) = if (g == null) 0 else g.intValue()
        queue += v
      }
    }
    new Automaton(pats, next.toArray, fail, out)
  }

  /** Sparse per-document hit counts: one row per (doc, pattern) with at
    * least one occurrence — (doc_id, pattern, n_hits). One corpus scan for
    * the whole list; rows out are hits-bounded, not corpus × patterns. */
  def matchCounts(docs: DataFrame, idCol: String, textCol: String,
                  patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(compile(patterns))
    val in = graft.core.Parallelism.fanOut(
      docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text")))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("pattern", StringType, nullable = false),
      StructField("n_hits", LongType, nullable = false)))
    in.mapPartitions { it =>
      val ac = bc.value
      it.flatMap { row =>
        val counts = ac.countsIn(row.getAs[String]("text"))
        counts.indices.iterator.filter(counts(_) > 0L).map(p =>
          Row(if (row.isNullAt(0)) null else row.getLong(0),
            ac.patterns(p), counts(p)))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Per-document screen flags over the whole corpus (every doc, hit or
    * not): total occurrences, distinct patterns hit, and the drop flag —
    * the [[Curation.blocklistFlags]] output contract for phrase lists.
    * Shape: the sparse hit fold, then one bounded left join back. */
  def screenFlags(docs: DataFrame, idCol: String, textCol: String,
                  patterns: Seq[String]): DataFrame = {
    val hits = matchCounts(docs, idCol, textCol, patterns)
      .groupBy(col("doc_id").as("__mm_id"))
      .agg(sum("n_hits").as("n_hits"),
        count(lit(1)).as("n_patterns"))
    docs.join(hits, col(idCol) === col("__mm_id"), "left")
      .drop("__mm_id")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("n_patterns", coalesce(col("n_patterns"), lit(0L)))
      .withColumn("has_hit", col("n_hits") > 0)
  }

  /** Corpus-total occurrence profile per pattern — the list-audit number
    * (which entries actually fire, at what volume): (pattern, n_docs,
    * n_hits), every pattern present (zero-hit entries included — a list
    * entry that never fires is itself a signal). */
  def patternProfile(docs: DataFrame, idCol: String, textCol: String,
                     patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val totals = matchCounts(docs, idCol, textCol, patterns)
      .groupBy("pattern")
      .agg(count(lit(1)).as("n_docs"), sum("n_hits").as("n_hits"))
    patterns.toDF("pattern").join(totals, Seq("pattern"), "left")
      .select(col("pattern"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .orderBy("pattern")
  }
}
