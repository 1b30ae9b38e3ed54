package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document line-level deduplication and boilerplate removal — the
  * CCNet-style cleaners (Wenzek et al. 2019, "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data") that strip repeated navigation
  * chrome, footers, and license text from a web corpus. Complements the
  * WITHIN-document `TextFunctions.dedupLines` (a scan-stage fold) with the
  * corpus-wide contracts a crawl pipeline actually needs.
  *
  * Scale design (100 TB):
  *  - line keys are zipfian (boilerplate IS the heavy tail) — both operators
  *    therefore avoid any per-line window or line-keyed probe-side shuffle:
  *  - [[dedupLinesAcrossDocs]] reduces first-occurrence selection to a
  *    partial-aggregable `min(struct(id, idx))` groupBy — a heavy line's
  *    millions of occurrences combine MAP-SIDE to one candidate per input
  *    partition, so the line-keyed shuffle carries ~distinct-lines rows, and
  *    the kept rows come straight out of the aggregate (no join back against
  *    the occurrence frame);
  *  - [[dropBoilerplate]]'s heavy set is bounded by
  *    total-line-occurrences / minDocs (each heavy line needs >= minDocs
  *    distinct docs), and in practice tiny — it is BROADCAST and the corpus
  *    is cleaned with a broadcast anti-join, never shuffled on the line key;
  *  - document reassembly groups on the UNIFORM doc id (collect_list +
  *    array_sort — per-doc state is bounded by document size, not corpus).
  */
object Lines {

  /** (id, idx, line) for every non-blank line, idx = 0-based position in the
    * split. Blank (all-whitespace) segments are dropped — they carry no
    * content and would otherwise dominate the duplicate-line space; kept
    * lines are NOT trimmed (whitespace variants are distinct lines, the same
    * contract as `TextFunctions.dedupLines`). */
  def explodeLines(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n")).as(Seq("idx", "line")))
      .filter(length(trim(col("line"))) > 0)

  /** Per-doc count of non-blank lines, as a scan-stage column over `textCol`
    * (no explode, no shuffle). */
  private def nLinesCol = {
    val segs = split(coalesce(col("text_orig"), lit("")), "\n")
    size(filter(segs, l => length(trim(l)) > 0)).cast("long")
  }

  /** Corpus-wide line dedup: every line keeps only its globally FIRST
    * occurrence (lowest (id, idx)); documents are reassembled from their
    * surviving lines in original order. Returns
    * (idCol, text, n_lines, n_kept) — `text` is '' and `n_kept` 0 for a
    * document whose every line occurred earlier elsewhere.
    *
    * First-occurrence selection is `groupBy(line).agg(min(struct(id, idx)))`
    * — the aggregate's output IS the kept-line frame, so no occurrence-frame
    * join ever happens on the zipfian line key (see object doc). */
  def dedupLinesAcrossDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val kept = explodeLines(docs, idCol, textCol)
      .groupBy("line")
      .agg(min(struct(col("id"), col("idx"))).as("first"))
      .select(col("first.id").as("id"), col("first.idx").as("idx"), col("line"))
    reassemble(docs, idCol, textCol, kept, "n_kept")
      .select(col(idCol), col("text"), col("n_lines"), col("n_kept"))
  }

  /** The boilerplate set: lines occurring in at least `minDocs` DISTINCT
    * documents, with their document frequency. Bounded by
    * occurrences / minDocs rows; both aggregation phases partial-agg. */
  def boilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                       minDocs: Long): DataFrame =
    explodeLines(docs, idCol, textCol)
      .groupBy("line").agg(countDistinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Frequency-threshold boilerplate removal: every occurrence of a line
    * appearing in >= `minDocs` distinct documents is cut from EVERY document
    * (C4 drops the "any line seen in >= 3 pages" chrome this way). Returns
    * (idCol, text, n_lines, n_removed). The small heavy set is broadcast and
    * the corpus cleaned with a broadcast anti-join — the occurrence frame is
    * never shuffled on the line key. */
  def dropBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                      minDocs: Long): DataFrame = {
    val heavy = boilerplateLines(docs, idCol, textCol, minDocs).select("line")
    val light = explodeLines(docs, idCol, textCol)
      .join(broadcast(heavy), Seq("line"), "left_anti")
    reassemble(docs, idCol, textCol, light, "n_kept")
      .select(col(idCol), col("text"), col("n_lines"),
        (col("n_lines") - col("n_kept")).as("n_removed"))
  }

  /** C4-style rule cleaning (Raffel et al. 2020, "Exploring the Limits of
    * Transfer Learning...", §2.2 — the C4 corpus recipe; reference behavior,
    * not reference code). Line rules (applied to the trimmed line):
    *   - keep only lines ending in a terminal punctuation mark (. ! ? ")
    *   - keep only lines with at least `minWordsPerLine` whitespace words
    *   - drop lines mentioning "javascript" (enable-JS chrome)
    *   - drop lines carrying a cookie/policy phrase ("terms of use",
    *     "privacy policy", "cookie policy", "uses cookies", "use of
    *     cookies", "use cookies")
    * Document rules: flag (keep_doc = false) any page whose ORIGINAL text
    * contains "{" (code), contains "lorem ipsum" (filler), or whose CLEANED
    * text has fewer than `minSentences` sentence enders ([.!?] count — the
    * usual cheap proxy for C4's >= 3 sentences).
    *
    * Unlike the frequency cleaners above, every rule is a pure function of
    * the single document: the whole operator is scan-stage Column trees over
    * `split(text, "\n")` — ZERO shuffles at any corpus size, and it composes
    * in front of [[dropBoilerplate]] / the dedup family for free. Returns
    * (idCol, keep_doc, n_lines, n_kept, n_sentences, text) with `text` the
    * cleaned reassembly (trimmed kept lines joined by \n; '' when nothing
    * survives). Verdict stays a flag, not a filter — callers choose drop vs
    * audit, like [[Curation.firstFailVerdict]]. */
  def c4Clean(docs: DataFrame, idCol: String, textCol: String,
              minWordsPerLine: Int = 5, minSentences: Int = 3): DataFrame = {
    require(minWordsPerLine > 0 && minSentences >= 0,
      "minWordsPerLine must be positive, minSentences non-negative")
    val policyPhrases = Seq("terms of use", "privacy policy", "cookie policy",
      "uses cookies", "use of cookies", "use cookies")
    val segs = split(coalesce(col("text_orig"), lit("")), "\n")
    val keptArr = filter(segs, l => {
      val t = trim(l)
      val lc = lower(t)
      t.rlike("[.!?\"]$") &&
        size(split(t, "\\s+")) >= minWordsPerLine &&
        !lc.contains("javascript") &&
        policyPhrases.map(p => !lc.contains(p)).reduce(_ && _)
    })
    val cleaned = array_join(transform(keptArr, l => trim(l)), "\n")
    docs.select(col(idCol), col(textCol).as("text_orig"))
      .withColumn("n_lines", nLinesCol)
      .withColumn("n_kept", size(keptArr).cast("long"))
      .withColumn("text", cleaned)
      .withColumn("n_sentences",
        length(regexp_replace(col("text"), "[^.!?]", "")).cast("long"))
      .withColumn("keep_doc",
        !coalesce(col("text_orig"), lit("")).contains("{") &&
          !lower(coalesce(col("text_orig"), lit(""))).contains("lorem ipsum") &&
          col("n_sentences") >= minSentences)
      .select(col(idCol), col("keep_doc"), col("n_lines"), col("n_kept"),
        col("n_sentences"), col("text"))
  }

  /** FENCE-AWARE [[c4Clean]] — the code-corpus variant every code-LLM
    * pipeline needs: C4's line rules were written for web prose and
    * destroy exactly the content a code/math corpus is curated FOR (code
    * lines rarely end in terminal punctuation; `{` flags the whole page).
    * This variant PROTECTS two structures before the line rules fire:
    *  - ``` fenced blocks (both fence-marker lines and everything between
    *    them — fence state is the running parity of marker lines, a
    *    marker being any line whose TRIMMED form starts with ```);
    *  - inline-math lines: any line carrying a real `$...$` span — both
    *    delimiters flush against non-space content (`$E = mc^2$`), so
    *    price/spam chrome ("$$$ BUY NOW $$$", "costs $5 and $10") is NOT
    *    protected and still faces the prose rules.
    * Protected lines are kept VERBATIM (untrimmed — indentation is code
    * content); unprotected lines go through the standard C4 rules
    * (trimmed). Document rules become code-aware too: the `{` flag fires
    * only on UNPROTECTED lines, and the sentence floor judges only the
    * cleaned UNPROTECTED prose — a page that is all code + 2 prose
    * sentences still fails, a page of prose with a brace-bearing fenced
    * example no longer does. "lorem ipsum" stays a whole-page rule (filler
    * is filler, fenced or not).
    *
    * Same zero-shuffle scan-stage shape as [[c4Clean]]: the fence parity
    * is a per-line prefix fold over the line array — O(lines²) per
    * document in array slices, fine at any corpus size because it never
    * leaves the scan task. Returns (idCol, keep_doc, n_lines, n_kept,
    * n_protected, n_sentences, text). */
  def c4CleanCodeAware(docs: DataFrame, idCol: String, textCol: String,
                       minWordsPerLine: Int = 5,
                       minSentences: Int = 3): DataFrame = {
    require(minWordsPerLine > 0 && minSentences >= 0,
      "minWordsPerLine must be positive, minSentences non-negative")
    val policyPhrases = Seq("terms of use", "privacy policy", "cookie policy",
      "uses cookies", "use of cookies", "use cookies")
    val segs = split(coalesce(col("text_orig"), lit("")), "\n")
    def isMarker(l: Column): Column = trim(l).startsWith("```")
    val markers = transform(segs, l => when(isMarker(l), 1).otherwise(0))
    def prose(l: Column): Column = {
      val t = trim(l)
      val lc = lower(t)
      t.rlike("[.!?\"]$") &&
        size(split(t, "\\s+")) >= minWordsPerLine &&
        !lc.contains("javascript") &&
        policyPhrases.map(p => !lc.contains(p)).reduce(_ && _)
    }
    // per line: (original, protected?, kept-form-or-null)
    val dec = transform(segs, (l, i) => {
      val inFence = aggregate(slice(markers, lit(1), i), lit(0),
        (a, x) => a + x) % 2 === 1
      // a REAL $...$ span: both delimiters flush against non-space content
      // (`$x^2 + y$`), never a bare `$` pair — "any line with two dollars"
      // protected price/spam chrome ("$$$ BUY NOW $$$", "costs $5 and $10")
      // verbatim and exempted it from every prose rule
      val mathLine =
        l.rlike("\\$[^$\\s](?:[^$]*[^$\\s])?\\$")
      val protect = inFence || isMarker(l) || mathLine
      struct(l.as("line"), protect.as("prot"),
        when(protect, l).otherwise(when(prose(l), trim(l))).as("kept"))
    })
    val keptArr = filter(dec, x => x.getField("kept").isNotNull)
    val proseKept = filter(dec,
      x => x.getField("kept").isNotNull && !x.getField("prot"))
    docs.select(col(idCol), col(textCol).as("text_orig"))
      .withColumn("n_lines", nLinesCol)
      .withColumn("n_kept", size(keptArr).cast("long"))
      .withColumn("n_protected",
        size(filter(dec, x => x.getField("prot"))).cast("long"))
      .withColumn("text",
        array_join(transform(keptArr, x => x.getField("kept")), "\n"))
      .withColumn("n_sentences",
        length(regexp_replace(
          array_join(transform(proseKept, x => x.getField("kept")), "\n"),
          "[^.!?]", "")).cast("long"))
      .withColumn("keep_doc",
        !exists(dec, x => !x.getField("prot") &&
          x.getField("line").contains("{")) &&
          !lower(coalesce(col("text_orig"), lit(""))).contains("lorem ipsum") &&
          col("n_sentences") >= minSentences)
      .select(col(idCol), col("keep_doc"), col("n_lines"), col("n_kept"),
        col("n_protected"), col("n_sentences"), col("text"))
  }

  /** Rebuild (idCol, text, n_lines, `keptCountName`) from a kept-line frame
    * (id, idx, line): per-doc collect + sort by idx + join back to the full
    * doc list so line-less documents survive with text = ''. Both the
    * groupBy and the join key on the uniform doc id. */
  private def reassemble(docs: DataFrame, idCol: String, textCol: String,
                         kept: DataFrame, keptCountName: String): DataFrame = {
    val rebuilt = kept.groupBy("id")
      .agg(count(lit(1)).as(keptCountName),
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("idx"), col("line")))),
            x => x.getField("line"))).as("text"))
    docs.select(col(idCol), col(textCol).as("text_orig"))
      .withColumn("n_lines", nLinesCol)
      .join(rebuilt.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("text"), lit("")).as("text"),
        col("n_lines"), coalesce(col(keptCountName), lit(0L)).as(keptCountName))
  }
}
