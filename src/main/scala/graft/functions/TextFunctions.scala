package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  * All pure Column expressions (codegen-friendly, no UDFs): at 100 TB these
  * run inside the scan stage with no extra shuffle.
  */
object TextFunctions {

  /** Whitespace tokenizer; empty tokens dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Distinct token set (bag-of-words support for Jaccard / fingerprints). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Zero-width / invisible code points an evasive duplicate hides behind:
    * ZWSP, ZWNJ, ZWJ, BOM-as-ZWNBSP, soft hyphen. Stripped (not mapped)
    * by [[foldConfusables]]. */
  val ZeroWidthRe = "[\\u200B\\u200C\\u200D\\uFEFF\\u00AD]"

  /** Curated homoglyph table — the HIGH-FREQUENCY evasion alphabet (a BMP
    * subset of Unicode TR#39 confusables): Cyrillic and Greek letters that
    * render identically to Latin, plus NBSP→space. One codepoint per slot
    * so both Spark's and DuckDB's `translate` apply it identically;
    * deliberately NOT the full TR#39 table (that is font-dependent — this
    * is the set spam and SEO text actually uses). */
  val ConfusablesFrom: String =
    "аеорсухіѕј" + // cyr lower
    "АВЕКМНОРСТХ" + // cyr upper
    "οΑΒΕΖΗΙΚΜΝΟΡΤΥΧ" + // greek
    " " // NBSP
  val ConfusablesTo: String =
    "aeopcyxisj" +
    "ABEKMHOPCTX" +
    "oABEZHIKMNOPTYX" +
    " "

  /** Confusable folding — the dedup-EVASION counter: a copied document that
    * swaps Latin letters for identical-looking Cyrillic/Greek ones and
    * sprinkles zero-width characters hashes differently, walks straight
    * through exact dedup, and re-enters the corpus. Folding strips the
    * invisibles and maps the curated homoglyph alphabet back to Latin so
    * the content hash sees what the READER sees. Pure codegen'd Column
    * tree (regexp_replace + translate), scan-stage, stream-safe. */
  def foldConfusables(text: Column): Column =
    translate(regexp_replace(text, ZeroWidthRe, ""),
      ConfusablesFrom, ConfusablesTo)

  /** BPE-ish sub-token count: alphabetic runs, digit runs, and single
    * non-alnum symbols each count as one token (a cheap, deterministic proxy
    * for a byte-pair-encoded length used for budget accounting). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Word k-shingles (for MinHash / n-gram Jaccard): contiguous k-grams of the
    * whitespace tokens, joined with a single space.
    *
    * Built by zipping the token array with its own k-1 shifted slices
    * (`zip_with` evaluates each array argument once per ROW) instead of a
    * positional `transform` lambda over `slice(toks, i, k)` — a lambda body
    * re-evaluates captured expressions per ELEMENT, which re-ran the regex
    * tokenizer once per shingle position: O(n²) splits per document and a
    * measured 8× slowdown on the near-dup pipeline. `concat_ws` skips the
    * nulls zip_with pads the shorter slices with; the trailing k-1 partial
    * shingles are cut by the slice. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val joined = (1 until k).foldLeft(toks) { (acc, i) =>
      zip_with(acc, slice(toks, lit(i + 1), n), (a, b) => concat_ws(" ", a, b))
    }
    when(n >= k, slice(joined, lit(1), n - (k - 1)))
      .otherwise(array(array_join(toks, " ")))
  }

  /** Character k-shingles of the raw lowercased text (near-dup feature space
    * robust to tokenization differences; standard for short/noisy text).
    * Same zip-with-shifted-slices construction as [[shingles]] (the substr-
    * per-position lambda re-lowered the text per element — O(n²)/row);
    * `concat` nulls out the trailing partial entries, which the slice cuts. */
  def charShingles(text: Column, k: Int): Column = {
    val t = lower(text)
    val n = length(t)
    val chars = split(t, "")
    val joined = (1 until k).foldLeft(chars) { (acc, i) =>
      zip_with(acc, slice(chars, lit(i + 1), size(chars)), (a, b) => concat(a, b))
    }
    when(n >= k, slice(joined, lit(1), n - (k - 1))).otherwise(array(t))
  }

  /** Default English stopword list — deliberately small so the oracle SQL
    * stays readable; production cleaners pass their own list (any size: the
    * hit test compiles to an `IN` expression, and Catalyst converts large
    * lists to a hash-set probe). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "is", "it", "that")

  /** Stopword-hit ratio against a caller-supplied list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
    when(size(toks) > 0, hits.cast("double") / size(toks)).otherwise(0.0)
  }

  def stopwordRatio(text: Column): Column = stopwordRatio(text, Stopwords)

  /** Punctuation-character ratio of the raw text. */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    val p = n - length(regexp_replace(text, "[\\p{Punct}]", ""))
    when(n > 0, p.cast("double") / n).otherwise(0.0)
  }

  /** Mean token length. */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks)
    ).otherwise(0.0)
  }

  /** Sentence count: non-blank segments between [.!?]+ runs, min 1 (text
    * with no terminator is one sentence). Scan-stage. */
  def sentenceCount(text: Column): Column =
    greatest(lit(1),
      size(filter(split(text, "[.!?]+"), s => length(trim(s)) > 0)))

  /** Heuristic syllable count: vowel-group ([aeiouy]+) runs per token, min 1
    * per token, summed exactly (integer fold — order-independent). The
    * standard dictionary-free approximation readability formulas are
    * calibrated against. */
  def syllableCount(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, w) =>
      acc + greatest(lit(1), size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0)))))

  /** Flesch reading ease: 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words). Counts are integer-exact; the two ratios and
    * the affine combination are evaluated in this literal order on every
    * engine, so the double is reproducible. Empty text scores null-free 0. */
  def fleschReadingEase(text: Column): Column = {
    val w = tokenCount(text).cast("double")
    val s = sentenceCount(text).cast("double")
    val sy = syllableCount(text).cast("double")
    when(w > 0,
      lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (sy / w))
      .otherwise(lit(0.0))
  }

  /** Flesch–Kincaid grade level: 0.39·(words/sentences) +
    * 11.8·(syllables/words) − 15.59 (same reproducibility contract). */
  def fkGradeLevel(text: Column): Column = {
    val w = tokenCount(text).cast("double")
    val s = sentenceCount(text).cast("double")
    val sy = syllableCount(text).cast("double")
    when(w > 0,
      lit(0.39) * (w / s) + lit(11.8) * (sy / w) - lit(15.59))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: length band + stopword presence +
    * low punctuation + sane word length. Heuristic quality filter for
    * pretraining-style corpora. */
  def qualityScore(text: Column): Column = qualityScore(text, Stopwords)

  /** As [[qualityScore]] with a caller-supplied stopword list (the stopword
    * presence term is the only list-dependent component). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenOk = when(length(text).between(50, 10000), 0.4).otherwise(0.0)
    val stopOk = when(stopwordRatio(text, stopwords) > 0.01, 0.2).otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.2, 0.2).otherwise(0.0)
    val wordOk = when(avgTokenLen(text).between(2.0, 12.0), 0.2).otherwise(0.0)
    lenOk + stopOk + punctOk + wordOk
  }

  /** Language-ID by marker-token votes (n-gram-free heuristic: counts hits of
    * per-language function words; highest hit count wins, ties by list order;
    * no hits -> "und").
    *
    * The default marker table is deliberately tiny (deterministic gates, small
    * oracle SQL); a production cleaner passes its own `markers` — more
    * languages and bigger per-language lists change only the generated
    * expression width, never the plan shape (still one scan-stage pass). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "zh" -> Seq("de", "shi", "zai", "le", "he"))

  def langId(text: Column): Column = langId(text, LangMarkers)

  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val toks = tokens(text)
    // hits per language as one array; winner = first index achieving the
    // max (array_position returns the first occurrence), which is exactly
    // "replace only on strictly greater" fold semantics. A when-chain
    // reduceLeft over structs would duplicate the accumulated tree at every
    // step — exponential expression size in the number of languages.
    val hits = array(markers.map { case (_, ms) =>
      size(filter(toks, t => t.isin(ms.map(lit): _*)))
    }: _*)
    val langs = array(markers.map { case (lang, _) => lit(lang) }: _*)
    val mx = array_max(hits)
    when(mx > 0, element_at(langs, array_position(hits, mx).cast("int")))
      .otherwise("und")
  }

  /** Duplicate-line fraction (a Gopher/C4-style repetition quality signal):
    * 1 - distinct_lines / lines over non-empty trimmed lines; 0.0 for
    * documents with no lines. High values flag boilerplate/spam. */
  def dupLineFraction(text: Column): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    when(size(lines) > 0,
      lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines))
      .otherwise(0.0)
  }

  /** Fraction of tokens inside duplicated word 2-grams (repetition signal #2:
    * catches within-line loops that line-dedup misses): duplicated = a
    * 2-gram occurring more than once; fraction = dup 2-gram count / total
    * 2-grams, 0.0 when fewer than 2 tokens. */
  def dupBigramFraction(text: Column): Column = {
    val grams = shingles(text, 2) // NOT distinct: duplicates are the signal
    val n = size(grams)
    when(size(tokens(text)) >= 2,
      (n - size(array_distinct(grams))).cast("double") / n)
      .otherwise(0.0)
  }

  /** Gopher-style structural quality signals (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", §A1.1 data filtering): cheap boilerplate
    * detectors a pretraining cleaner runs beside [[qualityScore]]. All pure
    * scan-stage ratios of integer counts — exactly mirrorable in oracle
    * SQL with zero floating-point drift. */

  /** (# of '#' characters + # of "..."/"…" ellipses) per word — Gopher's
    * symbol-to-word ratio (cut above 0.1). */
  def symbolWordRatio(text: Column): Column = {
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ell = size(regexp_extract_all(text, lit("\\.\\.\\.|…"), lit(0)))
    val n = tokenCount(text)
    when(n > 0, (hashes + ell).cast("double") / n).otherwise(0.0)
  }

  /** Fraction of non-empty lines starting with a bullet marker
    * (Gopher cuts documents with > 90 % bullet lines). */
  def bulletLineFraction(text: Column): Column =
    lineFraction(text, l => trim(l).rlike("^[-*•]"))

  /** Fraction of non-empty lines ending in an ellipsis (truncated
    * previews / "read more" boilerplate; Gopher cuts > 30 %). */
  def ellipsisLineFraction(text: Column): Column =
    lineFraction(text, l => trim(l).rlike("(\\.\\.\\.|…)$"))

  /** Fraction of words containing at least one ASCII letter (Gopher keeps
    * documents with >= 80 % alphabetic words). */
  def alphaWordFraction(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / size(toks))
      .otherwise(0.0)
  }

  /** Fraction of non-empty lines matching `p` (0.0 on empty docs). */
  private def lineFraction(text: Column, p: Column => Column): Column = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    when(size(lines) > 0,
      size(filter(lines, p)).cast("double") / size(lines))
      .otherwise(0.0)
  }

  /** Duplicate-line REMOVAL (the C4-style cleaner the [[dupLineFraction]]
    * signal motivates): keep the first occurrence of every line, in order.
    * Built as a linear fold over the split lines — `when(contains(acc, l),
    * acc).otherwise(append)` — NOT as a positional filter against
    * `array_position(lines, l)`, whose lambda would re-evaluate the captured
    * split per ELEMENT (the O(n²)-per-row trap documented on [[shingles]]).
    * Exact line match, no trimming: whitespace variants are different lines
    * (same contract as [[dupLineFraction]]'s distinct count would suggest
    * for trimmed lines — callers wanting trimmed semantics pre-trim). */
  def dedupLines(text: Column): Column =
    array_join(
      aggregate(
        split(text, "\n"),
        array().cast("array<string>"),
        (acc, l) => when(array_contains(acc, l), acc)
          .otherwise(concat(acc, array(l)))),
      "\n")

  /** Order-insensitive document fingerprint: md5 of the sorted distinct token
    * set (OpenRefine-style key collision fingerprint). Two documents with the
    * same bag of words collide. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(tokenSet(text)), " "))

  /** Polynomial rolling hash of the full text (mod 2^31-1, base 257) —
    * content-defined fingerprint with cheap incremental structure. The
    * modulus is kept below 2^31 so every intermediate (acc*257 + ch) fits a
    * 64-bit signed integer without wrapping: the fold is then exactly
    * reproducible in any engine with plain BIGINT arithmetic. */
  def rollingHash(text: Column): Column = {
    val prime = lit(2147483647L) // 2^31 - 1
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, ch) => pmod(acc * 257L + coalesce(ascii(ch).cast("long"), lit(0L)), prime))
  }
}
