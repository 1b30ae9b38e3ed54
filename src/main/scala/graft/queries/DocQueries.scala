package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Parallelism, Tables}
import graft.functions.{ExactAgg, TextFunctions, VectorFunctions}
import graft.operators.{Bloom, Dedup, Lines, Multimodal, RetrievalEval, Similarity}


/** Training-data-pipeline half of the operator inventory: text analysis,
  * deduplication (exact / Jaccard / MinHash-LSH / SimHash / embedding-cosine),
  * similarity search, multimodal plumbing — over the `documents` and
  * `embeddings` tables — plus the weather-transform parity queries over the
  * reference fixtures with literal-value oracles.
  *
  * Oracle-parity rules (see [[Q]]): all double arithmetic is written with an
  * identical, fully-determined evaluation order on both engines (sequential
  * folds for vector math, integer-exact ratios, decimal-exact sums), so the
  * driver's hash compare sees bit-identical values.
  */
object DocQueries {

  /** Gate-internal persists route through the harness-owned
    * [[graft.core.CacheScope]] gate handle: the harness (Verify/Bench)
    * begins a gate, materializes its output, releases the handle, and
    * ASSERTS zero residue — so a 300-gate sweep accumulates nothing.
    * Outside a harness the handle is detached and this is a plain
    * MEMORY_AND_DISK persist (the historical persist-until-swept
    * contract). */
  private implicit class GatePersistOps(private val df: DataFrame) {
    def gatePersist(): DataFrame = graft.core.CacheScope.gatePersist(df)
  }

  /** documents with the compute-dense-stage parallelism guard applied (the
    * text-stat expression trees do all their work in the scan stage). */
  private def docsP(s: SparkSession, d: String): DataFrame =
    Parallelism.fanOut(Tables.documents(s, d))

  /** Word 3-shingle feature set (distinct). At scale this is the right
    * near-dup feature space: shingle document frequencies stay low even when
    * the word vocabulary is small, keeping the inverted-index self-join
    * near-linear instead of quadratic. */
  private val ShingleK = 3
  private def shingleSet(t: Column): Column =
    array_distinct(TextFunctions.shingles(t, ShingleK))

  /** Deterministic multi-line "pages" for the line-dedup gates: the corpus
    * text has no newlines, so 25 pages are assembled from the documents
    * (lines ordered by doc_id). Every doc_id % 3 == 0 document contributes
    * the same boilerplate footer line; the rest their 8-token prefix —
    * giving the line space a real zipfian heavy tail. */
  private val BoilerLine = "all rights reserved boilerplate footer"
  private def linePages(s: SparkSession, d: String): DataFrame =
    docsP(s, d).select((col("doc_id") % 25).as("page_id"), col("doc_id"),
        when(col("doc_id") % 3 === 0, lit(BoilerLine))
          .otherwise(array_join(slice(split(col("text"), " "), 1, 8), " ")).as("line"))
      .groupBy("page_id")
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("doc_id"), col("line")))),
          x => x.getField("line"))).as("text"))

  /** DuckDB mirror of [[linePages]] + the exploded non-blank line frame
    * (idx is 1-based on the oracle side — only its ORDER is consumed). */
  private val LinePagesSql =
    s"""pg AS (SELECT doc_id % 25 AS page_id, doc_id,
       |  CASE WHEN doc_id % 3 = 0 THEN '$BoilerLine'
       |    ELSE array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')
       |    END AS line FROM documents),
       |pages AS (SELECT page_id, string_agg(line, chr(10) ORDER BY doc_id) AS text
       |  FROM pg GROUP BY 1),
       |ls0 AS (SELECT page_id, unnest(string_split(text, chr(10))) AS line,
       |  unnest(range(1, len(string_split(text, chr(10))) + 1)) AS idx FROM pages),
       |ls AS (SELECT * FROM ls0 WHERE length(trim(line)) > 0)""".stripMargin

  // ---------- shared DuckDB SQL fragments (mirror the Spark expressions) ----
  /** tokens: lower, split on \s+, drop empties — mirrors TextFunctions.tokens. */
  private[queries] val ToksSql =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)"""

  /** Phrase list for the multi-pattern (Aho–Corasick) screen gates: spans
    * token boundaries, includes self-overlapping phrases ("a a" in
    * "a a a" counts twice) and a never-firing entry (the list-audit case). */
  private val MultiMatchPats = Seq("table table", "a a", "fast sort",
    "scan query", "value", "spark part filter", "zz-never-hits")

  /** One unrolled batch-GD iteration for the logistic-filter oracle —
    * margins off w{t-1}/bias{t-1}, 9-decimal-rounded sigmoid errors, exact
    * decimal gradient sums, per-slot IEEE updates (mirrors
    * QualityClassifier.trainLogistic step for step). */
  private def logitIterCtes(t: Int): String = {
    val bp = if (t == 1) "CAST(0 AS DECIMAL(19,9))"
      else s"(SELECT v FROM bias${t - 1})"
    val mDef =
      if (t == 1)
        s"m$t AS (SELECT doc_id, y, CAST($bp AS DECIMAL(28,9)) AS m FROM yy)"
      else {
        val w = s"w${t - 1}"
        s"""m$t AS (SELECT yy.doc_id, yy.y,
           |  CAST(COALESCE(s.s, 0) AS DECIMAL(28,9)) + CAST($bp AS DECIMAL(28,9)) AS m
           |  FROM yy LEFT JOIN (SELECT xb.doc_id,
           |      sum(CAST(COALESCE($w.w, 0) AS DECIMAL(19,9)) * xb.cnt) AS s
           |    FROM xb LEFT JOIN $w ON $w.b = xb.b GROUP BY 1) s
           |  ON s.doc_id = yy.doc_id)""".stripMargin
      }
    val wJoin = if (t == 1) "" else s" LEFT JOIN w${t - 1} ON w${t - 1}.b = g$t.b"
    val wPrev = if (t == 1) "CAST(0 AS DECIMAL(19,9))"
      else s"CAST(COALESCE(w${t - 1}.w, 0) AS DECIMAL(19,9))"
    s"""$mDef,
       |e$t AS (SELECT doc_id, CAST(y - CAST(round(1.0/(1.0+exp(-CAST(m AS DOUBLE))), 9) AS DECIMAL(10,9)) AS DECIMAL(10,9)) AS e FROM m$t),
       |g$t AS (SELECT b, sum(cnt * e) AS g FROM xb JOIN e$t USING (doc_id) GROUP BY 1),
       |w$t AS (SELECT g$t.b, CAST(round(CAST($wPrev AS DOUBLE) + (SELECT v FROM lr) * CAST(g AS DOUBLE), 9) AS DECIMAL(19,9)) AS w FROM g$t$wJoin),
       |bg$t AS (SELECT CAST(sum(e) AS DECIMAL(28,9)) AS g FROM e$t),
       |bias$t AS (SELECT CAST(round(CAST($bp AS DOUBLE) + (SELECT v FROM lr) * CAST(g AS DOUBLE), 9) AS DECIMAL(19,9)) AS v FROM bg$t)""".stripMargin
  }

  /** Full logistic-filter training + scoring CTE chain (3 iterations over
    * :lg1 hashed-unigram buckets, weak labels `labelSql` evaluated against
    * `scored`, final per-doc decimal margin in `sc(doc_id, n_tokens, m)`).
    * Requires qualityLangCtes in scope; shared by the logit gate and the
    * filter bake-off. */
  private def logitTrainSql(labelSql: String, salt: String = ":lg1"): String =
    s"""xb AS (SELECT u.doc_id, ${fp60Sql(s"tok || '$salt'")} % 4096 AS b,
       |    CAST(count(*) AS DECIMAL(10,0)) AS cnt
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t0) u GROUP BY 1, 2),
       |yy AS (SELECT doc_id, CAST(CASE WHEN $labelSql THEN 1.0 ELSE 0.0 END AS DECIMAL(10,9)) AS y FROM scored),
       |lr AS (SELECT CAST(0.5 AS DOUBLE) / count(*) AS v FROM yy),
       |${logitIterCtes(1)},
       |${logitIterCtes(2)},
       |${logitIterCtes(3)},
       |pd AS (SELECT xb.doc_id, CAST(sum(xb.cnt) AS BIGINT) AS ntok,
       |    sum(CAST(COALESCE(w3.w, 0) AS DECIMAL(19,9)) * xb.cnt) AS s
       |  FROM xb LEFT JOIN w3 ON w3.b = xb.b GROUP BY 1),
       |sc AS (SELECT d.doc_id, CAST(COALESCE(pd.ntok, 0) AS BIGINT) AS n_tokens,
       |    CAST(COALESCE(pd.s, 0) AS DECIMAL(28,9))
       |      + CAST((SELECT v FROM bias3) AS DECIMAL(28,9)) AS m
       |  FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id)""".stripMargin

  /** Occurrence CTE mirroring MultiMatch semantics exactly: every position
    * where the pattern starts, overlapping included — a contains-prefiltered
    * candidate set crossed with a constant position series (DuckDB's
    * generate_series cannot correlate on len(text); 4096 comfortably bounds
    * the synthetic docs' ~600 chars). */
  private val MultiMatchOccSql = {
    val vals = MultiMatchPats.map(p => s"('$p')").mkString(", ")
    s"""pats(pat) AS (VALUES $vals),
       |cand AS (SELECT d.doc_id, d.text, p.pat
       |  FROM documents d JOIN pats p ON contains(d.text, p.pat)),
       |pos AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, 4096) g(i)),
       |occ AS (SELECT doc_id, pat, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM cand JOIN pos ON pos.i + len(pat) - 1 <= len(text)
       |  WHERE substr(text, pos.i, CAST(len(pat) AS INT)) = pat
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** Distinct word 3-shingles of `toks` — mirrors TextFunctions.shingles(3)
    * followed by array_distinct. */
  /** DISTINCT word k-shingles of `toks` — mirrors
    * `array_distinct(TextFunctions.shingles(text, k))` including the
    * short-document collapse to one whole-text shingle. */
  private def shinglesSqlK(k: Int): String =
    s"""list_distinct(CASE WHEN len(toks) >= $k
       | THEN list_transform(range(1, len(toks) - ${k - 2}),
       |   i -> array_to_string(toks[i:i+${k - 1}], ' '))
       | ELSE [array_to_string(toks, ' ')] END)""".stripMargin

  private val ShinglesSql = shinglesSqlK(ShingleK)

  /** Span-dedup shingle width: 8 tokens is the C4-ish "long enough to be
    * boilerplate, short enough to catch it" middle ground at gate scale.
    * (The span-DECONTAMINATION gates use Decontaminate's shingleK = 3
    * instead — benchmark overlap is deliberately a wider net.) */
  private val SpanK = 8

  /** POSITIONAL (non-distinct, in order) word k-shingles of `toks` —
    * mirrors TextFunctions.shingles(k) without the array_distinct, because
    * span operators need every occurrence at its position. */
  private def spanShinglesSql(k: Int): String =
    s"""(CASE WHEN len(toks) >= $k
       | THEN list_transform(range(1, len(toks) - ${k - 2}),
       |   i -> array_to_string(toks[i:i+${k - 1}], ' '))
       | ELSE [array_to_string(toks, ' ')] END)""".stripMargin

  /** CTE chain mirroring the Spark span machinery
    * (Dedup.positionalShingleEdges + mergeSpans): positional fp60 shingles
    * over the (optionally `docFilter`-restricted) documents, a caller-chosen
    * `sharedCte` defining `shared(fp)` (cross-document df for span dedup,
    * the benchmark fingerprint set for span decontamination), lag/cumsum
    * islands, ending in `sp0(doc_id, n_toks, a, b2)` with 1-based inclusive
    * span bounds. One definition feeds all four span oracles, so they can't
    * drift. Defs, not vals: they interpolate `TokenFp60Sql`, declared
    * further down the object — an eager val here would capture it as the
    * string "null" (Scala initialization order; defs evaluate at gate-map
    * construction, after every val). */
  /** Positional-edge CTEs t/s0/c/f ending in f(doc_id, n_toks, pos, fp) —
    * mirrors Dedup.positionalShingleEdges over the `from` relation. */
  private def spanEdgeCtes(k: Int, docFilter: String, from: String): String = {
    val where = if (docFilter.isEmpty) "" else s" WHERE $docFilter"
    s"""t AS (SELECT doc_id, $ToksSql AS toks FROM $from),
       |s0 AS (SELECT doc_id, len(toks) AS n_toks, ${spanShinglesSql(k)} AS sh FROM t$where),
       |c AS (SELECT doc_id, n_toks, unnest(sh) AS tok,
       |  unnest(range(1, len(sh) + 1)) AS pos FROM s0),
       |f AS (SELECT doc_id, n_toks, pos, $TokenFp60Sql AS fp FROM c)""".stripMargin
  }

  /** Islands CTEs b/i/sp0 (mirrors Dedup.mergeSpans) — expects a CTE
    * `g(doc_id, n_toks, pos)` of flagged positions. */
  private def spanIslandCtes(k: Int): String =
    s"""b AS (SELECT doc_id, n_toks, pos, CASE WHEN pos - lag(pos) OVER
       |  (PARTITION BY doc_id ORDER BY pos) > $k THEN 1 ELSE 0 END AS brk
       |  FROM g),
       |i AS (SELECT doc_id, n_toks, pos, sum(brk) OVER (PARTITION BY doc_id
       |  ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island FROM b),
       |sp0 AS (SELECT doc_id, n_toks, min(pos) AS a,
       |  least(max(pos) + ${k - 1}, n_toks) AS b2
       |  FROM i GROUP BY doc_id, n_toks, island)""".stripMargin

  private def spanCteChain(k: Int, docFilter: String, sharedCte: String,
                           from: String = "documents"): String =
    s"""${spanEdgeCtes(k, docFilter, from)},
       |$sharedCte,
       |g AS (SELECT doc_id, n_toks, pos FROM f
       |  WHERE fp IN (SELECT fp FROM shared)),
       |${spanIslandCtes(k)}""".stripMargin

  /** Seeded self-repeat relation for the within-doc span gates: each
    * document's first 10 tokens appended to its end — mirrors the Spark
    * side's concat_ws + slice seeding. */
  private val SeededTailSql =
    s"""sd AS (SELECT doc_id,
       |  text || ' ' || array_to_string(($ToksSql)[1:10], ' ') AS text
       |  FROM documents)""".stripMargin

  /** Within-document variant: flags REPEAT occurrences of a shingle inside
    * one document (first occurrence never flagged) — mirrors
    * Dedup.repeatedSpansWithinDoc. */
  private def spanWithinCteChain(k: Int, from: String): String =
    s"""${spanEdgeCtes(k, "", from)},
       |g AS (SELECT doc_id, n_toks, pos FROM (SELECT doc_id, n_toks, pos,
       |  row_number() OVER (PARTITION BY doc_id, fp ORDER BY pos) AS occ
       |  FROM f) WHERE occ > 1),
       |${spanIslandCtes(k)}""".stripMargin

  /** shared(fp) for SPAN DEDUP: fingerprints in >= 2 distinct documents. */
  private val DupSharedCte =
    """shared AS (SELECT fp FROM (SELECT DISTINCT doc_id, fp FROM f)
      |  GROUP BY fp HAVING count(*) >= 2)""".stripMargin

  /** shared(fp) for SPAN DECONTAMINATION: the benchmark split's distinct
    * shingle fingerprints (same doc_id % 20 = 0 split as q_decontaminate). */
  private def benchSharedCte(k: Int): String =
    s"""bs AS (SELECT doc_id, ${spanShinglesSql(k)} AS sh FROM t WHERE doc_id % 20 = 0),
       |bc AS (SELECT unnest(sh) AS tok FROM bs),
       |shared AS (SELECT DISTINCT $TokenFp60Sql AS fp FROM bc)""".stripMargin

  /** Final select for the span-frame gates. */
  private val SpanSelectTail =
    """SELECT doc_id, CAST(a AS BIGINT) AS span_start,
      | CAST(b2 AS BIGINT) AS span_end,
      | CAST(b2 - a + 1 AS BIGINT) AS n_tokens
      |FROM sp0 ORDER BY doc_id, span_start""".stripMargin

  /** Cut CTEs: rebuild each (`docFilter`-restricted) document's tokens minus
    * the flagged spans, ending in `cutk(doc_id, n_tokens, kt)` — mirrors
    * Dedup.cutSpans. */
  private def spanCutCtes(docFilter: String): String = {
    val where = if (docFilter.isEmpty) "" else s" WHERE $docFilter"
    s"""sp AS (SELECT doc_id, list({'a': a, 'b': b2}) AS spans
       |  FROM sp0 GROUP BY doc_id),
       |j AS (SELECT t2.doc_id, t2.toks, sp.spans
       |  FROM (SELECT * FROM t$where) t2
       |  LEFT JOIN sp ON t2.doc_id = sp.doc_id),
       |cutk AS (SELECT doc_id, len(toks) AS n_tokens,
       |  CASE WHEN spans IS NULL THEN toks
       |   ELSE list_filter(toks, (x, i) ->
       |     len(list_filter(spans, s -> i >= s.a AND i <= s.b)) = 0)
       |  END AS kt FROM j)""".stripMargin
  }

  /** CTE chain t0/h0/g0/scored mirroring TextFunctions.qualityScore +
    * langId over `from` (must expose doc_id, text, source):
    * scored(doc_id, text, source, n_toks, quality, lang). One definition
    * for every oracle that gates on quality/language. */
  /** The 4-rule quality score (mirrors TextFunctions.qualityScore) as a
    * SQL expression over `text` and `toks` columns in scope — a def so it
    * dodges the fragment-declaration-order gotcha. */
  private def qualityExprSql: String =
    s"""((((CASE WHEN length(text) BETWEEN 50 AND 10000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
       | + (CASE WHEN $StopRatioSql > 0.01 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
       | + (CASE WHEN $PunctRatioSql < 0.2 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
       | + (CASE WHEN $AvgTokLenSql BETWEEN 2.0 AND 12.0 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))""".stripMargin

  private[queries] def qualityLangCtes(from: String): String = {
    val langNames = TextFunctions.LangMarkers.map(_._1)
    val langHits = TextFunctions.LangMarkers.map { case (lang, ms) =>
      s"len(list_filter(toks, x -> x IN (${ms.map(m => s"'$m'").mkString(", ")}))) AS h_$lang"
    }.mkString(", ")
    val greatest = s"greatest(${langNames.map("h_" + _).mkString(", ")})"
    val langCase = langNames.map(l => s"WHEN h_$l = m THEN '$l'").mkString(" ")
    s"""t0 AS (SELECT doc_id, text, source, $ToksSql AS toks FROM $from),
       |h0 AS (SELECT *, $langHits FROM t0),
       |g0 AS (SELECT *, $greatest AS m FROM h0),
       |scored AS (SELECT doc_id, text, source, CAST(len(toks) AS BIGINT) AS n_toks,
       | $qualityExprSql AS quality,
       | CASE WHEN m = 0 THEN 'und' $langCase END AS lang
       |FROM g0)""".stripMargin
  }

  /** The trained-lang-id pipeline shared by the langid gates: one feature
    * fold (persisted — train and score both read it), multiclass NB
    * trained on the hash-split 80% with the table's own lang labels, the
    * held-out 20% scored and joined back to truth. `charGrams` swaps the
    * token-unigram fold for the fastText-tier char 3–5-gram fold — the
    * SAME trainer/scorer over a different feature space. */
  private def langIdScored(s: org.apache.spark.sql.SparkSession,
                           d: String, charGrams: Boolean = false): DataFrame = {
    import graft.operators.{LangClassifier, QualityClassifier, Sampling}
    val docs = Tables.documents(s, d)
    val salt = if (charGrams) ":lc1" else ":li1"
    val fold = (if (charGrams)
        QualityClassifier.charGramFold(docs, "doc_id", "text",
          buckets = 4096, salt = salt)
      else QualityClassifier.tokenFold(docs, "doc_id", "text",
        buckets = 4096, salt = salt))
      .gatePersist()
    val split = Sampling.split(col("doc_id"), 80, 10, salt = ":li1s")
    val labels = docs.filter(split === "train").select("doc_id", "lang")
    val test = docs.filter(split =!= "train")
    val m = LangClassifier.trainLangNb(fold, labels, buckets = 4096,
      salt = salt)
    LangClassifier.scoreLang(test.select("doc_id"), "doc_id",
        fold.join(test.select("doc_id"), Seq("doc_id"), "left_semi"), m)
      .join(test.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("lang_pred"),
        (col("lang") === col("lang_pred")).as("correct"),
        col("n_tokens"), col("score"))
  }

  /** The DuckDB mirror of [[langIdScored]] up to the ranked per-language
    * posterior table `rk` (rn = 1 is the prediction) and the per-doc token
    * counts `nt` — the full NB model unrolled in the decimal discipline.
    * The per-token llk sum is bit-identical to the Spark side's
    * cnt-weighted sum because every token in a bucket carries the same
    * decimal llk. `scoreAll` scores EVERY document (the production
    * routing shape — the model still trains on the 80% split only);
    * default scores the held-out 20%. `featureCte` overrides the feature
    * stream `e(doc_id, b)` — one bucket row per feature OCCURRENCE — so
    * the char-gram mirror swaps only the feature space (the
    * [[langIdScored]] contract on the Spark side). */
  private def langNbCtes(scoreAll: Boolean = false,
                         featureCte: String = ""): String = {
    val teWhere = if (scoreAll) "" else " WHERE sp.bk >= 80"
    val e = if (featureCte.nonEmpty) featureCte else
      s"""e AS (SELECT doc_id, ${fp60Sql("tok || ':li1'")} % 4096 AS b
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM li0))""".stripMargin
    s"""li0 AS (SELECT doc_id, lang, source, text, $ToksSql AS toks
       |  FROM documents),
       |$e,
       |f AS (SELECT doc_id, b, count(*) AS cnt FROM e GROUP BY 1, 2),
       |sp AS (SELECT doc_id,
       |    ${fp60Sql("CAST(doc_id AS VARCHAR) || ':li1s'")} % 100 AS bk
       |  FROM documents),
       |lab AS (SELECT d.doc_id, d.lang FROM documents d
       |  JOIN sp USING (doc_id) WHERE sp.bk < 80),
       |te AS (SELECT d.doc_id, d.lang FROM documents d
       |  JOIN sp USING (doc_id)$teWhere),
       |c AS (SELECT l.lang, f.b, sum(f.cnt) AS c FROM f
       |  JOIN lab l USING (doc_id) GROUP BY 1, 2),
       |t AS (SELECT lang, sum(c) AS t FROM c GROUP BY 1),
       |lg AS (SELECT lang, count(*) AS nd FROM lab GROUP BY 1),
       |nn AS (SELECT count(*) AS n, count(DISTINCT lang) AS k FROM lab),
       |m AS (SELECT c.b, c.lang, CAST(round(ln(
       |    (CAST(c.c AS DOUBLE) + CAST(1.0 AS DOUBLE))
       |      / CAST(t.t + 4096 AS DOUBLE)), 9) AS DECIMAL(19,9)) AS llk
       |  FROM c JOIN t USING (lang)),
       |dflt AS (SELECT g.lang, CAST(round(ln(
       |    CAST(1.0 AS DOUBLE)
       |      / CAST(COALESCE(t.t, 0) + 4096 AS DOUBLE)), 9)
       |  AS DECIMAL(19,9)) AS v FROM lg g LEFT JOIN t USING (lang)),
       |pri AS (SELECT g.lang, CAST(round(ln(
       |    CAST(g.nd + 1 AS DOUBLE)
       |      / CAST((SELECT n FROM nn) + (SELECT k FROM nn) AS DOUBLE)), 9)
       |  AS DECIMAL(28,9)) AS v FROM lg g),
       |sc AS (SELECT e.doc_id, L.lang, sum(COALESCE(m.llk, d2.v)) AS s
       |  FROM e JOIN te USING (doc_id)
       |  CROSS JOIN (SELECT lang FROM lg) L
       |  JOIN dflt d2 ON d2.lang = L.lang
       |  LEFT JOIN m ON m.b = e.b AND m.lang = L.lang
       |  GROUP BY 1, 2),
       |tot AS (SELECT te.doc_id, te.lang AS lang_true, L.lang,
       |    CAST(COALESCE(sc.s, 0) AS DECIMAL(28,9)) + p.v AS score
       |  FROM te CROSS JOIN (SELECT lang FROM lg) L
       |  JOIN pri p ON p.lang = L.lang
       |  LEFT JOIN sc ON sc.doc_id = te.doc_id AND sc.lang = L.lang),
       |rk AS (SELECT doc_id, lang_true, lang, score,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, lang ASC) AS rn
       |  FROM tot),
       |nt AS (SELECT f.doc_id, sum(f.cnt) AS n_tokens FROM f
       |  JOIN te USING (doc_id) GROUP BY 1)""".stripMargin
  }

  /** Final select for the cut gates. The coalesce covers DuckDB's
    * array_to_string([]) = NULL vs Spark's array_join([]) = ''. */
  private def spanCutTail(docFilter: String): String =
    s"""${spanCutCtes(docFilter)}
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       | CAST(n_tokens - len(kt) AS BIGINT) AS n_removed,
       | md5(coalesce(array_to_string(kt, ' '), '')) AS clean_md5
       |FROM cutk ORDER BY doc_id""".stripMargin

  /** Sequential-fold cosine over DOUBLE[] lists (DuckDB's list_dot_product is
    * a left-to-right fold — bit-identical to VectorFunctions.cosine). */
  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** Sequential-fold squared distance — mirrors the native `vec_dist2`
    * kernel (left-to-right sum of (x-y)*(x-y); the diff list is built with
    * DuckDB's 1-BASED index lambda, then dotted with itself). */
  private def d2Sql(a: String, b: String): String =
    s"list_dot_product(list_transform($a, (x, i) -> x - $b[i]), " +
      s"list_transform($a, (x, i) -> x - $b[i]))"

  /** Cross-engine-deterministic PQ codebooks for the PQ gates: m=8
    * subspaces x 16 codewords, each codeword the EXACT sequential-fold mean
    * (in vec_id order) of a hash-bucket of subvectors — the
    * q_dedup_semantic centroid trick lifted to subspaces, so both engines
    * derive bit-identical codebooks without k-means. The k-means-trained
    * path ([[graft.operators.Similarity.trainPq]]) is recall-bounded in
    * SimilaritySpec. */
  private def deterministicPq(emb: DataFrame): Similarity.PqCodebooks = {
    import graft.operators.{Centroids, Dedup}
    val e = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val (m, sub, nCodes) = (8, 8, 16)
    val cb = (0 until m).map { j =>
      e.select(col("vec_id"),
          pmod(Dedup.tokenFp60(concat(col("vec_id").cast("string"),
            lit(s":pq$j"))), lit(nCodes.toLong)).as("code"),
          slice(col("v"), j * sub + 1, sub).as("sv"))
        .groupBy("code")
        .agg(array((1 to sub).map(i =>
          Centroids.exactDimMean(col("vec_id"), element_at(col("sv"), i))): _*)
          .as("codeword"))
        .select(lit(j).as("subspace"), col("code").cast("int").as("code"),
          col("codeword"))
    }.reduce(_ unionByName _)
    Similarity.PqCodebooks(m, 64, nCodes, cb)
  }

  /** Brute force over PQ RECONSTRUCTIONS under the [[deterministicPq]]
    * codebooks — the shared oracle for both exhaustive-probe PQ gates
    * (flat `q_sim_topk_ivf_pq` and two-level `q_sim_topk_ivf2_pq`: with
    * every cell probed the coarse quantizer cannot affect the result, so
    * one oracle pins both layouts). Mirrors encode (argmin d2, ties to
    * lowest code), reconstruction (flatten in subspace order), and cosine
    * bit for bit. */
  private def PqTopKSql: String = PqTopKSqlWhere("TRUE")

  /** [[PqTopKSql]] with a candidate-side predicate over the embeddings
    * row (alias `e` — e.g. `e.label < 5`): brute force over the FILTERED
    * reconstructions, the oracle for the PQ-filtered search gates. The
    * unfiltered gates pass TRUE, so one mirror pins all four PQ probe
    * paths. */
  private def PqTopKSqlWhere(candPred: String): String = {
    val cbUnion = (0 until 8).map { j =>
      val dims = (1 to 8).map { i =>
        val g = j * 8 + i
        s"list_dot_product(list(v[$g] ORDER BY vec_id), " +
          s"list_transform(list(v[$g] ORDER BY vec_id), x -> 1.0)) " +
          s"/ len(list(v[$g] ORDER BY vec_id))"
      }.mkString(", ")
      s"""SELECT $j AS subspace, code, [$dims] AS codeword FROM (
         |  SELECT vec_id, v,
         |    ${fp60Sql(s"CAST(vec_id AS VARCHAR) || ':pq$j'")} % 16 AS code
         |  FROM e) GROUP BY code""".stripMargin
    }.mkString("\n UNION ALL\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
    |  FROM embeddings),
    |cb AS ($cbUnion),
    |enc0 AS (SELECT e.vec_id, cb.subspace, cb.code, cb.codeword,
    |  ${d2Sql("e.v[(cb.subspace * 8 + 1):(cb.subspace * 8 + 8)]", "cb.codeword")} AS d2
    |  FROM e CROSS JOIN cb),
    |enc AS (SELECT vec_id, subspace, codeword FROM (
    |  SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
    |    ORDER BY d2, code) AS rn FROM enc0) WHERE rn = 1),
    |recon AS (SELECT vec_id AS nbr_id,
    |  flatten(list(codeword ORDER BY subspace)) AS nbr_v
    |  FROM enc GROUP BY vec_id),
    |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
    |scored AS (SELECT query_id, nbr_id, ${cosSql("qv", "nbr_v")} AS cosine
    |  FROM recon JOIN e ON e.vec_id = recon.nbr_id CROSS JOIN q
    |  WHERE nbr_id != query_id AND ($candPred))
    |SELECT query_id, nbr_id, cosine,
    | row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rank
    |FROM scored QUALIFY rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** Bigram-LM scoring CTE chain — mirrors LanguageModel train + score
    * (stupid backoff, capped vocab/bigrams, <unk> normalization, per-token
    * log-probs rounded to 9 decimals as DECIMAL(28,9)). Expects a caller
    * CTE `tk(doc_id, ..., toks)` over the scorable documents; trains on the
    * `salt` 80% hash split of tk and ends in `sc(doc_id, lp)` — one row per
    * scored token. One definition feeds the perplexity gate and the
    * curation capstone, so the mirrors cannot drift. */
  private def pplCtes(vocabCap: Int, bigramCap: Int, salt: String): String =
    pplCtesWhere(vocabCap, bigramCap,
      s"${fp60Sql(s"CAST(doc_id AS VARCHAR) || '$salt'")} % 100 < 80", sfx = "")

  /** [[pplCtes]] with a parameterized reference-set predicate and a CTE
    * name suffix — two instances (e.g. an in-domain and a general model)
    * can coexist in one oracle (see the cross-entropy-selection gate).
    * Ends in `sc$sfx(doc_id, lp)`. */
  private def pplCtesWhere(vocabCap: Int, bigramCap: Int, refWhere: String,
                           sfx: String): String =
    s"""ref$sfx AS (SELECT tk.* FROM tk
       |  WHERE $refWhere),
       |re$sfx AS (SELECT doc_id, unnest(toks) AS tok FROM ref$sfx),
       |uraw$sfx AS (SELECT tok, count(*) AS c FROM re$sfx GROUP BY 1),
       |tot$sfx AS (SELECT COALESCE(sum(c), 0) AS n FROM uraw$sfx),
       |vocab$sfx AS (SELECT tok, c FROM uraw$sfx ORDER BY c DESC, tok LIMIT $vocabCap),
       |vs$sfx AS (SELECT count(*) AS u, COALESCE(sum(c), 0) AS cs FROM vocab$sfx),
       |uni0$sfx AS (SELECT tok, c FROM vocab$sfx UNION ALL
       |  SELECT '<unk>', (SELECT n FROM tot$sfx) - (SELECT cs FROM vs$sfx)),
       |uni$sfx AS (SELECT tok, sum(c) AS c FROM uni0$sfx GROUP BY 1),
       |rp$sfx AS (SELECT doc_id, unnest(toks) AS tok,
       |  unnest(range(1, len(toks) + 1)) AS pos FROM ref$sfx),
       |rn$sfx AS (SELECT rp$sfx.doc_id, rp$sfx.pos,
       |  CASE WHEN v.tok IS NULL THEN '<unk>' ELSE rp$sfx.tok END AS w
       |  FROM rp$sfx LEFT JOIN vocab$sfx v ON v.tok = rp$sfx.tok),
       |big$sfx AS (SELECT a.w AS prev, b.w AS w, count(*) AS cb
       |  FROM rn$sfx a JOIN rn$sfx b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |  GROUP BY 1, 2 ORDER BY cb DESC, prev, w LIMIT $bigramCap),
       |ep$sfx AS (SELECT doc_id, unnest(toks) AS tok,
       |  unnest(range(1, len(toks) + 1)) AS pos FROM tk),
       |en$sfx AS (SELECT ep$sfx.doc_id, ep$sfx.pos,
       |  CASE WHEN v.tok IS NULL THEN '<unk>' ELSE ep$sfx.tok END AS w
       |  FROM ep$sfx LEFT JOIN vocab$sfx v ON v.tok = ep$sfx.tok),
       |es$sfx AS (SELECT cur.doc_id, cur.pos, cur.w, prv.w AS prev
       |  FROM en$sfx cur LEFT JOIN en$sfx prv
       |  ON prv.doc_id = cur.doc_id AND prv.pos = cur.pos - 1),
       |sc$sfx AS (SELECT es$sfx.doc_id, es$sfx.pos,
       |  CAST(round(ln(CASE
       |    WHEN es$sfx.prev IS NULL THEN (CAST(COALESCE(u1.c, 0) AS DOUBLE) + 1.0)
       |      / CAST((SELECT n FROM tot$sfx) + (SELECT u FROM vs$sfx) + 1 AS DOUBLE)
       |    WHEN b.cb IS NOT NULL AND u2.c > 0
       |      THEN CAST(b.cb AS DOUBLE) / CAST(u2.c AS DOUBLE)
       |    ELSE 0.4 * ((CAST(COALESCE(u1.c, 0) AS DOUBLE) + 1.0)
       |      / CAST((SELECT n FROM tot$sfx) + (SELECT u FROM vs$sfx) + 1 AS DOUBLE))
       |  END), 9) AS DECIMAL(28,9)) AS lp
       |  FROM es$sfx LEFT JOIN big$sfx b ON b.prev = es$sfx.prev AND b.w = es$sfx.w
       |  LEFT JOIN uni$sfx u1 ON u1.tok = es$sfx.w
       |  LEFT JOIN uni$sfx u2 ON u2.tok = es$sfx.prev)""".stripMargin

  /** Trigram-LM scoring CTE chain — mirrors LanguageModel.trainTrigramLm +
    * perplexityTrigram (the pplCtes contract, one order higher: trigram
    * counts from a double pos-shift self-join, scoring backs off trigram →
    * bigram chain → 0.16 × smoothed unigram; the caps play the role
    * count>0 plays in uncapped stupid backoff). Ends in `sc(doc_id, lp)`. */
  private def ppl3Ctes(vocabCap: Int, bigramCap: Int, trigramCap: Int,
                       salt: String): String = {
    val sUni = s"""((CAST(COALESCE(u1.c, 0) AS DOUBLE) + 1.0)
       |      / CAST((SELECT n FROM tot) + (SELECT u FROM vs) + 1 AS DOUBLE))""".stripMargin
    val sBi = s"""(CASE WHEN b.cb IS NOT NULL AND u2.c > 0
       |      THEN CAST(b.cb AS DOUBLE) / CAST(u2.c AS DOUBLE)
       |      ELSE 0.4 * $sUni END)""".stripMargin
    s"""ref AS (SELECT tk.* FROM tk
       |  WHERE ${fp60Sql(s"CAST(doc_id AS VARCHAR) || '$salt'")} % 100 < 80),
       |re AS (SELECT doc_id, unnest(toks) AS tok FROM ref),
       |uraw AS (SELECT tok, count(*) AS c FROM re GROUP BY 1),
       |tot AS (SELECT COALESCE(sum(c), 0) AS n FROM uraw),
       |vocab AS (SELECT tok, c FROM uraw ORDER BY c DESC, tok LIMIT $vocabCap),
       |vs AS (SELECT count(*) AS u, COALESCE(sum(c), 0) AS cs FROM vocab),
       |uni0 AS (SELECT tok, c FROM vocab UNION ALL
       |  SELECT '<unk>', (SELECT n FROM tot) - (SELECT cs FROM vs)),
       |uni AS (SELECT tok, sum(c) AS c FROM uni0 GROUP BY 1),
       |rp AS (SELECT doc_id, unnest(toks) AS tok,
       |  unnest(range(1, len(toks) + 1)) AS pos FROM ref),
       |rn AS (SELECT rp.doc_id, rp.pos,
       |  CASE WHEN v.tok IS NULL THEN '<unk>' ELSE rp.tok END AS w
       |  FROM rp LEFT JOIN vocab v ON v.tok = rp.tok),
       |big AS (SELECT a.w AS prev, b.w AS w, count(*) AS cb
       |  FROM rn a JOIN rn b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |  GROUP BY 1, 2 ORDER BY cb DESC, prev, w LIMIT $bigramCap),
       |tri AS (SELECT a.w AS prev2, b.w AS prev, c.w AS w, count(*) AS ct
       |  FROM rn a JOIN rn b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |  JOIN rn c ON b.doc_id = c.doc_id AND c.pos = b.pos + 1
       |  GROUP BY 1, 2, 3 ORDER BY ct DESC, prev2, prev, w LIMIT $trigramCap),
       |ep AS (SELECT doc_id, unnest(toks) AS tok,
       |  unnest(range(1, len(toks) + 1)) AS pos FROM tk),
       |en AS (SELECT ep.doc_id, ep.pos,
       |  CASE WHEN v.tok IS NULL THEN '<unk>' ELSE ep.tok END AS w
       |  FROM ep LEFT JOIN vocab v ON v.tok = ep.tok),
       |es3 AS (SELECT cur.doc_id, cur.pos, cur.w, p1.w AS prev, p2.w AS prev2
       |  FROM en cur LEFT JOIN en p1
       |  ON p1.doc_id = cur.doc_id AND p1.pos = cur.pos - 1
       |  LEFT JOIN en p2 ON p2.doc_id = cur.doc_id AND p2.pos = cur.pos - 2),
       |sc AS (SELECT es3.doc_id,
       |  CAST(round(ln(CASE
       |    WHEN es3.prev IS NULL THEN $sUni
       |    WHEN es3.prev2 IS NULL THEN $sBi
       |    WHEN t.ct IS NOT NULL AND bc.cb IS NOT NULL
       |      THEN CAST(t.ct AS DOUBLE) / CAST(bc.cb AS DOUBLE)
       |    ELSE 0.4 * $sBi
       |  END), 9) AS DECIMAL(28,9)) AS lp
       |  FROM es3
       |  LEFT JOIN tri t ON t.prev2 = es3.prev2 AND t.prev = es3.prev
       |    AND t.w = es3.w
       |  LEFT JOIN big bc ON bc.prev = es3.prev2 AND bc.w = es3.prev
       |  LEFT JOIN big b ON b.prev = es3.prev AND b.w = es3.w
       |  LEFT JOIN uni u1 ON u1.tok = es3.w
       |  LEFT JOIN uni u2 ON u2.tok = es3.prev)""".stripMargin
  }

  /** Sign-LSH bucket from random ±1 hyperplane projections — mirrors
    * VectorFunctions.hyperplaneBucket: the SAME seeded signPlanes constants
    * generate both sides, and DuckDB's list_dot_product is a left-to-right
    * fold matching the sequential Column aggregate bit-for-bit. */
  private def bucketSql(v: String, bits: Int, dim: Int): String =
    VectorFunctions.signPlanes(bits, dim).map { p =>
      val arr = p.map(x => s"$x.0").mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($v, $arr) >= 0 THEN '+' ELSE '-' END)"
    }.mkString(" || ")

  /** The full JL ±1 projection as a DuckDB list literal-dot chain —
    * mirrors VectorFunctions.randomProject (same seeded signPlanes rows). */
  private def projectSql(v: String, outDim: Int, dim: Int): String =
    VectorFunctions.signPlanes(outDim, dim).map { p =>
      val arr = p.map(x => s"$x.0").mkString("[", ", ", "]")
      s"list_dot_product($v, $arr) / sqrt(CAST($outDim AS DOUBLE))"
    }.mkString("[", ", ", "]")

  private[queries] val StopListSql = TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
  private val StopRatioSql =
    s"""(CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, t -> t IN ($StopListSql))) AS DOUBLE) / len(toks) ELSE 0.0 END)"""
  private val PunctRatioSql =
    """(CASE WHEN length(text) > 0 THEN CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END)"""
  private val AvgTokLenSql =
    """(CASE WHEN len(toks) > 0 THEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks) ELSE 0.0 END)"""

  /** 60-bit big-endian fingerprint (first 15 md5 nibbles) of any SQL string
    * expression — mirrors Dedup.tokenFp60 / Sampling.hashBucket. Largest
    * term 15*16^14 < 2^60: exact in BIGINT. */
  private[queries] def fp60Sql(e: String): String =
    (1 to 15).map { j =>
      s"(instr('0123456789abcdef', substr(md5($e), $j, 1)) - 1) * ${1L << (4 * (15 - j))}"
    }.mkString("(", " + ", ")")

  private val TokenFp60Sql: String = fp60Sql("tok")

  /** The pHash analytic replay (resample → luma → separable Q15 DCT-II →
    * ordinal median → power-of-two pack), shared by the feature gate and
    * the pairs gate — one definition, so the mirrors cannot drift. Ends
    * with `hsh(media_id, phash, dct_median)`; `d2` carries grid dims. */
  private def pHashOracleCtes: String = {
    def byteAt(p: String) =
      s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
        s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
    // half-up box mean for channel c of the (y, x) grid cell: single
    // source column x, source rows [y*h/h2, (y+1)*h/h2)
    def pv(c: Int) =
      s"""((2 * list_sum(list_transform(range(y*h//h2, (y+1)*h//h2), yy ->
         |   CASE WHEN yy*12 + x*3 + ${c + 1} <= len
         |    THEN ${byteAt(s"yy*12 + x*3 + ${c + 1}")} ELSE 0 END))
         | + ((y+1)*h//h2 - y*h//h2))
         | // (2 * ((y+1)*h//h2 - y*h//h2)))""".stripMargin
    val cosL = Multimodal.dctCosQ15.flatten.mkString("[", ", ", "]")
    s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
    |  octet_length(encode(text)) AS len FROM documents),
    |d AS (SELECT media_id, hx, len, greatest(1, len // 12) AS h FROM m),
    |d2 AS (SELECT media_id, hx, len, h, least(16, h) AS h2 FROM d),
    |lum AS (SELECT media_id, h2, gy.y, gx.x,
    |    ${pv(0)} + ${pv(1)} + ${pv(2)} AS luma
    |  FROM d2
    |  CROSS JOIN (SELECT unnest(range(0, 16)) AS y) gy
    |  CROSS JOIN (SELECT unnest(range(0, 4)) AS x) gx
    |  WHERE gy.y < h2),
    |rdct AS (SELECT media_id, y, gu.u,
    |    sum(luma * ($cosL)[x*16 + u + 1]) AS r
    |  FROM lum CROSS JOIN (SELECT unnest(range(0, 8)) AS u) gu
    |  GROUP BY 1, 2, 3),
    |sdct AS (SELECT media_id, gv.v, u,
    |    sum(r * ($cosL)[y*16 + v + 1]) AS s
    |  FROM rdct CROSS JOIN (SELECT unnest(range(0, 8)) AS v) gv
    |  GROUP BY 1, 2, 3),
    |acs AS (SELECT media_id, s,
    |    row_number() OVER (PARTITION BY media_id ORDER BY s) AS rn
    |  FROM sdct WHERE NOT (v = 0 AND u = 0)),
    |med AS (SELECT media_id, s AS md FROM acs WHERE rn = 32),
    |hsh AS (SELECT sdct.media_id,
    |    CAST(coalesce(sum(CASE WHEN NOT (v = 0 AND u = 0) AND s > md
    |      THEN (CAST(1 AS BIGINT) << CAST(63 - (8*v + u) AS INT))
    |      ELSE 0 END), 0) AS BIGINT) AS phash,
    |    CAST(max(md) AS BIGINT) AS dct_median
    |  FROM sdct JOIN med ON med.media_id = sdct.media_id
    |  GROUP BY 1)""".stripMargin
  }

  /** Shared WebDataset roundtrip frame: corpus → real WAV payloads → tar
    * shards (plain or gzipped — the roundtrip is byte-transparent, so
    * one oracle serves both delivery forms) → parse → samples, the
    * binary member decoded back through the audio feature kernel. */
  private def wdsRoundtripFrame(s: SparkSession, d: String,
                                gzip: Boolean): DataFrame = {
    import graft.sources.Tar
    val docs = Tables.documents(s, d)
    val media = Multimodal.encodeWav(
      Multimodal.fromText(docs, "doc_id", "text", "source"))
    val withText = media.select(col("media_id").as("doc_id"),
        col("payload"))
      .join(docs.select("doc_id", "text"), Seq("doc_id"))
    val samples = Tar.wdsSamples(
        Tar.wdsExport(withText, shards = 8, gzip = gzip))
      .filter(col("is_valid"))
    val feats = Multimodal.decodeWavFeatures(
      samples.select(col("key").as("media_id"), col("bin").as("payload")))
    samples.select(col("key").as("doc_id"), col("shard"), col("text"),
        col("n_members"))
      .join(feats, col("doc_id") === col("media_id"))
      .select(col("doc_id"), col("shard"), col("n_members"), col("text"),
        col("n_samples"), col("mean_abs"), col("rms"), col("peak"),
        col("zero_crossings"))
      .orderBy("doc_id")
  }

  /** The analytic oracle for [[wdsRoundtripFrame]]: every output derived
    * from the text bytes (ids, member counts, the text member verbatim,
    * the wav_decode feature mirror over the .bin member) — any defect in
    * header layout, checksum, octal sizes, 512-byte padding, member
    * order, sample grouping, or (gz form) gzip framing fails the hash. */
  private def wdsRoundtripOracle: String = {
    def byteAt(p: String) =
      s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
        s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
    s"""WITH m AS (SELECT doc_id, text, hex(encode(text)) AS hx,
    |  octet_length(encode(text)) AS len,
    |  ${fp60Sql("CAST(doc_id AS VARCHAR) || ':wds'")} % 8 AS shard
    |  FROM documents),
    |d AS (SELECT doc_id, text, shard, hx, len,
    |  greatest(1, len // 2) AS n FROM m),
    |sm AS (SELECT doc_id, text, shard, n, list_transform(range(0, n),
    |  k -> (CASE WHEN 2*k+2 <= len THEN ${byteAt("2*k+2")} ELSE 0 END) * 256 +
    |  (CASE WHEN 2*k+1 <= len THEN ${byteAt("2*k+1")} ELSE 0 END)) AS us
    |  FROM d),
    |sg AS (SELECT doc_id, text, shard, n, list_transform(us,
    |  v -> CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS ss FROM sm)
    |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
    | CAST(2 AS INT) AS n_members, text,
    | CAST(n AS BIGINT) AS n_samples,
    | CAST(list_sum(list_transform(ss, v -> CAST(abs(v) AS BIGINT)))
    |   AS DOUBLE) / n AS mean_abs,
    | sqrt(CAST(list_sum(list_transform(ss, v -> CAST(v AS BIGINT) * v))
    |   AS DOUBLE) / n) AS rms,
    | CAST(list_max(list_transform(ss, v -> abs(v))) AS INT) AS peak,
    | CAST(coalesce(list_sum(list_transform(range(1, n), k ->
    |   CASE WHEN (ss[k] < 0) != (ss[k+1] < 0) THEN 1 ELSE 0 END)), 0)
    |   AS BIGINT) AS zero_crossings
    |FROM sg ORDER BY doc_id""".stripMargin
  }

  /** Shared near-dup component CTE chain (word-3-shingle jaccard >= 0.3,
    * maxTokenDf 100, recursive closure) ending in `pairs(id_a, id_b)` and
    * `comp(id, comp)` — the same chain the q_dedup_components oracle pins;
    * one definition feeds the leakage-free-split and soft-dedup oracles so
    * the mirrors cannot drift. A def (not val): it interpolates
    * TokenFp60Sql, declared above, but defs dodge the init-order trap
    * documented at [[spanEdgeCtes]]. */
  private def compCtes(from: String = "documents"): String =
    s"""t AS (SELECT doc_id, $ToksSql AS toks FROM $from),
       |sh0 AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM t),
       |sh1 AS (SELECT doc_id, $TokenFp60Sql AS tok FROM sh0),
       |sh AS (SELECT doc_id, tok FROM (
       |  SELECT doc_id, tok, count(*) OVER (PARTITION BY tok) AS df FROM sh1)
       |  WHERE df <= 100),
       |sizes AS (SELECT doc_id, count(*) AS n_tok FROM sh GROUP BY 1),
       |common AS (
       | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
       | FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
       | GROUP BY 1, 2),
       |pairs AS (
       | SELECT c.id_a, c.id_b
       | FROM common c
       | JOIN sizes sa ON sa.doc_id = c.id_a
       | JOIN sizes sb ON sb.doc_id = c.id_b
       | WHERE CAST(c.common AS DOUBLE) / (sa.n_tok + sb.n_tok - c.common) >= 0.3),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       | UNION ALL SELECT id_b, id_a FROM pairs),
       |reach(src, dst) AS (
       | SELECT src, dst FROM edges
       | UNION
       | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |comp AS (SELECT src AS id, least(src, min(dst)) AS comp
       | FROM reach GROUP BY src)""".stripMargin

  /** Bloom gate sizing: 2^17 bits / 5 hashes ≈ 1 % FP at the sf0.01 corpus
    * (~13 bits/key), still sub-50 % at sf0.1. */
  private val BloomBits = 1 << 17
  private val BloomK = 5
  /** Bit position of `key` for seed column `s` — mirrors Bloom.position
    * (Sampling.hashBucket with salt ":bloom" + seed). */
  private val bloomPosSql: String =
    s"(${fp60Sql("concat(key, ':bloom', s)")} % $BloomBits)"

  // ---------- MinHash SQL mirrors (generated to match Dedup.minhashSig) ----
  /** 28-bit big-endian token fingerprint from md5(tok)'s first 7 nibbles,
    * plus 1 — mirrors Dedup.tokenFingerprint (Spark's conv(hex,16,10)). */
  private val TokenFingerprintSql: String =
    (1 to 7).map { j =>
      s"(instr('0123456789abcdef', substr(md5(tok), $j, 1)) - 1) * ${math.pow(16, 7 - j).toLong}"
    }.mkString("(", " + ", " + 1)")

  /** h0..h{31}: min universal hash per permutation (constants from
    * Dedup.HashParams — same seed on both engines by construction). */
  private val minhashMinsSql: String =
    (0 until 32).map { i =>
      val (a, b) = graft.operators.Dedup.HashParams(i)
      s"min(($a * x + $b) % ${graft.operators.Dedup.HashPrime}) AS h$i"
    }.mkString(", ")

  /** Band rows: one SELECT per band over the sig CTE (mirror of
    * Dedup.minhashBands' md5 over the comma-joined slice). */
  /** OPH signature CTEs (g, a, sig) over an `fp(doc_id, x)` table in
    * scope — mirrors Dedup.minhashSigOph: per-bin permuted mins into a
    * k-array, then the rotation-densified slot per position (t·P offsets
    * keep distinct rotation distances collision-free). */
  private def ophSigSql(k: Int, sigName: String = "sig"): String = {
    val (a0, b0) = graft.operators.Dedup.HashParams(0)
    val p = graft.operators.Dedup.HashPrime
    val arr = (0 until k)
      .map(j => s"min(CASE WHEN bin = $j THEN v END)")
      .mkString("[", ", ", "]")
    val slots = (0 until k).map { j =>
      (0 until k).map { t =>
        val idx = (j + t) % k + 1 // DuckDB lists are 1-indexed
        if (t == 0) s"arr[$idx]"
        else s"arr[$idx] + ${t.toLong * p}"
      }.mkString("coalesce(", ", ", s") AS h$j")
    }.mkString(",\n  ")
    s"""g_$sigName AS (SELECT doc_id, x % $k AS bin,
       |  min(($a0 * x + $b0) % $p) AS v FROM fp GROUP BY 1, 2),
       |a_$sigName AS (SELECT doc_id, $arr AS arr FROM g_$sigName GROUP BY 1),
       |$sigName AS (SELECT doc_id,
       |  $slots
       |FROM a_$sigName)""".stripMargin
  }

  private def minhashBandsSql(k: Int, rowsPerBand: Int,
                              from: String = "sig"): String =
    (0 until k / rowsPerBand).map { band =>
      val slice = (band * rowsPerBand until (band + 1) * rowsPerBand)
        .map(i => s"CAST(h$i AS VARCHAR)").mkString(" || ',' || ")
      s"SELECT doc_id, $band AS band, md5($slice) AS band_hash FROM $from"
    }.mkString("\n  UNION ALL ")

  // ---------- SimHash SQL mirrors (generated to match Dedup.simhash) --------
  /** Bit j of md5 hex string column `h` (big-endian within each nibble),
    * exactly as Dedup.simhash extracts it. */
  private def bitSql(h: String, j: Int): String = {
    val mask = 1 << (3 - j % 4)
    s"(CAST(floor((instr('0123456789abcdef', substr($h, ${1 + j / 4}, 1)) - 1) / $mask) AS BIGINT) % 2)"
  }

  private val SimhashVotesSql: String =
    (0 until 64).map(j => s"sum(${bitSql("h", j)} * 2 - 1) AS v$j").mkString(", ")

  private val SimhashNibblesSql: String =
    (0 until 16).map { n =>
      val value = (0 until 4).map { b =>
        s"(CASE WHEN v${4 * n + b} > 0 THEN ${1 << (3 - b)} ELSE 0 END)"
      }.mkString(" + ")
      s"substr('0123456789abcdef', ($value) + 1, 1)"
    }.mkString(" || ")

  /** sig CTE prefix shared by both simhash queries (shingle feature space). */
  private val SimhashSigCte: String =
    s"""WITH t AS (SELECT doc_id, $ToksSql AS toks, text FROM documents),
       |sh AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM t),
       |hv AS (SELECT doc_id, md5(tok) AS h FROM sh),
       |v AS (SELECT doc_id, $SimhashVotesSql FROM hv GROUP BY doc_id),
       |sig AS (SELECT doc_id, $SimhashNibblesSql AS simhash FROM v)""".stripMargin

  /** 64-bit hamming distance between hex columns sig_a/sig_b, mirroring
    * Dedup.simhashPairs' nibble-wise popcount. */
  private val HammingSql: String =
    (0 until 16).flatMap { n =>
      val va = s"(instr('0123456789abcdef', substr(sig_a, ${n + 1}, 1)) - 1)"
      val vb = s"(instr('0123456789abcdef', substr(sig_b, ${n + 1}, 1)) - 1)"
      (0 until 4).map { b =>
        val mask = 1 << b
        s"(CASE WHEN (CAST(floor($va / $mask) AS BIGINT) % 2) != (CAST(floor($vb / $mask) AS BIGINT) % 2) THEN 1 ELSE 0 END)"
      }
    }.mkString(" + ")

  /** DuckDB mirror of [[Multimodal.fakeDecodeFeatures]] lane `j` over blob
    * hex `hx` with byte count `len`: same per-byte /255.0, same ascending
    * sequential fold (list_reduce seeded via list_prepend(0.0, ...) matches
    * Spark's aggregate(..., 0.0, +)), same floor(len/8) normalizer — so the
    * doubles are bit-identical. */
  private def featureLaneSql(j: Int): String = {
    def byteAt(p: String) =
      s"((instr('0123456789ABCDEF', substr(hx, 2*$p-1, 1)) - 1) * 16 + (instr('0123456789ABCDEF', substr(hx, 2*$p, 1)) - 1))"
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(${j + 1}, len + 1, 8), p -> ${byteAt("p")} / CAST(255.0 AS DOUBLE))),
       |  (acc, x) -> acc + x) / CAST(greatest(1, len // 8) AS DOUBLE) AS f$j""".stripMargin
  }

  /** Exact cosine top-10 for query vectors vec_id < 8 — the oracle for both
    * brute-force search and IVF run in exact mode (nProbe = nLists). */
  private lazy val BruteTopKSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
       |scored AS (SELECT query_id, e.vec_id AS nbr_id,
       |  ${cosSql("qv", "e.v")} AS cosine
       |  FROM e CROSS JOIN q WHERE e.vec_id != query_id)
       |SELECT query_id, nbr_id, cosine,
       | row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rank
       |FROM scored QUALIFY rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Unrolled MMR greedy-selection oracle (k = 5, λ = 0.7 over the top-25
    * brute-force candidates of query vectors vec_id < 8) — one CTE pair per
    * greedy step: remaining = candidates minus selected, score =
    * λ·relevance − (1−λ)·max pair-cosine vs selected (rounded to 9 before
    * the argmax, ties on nbr_id), selection accumulates by UNION ALL.
    * Literals interpolate the exact Scala doubles (1−0.7 is
    * 0.30000000000000004 in IEEE — the mirror must use the same value). */
  private lazy val MmrSql: String = {
    val lam = s"CAST(${MmrLambda} AS DOUBLE)"
    val om = s"CAST(${1.0 - MmrLambda} AS DOUBLE)"
    val steps = (2 to MmrK).map { i =>
      s"""rem$i AS (SELECT c.* FROM cand c LEFT JOIN sel${i - 1} s
         |  ON s.query_id = c.query_id AND s.nbr_id = c.nbr_id
         |  WHERE s.nbr_id IS NULL),
         |mx$i AS (SELECT r.query_id, r.nbr_id, any_value(r.cosine) AS cosine,
         |  any_value(r.nbr_v) AS nbr_v,
         |  max(${cosSql("r.nbr_v", "s.nbr_v")}) AS simmax
         |  FROM rem$i r JOIN sel${i - 1} s ON s.query_id = r.query_id
         |  GROUP BY 1, 2),
         |s$i AS (SELECT query_id, nbr_id, cosine, nbr_v,
         |  round($lam * cosine - $om * simmax, 9) AS mmr_score,
         |  $i AS sel_rank FROM mx$i
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY round($lam * cosine - $om * simmax, 9) DESC, nbr_id) = 1),
         |sel$i AS (SELECT * FROM sel${i - 1} UNION ALL SELECT * FROM s$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
       |sc0 AS (SELECT query_id, e.vec_id AS nbr_id,
       |  ${cosSql("qv", "e.v")} AS cosine, e.v AS nbr_v
       |  FROM e CROSS JOIN q WHERE e.vec_id != query_id),
       |cand AS (SELECT query_id, nbr_id, cosine, nbr_v FROM sc0
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, nbr_id) <= $MmrCandidates),
       |sel1 AS (SELECT query_id, nbr_id, cosine, nbr_v,
       |  round($lam * cosine, 9) AS mmr_score, 1 AS sel_rank FROM cand
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY round($lam * cosine, 9) DESC, nbr_id) = 1),
       |$steps
       |SELECT query_id, sel_rank, nbr_id, cosine, mmr_score
       |FROM sel$MmrK ORDER BY query_id, sel_rank""".stripMargin
  }
  private val MmrK = 5
  private val MmrLambda = 0.7
  private val MmrCandidates = 25

  /** Quantized cosine top-10 for query vectors vec_id < 8 — mirrors
    * quantize -> dequantize -> cosine with the same exact-roundable
    * arithmetic as the Spark int8 path, so scores and ranks hash bit-exact.
    * Shared by the quantized brute-force gate and the quantized-IVF gate in
    * exact mode (nProbe = nLists probes every cell). */
  private lazy val QuantTopKSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |sc AS (SELECT vec_id, v,
       |  CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0.0
       |   THEN CAST(127.0 AS DOUBLE) / list_max(list_transform(v, x -> abs(x)))
       |   ELSE CAST(1.0 AS DOUBLE) END AS scale FROM e),
       |dq AS (SELECT vec_id AS nbr_id,
       |  list_transform(v, x -> CAST(CAST(round(x * scale) AS TINYINT) AS DOUBLE) / scale) AS nbr_v
       |  FROM sc),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
       |scored AS (SELECT query_id, nbr_id, ${cosSql("qv", "nbr_v")} AS cosine
       |  FROM dq CROSS JOIN q WHERE nbr_id != query_id)
       |SELECT query_id, nbr_id, cosine,
       | row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rank
       |FROM scored QUALIFY rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Inverted-index Jaccard oracle over shingles, optionally restricted to an
    * LSH candidate CTE named `cand(id_a, id_b)`. */
  private def jaccardTailSql(threshold: Double, candJoin: String): String =
    s"""sizes AS (SELECT doc_id, count(*) AS n_tok FROM sh GROUP BY 1),
       |common AS (
       | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
       | FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
       | GROUP BY 1, 2)
       |SELECT c.id_a, c.id_b,
       | CAST(c.common AS DOUBLE) / (sa.n_tok + sb.n_tok - c.common) AS jaccard
       |FROM common c
       | $candJoin
       | JOIN sizes sa ON sa.doc_id = c.id_a
       | JOIN sizes sb ON sb.doc_id = c.id_b
       |WHERE jaccard >= $threshold
       |ORDER BY c.id_a, c.id_b""".stripMargin

  /** Inverted-index symmetric-containment oracle over shingles (same CTE
    * layout as [[jaccardTailSql]], different final formula). */
  private def containmentTailSql(threshold: Double): String =
    s"""sizes AS (SELECT doc_id, count(*) AS n_tok FROM sh GROUP BY 1),
       |common AS (
       | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
       | FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
       | GROUP BY 1, 2)
       |SELECT c.id_a, c.id_b,
       | CAST(c.common AS DOUBLE) / least(sa.n_tok, sb.n_tok) AS containment
       |FROM common c
       | JOIN sizes sa ON sa.doc_id = c.id_a
       | JOIN sizes sb ON sb.doc_id = c.id_b
       |WHERE containment >= $threshold
       |ORDER BY c.id_a, c.id_b""".stripMargin

  /** Per-query retrieval-metric CTE chain shared by the eval gates: exact
    * top-10 ranking (the [[BruteTopKSql]] shape), deterministic graded
    * qrels, DCG/IDCG as round12 decimal sums, metrics as single divisions
    * of exact operands. `tail` selects from the final `pq` CTE. */
  private def RetrievalEvalSql(tail: String): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
       |scored AS (SELECT query_id, e.vec_id AS nbr_id,
       |  ${cosSql("qv", "e.v")} AS cosine
       |  FROM e CROSS JOIN q WHERE e.vec_id != query_id),
       |r AS (SELECT query_id, nbr_id, rank FROM (
       |  SELECT query_id, nbr_id, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, nbr_id) AS rank FROM scored) WHERE rank <= 10),
       |qr AS (SELECT q.query_id, e.vec_id AS nbr_id,
       |  CAST((e.vec_id % 3) + 1 AS DOUBLE) AS rel
       |  FROM e CROSS JOIN q WHERE (q.query_id * 31 + e.vec_id) % 11 = 0),
       |ret AS (SELECT r.query_id,
       |  CAST(count(*) AS BIGINT) AS n_retrieved,
       |  CAST(sum(CASE WHEN qr.rel IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |  min(CASE WHEN qr.rel IS NOT NULL THEN r.rank END) AS first_hit,
       |  sum(coalesce(CAST(round(qr.rel / log2(r.rank + 1), 12) AS DECIMAL(28,12)),
       |    CAST(0 AS DECIMAL(28,12)))) AS dcg
       |  FROM r LEFT JOIN qr ON qr.query_id = r.query_id AND qr.nbr_id = r.nbr_id
       |  GROUP BY 1),
       |ideal AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant,
       |  sum(CASE WHEN ir <= 10
       |    THEN CAST(round(rel / log2(ir + 1), 12) AS DECIMAL(28,12))
       |    ELSE CAST(0 AS DECIMAL(28,12)) END) AS idcg
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rel DESC, nbr_id) AS ir FROM qr)
       |  GROUP BY 1),
       |pq AS (SELECT coalesce(ret.query_id, ideal.query_id) AS query_id,
       |  coalesce(n_relevant, 0) AS n_relevant,
       |  coalesce(n_retrieved, 0) AS n_retrieved,
       |  coalesce(n_hits, 0) AS n_hits,
       |  CASE WHEN n_relevant IS NOT NULL
       |    THEN CAST(coalesce(n_hits, 0) AS DOUBLE) / n_relevant END AS recall_at_k,
       |  CAST(coalesce(n_hits, 0) AS DOUBLE) / CAST(10 AS DOUBLE) AS precision_at_k,
       |  coalesce(CAST(1 AS DOUBLE) / first_hit, CAST(0 AS DOUBLE)) AS mrr,
       |  CASE WHEN n_relevant IS NOT NULL
       |    THEN round(CAST(coalesce(dcg, CAST(0 AS DECIMAL(28,12))) AS DOUBLE)
       |      / CAST(idcg AS DOUBLE), 9) END AS ndcg_at_k
       |  FROM ret FULL OUTER JOIN ideal ON ret.query_id = ideal.query_id)
       |$tail""".stripMargin

  /** Covariance CTE chain shared by the spectral gates: round-9 decimal
    * means and cell sums over the 64-dim embeddings — ends in
    * `covu(i, j, cov)` (upper triangle, 0-based). */
  private val CovarianceCtes: String =
    s"""e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  WHERE len(embedding) = 64),
       |ex AS (SELECT v, unnest(range(1, 65)) AS i FROM e),
       |mu AS (SELECT i - 1 AS i,
       |  CAST(sum(CAST(round(v[i], 9) AS DECIMAL(28,9))) AS DOUBLE)
       |    / count(*) AS mu
       |  FROM ex GROUP BY 1),
       |pr AS (SELECT e.v, r1.i AS i1, r2.j AS j1
       |  FROM e, range(1, 65) r1(i), range(1, 65) r2(j)
       |  WHERE r1.i <= r2.j),
       |pp AS (SELECT i1 - 1 AS i, j1 - 1 AS j,
       |  (v[i1] - mi.mu) * (v[j1] - mj.mu) AS p
       |  FROM pr JOIN mu mi ON mi.i = i1 - 1 JOIN mu mj ON mj.i = j1 - 1),
       |covu AS MATERIALIZED (SELECT i, j,
       |  CAST(sum(CAST(round(p, 9) AS DECIMAL(28,9))) AS DOUBLE)
       |    / count(*) AS cov
       |  FROM pp GROUP BY 1, 2)""".stripMargin

  /** Power-iteration CTE chain through `v$iters` over the covariance
    * upper triangle. Every step MATERIALIZED: the w/n/v chain references
    * each level twice, and a planner that re-inlines CTEs would re-expand
    * the whole chain 2^iters times (observed: DuckDB ground for minutes on
    * the inlined form; materialized it is instant). */
  private def pcaChainCtes(dim: Int, iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""w$k AS MATERIALIZED (SELECT c.i,
         |  CAST(sum(CAST(round(c.cov * v.x, 9) AS DECIMAL(28,9))) AS DOUBLE) AS w
         |  FROM covf c JOIN v${k - 1} v ON v.i = c.j GROUP BY 1),
         |n$k AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(round(w * w, 9)
         |  AS DECIMAL(28,9))) AS DOUBLE)) AS nrm FROM w$k),
         |v$k AS MATERIALIZED (SELECT i, w / (SELECT nrm FROM n$k) AS x
         |  FROM w$k)""".stripMargin
    }.mkString(",\n")
    s"""$CovarianceCtes,
       |covf AS MATERIALIZED (SELECT i, j, cov FROM covu
       |  UNION ALL SELECT j, i, cov FROM covu WHERE i != j),
       |v0 AS MATERIALIZED (SELECT DISTINCT i,
       |  CAST(1 AS DOUBLE) / sqrt(CAST($dim AS DOUBLE)) AS x FROM covf),
       |$iterCtes""".stripMargin
  }

  /** Unrolled power-iteration oracle for [[q_v_pca_top]]: `iters` exact
    * matvec/normalize steps over the mirrored full matrix. */
  private def PcaTopOracleSql(dim: Int, iters: Int): String =
    s"""WITH ${pcaChainCtes(dim, iters)},
       |tr AS (SELECT CAST(sum(CAST(round(cov, 9) AS DECIMAL(28,9))) AS DOUBLE)
       |  AS t FROM covu WHERE i = j)
       |SELECT v.i, v.x AS loading,
       |  (SELECT nrm FROM n$iters) AS eigenvalue,
       |  (SELECT nrm FROM n$iters) / (SELECT t FROM tr) AS variance_share
       |FROM v$iters v ORDER BY i""".stripMargin

  /** All-but-the-top oracle: the PCA chain's direction + the covariance
    * means applied per row — `x' = (x − μ) − round9(v·(x − μ))·v`, the dot
    * a sequential fold, one round-9 per output element. */
  private def AbttOracleSql(dim: Int, iters: Int): String =
    s"""WITH ${pcaChainCtes(dim, iters)},
       |muv AS MATERIALIZED (SELECT list(mu ORDER BY i) AS m FROM mu),
       |vv AS MATERIALIZED (SELECT list(x ORDER BY i) AS tv FROM v$iters),
       |rows0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE len(embedding) = $dim),
       |cen AS (SELECT vec_id, m, tv,
       |  list_transform(range(1, ${dim + 1}), q -> v[q] - m[q]) AS c
       |  FROM rows0, muv, vv),
       |dt AS (SELECT vec_id, c, tv,
       |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(range(1, ${dim + 1}),
       |      q -> c[q] * tv[q])), (acc, x) -> acc + x), 9) AS d
       |  FROM cen)
       |SELECT dt.vec_id, r.q - 1 AS i,
       |  round(c[r.q] - d * tv[r.q], 9) AS x
       |FROM dt, range(1, ${dim + 1}) r(q)
       |ORDER BY vec_id, i""".stripMargin

  /** Shared labeling for the contrastive/hard-negative gate family: the
    * deterministic q_dedup_semantic chain (hash cells + exact-mean
    * centroids + recursive components) joined back onto the double-cast
    * embeddings — (vec_id, embedding, component). PERSISTED (and
    * materialized) before return: every consumer reads it twice — once as
    * the corpus/component side, once filtered to the query set — and the
    * semantic-dedup chain would otherwise run once per branch.
    *
    * MEMOIZED per (session, sfDir), like [[Similarity.sharedIvf]]: the
    * labeling is a shared asset of four gates, and production builds it
    * once per corpus snapshot, not once per downstream query. After a
    * harness cache sweep the memo hit re-persists AND re-materializes
    * (count) — unlike the single-consumer IVF frame, this one roots two
    * branches, so an unmaterialized re-persist would race to rebuild. */
  private val semanticMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]
  private def semanticLabeled(s: SparkSession, d: String): DataFrame =
    semanticMemo.synchronized {
      import org.apache.spark.storage.StorageLevel
      semanticMemo.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
      val labeled = semanticMemo.getOrElseUpdate((s, d), {
        import graft.operators.Centroids
        val e = Tables.embeddings(s, d).select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"),
          pmod(Dedup.tokenFp60(concat(col("vec_id").cast("string"), lit(":sc1"))),
            lit(8L)).as("cell0"))
        val cents = e.groupBy("cell0").agg(
            array((1 to 64).map(i =>
              Centroids.exactDimMean(col("vec_id"), element_at(col("v"), i))): _*)
              .as("centroid"))
          .select(col("cell0").as("cell"), col("centroid"))
        e.select(col("vec_id"), col("v").as("embedding"))
          .join(Dedup.semanticDedup(e, "vec_id", "v", cents, threshold = 0.35)
            .select("vec_id", "component"), Seq("vec_id"))
      })
      if (labeled.storageLevel == StorageLevel.NONE) {
        labeled.gatePersist()
        labeled.count()
      }
      labeled
    }

  /** Bench prewarm hooks (see [[graft.queries.Q]]): rebuild/re-materialize
    * the session-shared assets a gate probes, outside its timed region. */
  private val PrewarmIvf: (SparkSession, String) => Unit = (s, d) => {
    Similarity.sharedIvf(Tables.embeddings(s, d), corpusKey = d, nLists = 16)
      .assigned.count(): Unit
  }
  private val PrewarmSemantic: (SparkSession, String) => Unit =
    (s, d) => { semanticLabeled(s, d): Unit }
  private val PrewarmIvfSemantic: (SparkSession, String) => Unit =
    (s, d) => { PrewarmIvf(s, d); PrewarmSemantic(s, d) }
  /** Saved two-level index fixtures for the ivf2 lifecycle twins (r20):
    * build + save once per (session, corpus) via
    * [[Similarity.sharedSavedIndex]]; the gates' timed regions load and
    * probe — the per-query-batch cost at production, where the index is
    * published once at ingest. The exact and PQ variants are separate
    * artifacts (different saved bytes under the same build params). */
  private def sharedIvf2Dir(s: SparkSession, d: String): String =
    Similarity.sharedSavedIndex(s, d + "#ivf2:p4f4s42") { dir =>
      val built = Similarity.buildIvf2(Tables.embeddings(s, d),
        nParents = 4, fanout = 4, seed = 42L)
      Similarity.saveIvf2(built, dir)
      built.index.assigned.unpersist(blocking = false)
    }
  private def sharedIvf2PqDir(s: SparkSession, d: String): String =
    Similarity.sharedSavedIndex(s, d + "#ivf2pq:p4f4s42") { dir =>
      val emb = Tables.embeddings(s, d)
      val pq = deterministicPq(emb)
      val built = Similarity.buildIvf2(emb, nParents = 4, fanout = 4,
        seed = 42L)
      Similarity.saveIvf2(Similarity.encodePq2(built, pq), dir)
      Similarity.savePq(pq, dir)
      built.index.assigned.unpersist(blocking = false)
    }

  private val PrewarmBitextIvf: (SparkSession, String) => Unit = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Similarity.sharedIvf(emb.filter(col("vec_id") % 2 === 0),
      corpusKey = d + "#bitext_x", nLists = 8).assigned.count()
    Similarity.sharedIvf(emb.filter(col("vec_id") % 2 === 1),
      corpusKey = d + "#bitext_y", nLists = 8).assigned.count(): Unit
  }

  /** Oracle for the bitext-mining gates — brute and IVF-at-nProbe=nLists
    * compute the same rows (disjoint id spaces, every cell probed), so both
    * share it. Forward/backward k-NN (k=4), ratio margin, mutual-best
    * filter, margin >= 1.05. */
  private lazy val BitextMineOracleSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
    |  FROM embeddings),
    |xs AS (SELECT vec_id AS qid, v FROM e WHERE vec_id % 2 = 0),
    |ys AS (SELECT vec_id AS nid, v AS nv FROM e WHERE vec_id % 2 = 1),
    |fs AS (SELECT qid, nid, c, row_number() OVER
    |  (PARTITION BY qid ORDER BY c DESC, nid) AS rank
    |  FROM (SELECT qid, nid, ${cosSql("v", "nv")} AS c
    |    FROM xs CROSS JOIN ys)),
    |f AS (SELECT * FROM fs WHERE rank <= 4),
    |bs AS (SELECT nid AS qid2, qid AS nid2, c, row_number() OVER
    |  (PARTITION BY nid ORDER BY c DESC, qid) AS rank
    |  FROM (SELECT qid, nid, ${cosSql("v", "nv")} AS c
    |    FROM xs CROSS JOIN ys)),
    |b AS (SELECT * FROM bs WHERE rank <= 4),
    |ax AS (SELECT qid,
    |  CAST(sum(CAST(round(c, 9) AS DECIMAL(38,9))) AS DOUBLE) / count(*) AS avg_x
    |  FROM f GROUP BY 1),
    |ay AS (SELECT qid2,
    |  CAST(sum(CAST(round(c, 9) AS DECIMAL(38,9))) AS DOUBLE) / count(*) AS avg_y
    |  FROM b GROUP BY 1),
    |fb AS (SELECT qid AS x, nid AS y, c FROM f WHERE rank = 1),
    |bb AS (SELECT qid2 AS y, nid2 AS x FROM b WHERE rank = 1),
    |m AS (SELECT x, y, c, round(round(c, 9)
    |    / ((avg_x + avg_y) / CAST(2.0 AS DOUBLE)), 9) AS margin
    |  FROM fb JOIN bb USING (x, y)
    |  JOIN ax ON ax.qid = x JOIN ay ON ay.qid2 = y)
    |SELECT x AS src_id, y AS tgt_id, c AS cosine, margin FROM m
    |WHERE margin >= CAST(1.05 AS DOUBLE) ORDER BY src_id""".stripMargin

  /** Oracle for the Matryoshka-recall gates — brute and IVF-at-nProbe=nLists
    * rank identically, so both share it (dims 8/16/32 vs the full-64
    * top-10). */
  private lazy val MatryoshkaOracleSql: String = {
    val per = Seq(8, 16, 32).map { m =>
      s"""sc$m AS (SELECT query_id, e.vec_id AS nbr_id,
         |  ${cosSql(s"qv[1:$m]", s"e.v[1:$m]")} AS cosine
         |  FROM e CROSS JOIN q WHERE e.vec_id != query_id),
         |tm$m AS (SELECT query_id, nbr_id FROM (SELECT query_id, nbr_id,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, nbr_id) AS rank FROM sc$m)
         |  WHERE rank <= 10),
         |h$m AS (SELECT tm$m.query_id, count(*) AS n_hits
         |  FROM tm$m JOIN f USING (query_id, nbr_id) GROUP BY 1),
         |r$m AS (SELECT $m AS m, q.query_id,
         |  CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
         |  CAST(coalesce(n_hits, 0) AS DOUBLE) / 10 AS recall
         |  FROM q LEFT JOIN h$m ON h$m.query_id = q.query_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
       |sf AS (SELECT query_id, e.vec_id AS nbr_id,
       |  ${cosSql("qv", "e.v")} AS cosine
       |  FROM e CROSS JOIN q WHERE e.vec_id != query_id),
       |f AS (SELECT query_id, nbr_id FROM (SELECT query_id, nbr_id,
       |  row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, nbr_id) AS rank FROM sf)
       |  WHERE rank <= 10),
       |$per
       |SELECT * FROM r8 UNION ALL SELECT * FROM r16
       |UNION ALL SELECT * FROM r32
       |ORDER BY m, query_id""".stripMargin
  }

  private val PrewarmMatryoshkaIvf: (SparkSession, String) => Unit = (s, d) => {
    PrewarmIvf(s, d)
    Seq(8, 16, 32).foreach { m =>
      Similarity.sharedIvf(
        Tables.embeddings(s, d).select(col("vec_id"),
          slice(col("embedding"), 1, m).as("embedding")),
        corpusKey = d + s"#mat$m", nLists = 8).assigned.count()
    }
  }

  /** Oracle for the hard-negative gates (brute and IVF-at-nProbe=nLists
    * compute the same rows, so both share it): re-runs the semantic
    * labeling chain and ranks the component-excluded pairs. */
  private lazy val HardNegativesOracleSql: String = {
    val lists = (1 to 64)
      .map(i => s"list(v[$i] ORDER BY vec_id) AS l$i").mkString(", ")
    val dims = (1 to 64)
      .map(i => s"list_dot_product(l$i, list_transform(l$i, x -> 1.0)) / len(l$i)")
      .mkString(", ")
    s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
    |  ${fp60Sql("CAST(vec_id AS VARCHAR) || ':sc1'")} % 8 AS cell0
    |  FROM embeddings),
    |g AS (SELECT cell0, $lists FROM e GROUP BY cell0),
    |c AS (SELECT cell0 AS cell, [$dims] AS centroid FROM g),
    |asg0 AS (SELECT e.vec_id, e.v, c.cell,
    |  ${d2Sql("e.v", "c.centroid")} AS d2 FROM e CROSS JOIN c),
    |asg AS (SELECT vec_id, v, cell, d2 FROM (
    |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell)
    |    AS rn FROM asg0) WHERE rn = 1),
    |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM asg a JOIN asg b
    |  ON a.cell = b.cell AND a.vec_id < b.vec_id
    |  WHERE ${cosSql("a.v", "b.v")} >= CAST(0.35 AS DOUBLE)),
    |edges AS (SELECT id_a AS src, id_b AS dst FROM p
    |  UNION ALL SELECT id_b, id_a FROM p),
    |reach(src, dst) AS (SELECT src, dst FROM edges
    |  UNION SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src),
    |comp AS (SELECT src AS id, least(src, min(dst)) AS comp
    |  FROM reach GROUP BY src),
    |lab AS (SELECT asg.vec_id, asg.v,
    |  COALESCE(comp.comp, asg.vec_id) AS component
    |  FROM asg LEFT JOIN comp ON comp.id = asg.vec_id),
    |q AS (SELECT vec_id AS query_id, v AS qv, component AS qc
    |  FROM lab WHERE vec_id < 8),
    |scored AS (SELECT query_id, n.vec_id AS nbr_id,
    |  ${cosSql("qv", "n.v")} AS cosine
    |  FROM lab n CROSS JOIN q
    |  WHERE n.vec_id != query_id AND n.component != qc)
    |SELECT query_id, nbr_id, cosine,
    | row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rank
    |FROM scored QUALIFY rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** Oracle for the contrastive-triplet gates (brute and
    * IVF-at-nProbe=nLists share it): same labeling chain; positive =
    * same-component top-1, negatives = component-excluded top-5. */
  private lazy val ContrastivePairsOracleSql: String = {
    val lists = (1 to 64)
      .map(i => s"list(v[$i] ORDER BY vec_id) AS l$i").mkString(", ")
    val dims = (1 to 64)
      .map(i => s"list_dot_product(l$i, list_transform(l$i, x -> 1.0)) / len(l$i)")
      .mkString(", ")
    s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
    |  ${fp60Sql("CAST(vec_id AS VARCHAR) || ':sc1'")} % 8 AS cell0
    |  FROM embeddings),
    |g AS (SELECT cell0, $lists FROM e GROUP BY cell0),
    |c AS (SELECT cell0 AS cell, [$dims] AS centroid FROM g),
    |asg0 AS (SELECT e.vec_id, e.v, c.cell,
    |  ${d2Sql("e.v", "c.centroid")} AS d2 FROM e CROSS JOIN c),
    |asg AS (SELECT vec_id, v, cell, d2 FROM (
    |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell)
    |    AS rn FROM asg0) WHERE rn = 1),
    |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM asg a JOIN asg b
    |  ON a.cell = b.cell AND a.vec_id < b.vec_id
    |  WHERE ${cosSql("a.v", "b.v")} >= CAST(0.35 AS DOUBLE)),
    |edges AS (SELECT id_a AS src, id_b AS dst FROM p
    |  UNION ALL SELECT id_b, id_a FROM p),
    |reach(src, dst) AS (SELECT src, dst FROM edges
    |  UNION SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src),
    |comp AS (SELECT src AS id, least(src, min(dst)) AS comp
    |  FROM reach GROUP BY src),
    |lab AS (SELECT asg.vec_id, asg.v,
    |  COALESCE(comp.comp, asg.vec_id) AS component
    |  FROM asg LEFT JOIN comp ON comp.id = asg.vec_id),
    |q AS (SELECT vec_id AS query_id, v AS qv, component AS qc
    |  FROM lab WHERE vec_id < 64),
    |scored AS (SELECT query_id, n.vec_id AS nbr_id,
    |  (n.component = qc) AS same, ${cosSql("qv", "n.v")} AS cosine
    |  FROM lab n CROSS JOIN q
    |  WHERE n.vec_id != query_id),
    |pos AS (SELECT query_id, nbr_id AS pos_id, cosine AS pos_cosine
    |  FROM scored WHERE same
    |  QUALIFY row_number() OVER (PARTITION BY query_id
    |    ORDER BY cosine DESC, nbr_id) = 1),
    |neg AS (SELECT query_id, nbr_id AS neg_id, cosine AS neg_cosine,
    |  row_number() OVER (PARTITION BY query_id
    |    ORDER BY cosine DESC, nbr_id) AS neg_rank
    |  FROM scored WHERE NOT same QUALIFY neg_rank <= 5)
    |SELECT p2.query_id, p2.pos_id, p2.pos_cosine, n2.neg_rank,
    |  n2.neg_id, n2.neg_cosine
    |FROM pos p2 JOIN neg n2 USING (query_id)
    |ORDER BY query_id, neg_rank""".stripMargin
  }

  /** Deterministic synthetic domain-link graph from doc_id arithmetic — 20
    * domains, two modular outlinks plus a hub link concentrating inlinks on
    * d0..d3. ONE definition feeds the pagerank/degree gates and the v4
    * capstone on both engines, so the mirrors cannot drift. */
  private def synthDomainEdges(docs: DataFrame): DataFrame = {
    def dom(e: Column) = concat(lit("d"), e.cast("string"))
    docs.select(
      dom(col("doc_id") % 20).as("src"),
      explode(array(
        dom((col("doc_id") * 7 + 3) % 20),
        dom((col("doc_id") * 13 + 5) % 20),
        dom(col("doc_id") % 4))).as("dst"))
  }

  /** DuckDB mirror of [[synthDomainEdges]] + edge-weight aggregation. */
  private val SynthEdgesSql: String =
    s"""e0 AS (
       |  SELECT 'd' || CAST(doc_id % 20 AS VARCHAR) AS src,
       |    'd' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst FROM documents
       |  UNION ALL SELECT 'd' || CAST(doc_id % 20 AS VARCHAR),
       |    'd' || CAST((doc_id * 13 + 5) % 20 AS VARCHAR) FROM documents
       |  UNION ALL SELECT 'd' || CAST(doc_id % 20 AS VARCHAR),
       |    'd' || CAST(doc_id % 4 AS VARCHAR) FROM documents),
       |w AS (SELECT src, dst, count(*) AS weight FROM e0 GROUP BY 1, 2)""".stripMargin

  /** PageRank CTE chain over [[SynthEdgesSql]]'s `w` — `iters` unrolled
    * iterations mirroring LinkGraph.pageRank's fold mode (inflow ordered by
    * src, round9 per step, dangling mass dropped). Ends in
    * `r<iters>(node, rank)`. With `personalized = true` the caller must
    * define `sd(node, w)` (the seed teleport weights) and the chain
    * mirrors personalizedPageRank: r0 = round9(seed weight), base term
    * (1 − 0.85)·seedWeight — the damping literal CAST to DOUBLE so the
    * multiply matches Spark's double arithmetic exactly (the uniform
    * chain's decimal (1 − 0.85)/n deviation sits below the round9 grain,
    * but a seed-weight multiply deserves the explicit cast). */
  private[queries] def pageRankCtes(iters: Int, personalized: Boolean = false): String = {
    val r0 =
      if (personalized)
        """r0 AS (SELECT nodes.node, round(coalesce(sd.w, CAST(0 AS DOUBLE)), 9)
          |  AS rank FROM nodes LEFT JOIN sd ON sd.node = nodes.node)""".stripMargin
      else
        "r0 AS (SELECT node, round(1.0 / n, 9) AS rank FROM nodes CROSS JOIN nn)"
    def base(i: Int) =
      if (personalized)
        s"""r$i AS (SELECT nodes.node,
           |  round((1 - CAST(0.85 AS DOUBLE)) * coalesce(sd.w, CAST(0 AS DOUBLE))
           |    + 0.85 * coalesce(inflow, CAST(0 AS DOUBLE)), 9) AS rank
           |  FROM nodes LEFT JOIN sd ON sd.node = nodes.node
           |  LEFT JOIN c$i ON c$i.dst = nodes.node)""".stripMargin
      else
        s"""r$i AS (SELECT node,
           |  round((1 - 0.85) / n + 0.85 * coalesce(inflow, CAST(0 AS DOUBLE)), 9)
           |    AS rank
           |  FROM nodes CROSS JOIN nn LEFT JOIN c$i ON c$i.dst = nodes.node)""".stripMargin
    s"""nodes AS (SELECT src AS node FROM w UNION SELECT dst FROM w),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |od AS (SELECT src, sum(weight) AS outdeg FROM w GROUP BY 1),
       |$r0,
       |${(1 to iters).map { i =>
            s"""c$i AS (SELECT w.dst,
            |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
            |    list((r.rank / od.outdeg) * w.weight ORDER BY w.src)),
            |    (acc, x) -> acc + x) AS inflow
            |  FROM w JOIN r${i - 1} r ON r.node = w.src
            |  JOIN od ON od.src = w.src GROUP BY w.dst),
            |${base(i)}""".stripMargin }.mkString(",\n")}""".stripMargin
  }

  /** HITS CTE chain over [[SynthEdgesSql]]'s `w` — `iters` unrolled
    * authority/hub half-steps mirroring LinkGraph.hits exactly: per-edge
    * contributions round9 then DECIMAL(38,9)-summed (order-free, so no
    * fold mode is needed), L1 norm via one double division, round9 per
    * half-step. Ends in `a<iters>` / `h<iters>` (node, score). */
  private def hitsCtes(iters: Int): String = {
    def half(i: Int, out: String, from: String, to: String, src: String) =
      s"""$out${i}r AS (SELECT w.$to AS nd,
         |  sum(CAST(round(s.score * w.weight, 9) AS DECIMAL(38,9))) AS raw
         |  FROM w JOIN $src s ON s.node = w.$from GROUP BY 1),
         |$out${i}s AS (SELECT sum(raw) AS tot FROM $out${i}r),
         |$out$i AS (SELECT nodes.node,
         |  round(coalesce(CAST(raw AS DOUBLE), CAST(0 AS DOUBLE))
         |    / CAST(tot AS DOUBLE), 9) AS score
         |  FROM nodes LEFT JOIN $out${i}r ON $out${i}r.nd = nodes.node
         |  CROSS JOIN $out${i}s)""".stripMargin
    s"""nodes AS (SELECT src AS node FROM w UNION SELECT dst FROM w),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |h0 AS (SELECT node, round(1.0 / n, 9) AS score
       |  FROM nodes CROSS JOIN nn),
       |${(1 to iters).map { i =>
            half(i, "a", "src", "dst", s"h${i - 1}") + ",\n" +
              half(i, "h", "dst", "src", s"a$i") }.mkString(",\n")}""".stripMargin
  }

  val all: Seq[(String, Q)] = Seq(

    // ==================== text analysis ====================

    // per-source corpus report — the one-pass analytics sweep a curation
    // run starts from: volume, median length, quality / language / exact-dup
    // rates, all integer or interpolated-percentile outputs so both engines
    // hash identically without exact-sum machinery.
    "q_text_corpus_report" -> Q(
      (s, d) => {
        val scored = docsP(s, d).select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("n_toks"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.langId(col("text")).as("lang"),
          md5(col("text")).as("h"))
        scored.groupBy("source").agg(
            count(lit(1)).as("n_docs"),
            sum("n_toks").as("n_tokens"),
            expr("percentile(n_toks, 0.5)").as("p50_tokens"),
            sum(when(col("quality") >= 0.6, 1L).otherwise(0L)).as("n_quality_ok"),
            sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
            (count(lit(1)) - countDistinct(col("h"))).as("n_dup"))
          .orderBy("source")
      },
      Some(s"""WITH ${qualityLangCtes("documents")}
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        | quantile_cont(n_toks, 0.5) AS p50_tokens,
        | CAST(sum(CASE WHEN quality >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok,
        | CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        | CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dup
        |FROM scored GROUP BY source ORDER BY source""".stripMargin)),

    // ---- Shannon char entropy (native codegen'd expression): the cheap
    //      gibberish/boilerplate signal. Contributions are round12-pinned
    //      and decimal-summed, so the value is order-independent and the
    //      oracle mirrors it from per-char group counts — bit-exact.
    "q_text_entropy" -> Q(
      (s, d) => {
        graft.GraftExtensions.register(s)
        docsP(s, d).select(col("doc_id"),
            graft.functions.Entropy.charEntropy(col("text")).as("entropy"))
          .withColumn("is_low_entropy", col("entropy") < 3.5)
          .orderBy("doc_id")
      },
      Some(s"""WITH ch AS (SELECT doc_id,
        |  unnest(regexp_extract_all(text, '[\\s\\S]')) AS c FROM documents),
        |g AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(sum(n) AS DOUBLE) AS L FROM g GROUP BY 1),
        |e AS (SELECT g.doc_id,
        |  CAST(sum(CAST(round(-((n / L) * ln(n / L) / ln(2)), 12)
        |    AS DECIMAL(28,12))) AS DOUBLE) AS entropy
        |  FROM g JOIN tot USING (doc_id) GROUP BY 1)
        |SELECT d.doc_id, coalesce(e.entropy, CAST(0 AS DOUBLE)) AS entropy,
        |  coalesce(e.entropy, CAST(0 AS DOUBLE)) < 3.5 AS is_low_entropy
        |FROM documents d LEFT JOIN e USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // ---- Unicode NFC normalization (native expression, SQL nfc_normalize
    //      — DuckDB ships the same-named function, which IS the oracle):
    //      the canonicalize-before-hash step. Synthetic text carries a
    //      decomposed e+U+0301 (composes, length shrinks), a precomposed
    //      U+00E9 (no-op), and the U+FB01 ligature (NFC leaves it alone —
    //      the NFC/NFKC distinction, pinned).
    "q_text_normalize" -> Q(
      (s, d) => {
        graft.GraftExtensions.register(s)
        val raw = concat(
          array_join(slice(split(col("text"), " "), 1, 4), " "),
          lit(" caf"), lit("e\u0301"),   // decomposed: NFC composes
          lit(" \u00e9clair"),         // precomposed: no-op
          lit(" \ufb01nal"))           // fi ligature: NFC keeps (NFKC would fold)
        docsP(s, d).select(col("doc_id"), raw.as("raw"))
          .select(col("doc_id"),
            length(col("raw")).cast("bigint").as("len_raw"),
            length(graft.functions.TextNormalize.nfcNormalize(col("raw")))
              .cast("bigint").as("len_nfc"),
            md5(graft.functions.TextNormalize.nfcNormalize(col("raw")))
              .as("nfc_md5"))
          .orderBy("doc_id")
      },
      Some(s"""WITH r AS (SELECT doc_id,
        |  coalesce(array_to_string(list_slice(string_split(text, ' '), 1, 4), ' '), '')
        |  || ' caf' || chr(101) || chr(769)
        |  || ' ' || chr(233) || 'clair'
        |  || ' ' || chr(64257) || 'nal' AS raw FROM documents)
        |SELECT doc_id, CAST(length(raw) AS BIGINT) AS len_raw,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc,
        |  md5(nfc_normalize(raw)) AS nfc_md5
        |FROM r ORDER BY doc_id""".stripMargin)),

    "q_text_stats" -> Q(
      (s, d) => docsP(s, d).select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("bigint").as("n_tokens"),
        TextFunctions.bpeTokenCount(col("text")).cast("bigint").as("n_bpe_tokens"),
        TextFunctions.avgTokenLen(col("text")).as("avg_token_len"),
        TextFunctions.punctRatio(col("text")).as("punct_ratio"),
        TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, text, $ToksSql AS toks FROM documents)
        |SELECT doc_id,
        | len(toks) AS n_tokens,
        | CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
        | $AvgTokLenSql AS avg_token_len,
        | $PunctRatioSql AS punct_ratio,
        | $StopRatioSql AS stopword_ratio
        |FROM t ORDER BY doc_id""".stripMargin)),

    "q_text_quality_lang" -> Q(
      (s, d) => docsP(s, d).select(
        col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.langId(col("text")).as("lang_guess"))
        .orderBy("doc_id"),
      Some {
        val langHits = TextFunctions.LangMarkers.map { case (lang, ms) =>
          s"len(list_filter(toks, x -> x IN (${ms.map(m => s"'$m'").mkString(", ")}))) AS h_$lang"
        }.mkString(",\n  ")
        val langNames = TextFunctions.LangMarkers.map(_._1)
        val greatest = s"greatest(${langNames.map("h_" + _).mkString(", ")})"
        val langCase = langNames.map(l => s"WHEN h_$l = m THEN '$l'").mkString(" ")
        s"""WITH t AS (SELECT doc_id, text, $ToksSql AS toks FROM documents),
           |h AS (SELECT doc_id, text, toks, $langHits FROM t),
           |g AS (SELECT *, $greatest AS m FROM h)
           |SELECT doc_id,
           | ((((CASE WHEN length(text) BETWEEN 50 AND 10000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
           |  + (CASE WHEN $StopRatioSql > 0.01 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
           |  + (CASE WHEN $PunctRatioSql < 0.2 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
           |  + (CASE WHEN $AvgTokLenSql BETWEEN 2.0 AND 12.0 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)) AS quality,
           | CASE WHEN m = 0 THEN 'und' $langCase END AS lang_guess
           |FROM g ORDER BY doc_id""".stripMargin
      }),

    "q_text_fingerprint" -> Q(
      (s, d) => docsP(s, d).select(
        col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fingerprint"),
        TextFunctions.rollingHash(col("text")).as("rolling_hash"))
        .orderBy("doc_id"),
      // 2-arg list_reduce seeds with the first element; the Spark fold seeds
      // with 0, and (0*257 + c1) % p == c1, so the two are identical.
      Some(s"""WITH t AS (SELECT doc_id, text, $ToksSql AS toks FROM documents)
        |SELECT doc_id,
        | md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint,
        | CASE WHEN length(text) = 0 THEN 0
        |  ELSE list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 257 + x) % 2147483647) END AS rolling_hash
        |FROM t ORDER BY doc_id""".stripMargin)),

    // ---- the capstone corpus-cleaning flow: quality gate -> language gate
    //      -> exact-dedup keeper -> cleaned corpus with metrics. One
    //      declarative plan: the gates run in the scan stage, dedup adds the
    //      single content-hash shuffle.
    "q_pipeline_corpus_clean" -> Q(
      (s, d) => {
        val scored = docsP(s, d).select(
          col("doc_id"), col("text"), col("source"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.langId(col("text")).as("lang"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("n_tokens"))
          .filter(col("quality") >= 0.6 && col("lang") === "en")
        val grp = Window.partitionBy(md5(col("text")))
        scored
          .withColumn("is_keeper", col("doc_id") === min("doc_id").over(grp))
          .filter(col("is_keeper"))
          .select("doc_id", "source", "quality", "n_tokens")
          .orderBy("doc_id")
      },
      Some {
        val langNames = TextFunctions.LangMarkers.map(_._1)
        val langHits = TextFunctions.LangMarkers.map { case (lang, ms) =>
          s"len(list_filter(toks, x -> x IN (${ms.map(m => s"'$m'").mkString(", ")}))) AS h_$lang"
        }.mkString(", ")
        val greatest = s"greatest(${langNames.map("h_" + _).mkString(", ")})"
        val langCase = langNames.map(l => s"WHEN h_$l = m THEN '$l'").mkString(" ")
        s"""WITH t AS (SELECT doc_id, text, source, $ToksSql AS toks FROM documents),
           |h AS (SELECT *, $langHits FROM t),
           |g AS (SELECT *, $greatest AS m FROM h),
           |scored AS (SELECT doc_id, text, source,
           | ((((CASE WHEN length(text) BETWEEN 50 AND 10000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
           |  + (CASE WHEN $StopRatioSql > 0.01 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
           |  + (CASE WHEN $PunctRatioSql < 0.2 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
           |  + (CASE WHEN $AvgTokLenSql BETWEEN 2.0 AND 12.0 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)) AS quality,
           | CASE WHEN m = 0 THEN 'und' $langCase END AS lang,
           | len(toks) AS n_tokens
           |FROM g),
           |gated AS (SELECT * FROM scored WHERE quality >= 0.6 AND lang = 'en')
           |SELECT doc_id, source, quality, n_tokens FROM (
           | SELECT *, doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_keeper
           | FROM gated)
           |WHERE is_keeper ORDER BY doc_id""".stripMargin
      }),

    // ---- Curation capstone: the full LLM-corpus preparation chain in one
    //      query — quality/lang gate -> exact-dedup keeper -> benchmark
    //      decontamination -> PII redaction -> per-source cap -> token-budget
    //      packing. Output is the packed-bin layout of the curated corpus.
    "q_pipeline_corpus_curate" -> Q(
      (s, d) => {
        import graft.functions.Redact
        import graft.operators.{Curation, Decontaminate, Packing}
        val scored = docsP(s, d).select(
            col("doc_id"), col("text"), col("source"),
            TextFunctions.qualityScore(col("text")).as("quality"),
            TextFunctions.langId(col("text")).as("lang"))
          .filter(col("quality") >= 0.6 && col("lang") === "en")
        val grp = Window.partitionBy(md5(col("text")))
        // read twice (decontamination edges + the final semi-join): persist
        // so the quality/lang expression tree evaluates once
        val kept = scored
          .withColumn("is_keeper", col("doc_id") === min("doc_id").over(grp))
          .filter(col("is_keeper") && pmod(col("doc_id"), lit(20)) =!= 0)
          .select("doc_id", "source", "text")
          .gatePersist()
        kept.count()
        val bench = docsP(s, d).filter(pmod(col("doc_id"), lit(20)) === 0)
          .select("doc_id", "text")
        val decon = Decontaminate.fractions(kept, bench, "doc_id", "text",
            threshold = 0.5, shingleK = ShingleK)
          .filter(!col("is_contaminated"))
          .select("doc_id")
        val clean = kept.join(decon, Seq("doc_id"), "left_semi")
          .withColumn("rtext", Redact.redactPii(col("text")))
        val capped = Curation.capPerKey(clean, col("source"), n = 40,
            order = Seq(col("doc_id")), idCol = col("doc_id"))
          .withColumn("n_tokens", TextFunctions.tokenCount(col("rtext")).cast("bigint"))
        Packing.binStats(
            Packing.packBins(capped, "doc_id", col("n_tokens"),
              budgetTokens = 1024L, shards = 4),
            col("n_tokens"), budgetTokens = 1024L)
          .select(col("shard"), col("bin"), col("n_docs"), col("n_tokens"))
          .orderBy("shard", "bin")
      },
      Some {
        import graft.functions.Redact
        val langNames = TextFunctions.LangMarkers.map(_._1)
        val langHits = TextFunctions.LangMarkers.map { case (lang, ms) =>
          s"len(list_filter(toks, x -> x IN (${ms.map(m => s"'$m'").mkString(", ")}))) AS h_$lang"
        }.mkString(", ")
        val greatest = s"greatest(${langNames.map("h_" + _).mkString(", ")})"
        val langCase = langNames.map(l => s"WHEN h_$l = m THEN '$l'").mkString(" ")
        val rToksSql = ToksSql.replace("lower(text)", "lower(rtext)")
        s"""WITH t AS (SELECT doc_id, text, source, $ToksSql AS toks FROM documents),
           |h AS (SELECT *, $langHits FROM t),
           |g AS (SELECT *, $greatest AS m FROM h),
           |scored AS (SELECT doc_id, text, source,
           | ((((CASE WHEN length(text) BETWEEN 50 AND 10000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
           |  + (CASE WHEN $StopRatioSql > 0.01 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
           |  + (CASE WHEN $PunctRatioSql < 0.2 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
           |  + (CASE WHEN $AvgTokLenSql BETWEEN 2.0 AND 12.0 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)) AS quality,
           | CASE WHEN m = 0 THEN 'und' $langCase END AS lang
           |FROM g),
           |gated AS (SELECT * FROM scored WHERE quality >= 0.6 AND lang = 'en'),
           |kept AS (SELECT doc_id, source, text FROM (
           |  SELECT *, doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_keeper
           |  FROM gated) WHERE is_keeper AND doc_id % 20 != 0),
           |kt AS (SELECT doc_id, $ToksSql AS toks FROM kept),
           |csh AS (SELECT doc_id, $TokenFp60Sql AS fp FROM
           |  (SELECT doc_id, unnest($ShinglesSql) AS tok FROM kt)),
           |bt AS (SELECT doc_id, $ToksSql AS toks FROM documents WHERE doc_id % 20 = 0),
           |bsh AS (SELECT DISTINCT $TokenFp60Sql AS fp FROM
           |  (SELECT doc_id, unnest($ShinglesSql) AS tok FROM bt)),
           |cm AS (SELECT doc_id, count(*) AS n_matched FROM csh
           |  WHERE fp IN (SELECT fp FROM bsh) GROUP BY 1),
           |cs AS (SELECT doc_id, count(*) AS n_sh FROM csh GROUP BY 1),
           |clean2 AS (SELECT k.doc_id, k.source, k.text FROM kept k
           |  JOIN cs ON cs.doc_id = k.doc_id
           |  LEFT JOIN cm ON cm.doc_id = k.doc_id
           |  WHERE CAST(coalesce(cm.n_matched, 0) AS DOUBLE) / cs.n_sh < 0.5),
           |red AS (SELECT doc_id, source,
           |  regexp_replace(regexp_replace(regexp_replace(text,
           |    '${Redact.EmailPattern}', '[EMAIL]', 'g'),
           |    '${Redact.Ipv4Pattern}', '[IP]', 'g'),
           |    '${Redact.PhonePattern}', '[PHONE]', 'g') AS rtext FROM clean2),
           |capd AS (SELECT doc_id, source, rtext FROM (
           |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
           |  FROM red) WHERE rk <= 40),
           |tok2 AS (SELECT doc_id, CAST(len($rToksSql) AS BIGINT) AS n_tokens,
           |  ${fp60Sql("CAST(doc_id AS VARCHAR)")} % 4 AS shard FROM capd),
           |p AS (SELECT doc_id, n_tokens, shard,
           |  CAST(floor(CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard
           |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |    AS BIGINT) / 1024.0) AS BIGINT) AS bin
           |  FROM tok2)
           |SELECT shard, bin, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
           |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    // ---- Repetition quality signals (Gopher/C4-style): duplicate-line
    //      fraction and duplicated word-2-gram fraction — the boilerplate /
    //      loop detectors a pretraining cleaner runs beside qualityScore.
    // ---- Mixture capstone (round 12): the data-recipe chain end to end —
    //      temperature-rebalanced source mixture (T=2 downsample toward
    //      flattened shares) -> per-source TOKEN budget (3000 tokens) ->
    //      packed training bins (512-token budget) -> per-source layout
    //      summary (docs kept, tokens, bins touched). Every stage is
    //      individually oracle-proven; this gate proves the composition.
    "q_pipeline_mixture" -> Q(
      (s, d) => {
        import graft.operators.{Curation, Packing, Sampling}
        // same head-heavy source fold as q_sample_temperature, so the
        // mixture stage genuinely downsamples (uniform sources would pass
        // everything through)
        val docs = Tables.documents(s, d).select(col("doc_id"),
          when(pmod(col("doc_id"), lit(4)) < 2, lit("mega"))
            .when(pmod(col("doc_id"), lit(4)) === 2, lit("mid"))
            .otherwise(col("source")).as("source"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("n_tokens"))
        val mixed = Sampling.temperatureSample(docs, col("doc_id"), "source",
          temperature = 2.0, salt = ":mx1")
        val capped = Curation.capTokensPerKey(mixed, col("source"),
          col("n_tokens"), budget = 3000L, order = Seq(col("doc_id")),
          idCol = col("doc_id"))
        Packing.packBins(capped, "doc_id", col("n_tokens"),
            budgetTokens = 512L, shards = 8)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("n_tokens"),
            countDistinct(col("shard") * lit(100000L) + col("bin")).as("n_bins"))
          .orderBy("source")
      },
      Some(s"""WITH t AS (SELECT doc_id,
        |  CASE WHEN doc_id % 4 < 2 THEN 'mega'
        |       WHEN doc_id % 4 = 2 THEN 'mid' ELSE source END AS source,
        |  CAST(len($ToksSql) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT source, count(*) AS n FROM t GROUP BY 1),
        |r AS (SELECT source,
        |  pow(CAST(n AS DOUBLE), CAST(-0.5 AS DOUBLE))
        |    / max(pow(CAST(n AS DOUBLE), CAST(-0.5 AS DOUBLE))) OVER ()
        |    * CAST(100.0 AS DOUBLE) AS rate_pct FROM c),
        |k AS (SELECT t.* FROM t JOIN r USING (source)
        |  WHERE ${fp60Sql("CAST(doc_id AS VARCHAR) || ':mx1'")} % 100 < rate_pct),
        |cap AS (SELECT doc_id, source, n_tokens FROM (
        |  SELECT doc_id, source, n_tokens, sum(n_tokens) OVER (
        |    PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM k) WHERE cum - n_tokens < 3000),
        |p AS (SELECT doc_id, source, n_tokens,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR)")} % 8 AS shard FROM cap),
        |b AS (SELECT source, n_tokens, shard,
        |  CAST(floor(CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) / 512.0) AS BIGINT) AS bin
        |  FROM p)
        |SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        | CAST(count(DISTINCT shard * 100000 + bin) AS BIGINT) AS n_bins
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Gopher-style structural quality signals (Rae et al. 2021 §A1.1):
    //      symbol-to-word ratio, bullet-line and ellipsis-line fractions,
    //      alphabetic-word fraction. Pure integer-count ratios — zero
    //      floating-point drift between engines.
    "q_text_gopher_quality" -> Q(
      (s, d) => docsP(s, d).select(
        col("doc_id"),
        TextFunctions.symbolWordRatio(col("text")).as("symbol_word_ratio"),
        TextFunctions.bulletLineFraction(col("text")).as("bullet_line_frac"),
        TextFunctions.ellipsisLineFraction(col("text")).as("ellipsis_line_frac"),
        TextFunctions.alphaWordFraction(col("text")).as("alpha_word_frac"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, text, $ToksSql AS toks FROM documents),
        |l AS (SELECT doc_id, text, toks,
        |  list_filter(string_split(text, chr(10)), x -> len(trim(x)) > 0) AS lines
        |  FROM t)
        |SELECT doc_id,
        | CASE WHEN len(toks) > 0 THEN
        |  CAST(length(text) - length(replace(text, '#', ''))
        |   + len(regexp_extract_all(text, '\\.\\.\\.|…')) AS DOUBLE) / len(toks)
        |  ELSE CAST(0.0 AS DOUBLE) END AS symbol_word_ratio,
        | CASE WHEN len(lines) > 0 THEN
        |  CAST(len(list_filter(lines, x -> regexp_matches(trim(x), '^[-*•]'))) AS DOUBLE)
        |   / len(lines) ELSE CAST(0.0 AS DOUBLE) END AS bullet_line_frac,
        | CASE WHEN len(lines) > 0 THEN
        |  CAST(len(list_filter(lines, x -> regexp_matches(trim(x), '(\\.\\.\\.|…)$$'))) AS DOUBLE)
        |   / len(lines) ELSE CAST(0.0 AS DOUBLE) END AS ellipsis_line_frac,
        | CASE WHEN len(toks) > 0 THEN
        |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
        |   / len(toks) ELSE CAST(0.0 AS DOUBLE) END AS alpha_word_frac
        |FROM l ORDER BY doc_id""".stripMargin)),

    "q_text_repetition" -> Q(
      (s, d) => docsP(s, d).select(
        col("doc_id"),
        TextFunctions.dupLineFraction(col("text")).as("dup_line_frac"),
        TextFunctions.dupBigramFraction(col("text")).as("dup_bigram_frac"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, text, $ToksSql AS toks FROM documents),
        |l AS (SELECT doc_id, toks,
        |  list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
        |    x -> len(x) > 0) AS lines FROM t),
        |g AS (SELECT doc_id, lines, toks,
        |  CASE WHEN len(toks) >= 2
        |   THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |   ELSE [] END AS grams FROM l)
        |SELECT doc_id,
        | CASE WHEN len(lines) > 0
        |  THEN CAST(1.0 AS DOUBLE) - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
        |  ELSE CAST(0.0 AS DOUBLE) END AS dup_line_frac,
        | CASE WHEN len(toks) >= 2
        |  THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams)
        |  ELSE CAST(0.0 AS DOUBLE) END AS dup_bigram_frac
        |FROM g ORDER BY doc_id""".stripMargin)),

    // ---- Domain curation: URL-host extraction (deterministically injected
    //      URLs, like the PII gate) and the per-key document cap. The
    //      injected authorities deliberately carry mixed case, a www prefix,
    //      a port, and userinfo — all of which must normalize away, or a
    //      blocklist/cap keyed on the domain over/under-counts immediately.
    "q_text_domains" -> Q(
      (s, d) => {
        import graft.operators.Curation
        val seeded = docsP(s, d).select(col("doc_id"),
          concat(col("text"),
            lit(" see https://WWW.Site"), pmod(col("doc_id"), lit(7)),
            lit(".Example.ORG:8080/p/"), col("doc_id"),
            lit(" and http://u"), col("doc_id"),
            lit("@cdn"), pmod(col("doc_id"), lit(3)),
            lit(".example.net/x")).as("text"))
        Curation.domainEdges(seeded, "doc_id", "text")
          .groupBy("domain").agg(count(lit(1)).as("n"))
          .orderBy("domain")
      },
      Some(s"""WITH seeded AS (SELECT doc_id,
        |  text || ' see https://WWW.Site' || (doc_id % 7) || '.Example.ORG:8080/p/' ||
        |  doc_id || ' and http://u' || doc_id || '@cdn' || (doc_id % 3) ||
        |  '.example.net/x' AS text
        |  FROM documents),
        |e AS (SELECT doc_id, unnest(list_transform(regexp_extract_all(text,
        |  '${graft.operators.Curation.DomainPattern}', 1),
        |  a -> regexp_replace(lower(regexp_replace(regexp_replace(a,
        |       '^[^@/]*@', ''), ':[0-9]+$$', '')), '^www\\.', ''))) AS domain
        |  FROM seeded)
        |SELECT domain, count(*) AS n FROM e GROUP BY domain ORDER BY domain""".stripMargin)),

    "q_curate_cap" -> Q(
      (s, d) => {
        import graft.operators.Curation
        val capped = Curation.capPerKey(Tables.documents(s, d),
          col("source"), n = 30, order = Seq(col("doc_id")), idCol = col("doc_id"))
        capped.groupBy("source")
          .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_sum"))
          .orderBy("source")
      },
      Some("""WITH r AS (SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
        |  FROM documents)
        |SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM r WHERE rk <= 30 GROUP BY source ORDER BY source""".stripMargin)),

    // TOKEN-budget per-source cap — data recipes specify domain mixtures in
    // tokens, not documents: each source keeps rows (in doc_id order) while
    // the prior kept rows total < 700 tokens, so the row crossing the
    // budget is the last one kept. The oracle runs the single global window
    // the two-phase Spark shape must equal exactly.
    "q_curate_token_budget" -> Q(
      (s, d) => {
        import graft.operators.Curation
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("n_tokens"))
        Curation.capTokensPerKey(docs, col("source"), col("n_tokens"),
            budget = 700L, order = Seq(col("doc_id")), idCol = col("doc_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, source, $ToksSql AS toks FROM documents),
        |c AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
        |w AS (SELECT doc_id, source, n_tokens, sum(n_tokens) OVER (
        |  PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM c)
        |SELECT doc_id, source, n_tokens FROM w
        |WHERE cum - n_tokens < 700 ORDER BY doc_id""".stripMargin)),

    // ---- Adaptive per-source quality cut: keep docs at/above their own
    //      source's 25th quality percentile (CCNet's per-shard tercile idea,
    //      generalized). Thresholds are one exact-percentile aggregation over
    //      the 16-valued rule score, broadcast back; the cut runs in the
    //      corpus scan stage — no window, no corpus shuffle. Values are
    //      rounded to 9 decimals in the OUTPUT only (interpolated thresholds
    //      can differ in the last ulp across engines); membership compares
    //      the unrounded values, which sit >= 1/(4(n-1)) of a 0.2 quality
    //      step away from any threshold ulp zone.
    "q_curate_quality_threshold" -> Q(
      (s, d) => {
        import graft.operators.Curation
        val scored = docsP(s, d).select(col("doc_id"), col("source"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        Curation.thresholdBySource(scored, "source", col("quality"), p = 0.25)
          .select(col("doc_id"), col("source"),
            round(col("quality"), 9).as("quality_r"),
            round(col("threshold"), 9).as("threshold_r"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${qualityLangCtes("documents")},
        |th AS (SELECT source, quantile_cont(quality, 0.25) AS threshold
        |  FROM scored GROUP BY 1)
        |SELECT sc.doc_id, sc.source, round(sc.quality, 9) AS quality_r,
        |  round(th.threshold, 9) AS threshold_r
        |FROM scored sc JOIN th USING (source) WHERE sc.quality >= th.threshold
        |ORDER BY doc_id""".stripMargin)),

    // ---- Epoch-capped mixture plan: target weights (deterministic
    //      per-source formula so both engines derive them) + a 100k-token
    //      budget + a 4-epoch repeat cap -> per-source epochs and the
    //      realized mixture once the cap binds. Both normalization totals
    //      sum 9-decimal DECIMAL(28,9) terms (order-independent); every
    //      double division has one parenthesization on both engines.
    "q_curate_mixture_plan" -> Q(
      (s, d) => {
        import graft.operators.Sampling
        val docs = docsP(s, d).select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("n_toks"))
        val weights = docs.select("source").distinct()
          .select(col("source"),
            ((length(col("source")) % 5) + 1).cast("double").as("weight"))
        Sampling.mixturePlan(docs, "source", col("n_toks"), weights,
            budgetTokens = 100000L, maxEpochs = 4.0)
          .orderBy("source")
      },
      Some(s"""WITH t AS (SELECT doc_id, source, $ToksSql AS toks FROM documents),
        |c AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(toks)) AS BIGINT) AS n_tokens FROM t GROUP BY 1),
        |w AS (SELECT source, CAST((length(source) % 5) + 1 AS DOUBLE) AS weight
        |  FROM (SELECT DISTINCT source FROM documents)),
        |wt AS (SELECT sum(CAST(round(weight, 9) AS DECIMAL(28,9))) AS w_tot FROM w),
        |wn AS (SELECT source, CAST(CAST(round(weight, 9) AS DECIMAL(28,9)) AS DOUBLE)
        |    / CAST(w_tot AS DOUBLE) AS target_w FROM w, wt),
        |p AS (SELECT c.source, n_docs, n_tokens, target_w,
        |  CASE WHEN n_tokens > 0 THEN least(CAST(4.0 AS DOUBLE),
        |    (target_w * CAST(100000 AS DOUBLE)) / CAST(n_tokens AS DOUBLE))
        |    ELSE CAST(0.0 AS DOUBLE) END AS epochs
        |  FROM c JOIN wn USING (source)),
        |p2 AS (SELECT *, CAST(round(epochs * CAST(n_tokens AS DOUBLE), 9)
        |  AS DECIMAL(28,9)) AS planned9 FROM p),
        |tp AS (SELECT sum(planned9) AS total_p FROM p2)
        |SELECT source, n_docs, n_tokens, target_w, epochs,
        |  CAST(planned9 AS DOUBLE) AS tokens_planned,
        |  CAST(planned9 AS DOUBLE) / CAST(total_p AS DOUBLE) AS realized_w
        |FROM p2, tp ORDER BY source""".stripMargin)),

    // ---- UniMax allocation (round 14, Chung et al. ICLR 2023): the
    //      fairness-motivated mixture — uniform token budget per source
    //      until the epoch cap binds, surplus water-filled among the
    //      uncapped. Closed form via one cap-ascending window (capped iff
    //      cap*rem <= budget - cum_before — valid at every position since
    //      caps are sorted); decimal cap accumulation, single-division
    //      allocs. Budget 50000 against ~27k corpus tokens at 2 epochs
    //      exercises BOTH branches (small sources cap, the rest split).
    "q_sample_unimax" -> Q(
      (s, d) => {
        import graft.operators.Sampling
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("n_toks"))
        Sampling.unimaxPlan(docs, "source", col("n_toks"),
            budgetTokens = 50000L, maxEpochs = 2.0)
          .orderBy("source")
      },
      Some(s"""WITH t AS (SELECT doc_id, source, $ToksSql AS toks FROM documents),
        |c AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(toks)) AS BIGINT) AS n_tokens FROM t GROUP BY 1),
        |st AS (SELECT source, n_docs, n_tokens,
        |  CAST(round(CAST(n_tokens AS DOUBLE) * CAST(2.0 AS DOUBLE), 6)
        |    AS DECIMAL(28,6)) AS cap,
        |  coalesce(sum(CAST(round(CAST(n_tokens AS DOUBLE) * CAST(2.0 AS DOUBLE), 6)
        |      AS DECIMAL(28,6)))
        |    OVER (ORDER BY CAST(round(CAST(n_tokens AS DOUBLE) * CAST(2.0 AS DOUBLE), 6)
        |      AS DECIMAL(28,6)), source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    CAST(0 AS DECIMAL(28,6))) AS cum_before,
        |  count(*) OVER () -
        |    row_number() OVER (ORDER BY CAST(round(CAST(n_tokens AS DOUBLE)
        |      * CAST(2.0 AS DOUBLE), 6) AS DECIMAL(28,6)), source) + 1 AS rem
        |  FROM c),
        |fl AS (SELECT *,
        |  cap * rem <= CAST(50000 AS DECIMAL(28,6)) - cum_before AS is_capped
        |  FROM st),
        |lv AS (SELECT *,
        |  coalesce(sum(CASE WHEN is_capped THEN cap END) OVER (),
        |    CAST(0 AS DECIMAL(28,6))) AS capped_sum,
        |  sum(CASE WHEN is_capped THEN 0 ELSE 1 END) OVER () AS n_uncapped
        |  FROM fl),
        |a AS (SELECT source, n_docs, n_tokens,
        |  CAST(cap AS DOUBLE) AS cap_tokens, is_capped,
        |  CASE WHEN is_capped THEN CAST(cap AS DOUBLE)
        |    ELSE CAST(CAST(50000 AS DECIMAL(28,6)) - capped_sum AS DOUBLE)
        |      / CAST(n_uncapped AS DOUBLE) END AS alloc_tokens
        |  FROM lv)
        |SELECT source, n_docs, n_tokens, cap_tokens, is_capped, alloc_tokens,
        |  CASE WHEN n_tokens > 0
        |    THEN alloc_tokens / CAST(n_tokens AS DOUBLE)
        |    ELSE CAST(0.0 AS DOUBLE) END AS epochs,
        |  alloc_tokens / CAST(50000 AS DOUBLE) AS realized_w
        |FROM a ORDER BY source""".stripMargin)),

    // ---- Mixture-plan REALIZATION (round 13): the solver's (source,
    //      epochs) report turned into epoch-tagged data — floor(epochs)
    //      full passes per source plus a deterministic 10000-bucket
    //      hash-sampled partial pass for the fractional remainder.
    //      Summarized per (source, epoch) with an id checksum so the hash
    //      gate pins row-level replication, not just counts.
    "q_pipeline_mixture_realized" -> Q(
      (s, d) => {
        import graft.operators.Sampling
        val docs = docsP(s, d).select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("n_toks"))
        val weights = docs.select("source").distinct()
          .select(col("source"),
            ((length(col("source")) % 5) + 1).cast("double").as("weight"))
        val plan = Sampling.mixturePlan(docs, "source", col("n_toks"), weights,
          budgetTokens = 100000L, maxEpochs = 4.0)
        Sampling.realizeMixture(docs, "source", col("doc_id"), plan,
            salt = ":rx1")
          .groupBy("source", "epoch")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_toks").as("n_tokens"),
            sum("doc_id").as("id_sum"))
          .orderBy("source", "epoch")
      },
      Some(s"""WITH t AS (SELECT doc_id, source,
        |  CAST(len($ToksSql) AS BIGINT) AS n_toks FROM documents),
        |c AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens FROM t GROUP BY 1),
        |w AS (SELECT source, CAST((length(source) % 5) + 1 AS DOUBLE) AS weight
        |  FROM (SELECT DISTINCT source FROM documents)),
        |wt AS (SELECT sum(CAST(round(weight, 9) AS DECIMAL(28,9))) AS w_tot FROM w),
        |wn AS (SELECT source, CAST(CAST(round(weight, 9) AS DECIMAL(28,9)) AS DOUBLE)
        |    / CAST(w_tot AS DOUBLE) AS target_w FROM w, wt),
        |p AS (SELECT c.source,
        |  CASE WHEN n_tokens > 0 THEN least(CAST(4.0 AS DOUBLE),
        |    (target_w * CAST(100000 AS DOUBLE)) / CAST(n_tokens AS DOUBLE))
        |    ELSE CAST(0.0 AS DOUBLE) END AS epochs
        |  FROM c JOIN wn USING (source)),
        |r AS (SELECT t.doc_id, t.source, t.n_toks,
        |  CAST(floor(epochs) AS BIGINT)
        |    + CASE WHEN CAST(${fp60Sql("CAST(doc_id AS VARCHAR) || ':rx1'")} % 10000
        |        AS DOUBLE) < (epochs - floor(epochs)) * 10000.0
        |      THEN 1 ELSE 0 END AS n_copies
        |  FROM t JOIN p USING (source)),
        |e AS (SELECT doc_id, source, n_toks, unnest(range(n_copies)) AS epoch
        |  FROM r WHERE n_copies > 0)
        |SELECT source, epoch, count(*) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Sequence packing: token-budget bin assignment (shard-parallel
    //      contiguous greedy fill — the batching step before writing packed
    //      pre-training sequences). Shard and prefix sums are pure functions
    //      of the rows, so both engines lay out identical bins.
    "q_pack_bins" -> Q(
      (s, d) => {
        import graft.operators.Packing
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"))
        Packing.packBins(docs, "doc_id", col("n_tokens"),
            budgetTokens = 512L, shards = 8)
          .select(col("doc_id"), col("n_tokens").cast("bigint").as("n_tokens"),
            col("shard"), col("tokens_before"), col("bin"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS n_tokens,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR)")} % 8 AS shard FROM documents),
        |p AS (SELECT doc_id, n_tokens, shard,
        |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |  FROM t)
        |SELECT doc_id, n_tokens, shard, tokens_before,
        | CAST(floor(tokens_before / 512.0) AS BIGINT) AS bin
        |FROM p ORDER BY doc_id""".stripMargin)),

    // the loader-facing manifest for the packed layout: each doc's token
    // offset inside its bin (position-id / attention-boundary resets)
    "q_pack_manifest" -> Q(
      (s, d) => {
        import graft.operators.Packing
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"))
        Packing.packManifest(
            Packing.packBins(docs, "doc_id", col("n_tokens"),
              budgetTokens = 512L, shards = 8),
            budgetTokens = 512L)
          .select(col("doc_id"), col("shard"), col("bin"), col("offset"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS n_tokens,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR)")} % 8 AS shard FROM documents),
        |p AS (SELECT doc_id, n_tokens, shard,
        |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |  FROM t)
        |SELECT doc_id, shard,
        | CAST(floor(tokens_before / 512.0) AS BIGINT) AS bin,
        | tokens_before % 512 AS offset
        |FROM p ORDER BY doc_id""".stripMargin)),

    // ---- Next-fit-decreasing packing: same machinery, shard-local layout
    //      in token-count-descending order (id tie-break) — long docs open
    //      bins, short docs top them up. Per-bin stats gate the layout; the
    //      fill-ratio improvement over id order is asserted in OperatorsSpec.
    //      (Named nfd, not ffd: a bin closes forever once passed — first-fit,
    //      which reopens earlier bins, is gated by q_pack_bins_firstfit.)
    "q_pack_bins_nfd" -> Q(
      (s, d) => {
        import graft.operators.Packing
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"))
        val packed = Packing.packBins(docs, "doc_id", col("n_tokens"),
          budgetTokens = 512L, shards = 8, order = Seq(desc("n_tokens")))
        Packing.binStats(packed, col("n_tokens"), budgetTokens = 512L)
          .select(col("shard"), col("bin"), col("n_docs"), col("n_tokens"))
          .orderBy("shard", "bin")
      },
      Some(s"""WITH t AS (SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS n_tokens,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR)")} % 8 AS shard FROM documents),
        |p AS (SELECT doc_id, n_tokens, shard,
        |  CAST(floor(CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard
        |    ORDER BY n_tokens DESC, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) / 512.0) AS BIGINT) AS bin
        |  FROM t)
        |SELECT shard, bin, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Capacity-constrained (no-overflow) packing, decreasing-length
    //      layout: bins close when the next doc does not fit — the variant
    //      where layout order genuinely buys fill ratio. The sequential
    //      per-shard recurrence is mirrored by a recursive CTE stepping one
    //      row per shard per iteration (recursion depth = max shard size).
    "q_pack_bins_capped" -> Q(
      (s, d) => {
        import graft.operators.Packing
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"))
        Packing.packBinsCapped(docs, "doc_id", col("n_tokens"),
            budgetTokens = 512L, shards = 8, order = Seq(desc("n_tokens")))
          .select(col("doc_id"), col("n_tokens").cast("bigint").as("n_tokens"),
            col("shard"), col("bin"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE t AS (SELECT doc_id,
        |  CAST(len($ToksSql) AS BIGINT) AS n_tokens,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR)")} % 8 AS shard FROM documents),
        |s AS (SELECT *, CAST(row_number() OVER (PARTITION BY shard
        |  ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS rn FROM t),
        |r AS (
        |  SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT) AS bin,
        |    n_tokens AS fill FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.shard, s.rn, s.doc_id, s.n_tokens,
        |    CASE WHEN r.fill + s.n_tokens <= 512 THEN r.bin ELSE r.bin + 1 END,
        |    CASE WHEN r.fill + s.n_tokens <= 512 THEN r.fill + s.n_tokens
        |         ELSE s.n_tokens END
        |  FROM r JOIN s ON s.shard = r.shard AND s.rn = r.rn + 1)
        |SELECT doc_id, n_tokens, shard, bin FROM r ORDER BY doc_id""".stripMargin)),

    // ---- TRUE first-fit-decreasing packing: unlike next-fit, a document
    //      probes ALL open bins in its shard and reopens the first with room
    //      (FFD ≤ 11/9·OPT + 1 bins). The oracle steps the same recurrence
    //      with a recursive CTE whose state is the open-bin fill LIST —
    //      list_position over a list_transform finds the first fit (DuckDB
    //      returns 0, not NULL, for "no fit"); slice/concat rebuilds the
    //      updated fills vector.
    "q_pack_bins_firstfit" -> Q(
      (s, d) => {
        import graft.operators.Packing
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"))
        Packing.packBinsFirstFit(docs, "doc_id", col("n_tokens"),
            budgetTokens = 512L, shards = 8, order = Seq(desc("n_tokens")))
          .select(col("doc_id"), col("n_tokens").cast("bigint").as("n_tokens"),
            col("shard"), col("bin"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE t AS (SELECT doc_id,
        |  CAST(len($ToksSql) AS BIGINT) AS n_tokens,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR)")} % 8 AS shard FROM documents),
        |s AS (SELECT *, CAST(row_number() OVER (PARTITION BY shard
        |  ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS rn FROM t),
        |r AS (
        |  SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT) AS bin,
        |    [n_tokens] AS fills FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT shard, rn, doc_id, n_tokens,
        |    CASE WHEN idx = 0 THEN CAST(len(fills) AS BIGINT) ELSE idx - 1 END,
        |    CASE WHEN idx = 0 THEN list_append(fills, n_tokens)
        |         ELSE list_concat(list_concat(
        |             list_slice(fills, 1, CAST(idx AS INT) - 1),
        |             [fills[CAST(idx AS INT)] + n_tokens]),
        |           list_slice(fills, CAST(idx AS INT) + 1, len(fills))) END
        |  FROM (
        |    SELECT s.shard, s.rn, s.doc_id, s.n_tokens, r.fills,
        |      CAST(list_position(list_transform(r.fills,
        |        f -> f + s.n_tokens <= 512), true) AS BIGINT) AS idx
        |    FROM r JOIN s ON s.shard = r.shard AND s.rn = r.rn + 1))
        |SELECT doc_id, n_tokens, shard, bin FROM r ORDER BY doc_id""".stripMargin)),

    // ---- Packed-sequence materialization: bins from q_pack_bins assembled
    //      into training sequences (id-ordered concat, budget-bounded per
    //      bin); compared via md5 so the oracle hashes the exact bytes.
    "q_pack_sequences" -> Q(
      (s, d) => {
        import graft.operators.Packing
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"),
            TextFunctions.tokenCount(col("text")).as("n_tokens"))
        val packed = Packing.packBins(docs, "doc_id", col("n_tokens"),
          budgetTokens = 2048L, shards = 8)
        Packing.materialize(packed, "doc_id", "text")
          .select(col("shard"), col("bin"), col("n_docs"),
            md5(col("sequence")).as("seq_md5"))
          .orderBy("shard", "bin")
      },
      Some(s"""WITH t AS (SELECT doc_id, text, CAST(len($ToksSql) AS BIGINT) AS n_tokens,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR)")} % 8 AS shard FROM documents),
        |p AS (SELECT doc_id, text, shard,
        |  CAST(floor(CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) / 2048.0) AS BIGINT) AS bin
        |  FROM t)
        |SELECT shard, bin, count(*) AS n_docs,
        | md5(string_agg(text, chr(10) || chr(10) ORDER BY doc_id)) AS seq_md5
        |FROM p GROUP BY shard, bin ORDER BY shard, bin""".stripMargin)),

    // ---- Loader contract for the q_pack_sequences layout: per-bin document
    //      start offsets (position-id reset points) and token lengths
    //      (attention-mask boundaries) inside the assembled sequence —
    //      within-bin prefix sums, arrays comma-joined for the hash compare.
    "q_pack_loader" -> Q(
      (s, d) => {
        import graft.operators.Packing
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"))
        val packed = Packing.packBins(docs, "doc_id", col("n_tokens"),
          budgetTokens = 2048L, shards = 8)
        Packing.loaderBoundaries(packed, "doc_id", col("n_tokens"))
          .select(col("shard"), col("bin"), col("n_docs"), col("fill"),
            array_join(col("doc_starts"), ",").as("doc_starts"),
            array_join(col("doc_tokens"), ",").as("doc_tokens"))
          .orderBy("shard", "bin")
      },
      Some(s"""WITH t AS (SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS n_tokens,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR)")} % 8 AS shard FROM documents),
        |p AS (SELECT doc_id, n_tokens, shard,
        |  CAST(floor(CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) / 2048.0) AS BIGINT) AS bin
        |  FROM t),
        |b AS (SELECT doc_id, n_tokens, shard, bin,
        |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard, bin
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS off
        |  FROM p)
        |SELECT shard, bin, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS fill,
        | array_to_string(list(off ORDER BY off, doc_id), ',') AS doc_starts,
        | array_to_string(list(n_tokens ORDER BY off, doc_id), ',') AS doc_tokens
        |FROM b GROUP BY shard, bin ORDER BY shard, bin""".stripMargin)),

    // ---- Benchmark decontamination: every 20th document plays the eval set;
    //      the rest of the corpus is scored by the fraction of its distinct
    //      word 3-shingles found anywhere in that set (fp60 semi-join — the
    //      standard pretraining hygiene step before training).
    "q_decontaminate" -> Q(
      (s, d) => {
        import graft.operators.Decontaminate
        val docs = Tables.documents(s, d)
        Decontaminate.fractions(
            docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
            docs.filter(pmod(col("doc_id"), lit(20)) === 0),
            "doc_id", "text", threshold = 0.5, shingleK = ShingleK)
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |c0 AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM t WHERE doc_id % 20 != 0),
        |c AS (SELECT doc_id, $TokenFp60Sql AS fp FROM c0),
        |b0 AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM t WHERE doc_id % 20 = 0),
        |b AS (SELECT DISTINCT $TokenFp60Sql AS fp FROM b0),
        |m AS (SELECT doc_id, count(*) AS n_matched FROM c
        |  WHERE fp IN (SELECT fp FROM b) GROUP BY doc_id),
        |s AS (SELECT doc_id, count(*) AS n_shingles FROM c GROUP BY doc_id)
        |SELECT s.doc_id, n_shingles, coalesce(n_matched, 0) AS n_matched,
        | CAST(coalesce(n_matched, 0) AS DOUBLE) / n_shingles AS contamination,
        | (CAST(coalesce(n_matched, 0) AS DOUBLE) / n_shingles) >= 0.5 AS is_contaminated
        |FROM s LEFT JOIN m ON s.doc_id = m.doc_id ORDER BY s.doc_id""".stripMargin)),

    // ---- N-gram-collision decontamination (round 13): the GPT-3/Llama
    //      rule — ONE shared 13-gram with the benchmark set flags the
    //      document. To give the gate real collisions, every 10th document
    //      plays the eval set (so exact-duplicate documents land on both
    //      sides at sf scale); the short-doc whole-text-shingle collapse is
    //      mirrored in shinglesSqlK(13).
    "q_decontaminate_ngram" -> Q(
      (s, d) => {
        import graft.operators.Decontaminate
        val docs = Tables.documents(s, d)
        Decontaminate.ngramCollisions(
            docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
            docs.filter(pmod(col("doc_id"), lit(10)) === 0),
            "doc_id", "text", shingleK = 13)
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |c0 AS (SELECT doc_id, unnest(${shinglesSqlK(13)}) AS tok FROM t
        |  WHERE doc_id % 10 != 0),
        |c AS (SELECT doc_id, $TokenFp60Sql AS fp FROM c0),
        |b0 AS (SELECT doc_id, unnest(${shinglesSqlK(13)}) AS tok FROM t
        |  WHERE doc_id % 10 = 0),
        |b AS (SELECT DISTINCT $TokenFp60Sql AS fp FROM b0),
        |m AS (SELECT doc_id, count(*) AS n_matched FROM c
        |  WHERE fp IN (SELECT fp FROM b) GROUP BY doc_id),
        |s AS (SELECT doc_id, count(*) AS n_shingles FROM c GROUP BY doc_id)
        |SELECT s.doc_id, n_shingles,
        | coalesce(n_matched, 0) AS n_collisions,
        | coalesce(n_matched, 0) >= 1 AS is_contaminated
        |FROM s LEFT JOIN m ON s.doc_id = m.doc_id ORDER BY s.doc_id""".stripMargin)),

    // ---- PII redaction (scan-stage regex rewrite): the synthetic documents
    //      carry no PII, so the gate INJECTS a deterministic email + IP +
    //      phone per doc, redacts, and emits per-kind hit counts plus an md5
    //      of the redacted text — both engines mirror the same RE2-safe
    //      patterns (graft.functions.Redact is the pattern source of truth).
    "q_text_redact" -> Q(
      (s, d) => {
        import graft.functions.Redact
        val seeded = docsP(s, d).select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com or +62 812 3"),
            col("doc_id"), lit(" at 10.0.0."), pmod(col("doc_id"), lit(256)),
            lit(" now")).as("text"))
        val (ne, ni, np) = Redact.piiCounts(col("text"))
        seeded.select(col("doc_id"),
            ne.cast("bigint").as("n_email"), ni.cast("bigint").as("n_ip"),
            np.cast("bigint").as("n_phone"),
            md5(Redact.redactPii(col("text"))).as("redacted_md5"))
          .orderBy("doc_id")
      },
      Some {
        import graft.functions.Redact
        s"""WITH seeded AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@example.com or +62 812 3' ||
        |  doc_id || ' at 10.0.0.' || (doc_id % 256) || ' now' AS text
        |  FROM documents),
        |st AS (SELECT doc_id, text,
        |  regexp_replace(text, '${Redact.EmailPattern}', '[EMAIL]', 'g') AS after_email
        |  FROM seeded),
        |st2 AS (SELECT doc_id, text, after_email,
        |  regexp_replace(after_email, '${Redact.Ipv4Pattern}', '[IP]', 'g') AS after_ip
        |  FROM st)
        |SELECT doc_id,
        | len(regexp_extract_all(text, '${Redact.EmailPattern}')) AS n_email,
        | len(regexp_extract_all(after_email, '${Redact.Ipv4Pattern}')) AS n_ip,
        | len(regexp_extract_all(after_ip, '${Redact.PhonePattern}')) AS n_phone,
        | md5(regexp_replace(after_ip, '${Redact.PhonePattern}', '[PHONE]', 'g')) AS redacted_md5
        |FROM st2 ORDER BY doc_id""".stripMargin
      }),

    // ---- Deterministic hash-split: stable stratified train/valid/test
    //      assignment (membership is a pure function of doc_id + salt — the
    //      reproducible alternative to seeded Bernoulli sampling, which no
    //      two engines agree on). Counts + id ranges per (source, split).
    // deterministic training-order shuffle: the corpus re-ordered by a
    // salted hash of the stable id — reproducible across engines and runs,
    // resaltable per epoch. The result order IS the contract, so the gate
    // has no trailing ORDER BY of its own: both engines emit the same total
    // (hash, id) order.
    "q_sample_shuffle" -> Q(
      (s, d) => graft.operators.Sampling.shuffleByHash(
        Tables.documents(s, d).select(col("doc_id")), col("doc_id"), salt = ":ep0"),
      Some(s"""SELECT doc_id FROM documents
        |ORDER BY ${fp60Sql("(CAST(doc_id AS VARCHAR) || ':ep0')")}, doc_id""".stripMargin)),

    "q_sample_hash_split" -> Q(
      (s, d) => Tables.documents(s, d)
        .withColumn("split",
          graft.operators.Sampling.split(col("doc_id"), 80, 10, salt = ":v1"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("source", "split"),
      Some(s"""WITH k AS (SELECT doc_id, source,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR) || ':v1'")} % 100 AS b
        | FROM documents),
        |sp AS (SELECT doc_id, source,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
        | FROM k)
        |SELECT source, split, count(*) AS n,
        | min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Stratified deterministic sampling: per-source keep rates (the
    //      domain-mixture knob: 100% of src0, 40% of src1, 10% default).
    "q_sample_stratified" -> Q(
      (s, d) => graft.operators.Sampling.stratifiedSampleByHash(
          Tables.documents(s, d), col("doc_id"), col("source"),
          rates = Map("src0" -> 100, "src1" -> 40), defaultPct = 10,
          salt = ":mix1")
        .groupBy("source")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"))
        .orderBy("source"),
      Some(s"""WITH k AS (SELECT doc_id, source,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR) || ':mix1'")} % 100 AS b
        | FROM documents)
        |SELECT source, count(*) AS n, min(doc_id) AS min_id
        |FROM k
        |WHERE b < (CASE WHEN source = 'src0' THEN 100
        |  WHEN source = 'src1' THEN 40 ELSE 10 END)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Deterministic per-key bottom-k sample (round 13): exactly 5
    //      docs per source, the smallest salted hashes winning — the
    //      "sample N per domain" primitive rate-based sampling cannot
    //      express. The oracle ranks with ONE per-key window; the operator
    //      runs the two-phase shard-bounded form, whose final set is
    //      identical (bottom-k is subset-monotone).
    "q_sample_bottom_k" -> Q(
      (s, d) => graft.operators.Sampling.bottomKPerKey(
          docsP(s, d).select(col("doc_id"), col("source")),
          col("source"), col("doc_id"), k = 5, salt = ":bk1")
        .select(col("doc_id"), col("source"),
          col("sample_rank").cast("bigint").as("sample_rank"))
        .orderBy("doc_id"),
      Some(s"""WITH r AS (SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY ${fp60Sql("CAST(doc_id AS VARCHAR) || ':bk1'")}, doc_id)
        |    AS sample_rank
        |  FROM documents)
        |SELECT doc_id, source, sample_rank FROM r
        |WHERE sample_rank <= 5 ORDER BY doc_id""".stripMargin)),

    // ---- WEIGHTED sample without replacement (Efraimidis-Spirakis): per
    //      source, keep the 5 smallest exponential keys -ln(u)/w with
    //      u = (fp60(doc_id ++ salt) + 1) / 2^60 and w = document length —
    //      the quality/length-proportional version of the bottom-k gate.
    //      The key is round(..., 9)-pinned like every cross-engine ln; the
    //      oracle replays the identical arithmetic.
    "q_sample_weighted_wor" -> Q(
      (s, d) => graft.operators.Sampling.weightedBottomKPerKey(
          docsP(s, d).select(col("doc_id"), col("source"),
            length(col("text")).cast("double").as("w")),
          col("source"), col("doc_id"), col("w"), k = 5, salt = ":ww1")
        .select(col("doc_id"), col("source"),
          col("sample_rank").cast("bigint").as("sample_rank"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, source,
        |  CAST(length(text) AS DOUBLE) AS w FROM documents),
        |r AS (SELECT doc_id, source, w,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR) || ':ww1'")} AS h FROM t),
        |k AS (SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY source ORDER BY
        |    CASE WHEN w > 0 THEN round(
        |      -ln((CAST(h AS DOUBLE) + CAST(1 AS DOUBLE))
        |          / CAST(1152921504606846976 AS DOUBLE)) / w, 9)
        |     ELSE CAST('Infinity' AS DOUBLE) END, h, doc_id) AS sample_rank
        |  FROM r)
        |SELECT doc_id, source, sample_rank FROM k
        |WHERE sample_rank <= 5 ORDER BY doc_id""".stripMargin)),

    // ---- RECENCY-weighted sampling: the time-decay curation policy (keep
    //      fresh data with higher probability, exponential half-life) as
    //      weighted WOR with w = exp(-age_days/30) against the corpus max
    //      timestamp. Ages are integer epoch-seconds (floored per row
    //      BEFORE the max, so both engines aggregate identical longs);
    //      the ES key carries the repo's round9 ln contract.
    "q_sample_recency_wor" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("event_type"),
            // ntz -> timestamp is a UTC reinterpretation under the session's
            // UTC zone, then epoch seconds — matching DuckDB's epoch(ts)
            col("ts").cast("timestamp").cast("long").as("ts_s"))
        val ref = ev.agg(max("ts_s").as("ref_s"))
        val weighted = ev.crossJoin(broadcast(ref))
          .withColumn("w",
            exp(-((col("ref_s") - col("ts_s")).cast("double") / 86400.0 / 30.0)))
        graft.operators.Sampling.weightedBottomKPerKey(weighted,
            col("event_type"), col("event_id"), col("w"), k = 20, salt = ":rw1")
          .select(col("event_id"), col("event_type"),
            col("sample_rank").cast("bigint").as("sample_rank"))
          .orderBy("event_id")
      },
      Some(s"""WITH ev AS (SELECT event_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |m AS (SELECT max(ts_s) AS ref_s FROM ev),
        |t AS (SELECT event_id, event_type,
        |  exp(-(CAST(ref_s - ts_s AS DOUBLE) / CAST(86400 AS DOUBLE)
        |        / CAST(30 AS DOUBLE))) AS w
        |  FROM ev, m),
        |r AS (SELECT event_id, event_type, w,
        |  ${fp60Sql("CAST(event_id AS VARCHAR) || ':rw1'")} AS h FROM t),
        |k AS (SELECT event_id, event_type,
        |  row_number() OVER (PARTITION BY event_type ORDER BY
        |    CASE WHEN w > 0 THEN round(
        |      -ln((CAST(h AS DOUBLE) + CAST(1 AS DOUBLE))
        |          / CAST(1152921504606846976 AS DOUBLE)) / w, 9)
        |     ELSE CAST('Infinity' AS DOUBLE) END, h, event_id) AS sample_rank
        |  FROM r)
        |SELECT event_id, event_type, sample_rank FROM k
        |WHERE sample_rank <= 20 ORDER BY event_id""".stripMargin)),

    // ---- Context-window chunking: each document split into 64-token
    //      windows overlapping by 16 (step 48) — the stage between cleaning
    //      and sequence packing. Scan-stage only: tokenize, integer-exact
    //      chunk count, explode, slice; zero shuffles.
    "q_text_chunk" -> Q(
      (s, d) => graft.operators.Chunking.chunkByTokens(
          Tables.documents(s, d), "doc_id", "text",
          chunkTokens = 64, overlapTokens = 16)
        .orderBy("doc_id", "chunk_id"),
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |p AS (SELECT doc_id, toks,
        |  CASE WHEN len(toks) <= 64 THEN 1
        |   ELSE (len(toks) - 64 + 47) // 48 + 1 END AS n_chunks FROM t),
        |c AS (SELECT doc_id, toks,
        |  unnest(generate_series(0, n_chunks - 1)) AS chunk_id FROM p)
        |SELECT doc_id, chunk_id,
        | array_to_string(toks[chunk_id*48+1 : chunk_id*48+64], ' ') AS chunk_text,
        | len(toks[chunk_id*48+1 : chunk_id*48+64]) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    // ---- Duplicate-line removal (C4-style cleaning, the REWRITE the
    //      dup-line signal motivates): the gate seeds a guaranteed duplicate
    //      block (text twice + a tail), then compares before/after line
    //      counts and the md5 of the cleaned text. Scan-stage fold, zero
    //      shuffles.
    "q_text_dedup_lines" -> Q(
      (s, d) => {
        val seeded = docsP(s, d).select(col("doc_id"),
          concat_ws("\n", col("text"), col("text"), lit("tail")).as("text"))
        seeded.select(col("doc_id"),
            size(split(col("text"), "\n")).cast("bigint").as("n_lines"),
            size(array_distinct(split(col("text"), "\n"))).cast("bigint").as("n_unique"),
            md5(TextFunctions.dedupLines(col("text"))).as("clean_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH seeded AS (SELECT doc_id,
        |  text || chr(10) || text || chr(10) || 'tail' AS text FROM documents),
        |l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM seeded)
        |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
        | CAST(len(list_distinct(lines)) AS BIGINT) AS n_unique,
        | md5(array_to_string(
        |   list_filter(lines, (x, i) -> list_position(lines, x) = i),
        |   chr(10))) AS clean_md5
        |FROM l ORDER BY doc_id""".stripMargin)),

    // ---- capstone: chunk -> pack, the two stages composed the way a
    //      sequence writer runs them — documents become overlapping
    //      64-token windows, the windows pack into 256-token bins. The
    //      chunk stage is scan-stage; packing adds the one shard-window
    //      shuffle. Chunk identity is the composite doc:chunk key.
    // ---- WITHIN-document repeated spans (C4's repeated-span rule at token
    //      granularity; the span-shaped big sibling of dedup_lines). The
    //      gate seeds a guaranteed repeat — each doc's first 10 tokens
    //      appended to its end — on top of the corpus's natural repeats,
    //      then marks and cuts the echoes (first occurrences stay).
    "q_text_spans_within" -> Q(
      (s, d) => {
        val seeded = docsP(s, d).select(col("doc_id"),
          concat_ws(" ", col("text"),
            array_join(slice(TextFunctions.tokens(col("text")), 1, 10), " ")).as("text"))
        Dedup.repeatedSpansWithinDoc(seeded, "doc_id", "text", k = 3)
          .orderBy("doc_id", "span_start")
      },
      Some("WITH " + SeededTailSql + ",\n" + spanWithinCteChain(3, "sd") +
        "\n" + SpanSelectTail)),

    "q_text_spans_within_cut" -> Q(
      (s, d) => {
        val seeded = docsP(s, d).select(col("doc_id"),
          concat_ws(" ", col("text"),
            array_join(slice(TextFunctions.tokens(col("text")), 1, 10), " ")).as("text"))
        Dedup.cutSpans(seeded, "doc_id", "text",
            Dedup.repeatedSpansWithinDoc(seeded, "doc_id", "text", k = 3))
          .select(col("doc_id"), col("n_tokens"), col("n_removed"),
            md5(col("text")).as("clean_md5"))
          .orderBy("doc_id")
      },
      Some("WITH " + SeededTailSql + ",\n" + spanWithinCteChain(3, "sd") +
        ",\n" + spanCutTail(""))),

    "q_pipeline_chunk_pack" -> Q(
      (s, d) => {
        import graft.operators.{Chunking, Packing}
        val chunks = Chunking.chunkByTokens(
            Tables.documents(s, d), "doc_id", "text",
            chunkTokens = 64, overlapTokens = 16)
          .select(concat_ws(":", col("doc_id"), col("chunk_id")).as("chunk_key"),
            col("n_tokens"))
        Packing.packBins(chunks, "chunk_key", col("n_tokens"),
            budgetTokens = 256L, shards = 8)
          .select(col("chunk_key"), col("n_tokens"), col("shard"),
            col("tokens_before"), col("bin"))
          .orderBy("chunk_key")
      },
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |p AS (SELECT doc_id, toks, CASE WHEN len(toks) <= 64 THEN 1
        |   ELSE (len(toks) - 64 + 47) // 48 + 1 END AS n_chunks FROM t),
        |c AS (SELECT doc_id, toks,
        |  unnest(generate_series(0, n_chunks - 1)) AS chunk_id FROM p),
        |ch AS (SELECT CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_id AS VARCHAR) AS chunk_key,
        |  len(toks[chunk_id*48+1 : chunk_id*48+64]) AS n_tokens FROM c),
        |sh AS (SELECT chunk_key, n_tokens, ${fp60Sql("chunk_key")} % 8 AS shard FROM ch),
        |pk AS (SELECT chunk_key, n_tokens, shard,
        |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY chunk_key
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |  FROM sh)
        |SELECT chunk_key, n_tokens, shard, tokens_before,
        | CAST(floor(tokens_before / 256.0) AS BIGINT) AS bin
        |FROM pk ORDER BY chunk_key""".stripMargin)),

    // ---- TextRank corpus keywords: PageRank over the token co-occurrence
    //      graph (stopword/short-token filter, adjacent pairs of the
    //      FILTERED sequence, both directions). Edge generation is
    //      scan-stage; the iterations run on the vocabulary-sized graph.
    //      Oracle reuses the shared unrolled pageRankCtes chain (fold
    //      mode), so the TextRank mirror cannot drift from the link-graph
    //      mirrors.
    "q_text_textrank" -> Q(
      (s, d) => graft.operators.TermWeights.textRankKeywords(
        docsP(s, d), "text", k = 30, iters = 2, orderIndependent = false),
      Some(s"""WITH tk AS (SELECT list_filter($ToksSql,
        |  t -> length(t) >= 3 AND t NOT IN ($StopListSql)) AS kt
        |  FROM documents),
        |p0 AS (SELECT unnest(kt[1:len(kt)-1]) AS src,
        |  unnest(kt[2:len(kt)]) AS dst FROM tk),
        |p1 AS (SELECT src, dst FROM p0 WHERE src <> dst),
        |e0 AS (SELECT src, dst FROM p1 UNION ALL SELECT dst, src FROM p1),
        |w AS (SELECT src, dst, count(*) AS weight FROM e0 GROUP BY 1, 2),
        |${pageRankCtes(2)}
        |SELECT node AS token, rank FROM r2
        |ORDER BY rank DESC, token LIMIT 30""".stripMargin)),

    // ---- TF-IDF top-k terms per document: tf partial-aggregates into one
    //      (doc, term) shuffle; df is a window over the term key (never a
    //      broadcast of the corpus-scaled term table); idf is the LINEAR
    //      ratio n_docs/df — same per-doc ranking as log idf (monotone),
    //      exactly reproducible across engines (see TermWeights).
    "q_text_tfidf_topk" -> Q(
      (s, d) => graft.operators.TermWeights.tfIdfTopK(
          Tables.documents(s, d), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank"),
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM e GROUP BY 1, 2),
        |wdf AS (SELECT doc_id, tok, tf,
        |  count(*) OVER (PARTITION BY tok) AS df FROM tf),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, tok, tf, df,
        |  CAST(tf AS DOUBLE) * n_docs / df AS tf_idf FROM wdf, n),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |   ORDER BY tf_idf DESC, tok) AS INTEGER) AS rank FROM sc)
        |SELECT doc_id, tok, tf, df, tf_idf, rank
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // ---- Vocabulary induction: corpus-wide top-50 word bigrams by
    //      occurrence count (partial-agg groupBy + TakeOrderedAndProject —
    //      PlanSpec pins that the global top-k never sorts the vocabulary).
    "q_text_ngram_topk" -> Q(
      (s, d) => graft.operators.TermWeights.ngramTopK(
        Tables.documents(s, d), "text", n = 2, k = 50),
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |g AS (SELECT unnest(${spanShinglesSql(2)}) AS ngram FROM t)
        |SELECT ngram, count(*) AS n_occurrences FROM g
        |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 50""".stripMargin)),

    // ---- Okapi BM25 retrieval: top-10 corpus docs per benchmark query —
    //      the retrieval-based data-selection / decontamination primitive.
    //      Corpus-side stats reuse the tf-idf partial-agg shape; the bounded
    //      query-term table is the only broadcast; the per-query top-k is
    //      the two-phase exact rank (no corpus-sized window partition).
    //      Term contributions are rounded to 9 decimals and summed as
    //      decimal(28,9) so the score is partition-order-independent and
    //      hash-stable (ln is the only transcendental; see q_text_perplexity).
    "q_text_bm25_topk" -> Q(
      (s, d) => {
        import s.implicits._
        val queries = Seq(
          (1L, "spark window agg"),
          (2L, "hash join merge table"),
          (3L, "vector scan stream")).toDF("query_id", "qtext")
        graft.operators.TermWeights.bm25TopK(
            Tables.documents(s, d), "doc_id", "text",
            queries, "query_id", "qtext", k = 10)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM e GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        |st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
        |  CAST((SELECT COALESCE(sum(tf), 0) FROM tf) AS DOUBLE)
        |    / (SELECT count(*) FROM documents) AS avgdl),
        |q AS (SELECT CAST(1 AS BIGINT) AS query_id, 'spark window agg' AS qtext
        |  UNION ALL SELECT 2, 'hash join merge table'
        |  UNION ALL SELECT 3, 'vector scan stream'),
        |qt AS (SELECT DISTINCT query_id, unnest(list_filter(
        |  string_split_regex(lower(qtext), '\\s+'), x -> len(x) > 0)) AS tok FROM q),
        |m AS (SELECT qt.query_id, tf.doc_id, CAST(round(
        |    ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
        |    * ((CAST(tf AS DOUBLE) * ${1.2 + 1.0}) / (CAST(tf AS DOUBLE)
        |       + ${1.2} * (${1.0 - 0.75} + ${0.75} * (CAST(dl AS DOUBLE) / avgdl)))),
        |    9) AS DECIMAL(28,9)) AS contrib
        |  FROM tf JOIN qt ON qt.tok = tf.tok JOIN df ON df.tok = tf.tok
        |    JOIN dl ON dl.doc_id = tf.doc_id, st),
        |sc AS (SELECT query_id, doc_id, count(*) AS n_terms,
        |  CAST(sum(contrib) AS DECIMAL(28,9)) AS score_d FROM m GROUP BY 1, 2),
        |r AS (SELECT query_id, doc_id, n_terms, score_d,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY score_d DESC, doc_id) AS INTEGER) AS rank FROM sc)
        |SELECT query_id, doc_id, n_terms,
        |  CAST(round(score_d, 6) AS DOUBLE) AS score, rank
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // ---- CCNet-style LM quality scoring: a stupid-backoff bigram model
    //      trained on the :lm1 80% hash split ranks every document by
    //      average log-probability / perplexity. Per-token log-probs are
    //      rounded to 9 decimals and summed as DECIMAL(28,9), so the
    //      per-doc sum is partition-order-independent and the oracle
    //      hash-matches bit-for-bit (ln/exp agree across engines on these
    //      rational inputs; a raw double sum would not be order-stable).
    "q_text_perplexity" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val ref = docs.filter(graft.operators.Sampling.split(
          col("doc_id"), 80, 10, salt = ":lm1") === "train")
        graft.operators.LanguageModel.perplexityAgainst(
            docs, ref, "doc_id", "text", vocabCap = 256, bigramCap = 2048)
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |${pplCtes(vocabCap = 256, bigramCap = 2048, salt = ":lm1")}
        |SELECT doc_id, count(*) AS n_scored,
        |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logp,
        |  round(exp(-(CAST(sum(lp) AS DOUBLE) / count(*))), 4) AS ppl
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // ---- TRIGRAM perplexity (round 13): one order up from the bigram
    //      model — the production CCNet filter is a 5-gram KenLM, and each
    //      added order sharpens the fluency signal. Scoring backs off
    //      trigram -> bigram chain -> 0.16 x smoothed unigram; the caps
    //      play the role count>0 plays in uncapped stupid backoff. Same
    //      decimal-sum bit-parity contract as the bigram gate.
    "q_text_perplexity_trigram" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val ref = docs.filter(graft.operators.Sampling.split(
          col("doc_id"), 80, 10, salt = ":lm1") === "train")
        graft.operators.LanguageModel.perplexityTrigramAgainst(
            docs, ref, "doc_id", "text",
            vocabCap = 256, bigramCap = 2048, trigramCap = 4096)
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |${ppl3Ctes(vocabCap = 256, bigramCap = 2048, trigramCap = 4096, salt = ":lm1")}
        |SELECT doc_id, count(*) AS n_scored,
        |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logp,
        |  round(exp(-(CAST(sum(lp) AS DOUBLE) / count(*))), 4) AS ppl
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // ---- Interpolated Kneser-Ney perplexity (round 14): the canonical
    //      n-gram smoothing beside the stupid-backoff gates — unseen
    //      contexts score by CONTINUATION frequency (how many contexts a
    //      word completes), not raw frequency. Context/continuation stats
    //      derive from the capped pair table (pruned-KN convention);
    //      D = 0.75 exact in binary; add-one continuation smoothing keeps
    //      ln defined; same round-9 decimal-sum bit-parity contract.
    "q_text_perplexity_kn" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val ref = docs.filter(graft.operators.Sampling.split(
          col("doc_id"), 80, 10, salt = ":lm1") === "train")
        val lm = graft.operators.LanguageModel.trainKneserNey(
          ref, "doc_id", "text", vocabCap = 256, bigramCap = 2048)
        graft.operators.LanguageModel
          .perplexityKneserNey(docs, "doc_id", "text", lm)
          .orderBy("doc_id")
      },
      Some {
        val pcSql = """((CAST(COALESCE(cn.n1w, 0) AS DOUBLE) + 1.0)
          |    / CAST((SELECT t FROM ktk) + (SELECT u FROM vs) + 1 AS DOUBLE))""".stripMargin
        s"""WITH tk AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |${pplCtes(vocabCap = 256, bigramCap = 2048, salt = ":lm1")},
        |ctxk AS (SELECT prev, sum(cb) AS cv, count(*) AS n1v FROM big GROUP BY 1),
        |contk AS (SELECT w, count(*) AS n1w FROM big GROUP BY 1),
        |ktk AS (SELECT count(*) AS t FROM big),
        |sck AS (SELECT es.doc_id,
        |  CAST(round(ln(CASE
        |    WHEN es.prev IS NULL OR cx.cv IS NULL THEN $pcSql
        |    ELSE greatest(CAST(COALESCE(b.cb, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE),
        |        CAST(0 AS DOUBLE)) / CAST(cx.cv AS DOUBLE)
        |      + ((CAST(0.75 AS DOUBLE) * CAST(cx.n1v AS DOUBLE))
        |        / CAST(cx.cv AS DOUBLE)) * $pcSql
        |  END), 9) AS DECIMAL(28,9)) AS lp
        |  FROM es LEFT JOIN big b ON b.prev = es.prev AND b.w = es.w
        |  LEFT JOIN ctxk cx ON cx.prev = es.prev
        |  LEFT JOIN contk cn ON cn.w = es.w)
        |SELECT doc_id, count(*) AS n_scored,
        |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logp,
        |  round(exp(-(CAST(sum(lp) AS DOUBLE) / count(*))), 4) AS ppl
        |FROM sck GROUP BY 1 ORDER BY doc_id""".stripMargin
      }),

    // ---- CCNet head/middle/tail routing (round 17): the published CCNet
    //      pipeline's signature stage — per-SOURCE perplexity terciles
    //      route every document into head (most fluent third), middle, or
    //      tail. Composes two gated folds: the bigram LM perplexity
    //      (q_text_perplexity's exact pipeline) and the sharded exact
    //      quantiles (q_text_length_quantiles_by's), joined by a
    //      source-bounded broadcast. The tercile cut runs on ppl in
    //      FIXED-POINT 1e-4 units (ppl is already rounded to 4 decimals,
    //      so round(ppl*10000) is lossless) because the exact-quantile
    //      fold is integer-keyed by design — double keys would hash the
    //      count fold on approximate values.
    "q_text_ccnet_buckets" -> Q(
      (s, d) => {
        import graft.operators.{Diagnostics, LanguageModel, Sampling}
        val docs = Tables.documents(s, d)
        val ref = docs.filter(Sampling.split(
          col("doc_id"), 80, 10, salt = ":lm1") === "train")
        val ppl = LanguageModel.perplexityAgainst(
            docs, ref, "doc_id", "text", vocabCap = 256, bigramCap = 2048)
          .join(docs.select("doc_id", "source"), Seq("doc_id"))
          .withColumn("pplq", round(col("ppl") * 10000, 0).cast("long"))
          .gatePersist()
        ppl.count() // two consumers: the quantile fold and the routing
        val th = Diagnostics.exactQuantilesBy(
            ppl.select(col("source"), col("pplq")), "source", col("pplq"),
            qs = Seq(1.0 / 3, 2.0 / 3))
          .groupBy("source")
          .agg(min(when(col("q") === 1.0 / 3, col("value"))).as("t1"),
            min(when(col("q") === 2.0 / 3, col("value"))).as("t2"))
        ppl.join(broadcast(th), Seq("source"))
          .select(col("doc_id"), col("source"), col("ppl"),
            when(col("pplq") <= col("t1"), "head")
              .when(col("pplq") <= col("t2"), "middle")
              .otherwise("tail").as("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |${pplCtes(vocabCap = 256, bigramCap = 2048, salt = ":lm1")},
        |pd AS (SELECT doc_id,
        |    round(exp(-(CAST(sum(lp) AS DOUBLE) / count(*))), 4) AS ppl
        |  FROM sc GROUP BY 1),
        |ps AS (SELECT pd.doc_id, d.source, pd.ppl,
        |    CAST(round(pd.ppl * 10000, 0) AS BIGINT) AS v
        |  FROM pd JOIN documents d USING (doc_id)),
        |c AS (SELECT source, v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM ps GROUP BY 1, 2),
        |w AS (SELECT source, v, CAST(sum(cnt) OVER (PARTITION BY source
        |    ORDER BY v) AS BIGINT) AS cum FROM c),
        |nn AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n
        |  FROM c GROUP BY 1),
        |qq(q) AS (VALUES (CAST(1.0 AS DOUBLE)/CAST(3.0 AS DOUBLE)),
        |  (CAST(2.0 AS DOUBLE)/CAST(3.0 AS DOUBLE))),
        |tg AS (SELECT source, q, CAST(ceil(q * n) AS BIGINT)
        |    AS rank_target FROM qq CROSS JOIN nn),
        |qv AS (SELECT tg.source, tg.q, min(w.v) AS value FROM tg
        |  JOIN w ON w.source = tg.source AND w.cum >= tg.rank_target
        |  GROUP BY 1, 2),
        |th AS (SELECT source,
        |  min(CASE WHEN q = CAST(1.0 AS DOUBLE)/CAST(3.0 AS DOUBLE)
        |    THEN value END) AS t1,
        |  min(CASE WHEN q = CAST(2.0 AS DOUBLE)/CAST(3.0 AS DOUBLE)
        |    THEN value END) AS t2
        | FROM qv GROUP BY 1)
        |SELECT ps.doc_id, ps.source, ps.ppl,
        | CASE WHEN ps.v <= th.t1 THEN 'head'
        |      WHEN ps.v <= th.t2 THEN 'middle'
        |      ELSE 'tail' END AS bucket
        |FROM ps JOIN th USING (source) ORDER BY doc_id""".stripMargin)),

    // ---- DSIR importance resampling: hashed-unigram likelihood-ratio
    //      weights toward the src0/src1 target domain, Gumbel top-k
    //      selection derandomized through the doc-id hash. Per-token
    //      log-ratios are rounded once in the 4096-bucket model and summed
    //      as DECIMAL(28,9) — partition-order-independent, bit-mirrorable.
    "q_sample_dsir" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Importance.resampleTopK(
          docs, docs.filter(col("source").isin("src0", "src1")),
          "doc_id", "text", k = 100, buckets = 4096)
      },
      Some(s"""WITH tk AS (SELECT doc_id, source, $ToksSql AS toks FROM documents),
        |te AS (SELECT ${fp60Sql("tok || ':ds1'")} % 4096 AS b FROM
        |  (SELECT unnest(toks) AS tok FROM tk WHERE source IN ('src0', 'src1'))),
        |bt AS (SELECT b, count(*) AS ct FROM te GROUP BY 1),
        |re0 AS (SELECT doc_id, ${fp60Sql("tok || ':ds1'")} % 4096 AS b FROM
        |  (SELECT doc_id, unnest(toks) AS tok FROM tk)),
        |br AS (SELECT b, count(*) AS cr FROM re0 GROUP BY 1),
        |nt AS (SELECT COALESCE(sum(ct), 0) AS n FROM bt),
        |nr AS (SELECT COALESCE(sum(cr), 0) AS n FROM br),
        |m AS (SELECT br.b, CAST(round(ln(
        |    ((CAST(COALESCE(bt.ct, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |      / CAST((SELECT n FROM nt) + 4096 AS DOUBLE))
        |    / ((CAST(COALESCE(br.cr, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |      / CAST((SELECT n FROM nr) + 4096 AS DOUBLE))), 9)
        |  AS DECIMAL(28,9)) AS lr
        |  FROM br LEFT JOIN bt ON bt.b = br.b),
        |w AS (SELECT doc_id, count(*) AS n_tokens, sum(lr) AS slw
        |  FROM re0 JOIN m ON m.b = re0.b GROUP BY 1)
        |SELECT doc_id, n_tokens, round(CAST(slw AS DOUBLE), 6) AS logw,
        |  round(CAST(slw AS DOUBLE) + -ln(-ln(
        |    (CAST(${fp60Sql("CAST(doc_id AS VARCHAR) || ':dsg1'")} AS DOUBLE)
        |      + CAST(0.5 AS DOUBLE)) / CAST(1152921504606846976 AS DOUBLE))), 6)
        |  AS score
        |FROM w ORDER BY score DESC, doc_id LIMIT 100""".stripMargin)),

    // Trained NB quality filter, weak-supervision style: the heuristic
    // quality score labels the training split, the smoothed hashed-unigram
    // model scores every document (token-less docs get the prior verdict).
    "q_text_nb_quality" -> Q(
      (s, d) => {
        // fold path (r19 perf): the per-token train/score pair tokenized the
        // corpus three times (pos-train, neg-train, score) and re-evaluated
        // the fat qualityScore tree in every train-once action; ONE persisted
        // tokenFold + persisted labels pay each exactly once. Bit-identical
        // by the trainFold/scoreFold linearity contract (oracle unchanged).
        import graft.operators.QualityClassifier
        val docs = Tables.documents(s, d)
        // fanOut: the label projection evaluates the fat qualityScore tree;
        // a single-split local scan would otherwise run it on ONE task
        val labels = Parallelism.fanOut(docs).select(col("doc_id"),
            (graft.functions.TextFunctions.qualityScore(col("text")) >= 0.6)
              .as("is_pos"))
          .gatePersist()
        val fold = QualityClassifier.tokenFold(docs, "doc_id", "text",
            buckets = 4096, salt = ":nb1")
          .gatePersist()
        fold.count()
        val m = QualityClassifier.trainFold(fold, labels,
          buckets = 4096, salt = ":nb1")
        QualityClassifier.scoreFold(docs, "doc_id", fold, m).orderBy("doc_id")
      },
      Some(s"""WITH ${qualityLangCtes("documents")},
        |e AS (SELECT s.doc_id, s.quality,
        |    ${fp60Sql("tok || ':nb1'")} % 4096 AS b
        |  FROM (SELECT doc_id, quality FROM scored) s JOIN
        |    (SELECT doc_id, unnest(toks) AS tok FROM t0) u USING (doc_id)),
        |bp AS (SELECT b, count(*) AS cp FROM e WHERE quality >= 0.6 GROUP BY 1),
        |bn AS (SELECT b, count(*) AS cn FROM e WHERE quality < 0.6 GROUP BY 1),
        |np AS (SELECT COALESCE(sum(cp), 0) AS n FROM bp),
        |nn AS (SELECT COALESCE(sum(cn), 0) AS n FROM bn),
        |m AS (SELECT COALESCE(bp.b, bn.b) AS b, CAST(round(ln(
        |    ((CAST(COALESCE(cp, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |      / CAST((SELECT n FROM np) + 4096 AS DOUBLE))
        |    / ((CAST(COALESCE(cn, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |      / CAST((SELECT n FROM nn) + 4096 AS DOUBLE))), 9)
        |  AS DECIMAL(28,9)) AS llr
        |  FROM bp FULL JOIN bn ON bp.b = bn.b),
        |dflt AS (SELECT CAST(round(ln(
        |    CAST((SELECT n FROM nn) + 4096 AS DOUBLE)
        |    / CAST((SELECT n FROM np) + 4096 AS DOUBLE)), 9)
        |  AS DECIMAL(28,9)) AS v),
        |pri AS (SELECT CAST(round(ln(
        |    CAST((SELECT count(*) FROM scored WHERE quality >= 0.6) + 1 AS DOUBLE)
        |    / CAST((SELECT count(*) FROM scored WHERE quality < 0.6) + 1 AS DOUBLE)), 9)
        |  AS DECIMAL(28,9)) AS v),
        |pd AS (SELECT doc_id, count(*) AS n_tokens,
        |    sum(COALESCE(m.llr, (SELECT v FROM dflt))) AS sllr
        |  FROM e LEFT JOIN m ON m.b = e.b GROUP BY 1),
        |sc AS (SELECT d.doc_id, COALESCE(pd.n_tokens, 0) AS n_tokens,
        |    CAST(round(COALESCE(pd.sllr, 0) + (SELECT v FROM pri), 6)
        |      AS DOUBLE) AS log_odds
        |  FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id)
        |SELECT doc_id, n_tokens, log_odds, log_odds > 0 AS keep
        |FROM sc ORDER BY doc_id""".stripMargin)),

    // ---- NB classifier CALIBRATION report (reliability curve): per-token
    //      log-odds (the length-normalized score — raw doc log-odds
    //      saturate any sigmoid), equal-mass decile bins from EXACT
    //      percentile thresholds (one agg, broadcast back, scan-stage
    //      binning — the thresholdBySource shape, never a global ntile
    //      window), each bin's mean sigmoid probability vs pseudo-label
    //      rate — the "is 0.8 really 80%?" check a learned quality filter
    //      needs before its threshold means anything. The EXACT percentile
    //      buffers a value sketch on the merge side; at true corpus scale
    //      swap in percentile_approx exactly as rankNormalizeBySource's
    //      `approx` flag does (bin boundaries only need monotonicity —
    //      the gate keeps the exact form for the bit-exact oracle).
    "q_text_nb_calibration" -> Q(
      (s, d) => {
        // fold path (r19 perf) — see q_text_nb_quality. The scored frame
        // additionally roots TWO consumers (the percentile agg and the
        // binned report), so its narrow projection is persisted too.
        import graft.operators.QualityClassifier
        val docs = Tables.documents(s, d)
        // fanOut: the label projection evaluates the fat qualityScore tree;
        // a single-split local scan would otherwise run it on ONE task
        val labels = Parallelism.fanOut(docs).select(col("doc_id"),
            (graft.functions.TextFunctions.qualityScore(col("text")) >= 0.6)
              .as("is_pos"))
          .gatePersist()
        val fold = QualityClassifier.tokenFold(docs, "doc_id", "text",
            buckets = 4096, salt = ":nb1")
          .gatePersist()
        fold.count()
        val m = QualityClassifier.trainFold(fold, labels,
          buckets = 4096, salt = ":nb1")
        val scored = QualityClassifier.scoreFold(docs, "doc_id", fold, m)
          .join(labels, Seq("doc_id"))
          .withColumn("v",
            round(col("log_odds") / greatest(col("n_tokens"), lit(1L)), 9))
          .withColumn("p", round(lit(1.0) / (lit(1.0) + exp(-col("v"))), 9))
          .select("doc_id", "v", "p", "is_pos")
          .gatePersist()
        val ths = scored.agg(expr(
          "percentile(v, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("t"))
        scored.crossJoin(broadcast(ths))
          .withColumn("bin",
            (1 to 9).map(i => when(col("v") > element_at(col("t"), i), 1L)
              .otherwise(0L)).reduce(_ + _))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            round(ExactAgg.avgD(col("p"), 9), 6).as("mean_p"),
            sum(when(col("is_pos"), 1L).otherwise(0L)).as("n_pos"))
          .withColumn("frac_pos",
            col("n_pos").cast("double") / col("n").cast("double"))
          .orderBy("bin")
      },
      Some(s"""WITH ${qualityLangCtes("documents")},
        |e AS (SELECT s.doc_id, s.quality,
        |    ${fp60Sql("tok || ':nb1'")} % 4096 AS b
        |  FROM (SELECT doc_id, quality FROM scored) s JOIN
        |    (SELECT doc_id, unnest(toks) AS tok FROM t0) u USING (doc_id)),
        |bp AS (SELECT b, count(*) AS cp FROM e WHERE quality >= 0.6 GROUP BY 1),
        |bn AS (SELECT b, count(*) AS cn FROM e WHERE quality < 0.6 GROUP BY 1),
        |np AS (SELECT COALESCE(sum(cp), 0) AS n FROM bp),
        |nn AS (SELECT COALESCE(sum(cn), 0) AS n FROM bn),
        |m AS (SELECT COALESCE(bp.b, bn.b) AS b, CAST(round(ln(
        |    ((CAST(COALESCE(cp, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |      / CAST((SELECT n FROM np) + 4096 AS DOUBLE))
        |    / ((CAST(COALESCE(cn, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |      / CAST((SELECT n FROM nn) + 4096 AS DOUBLE))), 9)
        |  AS DECIMAL(28,9)) AS llr
        |  FROM bp FULL JOIN bn ON bp.b = bn.b),
        |dflt AS (SELECT CAST(round(ln(
        |    CAST((SELECT n FROM nn) + 4096 AS DOUBLE)
        |    / CAST((SELECT n FROM np) + 4096 AS DOUBLE)), 9)
        |  AS DECIMAL(28,9)) AS v),
        |pri AS (SELECT CAST(round(ln(
        |    CAST((SELECT count(*) FROM scored WHERE quality >= 0.6) + 1 AS DOUBLE)
        |    / CAST((SELECT count(*) FROM scored WHERE quality < 0.6) + 1 AS DOUBLE)), 9)
        |  AS DECIMAL(28,9)) AS v),
        |pd AS (SELECT doc_id, count(*) AS n_tokens,
        |    sum(COALESCE(m.llr, (SELECT v FROM dflt))) AS sllr
        |  FROM e LEFT JOIN m ON m.b = e.b GROUP BY 1),
        |sc AS (SELECT d.doc_id, COALESCE(pd.n_tokens, 0) AS n_tokens,
        |    CAST(round(COALESCE(pd.sllr, 0) + (SELECT v FROM pri), 6)
        |      AS DOUBLE) AS log_odds
        |  FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id),
        |pb AS (SELECT sc.doc_id,
        |    round(log_odds / greatest(n_tokens, 1), 9) AS v,
        |    (s2.quality >= 0.6) AS is_pos
        |  FROM sc JOIN scored s2 ON s2.doc_id = sc.doc_id),
        |pp AS (SELECT doc_id, v,
        |    round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-v)), 9) AS p,
        |    is_pos FROM pb),
        |th AS (SELECT quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
        |    AS t FROM pp),
        |bi AS (SELECT doc_id, p, is_pos,
        |    ${(1 to 9).map(i => s"(CASE WHEN v > th.t[$i] THEN 1 ELSE 0 END)")
                 .mkString("(", " + ", ")")}::BIGINT AS bin
        |  FROM pp, th)
        |SELECT bin, count(*) AS n,
        |  round(${ExactAgg.avgSql("p", 9)}, 6) AS mean_p,
        |  CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS frac_pos
        |FROM bi GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Gradient-trained LOGISTIC quality filter (round 15): the
    //      fastText-class linear classifier itself — 3 unrolled batch-GD
    //      iterations over hashed-unigram counts, weak-labeled by the
    //      heuristic (the NB gate's deployment pattern). Bit-exact across
    //      engines for an ITERATIVE float algorithm: integer features,
    //      sigmoids rounded to 9 decimals on the spot (errors become exact
    //      decimals; every corpus-scale gradient sum is order-independent),
    //      and the only float op — w + lrEff*grad — is per-slot IEEE with
    //      lrEff one double division, re-rounded to 9. The oracle unrolls
    //      the same 3 iterations.
    "q_text_logit_quality" -> Q(
      (s, d) => {
        import graft.operators.QualityClassifier
        val docs = Tables.documents(s, d)
        val lab = docs.withColumn("__q",
          graft.functions.TextFunctions.qualityScore(col("text")))
        // ONE persisted fold feeds training AND scoring (same salt, so the
        // unrolled oracle is untouched) — halves the gate's tokenization.
        val fold = QualityClassifier.tokenFold(docs, "doc_id", "text",
            buckets = 4096, salt = ":lg1")
          .gatePersist()
        fold.count()
        val m = QualityClassifier.trainLogisticFold(lab, "doc_id",
          col("__q") >= 0.6, fold, iters = 3, lr = 0.5, buckets = 4096,
          salt = ":lg1")
        QualityClassifier.scoreLogisticFold(docs, "doc_id", fold, m)
          .orderBy("doc_id")
      },
      Some(s"""WITH ${qualityLangCtes("documents")},
        |${logitTrainSql("quality >= 0.6")}
        |SELECT doc_id, n_tokens, CAST(round(m, 6) AS DOUBLE) AS margin,
        |  CAST(round(1.0/(1.0+exp(-CAST(m AS DOUBLE))), 9) AS DOUBLE) AS p,
        |  CAST(round(m, 6) AS DOUBLE) > 0 AS keep
        |FROM sc ORDER BY doc_id""".stripMargin)),

    // ---- NB classifier DISCRIMINATION report (ROC-AUC + average
    //      precision, per source): the threshold-free half of filter
    //      acceptance beside the calibration gate — does the per-token
    //      log-odds ORDER documents by the pseudo-label at all, and does
    //      that hold on every source? Metrics stay exact under ties: AUC
    //      as the integer Mann-Whitney 2U statistic (one final division),
    //      AP as decimal-summed threshold-sweep terms — both order-free,
    //      so the sharded distributed fold hash-matches DuckDB's window
    //      cumsums bit-for-bit (see ClassifierEval's scaladoc for the
    //      no-global-window scale shape).
    "q_eval_classifier_auc" -> Q(
      (s, d) => {
        // fold path (r19 perf) — see q_text_nb_quality; `lab` carries the
        // source column the metric grouping needs.
        import graft.operators.{ClassifierEval, QualityClassifier}
        val docs = Tables.documents(s, d)
        val lab = Parallelism.fanOut(docs).select(col("doc_id"), col("source"),
            (graft.functions.TextFunctions.qualityScore(col("text")) >= 0.6)
              .as("is_pos"))
          .gatePersist()
        val fold = QualityClassifier.tokenFold(docs, "doc_id", "text",
            buckets = 4096, salt = ":nb1")
          .gatePersist()
        fold.count()
        val m = QualityClassifier.trainFold(fold,
          lab.select(col("doc_id"), col("is_pos")),
          buckets = 4096, salt = ":nb1")
        val scored = QualityClassifier.scoreFold(docs, "doc_id", fold, m)
          .join(lab, Seq("doc_id"))
          .withColumn("v",
            round(col("log_odds") / greatest(col("n_tokens"), lit(1L)), 9))
          .select("doc_id", "source", "v", "is_pos")
          .gatePersist()
        ClassifierEval.binaryMetricsBy(scored, "source", col("v"),
            col("is_pos"))
          .orderBy("source")
      },
      Some(s"""WITH ${qualityLangCtes("documents")},
        |e AS (SELECT s.doc_id, s.quality,
        |    ${fp60Sql("tok || ':nb1'")} % 4096 AS b
        |  FROM (SELECT doc_id, quality FROM scored) s JOIN
        |    (SELECT doc_id, unnest(toks) AS tok FROM t0) u USING (doc_id)),
        |bp AS (SELECT b, count(*) AS cp FROM e WHERE quality >= 0.6 GROUP BY 1),
        |bn AS (SELECT b, count(*) AS cn FROM e WHERE quality < 0.6 GROUP BY 1),
        |np AS (SELECT COALESCE(sum(cp), 0) AS n FROM bp),
        |nn AS (SELECT COALESCE(sum(cn), 0) AS n FROM bn),
        |m AS (SELECT COALESCE(bp.b, bn.b) AS b, CAST(round(ln(
        |    ((CAST(COALESCE(cp, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |      / CAST((SELECT n FROM np) + 4096 AS DOUBLE))
        |    / ((CAST(COALESCE(cn, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |      / CAST((SELECT n FROM nn) + 4096 AS DOUBLE))), 9)
        |  AS DECIMAL(28,9)) AS llr
        |  FROM bp FULL JOIN bn ON bp.b = bn.b),
        |dflt AS (SELECT CAST(round(ln(
        |    CAST((SELECT n FROM nn) + 4096 AS DOUBLE)
        |    / CAST((SELECT n FROM np) + 4096 AS DOUBLE)), 9)
        |  AS DECIMAL(28,9)) AS v),
        |pri AS (SELECT CAST(round(ln(
        |    CAST((SELECT count(*) FROM scored WHERE quality >= 0.6) + 1 AS DOUBLE)
        |    / CAST((SELECT count(*) FROM scored WHERE quality < 0.6) + 1 AS DOUBLE)), 9)
        |  AS DECIMAL(28,9)) AS v),
        |pd AS (SELECT doc_id, count(*) AS n_tokens,
        |    sum(COALESCE(m.llr, (SELECT v FROM dflt))) AS sllr
        |  FROM e LEFT JOIN m ON m.b = e.b GROUP BY 1),
        |sc AS (SELECT d.doc_id, COALESCE(pd.n_tokens, 0) AS n_tokens,
        |    CAST(round(COALESCE(pd.sllr, 0) + (SELECT v FROM pri), 6)
        |      AS DOUBLE) AS log_odds
        |  FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id),
        |pb AS (SELECT sc.doc_id, d2.source,
        |    round(log_odds / greatest(n_tokens, 1), 9) AS v,
        |    (s2.quality >= 0.6) AS is_pos
        |  FROM sc JOIN scored s2 ON s2.doc_id = sc.doc_id
        |  JOIN documents d2 ON d2.doc_id = sc.doc_id),
        |g AS (SELECT source, v,
        |    CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS gnp,
        |    CAST(sum(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS gnn
        |  FROM pb GROUP BY 1, 2),
        |t AS (SELECT source, CAST(sum(gnp) AS BIGINT) AS tnp,
        |    CAST(sum(gnn) AS BIGINT) AS tnn FROM g GROUP BY 1),
        |c AS (SELECT source, v, gnp, gnn,
        |    COALESCE(sum(gnn) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb,
        |    COALESCE(sum(gnp) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cpb
        |  FROM g),
        |u AS (SELECT c.source, tnp, tnn,
        |    gnp * (2*cnb + gnn) AS u2,
        |    CAST(round(gnp * (tnp - cpb) / ((tnp - cpb) + (tnn - cnb)), 12)
        |      AS DECIMAL(38,12)) AS apt
        |  FROM c JOIN t USING (source))
        |SELECT source, CAST(tnp + tnn AS BIGINT) AS n,
        | CAST(tnp AS BIGINT) AS n_pos, CAST(tnn AS BIGINT) AS n_neg,
        | CASE WHEN tnp > 0 AND tnn > 0 THEN
        |   round(CAST(sum(u2) AS DOUBLE) / (2.0 * tnp * tnn), 9) END AS auc_roc,
        | CASE WHEN tnp > 0 THEN
        |   round(CAST(sum(apt) AS DOUBLE) / tnp, 9) END AS avg_precision
        |FROM u GROUP BY source, tnp, tnn ORDER BY source""".stripMargin)),

    // ---- Filter BAKE-OFF (round 15; score-once fusion round 16): the two
    //      TRAINED quality tiers — closed-form NB and gradient-trained
    //      logistic — scored head to head with exact ROC-AUC / AP against
    //      the weak label both trained on (in-sample by design: the
    //      question is which tier ORDERS documents closer to the signal it
    //      distills; held-out generalization is the NB calibration gate's
    //      job). The label is the CCNet-style "is the target language"
    //      split (balanced ~44/56 on this corpus — the quality label is
    //      499:1 at gate scale and degenerate for ranking metrics). Both
    //      scores are length-normalized per token so the comparison is
    //      scale-free. ONE persisted tokenFold under ONE salt feeds NB
    //      train + score and logistic train + score — the corpus is
    //      tokenized once, not four times (a bake-off compares
    //      classifiers, not salts), which is the production shape for any
    //      pipeline running several filter families over one corpus.
    "q_text_filter_bakeoff" -> Q(
      (s, d) => {
        import graft.operators.{ClassifierEval, QualityClassifier}
        val docs = Tables.documents(s, d)
        val lab = docs.withColumn("__en",
          graft.functions.TextFunctions.langId(col("text")) === "en")
        // persisted: the fat langId column tree would otherwise re-evaluate
        // in every trainer action and label join downstream
        val labels = lab.select(col("doc_id"), col("__en").as("is_pos"))
          .gatePersist()
        val fold = QualityClassifier.tokenFold(docs, "doc_id", "text",
            buckets = 4096, salt = ":bk1")
          .gatePersist()
        fold.count()
        val nbM = QualityClassifier.trainFold(fold, labels,
          buckets = 4096, salt = ":bk1")
        val nb = QualityClassifier.scoreFold(docs, "doc_id", fold, nbM)
          .join(labels, Seq("doc_id"))
          .select(lit("nb").as("filter"),
            round(col("log_odds") / greatest(col("n_tokens"), lit(1L)), 9)
              .as("v"),
            col("is_pos"))
        val lgM = QualityClassifier.trainLogisticFold(lab, "doc_id",
          col("__en"), fold, iters = 3, lr = 0.5, buckets = 4096,
          salt = ":bk1")
        val lg = QualityClassifier.scoreLogisticFold(docs, "doc_id", fold,
            lgM)
          .join(labels, Seq("doc_id"))
          .select(lit("logit").as("filter"),
            round(col("margin") / greatest(col("n_tokens"), lit(1L)), 9)
              .as("v"),
            col("is_pos"))
        ClassifierEval.binaryMetricsBy(nb.unionByName(lg), "filter",
            col("v"), col("is_pos"))
          .orderBy("filter")
      },
      Some(s"""WITH ${qualityLangCtes("documents")},
        |${logitTrainSql("lang = 'en'", ":bk1")},
        |lab AS (SELECT doc_id, (lang = 'en') AS is_pos FROM scored),
        |nbg AS (SELECT b,
        |    sum(CASE WHEN is_pos THEN cnt ELSE CAST(0 AS DECIMAL(10,0)) END) AS cp,
        |    sum(CASE WHEN is_pos THEN CAST(0 AS DECIMAL(10,0)) ELSE cnt END) AS cn
        |  FROM xb JOIN lab USING (doc_id) GROUP BY 1),
        |nbtp AS (SELECT COALESCE(sum(cp), 0) AS n FROM nbg),
        |nbtn AS (SELECT COALESCE(sum(cn), 0) AS n FROM nbg),
        |nbm AS (SELECT b, CAST(round(ln(
        |    ((CAST(cp AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |      / CAST((SELECT n FROM nbtp) + 4096 AS DOUBLE))
        |    / ((CAST(cn AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |      / CAST((SELECT n FROM nbtn) + 4096 AS DOUBLE))), 9)
        |  AS DECIMAL(19,9)) AS llr
        |  FROM nbg),
        |nbd AS (SELECT CAST(round(ln(
        |    CAST((SELECT n FROM nbtn) + 4096 AS DOUBLE)
        |    / CAST((SELECT n FROM nbtp) + 4096 AS DOUBLE)), 9)
        |  AS DECIMAL(19,9)) AS v),
        |nbpri AS (SELECT CAST(round(ln(
        |    CAST((SELECT count(*) FROM scored WHERE lang = 'en') + 1 AS DOUBLE)
        |    / CAST((SELECT count(*) FROM scored WHERE lang <> 'en') + 1 AS DOUBLE)), 9)
        |  AS DECIMAL(19,9)) AS v),
        |nbpd AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    sum(CAST(COALESCE(nbm.llr, (SELECT v FROM nbd)) AS DECIMAL(19,9))
        |      * cnt) AS sllr
        |  FROM xb LEFT JOIN nbm ON nbm.b = xb.b GROUP BY 1),
        |nbsc AS (SELECT d.doc_id, COALESCE(nbpd.n_tokens, 0) AS n_tokens,
        |    CAST(round(CAST(COALESCE(nbpd.sllr, 0) AS DECIMAL(28,9))
        |      + (SELECT v FROM nbpri), 6) AS DOUBLE) AS log_odds
        |  FROM documents d LEFT JOIN nbpd ON nbpd.doc_id = d.doc_id),
        |uv AS (
        |  SELECT 'nb' AS filter,
        |    round(nbsc.log_odds / greatest(nbsc.n_tokens, 1), 9) AS v,
        |    lab.is_pos
        |  FROM nbsc JOIN lab USING (doc_id)
        |  UNION ALL
        |  SELECT 'logit',
        |    round(CAST(round(sc.m, 6) AS DOUBLE) / greatest(sc.n_tokens, 1), 9),
        |    lab.is_pos
        |  FROM sc JOIN lab USING (doc_id)),
        |g AS (SELECT filter, v,
        |    CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS gnp,
        |    CAST(sum(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS gnn
        |  FROM uv GROUP BY 1, 2),
        |t AS (SELECT filter, CAST(sum(gnp) AS BIGINT) AS tnp,
        |    CAST(sum(gnn) AS BIGINT) AS tnn FROM g GROUP BY 1),
        |c AS (SELECT filter, v, gnp, gnn,
        |    COALESCE(sum(gnn) OVER (PARTITION BY filter ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb,
        |    COALESCE(sum(gnp) OVER (PARTITION BY filter ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cpb
        |  FROM g),
        |u AS (SELECT c.filter, tnp, tnn,
        |    gnp * (2*cnb + gnn) AS u2,
        |    CAST(round(gnp * (tnp - cpb) / ((tnp - cpb) + (tnn - cnb)), 12)
        |      AS DECIMAL(38,12)) AS apt
        |  FROM c JOIN t USING (filter))
        |SELECT filter, CAST(tnp + tnn AS BIGINT) AS n,
        | CAST(tnp AS BIGINT) AS n_pos, CAST(tnn AS BIGINT) AS n_neg,
        | CASE WHEN tnp > 0 AND tnn > 0 THEN
        |   round(CAST(sum(u2) AS DOUBLE) / (2.0 * tnp * tnn), 9) END AS auc_roc,
        | CASE WHEN tnp > 0 THEN
        |   round(CAST(sum(apt) AS DOUBLE) / tnp, 9) END AS avg_precision
        |FROM u GROUP BY filter, tnp, tnn ORDER BY filter""".stripMargin)),

    // ---- BPE round trip: merges trained on the :bpe1 80% split, applied
    //      to every document; the compared contract is LOSSLESSNESS — each
    //      word must reconstruct exactly from its subtokens, so the md5 of
    //      the re-joined text equals the md5 of the tokenized original
    //      (which IS SQL-expressible even though the learned segmentation
    //      isn't). Segmentation itself is pinned by BpeSpec's hand example.
    "q_text_bpe_roundtrip" -> Q(
      (s, d) => {
        import graft.operators.Bpe
        val docs = Tables.documents(s, d)
        val ref = docs.filter(graft.operators.Sampling.split(
          col("doc_id"), 80, 10, salt = ":bpe1") === "train")
        val merges = Bpe.trainBpe(ref, "doc_id", "text", numMerges = 1000)
        Bpe.applyBpe(docs, "doc_id", "text", merges)
          .select(col("doc_id"),
            when(col("words").isNull, lit(0L))
              .otherwise(size(col("words")).cast("bigint")).as("n_words"),
            md5(coalesce(concat_ws(" ",
              transform(col("words"), w => concat_ws("", w.getField("subtokens")))),
              lit(""))).as("recon_md5"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
        |  COALESCE(len($ToksSql), 0) AS n_words,
        |  md5(COALESCE(array_to_string($ToksSql, ' '), '')) AS recon_md5
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Unigram-LM tokenizer (round 16) — the SentencePiece-style
    //      sibling of the BPE family. The COUNT-DETERMINED stages are
    //      hash-gated (seed candidates below, final vocab membership next
    //      gate); EM trains only the segmentation probabilities and is
    //      spec-pinned against a hand-computed iteration (BpeSpec
    //      convention — float lattice marginals are not SQL-expressible).
    //      Seed statistics: every substring (len 1..8) of every frequent
    //      word <= 64 chars, occurrence-counted and weighted by word
    //      frequency, score = cnt*len, top-2048 by (score desc, piece asc).
    "q_text_unigram_seed" -> Q(
      (s, d) => {
        import graft.operators.UnigramLm
        UnigramLm.seedCandidates(Tables.documents(s, d), "doc_id", "text",
            maxPieceLen = 8, seedCap = 2048)
          .orderBy(desc("score"), asc("piece"))
      },
      Some(s"""WITH wc AS (SELECT tok AS word, count(*) AS c
        |  FROM (SELECT unnest($ToksSql) AS tok FROM documents) u
        |  GROUP BY 1 ORDER BY c DESC, word LIMIT ${1 << 17}),
        |ws AS (SELECT word, c FROM wc WHERE len(word) <= 64),
        |pos AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, 64) g(i)),
        |lens AS (SELECT CAST(l AS INT) AS l FROM generate_series(1, 8) g(l)),
        |subs AS (SELECT substr(word, i, l) AS piece, sum(c) AS cnt
        |  FROM ws JOIN pos ON pos.i <= len(word)
        |    JOIN lens ON lens.l <= least(8, len(word) - pos.i + 1)
        |  GROUP BY 1),
        |sc AS (SELECT piece, cnt, cnt * len(piece) AS score,
        |    row_number() OVER (ORDER BY cnt * len(piece) DESC, piece) AS rn
        |  FROM subs)
        |SELECT piece, CAST(cnt AS BIGINT) AS cnt, CAST(score AS BIGINT) AS score
        |FROM sc WHERE rn <= 2048 ORDER BY score DESC, piece""".stripMargin)),

    // Final vocab MEMBERSHIP — count-determined (the full single-char
    // inventory for coverage, then top multi-char candidates by the seed
    // score into a 512-piece budget), so membership is hash-exact and EM
    // can never silently change which pieces exist — only their weights.
    "q_text_unigram_vocab" -> Q(
      (s, d) => {
        import graft.operators.UnigramLm
        UnigramLm.selectVocab(Tables.documents(s, d), "doc_id", "text",
            vocabSize = 512, maxPieceLen = 8, seedCap = 2048)
          .orderBy("piece")
      },
      Some(s"""WITH wc AS (SELECT tok AS word, count(*) AS c
        |  FROM (SELECT unnest($ToksSql) AS tok FROM documents) u
        |  GROUP BY 1 ORDER BY c DESC, word LIMIT ${1 << 17}),
        |ws AS (SELECT word, c FROM wc WHERE len(word) <= 64),
        |pos AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, 64) g(i)),
        |lens AS (SELECT CAST(l AS INT) AS l FROM generate_series(1, 8) g(l)),
        |subs AS (SELECT substr(word, i, l) AS piece, sum(c) AS cnt
        |  FROM ws JOIN pos ON pos.i <= len(word)
        |    JOIN lens ON lens.l <= least(8, len(word) - pos.i + 1)
        |  GROUP BY 1),
        |sc AS (SELECT piece, cnt, cnt * len(piece) AS score,
        |    row_number() OVER (ORDER BY cnt * len(piece) DESC, piece) AS rn
        |  FROM subs),
        |seeds AS (SELECT piece, cnt, score FROM sc WHERE rn <= 2048),
        |chars AS (SELECT piece, CAST(1 AS INT) AS piece_len,
        |    CAST(cnt AS BIGINT) AS cnt, CAST(cnt AS BIGINT) AS score
        |  FROM subs WHERE len(piece) = 1),
        |nch AS (SELECT count(*) AS n FROM chars),
        |mt AS (SELECT piece, CAST(len(piece) AS INT) AS piece_len,
        |    CAST(cnt AS BIGINT) AS cnt, CAST(score AS BIGINT) AS score,
        |    row_number() OVER (ORDER BY score DESC, piece) AS rn
        |  FROM seeds WHERE len(piece) >= 2)
        |SELECT piece, piece_len, cnt, score FROM chars
        |UNION ALL
        |SELECT piece, piece_len, cnt, score FROM mt
        |WHERE rn <= greatest(0, 512 - (SELECT n FROM nch))
        |ORDER BY piece""".stripMargin)),

    // Viterbi segmentation ROUND TRIP — the q_text_bpe_roundtrip contract:
    // concatenating each word's pieces reconstructs the word exactly, for
    // every document, whatever the learned probabilities ended up being
    // (the learned segmentation itself is not SQL-expressible; the EM
    // arithmetic is spec-pinned).
    "q_text_unigram_roundtrip" -> Q(
      (s, d) => {
        import graft.operators.UnigramLm
        val docs = Tables.documents(s, d)
        val ref = docs.filter(graft.operators.Sampling.split(
          col("doc_id"), 80, 10, salt = ":ug1") === "train")
        val model = UnigramLm.trainUnigram(ref, "doc_id", "text",
          vocabSize = 512, iters = 2, seedCap = 2048)
        UnigramLm.applyUnigram(docs, "doc_id", "text", model)
          .select(col("doc_id"),
            when(col("words").isNull, lit(0L))
              .otherwise(size(col("words")).cast("bigint")).as("n_words"),
            md5(coalesce(concat_ws(" ",
              transform(col("words"), w => concat_ws("", w.getField("subtokens")))),
              lit(""))).as("recon_md5"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
        |  COALESCE(len($ToksSql), 0) AS n_words,
        |  md5(COALESCE(array_to_string($ToksSql, ' '), '')) AS recon_md5
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Vocab COVERAGE report (round 16): the static pre-commit tokenizer
    // numbers, per source — char-OOV occurrence rate against the vocab's
    // single-char inventory (the unk-fallback mass) and the verbatim
    // whole-word hit rate. The vocab trains on the :ug1 80% split, the
    // report covers the WHOLE corpus, so the held-out slice genuinely
    // moves the rates. Pure counting end to end — vocab membership is the
    // count-determined stage — so the gate hash-checks the full chain.
    "q_text_unigram_coverage" -> Q(
      (s, d) => {
        import graft.operators.{Sampling, UnigramLm}
        val docs = Tables.documents(s, d)
        val ref = docs.filter(Sampling.split(
          col("doc_id"), 80, 10, salt = ":ug1") === "train")
        val vocab = UnigramLm.selectVocab(ref, "doc_id", "text",
          vocabSize = 512, maxPieceLen = 8, seedCap = 2048)
        UnigramLm.coverageBySource(docs, "doc_id", "text", "source", vocab)
          .orderBy("source")
      },
      Some(s"""WITH wc AS (SELECT tok AS word, count(*) AS c
        |  FROM (SELECT unnest($ToksSql) AS tok FROM documents
        |        WHERE ${fp60Sql("CAST(doc_id AS VARCHAR) || ':ug1'")} % 100 < 80) u
        |  GROUP BY 1 ORDER BY c DESC, word LIMIT ${1 << 17}),
        |ws AS (SELECT word, c FROM wc WHERE len(word) <= 64),
        |pos AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, 64) g(i)),
        |lens AS (SELECT CAST(l AS INT) AS l FROM generate_series(1, 8) g(l)),
        |subs AS (SELECT substr(word, i, l) AS piece, sum(c) AS cnt
        |  FROM ws JOIN pos ON pos.i <= len(word)
        |    JOIN lens ON lens.l <= least(8, len(word) - pos.i + 1)
        |  GROUP BY 1),
        |sc AS (SELECT piece, cnt, cnt * len(piece) AS score,
        |    row_number() OVER (ORDER BY cnt * len(piece) DESC, piece) AS rn
        |  FROM subs),
        |seeds AS (SELECT piece, cnt, score FROM sc WHERE rn <= 2048),
        |chars AS (SELECT piece FROM subs WHERE len(piece) = 1),
        |nch AS (SELECT count(*) AS n FROM chars),
        |mt AS (SELECT piece,
        |    row_number() OVER (ORDER BY score DESC, piece) AS rn
        |  FROM seeds WHERE len(piece) >= 2),
        |vcb AS (SELECT piece FROM chars
        |  UNION ALL SELECT piece FROM mt
        |  WHERE rn <= greatest(0, 512 - (SELECT n FROM nch))),
        |ivs AS (SELECT coalesce(string_agg(piece, '' ORDER BY piece), '') AS s
        |  FROM chars),
        |wds AS (SELECT source, unnest($ToksSql) AS word FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(CASE WHEN word IN (SELECT piece FROM vcb)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_whole_word,
        |  CAST(sum(len(word)) AS BIGINT) AS n_chars,
        |  CAST(sum(len(translate(word, (SELECT s FROM ivs), ''))) AS BIGINT)
        |    AS n_oov_chars,
        |  round(CAST(sum(CASE WHEN word IN (SELECT piece FROM vcb)
        |      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS whole_word_rate,
        |  round(CAST(sum(len(translate(word, (SELECT s FROM ivs), '')))
        |      AS DOUBLE) / sum(len(word)), 6) AS oov_char_rate
        |FROM wds GROUP BY source ORDER BY source""".stripMargin)),

    // ---- Tokenizer BAKE-OFF (round 17): two real segmentation strategies
    //      head-to-head over the SAME :ug1-trained 512-piece vocab, per
    //      source — greedy longest-match (WordPiece inference) vs the
    //      min-piece DP (SentencePiece's probability-free shortest
    //      segmentation; the uniform-model Viterbi kernel). Both are
    //      COUNT-DETERMINED (vocab membership is the hash-gated stage; no
    //      EM weights, no merge order), so fertility and fallback mass are
    //      fully SQL-mirrorable: the oracle re-runs the greedy walk and the
    //      min-cost DP per DISTINCT word with recursive CTEs and weights by
    //      word frequency. The EM-weighted Viterbi and the BPE encoder are
    //      the non-mirrorable family members: their LOSSLESSNESS is gated
    //      (the two roundtrip gates) and their trained-model fertility
    //      head-to-head is spec-pinned (UnigramLmSpec). One corpus scan per
    //      segmenter; fallback = char occurrences outside the vocab's
    //      single-char inventory (provably the unk mass for BOTH — a vocab
    //      piece can only contain inventory chars).
    // ---- TRAINED lang-id (round 17): multiclass multinomial NB over the
    //      shared token fold — the fastText-supervised tier above the
    //      marker heuristic (q_text_langid). Train on the hash-split 80%
    //      with the documents table's own lang labels, predict the held-out
    //      20% by argmax posterior (decimal-exact scores, ties to the
    //      lexicographically smallest language). The oracle unrolls the
    //      whole model — per-language smoothed bucket likelihoods, priors,
    //      defaults — in the NB decimal discipline (dec9 once, decimal
    //      sums, argmax before the final 6-digit round). NOTE: the
    //      synthetic corpus draws lang labels INDEPENDENTLY of its
    //      shared-vocabulary text, so the majority-class posterior is the
    //      Bayes optimum here and every doc predicts 'en' — the gate pins
    //      the model arithmetic; LangClassifierSpec pins real separation.
    "q_text_langid_trained" -> Q(
      (s, d) => langIdScored(s, d).orderBy("doc_id"),
      Some(s"""WITH ${langNbCtes()}
        |SELECT r.doc_id, r.lang_true AS lang, r.lang AS lang_pred,
        | r.lang = r.lang_true AS correct,
        | CAST(COALESCE(nt.n_tokens, 0) AS BIGINT) AS n_tokens,
        | CAST(round(r.score, 6) AS DOUBLE) AS score
        |FROM rk r LEFT JOIN nt USING (doc_id)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // The confusion matrix over the same held-out predictions — the
    // routing-quality report a lang-id stage publishes (which language
    // pairs bleed into each other, and with what share of the true mass).
    "q_text_langid_confusion" -> Q(
      (s, d) => {
        val sc = langIdScored(s, d)
        val tot = sc.groupBy("lang")
          .agg(count(lit(1)).as("n_true"))
        sc.groupBy("lang", "lang_pred")
          .agg(count(lit(1)).as("n"))
          .join(tot, Seq("lang"))
          .select(col("lang"), col("lang_pred"), col("n"),
            (col("n").cast("double") / col("n_true").cast("double"))
              .as("share"))
          .orderBy("lang", "lang_pred")
      },
      Some(s"""WITH ${langNbCtes()},
        |pred AS (SELECT doc_id, lang_true, lang AS lang_pred FROM rk
        |  WHERE rn = 1),
        |tt AS (SELECT lang_true, count(*) AS n_true FROM pred GROUP BY 1)
        |SELECT p.lang_true AS lang, p.lang_pred, count(*) AS n,
        | CAST(count(*) AS DOUBLE) / CAST(t.n_true AS DOUBLE) AS share
        |FROM pred p JOIN tt t USING (lang_true)
        |GROUP BY 1, 2, t.n_true ORDER BY 1, 2""".stripMargin)),

    // ---- CHAR 3–5-GRAM trained lang-id (round 18): the same multiclass
    //      NB trainer/scorer over the feature space the fastText/CCNet
    //      tier actually runs on — each token wrapped `<tok>` (capped at
    //      64 chars) and every char n-gram, n in 3..5, hashed into the
    //      shared (buckets, salt) fold. Subword units are what separate
    //      same-script languages (`ção` vs `ción`) and what generalize to
    //      UNSEEN words — on held-out text full of novel tokens a
    //      token-unigram model collapses every token to one default llk
    //      while the char model has seen the morphology
    //      (LangClassifierSpec pins that separation head-to-head; the
    //      synthetic corpus's labels are text-independent, so here the
    //      majority-class posterior stays the Bayes optimum and the gate
    //      pins the ARITHMETIC: same fully-unrolled NB oracle, char-gram
    //      feature CTE swapped in).
    "q_text_langid_char" -> Q(
      (s, d) => langIdScored(s, d, charGrams = true).orderBy("doc_id"),
      Some {
        val charE =
          s"""w0 AS (SELECT doc_id, substr('<' || tok || '>', 1, 64) AS w
             |  FROM (SELECT doc_id, unnest(toks) AS tok FROM li0)),
             |cpos AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, 64) g(i)),
             |clens AS (SELECT CAST(l AS INT) AS l FROM generate_series(3, 5) g(l)),
             |e AS (SELECT doc_id, ${fp60Sql("substr(w, i, l) || ':lc1'")} % 4096 AS b
             |  FROM w0 JOIN cpos ON cpos.i <= len(w)
             |    JOIN clens ON cpos.i + clens.l - 1 <= len(w))""".stripMargin
        s"""WITH ${langNbCtes(featureCte = charE)}
        |SELECT r.doc_id, r.lang_true AS lang, r.lang AS lang_pred,
        | r.lang = r.lang_true AS correct,
        | CAST(COALESCE(nt.n_tokens, 0) AS BIGINT) AS n_tokens,
        | CAST(round(r.score, 6) AS DOUBLE) AS score
        |FROM rk r LEFT JOIN nt USING (doc_id)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin
      }),

    "q_text_tokenizer_bakeoff" -> Q(
      (s, d) => {
        import graft.operators.{Sampling, UnigramLm}
        val docs = Tables.documents(s, d)
        val ref = docs.filter(Sampling.split(
          col("doc_id"), 80, 10, salt = ":ug1") === "train")
        val vocab = graft.core.BoundedFrames.localize(
          UnigramLm.selectVocab(ref, "doc_id", "text", vocabSize = 512,
            maxPieceLen = 8, seedCap = 2048))
        val inv = vocab.filter(length(col("piece")) === 1)
          .select("piece").collect().map(_.getString(0)).sorted.mkString
        def stats(name: String, enc: DataFrame) =
          enc.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
            .select(col("source"),
              coalesce(size(col("words")), lit(0)).cast("long").as("w"),
              coalesce(aggregate(col("words"), lit(0L),
                (a, x) => a + size(x.getField("subtokens"))), lit(0L)).as("p"),
              coalesce(aggregate(col("words"), lit(0L),
                (a, x) => a + length(x.getField("word"))), lit(0L)).as("c"),
              coalesce(aggregate(col("words"), lit(0L),
                (a, x) => a + length(translate(x.getField("word"), inv, ""))),
                lit(0L)).as("f"))
            .groupBy("source")
            .agg(sum("w").as("n_words"), sum("c").as("n_chars"),
              sum("p").as("n_pieces"), sum("f").as("n_fallback_chars"))
            .select(lit(name).as("tokenizer"), col("source"),
              col("n_words"), col("n_chars"), col("n_pieces"),
              when(col("n_words") > 0,
                round(col("n_pieces").cast("double") /
                  col("n_words").cast("double"), 6)).as("fertility"),
              col("n_fallback_chars"),
              when(col("n_chars") > 0,
                round(col("n_fallback_chars").cast("double") /
                  col("n_chars").cast("double"), 6)).as("fallback_rate"))
        stats("greedy_maxmatch",
            UnigramLm.applyMaxMatch(docs, "doc_id", "text", vocab))
          .unionByName(stats("minpiece_dp",
            UnigramLm.applyMinPieces(docs, "doc_id", "text", vocab)))
          .orderBy("tokenizer", "source")
      },
      Some(s"""WITH RECURSIVE wc AS (SELECT tok AS word, count(*) AS c
        |  FROM (SELECT unnest($ToksSql) AS tok FROM documents
        |        WHERE ${fp60Sql("CAST(doc_id AS VARCHAR) || ':ug1'")} % 100 < 80) u
        |  GROUP BY 1 ORDER BY c DESC, word LIMIT ${1 << 17}),
        |ws AS (SELECT word, c FROM wc WHERE len(word) <= 64),
        |pos AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, 64) g(i)),
        |lens AS (SELECT CAST(l AS INT) AS l FROM generate_series(1, 8) g(l)),
        |subs AS (SELECT substr(word, i, l) AS piece, sum(c) AS cnt
        |  FROM ws JOIN pos ON pos.i <= len(word)
        |    JOIN lens ON lens.l <= least(8, len(word) - pos.i + 1)
        |  GROUP BY 1),
        |sc AS (SELECT piece, cnt, cnt * len(piece) AS score,
        |    row_number() OVER (ORDER BY cnt * len(piece) DESC, piece) AS rn
        |  FROM subs),
        |seeds AS (SELECT piece, cnt, score FROM sc WHERE rn <= 2048),
        |chars AS (SELECT piece FROM subs WHERE len(piece) = 1),
        |nch AS (SELECT count(*) AS n FROM chars),
        |mt AS (SELECT piece,
        |    row_number() OVER (ORDER BY score DESC, piece) AS rn
        |  FROM seeds WHERE len(piece) >= 2),
        |vcb AS (SELECT piece FROM chars
        |  UNION ALL SELECT piece FROM mt
        |  WHERE rn <= greatest(0, 512 - (SELECT n FROM nch))),
        |vli AS (SELECT list(piece) AS vl FROM vcb),
        |wsrc AS (SELECT source, unnest($ToksSql) AS word FROM documents),
        |wcnt AS (SELECT source, word, count(*) AS c, len(word) AS wl
        |  FROM wsrc GROUP BY 1, 2, len(word)),
        |dwl AS (SELECT word, (SELECT vl FROM vli) AS vl
        |  FROM (SELECT DISTINCT word FROM wcnt)),
        |dp AS (
        |  SELECT word, vl, 0 AS j, [CAST(0 AS BIGINT)] AS cs FROM dwl
        |  UNION ALL
        |  SELECT word, vl, j + 1,
        |    list_append(cs, list_min(list_transform(
        |      range(greatest(0, j + 1 - 8), j + 1),
        |      i -> cs[CAST(i + 1 AS INT)] + CASE
        |        WHEN list_contains(vl,
        |          substr(word, CAST(i + 1 AS INT), CAST(j + 1 - i AS INT)))
        |          THEN CAST(1 AS BIGINT)
        |        WHEN j + 1 - i = 1 THEN CAST(1000001 AS BIGINT) END)))
        |  FROM dp WHERE j < len(word)),
        |mp AS (SELECT word, cs[len(word) + 1] % 1000000 AS np,
        |    cs[len(word) + 1] // 1000000 AS nf
        |  FROM dp WHERE j = len(word)),
        |gr AS (
        |  SELECT word, vl, 0 AS pos, 0 AS np, 0 AS nf FROM dwl
        |  UNION ALL
        |  SELECT word, vl, pos + coalesce(best, 1), np + 1,
        |    nf + CASE WHEN best IS NULL THEN 1 ELSE 0 END
        |  FROM (SELECT word, vl, pos, np, nf,
        |      list_max(list_transform(range(1, least(8, len(word) - pos) + 1),
        |        l -> CASE WHEN list_contains(vl,
        |          substr(word, CAST(pos + 1 AS INT), CAST(l AS INT)))
        |          THEN l END)) AS best
        |    FROM gr WHERE pos < len(word)) t),
        |ge AS (SELECT word, np, nf FROM gr WHERE pos = len(word)),
        |rows_mp AS (SELECT 'minpiece_dp' AS tokenizer, source,
        |    sum(c) AS w, sum(c * wl) AS ch, sum(c * np) AS p, sum(c * nf) AS f
        |  FROM wcnt JOIN mp USING (word) GROUP BY 2),
        |rows_gr AS (SELECT 'greedy_maxmatch' AS tokenizer, source,
        |    sum(c) AS w, sum(c * wl) AS ch, sum(c * np) AS p, sum(c * nf) AS f
        |  FROM wcnt JOIN ge USING (word) GROUP BY 2),
        |uni AS (SELECT * FROM rows_gr UNION ALL SELECT * FROM rows_mp)
        |SELECT tokenizer, source, CAST(w AS BIGINT) AS n_words,
        |  CAST(ch AS BIGINT) AS n_chars, CAST(p AS BIGINT) AS n_pieces,
        |  CASE WHEN w > 0
        |    THEN round(CAST(p AS DOUBLE) / CAST(w AS DOUBLE), 6) END
        |    AS fertility,
        |  CAST(f AS BIGINT) AS n_fallback_chars,
        |  CASE WHEN ch > 0
        |    THEN round(CAST(f AS DOUBLE) / CAST(ch AS DOUBLE), 6) END
        |    AS fallback_rate
        |FROM uni ORDER BY tokenizer, source""".stripMargin)),

    // ---- Curation capstone v4 (round-12 wave composed): drop documents
    //      whose EMBEDDING sits near the benchmark set (semantic
    //      decontamination — vec_id aligns 1:1 with doc_id), cut each
    //      source at its own 25th quality percentile, then spend a
    //      500-token budget per source best-quality-first. Every stage is
    //      the gated operator: broadcast bench scoring + partial-agg max,
    //      broadcast percentile thresholds, two-phase exact budget cut.
    "q_pipeline_curate_v4" -> Q(
      (s, d) => {
        import graft.operators.{Curation, Decontaminate}
        val docs = Tables.documents(s, d)
        val e = Tables.embeddings(s, d)
        val clean = docs.join(
          Decontaminate.semanticFlags(
              e.filter(pmod(col("vec_id"), lit(20)) =!= 0), "vec_id", "embedding",
              e.filter(pmod(col("vec_id"), lit(20)) === 0), "vec_id", "embedding",
              threshold = 0.3)
            .filter(!col("is_contaminated"))
            .select(col("vec_id").as("doc_id")),
          Seq("doc_id"), "left_semi")
        val scored = Parallelism.fanOut(clean).select(col("doc_id"), col("source"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("n_tokens"))
        val kept = Curation.thresholdBySource(scored, "source", col("quality"),
          p = 0.25).drop("threshold")
        Curation.capTokensPerKey(kept, col("source"), col("n_tokens"),
            budget = 500L, order = Seq(desc("quality"), col("doc_id")),
            idCol = col("doc_id"))
          .select(col("doc_id"), col("source"),
            round(col("quality"), 9).as("quality_r"), col("n_tokens"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ce AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 20 != 0),
        |be AS (SELECT vec_id AS bench_id, CAST(embedding AS DOUBLE[]) AS bv
        |  FROM embeddings WHERE vec_id % 20 = 0),
        |mc AS (SELECT ce.vec_id, max(${cosSql("ce.v", "be.bv")}) AS m
        |  FROM ce, be GROUP BY 1),
        |fl AS (SELECT vec_id FROM mc WHERE m < CAST(0.3 AS DOUBLE)),
        |${qualityLangCtes("documents")},
        |q1 AS (SELECT sc.doc_id, sc.source, sc.quality,
        |  sc.n_toks AS n_tokens FROM scored sc JOIN fl ON fl.vec_id = sc.doc_id),
        |th AS (SELECT source, quantile_cont(quality, 0.25) AS threshold
        |  FROM q1 GROUP BY 1),
        |q2 AS (SELECT q1.* FROM q1 JOIN th USING (source)
        |  WHERE quality >= threshold),
        |w AS (SELECT doc_id, source, quality, n_tokens, sum(n_tokens) OVER (
        |  PARTITION BY source ORDER BY quality DESC, doc_id
        |  ROWS UNBOUNDED PRECEDING) AS cum FROM q2)
        |SELECT doc_id, source, round(quality, 9) AS quality_r, n_tokens
        |FROM w WHERE cum - n_tokens < 500 ORDER BY doc_id""".stripMargin)),

    // ---- Curation capstone v5 (round-13 wave composed; round 18 absorbed
    //      the retired v2's distinctive stage): the full recipe from raw
    //      corpus to packed training bins — drop documents sharing ANY
    //      13-gram with the eval set (collision rule), cut each source at
    //      its own 25th quality percentile, cross-document SPAN-CUT
    //      rewrite (k=8 boilerplate strip over the kept corpus — the
    //      composition the v2 capstone used to carry), solve the
    //      epoch-capped mixture over the REWRITTEN token mass, REALIZE it
    //      (integer passes + the deterministic fractional pass), and pack
    //      the epoch-tagged rows into 512-token bins. Every stage is the
    //      individually-gated operator; the per-source layout summary
    //      (now including the cut-token mass) pins the composition.
    "q_pipeline_curate_v5" -> Q(
      (s, d) => {
        import graft.operators.{Curation, Decontaminate, Dedup, Packing, Sampling}
        val docs = Tables.documents(s, d)
        val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
        val bench = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        val clean = Decontaminate.ngramClean(corpus, bench, "doc_id", "text",
          shingleK = 13)
        val scored = Parallelism.fanOut(clean).select(
          col("doc_id"), col("source"), col("text"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        // read twice (span edges + source join): persist once
        val keptc = Curation.thresholdBySource(scored, "source", col("quality"),
            p = 0.25)
          .select("doc_id", "source", "text")
          .gatePersist()
        keptc.count()
        // kept tokens = pre-cut count - cut count (no re-tokenization of
        // the rewritten text — the v2 accounting)
        // the span-cut rewrite roots THREE consumers (the weight universe,
        // the mixture plan's mass aggregation, and the realization join) —
        // unpinned, the whole decontaminate -> threshold -> span-cut chain
        // runs three times. Doc-bounded accounting rows: cheap to hold.
        val cut = Dedup.cutSpans(keptc, "doc_id", "text", k = 8)
          .join(keptc.select(col("doc_id"), col("source")), "doc_id")
          .withColumn("n_kept", col("n_tokens") - col("n_removed"))
          .select("doc_id", "source", "n_kept", "n_removed")
          .gatePersist()
        cut.count()
        val weights = cut.select("source").distinct()
          .select(col("source"),
            ((length(col("source")) % 5) + 1).cast("double").as("weight"))
        val plan = Sampling.mixturePlan(cut, "source", col("n_kept"), weights,
          budgetTokens = 50000L, maxEpochs = 3.0)
        val realized = Sampling.realizeMixture(cut, "source", col("doc_id"),
            plan, salt = ":v5")
          .withColumn("pack_id", col("doc_id") * 10 + col("epoch"))
        Packing.packBins(realized, "pack_id", col("n_kept"),
            budgetTokens = 512L, shards = 8)
          .groupBy("source")
          .agg(count(lit(1)).as("n_rows"),
            sum("n_kept").as("n_tokens"),
            sum("n_removed").as("n_cut"),
            countDistinct(col("shard") * lit(100000L) + col("bin")).as("n_bins"))
          .orderBy("source")
      },
      Some(s"""WITH tk AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |c0 AS (SELECT doc_id, unnest(${shinglesSqlK(13)}) AS tok FROM tk
        |  WHERE doc_id % 10 != 0),
        |cfp AS (SELECT doc_id, $TokenFp60Sql AS fp FROM c0),
        |b0 AS (SELECT doc_id, unnest(${shinglesSqlK(13)}) AS tok FROM tk
        |  WHERE doc_id % 10 = 0),
        |bfp AS (SELECT DISTINCT $TokenFp60Sql AS fp FROM b0),
        |bad AS (SELECT DISTINCT doc_id FROM cfp
        |  WHERE fp IN (SELECT fp FROM bfp)),
        |clean AS (SELECT * FROM documents WHERE doc_id % 10 != 0
        |  AND doc_id NOT IN (SELECT doc_id FROM bad)),
        |${qualityLangCtes("clean")},
        |th AS (SELECT source, quantile_cont(quality, 0.25) AS threshold
        |  FROM scored GROUP BY 1),
        |keptc AS (SELECT sc.doc_id, sc.source, sc.text FROM scored sc
        |  JOIN th USING (source) WHERE sc.quality >= th.threshold),
        |${spanCteChain(8, "", DupSharedCte, from = "keptc")},
        |${spanCutCtes("")},
        |sized AS (SELECT c.doc_id, kc.source,
        |  CAST(len(c.kt) AS BIGINT) AS n_kept,
        |  CAST(c.n_tokens - len(c.kt) AS BIGINT) AS n_removed
        |  FROM cutk c JOIN keptc kc ON kc.doc_id = c.doc_id),
        |cc AS (SELECT source, CAST(sum(n_kept) AS BIGINT) AS n_tokens
        |  FROM sized GROUP BY 1),
        |w AS (SELECT source, CAST((length(source) % 5) + 1 AS DOUBLE) AS weight
        |  FROM (SELECT DISTINCT source FROM sized)),
        |wt AS (SELECT sum(CAST(round(weight, 9) AS DECIMAL(28,9))) AS w_tot FROM w),
        |wn AS (SELECT source, CAST(CAST(round(weight, 9) AS DECIMAL(28,9)) AS DOUBLE)
        |    / CAST(w_tot AS DOUBLE) AS target_w FROM w, wt),
        |p AS (SELECT cc.source,
        |  CASE WHEN n_tokens > 0 THEN least(CAST(3.0 AS DOUBLE),
        |    (target_w * CAST(50000 AS DOUBLE)) / CAST(n_tokens AS DOUBLE))
        |    ELSE CAST(0.0 AS DOUBLE) END AS epochs
        |  FROM cc JOIN wn USING (source)),
        |r AS (SELECT k.doc_id, k.source, k.n_kept, k.n_removed,
        |  CAST(floor(epochs) AS BIGINT)
        |    + CASE WHEN CAST(${fp60Sql("CAST(doc_id AS VARCHAR) || ':v5'")} % 10000
        |        AS DOUBLE) < (epochs - floor(epochs)) * 10000.0
        |      THEN 1 ELSE 0 END AS n_copies
        |  FROM sized k JOIN p USING (source)),
        |e0 AS (SELECT doc_id, source, n_kept, n_removed,
        |  unnest(range(n_copies)) AS epoch
        |  FROM r WHERE n_copies > 0),
        |e AS (SELECT source, n_kept, n_removed,
        |  doc_id * 10 + epoch AS pack_id FROM e0),
        |ps AS (SELECT source, n_kept, n_removed, pack_id,
        |  ${fp60Sql("CAST(pack_id AS VARCHAR)")} % 8 AS shard FROM e),
        |pb AS (SELECT source, n_kept, n_removed, shard,
        |  CAST(floor(CAST(coalesce(sum(n_kept) OVER (PARTITION BY shard
        |    ORDER BY pack_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) / 512.0) AS BIGINT) AS bin
        |  FROM ps)
        |SELECT source, count(*) AS n_rows, CAST(sum(n_kept) AS BIGINT) AS n_tokens,
        | CAST(sum(n_removed) AS BIGINT) AS n_cut,
        | CAST(count(DISTINCT shard * 100000 + bin) AS BIGINT) AS n_bins
        |FROM pb GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Quality-weighted sampling: keep probability proportional to the
    //      document's quality score (hash bucket < quality*100) — the
    //      numeric generalization of the stratified gate; membership stays
    //      a pure scan-stage function of (doc_id, salt, quality).
    "q_sample_quality_weighted" -> Q(
      (s, d) => {
        val scored = docsP(s, d).select(col("doc_id"), col("source"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        graft.operators.Sampling.sampleByRateCol(
            scored, col("doc_id"), col("quality") * 100, salt = ":qw1")
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"),
            min("doc_id").as("min_id"), max("doc_id").as("max_id"))
          .orderBy("source")
      },
      Some(s"""WITH t AS (SELECT doc_id, source, text, $ToksSql AS toks FROM documents),
        |q AS (SELECT doc_id, source,
        | ((((CASE WHEN length(text) BETWEEN 50 AND 10000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
        |  + (CASE WHEN $StopRatioSql > 0.01 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
        |  + (CASE WHEN $PunctRatioSql < 0.2 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
        |  + (CASE WHEN $AvgTokLenSql BETWEEN 2.0 AND 12.0 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)) AS quality
        | FROM t),
        |k AS (SELECT doc_id, source, quality,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR) || ':qw1'")} % 100 AS b FROM q)
        |SELECT source, count(*) AS n_kept,
        | min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM k WHERE b < quality * 100 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Temperature-rebalanced source mixture: keep rates ∝ n^(1/T - 1)
    //      normalized so the smallest source keeps 100% (downsampling-only
    //      realization of the (n_s)^(1/T) target shares at T=2). Counts per
    //      source are the compared contract; the rate itself stays out of
    //      the row (pow last-ulp differences between engines would fail an
    //      exact double compare, while a bucket-boundary flip needs a rate
    //      within 1 ulp of an integer — not a realizable corpus).
    "q_sample_temperature" -> Q(
      (s, d) => {
        import graft.operators.Sampling
        // the synthetic sources are uniform, which would make every rate
        // 100% and the gate vacuous — fold them into a head-heavy mixture
        // (half "mega", a quarter "mid", the tail the real sources) so the
        // temperature cut actually fires
        val skewed = Tables.documents(s, d).select(col("doc_id"),
          when(pmod(col("doc_id"), lit(4)) < 2, lit("mega"))
            .when(pmod(col("doc_id"), lit(4)) === 2, lit("mid"))
            .otherwise(col("source")).as("source"))
        Sampling.temperatureSample(skewed,
            col("doc_id"), "source", temperature = 2.0, salt = ":tmp1")
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"),
            min("doc_id").as("min_id"), max("doc_id").as("max_id"))
          .orderBy("source")
      },
      Some(s"""WITH s0 AS (SELECT doc_id,
        |  CASE WHEN doc_id % 4 < 2 THEN 'mega'
        |       WHEN doc_id % 4 = 2 THEN 'mid' ELSE source END AS source
        |  FROM documents),
        |c AS (SELECT source, count(*) AS n FROM s0 GROUP BY 1),
        |r AS (SELECT source,
        |  pow(CAST(n AS DOUBLE), CAST(-0.5 AS DOUBLE))
        |    / max(pow(CAST(n AS DOUBLE), CAST(-0.5 AS DOUBLE))) OVER ()
        |    * CAST(100.0 AS DOUBLE) AS rate_pct FROM c),
        |k AS (SELECT d.doc_id, d.source, r.rate_pct,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR) || ':tmp1'")} % 100 AS b
        |  FROM s0 d JOIN r USING (source))
        |SELECT source, count(*) AS n_kept,
        | min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM k WHERE b < rate_pct GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Leakage-free group split: the bucket is hashed from the dedup
    //      GROUP key (content hash) instead of the row id, so exact
    //      duplicates can never straddle train/valid/test — the split
    //      discipline a post-dedup corpus actually needs. n_groups counts
    //      distinct groups per split; a group spanning two splits would
    //      show up as the same grp under two split values (impossible by
    //      construction — split is a function of grp — and the spec pins it).
    "q_sample_split_group" -> Q(
      (s, d) => {
        val grouped = Tables.documents(s, d)
          .select(col("doc_id"), md5(col("text")).as("grp"))
        graft.operators.Sampling.splitByGroup(grouped, col("grp"), 80, 10, salt = ":g1")
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("grp")).as("n_groups"),
            min("doc_id").as("min_id"), max("doc_id").as("max_id"))
          .orderBy("split")
      },
      Some(s"""WITH g AS (SELECT doc_id, md5(text) AS grp FROM documents),
        |k AS (SELECT doc_id, grp, ${fp60Sql("grp || ':g1'")} % 100 AS b FROM g),
        |sp AS (SELECT doc_id, grp,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
        | FROM k)
        |SELECT split, count(*) AS n_docs, count(DISTINCT grp) AS n_groups,
        | min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- capstone v2: same gates, but the dedup stage is NEAR-dup — word-
    //      shingle jaccard pairs -> connected components -> keep cluster
    //      keepers (min doc id) and unclustered docs. The full pipeline a
    //      pretraining corpus actually runs; oracle = the gates' SQL + the
    //      recursive-CTE closure.
    "q_pipeline_corpus_neardup" -> Q(
      (s, d) => {
        val scored = docsP(s, d).select(
          col("doc_id"), col("text"), col("source"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.langId(col("text")).as("lang"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("n_tokens"))
          .filter(col("quality") >= 0.6 && col("lang") === "en")
        val comps = Dedup.connectedComponents(
          Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
            threshold = 0.3, maxTokenDf = 100L, tokens = shingleSet))
        scored
          .join(comps.select(col("id").as("doc_id"), col("is_keeper")),
            Seq("doc_id"), "left_outer")
          .filter(coalesce(col("is_keeper"), lit(true)))
          .select("doc_id", "source", "quality", "n_tokens")
          .orderBy("doc_id")
      },
      Some {
        val langNames = TextFunctions.LangMarkers.map(_._1)
        val langHits = TextFunctions.LangMarkers.map { case (lang, ms) =>
          s"len(list_filter(toks, x -> x IN (${ms.map(m => s"'$m'").mkString(", ")}))) AS h_$lang"
        }.mkString(", ")
        val greatest = s"greatest(${langNames.map("h_" + _).mkString(", ")})"
        val langCase = langNames.map(l => s"WHEN h_$l = m THEN '$l'").mkString(" ")
        s"""WITH RECURSIVE t AS (SELECT doc_id, text, source, $ToksSql AS toks FROM documents),
           |sh0 AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM t),
           |sh1 AS (SELECT doc_id, $TokenFp60Sql AS tok FROM sh0),
           |sh AS (SELECT doc_id, tok FROM (
           |  SELECT doc_id, tok, count(*) OVER (PARTITION BY tok) AS df FROM sh1)
           |  WHERE df <= 100),
           |sizes AS (SELECT doc_id, count(*) AS n_tok FROM sh GROUP BY 1),
           |common AS (
           | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
           | FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
           | GROUP BY 1, 2),
           |pairs AS (
           | SELECT c.id_a, c.id_b FROM common c
           | JOIN sizes sa ON sa.doc_id = c.id_a
           | JOIN sizes sb ON sb.doc_id = c.id_b
           | WHERE CAST(c.common AS DOUBLE) / (sa.n_tok + sb.n_tok - c.common) >= 0.3),
           |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
           | UNION ALL SELECT id_b, id_a FROM pairs),
           |reach(src, dst) AS (
           | SELECT src, dst FROM e
           | UNION
           | SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
           |comp AS (SELECT src AS id, least(src, min(dst)) AS comp
           | FROM reach GROUP BY src),
           |h AS (SELECT *, $langHits FROM t),
           |g AS (SELECT *, $greatest AS m FROM h),
           |scored AS (SELECT doc_id, text, source,
           | ((((CASE WHEN length(text) BETWEEN 50 AND 10000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
           |  + (CASE WHEN $StopRatioSql > 0.01 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
           |  + (CASE WHEN $PunctRatioSql < 0.2 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
           |  + (CASE WHEN $AvgTokLenSql BETWEEN 2.0 AND 12.0 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)) AS quality,
           | CASE WHEN m = 0 THEN 'und' $langCase END AS lang,
           | len(toks) AS n_tokens
           |FROM g),
           |gated AS (SELECT * FROM scored WHERE quality >= 0.6 AND lang = 'en')
           |SELECT doc_id, source, quality, n_tokens FROM gated
           |WHERE doc_id NOT IN (SELECT id FROM comp WHERE id != comp)
           |ORDER BY doc_id""".stripMargin
      }),

    // ==================== deduplication ====================

    // exact dedup keyed on the low-cardinality `source` column so keeper /
    // dup-group semantics are exercised on real groups.
    "q_dedup_exact" -> Q(
      (s, d) => Dedup.exact(Tables.documents(s, d), "doc_id", "source")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(source) AS content_hash,
        | doc_id = min(doc_id) OVER (PARTITION BY md5(source)) AS is_keeper,
        | count(*) OVER (PARTITION BY md5(source)) AS dup_count
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Exact dedup on the NFC-NORMALIZED text: the canonicalize-before-
    //      hash composition the nfc_normalize expression exists for. Every
    //      doc gets a unicode suffix whose spelling alternates between the
    //      decomposed (e + U+0301) and precomposed (U+00E9) form by parity
    //      — raw md5 sees two variants per text, NFC-keyed dedup folds
    //      them (oracle: DuckDB's nfc_normalize, bit for bit).
    "q_dedup_normalized" -> Q(
      (s, d) => {
        graft.GraftExtensions.register(s)
        val variant = when(col("doc_id") % 3 === 0, lit(" caf\u00e9"))
          .otherwise(lit(" cafe\u0301"))
        val docs = docsP(s, d).select(col("doc_id"),
          concat(col("source"), variant).as("text_u"))
        val keyed = docs.withColumn("norm_hash",
          md5(graft.functions.TextNormalize.nfcNormalize(col("text_u"))))
        val agg = keyed.groupBy("norm_hash")
          .agg(min("doc_id").as("__keep"), count(lit(1)).as("dup_count"),
            countDistinct(md5(col("text_u"))).as("raw_variants"))
        keyed.join(agg.hint("shuffle_hash"), Seq("norm_hash"))
          .select(col("doc_id"), col("norm_hash"), col("dup_count"),
            col("raw_variants"),
            (col("doc_id") === col("__keep")).as("is_keeper"))
          .orderBy("doc_id")
      },
      Some(s"""WITH dv AS (SELECT doc_id,
        |  source || (CASE WHEN doc_id % 3 = 0 THEN ' caf' || chr(233)
        |    ELSE ' cafe' || chr(769) END) AS text_u FROM documents),
        |k AS (SELECT doc_id, text_u,
        |  md5(nfc_normalize(text_u)) AS norm_hash FROM dv),
        |a AS (SELECT norm_hash, min(doc_id) AS keep_id, count(*) AS dup_count,
        |  count(DISTINCT md5(text_u)) AS raw_variants FROM k GROUP BY 1)
        |SELECT k.doc_id, k.norm_hash, a.dup_count, a.raw_variants,
        |  k.doc_id = a.keep_id AS is_keeper
        |FROM k JOIN a USING (norm_hash) ORDER BY doc_id""".stripMargin)),

    // ---- Quality-aware keeper policy: within each duplicate group keep
    //      the BEST-quality exemplar (ties to min id) instead of the oldest
    //      — the policy layer clusterKeepersBy adds over any clustering.
    "q_dedup_keeper_quality" -> Q(
      (s, d) => {
        val docs = docsP(s, d).select(col("doc_id"),
          md5(col("source")).as("content_hash"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        Dedup.clusterKeepersBy(docs, col("doc_id"), col("content_hash"),
            col("quality"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${qualityLangCtes("documents")},
        |g AS (SELECT s.doc_id, md5(s.source) AS content_hash, s.quality,
        |  row_number() OVER (PARTITION BY md5(s.source)
        |    ORDER BY s.quality DESC, s.doc_id) AS rn
        |  FROM scored s)
        |SELECT doc_id, content_hash, quality FROM g
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // df <= 100 cut (maxTokenDf) mirrored on both engines: a single high-df
    // shingle would make one inverted-index bucket quadratic at scale, so the
    // flagship near-dup query runs with the skew lever ON, like the char
    // variant below.
    "q_dedup_jaccard" -> Q(
      (s, d) => Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
          threshold = 0.3, maxTokenDf = 100L, tokens = shingleSet)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |sh0 AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM t),
        |sh1 AS (SELECT doc_id, $TokenFp60Sql AS tok FROM sh0),
        |sh AS (SELECT doc_id, tok FROM (
        |  SELECT doc_id, tok, count(*) OVER (PARTITION BY tok) AS df FROM sh1)
        |  WHERE df <= 100),
        |${jaccardTailSql(0.3, "")}""".stripMargin)),

    // ---- Split-leakage audit: near-dup pairs that STRADDLE the
    //      train/valid/test hash split — the in-corpus train-test
    //      contamination check (a near-copy of a training doc in the eval
    //      split silently inflates eval). Same inverted-index pair
    //      generation; two split lookups and a fold.
    "q_dedup_split_leakage" -> Q(
      (s, d) => {
        import graft.operators.Sampling
        val docs = Tables.documents(s, d)
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          threshold = 0.3, maxTokenDf = 100L, tokens = shingleSet)
        val sp = docs.select(col("doc_id"),
          Sampling.split(col("doc_id"), 80, 10, salt = ":sp1").as("split"))
        pairs
          .join(sp.select(col("doc_id").as("id_a"), col("split").as("sa")), Seq("id_a"))
          .join(sp.select(col("doc_id").as("id_b"), col("split").as("sb")), Seq("id_b"))
          .filter(col("sa") =!= col("sb"))
          .select(least(col("sa"), col("sb")).as("split_a"),
            greatest(col("sa"), col("sb")).as("split_b"), col("jaccard"))
          .groupBy("split_a", "split_b")
          .agg(count(lit(1)).as("n_pairs"),
            round(max(col("jaccard")), 6).as("max_jaccard"))
          .orderBy("split_a", "split_b")
      },
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |sh0 AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM t),
        |sh1 AS (SELECT doc_id, $TokenFp60Sql AS tok FROM sh0),
        |sh AS (SELECT doc_id, tok FROM (
        |  SELECT doc_id, tok, count(*) OVER (PARTITION BY tok) AS df FROM sh1)
        |  WHERE df <= 100),
        |sizes AS (SELECT doc_id, count(*) AS n_tok FROM sh GROUP BY 1),
        |common AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
        | GROUP BY 1, 2),
        |jp AS (SELECT c.id_a, c.id_b,
        | CAST(c.common AS DOUBLE) / (sa.n_tok + sb.n_tok - c.common) AS jaccard
        | FROM common c
        | JOIN sizes sa ON sa.doc_id = c.id_a
        | JOIN sizes sb ON sb.doc_id = c.id_b
        | WHERE CAST(c.common AS DOUBLE) / (sa.n_tok + sb.n_tok - c.common) >= 0.3),
        |sp AS (SELECT doc_id, CASE
        |  WHEN ${fp60Sql("CAST(doc_id AS VARCHAR) || ':sp1'")} % 100 < 80 THEN 'train'
        |  WHEN ${fp60Sql("CAST(doc_id AS VARCHAR) || ':sp1'")} % 100 < 90 THEN 'valid'
        |  ELSE 'test' END AS split FROM documents)
        |SELECT least(pa.split, pb.split) AS split_a,
        | greatest(pa.split, pb.split) AS split_b,
        | CAST(count(*) AS BIGINT) AS n_pairs,
        | round(max(jp.jaccard), 6) AS max_jaccard
        |FROM jp JOIN sp pa ON pa.doc_id = jp.id_a
        | JOIN sp pb ON pb.doc_id = jp.id_b
        |WHERE pa.split != pb.split
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // character-5-gram variant of the jaccard near-dup (tokenization-robust
    // feature space for short/noisy text); tighter threshold because char
    // n-gram overlap runs higher than word-shingle overlap.
    "q_dedup_jaccard_char" -> Q(
      (s, d) => Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
          threshold = 0.62, maxTokenDf = 100L,
          tokens = t => array_distinct(TextFunctions.charShingles(t, 5)))
        .orderBy("id_a", "id_b"),
      // df <= 100 cut mirrors maxTokenDf: common 5-grams ("the q", " and ")
      // are dropped from candidate generation on BOTH engines, which is also
      // what keeps the inverted-index join near-linear at scale.
      Some(s"""WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents),
        |sh0 AS (SELECT doc_id, unnest(
        |  list_distinct(CASE WHEN length(lt) >= 5
        |   THEN list_transform(range(1, length(lt) - 3), i -> substr(lt, i, 5))
        |   ELSE [lt] END)) AS tok FROM t),
        |sh1 AS (SELECT doc_id, $TokenFp60Sql AS tok FROM sh0),
        |sh AS (SELECT doc_id, tok FROM (
        |  SELECT doc_id, tok, count(*) OVER (PARTITION BY tok) AS df FROM sh1)
        |  WHERE df <= 100),
        |${jaccardTailSql(0.62, "")}""".stripMargin)),

    // symmetric containment (common / min set size): flags sub-document
    // duplication — a quoted or embedded document scores ~1.0 here while its
    // jaccard against the larger container dilutes below any threshold.
    "q_dedup_containment" -> Q(
      (s, d) => Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
          threshold = 0.6, maxTokenDf = 100L, tokens = shingleSet)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |sh0 AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM t),
        |sh1 AS (SELECT doc_id, $TokenFp60Sql AS tok FROM sh0),
        |sh AS (SELECT doc_id, tok FROM (
        |  SELECT doc_id, tok, count(*) OVER (PARTITION BY tok) AS df FROM sh1)
        |  WHERE df <= 100),
        |${containmentTailSql(0.6)}""".stripMargin)),

    "q_dedup_minhash_lsh" -> Q(
      (s, d) => Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
          k = 32, rowsPerBand = 4, threshold = 0.3, tokens = shingleSet)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM t),
        |fp AS (SELECT doc_id, $TokenFingerprintSql AS x FROM sh),
        |sig AS (SELECT doc_id, $minhashMinsSql FROM fp GROUP BY doc_id),
        |bands AS (${minhashBandsSql(32, 4)}),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
        |${jaccardTailSql(0.3, "JOIN cand ON cand.id_a = c.id_a AND cand.id_b = c.id_b")}""".stripMargin)),

    // ---- ONE-PERMUTATION MinHash signatures (round 17): the OPH/
    //      densified variant — one bin hash + one permutation PER TOKEN
    //      EDGE instead of k permutation mins, empty bins filled by
    //      rotation with a t·P offset. The oracle rebuilds every slot:
    //      per-bin conditional mins into a k-array, then the same
    //      32-term coalesce rotation per slot. Signature-level (not
    //      pair-level) so a single slot's off-by-one fails loudly.
    "q_dedup_minhash_oph" -> Q(
      (s, d) => Dedup.minhashSigOph(Tables.documents(s, d), "doc_id", "text",
          k = 32, tokens = shingleSet)
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM t),
        |fp AS (SELECT doc_id, $TokenFingerprintSql AS x FROM sh),
        |${ophSigSql(32)}
        |SELECT * FROM sig ORDER BY doc_id""".stripMargin)),

    // ---- LSH recall/cost matrix (round 14 k-perm curve + round 17 OPH
    //      parity, merged round 18): for each signature family (k
    //      independent permutations vs one-permutation + rotation
    //      densification) and each (k, rowsPerBand) banding, the fraction
    //      of true >= 0.3-jaccard pairs the banded candidates recover and
    //      the candidate count — measured on the corpus, not assumed from
    //      the 1-(1-s^r)^b formula. The truth set (df-filtered all-pairs
    //      jaccard) dominates the cost and is family-independent, so the
    //      two per-family reports this gate replaces each paid it once for
    //      the same rows; here BOTH families read ONE shared truth.
    //      Narrower bands (4 rows x 8 bands) must recall at least as much
    //      as wider ones within each family; an operator switching the
    //      production signature build to OPH reads its rows against the
    //      k-permutation ones before committing.
    "q_dedup_lsh_recall_matrix" -> Q(
      (s, d) => Dedup.lshRecallMatrix(Tables.documents(s, d), "doc_id", "text",
          threshold = 0.3, configs = Seq((32, 4), (32, 8)),
          maxTokenDf = 100L, tokens = shingleSet,
          families = Seq(false, true))
        .orderBy("family", "rows_per_band"),
      Some {
        def candSql(b: String) =
          s"""SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM $b a JOIN $b b
             |  ON a.band = b.band AND a.band_hash = b.band_hash
             |    AND a.doc_id < b.doc_id""".stripMargin
        def rowSql(family: String, rpb: Int, cand: String) =
          s"""SELECT '$family' AS family, 32 AS k, $rpb AS rows_per_band,
             |  ${32 / rpb} AS n_bands,
             |  (SELECT n_true_pairs FROM tc) AS n_true_pairs,
             |  (SELECT count(*) FROM $cand) AS n_candidates,
             |  (SELECT count(*) FROM truth t JOIN $cand c
             |     ON t.id_a = c.id_a AND t.id_b = c.id_b) AS n_recovered,
             |  CASE WHEN (SELECT n_true_pairs FROM tc) > 0
             |    THEN CAST((SELECT count(*) FROM truth t JOIN $cand c
             |        ON t.id_a = c.id_a AND t.id_b = c.id_b) AS DOUBLE)
             |      / CAST((SELECT n_true_pairs FROM tc) AS DOUBLE) END AS recall""".stripMargin
        s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |sh0 AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM t),
        |sh1 AS (SELECT doc_id, $TokenFp60Sql AS tok FROM sh0),
        |jt AS (SELECT doc_id, tok FROM (
        |  SELECT doc_id, tok, count(*) OVER (PARTITION BY tok) AS df FROM sh1)
        |  WHERE df <= 100),
        |sizes AS (SELECT doc_id, count(*) AS n_tok FROM jt GROUP BY 1),
        |common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM jt a JOIN jt b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |truth AS (SELECT c.id_a, c.id_b FROM common c
        |  JOIN sizes sa ON sa.doc_id = c.id_a
        |  JOIN sizes sb ON sb.doc_id = c.id_b
        |  WHERE CAST(c.common AS DOUBLE) / (sa.n_tok + sb.n_tok - c.common)
        |    >= CAST(0.3 AS DOUBLE)),
        |tc AS (SELECT count(*) AS n_true_pairs FROM truth),
        |fp AS (SELECT doc_id, $TokenFingerprintSql AS x FROM sh0),
        |sig AS (SELECT doc_id, $minhashMinsSql FROM fp GROUP BY doc_id),
        |kbands4 AS (${minhashBandsSql(32, 4)}),
        |kcand4 AS (${candSql("kbands4")}),
        |kbands8 AS (${minhashBandsSql(32, 8)}),
        |kcand8 AS (${candSql("kbands8")}),
        |${ophSigSql(32, "sigo")},
        |obands4 AS (${minhashBandsSql(32, 4, from = "sigo")}),
        |ocand4 AS (${candSql("obands4")}),
        |obands8 AS (${minhashBandsSql(32, 8, from = "sigo")}),
        |ocand8 AS (${candSql("obands8")})
        |${rowSql("kperm", 4, "kcand4")}
        |UNION ALL
        |${rowSql("kperm", 8, "kcand8")}
        |UNION ALL
        |${rowSql("oph", 4, "ocand4")}
        |UNION ALL
        |${rowSql("oph", 8, "ocand8")}
        |ORDER BY family, rows_per_band""".stripMargin
      }),

    // ---- Incremental dedup: a new batch (doc_id % 20 = 0) deduped against
    //      the already-ingested corpus (the rest) — the production shape:
    //      the corpus is already deduped; only the increment is hashed and
    //      the corpus side is an index probe. Exact variant emits the
    //      batch's survivors; the LSH variant emits matched (new, corpus)
    //      near-dup pairs for the caller to anti-join.
    "q_dedup_exact_increment" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.exactIncrement(
            docs.filter(pmod(col("doc_id"), lit(20)) === 0),
            docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
            "doc_id", "text")
          .orderBy("doc_id")
      },
      Some("""WITH nw AS (SELECT doc_id, md5(text) AS content_hash
        |  FROM documents WHERE doc_id % 20 = 0),
        |f AS (SELECT doc_id, content_hash,
        |  min(doc_id) OVER (PARTITION BY content_hash) AS first_id FROM nw)
        |SELECT doc_id, content_hash FROM f
        |WHERE doc_id = first_id
        | AND NOT EXISTS (SELECT 1 FROM documents c
        |   WHERE c.doc_id % 20 <> 0 AND md5(c.text) = f.content_hash)
        |ORDER BY doc_id""".stripMargin)),

    // Bloom-gated exact increment: must be row-identical to the plain
    // anti-join formulation (no false negatives ⇒ the gate shares
    // q_dedup_exact_increment's oracle verbatim) while only the
    // might-contain fraction ever reaches the corpus-sized shuffle.
    "q_dedup_bloom_increment" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.exactIncrementBloomGated(
            docs.filter(pmod(col("doc_id"), lit(20)) === 0),
            docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
            "doc_id", "text", numBits = BloomBits, k = BloomK)
          .orderBy("doc_id")
      },
      Some("""WITH nw AS (SELECT doc_id, md5(text) AS content_hash
        |  FROM documents WHERE doc_id % 20 = 0),
        |f AS (SELECT doc_id, content_hash,
        |  min(doc_id) OVER (PARTITION BY content_hash) AS first_id FROM nw)
        |SELECT doc_id, content_hash FROM f
        |WHERE doc_id = first_id
        | AND NOT EXISTS (SELECT 1 FROM documents c
        |   WHERE c.doc_id % 20 <> 0 AND md5(c.text) = f.content_hash)
        |ORDER BY doc_id""".stripMargin)),

    // Bloom-gated increment probe: the broadcast bit-array pre-filter that
    // lets a 100 TB ingest skip the exact anti-join for definitely-new
    // documents. Same 1-in-20 increment split as q_dedup_exact_increment;
    // output carries both the filter's answer and exact membership, so the
    // gate also hash-pins the no-false-negative property (is_member=true
    // rows must all say might_contain=true) and the measured FP set.
    "q_dedup_bloom_probe" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val corpus = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
          .select(md5(col("text")).as("key")).distinct()
        val filter = Bloom.build(corpus, col("key"), BloomBits, BloomK)
        val probe = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
          .select(col("doc_id"), md5(col("text")).as("key"))
        Bloom.mightContain(probe, col("key"), filter, BloomBits, BloomK,
            "might_contain")
          .join(corpus.withColumn("is_member", lit(true)), Seq("key"), "left")
          .select(col("doc_id"), col("might_contain"),
            coalesce(col("is_member"), lit(false)).as("is_member"))
          .orderBy("doc_id")
      },
      Some(s"""WITH corpus AS (SELECT DISTINCT md5(text) AS key
        |  FROM documents WHERE doc_id % 20 <> 0),
        |sd AS (SELECT key, ${bloomPosSql} AS p
        |  FROM corpus CROSS JOIN range($BloomK) t(s)),
        |words AS (SELECT CAST(floor(p / 32) AS BIGINT) AS word,
        |  bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS bits
        |  FROM sd GROUP BY 1),
        |probe AS (SELECT doc_id, md5(text) AS key
        |  FROM documents WHERE doc_id % 20 = 0),
        |pp AS (SELECT doc_id, key, ${bloomPosSql} AS p
        |  FROM probe CROSS JOIN range($BloomK) t(s)),
        |hit AS (SELECT doc_id, key,
        |  bool_and((coalesce(bits, 0) &
        |      (CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER))) =
        |    (CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER))) AS might_contain
        |  FROM pp LEFT JOIN words
        |    ON CAST(floor(p / 32) AS BIGINT) = words.word
        |  GROUP BY doc_id, key)
        |SELECT doc_id, might_contain,
        | key IN (SELECT key FROM corpus) AS is_member
        |FROM hit ORDER BY doc_id""".stripMargin)),

    "q_dedup_lsh_increment" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.minhashLshIncrement(
            docs.filter(pmod(col("doc_id"), lit(20)) === 0),
            docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
            "doc_id", "text", k = 32, rowsPerBand = 4, threshold = 0.3,
            tokens = shingleSet)
          .orderBy("id_new", "id_corpus")
      },
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |sh0 AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM t),
        |fp AS (SELECT doc_id, $TokenFingerprintSql AS x FROM sh0),
        |sig AS (SELECT doc_id, $minhashMinsSql FROM fp GROUP BY doc_id),
        |bands AS (${minhashBandsSql(32, 4)}),
        |cand AS (SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_corpus
        |  FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_hash = b.band_hash
        |  WHERE a.doc_id % 20 = 0 AND b.doc_id % 20 <> 0),
        |sizes AS (SELECT doc_id, count(*) AS n_tok FROM sh0 GROUP BY 1),
        |common AS (SELECT c.id_new, c.id_corpus, count(*) AS common
        |  FROM cand c JOIN sh0 a ON a.doc_id = c.id_new
        |   JOIN sh0 b ON b.doc_id = c.id_corpus AND b.tok = a.tok
        |  GROUP BY 1, 2)
        |SELECT m.id_new, m.id_corpus,
        | CAST(m.common AS DOUBLE) / (sa.n_tok + sb.n_tok - m.common) AS jaccard
        |FROM common m
        | JOIN sizes sa ON sa.doc_id = m.id_new
        | JOIN sizes sb ON sb.doc_id = m.id_corpus
        |WHERE jaccard >= 0.3 ORDER BY 1, 2""".stripMargin)),

    // ---- CCNet-style CROSS-document line dedup: the corpus has no newlines,
    //      so both engines first build deterministic multi-line "pages"
    //      (25 pages, lines ordered by doc_id; every doc_id % 3 == 0 doc
    //      contributes a shared boilerplate footer line, the rest their
    //      8-token prefix). Global first-occurrence selection is a
    //      partial-agg min(struct) groupBy on the Spark side — no window or
    //      join over the zipfian line key (see operators.Lines).
    "q_dedup_lines_global" -> Q(
      (s, d) => Lines.dedupLinesAcrossDocs(linePages(s, d), "page_id", "text")
        .select(col("page_id"), md5(col("text")).as("text_md5"),
          col("n_lines"), col("n_kept"))
        .orderBy("page_id"),
      Some(s"""WITH $LinePagesSql,
        |keep AS (SELECT page_id, idx, line FROM ls
        |  QUALIFY row_number() OVER (PARTITION BY line ORDER BY page_id, idx) = 1),
        |reb AS (SELECT page_id, count(*) AS n_kept,
        |  md5(string_agg(line, chr(10) ORDER BY idx)) AS text_md5
        |  FROM keep GROUP BY 1),
        |base AS (SELECT page_id, len(list_filter(string_split(text, chr(10)),
        |  l -> length(trim(l)) > 0)) AS n_lines FROM pages)
        |SELECT b.page_id, coalesce(r.text_md5, md5('')) AS text_md5,
        |  b.n_lines, coalesce(r.n_kept, 0) AS n_kept
        |FROM base b LEFT JOIN reb r USING (page_id) ORDER BY page_id""".stripMargin)),

    // C4-style frequency-threshold boilerplate removal over the same pages:
    // every occurrence of a line seen in >= 5 distinct pages is cut
    // everywhere (the footer dies corpus-wide; one-page lines survive). The
    // Spark side broadcasts the small heavy set and anti-joins — the
    // occurrence frame is never shuffled on the line key.
    "q_dedup_lines_boilerplate" -> Q(
      (s, d) => Lines.dropBoilerplate(linePages(s, d), "page_id", "text", minDocs = 5)
        .select(col("page_id"), md5(col("text")).as("text_md5"),
          col("n_lines"), col("n_removed"))
        .orderBy("page_id"),
      Some(s"""WITH $LinePagesSql,
        |hv AS (SELECT line FROM ls GROUP BY line
        |  HAVING count(DISTINCT page_id) >= 5),
        |keep AS (SELECT page_id, idx, line FROM ls
        |  WHERE line NOT IN (SELECT line FROM hv)),
        |reb AS (SELECT page_id, count(*) AS n_kept,
        |  md5(string_agg(line, chr(10) ORDER BY idx)) AS text_md5
        |  FROM keep GROUP BY 1),
        |base AS (SELECT page_id, len(list_filter(string_split(text, chr(10)),
        |  l -> length(trim(l)) > 0)) AS n_lines FROM pages)
        |SELECT b.page_id, coalesce(r.text_md5, md5('')) AS text_md5,
        |  b.n_lines, b.n_lines - coalesce(r.n_kept, 0) AS n_removed
        |FROM base b LEFT JOIN reb r USING (page_id) ORDER BY page_id""".stripMargin)),

    // ---- C4 rule cleaning (Raffel et al. 2020 §2.2): line rules (terminal
    //      punctuation, >= 5 words, javascript / policy-phrase screens) and
    //      doc verdicts (brace page, lorem ipsum, >= 3 sentence enders in
    //      the CLEANED text) over synthetic multi-line pages built from the
    //      word soup (7 rule-exercising lines per doc; every 7th doc gets a
    //      lorem line, every 11th a brace line). Entirely scan-stage Column
    //      trees — zero shuffles at any corpus size.
    "q_text_c4_rules" -> Q(
      (s, d) => {
        val words = split(col("text"), " ")
        def line(start: Int, len: Int, tail: String) =
          concat(array_join(slice(words, start, len), " "), lit(tail))
        val page = concat(
          concat_ws("\n",
            line(1, 6, "."),
            line(7, 3, "."),
            lit("please enable javascript to view this page."),
            lit("we use cookies; see our privacy policy for details."),
            line(10, 7, ""),
            line(4, 8, " done!"),
            line(12, 7, " right?")),
          when(col("doc_id") % 7 === 0,
            lit("\nlorem ipsum dolor sit amet consectetur elite prose."))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit("\nif (x) { return y; } this line is code chrome."))
            .otherwise(lit("")))
        Lines.c4Clean(docsP(s, d).select(col("doc_id"), page.as("text")),
            "doc_id", "text")
          .select(col("doc_id"), col("keep_doc"), col("n_lines"), col("n_kept"),
            col("n_sentences"), md5(col("text")).as("clean_md5"))
          .orderBy("doc_id")
      },
      Some(s"""WITH pg AS (SELECT doc_id,
        |  concat(
        |    concat_ws(chr(10),
        |      coalesce(array_to_string(list_slice(string_split(text,' '),1,6),' '),'') || '.',
        |      coalesce(array_to_string(list_slice(string_split(text,' '),7,9),' '),'') || '.',
        |      'please enable javascript to view this page.',
        |      'we use cookies; see our privacy policy for details.',
        |      coalesce(array_to_string(list_slice(string_split(text,' '),10,16),' '),''),
        |      coalesce(array_to_string(list_slice(string_split(text,' '),4,11),' '),'') || ' done!',
        |      coalesce(array_to_string(list_slice(string_split(text,' '),12,18),' '),'') || ' right?'),
        |    CASE WHEN doc_id % 7 = 0
        |      THEN chr(10) || 'lorem ipsum dolor sit amet consectetur elite prose.'
        |      ELSE '' END,
        |    CASE WHEN doc_id % 11 = 0
        |      THEN chr(10) || 'if (x) { return y; } this line is code chrome.'
        |      ELSE '' END) AS t0
        |  FROM documents),
        |f AS (SELECT doc_id, t0,
        |  list_transform(list_filter(string_split(t0, chr(10)), s ->
        |    regexp_matches(trim(s), '[.!?"]$$')
        |    AND len(string_split_regex(trim(s), '\\s+')) >= 5
        |    AND NOT contains(lower(trim(s)), 'javascript')
        |    AND NOT contains(lower(trim(s)), 'terms of use')
        |    AND NOT contains(lower(trim(s)), 'privacy policy')
        |    AND NOT contains(lower(trim(s)), 'cookie policy')
        |    AND NOT contains(lower(trim(s)), 'uses cookies')
        |    AND NOT contains(lower(trim(s)), 'use of cookies')
        |    AND NOT contains(lower(trim(s)), 'use cookies')
        |  ), s -> trim(s)) AS kept,
        |  len(list_filter(string_split(t0, chr(10)),
        |    l -> length(trim(l)) > 0)) AS n_lines
        |  FROM pg),
        |g AS (SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  coalesce(array_to_string(kept, chr(10)), '') AS ct, t0 FROM f),
        |h AS (SELECT doc_id, n_lines, n_kept,
        |  CAST(length(regexp_replace(ct, '[^.!?]', '', 'g')) AS BIGINT)
        |    AS n_sentences, ct, t0 FROM g)
        |SELECT doc_id,
        |  (NOT contains(t0,'{') AND NOT contains(lower(t0),'lorem ipsum')
        |    AND n_sentences >= 3) AS keep_doc,
        |  n_lines, n_kept, n_sentences, md5(ct) AS clean_md5
        |FROM h ORDER BY doc_id""".stripMargin)),

    // ---- Fence-aware C4 cleaning (round 16): the code-corpus variant —
    //      ``` fenced blocks and $...$ math lines are PROTECTED from the
    //      line rules (kept verbatim, indentation intact), the `{` flag
    //      fires only on unprotected lines, and the sentence floor judges
    //      only the unprotected prose. Fixtures embed a brace-bearing
    //      fenced example (must survive + not flag the doc), a math line,
    //      the standard chrome lines (must still be cut), and per-modulus
    //      lorem-ipsum / UNFENCED-brace tails (must still flag).
    "q_text_c4_code_aware" -> Q(
      (s, d) => {
        val words = split(col("text"), " ")
        def line(start: Int, len: Int, tail: String) =
          concat(array_join(slice(words, start, len), " "), lit(tail))
        val page = concat(
          concat_ws("\n",
            line(1, 6, "."),
            lit("```scala"),
            lit("def f(x) = {"),
            lit("  x + 1"),
            lit("}"),
            lit("```"),
            line(7, 7, "."),
            lit("the energy balance is $E = mc^2$ here"),
            lit("$$$ BUY NOW $$$ prices start from $5 and $10 here."),
            lit("please enable javascript to view this page."),
            lit("we use cookies; see our privacy policy for details."),
            line(3, 7, " right?")),
          when(col("doc_id") % 7 === 0,
            lit("\nlorem ipsum dolor sit amet consectetur elite prose."))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit("\nif (x) { return y; } outside any fence."))
            .otherwise(lit("")))
        Lines.c4CleanCodeAware(
            docsP(s, d).select(col("doc_id"), page.as("text")),
            "doc_id", "text")
          .select(col("doc_id"), col("keep_doc"), col("n_lines"),
            col("n_kept"), col("n_protected"), col("n_sentences"),
            md5(col("text")).as("clean_md5"))
          .orderBy("doc_id")
      },
      Some(s"""WITH pg AS (SELECT doc_id,
        |  concat(
        |    concat_ws(chr(10),
        |      coalesce(array_to_string(list_slice(string_split(text,' '),1,6),' '),'') || '.',
        |      '```scala',
        |      'def f(x) = ' || chr(123),
        |      '  x + 1',
        |      chr(125),
        |      '```',
        |      coalesce(array_to_string(list_slice(string_split(text,' '),7,13),' '),'') || '.',
        |      'the energy balance is $$E = mc^2$$ here',
        |      '$$$$$$ BUY NOW $$$$$$ prices start from $$5 and $$10 here.',
        |      'please enable javascript to view this page.',
        |      'we use cookies; see our privacy policy for details.',
        |      coalesce(array_to_string(list_slice(string_split(text,' '),3,9),' '),'') || ' right?'),
        |    CASE WHEN doc_id % 7 = 0
        |      THEN chr(10) || 'lorem ipsum dolor sit amet consectetur elite prose.'
        |      ELSE '' END,
        |    CASE WHEN doc_id % 11 = 0
        |      THEN chr(10) || 'if (x) ' || chr(123) || ' return y; ' || chr(125) || ' outside any fence.'
        |      ELSE '' END) AS t0
        |  FROM documents),
        |lx AS (SELECT doc_id, t0, string_split(t0, chr(10)) AS ls FROM pg),
        |mk AS (SELECT doc_id, t0, ls, list_transform(ls, s ->
        |    CASE WHEN starts_with(trim(s), '```') THEN 1 ELSE 0 END) AS m
        |  FROM lx),
        |dc AS (SELECT doc_id, t0, ls, list_transform(ls, (s, i) -> {
        |    'line': s,
        |    'prot': (coalesce(list_sum(m[1:i-1]), 0) % 2 = 1)
        |      OR starts_with(trim(s), '```')
        |      OR regexp_matches(s, '\\$$[^$$\\s](?:[^$$]*[^$$\\s])?\\$$'),
        |    'ok': regexp_matches(trim(s), '[.!?"]$$')
        |      AND len(string_split_regex(trim(s), '\\s+')) >= 5
        |      AND NOT contains(lower(trim(s)), 'javascript')
        |      AND NOT contains(lower(trim(s)), 'terms of use')
        |      AND NOT contains(lower(trim(s)), 'privacy policy')
        |      AND NOT contains(lower(trim(s)), 'cookie policy')
        |      AND NOT contains(lower(trim(s)), 'uses cookies')
        |      AND NOT contains(lower(trim(s)), 'use of cookies')
        |      AND NOT contains(lower(trim(s)), 'use cookies')
        |  }) AS dec FROM mk),
        |kv AS (SELECT doc_id, t0, ls,
        |  list_transform(dec, x -> CASE WHEN x.prot THEN x.line
        |    WHEN x.ok THEN trim(x.line) END) AS keptv,
        |  dec FROM dc),
        |ag AS (SELECT doc_id,
        |  CAST(len(list_filter(ls, l -> length(trim(l)) > 0)) AS BIGINT)
        |    AS n_lines,
        |  CAST(len(list_filter(keptv, k -> k IS NOT NULL)) AS BIGINT)
        |    AS n_kept,
        |  CAST(len(list_filter(dec, x -> x.prot)) AS BIGINT) AS n_protected,
        |  coalesce(array_to_string(
        |    list_filter(keptv, k -> k IS NOT NULL), chr(10)), '') AS ct,
        |  coalesce(array_to_string(list_transform(
        |    list_filter(dec, x -> (NOT x.prot) AND x.ok),
        |    x -> trim(x.line)), chr(10)), '') AS prose_ct,
        |  len(list_filter(dec, x -> (NOT x.prot)
        |    AND contains(x.line, chr(123)))) > 0 AS brace,
        |  contains(lower(t0), 'lorem ipsum') AS lorem
        |  FROM kv),
        |fin AS (SELECT doc_id, n_lines, n_kept, n_protected,
        |  CAST(length(regexp_replace(prose_ct, '[^.!?]', '', 'g')) AS BIGINT)
        |    AS n_sentences, ct, brace, lorem FROM ag)
        |SELECT doc_id,
        |  (NOT brace AND NOT lorem AND n_sentences >= 3) AS keep_doc,
        |  n_lines, n_kept, n_protected, n_sentences, md5(ct) AS clean_md5
        |FROM fin ORDER BY doc_id""".stripMargin)),

    // cross-document repeated-span dedup (C4 / Lee et al. substring family):
    // maximal token spans whose 8-token shingles appear in >= 2 documents.
    // Positions are 1-based inclusive token indices; flagged shingle starts
    // <= k apart merge into one span. The oracle mirrors the fp60 shingle
    // arithmetic and the same lag/cumsum islands formulation.
    "q_dedup_spans" -> Q(
      (s, d) => Dedup.duplicateSpans(Tables.documents(s, d), "doc_id", "text",
          k = SpanK)
        .orderBy("doc_id", "span_start"),
      Some("WITH " + spanCteChain(SpanK, "", DupSharedCte) + "\n" + SpanSelectTail)),

    // the REWRITE the span frame motivates (aggressive C4-style boilerplate
    // strip): every token covered by a cross-document duplicated span is cut
    // from EVERY document — navigation chrome / license text disappears
    // corpus-wide. The gate hashes the rewritten text.
    "q_dedup_spans_cut" -> Q(
      (s, d) => Dedup.cutSpans(Tables.documents(s, d), "doc_id", "text",
          k = SpanK)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
          md5(col("text")).as("clean_md5"))
        .orderBy("doc_id"),
      Some("WITH " + spanCteChain(SpanK, "", DupSharedCte) + ",\n" + spanCutTail(""))),

    // SPAN-level decontamination (the surgical variant of q_decontaminate):
    // WHERE the corpus quotes the benchmark, and the rewrite that removes
    // the quoted passage while keeping the document. Same doc_id % 20 split
    // and shingleK = 3 as the document-level gates.
    "q_decontaminate_spans" -> Q(
      (s, d) => {
        import graft.operators.Decontaminate
        val docs = Tables.documents(s, d)
        Decontaminate.contaminatedSpans(
            docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
            docs.filter(pmod(col("doc_id"), lit(20)) === 0),
            "doc_id", "text", shingleK = 3)
          .orderBy("doc_id", "span_start")
      },
      Some("WITH " + spanCteChain(3, "doc_id % 20 != 0", benchSharedCte(3)) +
        "\n" + SpanSelectTail)),

    "q_decontaminate_spans_cut" -> Q(
      (s, d) => {
        import graft.operators.Decontaminate
        val docs = Tables.documents(s, d)
        Decontaminate.cutContaminated(
            docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
            docs.filter(pmod(col("doc_id"), lit(20)) === 0),
            "doc_id", "text", shingleK = 3)
          .select(col("doc_id"), col("n_tokens"), col("n_removed"),
            md5(col("text")).as("clean_md5"))
          .orderBy("doc_id")
      },
      Some("WITH " + spanCteChain(3, "doc_id % 20 != 0", benchSharedCte(3)) +
        ",\n" + spanCutTail("doc_id % 20 != 0"))),

    // ---- SEMANTIC decontamination: embedding-cosine proximity to the
    //      benchmark set (vec_id % 20 == 0) — catches paraphrased benchmark
    //      copies n-gram overlap misses. The bounded bench set is broadcast;
    //      the per-vector max partial-aggregates before the one unique-id
    //      shuffle; ties break to the smallest bench id on both engines.
    "q_decontaminate_semantic" -> Q(
      (s, d) => {
        import graft.operators.Decontaminate
        val e = Tables.embeddings(s, d)
        Decontaminate.semanticFlags(
            e.filter(pmod(col("vec_id"), lit(20)) =!= 0), "vec_id", "embedding",
            e.filter(pmod(col("vec_id"), lit(20)) === 0), "vec_id", "embedding",
            threshold = 0.3)
          .orderBy("vec_id")
      },
      Some(s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 20 != 0),
        |b AS (SELECT vec_id AS bench_id, CAST(embedding AS DOUBLE[]) AS bv
        |  FROM embeddings WHERE vec_id % 20 = 0),
        |sc AS (SELECT c.vec_id, b.bench_id, ${cosSql("c.v", "b.bv")} AS cosine
        |  FROM c, b),
        |r AS (SELECT vec_id, bench_id, cosine, row_number() OVER
        |  (PARTITION BY vec_id ORDER BY cosine DESC, bench_id) AS rn FROM sc)
        |SELECT vec_id, bench_id AS nearest_bench_id, cosine AS max_cosine,
        |  cosine >= CAST(0.3 AS DOUBLE) AS is_contaminated
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin)),

    // the IVF-pruned variant at nProbe = nLists over deterministic
    // exact-mean centroids (the q_dedup_semantic trick): every cell is
    // probed, so the output equals the exact gate row for row — the same
    // exact-twin pattern as q_sim_topk_ivf_exact. At production scale
    // nProbe << nLists prunes the scored pairs to the neighbor cells.
    "q_decontaminate_semantic_ivf" -> Q(
      (s, d) => {
        import graft.operators.{Centroids, Decontaminate, Similarity}
        val e = Tables.embeddings(s, d)
        val corpus = e.filter(pmod(col("vec_id"), lit(20)) =!= 0)
        val bench = e.filter(pmod(col("vec_id"), lit(20)) === 0)
        val c = corpus.select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"),
          pmod(Dedup.tokenFp60(concat(col("vec_id").cast("string"), lit(":sd1"))),
            lit(8L)).as("cell0"))
        val cents = c.groupBy("cell0").agg(
            array((1 to 64).map(i =>
              Centroids.exactDimMean(col("vec_id"), element_at(col("v"), i))): _*)
              .as("centroid"))
          .select(col("cell0").as("cell"), col("centroid"))
        val assigned = Similarity.assignCells(
          corpus.select(col("vec_id").as("nbr_id"),
            col("embedding").cast("array<double>").as("nbr_v")), cents)
        Decontaminate.semanticFlagsIvf(Similarity.IvfIndex(assigned, cents),
            bench, "vec_id", "embedding", threshold = 0.3, nProbe = 8)
          .orderBy("vec_id")
      },
      Some(s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 20 != 0),
        |b AS (SELECT vec_id AS bench_id, CAST(embedding AS DOUBLE[]) AS bv
        |  FROM embeddings WHERE vec_id % 20 = 0),
        |sc AS (SELECT c.vec_id, b.bench_id, ${cosSql("c.v", "b.bv")} AS cosine
        |  FROM c, b),
        |r AS (SELECT vec_id, bench_id, cosine, row_number() OVER
        |  (PARTITION BY vec_id ORDER BY cosine DESC, bench_id) AS rn FROM sc)
        |SELECT vec_id, bench_id AS nearest_bench_id, cosine AS max_cosine,
        |  cosine >= CAST(0.3 AS DOUBLE) AS is_contaminated
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin)),

    "q_dedup_simhash_sig" -> Q(
      (s, d) => Dedup.simhash(Tables.documents(s, d), "doc_id", "text",
          tokens = shingleSet)
        .orderBy("doc_id"),
      Some(s"""$SimhashSigCte
        |SELECT doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin)),

    "q_dedup_simhash_pairs" -> Q(
      (s, d) => Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
          maxHamming = 16, tokens = shingleSet)
        .orderBy("id_a", "id_b"),
      Some(s"""$SimhashSigCte,
        |bands AS (SELECT doc_id, simhash, b.band,
        |  substr(simhash, 1 + 4 * b.band, 4) AS bh
        |  FROM sig, (SELECT unnest(range(0, 4)) AS band) b),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, a.simhash AS sig_a,
        |  b2.doc_id AS id_b, b2.simhash AS sig_b
        |  FROM bands a JOIN bands b2
        |  ON a.band = b2.band AND a.bh = b2.bh AND a.doc_id < b2.doc_id)
        |SELECT id_a, id_b, ($HammingSql) AS hamming
        |FROM cand WHERE hamming <= 16 ORDER BY id_a, id_b""".stripMargin)),

    // components over the jaccard near-dup graph: cluster label = min doc id
    // reachable through pairs; oracle walks the same closure with a
    // recursive CTE.
    "q_dedup_components" -> Q(
      (s, d) => Dedup.connectedComponents(
          Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
            threshold = 0.3, maxTokenDf = 100L, tokens = shingleSet))
        .orderBy("id"),
      Some(s"""WITH RECURSIVE t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |sh0 AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM t),
        |sh1 AS (SELECT doc_id, $TokenFp60Sql AS tok FROM sh0),
        |sh AS (SELECT doc_id, tok FROM (
        |  SELECT doc_id, tok, count(*) OVER (PARTITION BY tok) AS df FROM sh1)
        |  WHERE df <= 100),
        |sizes AS (SELECT doc_id, count(*) AS n_tok FROM sh GROUP BY 1),
        |common AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
        | GROUP BY 1, 2),
        |pairs AS (
        | SELECT c.id_a, c.id_b
        | FROM common c
        | JOIN sizes sa ON sa.doc_id = c.id_a
        | JOIN sizes sb ON sb.doc_id = c.id_b
        | WHERE CAST(c.common AS DOUBLE) / (sa.n_tok + sb.n_tok - c.common) >= 0.3),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        | SELECT src, dst FROM edges
        | UNION
        | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (SELECT src AS id, least(src, min(dst)) AS comp
        | FROM reach GROUP BY src)
        |SELECT id, comp, id = comp AS is_keeper FROM comp ORDER BY id""".stripMargin)),

    // ---- INCREMENTAL components against the same oracle: the near-dup
    //      pairs are hash-split ~80/20 into a "landed corpus" and an
    //      "ingest batch"; the Spark side labels the base then folds the
    //      increment in via componentsIncrement (projected increment graph,
    //      zero corpus shuffles). Edge delivery order must not matter, so
    //      the oracle is the SAME full-union recursive CTE the batch gate
    //      uses — incremental ≡ batch, bit for bit.
    "q_dedup_components_increment" -> Q(
      (s, d) => {
        // the pair frame feeds two branches (base labeling + increment);
        // materialize it once or the whole jaccard pipeline runs twice
        val pairs = Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
            threshold = 0.3, maxTokenDf = 100L, tokens = shingleSet)
          .select("id_a", "id_b")
          .gatePersist()
        pairs.count()
        val split = graft.operators.Sampling.hashBucket(
          concat_ws(":", col("id_a"), col("id_b")), 100, "cinc") < 80
        Dedup.componentsIncrement(
            Dedup.connectedComponents(pairs.filter(split)),
            pairs.filter(!split))
          .orderBy("id")
      },
      Some(s"""WITH RECURSIVE t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |sh0 AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM t),
        |sh1 AS (SELECT doc_id, $TokenFp60Sql AS tok FROM sh0),
        |sh AS (SELECT doc_id, tok FROM (
        |  SELECT doc_id, tok, count(*) OVER (PARTITION BY tok) AS df FROM sh1)
        |  WHERE df <= 100),
        |sizes AS (SELECT doc_id, count(*) AS n_tok FROM sh GROUP BY 1),
        |common AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
        | GROUP BY 1, 2),
        |pairs AS (
        | SELECT c.id_a, c.id_b
        | FROM common c
        | JOIN sizes sa ON sa.doc_id = c.id_a
        | JOIN sizes sb ON sb.doc_id = c.id_b
        | WHERE CAST(c.common AS DOUBLE) / (sa.n_tok + sb.n_tok - c.common) >= 0.3),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        | SELECT src, dst FROM edges
        | UNION
        | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (SELECT src AS id, least(src, min(dst)) AS comp
        | FROM reach GROUP BY src)
        |SELECT id, comp, id = comp AS is_keeper FROM comp ORDER BY id""".stripMargin)),

    "q_dedup_embedding" -> Q(
      (s, d) => Dedup.embeddingNearDup(Tables.embeddings(s, d), "vec_id",
          "embedding", threshold = 0.35, bucketBits = 8, dim = 64)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |  ${bucketSql("CAST(embedding AS DOUBLE[])", 8, 64)} AS bucket
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
        | ${cosSql("a.v", "b2.v")} AS cosine
        |FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
        |WHERE cosine >= 0.35 ORDER BY id_a, id_b""".stripMargin)),

    // ---- SemDeDup: centroid-cell-local cosine near-dup, duplicate groups
    //      via connected components, keeper = farthest-from-centroid. The
    //      gate's centroids are exact per-hash-bucket dimension means so
    //      the whole chain (assignment min_by, cell-local pairs, recursive
    //      components, keeper window) is bit-mirrorable; production trains
    //      them with k-means (see SimilaritySpec's recall case).
    "q_dedup_semantic" -> Q(
      (s, d) => {
        import graft.operators.Centroids
        val e = Tables.embeddings(s, d).select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"),
          pmod(Dedup.tokenFp60(concat(col("vec_id").cast("string"), lit(":sc1"))),
            lit(8L)).as("cell0"))
        val cents = e.groupBy("cell0").agg(
            array((1 to 64).map(i =>
              Centroids.exactDimMean(col("vec_id"), element_at(col("v"), i))): _*)
              .as("centroid"))
          .select(col("cell0").as("cell"), col("centroid"))
        Dedup.semanticDedup(e, "vec_id", "v", cents, threshold = 0.35)
          .orderBy("vec_id")
      },
      Some {
        val lists = (1 to 64)
          .map(i => s"list(v[$i] ORDER BY vec_id) AS l$i").mkString(", ")
        val dims = (1 to 64)
          .map(i => s"list_dot_product(l$i, list_transform(l$i, x -> 1.0)) / len(l$i)")
          .mkString(", ")
        s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |  ${fp60Sql("CAST(vec_id AS VARCHAR) || ':sc1'")} % 8 AS cell0
        |  FROM embeddings),
        |g AS (SELECT cell0, $lists FROM e GROUP BY cell0),
        |c AS (SELECT cell0 AS cell, [$dims] AS centroid FROM g),
        |asg0 AS (SELECT e.vec_id, e.v, c.cell,
        |  ${d2Sql("e.v", "c.centroid")} AS d2 FROM e CROSS JOIN c),
        |asg AS (SELECT vec_id, v, cell, d2 FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell)
        |    AS rn FROM asg0) WHERE rn = 1),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM asg a JOIN asg b
        |  ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE ${cosSql("a.v", "b.v")} >= CAST(0.35 AS DOUBLE)),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(src, dst) AS (SELECT src, dst FROM edges
        |  UNION SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src),
        |comp AS (SELECT src AS id, least(src, min(dst)) AS comp
        |  FROM reach GROUP BY src),
        |lab AS (SELECT asg.vec_id, asg.cell,
        |  COALESCE(comp.comp, asg.vec_id) AS component, asg.d2 AS d2c
        |  FROM asg LEFT JOIN comp ON comp.id = asg.vec_id)
        |SELECT vec_id, cell, component, d2c,
        |  (row_number() OVER (PARTITION BY component ORDER BY d2c DESC, vec_id))
        |    = 1 AS keep
        |FROM lab ORDER BY vec_id""".stripMargin
      }),

    // ==================== similarity search ====================
    // (BruteTopKSql — the exact cosine top-10 oracle — is shared by the
    // brute-force gate and the exact-mode IVF gate below.)

    "q_sim_topk_exact" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8), k = 10)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      Some(BruteTopKSql)),

    // ---- MMR diverse re-rank: greedy λ-tradeoff selection of 5 from the
    //      top-25 retrieval candidates per query — the diversity step after
    //      ANN (pure top-k returns near-copies of one neighborhood). Every
    //      frame in every unrolled step is (queries × candidates)-bounded
    //      and query-partitioned; the oracle unrolls the same 5 greedy
    //      steps as plain CTEs.
    "q_sim_mmr_select" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val cand = Similarity.bruteForceTopK(
            emb, emb.filter(col("vec_id") < 8), k = 25)
          .join(emb.select(col("vec_id").as("nbr_id"),
            col("embedding").as("nbr_v")), Seq("nbr_id"))
          .select("query_id", "nbr_id", "cosine", "nbr_v")
        Similarity.mmrSelect(cand, k = 5, lambda = 0.7)
          .orderBy("query_id", "sel_rank")
      },
      Some(MmrSql)),

    // int8-quantized index variant: same search machinery over the ~8x
    // smaller dequantized store. The oracle mirrors quantize -> dequantize
    // -> cosine with the same exact-roundable arithmetic, so scores (and
    // therefore ranks) hash bit-exact.
    "q_sim_topk_quantized" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceTopKQuantized(emb, emb.filter(col("vec_id") < 8), k = 10)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      Some(QuantTopKSql)),

    // quantized IVF — the composed compressed-index shape (int8 codes inside
    // cell-partitioned lists, dequantized once in the probe scan). At
    // nProbe = nLists it probes every cell, so it equals quantized brute
    // force bit for bit and shares its oracle; the approximate mode's recall
    // is asserted in SimilaritySpec. Shares the memoized index build with
    // the other IVF gates (quantization is a projection over the cached
    // assignment frame).
    "q_sim_topk_ivf_quantized" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.searchIvf(
            Similarity.quantizeIvf(Similarity.sharedIvf(emb, corpusKey = d, nLists = 16)),
            emb.filter(col("vec_id") < 8), k = 10, nProbe = 16)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      Some(QuantTopKSql), prewarm = Some(PrewarmIvf)),

    // IVF+PQ — product-quantized index: m=8 subspaces x 16 codewords, codes
    // stored as biased bytes (8 bytes/vector vs 64 int8 bytes vs 512 float64
    // — the 100 TB in-memory ANN shape). At nProbe = nLists every cell is
    // probed, so the coarse k-means cells cannot affect the result and only
    // the CODEBOOKS must be cross-engine deterministic: the gate swaps
    // k-means codebooks for exact hash-bucket subvector means (the
    // q_dedup_semantic trick), and the oracle mirrors encode (argmin d2,
    // ties to lowest code), reconstruction (flatten in subspace order), and
    // cosine bit for bit. The k-means-trained path's recall is bounded in
    // SimilaritySpec.
    "q_sim_topk_ivf_pq" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val pq = deterministicPq(emb)
        val coded = Similarity.encodePq(
          Similarity.sharedIvf(emb, corpusKey = d, nLists = 16), pq)
        Similarity.searchIvfPq(coded, pq, emb.filter(col("vec_id") < 8),
            k = 10, nProbe = 16)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      prewarm = Some(PrewarmIvf),
      oracle = Some(PqTopKSql)),

    // IVF2 + PQ — the two scale levers COMPOSED over one persisted layout
    // (round 18): the two-level quantizer caps assignment/probe at
    // ~2·√nLists distance evals, PQ caps the store at m bytes/vector; a
    // 65k-list × 100 TB deployment needs both at once. The gate runs the
    // full lifecycle — build the hierarchical quantizer, encode its leaf
    // assignment under the SAME deterministic hash-bucket codebooks as the
    // flat gate, saveIvf2 + savePq, reload both halves, search through the
    // hierarchical probe at an exhaustive budget — and must hash-match the
    // SAME brute-force-over-reconstructions oracle: at probeParents =
    // nParents / nProbe = nLists the k-means hierarchy cannot affect the
    // result, so any row lost or re-scored anywhere in the
    // encode/save/load/descend chain fails the hash.
    // The saved PQ index is a SHARED FIXTURE (r20): build+save+encode run
    // once per (session, corpus) via sharedSavedIndex / the prewarm hook —
    // outside the timed region, like sharedIvf — so the gate times the
    // load-and-probe path production pays per query batch, not the
    // ingest-time construction it pays once.
    "q_sim_topk_ivf2_pq" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val dir = sharedIvf2PqDir(s, d)
        Similarity.searchIvf2Pq(Similarity.loadIvf2(s, dir),
            Similarity.loadPq(s, dir), emb.filter(col("vec_id") < 8),
            k = 10, nProbe = 16, probeParents = 4)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      Some(PqTopKSql), prewarm = Some((s, d) => { sharedIvf2PqDir(s, d): Unit })),

    // PQ × FILTER — the remaining lever composition (round 18): a coded
    // m-bytes/vector store that also serves PREDICATED retrieval (lang,
    // licence, quality-threshold...). Pre-filter semantics identical to
    // q_sim_topk_filtered (attrs join + predicate BEFORE the rank — a
    // selective predicate never starves the top-k), candidates scored
    // against their PQ reconstructions exactly as q_sim_topk_ivf_pq; at
    // nProbe = nLists the coarse cells cannot affect the result, so the
    // oracle is the SAME brute-force-over-reconstructions mirror with the
    // label predicate on the candidate side. The two-level descent
    // (searchIvf2PqFiltered) is row-identical at exhaustive budgets —
    // spec-pinned in SimilaritySpec, not re-gated.
    "q_sim_topk_ivf_pq_filtered" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val pq = deterministicPq(emb)
        val coded = Similarity.encodePq(
          Similarity.sharedIvf(emb, corpusKey = d, nLists = 16), pq)
        Similarity.searchIvfPqFiltered(coded, pq,
            emb.select("vec_id", "label"), emb.filter(col("vec_id") < 8),
            k = 10, nProbe = 16, pred = col("label") < 5)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      prewarm = Some(PrewarmIvf),
      oracle = Some(PqTopKSqlWhere("e.label < 5"))),

    // ---- WARC/WET container round trip (round 18): the delivery format
    //      of web-crawl corpora (Common Crawl ships .wet.gz extracted-text
    //      segments; a crawl-scale ingest STARTS from these files). The
    //      gate runs the full container lifecycle distributed: one shuffle
    //      groups documents into per-source WET files (warcinfo header +
    //      one conversion record per doc, each record its own gzip member
    //      — the range-requestable Common Crawl layout), then the
    //      partition-local generator parses every member stream back and
    //      the decoded records must reproduce the corpus bit for bit —
    //      ids (from the record URI), octet lengths, and UTF-8 text. Any
    //      header, length, terminator, or gzip-member defect anywhere in
    //      the 500-record round trip fails the hash. The byte grammar
    //      itself (malformed forms, multi-member layout, binary-safe
    //      payloads) is pinned in WarcSpec.
    "q_s_wet_roundtrip" -> Q(
      (s, d) => {
        import graft.sources.Warc
        val files = Warc.wetExport(
          docsP(s, d).select("source", "doc_id", "text"), gzipped = true,
          segments = 3)
        Warc.wetRecords(files)
          .filter(col("is_valid"))
          .select(
            element_at(split(col("target_uri"), "/"), -1)
              .cast("bigint").as("doc_id"),
            col("target_uri"), col("content_length"), col("text"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        | 'https://example.org/' || source || '/' || doc_id AS target_uri,
        | CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
        | text
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- WebDataset tar shards (round 18): the delivery container of
    //      MULTIMODAL training corpora — plain ustar archives whose
    //      adjacent members group into samples by basename key
    //      (<key>.txt + <key>.bin here). Full distributed lifecycle:
    //      corpus → real WAV payloads → tar shards (ONE shuffle, sorted
    //      canonical member order) → partition-local parse → samples →
    //      the BINARY member decoded back through the audio feature
    //      kernel. The oracle derives every output analytically from the
    //      text bytes (ids, member counts, the text member verbatim, the
    //      wav_decode feature mirror over the .bin member) — any defect
    //      in header layout, checksum, octal sizes, 512-byte padding,
    //      member order, or sample grouping fails the hash.
    "q_s_wds_roundtrip" -> Q(
      (s, d) => wdsRoundtripFrame(s, d, gzip = false),
      Some(wdsRoundtripOracle)),

    // ---- Gzipped WebDataset shards (round 19): the same full container
    //      lifecycle with the `.tar.gz` delivery form real WDS corpora
    //      ship — each shard one timestamp-free gzip stream
    //      (Warc.gzipMember framing), transparently inflated by
    //      parseTar. The roundtrip is byte-transparent, so the SAME
    //      analytic oracle applies; any defect in the gzip framing or
    //      inflation fails the identical hash.
    "q_s_wds_gz_roundtrip" -> Q(
      (s, d) => wdsRoundtripFrame(s, d, gzip = true),
      Some(wdsRoundtripOracle)),

    // ---- WARC -> WET conversion (round 18): the crawl-to-corpus step
    //      itself — full-capture WARC files (warcinfo + request + response
    //      records, HTTP layer inside the response payloads, every record
    //      its own gzip member) distilled to the text layer: parse the
    //      container, split the HTTP head, keep 200 text/html responses,
    //      extract text with the SAME Curation.htmlToText chain the web
    //      gates run (a Column regex tree — the byte kernels stop at the
    //      container layers, codegen keeps the extraction). The oracle
    //      rebuilds the page and replays the extraction chain; ids ride
    //      the record URIs through both HTTP and WARC layers, so any
    //      defect in record framing, member compression, HTTP splitting,
    //      or extraction fails the hash.
    "q_s_warc_to_wet" -> Q(
      (s, d) => {
        import graft.sources.Warc
        val words = split(col("text"), " ")
        val html = concat(
          lit("<html><head><title>"), array_join(slice(words, 1, 2), " "),
          lit("</title></head><body><p>"), col("text"),
          lit("</p></body></html>"))
        val files = Warc.warcExport(
          docsP(s, d).select(col("source"), col("doc_id"), html.as("html")),
          gzipped = true, segments = 2)
        Warc.warcToWet(files)
          .select(
            element_at(split(col("target_uri"), "/"), -1)
              .cast("bigint").as("doc_id"),
            col("text"))
          .orderBy("doc_id")
      },
      Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws, text
        |  FROM documents),
        |h AS (SELECT doc_id,
        |  '<html><head><title>'
        |  || coalesce(array_to_string(list_slice(ws, 1, 2), ' '), '')
        |  || '</title></head><body><p>' || text || '</p></body></html>'
        |  AS html FROM w),
        |s1 AS (SELECT doc_id, regexp_replace(html,
        |  '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(t,
        |  '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(t,
        |  '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2),
        |s4 AS (SELECT doc_id, regexp_replace(t,
        |  '(?i)</?(p|div|br|li|ul|ol|tr|table|h[1-6])\\b[^>]*>', chr(10), 'g')
        |  AS t FROM s3),
        |s5 AS (SELECT doc_id, regexp_replace(t, '<[^>]+>', ' ', 'g') AS t FROM s4),
        |s6 AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(t,
        |      '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
        |      '&quot;', '"', 'g'), '&#39;', chr(39), 'g'), '&amp;', '&', 'g')
        |  AS t FROM s5),
        |s7 AS (SELECT doc_id, regexp_replace(t, '[ \\t\\f\\r]+', ' ', 'g') AS t FROM s6),
        |s8 AS (SELECT doc_id, regexp_replace(t, ' ?\\n ?', chr(10), 'g') AS t FROM s7),
        |s9 AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(t, '\\n{2,}', chr(10), 'g'),
        |    '^\\n+|\\n+$$', '', 'g')) AS t FROM s8)
        |SELECT doc_id, t AS text FROM s9 ORDER BY doc_id""".stripMargin)),

    // ---- FIM transform (round 18): the fill-in-the-middle rearrangement
    //      infilling-capable models train on (public recipe,
    //      arXiv:2207.14255; StarCoder sentinel convention) — a
    //      hash-selected half of the corpus is split at two reproducible
    //      character cuts and rearranged PSM (prefix/suffix/middle) and
    //      SPM (joint) off the SAME cuts; the rest pass through. Pure
    //      scan-stage Column tree; the oracle replays the 60-bit
    //      fingerprint cut arithmetic and both CASE branches, so the
    //      selection, every cut position, and the sentinel assembly are
    //      all hash-pinned. Degenerate splits (empty prefix/middle/
    //      suffix) occur naturally and are kept — the paper's behavior.
    "q_text_fim" -> Q(
      (s, d) => {
        import graft.operators.Fim
        val docs = docsP(s, d).select("doc_id", "text")
        val psm = Fim.fim(docs, "doc_id", "text", ratePct = 50)
          .select(col("doc_id"), col("fim_applied"),
            col("text").as("text_psm"))
        val spm = Fim.fim(docs, "doc_id", "text", ratePct = 50, spm = true)
          .select(col("doc_id"), col("text").as("text_spm"))
        psm.join(spm, Seq("doc_id")).orderBy("doc_id")
      },
      Some(s"""WITH f AS (SELECT doc_id, text, length(text) AS L,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR) || ':fimA'")} % (length(text) + 1) AS a,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR) || ':fimB'")} % (length(text) + 1) AS b,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR) || ':fimS'")} % 100 AS sel
        | FROM documents),
        |c AS (SELECT doc_id, text, L, least(a, b) AS c1, greatest(a, b) AS c2,
        |  sel < 50 AS ap FROM f)
        |SELECT doc_id, ap AS fim_applied,
        | CASE WHEN ap THEN '<|fim_prefix|>' || substr(text, 1, CAST(c1 AS INT))
        |   || '<|fim_suffix|>' || substr(text, CAST(c2 + 1 AS INT), CAST(L - c2 AS INT))
        |   || '<|fim_middle|>' || substr(text, CAST(c1 + 1 AS INT), CAST(c2 - c1 AS INT))
        |  ELSE text END AS text_psm,
        | CASE WHEN ap THEN '<|fim_prefix|>' || '<|fim_suffix|>'
        |   || substr(text, CAST(c2 + 1 AS INT), CAST(L - c2 AS INT))
        |   || '<|fim_middle|>' || substr(text, 1, CAST(c1 AS INT))
        |   || substr(text, CAST(c1 + 1 AS INT), CAST(c2 - c1 AS INT))
        |  ELSE text END AS text_spm
        |FROM c ORDER BY doc_id""".stripMargin)),

    // ---- Dataset DATASHEET (round 14): the per-source one-stop card a
    //      corpus ships with — volume, exact mean quality, language share,
    //      exact-dup rate, benchmark-contamination rate, mean char entropy
    //      — one row per source, every number the composition of an
    //      already-gated signal. Corpus = doc_id % 20 != 0 (the holdout
    //      rows are the benchmark the contamination column measures
    //      against, the decontaminate-gate convention). One scan computes
    //      all scalar signals; contamination adds the fractions semi-join;
    //      the card itself is a partial-agg groupBy.
    "q_pipeline_datasheet" -> Q(
      (s, d) => {
        import graft.operators.Decontaminate
        graft.GraftExtensions.register(s)
        val docs = docsP(s, d)
        val corpus = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
        val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
          .select("doc_id", "text")
        val scored = corpus.select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_toks"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.langId(col("text")).as("lang"),
          graft.functions.Entropy.charEntropy(col("text")).as("ent"),
          md5(col("text")).as("h"))
        val decon = Decontaminate.fractions(corpus, bench, "doc_id", "text",
            threshold = 0.5, shingleK = ShingleK)
          .select(col("doc_id"), col("is_contaminated"))
        scored.join(decon, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_toks")).as("n_tokens"),
            ExactAgg.avgD(col("quality"), 6).as("mean_quality"),
            (sum(when(col("lang") === "en", lit(1L)).otherwise(lit(0L)))
              .cast("double") / count(lit(1))).as("en_frac"),
            ((count(lit(1)) - countDistinct(col("h"))).cast("double") /
              count(lit(1))).as("dup_rate"),
            (sum(when(coalesce(col("is_contaminated"), lit(false)), lit(1L))
              .otherwise(lit(0L))).cast("double") / count(lit(1)))
              .as("contaminated_frac"),
            (sum(round(col("ent"), 12).cast("decimal(28,12)")).cast("double") /
              count(lit(1))).as("mean_entropy"))
          .orderBy("source")
      },
      Some {
        val qlc = qualityLangCtes("(SELECT * FROM documents WHERE doc_id % 20 != 0)")
        s"""WITH $qlc,
        |ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '[\\s\\S]')) AS c
        |  FROM documents WHERE doc_id % 20 != 0),
        |ge AS (SELECT doc_id, c, count(*) AS cn FROM ch GROUP BY 1, 2),
        |te AS (SELECT doc_id, CAST(sum(cn) AS DOUBLE) AS L FROM ge GROUP BY 1),
        |ent AS (SELECT ge.doc_id,
        |  CAST(sum(CAST(round(-((cn / L) * ln(cn / L) / ln(2)), 12)
        |    AS DECIMAL(28,12))) AS DOUBLE) AS entropy
        |  FROM ge JOIN te USING (doc_id) GROUP BY 1),
        |kt AS (SELECT doc_id, $ToksSql AS toks FROM documents
        |  WHERE doc_id % 20 != 0),
        |csh AS (SELECT doc_id, $TokenFp60Sql AS fp FROM
        |  (SELECT doc_id, unnest($ShinglesSql) AS tok FROM kt)),
        |bt AS (SELECT doc_id, $ToksSql AS toks FROM documents
        |  WHERE doc_id % 20 = 0),
        |bsh AS (SELECT DISTINCT $TokenFp60Sql AS fp FROM
        |  (SELECT doc_id, unnest($ShinglesSql) AS tok FROM bt)),
        |cm AS (SELECT doc_id, count(*) AS n_matched FROM csh
        |  WHERE fp IN (SELECT fp FROM bsh) GROUP BY 1),
        |cs AS (SELECT doc_id, count(*) AS n_sh FROM csh GROUP BY 1),
        |contam AS (SELECT cs.doc_id,
        |  CAST(coalesce(cm.n_matched, 0) AS DOUBLE) / cs.n_sh >= 0.5
        |    AS is_contaminated
        |  FROM cs LEFT JOIN cm ON cm.doc_id = cs.doc_id)
        |SELECT s.source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(s.n_toks) AS BIGINT) AS n_tokens,
        |  ${ExactAgg.avgSql("s.quality", 6)} AS mean_quality,
        |  CAST(sum(CASE WHEN s.lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS en_frac,
        |  CAST(count(*) - count(DISTINCT md5(s.text)) AS DOUBLE)
        |    / count(*) AS dup_rate,
        |  CAST(sum(CASE WHEN coalesce(c2.is_contaminated, false)
        |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS contaminated_frac,
        |  CAST(sum(CAST(round(coalesce(e2.entropy, CAST(0 AS DOUBLE)), 12)
        |    AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS mean_entropy
        |FROM scored s
        |LEFT JOIN contam c2 ON c2.doc_id = s.doc_id
        |LEFT JOIN ent e2 ON e2.doc_id = s.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ---- Robots screening (round 14): parse literal robots.txt payloads
    //      into per-agent Disallow rules and screen synthesized crawl URLs
    //      for agent "graftbot" — exact group beats '*' (a.com's allow-all
    //      star rule is IGNORED for graftbot), unlisted domains allow.
    //      The parse itself is spec-pinned (OperatorsSpec hand cases); the
    //      oracle mirrors the canonicalization + the hand-derived rule
    //      set, so the verdict join and prefix semantics hash-check.
    "q_curate_robots_screen" -> Q(
      (s, d) => {
        import s.implicits._
        import graft.operators.Curation
        val robots = Seq(
          ("a.com", "User-agent: graftbot\nDisallow: /private/\n" +
            "Disallow: /tmp\n\nUser-agent: *\nDisallow: /"),
          ("b.net", "User-agent: *\nDisallow: /search"))
          .toDF("domain", "txt")
        val url = concat(
          when(col("doc_id") % 2 === 0, lit("http://User@A.com:80"))
            .otherwise(lit("https://b.net")),
          element_at(array(lit("/private/"), lit("/tmp"), lit("/search"),
            lit("/p/")), (pmod(col("doc_id"), lit(4)) + 1).cast("int")),
          (col("doc_id") % 9).cast("string"))
        Curation.robotsVerdicts(
            docsP(s, d).select(col("doc_id"), url.as("url")),
            "url", Curation.parseRobots(robots, "domain", "txt"),
            agent = "graftbot")
          .select(col("doc_id"), col("canonical_url"), col("robots_blocked"))
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'http://User@A.com:80'
        |        ELSE 'https://b.net' END)
        |  || (['/private/', '/tmp', '/search', '/p/'])[(doc_id % 4) + 1]
        |  || CAST(doc_id % 9 AS VARCHAR) AS url
        |  FROM documents),
        |n AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(
        |    regexp_replace(lower(regexp_extract(url, '(?i)^(https?://[^/]+)', 1)),
        |      '^(https?://)[^@/]*@', '\\1'),
        |    '^(http://[^/]*?):80$$', '\\1'), '^(https://[^/]*?):443$$', '\\1')
        |  || regexp_replace(regexp_replace(url, '(?i)^https?://[^/]+', ''), '/$$', '')
        |  AS canonical_url
        |  FROM u),
        |p AS (SELECT doc_id, canonical_url,
        |  regexp_extract(canonical_url, '^https?://([^/:]+)', 1) AS host,
        |  CASE WHEN regexp_replace(canonical_url, '^https?://[^/]+', '') = ''
        |    THEN '/' ELSE regexp_replace(canonical_url, '^https?://[^/]+', '')
        |  END AS path
        |  FROM n)
        |SELECT doc_id, canonical_url,
        |  (host = 'a.com' AND (path LIKE '/private/%' OR path LIKE '/tmp%'))
        |  OR (host = 'b.net' AND path LIKE '/search%') AS robots_blocked
        |FROM p ORDER BY doc_id""".stripMargin)),

    // ---- Filter-agreement matrix (round 14): Cohen's kappa between the
    //      quality / lang / entropy screens — the redundancy check before
    //      ensembling filters (raw agreement is inflated by imbalance;
    //      kappa corrects via the marginals). One partial-agg pass fills
    //      every pair's 2x2 contingency; ratios are fixed-parenthesization
    //      arithmetic over exact counts — hash-identical.
    "q_text_filter_agreement" -> Q(
      (s, d) => {
        graft.GraftExtensions.register(s)
        graft.operators.Diagnostics.filterAgreementMatrix(docsP(s, d), Seq(
            "quality" -> (TextFunctions.qualityScore(col("text")) >= 0.6),
            "lang_en" -> (TextFunctions.langId(col("text")) === "en"),
            "entropy" -> (graft.functions.Entropy.charEntropy(col("text")) >= 3.5)))
          .orderBy("filter_a", "filter_b")
      },
      Some {
        def cells(a: String, b: String) = Seq("11" -> (true, true),
          "10" -> (true, false), "01" -> (false, true), "00" -> (false, false))
          .map { case (tag, (x, y)) =>
            s"CAST(sum(CASE WHEN ${if (x) a else s"NOT $a"} AND ${if (y) b else s"NOT $b"} THEN 1 ELSE 0 END) AS BIGINT) AS c_${a}_${b}_$tag"
          }.mkString(",\n  ")
        def pairRow(a: String, b: String, an: String, bn: String) =
          s"""SELECT '$an' AS filter_a, '$bn' AS filter_b,
             |  c_${a}_${b}_11 AS n11, c_${a}_${b}_10 AS n10,
             |  c_${a}_${b}_01 AS n01, c_${a}_${b}_00 AS n00,
             |  CAST(c_${a}_${b}_11 + c_${a}_${b}_00 AS DOUBLE) / CAST(n AS DOUBLE) AS p_o,
             |  (CAST(c_${a}_${b}_11 + c_${a}_${b}_10 AS DOUBLE) / CAST(n AS DOUBLE))
             |    * (CAST(c_${a}_${b}_11 + c_${a}_${b}_01 AS DOUBLE) / CAST(n AS DOUBLE))
             |  + (CAST(c_${a}_${b}_01 + c_${a}_${b}_00 AS DOUBLE) / CAST(n AS DOUBLE))
             |    * (CAST(c_${a}_${b}_10 + c_${a}_${b}_00 AS DOUBLE) / CAST(n AS DOUBLE)) AS p_e
             |FROM a""".stripMargin
        s"""WITH ${qualityLangCtes("documents")},
        |ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '[\\s\\S]')) AS c
        |  FROM documents),
        |ge AS (SELECT doc_id, c, count(*) AS cn FROM ch GROUP BY 1, 2),
        |te AS (SELECT doc_id, CAST(sum(cn) AS DOUBLE) AS L FROM ge GROUP BY 1),
        |ent AS (SELECT ge.doc_id,
        |  CAST(sum(CAST(round(-((cn / L) * ln(cn / L) / ln(2)), 12)
        |    AS DECIMAL(28,12))) AS DOUBLE) AS entropy
        |  FROM ge JOIN te USING (doc_id) GROUP BY 1),
        |f AS (SELECT s.doc_id,
        |  s.quality >= CAST(0.6 AS DOUBLE) AS fq, s.lang = 'en' AS fl,
        |  coalesce(e.entropy, CAST(0 AS DOUBLE)) >= CAST(3.5 AS DOUBLE) AS fe
        |  FROM scored s LEFT JOIN ent e ON e.doc_id = s.doc_id),
        |a AS (SELECT count(*) AS n,
        |  ${cells("fq", "fl")},
        |  ${cells("fq", "fe")},
        |  ${cells("fl", "fe")}
        |  FROM f),
        |m AS (${pairRow("fq", "fl", "quality", "lang_en")}
        | UNION ALL ${pairRow("fq", "fe", "quality", "entropy")}
        | UNION ALL ${pairRow("fl", "fe", "lang_en", "entropy")})
        |SELECT filter_a, filter_b, n11, n10, n01, n00, p_o, p_e,
        |  CASE WHEN 1.0 - p_e != 0.0
        |    THEN (p_o - p_e) / (CAST(1.0 AS DOUBLE) - p_e) END AS kappa
        |FROM m ORDER BY filter_a, filter_b""".stripMargin
      }),

    // ---- Filtered ANN (round 14): nearest neighbors AMONG documents
    //      passing a metadata predicate (here label < 5 — the "only en /
    //      licensed / high-quality" retrieval shape). PRE-filter within
    //      probed cells, so the filtered top-k never starves; at
    //      nProbe = nLists it equals brute force over the filtered corpus,
    //      which is exactly what the oracle computes.
    "q_sim_topk_filtered" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.searchIvfFiltered(
            Similarity.sharedIvf(emb, corpusKey = d, nLists = 16),
            emb.select("vec_id", "label"),
            emb.filter(col("vec_id") < 8),
            k = 10, nProbe = 16, pred = col("label") < 5)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (SELECT query_id, e.vec_id AS nbr_id,
        |  ${cosSql("qv", "e.v")} AS cosine
        |  FROM e CROSS JOIN q
        |  WHERE e.vec_id != query_id AND e.label < 5)
        |SELECT query_id, nbr_id, cosine,
        | row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rank
        |FROM scored QUALIFY rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // ---- Retrieval evaluation (round 14): recall@k / precision@k / MRR /
    //      nDCG@k of the exact retriever against deterministic graded
    //      qrels ((q*31 + doc) % 11 == 0 is relevant, gain = doc%3 + 1 —
    //      pure integer arithmetic, so the label set needs no shared
    //      fixture). DCG/IDCG are round12 decimal sums; every ratio is one
    //      IEEE division of exact operands — hash-identical.
    "q_eval_retrieval" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val ranking = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") < 8), k = 10)
        val qrels = emb.select(col("vec_id").as("doc_id"))
          .crossJoin(emb.filter(col("vec_id") < 8)
            .select(col("vec_id").as("query_id")))
          .filter((col("query_id") * 31 + col("doc_id")) % 11 === 0)
          .withColumn("rel", (col("doc_id") % 3 + 1).cast("double"))
        RetrievalEval.perQuery(ranking, qrels, k = 10).orderBy("query_id")
      },
      Some(RetrievalEvalSql(
        "SELECT query_id, n_relevant, n_retrieved, n_hits, recall_at_k, " +
          "precision_at_k, mrr, ndcg_at_k FROM pq ORDER BY query_id"))),

    "q_eval_retrieval_summary" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val ranking = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") < 8), k = 10)
        val qrels = emb.select(col("vec_id").as("doc_id"))
          .crossJoin(emb.filter(col("vec_id") < 8)
            .select(col("vec_id").as("query_id")))
          .filter((col("query_id") * 31 + col("doc_id")) % 11 === 0)
          .withColumn("rel", (col("doc_id") % 3 + 1).cast("double"))
        RetrievalEval.summary(RetrievalEval.perQuery(ranking, qrels, k = 10))
      },
      Some(RetrievalEvalSql(
        """SELECT CAST(count(*) AS BIGINT) AS n_queries,
          | CAST(sum(CASE WHEN recall_at_k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_evaluable,
          | CAST(sum(CAST(round(recall_at_k, 12) AS DECIMAL(28,12))) AS DOUBLE)
          |  / sum(CASE WHEN recall_at_k IS NOT NULL THEN 1 ELSE 0 END) AS mean_recall,
          | CAST(sum(CAST(round(precision_at_k, 12) AS DECIMAL(28,12))) AS DOUBLE)
          |  / count(*) AS mean_precision,
          | CAST(sum(CAST(round(mrr, 12) AS DECIMAL(28,12))) AS DOUBLE)
          |  / count(*) AS mean_mrr,
          | CAST(sum(CAST(round(ndcg_at_k, 12) AS DECIMAL(28,12))) AS DOUBLE)
          |  / sum(CASE WHEN ndcg_at_k IS NOT NULL THEN 1 ELSE 0 END) AS mean_ndcg
          |FROM pq""".stripMargin))),

    // Hard-negative mining (round 13): each query's top-10 highest-cosine
    // vectors EXCLUDING its own near-duplicate component — the contrastive-
    // training negatives op (a near-dup mislabeled as a negative poisons
    // the loss). Labeling is the deterministic q_dedup_semantic chain
    // (hash cells + exact-mean centroids + recursive components); the
    // oracle re-runs it and ranks the component-excluded pairs.
    "q_sim_hard_negatives" -> Q(
      (s, d) => {
        val labeled = semanticLabeled(s, d)
        Similarity.hardNegativeTopK(labeled,
            labeled.filter(col("vec_id") < 8), k = 10)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      Some(HardNegativesOracleSql), prewarm = Some(PrewarmSemantic)),

    // The same mining routed through the persisted IVF index (round 14 —
    // retires the engine's last O(corpus x queries) scan): candidates come
    // from the query's probed cells, the component exclusion rides the
    // candidate join. At nProbe = nLists (this gate) every cell is probed,
    // so the result is bit-identical to the brute twin and shares its
    // oracle; the nProbe < nLists recall bound lives in SimilaritySpec.
    "q_sim_hard_negatives_ivf" -> Q(
      (s, d) => {
        val labeled = semanticLabeled(s, d)
        val index = Similarity.sharedIvf(Tables.embeddings(s, d),
          corpusKey = d, nLists = 16)
        Similarity.hardNegativeTopKIvf(index,
            labeled.select("vec_id", "component"),
            labeled.filter(col("vec_id") < 8), k = 10, nProbe = 16)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      Some(HardNegativesOracleSql), prewarm = Some(PrewarmIvfSemantic)),

    // ---- Contrastive triplet builder: anchors (vec_id < 8), positive =
    //      most-similar SAME near-dup-component neighbor, negatives = the
    //      component-excluded top-5 — the (anchor, positive, hard-negatives)
    //      training-pair construction over the same exact-centroid
    //      semanticDedup labeling as the hard-negatives gate. Queries with
    //      no component mate emit nothing.
    "q_sim_contrastive_pairs" -> Q(
      (s, d) => {
        val labeled = semanticLabeled(s, d)
        Similarity.contrastivePairs(labeled,
            labeled.filter(col("vec_id") < 64), kNeg = 5)
          .withColumn("neg_rank", col("neg_rank").cast("bigint"))
          .orderBy("query_id", "neg_rank")
      },
      Some(ContrastivePairsOracleSql), prewarm = Some(PrewarmSemantic)),

    // IVF-routed triplet builder (round 14): positives and negatives both
    // drawn from the probed cells; at nProbe = nLists bit-identical to the
    // brute twin (shared oracle). See q_sim_hard_negatives_ivf.
    "q_sim_contrastive_pairs_ivf" -> Q(
      (s, d) => {
        val labeled = semanticLabeled(s, d)
        val index = Similarity.sharedIvf(Tables.embeddings(s, d),
          corpusKey = d, nLists = 16)
        Similarity.contrastivePairsIvf(index,
            labeled.select("vec_id", "component"),
            labeled.filter(col("vec_id") < 64), kNeg = 5, nProbe = 16)
          .withColumn("neg_rank", col("neg_rank").cast("bigint"))
          .orderBy("query_id", "neg_rank")
      },
      Some(ContrastivePairsOracleSql), prewarm = Some(PrewarmIvfSemantic)),

    // Two-stage search: quantized-IVF candidates (top-20 at nProbe = nLists,
    // so the candidate set is exactly quantized brute-force top-20) re-ranked
    // by exact full-precision cosine — FAISS-style IVF+refine. The oracle
    // mirrors both stages; final scores are the EXACT cosines.
    "q_sim_topk_rerank" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.searchIvfRerank(
            Similarity.quantizeIvf(Similarity.sharedIvf(emb, corpusKey = d, nLists = 16)),
            emb, emb.filter(col("vec_id") < 8),
            k = 10, kCandidates = 20, nProbe = 16)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sc AS (SELECT vec_id, v,
        |  CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0.0
        |   THEN CAST(127.0 AS DOUBLE) / list_max(list_transform(v, x -> abs(x)))
        |   ELSE CAST(1.0 AS DOUBLE) END AS scale FROM e),
        |dq AS (SELECT vec_id AS nbr_id,
        |  list_transform(v, x -> CAST(CAST(round(x * scale) AS TINYINT) AS DOUBLE) / scale) AS nbr_v
        |  FROM sc),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |qs AS (SELECT query_id, nbr_id,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY ${cosSql("qv", "nbr_v")} DESC, nbr_id) AS qrank
        |  FROM dq CROSS JOIN q WHERE nbr_id != query_id),
        |cand AS (SELECT query_id, nbr_id FROM qs WHERE qrank <= 20),
        |re AS (SELECT c.query_id, c.nbr_id,
        |  ${cosSql("q.qv", "n.v")} AS cosine
        |  FROM cand c JOIN e n ON n.vec_id = c.nbr_id
        |  JOIN q ON q.query_id = c.query_id)
        |SELECT query_id, nbr_id, cosine,
        | row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rank
        |FROM re QUALIFY rank <= 10 ORDER BY query_id, rank""".stripMargin),
      prewarm = Some(PrewarmIvf)),

    // IVF with nProbe = nLists probes every cell, so it is exact search by
    // construction — hash-matched against the same brute-force oracle. This
    // pins the IVF join/rank machinery itself; the approximate mode's recall
    // is asserted in SimilaritySpec.
    // Both IVF gates share ONE memoized index build (same corpus, nLists,
    // seed ⇒ identical centroids): training runs once per session, each gate
    // only pays its own probe/search — the build-once/search-many shape
    // IvfIndex exists for.
    "q_sim_topk_ivf_exact" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.searchIvf(Similarity.sharedIvf(emb, corpusKey = d, nLists = 16),
            emb.filter(col("vec_id") < 8), k = 10, nProbe = 16)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      Some(BruteTopKSql), prewarm = Some(PrewarmIvf)),

    "q_sim_topk_bucketed" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bucketedTopK(emb, emb.filter(col("vec_id") < 8), k = 5,
            bucketBits = 6, dim = 64)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |  ${bucketSql("CAST(embedding AS DOUBLE[])", 6, 64)} AS bucket FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < 8),
        |scored AS (SELECT query_id, e.vec_id AS nbr_id,
        |  ${cosSql("qv", "e.v")} AS cosine
        |  FROM e JOIN q USING (bucket) WHERE e.vec_id != query_id)
        |SELECT query_id, nbr_id, cosine,
        | row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rank
        |FROM scored QUALIFY rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // IVF scale path (coarse k-means quantizer + nProbe cells; recall vs
    // brute force asserted in SimilaritySpec — no SQL oracle for k-means,
    // driver records the rows check).
    "q_sim_topk_ivf" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.searchIvf(Similarity.sharedIvf(emb, corpusKey = d, nLists = 16),
            emb.filter(col("vec_id") < 8), k = 10, nProbe = 4)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      prewarm = Some(PrewarmIvf)),

    // ---- TWO-LEVEL (residual) coarse quantizer (round 17): parent
    //      k-means + one SHARED residual codebook, leaf = parent ⊕
    //      residual, hierarchical assignment at nParents + fanout distance
    //      evals per vector — the fix for the corpus × nLists term
    //      SCALE.md's re-sizing row prices at 3.5×/10× (a 65k-list flat
    //      scan stops being metadata-sized). Exhaustive-leaf probe over
    //      the saved+reloaded index ≡ brute force pins the whole
    //      build/save/load/search chain; equal-budget recall parity vs
    //      flat IVF and the one-corpus-shuffle assignment plan are spec'd
    //      (SimilaritySpec).
    // Shared saved fixture like q_sim_topk_ivf2_pq (r20): the timed region
    // is load + hierarchical probe; the one-time build/save runs in prewarm.
    "q_sim_topk_ivf2_exact" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val dir = sharedIvf2Dir(s, d)
        Similarity.searchIvf2(Similarity.loadIvf2(s, dir),
            emb.filter(col("vec_id") < 8), k = 10, nProbe = 16,
            probeParents = 4)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      Some(BruteTopKSql), prewarm = Some((s, d) => { sharedIvf2Dir(s, d): Unit })),

    // ---- FULL index lifecycle under the correctness gate (round 16):
    //      build on a split → save → append the rest with frozen
    //      centroids → RETRAIN (re-sizing nLists 8 → 16, new seed — the
    //      drift-refresh op) → exhaustive-probe search ≡ brute force over
    //      the whole corpus. Any lost/duplicated row, stale cell file, or
    //      centroid/assignment mismatch anywhere in the chain hash-fails
    //      against the shared brute oracle.
    "q_sim_ivf_retrain_exact" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
        val base = emb.filter(col("vec_id") % 3 =!= 0)
        val batch = emb.filter(col("vec_id") % 3 === 0)
        val dir = java.nio.file.Files
          .createTempDirectory("graft_ivf_rt_gate").toString
        val built = Similarity.buildIvf(base, nLists = 8, seed = 42L)
        Similarity.saveIvf(built, dir)
        built.assigned.unpersist(blocking = false)
        Similarity.appendIvf(built, batch, dir)
        Similarity.retrainIvf(s, dir, nLists = 16, seed = 7L)
        Similarity.searchIvf(Similarity.loadIvf(s, dir),
            emb.filter(col("vec_id") < 8), k = 10, nProbe = 16)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      Some(BruteTopKSql)),

    // ---- Per-label centroids (mixture profiles): exact sequential-fold
    //      means of the first 4 dims, in vec_id order on both engines (plain
    //      double avg is partial-aggregation-order-dependent and would not
    //      hash-match). The distributed fast path is Centroids.meanByKey;
    //      OperatorsSpec asserts the two agree to 1e-9.
    // ---- Exact covariance (round 14): the sufficient statistic for the
    //      spectral diagnostics — round-9 decimal means and cell sums, so
    //      the dim(dim+1)/2 upper triangle is bit-reproducible under any
    //      partitioning. One scan explodes each row into its pair
    //      products; everything shuffled is (dim^2)-bounded.
    "q_v_covariance" -> Q(
      (s, d) => graft.operators.Centroids.covarianceUpper(
          Tables.embeddings(s, d), "embedding", dim = 64)
        .orderBy("i", "j"),
      Some(s"""WITH $CovarianceCtes
        |SELECT i, j, cov FROM covu ORDER BY i, j""".stripMargin)),

    // ---- Top principal component (round 14): the anisotropy check — a
    //      dominant eigenvalue means the embeddings collapse toward a
    //      line. Fixed ten power iterations with replayable arithmetic
    //      (round-9 decimal matvecs/norms, v0 = 1/sqrt(dim)); the oracle
    //      unrolls the same ten steps over the mirrored matrix. The
    //      corpus-scaled work is the covariance pass; the iteration is
    //      model-sized driver math (the centroid-table contract).
    "q_v_pca_top" -> Q(
      (s, d) => graft.operators.Centroids.topPrincipalComponent(
          Tables.embeddings(s, d), "embedding", dim = 64, iters = 10)
        .orderBy("i"),
      Some(PcaTopOracleSql(dim = 64, iters = 10))),

    // ---- All-but-the-top (round 14, Mu & Viswanath ICLR 2018): subtract
    //      the mean, project out the top component — the anisotropy FIX
    //      the q_v_pca_top diagnostic motivates. The model (mean +
    //      direction) is driver-computed and rides the plan as literal
    //      arrays; the rewrite is pure scan-stage arithmetic, exploded to
    //      (vec_id, i, x) so the harness can hash it.
    "q_v_remove_top" -> Q(
      (s, d) => graft.operators.Centroids.removeTopComponent(
          Tables.embeddings(s, d), "vec_id", "embedding", dim = 64)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
        .withColumn("i", col("i").cast("long"))
        .orderBy("vec_id", "i"),
      Some(AbttOracleSql(dim = 64, iters = 10))),

    "q_v_centroid" -> Q(
      (s, d) => {
        import graft.operators.Centroids
        val e = Tables.embeddings(s, d)
          .select(col("label"), col("vec_id"),
            col("embedding").cast("array<double>").as("v"))
        e.groupBy("label").agg(
            count(lit(1)).as("n_vecs"),
            (1 to 4).map(i => Centroids.exactDimMean(col("vec_id"),
              element_at(col("v"), i)).as(s"c$i")): _*)
          .orderBy("label")
      },
      Some {
        val dims = (1 to 4).map { i =>
          s"list_dot_product(l$i, list_transform(l$i, x -> 1.0)) / len(l$i) AS c$i"
        }.mkString(", ")
        val lists = (1 to 4).map(i => s"list(v[$i] ORDER BY vec_id) AS l$i").mkString(", ")
        s"""WITH e AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |g AS (SELECT label, count(*) AS n_vecs, $lists FROM e GROUP BY label)
        |SELECT label, n_vecs, $dims FROM g ORDER BY label""".stripMargin
      }),

    // Embedding L2-normalization (the preprocessing step before cosine/IP
    // search): unit norm + first two dims emitted as scalars (the oracle
    // harness can't sort raw array columns), all bit-exact via the shared
    // sequential folds.
    "q_v_normalize" -> Q(
      (s, d) => Tables.embeddings(s, d)
        .select(col("vec_id"),
          VectorFunctions.normalize(col("embedding")).as("nv"))
        .select(col("vec_id"),
          VectorFunctions.norm2(col("nv")).as("unit_norm"),
          element_at(col("nv"), 1).as("x0"),
          element_at(col("nv"), 2).as("x1"))
        .orderBy("vec_id"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nm FROM e),
        |u AS (SELECT vec_id,
        |  list_transform(v, x -> CASE WHEN nm > 0 THEN x / nm ELSE x END) AS nv
        |  FROM n)
        |SELECT vec_id, sqrt(list_dot_product(nv, nv)) AS unit_norm,
        | nv[1] AS x0, nv[2] AS x1
        |FROM u ORDER BY vec_id""".stripMargin)),

    // JL random projection 64→16: three components and the projected norm,
    // every value an exact sign-flipped sequential fold (the projection
    // matrix constants generate both plans).
    "q_v_random_project" -> Q(
      (s, d) => {
        graft.GraftExtensions.register(s)
        Tables.embeddings(s, d)
          .select(col("vec_id"),
            VectorFunctions.randomProject(col("embedding"), 16, 64).as("pv"))
          .select(col("vec_id"),
            element_at(col("pv"), 1).as("p0"),
            element_at(col("pv"), 2).as("p1"),
            element_at(col("pv"), 3).as("p2"),
            VectorFunctions.norm2(col("pv")).as("pnorm"))
          .orderBy("vec_id")
      },
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (SELECT vec_id, ${projectSql("v", 16, 64)} AS pv FROM e)
        |SELECT vec_id, pv[1] AS p0, pv[2] AS p1, pv[3] AS p2,
        | sqrt(list_dot_product(pv, pv)) AS pnorm
        |FROM p ORDER BY vec_id""".stripMargin)),

    // int8 scalar quantization round-trip: scale, two codes, and the max
    // reconstruction error per vector — all exact-mirrorable arithmetic
    // (round ties-away-from-zero on both engines, max folds are exact).
    "q_v_quantize_i8" -> Q(
      (s, d) => Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("scale", VectorFunctions.quantScaleI8(col("v")))
        .withColumn("q", VectorFunctions.quantizeI8(col("v"), col("scale")))
        .select(col("vec_id"), col("scale"),
          element_at(col("q"), 1).as("q0"), element_at(col("q"), 2).as("q1"),
          aggregate(
            zip_with(col("v"), VectorFunctions.dequantizeI8(col("q"), col("scale")),
              (x, y) => abs(x - y)),
            lit(0.0), (acc, e) => greatest(acc, e)).as("max_err"))
        .orderBy("vec_id"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sc AS (SELECT vec_id, v,
        |  CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0.0
        |   THEN CAST(127.0 AS DOUBLE) / list_max(list_transform(v, x -> abs(x)))
        |   ELSE CAST(1.0 AS DOUBLE) END AS scale FROM e),
        |qz AS (SELECT vec_id, v, scale,
        |  list_transform(v, x -> CAST(round(x * scale) AS TINYINT)) AS q FROM sc)
        |SELECT vec_id, scale, q[1] AS q0, q[2] AS q1,
        | list_max(list_transform(range(1, len(v) + 1),
        |   i -> abs(v[i] - CAST(q[i] AS DOUBLE) / scale))) AS max_err
        |FROM qz ORDER BY vec_id""".stripMargin)),

    // ---- Curation capstone v6 (round 13): the SELECTION-first recipe —
    //      quality/lang gate → Moore–Lewis cross-entropy top-300 (in-domain
    //      vs general LM gap) → curriculum interleave over the gap →
    //      curriculum-ORDERED packed bins (packBins' order hook lays each
    //      shard out by (bucket, pos), so a loader streaming bins in order
    //      replays the curriculum) → per-band layout summary. Every stage
    //      is individually oracle-proven; this gate proves the composition.
    "q_pipeline_curate_v6" -> Q(
      (s, d) => {
        import graft.operators.{LanguageModel, Packing, Sampling}
        val base = docsP(s, d).select(col("doc_id"), col("text"), col("source"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.langId(col("text")).as("lang"))
        // `gated` roots THREE consumers (the CE target ref, the CE general
        // ref, and the `withTok` join): persist + materialize it, or each
        // branch re-runs the full quality/lang scan (the q_pipeline_audit
        // pattern; r14 verdict flagged this gate as the suite's #1 cost)
        val gated = base.filter(col("quality") >= 0.6 && col("lang") === "en")
          .select("doc_id", "text", "source")
          .gatePersist()
        gated.count()
        val ce = LanguageModel.crossEntropySelect(gated, "doc_id", "text",
          targetRef = gated.filter(col("source").isin("src0", "src1", "src2")),
          generalRef = gated.filter(
            Sampling.split(col("doc_id"), 80, 10, salt = ":lm1") === "train"),
          vocabCap = 256, bigramCap = 2048, k = 300)
        val cur = Sampling.curriculumInterleave(ce, col("doc_id"), col("gap"),
          nBuckets = 4, shards = 8, salt = ":v6")
        val withTok = cur.join(gated.select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("n_tokens")),
          Seq("doc_id"))
        Packing.packBins(withTok, "doc_id", col("n_tokens"),
            budgetTokens = 512L, shards = 4, salt = ":v6p",
            order = Seq(col("bucket"), col("pos")))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
            countDistinct(col("shard") * lit(100000L) + col("bin")).as("n_bins"))
          .select(col("bucket").cast("int").as("bucket"), col("n_docs"),
            col("n_tokens"), col("n_bins"))
          .orderBy("bucket")
      },
      Some {
        val langNames = TextFunctions.LangMarkers.map(_._1)
        val langHits = TextFunctions.LangMarkers.map { case (lang, ms) =>
          s"len(list_filter(toks, x -> x IN (${ms.map(m => s"'$m'").mkString(", ")}))) AS h_$lang"
        }.mkString(", ")
        val greatestH = s"greatest(${langNames.map("h_" + _).mkString(", ")})"
        val langCase = langNames.map(l => s"WHEN h_$l = m THEN '$l'").mkString(" ")
        s"""WITH t AS (SELECT doc_id, text, source, $ToksSql AS toks FROM documents),
           |h AS (SELECT *, $langHits FROM t),
           |g AS (SELECT *, $greatestH AS m FROM h),
           |scored AS (SELECT doc_id,
           | ((((CASE WHEN length(text) BETWEEN 50 AND 10000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
           |  + (CASE WHEN $StopRatioSql > 0.01 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
           |  + (CASE WHEN $PunctRatioSql < 0.2 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
           |  + (CASE WHEN $AvgTokLenSql BETWEEN 2.0 AND 12.0 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)) AS quality,
           | CASE WHEN m = 0 THEN 'und' $langCase END AS lang
           |FROM g),
           |gt AS (SELECT doc_id FROM scored WHERE quality >= 0.6 AND lang = 'en'),
           |tk AS (SELECT t.doc_id, t.toks FROM t JOIN gt ON gt.doc_id = t.doc_id),
           |${pplCtesWhere(256, 2048,
              "doc_id IN (SELECT doc_id FROM documents WHERE source IN ('src0', 'src1', 'src2'))",
              "_t")},
           |${pplCtes(256, 2048, ":lm1")},
           |a_t AS (SELECT doc_id,
           |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS logp_target
           |  FROM sc_t GROUP BY 1),
           |a_g AS (SELECT doc_id,
           |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS logp_general
           |  FROM sc GROUP BY 1),
           |sel AS (SELECT a_t.doc_id,
           |  round(a_t.logp_target - a_g.logp_general, 6) AS gap
           |  FROM a_t JOIN a_g ON a_g.doc_id = a_t.doc_id
           |  QUALIFY row_number() OVER (ORDER BY gap DESC, a_t.doc_id) <= 300),
           |th AS (SELECT quantile_cont(gap, 0.25) AS t1,
           |  quantile_cont(gap, 0.5) AS t2, quantile_cont(gap, 0.75) AS t3 FROM sel),
           |b AS (SELECT doc_id, gap,
           |  (CASE WHEN gap > t1 THEN 1 ELSE 0 END
           |   + CASE WHEN gap > t2 THEN 1 ELSE 0 END
           |   + CASE WHEN gap > t3 THEN 1 ELSE 0 END) AS bucket,
           |  ${fp60Sql("(CAST(doc_id AS VARCHAR) || ':v6')")} AS hh
           |  FROM sel CROSS JOIN th),
           |cur AS (SELECT doc_id, bucket,
           |  row_number() OVER (PARTITION BY bucket ORDER BY hh, doc_id) - 1 AS pos
           |  FROM b),
           |nt AS (SELECT tk.doc_id, CAST(len(tk.toks) AS BIGINT) AS n_tokens
           |  FROM tk JOIN sel ON sel.doc_id = tk.doc_id),
           |pk AS (SELECT cur.doc_id, cur.bucket, cur.pos, nt.n_tokens,
           |  ${fp60Sql("(CAST(cur.doc_id AS VARCHAR) || ':v6p')")} % 4 AS shard
           |  FROM cur JOIN nt ON nt.doc_id = cur.doc_id),
           |pb AS (SELECT *, CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard
           |  ORDER BY bucket, pos, doc_id
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           |  AS tokens_before FROM pk),
           |pf AS (SELECT *, CAST(floor(tokens_before / 512.0) AS BIGINT) AS bin FROM pb)
           |SELECT CAST(bucket AS INT) AS bucket, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           |  CAST(count(DISTINCT shard * 100000 + bin) AS BIGINT) AS n_bins
           |FROM pf GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ==================== corpus diagnostics ====================

    // ---- Per-source unigram KL divergence vs the corpus mixture over the
    //      top-256 vocabulary + lumped OOV, add-one smoothed — the drift
    //      measure a mixture designer reads before weighting sources. One
    //      explode/partial-agg pass; everything after the vocab cap is
    //      (sources × 256)-bounded. Terms are 9-decimal-rounded decimal
    //      sums (order-independent; ln is the only transcendental).
    "q_text_kl_by_source" -> Q(
      (s, d) => graft.operators.Diagnostics.unigramKlBySource(
        Tables.documents(s, d), "source", "text", vocabSize = 256),
      Some(s"""WITH t AS (SELECT source, $ToksSql AS toks FROM documents),
        |e AS (SELECT source, unnest(toks) AS tok FROM t),
        |sc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY 1, 2),
        |cc AS (SELECT tok, CAST(sum(cnt) AS BIGINT) AS qcnt FROM sc GROUP BY 1),
        |vocab AS (SELECT tok, qcnt FROM cc ORDER BY qcnt DESC, tok LIMIT 256),
        |st AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS total FROM sc GROUP BY 1),
        |ct AS (SELECT CAST((SELECT sum(total) FROM st) AS BIGINT) AS q_total,
        |  CAST((SELECT sum(qcnt) FROM vocab) AS BIGINT) AS q_invocab,
        |  CAST((SELECT count(*) FROM vocab) AS BIGINT) AS v_n),
        |grid AS (SELECT st.source, st.total, v.tok, v.qcnt,
        |  CAST(coalesce(sc.cnt, 0) AS BIGINT) AS c
        |  FROM st CROSS JOIN vocab v
        |  LEFT JOIN sc ON sc.source = st.source AND sc.tok = v.tok),
        |siv AS (SELECT source, any_value(total) AS total,
        |  CAST(sum(c) AS BIGINT) AS invocab FROM grid GROUP BY 1),
        |entries AS (
        |  SELECT source, total, c, qcnt FROM grid
        |  UNION ALL
        |  SELECT siv.source, siv.total, siv.total - siv.invocab AS c,
        |    ct.q_total - ct.q_invocab AS qcnt FROM siv CROSS JOIN ct),
        |scored AS (SELECT source, total,
        |  CAST(round(
        |    (CAST(c + 1 AS DOUBLE) / CAST(total + v_n + 1 AS DOUBLE))
        |    * ln((CAST(c + 1 AS DOUBLE) / CAST(total + v_n + 1 AS DOUBLE))
        |        / (CAST(qcnt + 1 AS DOUBLE) / CAST(q_total + v_n + 1 AS DOUBLE))),
        |    9) AS DECIMAL(28,9)) AS term
        |  FROM entries CROSS JOIN ct)
        |SELECT s2.source, any_value(s2.total) AS n_tokens,
        |  CAST(any_value(siv.total - siv.invocab) AS BIGINT) AS oov_tokens,
        |  CAST(round(sum(s2.term), 6) AS DOUBLE) AS kl_nats
        |FROM scored s2 JOIN siv ON siv.source = s2.source
        |GROUP BY s2.source ORDER BY s2.source""".stripMargin)),

    // ---- Per-source drift report: cross-entropy (avg NLL) + OOV rate of
    //      each source against the :lm1-split reference unigram model —
    //      the batch twin of the streaming drift monitor (rising avg-NLL /
    //      OOV on a feed = distribution drift). Scan-stage broadcast
    //      lookup per token; decimal log-prob sums.
    "q_text_surprise_by_source" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val ref = docs.filter(graft.operators.Sampling.split(
          col("doc_id"), 80, 10, salt = ":lm1") === "train")
        graft.operators.Diagnostics.surpriseBySource(docs, "source", "text",
          graft.operators.Diagnostics.surpriseModel(ref, "text", vocabSize = 256))
      },
      Some(s"""WITH t AS (SELECT doc_id, source, $ToksSql AS toks FROM documents),
        |ref AS (SELECT * FROM t
        |  WHERE ${fp60Sql("CAST(doc_id AS VARCHAR) || ':lm1'")} % 100 < 80),
        |re AS (SELECT unnest(toks) AS tok FROM ref),
        |uraw AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM re GROUP BY 1),
        |tot AS (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS n FROM uraw),
        |vocab AS (SELECT tok, c FROM uraw ORDER BY c DESC, tok LIMIT 256),
        |vs AS (SELECT CAST(count(*) AS BIGINT) AS u,
        |  CAST(COALESCE(sum(c), 0) AS BIGINT) AS cs FROM vocab),
        |lq AS (SELECT tok, round(ln(CAST(c + 1 AS DOUBLE)
        |  / CAST((SELECT n FROM tot) + (SELECT u FROM vs) + 1 AS DOUBLE)), 9) AS lnq
        |  FROM vocab),
        |ov AS (SELECT round(ln(CAST(n - cs + 1 AS DOUBLE)
        |  / CAST(n + u + 1 AS DOUBLE)), 9) AS lnq_oov FROM tot, vs),
        |e AS (SELECT source, unnest(toks) AS tok FROM t),
        |sc2 AS (SELECT e.source,
        |  CASE WHEN v.lnq IS NULL THEN 1 ELSE 0 END AS oov,
        |  CAST(COALESCE(v.lnq, (SELECT lnq_oov FROM ov)) AS DECIMAL(28,9)) AS lp
        |  FROM e LEFT JOIN lq v ON v.tok = e.tok)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(oov) AS DOUBLE) / count(*), 6) AS oov_rate,
        |  round(-(CAST(sum(lp) AS DOUBLE)) / count(*), 6) AS avg_nll
        |FROM sc2 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Zipf rank-frequency slope over the top-512 vocabulary: OLS of
    //      ln(count) on ln(rank) from exact decimal sums — corpus health in
    //      one row (natural text ≈ -1; templated boilerplate much shallower).
    "q_text_zipf_slope" -> Q(
      (s, d) => graft.operators.Diagnostics.zipfSlope(
        Tables.documents(s, d), "text", vocabSize = 512),
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |e AS (SELECT unnest(toks) AS tok FROM t),
        |cc AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY 1),
        |v AS (SELECT tok, cnt FROM cc ORDER BY cnt DESC, tok LIMIT 512),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rank FROM v),
        |x AS (SELECT round(ln(CAST(rank AS DOUBLE)), 9) AS xr,
        |  round(ln(CAST(cnt AS DOUBLE)), 9) AS yr FROM r),
        |dm AS (SELECT CAST(xr AS DECIMAL(28,9)) AS xd, CAST(yr AS DECIMAL(28,9)) AS yd,
        |  CAST(round(xr * yr, 9) AS DECIMAL(28,9)) AS xyd,
        |  CAST(round(xr * xr, 9) AS DECIMAL(28,9)) AS x2d FROM x),
        |sm AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum(xd) AS DOUBLE) AS sx, CAST(sum(yd) AS DOUBLE) AS sy,
        |  CAST(sum(xyd) AS DOUBLE) AS sxy, CAST(sum(x2d) AS DOUBLE) AS sx2 FROM dm)
        |SELECT n_terms,
        |  CAST(round((n_terms * sxy - sx * sy) / (n_terms * sx2 - sx * sx), 6)
        |    AS DOUBLE) AS slope,
        |  CAST(round((sy - (n_terms * sxy - sx * sy) / (n_terms * sx2 - sx * sx) * sx)
        |    / n_terms, 6) AS DOUBLE) AS intercept
        |FROM sm""".stripMargin)),

    // ---- Count-Min sketch heavy hitters: a 4×1024 integer counter matrix
    //      (mergeable partial-agg cells — the 100 TB shape: each executor
    //      folds its split into ≤ d×w cells and only those merge), probed
    //      for the top-40 tokens by min-of-counters estimate with the exact
    //      count as the audit column. The sketch is all-integer over the
    //      shared md5-fp60, so the approximation itself is bit-exact
    //      reproducible — an approx operator with a FULL hash oracle.
    "q_text_cms_topk" -> Q(
      (s, d) => graft.operators.Diagnostics.cmsTopK(
        Tables.documents(s, d), "text", depth = 4, width = 1024, k = 40),
      Some {
        val probe = (0 until 4).map { r =>
          s"SELECT tok, $r AS r, ${fp60Sql(s"(tok || ':cms$r')")} % 1024 AS c FROM exact"
        }.mkString("", " UNION ALL ", "")
        s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |e AS (SELECT unnest(toks) AS tok FROM t),
        |exact AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY 1),
        |probes AS ($probe),
        |cells AS (SELECT p2.r, p2.c, CAST(sum(e2.cnt) AS BIGINT) AS cell_cnt
        |  FROM probes p2 JOIN exact e2 ON e2.tok = p2.tok GROUP BY 1, 2),
        |est AS (SELECT p.tok, CAST(min(coalesce(cl.cell_cnt, 0)) AS BIGINT) AS est_cnt
        |  FROM probes p LEFT JOIN cells cl ON cl.r = p.r AND cl.c = p.c
        |  GROUP BY 1)
        |SELECT est.tok, est.est_cnt, exact.cnt AS exact_cnt
        |FROM est JOIN exact ON exact.tok = est.tok
        |ORDER BY est.est_cnt DESC, est.tok LIMIT 40""".stripMargin
      }),

    // ---- Exact rank-based token-length quantiles (round 15): the
    //      sequence-length distribution read before picking packing
    //      budgets / truncation caps. Rank semantics (smallest value whose
    //      cumulative count reaches ceil(q*n)) keep every intermediate an
    //      integer — no interpolation, no sketch error — and the
    //      distinct-value count cells are mergeable across shards (the
    //      100 TB shape). Cumulative counts ride the engine's sharded-
    //      cumsum (never a corpus-scale window partition).
    "q_text_length_quantiles" -> Q(
      (s, d) => graft.operators.Diagnostics.exactQuantiles(
        Tables.documents(s, d).select(
          TextFunctions.tokenCount(col("text")).as("n_toks")),
        col("n_toks"), qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)),
      Some(s"""WITH t AS (SELECT CAST(len($ToksSql) AS BIGINT) AS v FROM documents),
        |c AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1),
        |w AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum FROM c),
        |nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
        |qq(q) AS (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
        |  (CAST(0.75 AS DOUBLE)), (CAST(0.9 AS DOUBLE)), (CAST(0.99 AS DOUBLE))),
        |tg AS (SELECT q, CAST(ceil(q * n) AS BIGINT) AS rank_target, n
        |  FROM qq CROSS JOIN nn)
        |SELECT tg.q, tg.rank_target, CAST(min(w.v) AS BIGINT) AS value, tg.n
        |FROM tg JOIN w ON w.cum >= tg.rank_target
        |GROUP BY 1, 2, 4 ORDER BY q""".stripMargin)),

    // ---- Corpus SNAPSHOT DIFF (round 17): the versioning primitive
    //      between two corpus states — per id: added / removed / changed /
    //      unchanged by content hash, one full-outer join of (id, md5)
    //      scan folds. The "v2 crawl" is derived deterministically from
    //      the same table (every 7th id dropped, every 5th's text edited,
    //      every 11th re-ingested under a shifted id), so both engines
    //      construct the identical pair of snapshots.
    "q_dedup_corpus_diff" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val v2 = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(5)) === 0,
              concat(col("text"), lit(" v2"))).otherwise(col("text")))
          .select("doc_id", "text")
          .unionByName(docs.filter(pmod(col("doc_id"), lit(11)) === 0)
            .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
        graft.operators.Diagnostics.corpusDiff(docs, v2, "doc_id", "text")
          .orderBy("doc_id")
      },
      Some("""WITH v2 AS (
        |  SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
        |    ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 != 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 11 = 0),
        |a AS (SELECT doc_id, md5(text) AS ha FROM documents),
        |b AS (SELECT doc_id, md5(text) AS hb FROM v2)
        |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        | CASE WHEN a.doc_id IS NULL THEN 'added'
        |      WHEN b.doc_id IS NULL THEN 'removed'
        |      WHEN ha != hb THEN 'changed'
        |      ELSE 'unchanged' END AS status
        |FROM a FULL JOIN b ON a.doc_id = b.doc_id
        |ORDER BY doc_id""".stripMargin)),

    // ---- Corpus drift: PSI between crawl slices (round 15): the batch
    //      between-crawl drift report — has the source mix moved enough
    //      that yesterday's thresholds and mixture weights are stale? The
    //      gate splits the corpus into two deterministic "crawls" (doc_id
    //      parity) and reads the per-source PSI terms; add-one smoothing
    //      over the union category set keeps one-sided categories finite.
    "q_text_psi_drift" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Diagnostics.psiByCategory(
          docs.filter(pmod(col("doc_id"), lit(2)) === 0),
          docs.filter(pmod(col("doc_id"), lit(2)) === 1),
          col("source"))
      },
      Some("""WITH r AS (SELECT source AS cat, count(*) AS n_ref FROM documents
        |  WHERE doc_id % 2 = 0 AND source IS NOT NULL GROUP BY 1),
        |c AS (SELECT source AS cat, count(*) AS n_cur FROM documents
        |  WHERE doc_id % 2 = 1 AND source IS NOT NULL GROUP BY 1),
        |j AS (SELECT COALESCE(r.cat, c.cat) AS cat,
        |  CAST(COALESCE(n_ref, 0) AS BIGINT) AS n_ref,
        |  CAST(COALESCE(n_cur, 0) AS BIGINT) AS n_cur
        |  FROM r FULL JOIN c ON r.cat = c.cat),
        |t AS (SELECT sum(n_ref) AS nr, sum(n_cur) AS nc, count(*) AS k FROM j),
        |p AS (SELECT cat, n_ref, n_cur,
        |  (CAST(n_ref AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |    / CAST((SELECT nr + k FROM t) AS DOUBLE) AS pr,
        |  (CAST(n_cur AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |    / CAST((SELECT nc + k FROM t) AS DOUBLE) AS pc
        |  FROM j)
        |SELECT cat, n_ref, n_cur,
        |  CAST(round(pr, 9) AS DOUBLE) AS p_ref,
        |  CAST(round(pc, 9) AS DOUBLE) AS p_cur,
        |  CAST(round((pc - pr) * ln(pc / pr), 9) AS DOUBLE) AS psi_term
        |FROM p ORDER BY cat""".stripMargin)),

    // ---- Evasion-resistant dedup (round 15): a copied document that swaps
    //      Latin letters for identical-looking Cyrillic/Greek homoglyphs
    //      and sprinkles zero-width characters hashes differently and walks
    //      through exact dedup. The gate builds deterministic evaded twins
    //      for half the corpus, then counts distinct content hashes RAW vs
    //      FOLDED (TextFunctions.foldConfusables: strip invisibles, map the
    //      curated homoglyph alphabet back) — folding collapses every twin
    //      back onto its source. Scan-stage Column trees; one agg.
    "q_dedup_confusable_fold" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val evaded = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("​"), // ZWSP — the invisible-evasion seed
              translate(col("text"), "aeopcxis", "аеорсхіѕ")).as("text"))
        docs.unionByName(evaded).agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("raw_distinct"),
          countDistinct(md5(TextFunctions.foldConfusables(col("text"))))
            .as("folded_distinct"))
      },
      Some {
        val zw = """[\x{200B}\x{200C}\x{200D}\x{FEFF}\x{00AD}]"""
        val from = graft.functions.TextFunctions.ConfusablesFrom
        val to = graft.functions.TextFunctions.ConfusablesTo
        s"""WITH base AS (SELECT doc_id, text FROM documents),
        |ev AS (SELECT doc_id + 1000000 AS doc_id,
        |  chr(8203) || translate(text, 'aeopcxis',
        |    'аеорсхіѕ') AS text
        |  FROM base WHERE doc_id % 2 = 0),
        |al AS (SELECT text FROM base UNION ALL SELECT text FROM ev)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS raw_distinct,
        |  CAST(count(DISTINCT md5(translate(
        |    regexp_replace(text, '$zw', '', 'g'), '$from', '$to')))
        |    AS BIGINT) AS folded_distinct
        |FROM al""".stripMargin
      }),

    // ---- Token-MASS quantiles (round 15): the context-budget reading —
    //      the smallest length whose <=-prefix holds q of the corpus's
    //      TOKENS (doc-count quantiles hide that a few long outliers can
    //      carry half the mass). Same rank machinery over the measure
    //      v*cnt; n is the total token mass.
    "q_text_token_mass_quantiles" -> Q(
      (s, d) => {
        val c = Tables.documents(s, d)
          .select(TextFunctions.tokenCount(col("text")).cast("long").as("v"))
          .groupBy("v").agg(count(lit(1)).as("cnt"))
        graft.operators.Diagnostics.massQuantilesFromCounts(
          c, qs = Seq(0.25, 0.5, 0.9, 0.99))
      },
      Some(s"""WITH t AS (SELECT CAST(len($ToksSql) AS BIGINT) AS v FROM documents),
        |c AS (SELECT v, CAST(v * count(*) AS BIGINT) AS cnt FROM t
        |  GROUP BY 1 HAVING v * count(*) > 0),
        |w AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum FROM c),
        |nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
        |qq(q) AS (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
        |  (CAST(0.9 AS DOUBLE)), (CAST(0.99 AS DOUBLE))),
        |tg AS (SELECT q, CAST(ceil(q * n) AS BIGINT) AS rank_target, n
        |  FROM qq CROSS JOIN nn)
        |SELECT tg.q, tg.rank_target, CAST(min(w.v) AS BIGINT) AS value, tg.n
        |FROM tg JOIN w ON w.cum >= tg.rank_target
        |GROUP BY 1, 2, 4 ORDER BY q""".stripMargin)),

    // ---- Group-wise length quantiles (round 15): the per-language
    //      sequence-length distribution — a mixture hides its tails (one
    //      group's p99 is another's p50, and a single global truncation cap
    //      silently amputates the long group). Same rank semantics within
    //      each group; windows only over (group, shard) slices, broadcasts
    //      bounded by the language universe.
    "q_text_length_quantiles_by" -> Q(
      (s, d) => graft.operators.Diagnostics.exactQuantilesBy(
        Tables.documents(s, d).select(col("lang"),
          TextFunctions.tokenCount(col("text")).as("n_toks")),
        "lang", col("n_toks"), qs = Seq(0.5, 0.9, 0.99)),
      Some(s"""WITH t AS (SELECT lang, CAST(len($ToksSql) AS BIGINT) AS v
        |  FROM documents WHERE lang IS NOT NULL),
        |c AS (SELECT lang, v, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1, 2),
        |w AS (SELECT lang, v,
        |  CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY v) AS BIGINT) AS cum FROM c),
        |nn AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
        |qq(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
        |  (CAST(0.99 AS DOUBLE))),
        |tg AS (SELECT lang, q, CAST(ceil(q * n) AS BIGINT) AS rank_target, n
        |  FROM qq CROSS JOIN nn)
        |SELECT tg.lang, tg.q, tg.rank_target, CAST(min(w.v) AS BIGINT) AS value, tg.n
        |FROM tg JOIN w ON w.lang = tg.lang AND w.cum >= tg.rank_target
        |GROUP BY 1, 2, 3, 5 ORDER BY tg.lang, tg.q""".stripMargin)),

    // ---- Truncation-cap audit (round 15): what each candidate cap
    //      (p50/p90/p99 from the exact quantiles) would cost — documents
    //      touched, tokens cut, tokens kept. Composition discipline: ONE
    //      corpus tokenization folded to the value-bounded (v, cnt) frame,
    //      pinned, feeding BOTH the quantile caps and the audit fold (the
    //      q_pipeline_audit lineage pattern); every output is an integer,
    //      bit-exact by construction.
    "q_text_truncation_audit" -> Q(
      (s, d) => {
        val c = Tables.documents(s, d)
          .select(TextFunctions.tokenCount(col("text")).cast("long").as("v"))
          .groupBy("v").agg(count(lit(1)).as("cnt"))
          .gatePersist()
        c.count()
        val caps = graft.operators.Diagnostics
          .exactQuantilesFromCounts(c, qs = Seq(0.5, 0.9, 0.99))
          .select(col("q"), col("value").as("cap"))
        c.crossJoin(broadcast(caps))
          .groupBy("q", "cap")
          .agg(
            sum(when(col("v") > col("cap"), col("cnt")).otherwise(lit(0L)))
              .as("n_docs_over"),
            sum(when(col("v") > col("cap"), col("cnt") * (col("v") - col("cap")))
              .otherwise(lit(0L))).as("tokens_saved"),
            sum(col("cnt") * least(col("v"), col("cap"))).as("tokens_kept"))
          .orderBy("q")
      },
      Some(s"""WITH t AS (SELECT CAST(len($ToksSql) AS BIGINT) AS v FROM documents),
        |c AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1),
        |w AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum FROM c),
        |nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
        |qq(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
        |  (CAST(0.99 AS DOUBLE))),
        |tg AS (SELECT q, CAST(ceil(q * n) AS BIGINT) AS rank_target
        |  FROM qq CROSS JOIN nn),
        |caps AS (SELECT tg.q, CAST(min(w.v) AS BIGINT) AS cap
        |  FROM tg JOIN w ON w.cum >= tg.rank_target GROUP BY 1)
        |SELECT caps.q, caps.cap,
        |  CAST(coalesce(sum(CASE WHEN c.v > caps.cap THEN c.cnt ELSE 0 END), 0) AS BIGINT) AS n_docs_over,
        |  CAST(coalesce(sum(CASE WHEN c.v > caps.cap THEN c.cnt * (c.v - caps.cap) ELSE 0 END), 0) AS BIGINT) AS tokens_saved,
        |  CAST(sum(c.cnt * least(c.v, caps.cap)) AS BIGINT) AS tokens_kept
        |FROM c CROSS JOIN caps GROUP BY 1, 2 ORDER BY q""".stripMargin)),

    // ---- Aho–Corasick multi-pattern phrase screen (round 15): substring
    //      semantics for blocklist entries that span token boundaries or
    //      carry punctuation — ONE corpus scan regardless of pattern count
    //      (a contains-chain is O(patterns x text) and stops codegenning at
    //      list scale). Counts EVERY occurrence end position, overlapping
    //      included ("a a a" contains "a a" twice) — the oracle enumerates
    //      positions to mirror that exactly. Profile = the list audit
    //      (which entries fire, at what volume; zero-hit entries included).
    "q_text_multimatch_profile" -> Q(
      (s, d) => graft.operators.MultiMatch.patternProfile(
        Tables.documents(s, d), "doc_id", "text", MultiMatchPats),
      Some(s"""WITH $MultiMatchOccSql
        |SELECT p.pat AS pattern, CAST(count(o.doc_id) AS BIGINT) AS n_docs,
        |  CAST(coalesce(sum(o.n_hits), 0) AS BIGINT) AS n_hits
        |FROM pats p LEFT JOIN occ o ON o.pat = p.pat
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Per-document phrase-screen flags: every doc (hit or not) with
    //      total occurrences, distinct patterns hit, and the drop flag —
    //      the blocklistFlags output contract for PHRASE lists. Shape: the
    //      sparse (doc, pattern) hit fold, one bounded left join back.
    "q_text_multimatch_screen" -> Q(
      (s, d) => graft.operators.MultiMatch.screenFlags(
          Tables.documents(s, d), "doc_id", "text", MultiMatchPats)
        .select(col("doc_id"), col("n_hits"), col("n_patterns"),
          col("has_hit"))
        .orderBy("doc_id"),
      Some(s"""WITH $MultiMatchOccSql
        |SELECT d.doc_id, CAST(coalesce(sum(o.n_hits), 0) AS BIGINT) AS n_hits,
        |  CAST(count(o.pat) AS BIGINT) AS n_patterns,
        |  coalesce(sum(o.n_hits), 0) > 0 AS has_hit
        |FROM documents d LEFT JOIN occ o ON o.doc_id = d.doc_id
        |GROUP BY 1 ORDER BY d.doc_id""".stripMargin)),

    // ---- Duplicate-cluster size histogram over the Jaccard component
    //      labeling — the "is near-dup removal worth its cost" number: how
    //      much dup mass sits in giant cliques vs a pair tail. Two
    //      partial-agg folds past the labeling; oracle reuses the recursive
    //      connected-components CTE.
    "q_dedup_cluster_stats" -> Q(
      (s, d) => graft.operators.Diagnostics.clusterSizeHistogram(
        Dedup.connectedComponents(
          Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
            threshold = 0.3, maxTokenDf = 100L, tokens = shingleSet))),
      Some(s"""WITH RECURSIVE t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |sh0 AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM t),
        |sh1 AS (SELECT doc_id, $TokenFp60Sql AS tok FROM sh0),
        |sh AS (SELECT doc_id, tok FROM (
        |  SELECT doc_id, tok, count(*) OVER (PARTITION BY tok) AS df FROM sh1)
        |  WHERE df <= 100),
        |sizes AS (SELECT doc_id, count(*) AS n_tok FROM sh GROUP BY 1),
        |common AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
        | GROUP BY 1, 2),
        |pairs AS (
        | SELECT c.id_a, c.id_b
        | FROM common c
        | JOIN sizes sa ON sa.doc_id = c.id_a
        | JOIN sizes sb ON sb.doc_id = c.id_b
        | WHERE CAST(c.common AS DOUBLE) / (sa.n_tok + sb.n_tok - c.common) >= 0.3),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        | SELECT src, dst FROM edges
        | UNION
        | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (SELECT src AS id, least(src, min(dst)) AS comp
        | FROM reach GROUP BY src),
        |cs AS (SELECT comp, CAST(count(*) AS BIGINT) AS cluster_size
        | FROM comp GROUP BY 1)
        |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
        | CAST(cluster_size * count(*) AS BIGINT) AS n_docs
        |FROM cs GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Curriculum interleave: 4 difficulty bands by exact token-count
    //      percentiles, hash-shuffled within band, round-robin across bands
    //      via ORDER BY (pos, bucket). The within-band rank is globally
    //      exact yet two-phase sharded (shard = hash top bits, so shard
    //      ranges are contiguous in the shuffle key — see
    //      Sampling.curriculumInterleave); the oracle uses the plain
    //      single-threaded window the sharded plan must reproduce.
    "q_sample_curriculum" -> Q(
      (s, d) => {
        val scored = docsP(s, d).select(col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("score"))
        graft.operators.Sampling.curriculumInterleave(
            scored, col("doc_id"), col("score"), nBuckets = 4, shards = 8,
            salt = ":cur1")
          .select(col("doc_id"), col("score"), col("bucket").cast("int").as("bucket"),
            col("pos"))
          .orderBy("pos", "bucket")
      },
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |sc AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS score FROM t),
        |th AS (SELECT quantile_cont(score, 0.25) AS t1,
        |  quantile_cont(score, 0.5) AS t2, quantile_cont(score, 0.75) AS t3 FROM sc),
        |b AS (SELECT doc_id, score,
        |  (CASE WHEN score > t1 THEN 1 ELSE 0 END
        |   + CASE WHEN score > t2 THEN 1 ELSE 0 END
        |   + CASE WHEN score > t3 THEN 1 ELSE 0 END) AS bucket,
        |  ${fp60Sql("(CAST(doc_id AS VARCHAR) || ':cur1')")} AS h
        |  FROM sc CROSS JOIN th)
        |SELECT doc_id, score, CAST(bucket AS INT) AS bucket,
        |  CAST(row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) - 1
        |    AS BIGINT) AS pos
        |FROM b ORDER BY pos, bucket""".stripMargin)),

    // ---- Cross-source duplication matrix on the 5-token-prefix content
    //      key — the provenance-overlap report. Pair counts come from
    //      per-(key, source) count products, so a viral duplicate costs one
    //      row per source, never a quadratic pair space.
    "q_dedup_cross_source" -> Q(
      (s, d) => graft.operators.Diagnostics.crossSourceDupMatrix(
        docsP(s, d),
        md5(array_join(slice(TextFunctions.tokens(col("text")), 1, 5), " ")),
        "source"),
      Some(s"""WITH t AS (SELECT source, $ToksSql AS toks FROM documents),
        |ks AS (SELECT source,
        |  md5(coalesce(array_to_string(toks[1:5], ' '), '')) AS k FROM t),
        |cnt AS (SELECT k, source, CAST(count(*) AS BIGINT) AS c
        |  FROM ks GROUP BY 1, 2),
        |px AS (SELECT a.source AS source_a, b.source AS source_b,
        |  CASE WHEN a.source = b.source THEN a.c * (a.c - 1) // 2
        |       ELSE a.c * b.c END AS pairs
        |  FROM cnt a JOIN cnt b ON a.k = b.k AND a.source <= b.source)
        |SELECT source_a, source_b, CAST(sum(pairs) AS BIGINT) AS n_pairs,
        |  CAST(count(*) AS BIGINT) AS n_groups
        |FROM px WHERE pairs > 0 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Contamination rate by source: the per-feed slice of the
    //      decontamination verdict — which ingest feed is leaking benchmark
    //      text. Same fractions machinery, one groupBy more.
    "q_decontaminate_by_source" -> Q(
      (s, d) => {
        import graft.operators.Decontaminate
        val docs = docsP(s, d)
        val corpus = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
          .select("doc_id", "source", "text")
        val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
          .select("doc_id", "text")
        Decontaminate.fractions(corpus, bench, "doc_id", "text",
            threshold = 0.5, shingleK = ShingleK)
          .join(corpus.select("doc_id", "source"), Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("is_contaminated"), 1L).otherwise(0L)).as("n_contaminated"))
          .withColumn("rate",
            round(col("n_contaminated").cast("double") / col("n_docs"), 6))
          .orderBy("source")
      },
      Some(s"""WITH ct AS (SELECT doc_id, source, text FROM documents
        |  WHERE doc_id % 20 != 0),
        |kt AS (SELECT doc_id, $ToksSql AS toks FROM ct),
        |csh AS (SELECT doc_id, $TokenFp60Sql AS fp FROM
        |  (SELECT doc_id, unnest($ShinglesSql) AS tok FROM kt)),
        |bt AS (SELECT doc_id, $ToksSql AS toks FROM documents WHERE doc_id % 20 = 0),
        |bsh AS (SELECT DISTINCT $TokenFp60Sql AS fp FROM
        |  (SELECT doc_id, unnest($ShinglesSql) AS tok FROM bt)),
        |cm AS (SELECT doc_id, count(*) AS n_matched FROM csh
        |  WHERE fp IN (SELECT fp FROM bsh) GROUP BY 1),
        |cs AS (SELECT doc_id, count(*) AS n_sh FROM csh GROUP BY 1),
        |fr AS (SELECT cs.doc_id,
        |  CAST(coalesce(cm.n_matched, 0) AS DOUBLE) / cs.n_sh >= 0.5 AS is_c
        |  FROM cs LEFT JOIN cm ON cm.doc_id = cs.doc_id)
        |SELECT ct.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN fr.is_c THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        |  round(CAST(sum(CASE WHEN fr.is_c THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS rate
        |FROM fr JOIN ct ON ct.doc_id = fr.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Moore–Lewis cross-entropy-difference selection: an in-domain
    //      bigram LM (trained on the src0-2 slice) vs the :lm1 general
    //      model; keep the top-100 docs by avg-logprob GAP — "looks like my
    //      target domain, not just generically fluent". Both scorers are
    //      the cap-bounded-broadcast perplexity stream; the gate adds one
    //      doc_id join and a TakeOrdered top-k.
    "q_sample_ce_select" -> Q(
      (s, d) => {
        import graft.operators.{LanguageModel, Sampling}
        val docs = Tables.documents(s, d)
        val target = docs.filter(col("source").isin("src0", "src1", "src2"))
        val general = docs.filter(
          Sampling.split(col("doc_id"), 80, 10, salt = ":lm1") === "train")
        LanguageModel.crossEntropySelect(docs, "doc_id", "text",
          targetRef = target, generalRef = general,
          vocabCap = 256, bigramCap = 2048, k = 100)
      },
      Some(s"""WITH tk AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |${pplCtesWhere(256, 2048,
          "doc_id IN (SELECT doc_id FROM documents WHERE source IN ('src0', 'src1', 'src2'))",
          "_t")},
        |${pplCtes(256, 2048, ":lm1")},
        |a_t AS (SELECT doc_id,
        |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS logp_target
        |  FROM sc_t GROUP BY 1),
        |a_g AS (SELECT doc_id,
        |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS logp_general
        |  FROM sc GROUP BY 1)
        |SELECT a_t.doc_id, a_t.logp_target, a_g.logp_general,
        |  round(a_t.logp_target - a_g.logp_general, 6) AS gap
        |FROM a_t JOIN a_g ON a_g.doc_id = a_t.doc_id
        |ORDER BY gap DESC, a_t.doc_id LIMIT 100""".stripMargin)),

    // ---- Fraction-cut variant of the Moore–Lewis selection: keep the top
    //      25 % by gap via a broadcast percentile threshold — the
    //      corpus-proportional shape (a TakeOrdered at k = frac·corpus
    //      would merge k rows per partition on the driver). Ties at the
    //      threshold are kept.
    "q_sample_ce_cut" -> Q(
      (s, d) => {
        import graft.operators.{LanguageModel, Sampling}
        val docs = Tables.documents(s, d)
        LanguageModel.crossEntropyCut(docs, "doc_id", "text",
            targetRef = docs.filter(col("source").isin("src0", "src1", "src2")),
            generalRef = docs.filter(
              Sampling.split(col("doc_id"), 80, 10, salt = ":lm1") === "train"),
            vocabCap = 256, bigramCap = 2048, keepFrac = 0.25)
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |${pplCtesWhere(256, 2048,
          "doc_id IN (SELECT doc_id FROM documents WHERE source IN ('src0', 'src1', 'src2'))",
          "_t")},
        |${pplCtes(256, 2048, ":lm1")},
        |a_t AS (SELECT doc_id,
        |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS logp_target
        |  FROM sc_t GROUP BY 1),
        |a_g AS (SELECT doc_id,
        |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS logp_general
        |  FROM sc GROUP BY 1),
        |sg AS (SELECT a_t.doc_id, a_t.logp_target, a_g.logp_general,
        |  round(a_t.logp_target - a_g.logp_general, 6) AS gap
        |  FROM a_t JOIN a_g ON a_g.doc_id = a_t.doc_id),
        |th AS (SELECT quantile_cont(gap, 0.75) AS t FROM sg)
        |SELECT doc_id, logp_target, logp_general, gap
        |FROM sg CROSS JOIN th WHERE gap >= t ORDER BY doc_id""".stripMargin)),

    // ---- RHO-1-style selective token filter: the TOKEN-level analog of
    //      Moore–Lewis — rank tokens within each doc by the excess
    //      log-prob under the src0-2 in-domain model vs the :lm1 general
    //      model, keep the top 30 % per doc. kept_md5 fingerprints the
    //      kept positions, so the gate pins WHICH tokens survive.
    "q_sample_token_select" -> Q(
      (s, d) => {
        import graft.operators.{LanguageModel, Sampling}
        val docs = Tables.documents(s, d)
        LanguageModel.selectiveTokens(docs, "doc_id", "text",
            targetRef = docs.filter(col("source").isin("src0", "src1", "src2")),
            generalRef = docs.filter(
              Sampling.split(col("doc_id"), 80, 10, salt = ":lm1") === "train"),
            vocabCap = 256, bigramCap = 2048, keepFrac = 0.3)
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |${pplCtesWhere(256, 2048,
          "doc_id IN (SELECT doc_id FROM documents WHERE source IN ('src0', 'src1', 'src2'))",
          "_t")},
        |${pplCtes(256, 2048, ":lm1")},
        |jx AS (SELECT sc_t.doc_id, sc_t.pos,
        |  CAST(sc_t.lp - sc.lp AS DECIMAL(28,9)) AS excess
        |  FROM sc_t JOIN sc ON sc.doc_id = sc_t.doc_id AND sc.pos = sc_t.pos),
        |rk AS (SELECT doc_id, pos, excess,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY excess DESC, pos) AS r,
        |  count(*) OVER (PARTITION BY doc_id) AS n FROM jx),
        |kp AS (SELECT * FROM rk WHERE r <= CAST(ceil(0.3 * n) AS BIGINT))
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  round(CAST(count(*) AS DOUBLE) / max(n), 6) AS kept_frac,
        |  round(CAST(sum(excess) AS DOUBLE) / count(*), 6) AS mean_excess,
        |  md5(array_to_string(list(pos ORDER BY pos), ' ')) AS kept_md5
        |FROM kp GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // ---- One DoReMi domain-reweighting step: per-source excess loss of
    //      the :lm1 proxy model over the src0-2 reference model →
    //      multiplicative weight update with uniform smoothing. The
    //      domains the proxy handles worst gain the most weight.
    "q_pipeline_mixture_doremi" -> Q(
      (s, d) => {
        import graft.operators.{LanguageModel, Sampling}
        val docs = Tables.documents(s, d)
        LanguageModel.doremiWeights(docs, "doc_id", "text", "source",
            proxyRef = docs.filter(
              Sampling.split(col("doc_id"), 80, 10, salt = ":lm1") === "train"),
            refRef = docs.filter(col("source").isin("src0", "src1", "src2")),
            vocabCap = 256, bigramCap = 2048, eta = 1.0, smoothing = 0.01)
          .orderBy("source")
      },
      Some(s"""WITH tk AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |${pplCtesWhere(256, 2048,
          "doc_id IN (SELECT doc_id FROM documents WHERE source IN ('src0', 'src1', 'src2'))",
          "_t")},
        |${pplCtes(256, 2048, ":lm1")},
        |a_r AS (SELECT doc_id,
        |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS lp_r
        |  FROM sc_t GROUP BY 1),
        |a_p AS (SELECT doc_id,
        |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS lp_p
        |  FROM sc GROUP BY 1),
        |gp AS (SELECT d.source,
        |  greatest(CAST(0.0 AS DOUBLE), round(a_r.lp_r - a_p.lp_p, 6)) AS gap
        |  FROM documents d JOIN a_p ON a_p.doc_id = d.doc_id
        |  JOIN a_r ON a_r.doc_id = d.doc_id),
        |pd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(CAST(sum(CAST(gap AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6)
        |    AS excess
        |  FROM gp GROUP BY 1),
        |kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM pd),
        |tm AS (SELECT pd.*, CAST(1.0 AS DOUBLE) / k AS w_init,
        |  CAST(round(exp(CAST(1.0 AS DOUBLE) * excess) / k, 9)
        |    AS DECIMAL(28,9)) AS term, k
        |  FROM pd CROSS JOIN kk),
        |zz AS (SELECT sum(term) AS z FROM tm)
        |SELECT source, n_docs, excess, w_init,
        |  round(CAST(0.99 AS DOUBLE) * (CAST(term AS DOUBLE) / CAST(z AS DOUBLE))
        |    + CAST(0.01 AS DOUBLE) / k, 6) AS w_updated
        |FROM tm CROSS JOIN zz ORDER BY source""".stripMargin)),

    // ---- Selection capstone (round 15): the DSIR/DoReMi-style
    //      data-selection pipeline END TO END, composing the round-14
    //      selection family whose stages were individually gated but never
    //      chained: (1) RHO-1 selective tokens score every doc's token
    //      stream against the in-domain (src0-2) vs general (:lm1) model
    //      pair and keep the top 30 % per doc; (2) DoReMi reweights the
    //      SOURCES from the same model pair's per-domain excess loss;
    //      (3) the DoReMi weights drive a token-budget mixture plan over
    //      the RHO-KEPT token mass (not raw tokens — selection changed the
    //      cost of every doc), realized to epoch-tagged doc copies;
    //      (4) the realized corpus is split leak-free by content group
    //      (every copy of a duplicated text lands in one split). Summary
    //      rows pin replication (id_sum weights each copy by epoch+1), so
    //      a drift in ANY stage — token ranks, domain weights, plan
    //      arithmetic, copy sampling, split hashing — hash-fails.
    "q_pipeline_select_v2" -> Q(
      (s, d) => {
        import graft.operators.{LanguageModel, Sampling}
        val docs = docsP(s, d)
        val targetRef = docs.filter(col("source").isin("src0", "src1", "src2"))
        val generalRef = docs.filter(
          Sampling.split(col("doc_id"), 80, 10, salt = ":lm1") === "train")
        // ONE (in-domain, general) model pair and ONE dual-scoring pass,
        // shared by both selection stages — train-once / score-once
        // (unshared, the chain pays four model trainings and four
        // corpus-scale scoring scans instead of two and two). The scored
        // frame roots two consumers, so it is persisted + materialized.
        val lmT = LanguageModel.trainBigramLm(targetRef, "doc_id", "text",
          vocabCap = 256, bigramCap = 2048)
        val lmG = LanguageModel.trainBigramLm(generalRef, "doc_id", "text",
          vocabCap = 256, bigramCap = 2048)
        val scored = LanguageModel.dualTokenScores(docs, "doc_id", "text",
            lmT, lmG)
          .gatePersist()
        scored.count()
        val sel = LanguageModel.selectiveTokensScored(scored, keepFrac = 0.3)
          .select(col("doc_id"), col("n_kept"))
        val wts = LanguageModel.doremiWeightsScored(docs, "doc_id", "source",
            scored, eta = 1.0, smoothing = 0.01)
          .select(col("source"), col("w_updated").as("weight"))
        // dt roots TWO consumers (the plan's per-source aggregation and the
        // realization join) and sits downstream of the RHO-1 rank window —
        // unpinned, the whole selection chain runs twice. Doc-bounded.
        val dt = docs.select(col("doc_id"), col("source"),
            md5(col("text")).as("grp"))
          .join(sel, Seq("doc_id"))
          .gatePersist()
        dt.count()
        val plan = Sampling.mixturePlan(dt, "source", col("n_kept"), wts,
          budgetTokens = 50000L, maxEpochs = 3.0)
        val realized = Sampling.realizeMixture(dt, "source", col("doc_id"),
          plan, salt = ":sv2")
        Sampling.splitByGroup(realized, col("grp"), 80, 10, salt = ":sv2s")
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n_doc_epochs"),
            countDistinct(col("doc_id")).as("n_docs"),
            sum("n_kept").as("n_kept_tokens"),
            sum(col("doc_id") * (col("epoch") + 1)).as("id_sum"))
          .orderBy("source", "split")
      },
      Some(s"""WITH tk AS (SELECT doc_id, $ToksSql AS toks FROM documents),
        |${pplCtesWhere(256, 2048,
          "doc_id IN (SELECT doc_id FROM documents WHERE source IN ('src0', 'src1', 'src2'))",
          "_t")},
        |${pplCtes(256, 2048, ":lm1")},
        |jx AS (SELECT sc_t.doc_id, sc_t.pos,
        |  CAST(sc_t.lp - sc.lp AS DECIMAL(28,9)) AS excess
        |  FROM sc_t JOIN sc ON sc.doc_id = sc_t.doc_id AND sc.pos = sc_t.pos),
        |rk AS (SELECT doc_id, pos, excess,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY excess DESC, pos) AS r,
        |  count(*) OVER (PARTITION BY doc_id) AS n FROM jx),
        |ks AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept FROM rk
        |  WHERE r <= CAST(ceil(0.3 * n) AS BIGINT) GROUP BY 1),
        |a_r AS (SELECT doc_id,
        |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS lp_r
        |  FROM sc_t GROUP BY 1),
        |a_p AS (SELECT doc_id,
        |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS lp_p
        |  FROM sc GROUP BY 1),
        |gp AS (SELECT d.source,
        |  greatest(CAST(0.0 AS DOUBLE), round(a_r.lp_r - a_p.lp_p, 6)) AS gap
        |  FROM documents d JOIN a_p ON a_p.doc_id = d.doc_id
        |  JOIN a_r ON a_r.doc_id = d.doc_id),
        |pd AS (SELECT source,
        |  round(CAST(sum(CAST(gap AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6)
        |    AS excess
        |  FROM gp GROUP BY 1),
        |kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM pd),
        |tm AS (SELECT pd.source,
        |  CAST(round(exp(CAST(1.0 AS DOUBLE) * excess) / k, 9)
        |    AS DECIMAL(28,9)) AS term, k
        |  FROM pd CROSS JOIN kk),
        |zz AS (SELECT sum(term) AS z FROM tm),
        |wu AS (SELECT source,
        |  round(CAST(0.99 AS DOUBLE) * (CAST(term AS DOUBLE) / CAST(z AS DOUBLE))
        |    + CAST(0.01 AS DOUBLE) / k, 6) AS weight
        |  FROM tm CROSS JOIN zz),
        |dt AS (SELECT d.doc_id, d.source, md5(d.text) AS grp, ks.n_kept
        |  FROM documents d JOIN ks ON ks.doc_id = d.doc_id),
        |c2 AS (SELECT source,
        |  CAST(sum(greatest(n_kept, 0)) AS BIGINT) AS n_tokens
        |  FROM dt GROUP BY 1),
        |wt AS (SELECT sum(CAST(round(weight, 9) AS DECIMAL(28,9))) AS w_tot FROM wu),
        |wn AS (SELECT source, CAST(CAST(round(weight, 9) AS DECIMAL(28,9)) AS DOUBLE)
        |    / CAST(w_tot AS DOUBLE) AS target_w FROM wu, wt),
        |p AS (SELECT c2.source,
        |  CASE WHEN n_tokens > 0 THEN least(CAST(3.0 AS DOUBLE),
        |    (target_w * CAST(50000 AS DOUBLE)) / CAST(n_tokens AS DOUBLE))
        |    ELSE CAST(0.0 AS DOUBLE) END AS epochs
        |  FROM c2 JOIN wn USING (source)),
        |r AS (SELECT dt.doc_id, dt.source, dt.grp, dt.n_kept,
        |  CAST(floor(epochs) AS BIGINT)
        |    + CASE WHEN CAST(${fp60Sql("CAST(doc_id AS VARCHAR) || ':sv2'")} % 10000
        |        AS DOUBLE) < (epochs - floor(epochs)) * 10000.0
        |      THEN 1 ELSE 0 END AS n_copies
        |  FROM dt JOIN p USING (source)),
        |e AS (SELECT doc_id, source, grp, n_kept, unnest(range(n_copies)) AS epoch
        |  FROM r WHERE n_copies > 0),
        |sp AS (SELECT *, CASE WHEN b < 80 THEN 'train'
        |    WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
        |  FROM (SELECT e.*, ${fp60Sql("grp || ':sv2s'")} % 100 AS b FROM e))
        |SELECT source, split, CAST(count(*) AS BIGINT) AS n_doc_epochs,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(sum(n_kept) AS BIGINT) AS n_kept_tokens,
        |  CAST(sum(doc_id * (epoch + 1)) AS BIGINT) AS id_sum
        |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Per-source embedding-centroid drift vs the corpus centroid —
    //      the SEMANTIC sibling of q_text_kl_by_source: cosine between each
    //      source's mean embedding and the global mean, from
    //      (sources × dims)-bounded decimal partial-agg sums (a float avg
    //      would leak partition order into the low bits).
    "q_text_embedding_drift" -> Q(
      (s, d) => graft.operators.Diagnostics.embeddingDriftBySource(
        Tables.documents(s, d), Tables.embeddings(s, d),
        "source", "doc_id", "vec_id", "embedding"),
      Some("""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |dd AS (SELECT doc_id AS id, source FROM documents),
        |j AS (SELECT dd.source, e.v FROM dd JOIN e ON e.id = dd.id),
        |pe0 AS (SELECT source, unnest(v) AS x,
        |  unnest(range(1, len(v) + 1)) AS pos FROM j),
        |pe AS (SELECT source, pos,
        |  CAST(round(x, 9) AS DECIMAL(28,9)) AS xd FROM pe0),
        |ps AS (SELECT source, pos, CAST(sum(xd) AS DECIMAL(38,9)) AS sx,
        |  CAST(count(*) AS BIGINT) AS n FROM pe GROUP BY 1, 2),
        |g AS (SELECT pos, CAST(sum(sx) AS DECIMAL(38,9)) AS gx,
        |  CAST(sum(n) AS BIGINT) AS gn FROM ps GROUP BY 1),
        |m AS (SELECT ps.source, ps.n,
        |  CAST(ps.sx AS DOUBLE) / ps.n AS mi,
        |  CAST(g.gx AS DOUBLE) / g.gn AS gi
        |  FROM ps JOIN g ON g.pos = ps.pos),
        |t2 AS (SELECT source, n,
        |  CAST(round(mi * gi, 9) AS DECIMAL(28,9)) AS dotd,
        |  CAST(round(mi * mi, 9) AS DECIMAL(28,9)) AS nad,
        |  CAST(round(gi * gi, 9) AS DECIMAL(28,9)) AS nbd FROM m),
        |f AS (SELECT source, max(n) AS n_vecs,
        |  round(CAST(sum(dotd) AS DOUBLE)
        |    / (sqrt(CAST(sum(nad) AS DOUBLE)) * sqrt(CAST(sum(nbd) AS DOUBLE))),
        |    6) AS cos_centroid
        |  FROM t2 GROUP BY 1)
        |SELECT source, n_vecs, cos_centroid,
        |  round(1.0 - cos_centroid, 6) AS drift
        |FROM f ORDER BY source""".stripMargin)),

    // ---- Curation audit log: per-document FIRST-drop-reason verdict over
    //      the q_pipeline_corpus_curate chain (quality → lang → exact-dup
    //      keeper → benchmark holdout → decontamination → source cap) — the
    //      "why is this document not in my training set" explainability
    //      surface; the kept-side of every stage is the capstone gate, this
    //      is its inverse with receipts. Stage flags are left-joined
    //      subpopulation frames (all doc_id equi-joins); the verdict itself
    //      is one scan-stage first-fail expression.
    "q_pipeline_audit" -> Q(
      (s, d) => {
        import graft.operators.{Curation, Decontaminate}
        // the quality/lang scan roots FIVE consumers (gated -> keepers /
        // kept / decon / inCap plus the final verdict join): persist it —
        // and the two other twice-read stages — or each branch re-runs the
        // full upstream scan (measured 12.6 s solo unpinned, r13 verdict)
        val base = docsP(s, d).select(
            col("doc_id"), col("text"), col("source"),
            TextFunctions.qualityScore(col("text")).as("quality"),
            TextFunctions.langId(col("text")).as("lang"))
          .gatePersist()
        base.count()
        val gated = base.filter(col("quality") >= 0.6 && col("lang") === "en")
        val grp = Window.partitionBy(md5(col("text")))
        val keepers = gated
          .withColumn("is_keeper", col("doc_id") === min("doc_id").over(grp))
          .select(col("doc_id"), col("is_keeper"))
        val kept = gated
          .join(keepers.filter(col("is_keeper")), Seq("doc_id"), "left_semi")
          .filter(pmod(col("doc_id"), lit(20)) =!= 0)
          .select("doc_id", "source", "text")
          .gatePersist()
        kept.count()
        val bench = docsP(s, d).filter(pmod(col("doc_id"), lit(20)) === 0)
          .select("doc_id", "text")
        val decon = Decontaminate.fractions(kept, bench, "doc_id", "text",
            threshold = 0.5, shingleK = ShingleK)
          .select(col("doc_id"), col("is_contaminated"))
          .gatePersist()
        decon.count()
        val clean = kept.join(
          decon.filter(!col("is_contaminated")), Seq("doc_id"), "left_semi")
        val inCap = Curation.capPerKey(clean, col("source"), n = 40,
            order = Seq(col("doc_id")), idCol = col("doc_id"))
          .select(col("doc_id"), lit(true).as("in_cap"))
        base
          .join(keepers, Seq("doc_id"), "left")
          .join(decon, Seq("doc_id"), "left")
          .join(inCap, Seq("doc_id"), "left")
          .withColumn("verdict", Curation.firstFailVerdict(Seq(
            "low_quality" -> (col("quality") < 0.6),
            "lang_other" -> (col("lang") =!= "en"),
            "exact_dup" -> !col("is_keeper"),
            "bench_holdout" -> (pmod(col("doc_id"), lit(20)) === 0),
            "contaminated" -> coalesce(col("is_contaminated"), lit(false)),
            "source_capped" -> !coalesce(col("in_cap"), lit(false)))))
          .select(col("doc_id"), col("source"), col("verdict"))
          .orderBy("doc_id")
      },
      Some {
        val langNames = TextFunctions.LangMarkers.map(_._1)
        val langHits = TextFunctions.LangMarkers.map { case (lang, ms) =>
          s"len(list_filter(toks, x -> x IN (${ms.map(m => s"'$m'").mkString(", ")}))) AS h_$lang"
        }.mkString(", ")
        val greatestH = s"greatest(${langNames.map("h_" + _).mkString(", ")})"
        val langCase = langNames.map(l => s"WHEN h_$l = m THEN '$l'").mkString(" ")
        s"""WITH t AS (SELECT doc_id, text, source, $ToksSql AS toks FROM documents),
           |h AS (SELECT *, $langHits FROM t),
           |g AS (SELECT *, $greatestH AS m FROM h),
           |scored AS (SELECT doc_id, text, source,
           | ((((CASE WHEN length(text) BETWEEN 50 AND 10000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
           |  + (CASE WHEN $StopRatioSql > 0.01 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
           |  + (CASE WHEN $PunctRatioSql < 0.2 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
           |  + (CASE WHEN $AvgTokLenSql BETWEEN 2.0 AND 12.0 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)) AS quality,
           | CASE WHEN m = 0 THEN 'und' $langCase END AS lang
           |FROM g),
           |gated AS (SELECT * FROM scored WHERE quality >= 0.6 AND lang = 'en'),
           |keepers AS (SELECT doc_id,
           |  doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_keeper
           |  FROM gated),
           |kept AS (SELECT g2.doc_id, g2.source, g2.text FROM gated g2
           |  JOIN keepers k2 ON k2.doc_id = g2.doc_id
           |  WHERE k2.is_keeper AND g2.doc_id % 20 != 0),
           |kt AS (SELECT doc_id, $ToksSql AS toks FROM kept),
           |csh AS (SELECT doc_id, $TokenFp60Sql AS fp FROM
           |  (SELECT doc_id, unnest($ShinglesSql) AS tok FROM kt)),
           |bt AS (SELECT doc_id, $ToksSql AS toks FROM documents WHERE doc_id % 20 = 0),
           |bsh AS (SELECT DISTINCT $TokenFp60Sql AS fp FROM
           |  (SELECT doc_id, unnest($ShinglesSql) AS tok FROM bt)),
           |cm AS (SELECT doc_id, count(*) AS n_matched FROM csh
           |  WHERE fp IN (SELECT fp FROM bsh) GROUP BY 1),
           |cs AS (SELECT doc_id, count(*) AS n_sh FROM csh GROUP BY 1),
           |contam AS (SELECT cs.doc_id,
           |  CAST(coalesce(cm.n_matched, 0) AS DOUBLE) / cs.n_sh >= 0.5 AS is_contaminated
           |  FROM cs LEFT JOIN cm ON cm.doc_id = cs.doc_id),
           |clean AS (SELECT k3.doc_id, k3.source FROM kept k3
           |  JOIN contam c3 ON c3.doc_id = k3.doc_id WHERE NOT c3.is_contaminated),
           |capd AS (SELECT doc_id FROM (
           |  SELECT doc_id, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
           |  FROM clean) WHERE rk <= 40)
           |SELECT s.doc_id, s.source, CASE
           | WHEN s.quality < 0.6 THEN 'low_quality'
           | WHEN s.lang != 'en' THEN 'lang_other'
           | WHEN NOT k.is_keeper THEN 'exact_dup'
           | WHEN s.doc_id % 20 = 0 THEN 'bench_holdout'
           | WHEN c.is_contaminated THEN 'contaminated'
           | WHEN cp.doc_id IS NULL THEN 'source_capped'
           | ELSE 'kept' END AS verdict
           |FROM scored s
           |LEFT JOIN keepers k ON k.doc_id = s.doc_id
           |LEFT JOIN contam c ON c.doc_id = s.doc_id
           |LEFT JOIN capd cp ON cp.doc_id = s.doc_id
           |ORDER BY s.doc_id""".stripMargin
      }),

    // ==================== multimodal plumbing ====================

    "q_multimodal_meta" -> Q(
      (s, d) => Multimodal.metaStats(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text", "source"))
        .orderBy("kind"),
      Some("""SELECT 'image' AS kind, count(*) AS n,
        | CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        | count(DISTINCT sha256(text)) AS distinct_payloads
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin)),

    // Feature extraction runs the Column-tree decode stub; features are
    // emitted as per-dim f0..f7 doubles (sortable/hashable by the oracle
    // harness — a raw array<double> column is not) and mirrored bit-for-bit
    // in DuckDB via the same hex fold.
    "q_multimodal_features" -> Q(
      (s, d) => Multimodal.fakeDecodeFeatures(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text", "source"))
        .select(Seq(col("media_id"), col("kind"),
            col("meta.byte_len").as("byte_len")) ++
          (0 until 8).map(j => element_at(col("features"), j + 1).as(s"f$j")): _*)
        .orderBy("media_id"),
      Some(s"""WITH m AS (SELECT doc_id AS media_id, encode(text) AS payload FROM documents),
        |b AS (SELECT media_id, hex(payload) AS hx, octet_length(payload) AS len FROM m)
        |SELECT media_id, 'image' AS kind, CAST(len AS BIGINT) AS byte_len,
        | ${(0 until 8).map(featureLaneSql).mkString(",\n ")}
        |FROM b ORDER BY media_id""".stripMargin)),

    // REAL image decode (round 14): documents become genuine binary P6 PPM
    // payloads (width 4, full 12-byte pixel rows, zero-padded min row), and
    // the mapPartitions kernel PARSES them — magic, ASCII dims, maxval,
    // RGB plane — into per-channel byte means. The oracle never sees the
    // decoder: it mirrors the construction analytically from the text
    // bytes, so a parser bug (wrong header length, channel off-by-one)
    // hash-fails. Integer-exact sums, one division — bit-identical.
    "q_multimodal_ppm_decode" -> Q(
      (s, d) => Multimodal.decodePpmFeatures(Multimodal.encodePpm(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text", "source")))
        .orderBy("media_id"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        def chanMean(c: Int) =
          s"""CAST(list_sum(list_transform(range(0, h*4),
             |   k -> CASE WHEN k*3 + ${c + 1} <= len THEN ${byteAt(s"k*3 + ${c + 1}")} ELSE 0 END)) AS DOUBLE)
             | / CAST(h*4 AS DOUBLE)""".stripMargin
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, len // 12) AS h FROM m)
        |SELECT media_id, 4 AS width, CAST(h AS INT) AS height, 255 AS maxval,
        | ${chanMean(0)} AS mean_r,
        | ${chanMean(1)} AS mean_g,
        | ${chanMean(2)} AS mean_b,
        | true AS is_valid
        |FROM d ORDER BY media_id""".stripMargin
      }),

    // REAL image resize (round 15 — replaces the re-encode stub): the PPM
    // corpus is box-filter downsampled to 2 x min(2, h) with exact integer
    // arithmetic (per-box byte sums, half-up integer mean), re-encoded as
    // P6, and THEN decoded — so the gate hashes features of genuinely
    // resampled bytes. The oracle never sees either kernel: it mirrors the
    // box boundaries (floor-division spans), the half-up mean, and the
    // final channel means analytically from the text bytes, so a box
    // off-by-one, a rounding drift, or a re-encode header bug hash-fails.
    "q_multimodal_ppm_resize" -> Q(
      (s, d) => Multimodal.decodePpmFeatures(Multimodal.resizePpm(
          Multimodal.encodePpm(
            Multimodal.fromText(Tables.documents(s, d), "doc_id", "text", "source")),
          outW = 2, outH = 2))
        .orderBy("media_id"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        // resized pixel value for channel c at flat index i (y2 = i//2,
        // x2 = i%2): half-up integer mean over the (floor-division) source
        // box rows [y2*h//h2, (y2+1)*h//h2) x cols [2*x2, 2*x2+2)
        def pixVal(c: Int) =
          s"""(2 * list_sum(list_transform(range(i//2*h//h2, (i//2+1)*h//h2), yy ->
             |   list_sum(list_transform(range(i%2*2, i%2*2+2), xx ->
             |     CASE WHEN yy*12 + xx*3 + ${c + 1} <= len
             |      THEN ${byteAt(s"yy*12 + xx*3 + ${c + 1}")} ELSE 0 END))))
             | + ((i//2+1)*h//h2 - i//2*h//h2) * 2)
             | // (2 * ((i//2+1)*h//h2 - i//2*h//h2) * 2)""".stripMargin
        def chanMean(c: Int) =
          s"""CAST(list_sum(list_transform(range(0, h2*2), i -> ${pixVal(c)}))
             |  AS DOUBLE) / CAST(h2*2 AS DOUBLE)""".stripMargin
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, len // 12) AS h FROM m),
        |d2 AS (SELECT media_id, hx, len, h, least(2, h) AS h2 FROM d)
        |SELECT media_id, 2 AS width, CAST(h2 AS INT) AS height, 255 AS maxval,
        | ${chanMean(0)} AS mean_r,
        | ${chanMean(1)} AS mean_g,
        | ${chanMean(2)} AS mean_b,
        | true AS is_valid
        |FROM d2 ORDER BY media_id""".stripMargin
      }),

    // ---- Perceptual image hash (round 15): aHash over decoded pixels —
    //      the IMAGE member of the dedup family (re-encoded or uniformly
    //      brightened copies collapse under groupBy(ahash), the byte hash
    //      doesn't). All-integer mean threshold (n*luma > total), bits off
    //      half-up box means under the resize contract. The gate also pins
    //      the aligned-downscale fixpoint: hashing a 4x4 pre-resample of
    //      the image equals hashing the image. The oracle derives the hash
    //      analytically from the text bytes — neither kernel is trusted.
    "q_multimodal_ahash" -> Q(
      (s, d) => {
        val media = Multimodal.encodePpm(Multimodal.fromText(
          Tables.documents(s, d), "doc_id", "text", "source"))
        val direct = Multimodal.aHashFeatures(media, grid = 4)
          .select(col("media_id"), col("ahash"), col("n_bits"),
            col("grid_h"))
        val pre = Multimodal.aHashFeatures(
            Multimodal.resizePpm(media, 4, 4), grid = 4)
          .select(col("media_id"), col("ahash").as("ahash_pre"))
        direct.join(pre, Seq("media_id"))
          .withColumn("scale_invariant", col("ahash") === col("ahash_pre"))
          .orderBy("media_id")
      },
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        // half-up box mean for channel c of resampled cell i: single source
        // column x = i%4, source rows [i//4*h/h2, (i//4+1)*h/h2)
        def pv(c: Int) =
          s"""((2 * list_sum(list_transform(range(i//4*h//h2, (i//4+1)*h//h2), yy ->
             |   CASE WHEN yy*12 + (i%4)*3 + ${c + 1} <= len
             |    THEN ${byteAt(s"yy*12 + (i%4)*3 + ${c + 1}")} ELSE 0 END))
             | + ((i//4+1)*h//h2 - i//4*h//h2))
             | // (2 * ((i//4+1)*h//h2 - i//4*h//h2)))""".stripMargin
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, len // 12) AS h FROM m),
        |d2 AS (SELECT media_id, hx, len, h, least(4, h) AS h2 FROM d),
        |lum AS (SELECT media_id, h2, g.i,
        |    ${pv(0)} + ${pv(1)} + ${pv(2)} AS luma
        |  FROM d2 CROSS JOIN (SELECT unnest(range(0, 16)) AS i) g
        |  WHERE g.i < h2 * 4),
        |hsh AS (SELECT media_id, CAST(max(h2) AS INT) AS grid_h,
        |    CAST(max(h2) * 4 AS INT) AS n_bits,
        |    CAST(coalesce(sum(CASE WHEN (h2*4) * luma > (SELECT sum(l2.luma)
        |        FROM lum l2 WHERE l2.media_id = lum.media_id)
        |      THEN (CAST(1 AS BIGINT) << CAST(h2*4 - 1 - i AS INT))
        |      ELSE 0 END), 0) AS BIGINT) AS ahash
        |  FROM lum GROUP BY media_id)
        |SELECT media_id, ahash, n_bits, grid_h, ahash AS ahash_pre,
        |  true AS scale_invariant
        |FROM hsh ORDER BY media_id""".stripMargin
      }),

    // ---- DCT perceptual hash (round 19): the frequency-domain image
    //      fingerprint beside the mean-threshold aHash — box-resample to
    //      the 16×16 grid (narrow corpus images letterbox with zeros),
    //      luma = r+g+b, separable Q15 DCT-II (driver-constant tables,
    //      the hannQ15 convention), 8×8 low block, bits vs the median of
    //      the 63 AC coefficients, DC bit 0. All integer; the oracle
    //      replays resample → luma → two DCT passes → ordinal median
    //      (row_number 32 of 63) → power-of-two pack from the raw text
    //      bytes. The resizePpm twin pins grid-fixpoint invariance, the
    //      ahash gate's scale_invariant contract.
    "q_multimodal_phash" -> Q(
      (s, d) => {
        val media = Multimodal.encodePpm(Multimodal.fromText(
          Tables.documents(s, d), "doc_id", "text", "source"))
        val direct = Multimodal.pHashFeatures(media)
          .select(col("media_id"), col("phash"), col("dct_median"),
            col("grid_w"), col("grid_h"))
        val pre = Multimodal.pHashFeatures(
            Multimodal.resizePpm(media, 16, 16))
          .select(col("media_id"), col("phash").as("phash_pre"))
        direct.join(pre, Seq("media_id"))
          .withColumn("scale_invariant", col("phash") === col("phash_pre"))
          .orderBy("media_id")
      },
      Some {
        s"""$pHashOracleCtes
        |SELECT hsh.media_id, phash, dct_median, CAST(4 AS INT) AS grid_w,
        |  CAST(h2 AS INT) AS grid_h, phash AS phash_pre,
        |  true AS scale_invariant
        |FROM hsh JOIN d2 ON d2.media_id = hsh.media_id
        |ORDER BY hsh.media_id""".stripMargin
      }),

    // ---- pHash near-dup pairs (round 19): the frequency-structure twin
    //      of the ahash pairs gate — banded Hamming join over the 64-bit
    //      DCT hashes (4 bands == all-pairs at maxHamming <= 3 by
    //      pigeonhole). The corpus unions with offset-id EXACT copies so
    //      the pair space is provably non-empty (every copy pair at
    //      Hamming 0) on top of whatever natural near-dups exist; the
    //      oracle is the brute-force self-join over the analytically
    //      derived hashes.
    "q_multimodal_phash_pairs" -> Q(
      (s, d) => {
        val media = Multimodal.encodePpm(Multimodal.fromText(
            Tables.documents(s, d), "doc_id", "text", "source"))
          .select(col("media_id"), col("payload"))
        val both = media.unionByName(media.select(
          (col("media_id") + 100000).as("media_id"), col("payload")))
        Multimodal.pHashPairs(both, maxHamming = 3)
          .orderBy("id_a", "id_b")
      },
      Some {
        s"""$pHashOracleCtes,
        |u AS (SELECT media_id, phash FROM hsh
        |  UNION ALL SELECT media_id + 100000 AS media_id, phash FROM hsh)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |  CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
        |FROM u a JOIN u b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin
      }),

    // ---- Image near-dup pairs (round 15): banded Hamming join over the
    //      perceptual hashes — the SimHash candidate machinery applied to
    //      pixels. 4 bands make the banded result EQUAL to all-pairs at
    //      maxHamming <= 3, so the oracle is the brute-force self-join on
    //      the analytically-derived hashes (xor + bit_count).
    "q_multimodal_ahash_pairs" -> Q(
      (s, d) => Multimodal.aHashPairs(
          Multimodal.encodePpm(Multimodal.fromText(
            Tables.documents(s, d), "doc_id", "text", "source")),
          grid = 4, maxHamming = 3)
        .orderBy("id_a", "id_b"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        def pv(c: Int) =
          s"""((2 * list_sum(list_transform(range(i//4*h//h2, (i//4+1)*h//h2), yy ->
             |   CASE WHEN yy*12 + (i%4)*3 + ${c + 1} <= len
             |    THEN ${byteAt(s"yy*12 + (i%4)*3 + ${c + 1}")} ELSE 0 END))
             | + ((i//4+1)*h//h2 - i//4*h//h2))
             | // (2 * ((i//4+1)*h//h2 - i//4*h//h2)))""".stripMargin
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, len // 12) AS h FROM m),
        |d2 AS (SELECT media_id, hx, len, h, least(4, h) AS h2 FROM d),
        |lum AS (SELECT media_id, h2, g.i,
        |    ${pv(0)} + ${pv(1)} + ${pv(2)} AS luma
        |  FROM d2 CROSS JOIN (SELECT unnest(range(0, 16)) AS i) g
        |  WHERE g.i < h2 * 4),
        |hsh AS (SELECT media_id,
        |    CAST(coalesce(sum(CASE WHEN (h2*4) * luma > (SELECT sum(l2.luma)
        |        FROM lum l2 WHERE l2.media_id = lum.media_id)
        |      THEN (CAST(1 AS BIGINT) << CAST(h2*4 - 1 - i AS INT))
        |      ELSE 0 END), 0) AS BIGINT) AS ahash
        |  FROM lum GROUP BY media_id)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |  CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
        |FROM hsh a JOIN hsh b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin
      }),

    // REAL COMPRESSED image decode (round 15): the corpus is encoded as
    // genuine QOI streams (RUN/INDEX/DIFF/LUMA/RGB ops, 64-slot hash
    // index, wrapping-int8 deltas — the public qoiformat.org spec) and the
    // kernel decodes the op stream back into pixels. QOI is LOSSLESS, so
    // the oracle mirrors the PIXEL CONSTRUCTION analytically from the text
    // bytes and never sees the codec — any encoder op-selection or decoder
    // state-machine defect breaks the round trip and hash-fails.
    "q_multimodal_qoi_decode" -> Q(
      (s, d) => Multimodal.decodeQoiFeatures(Multimodal.encodeQoi(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text", "source")))
        .orderBy("media_id"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        def chanMean(c: Int) =
          s"""CAST(list_sum(list_transform(range(0, h*4),
             |   k -> CASE WHEN k*3 + ${c + 1} <= len THEN ${byteAt(s"k*3 + ${c + 1}")} ELSE 0 END)) AS DOUBLE)
             | / CAST(h*4 AS DOUBLE)""".stripMargin
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, len // 12) AS h FROM m)
        |SELECT media_id, 4 AS width, CAST(h AS INT) AS height, 3 AS channels,
        | ${chanMean(0)} AS mean_r,
        | ${chanMean(1)} AS mean_g,
        | ${chanMean(2)} AS mean_b,
        | true AS is_valid
        |FROM d ORDER BY media_id""".stripMargin
      }),

    // REAL PNG decode (round 16): the corpus is encoded as genuine PNG
    // files (critical chunks, CRC32-framed, zlib IDAT via java.util.zip —
    // the format image corpora actually ship in) and the kernel walks the
    // chunks, inflates, and reconstructs scanline filters. PNG is
    // LOSSLESS, so the oracle mirrors the PIXEL CONSTRUCTION analytically
    // from the text bytes (the encodePpm/encodeQoi convention) and never
    // sees the codec — any defect in the encoder's chunk/zlib framing or
    // the decoder's inflate/filter path breaks the round trip and
    // hash-fails.
    "q_multimodal_png_decode" -> Q(
      (s, d) => Multimodal.decodePngFeatures(Multimodal.encodePng(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text", "source")))
        .orderBy("media_id"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        def chanMean(c: Int) =
          s"""CAST(list_sum(list_transform(range(0, h*4),
             |   k -> CASE WHEN k*3 + ${c + 1} <= len THEN ${byteAt(s"k*3 + ${c + 1}")} ELSE 0 END)) AS DOUBLE)
             | / CAST(h*4 AS DOUBLE)""".stripMargin
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, len // 12) AS h FROM m)
        |SELECT media_id, 4 AS width, CAST(h AS INT) AS height, 3 AS channels,
        | ${chanMean(0)} AS mean_r,
        | ${chanMean(1)} AS mean_g,
        | ${chanMean(2)} AS mean_b,
        | true AS is_valid
        |FROM d ORDER BY media_id""".stripMargin
      }),

    // ---- REAL JPEG decode (round 17): the full baseline chain — JFIF
    //      colour conversion, 4:2:0 subsampling, FDCT, quantization,
    //      Huffman entropy coding, then the decoder's marker walk, Huffman
    //      decode, dequant, IDCT, upsample, colour restore. The corpus is
    //      SOLID 16x16 MCUs under Jpeg.FlatQuant (DC step 8), the one
    //      construction where a LOSSY codec round-trips exactly (a constant
    //      block is pure DC; quant/dequant by 8 is the identity on it), so
    //      the oracle is the closed-form JFIF round trip of the input
    //      colours — every rounding is floor(x+0.5) on one double
    //      expression, mirrored verbatim.
    "q_multimodal_jpeg_decode" -> Q(
      // gate corpus capped at 16 MCUs/doc (round 18): every decode path the
      // 64-MCU corpus exercised — multi-block DC prediction, entropy walk,
      // IDCT, upsampling — fires identically at 16 blocks, at a quarter of
      // the arithmetic (the suite-max trim VERDICT r17 asked for); the
      // subsampling/greyscale/restart variants are JpegSpec's hand-assembled
      // streams either way
      (s, d) => Multimodal.decodeJpegFeatures(Multimodal.encodeJpeg(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text",
            "source"), maxMcu = 16))
        .orderBy("media_id"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        def byteOr0(p: String) =
          s"CASE WHEN $p <= len THEN ${byteAt(p)} ELSE 0 END"
        def cl(e: String) =
          s"least(255, greatest(0, CAST(floor($e) AS BIGINT)))"
        def mean(f: String) =
          s"CAST(256 * list_sum(list_transform(rs, x -> x.$f)) AS DOUBLE)" +
            s" / CAST(256 * nm AS DOUBLE)"
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, least(16, len // 3)) AS nm
        |  FROM m),
        |c1 AS (SELECT media_id, nm, list_transform(range(0, nm), k ->
        |  {'r': ${byteOr0("3*k+1")}, 'g': ${byteOr0("3*k+2")},
        |   'b': ${byteOr0("3*k+3")}}) AS cs FROM d),
        |c2 AS (SELECT media_id, nm, list_transform(cs, p -> {
        |  'y': ${cl("CAST(0.299 AS DOUBLE)*p.r + CAST(0.587 AS DOUBLE)*p.g" +
          " + CAST(0.114 AS DOUBLE)*p.b + CAST(0.5 AS DOUBLE)")},
        |  'cb': ${cl("CAST(128.5 AS DOUBLE) - CAST(0.1687 AS DOUBLE)*p.r" +
          " - CAST(0.3313 AS DOUBLE)*p.g + CAST(0.5 AS DOUBLE)*p.b")},
        |  'cr': ${cl("CAST(128.5 AS DOUBLE) + CAST(0.5 AS DOUBLE)*p.r" +
          " - CAST(0.4187 AS DOUBLE)*p.g - CAST(0.0813 AS DOUBLE)*p.b")}})
        |  AS ys FROM c1),
        |c3 AS (SELECT media_id, nm, list_transform(ys, q -> {
        |  'r2': ${cl("q.y + CAST(1.402 AS DOUBLE)*(q.cr - 128)" +
          " + CAST(0.5 AS DOUBLE)")},
        |  'g2': ${cl("q.y - CAST(0.344136 AS DOUBLE)*(q.cb - 128)" +
          " - CAST(0.714136 AS DOUBLE)*(q.cr - 128) + CAST(0.5 AS DOUBLE)")},
        |  'b2': ${cl("q.y + CAST(1.772 AS DOUBLE)*(q.cb - 128)" +
          " + CAST(0.5 AS DOUBLE)")}}) AS rs FROM c2)
        |SELECT media_id, CAST(16 * nm AS INT) AS width, 16 AS height,
        |  3 AS channels,
        |  ${mean("r2")} AS mean_r,
        |  ${mean("g2")} AS mean_g,
        |  ${mean("b2")} AS mean_b,
        |  true AS is_valid
        |FROM c3 ORDER BY media_id""".stripMargin
      }),

    // ---- REAL GIF decode (round 17): the third crawl image container
    //      beside JPEG/PNG, and the only PALETTE-INDEXED one — the corpus
    //      is genuine GIF89a (logical screen descriptor, 256-entry global
    //      color table, graphic control extension, LZW-compressed index
    //      stream in sub-blocks, trailer) whose pixel k is palette index
    //      payload(k). GIF is LOSSLESS, so the oracle mirrors the
    //      index→RGB palette construction (i, (i+85) mod 256, 255−i)
    //      analytically and never sees the codec: a defect in the LZW
    //      variable-width decode, the sub-block reassembly, or the
    //      color-table lookup hash-fails.
    "q_multimodal_gif_decode" -> Q(
      (s, d) => Multimodal.decodeGifFeatures(Multimodal.encodeGif(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text",
            "source")))
        .orderBy("media_id"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, len // 12) AS h FROM m),
        |i AS (SELECT media_id, h, list_transform(range(0, h*4), k ->
        |  CASE WHEN k+1 <= len THEN ${byteAt("k+1")} ELSE 0 END) AS ix
        |  FROM d)
        |SELECT media_id, 4 AS width, CAST(h AS INT) AS height,
        | 3 AS channels,
        | CAST(list_sum(ix) AS DOUBLE) / CAST(h*4 AS DOUBLE) AS mean_r,
        | CAST(list_sum(list_transform(ix, v -> (v+85) % 256)) AS DOUBLE)
        |   / CAST(h*4 AS DOUBLE) AS mean_g,
        | CAST(list_sum(list_transform(ix, v -> 255-v)) AS DOUBLE)
        |   / CAST(h*4 AS DOUBLE) AS mean_b,
        | true AS is_valid
        |FROM i ORDER BY media_id""".stripMargin
      }),

    // ---- ANIMATED GIF frame walk (round 17): multi-frame 89a streams
    //      (NETSCAPE loop block, per-frame graphic control extensions) —
    //      the animation surface crawl GIFs actually use, and the only
    //      frame-sequence path beside Y4M. One row per COMPOSITED frame;
    //      the corpus's frame f is a solid 8x8 fill of palette index
    //      payload(f), so every feature derives analytically from the
    //      text bytes. A decoder that mis-walks the extension chain,
    //      drops a frame, or mis-composites hash-fails.
    "q_multimodal_gif_frames" -> Q(
      (s, d) => Multimodal.decodeGifFrameFeatures(Multimodal.encodeGifFrames(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text",
            "source")))
        .orderBy("media_id", "frame_no"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, least(16, len)) AS nf
        |  FROM m),
        |f AS (SELECT media_id, hx, len, unnest(range(0, nf)) AS k FROM d),
        |v AS (SELECT media_id, CAST(k AS INT) AS frame_no,
        |  CASE WHEN k+1 <= len THEN ${byteAt("k+1")} ELSE 0 END AS ix
        |  FROM f)
        |SELECT media_id, frame_no, 8 AS width, 8 AS height,
        | CAST(ix AS DOUBLE) AS mean_r,
        | CAST((ix+85) % 256 AS DOUBLE) AS mean_g,
        | CAST(255-ix AS DOUBLE) AS mean_b,
        | true AS is_valid
        |FROM v ORDER BY media_id, frame_no""".stripMargin
      }),

    // ---- Animated-GIF temporal fingerprint (round 17): the GIF member
    //      of the perceptual family (aHash image / envelope audio / thash
    //      video) — the y4m thash math over COMPOSITED canvases, so GIF
    //      and Y4M fingerprints share one Hamming space. A solid frame of
    //      palette index v sums to 64·((v+85) mod 256 + 255) canvas
    //      bytes, so the whole envelope derives analytically; windows = 4
    //      puts up to 4 frames in a span (exercising the span sums, which
    //      windows = 16 over <=16 frames would not).
    "q_multimodal_gif_thash" -> Q(
      (s, d) => Multimodal.gifTemporalHash(Multimodal.encodeGifFrames(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text",
            "source")), windows = 4)
        .orderBy("media_id"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len,
        |  greatest(1, least(16, len)) AS nf FROM m),
        |fs AS (SELECT media_id, nf, least(4, nf) AS w2, g.f,
        |    64 * (((CASE WHEN g.f + 1 <= len THEN ${byteAt("g.f + 1")}
        |      ELSE 0 END) + 85) % 256 + 255) AS s
        |  FROM d CROSS JOIN (SELECT unnest(range(0, 16)) AS f) g
        |  WHERE g.f < nf),
        |env AS (SELECT media_id, nf, w2, ((f + 1) * w2 - 1) // nf AS w,
        |    CAST(sum(s) AS BIGINT) AS ssum,
        |    CAST(count(*) * 192 AS BIGINT) AS cnt
        |  FROM fs GROUP BY 1, 2, 3, 4),
        |mw AS (SELECT media_id, nf, w2, w,
        |    (2 * ssum + cnt) // (2 * cnt) AS mv FROM env),
        |hsh AS (SELECT media_id, CAST(max(w2) AS INT) AS n_bits,
        |    CAST(max(nf) AS BIGINT) AS n_frames,
        |    CAST(coalesce(sum(CASE WHEN w2 * mv > (SELECT sum(m2.mv)
        |        FROM mw m2 WHERE m2.media_id = mw.media_id)
        |      THEN (CAST(1 AS BIGINT) << CAST(w2 - 1 - w AS INT))
        |      ELSE 0 END), 0) AS BIGINT) AS thash
        |  FROM mw GROUP BY media_id)
        |SELECT media_id, thash, n_bits, n_frames, true AS is_valid
        |FROM hsh ORDER BY media_id""".stripMargin
      }),

    // Cross-codec raster pin (round 16): the aHash + box-resize kernels
    // over a PNG corpus — same pixel construction as the PPM corpus, so
    // the analytic aHash oracle (and the downscale-fixpoint invariant) is
    // IDENTICAL to q_multimodal_ahash's. A defect anywhere in the PNG
    // path under the shared rasterView (decode, resample, re-encode in
    // kind, re-decode) diverges from the container-independent oracle and
    // hash-fails.
    "q_multimodal_png_ahash" -> Q(
      (s, d) => {
        val media = Multimodal.encodePng(Multimodal.fromText(
          Tables.documents(s, d), "doc_id", "text", "source"))
        val direct = Multimodal.aHashFeatures(media, grid = 4)
          .select(col("media_id"), col("ahash"), col("n_bits"),
            col("grid_h"))
        // resizePpm re-encodes a PNG input as PNG (in kind); hashing the
        // resized stream must be a fixpoint exactly as in the PPM gate
        val pre = Multimodal.aHashFeatures(
            Multimodal.resizePpm(media, 4, 4), grid = 4)
          .select(col("media_id"), col("ahash").as("ahash_pre"))
        direct.join(pre, Seq("media_id"))
          .withColumn("scale_invariant", col("ahash") === col("ahash_pre"))
          .orderBy("media_id")
      },
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        def pv(c: Int) =
          s"""((2 * list_sum(list_transform(range(i//4*h//h2, (i//4+1)*h//h2), yy ->
             |   CASE WHEN yy*12 + (i%4)*3 + ${c + 1} <= len
             |    THEN ${byteAt(s"yy*12 + (i%4)*3 + ${c + 1}")} ELSE 0 END))
             | + ((i//4+1)*h//h2 - i//4*h//h2))
             | // (2 * ((i//4+1)*h//h2 - i//4*h//h2)))""".stripMargin
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, len // 12) AS h FROM m),
        |d2 AS (SELECT media_id, hx, len, h, least(4, h) AS h2 FROM d),
        |lum AS (SELECT media_id, h2, g.i,
        |    ${pv(0)} + ${pv(1)} + ${pv(2)} AS luma
        |  FROM d2 CROSS JOIN (SELECT unnest(range(0, 16)) AS i) g
        |  WHERE g.i < h2 * 4),
        |hsh AS (SELECT media_id, CAST(max(h2) AS INT) AS grid_h,
        |    CAST(max(h2) * 4 AS INT) AS n_bits,
        |    CAST(coalesce(sum(CASE WHEN (h2*4) * luma > (SELECT sum(l2.luma)
        |        FROM lum l2 WHERE l2.media_id = lum.media_id)
        |      THEN (CAST(1 AS BIGINT) << CAST(h2*4 - 1 - i AS INT))
        |      ELSE 0 END), 0) AS BIGINT) AS ahash
        |  FROM lum GROUP BY media_id)
        |SELECT media_id, ahash, n_bits, grid_h, ahash AS ahash_pre,
        |  true AS scale_invariant
        |FROM hsh ORDER BY media_id""".stripMargin
      }),

    // ---- Vision-language sequence packing (round 15): the multimodal
    //      composition proof — every (image, caption) pair costs its TEXT
    //      tokens plus a ViT-style PATCH grid over the image's DECODED dims
    //      (2x2 patches: ceil(w/2)*ceil(h/2)), and the joint budget drives
    //      the packBins layout. The dims come off the real QOI decode, so
    //      the gate chains codec -> feature -> join -> shard-parallel pack;
    //      the oracle mirrors the patch grid analytically from the text
    //      bytes and the pack's prefix sums exactly. One media scan, one
    //      text scan, one doc-keyed join, one shard window — no
    //      corpus-scale partition.
    "q_multimodal_pack" -> Q(
      (s, d) => {
        import graft.operators.{Multimodal, Packing}
        val media = Multimodal.decodeQoiFeatures(Multimodal.encodeQoi(
            Multimodal.fromText(Tables.documents(s, d), "doc_id", "text",
              "source")))
          .select(col("media_id").as("doc_id"),
            (floor((col("width") + 1) / lit(2)) *
              floor((col("height") + 1) / lit(2)))
              .cast("long").as("n_patch_tokens"))
        val text = Tables.documents(s, d).select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long")
            .as("n_text_tokens"))
        val joint = text.join(media, Seq("doc_id"))
          .withColumn("n_tokens",
            col("n_text_tokens") + col("n_patch_tokens"))
        Packing.packBins(joint, "doc_id", col("n_tokens"),
            budgetTokens = 768L, shards = 8)
          .select(col("doc_id"), col("n_text_tokens"), col("n_patch_tokens"),
            col("n_tokens"), col("shard"), col("tokens_before"), col("bin"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS n_text_tokens,
        |  greatest(1, octet_length(encode(text)) // 12) AS h FROM documents),
        |j AS (SELECT doc_id, n_text_tokens,
        |  CAST(2 * ((h + 1) // 2) AS BIGINT) AS n_patch_tokens,
        |  ${fp60Sql("CAST(doc_id AS VARCHAR)")} % 8 AS shard FROM t),
        |p AS (SELECT doc_id, n_text_tokens, n_patch_tokens,
        |  CAST(n_text_tokens + n_patch_tokens AS BIGINT) AS n_tokens, shard,
        |  CAST(coalesce(sum(n_text_tokens + n_patch_tokens) OVER (
        |    PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS tokens_before
        |  FROM j)
        |SELECT doc_id, n_text_tokens, n_patch_tokens, n_tokens, shard,
        |  tokens_before, CAST(floor(tokens_before / 768.0) AS BIGINT) AS bin
        |FROM p ORDER BY doc_id""".stripMargin)),

    // REAL audio decode (round 14, second honest media kernel): documents
    // become genuine RIFF/WAVE mono 16-bit PCM payloads and the
    // mapPartitions kernel WALKS the container — magic, chunk list, fmt
    // fields, data plane — into integer-exact signal features. As with the
    // PPM gate the oracle never sees the decoder: it derives every feature
    // analytically from the text bytes (16-bit LE samples, abs/square sums,
    // sign-flip count), so a header-offset or endianness bug hash-fails.
    "q_multimodal_wav_decode" -> Q(
      (s, d) => Multimodal.decodeWavFeatures(Multimodal.encodeWav(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text", "source")))
        .orderBy("media_id"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, len // 2) AS n FROM m),
        |sm AS (SELECT media_id, n, list_transform(range(0, n), k ->
        |  (CASE WHEN 2*k+2 <= len THEN ${byteAt("2*k+2")} ELSE 0 END) * 256 +
        |  (CASE WHEN 2*k+1 <= len THEN ${byteAt("2*k+1")} ELSE 0 END)) AS us
        |  FROM d),
        |sg AS (SELECT media_id, n, list_transform(us,
        |  v -> CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS ss FROM sm)
        |SELECT media_id, CAST(8000 AS INT) AS sample_rate,
        | CAST(1 AS INT) AS n_channels, CAST(16 AS INT) AS bits,
        | CAST(n AS BIGINT) AS n_samples,
        | CAST(n AS DOUBLE) / 8000 AS duration_s,
        | CAST(list_sum(list_transform(ss, v -> CAST(abs(v) AS BIGINT)))
        |   AS DOUBLE) / n AS mean_abs,
        | sqrt(CAST(list_sum(list_transform(ss, v -> CAST(v AS BIGINT) * v))
        |   AS DOUBLE) / n) AS rms,
        | CAST(list_max(list_transform(ss, v -> abs(v))) AS INT) AS peak,
        | CAST(coalesce(list_sum(list_transform(range(1, n), k ->
        |   CASE WHEN (ss[k] < 0) != (ss[k+1] < 0) THEN 1 ELSE 0 END)), 0)
        |   AS BIGINT) AS zero_crossings,
        | true AS is_valid
        |FROM sg ORDER BY media_id""".stripMargin
      }),

    // ---- Audio energy-envelope fingerprint (round 15): the audio member
    //      of the dedup family — half-up |sample| means over floor-division
    //      PCM windows, all-integer mean threshold, bits packed MSB-first.
    //      The oracle derives the hash analytically from the text bytes
    //      (16-bit LE samples), never seeing the kernel.
    "q_multimodal_wav_envelope" -> Q(
      (s, d) => Multimodal.wavEnvelopeHash(Multimodal.encodeWav(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text",
            "source")), windows = 16)
        .orderBy("media_id"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, len // 2) AS n FROM m),
        |sm AS (SELECT media_id, n, list_transform(range(0, n), k ->
        |  (CASE WHEN 2*k+2 <= len THEN ${byteAt("2*k+2")} ELSE 0 END) * 256 +
        |  (CASE WHEN 2*k+1 <= len THEN ${byteAt("2*k+1")} ELSE 0 END)) AS us
        |  FROM d),
        |sg AS (SELECT media_id, n, least(16, n) AS w2, list_transform(us,
        |  v -> CAST(abs(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS BIGINT)) AS sa
        |  FROM sm),
        |env AS (SELECT media_id, w2, g.w,
        |    (2 * list_sum(list_transform(range(w*n//w2, (w+1)*n//w2),
        |        k -> sa[k+1]))
        |     + ((w+1)*n//w2 - w*n//w2))
        |     // (2 * ((w+1)*n//w2 - w*n//w2)) AS mw
        |  FROM sg CROSS JOIN (SELECT unnest(range(0, 16)) AS w) g
        |  WHERE g.w < w2),
        |hsh AS (SELECT media_id, CAST(max(w2) AS INT) AS n_bits,
        |    CAST(coalesce(sum(CASE WHEN w2 * mw > (SELECT sum(e2.mw)
        |        FROM env e2 WHERE e2.media_id = env.media_id)
        |      THEN (CAST(1 AS BIGINT) << CAST(w2 - 1 - w AS INT))
        |      ELSE 0 END), 0) AS BIGINT) AS envhash
        |  FROM env GROUP BY media_id)
        |SELECT media_id, envhash, n_bits, true AS is_valid
        |FROM hsh ORDER BY media_id""".stripMargin
      }),

    // ---- Fixed-point linear resample (round 18): the sample-rate
    //      normalization step of a speech ingest (mixed-rate audio → one
    //      model rate), 8000 → 6000 Hz so the 4/3 phase ratio exercises
    //      all three fractional offsets (0, 10922, 21845 in Q15). The
    //      kernel's phase arithmetic is exact integer rationals — output
    //      k reads source position k·src/out split into floor index +
    //      Q15 fraction, floor-division interpolation — so the oracle
    //      replays it bit for bit from the raw bytes and any drift in
    //      index, fraction, clamping, or sign handling hash-fails. The
    //      gate decodes the RESAMPLED stream back through the feature
    //      kernel: header re-encode bugs fail the same hash.
    "q_multimodal_wav_resample" -> Q(
      (s, d) => Multimodal.decodeWavFeatures(Multimodal.resampleWav(
          Multimodal.encodeWav(Multimodal.fromText(
            Tables.documents(s, d), "doc_id", "text", "source")),
          outRate = 6000))
        .orderBy("media_id"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, len // 2) AS n FROM m),
        |sm AS (SELECT media_id, n, list_transform(range(0, n), k -> CAST(
        |  CASE WHEN (CASE WHEN 2*k+2 <= len THEN ${byteAt("2*k+2")} ELSE 0 END) * 256
        |      + (CASE WHEN 2*k+1 <= len THEN ${byteAt("2*k+1")} ELSE 0 END) >= 32768
        |  THEN (CASE WHEN 2*k+2 <= len THEN ${byteAt("2*k+2")} ELSE 0 END) * 256
        |      + (CASE WHEN 2*k+1 <= len THEN ${byteAt("2*k+1")} ELSE 0 END) - 65536
        |  ELSE (CASE WHEN 2*k+2 <= len THEN ${byteAt("2*k+2")} ELSE 0 END) * 256
        |      + (CASE WHEN 2*k+1 <= len THEN ${byteAt("2*k+1")} ELSE 0 END) END
        |  AS BIGINT)) AS ss FROM d),
        |rs AS (SELECT media_id, n, greatest(1, n * 6000 // 8000) AS outn,
        |  ss FROM sm),
        |ro AS (SELECT media_id, outn, list_transform(range(0, outn), k ->
        |  ss[least(k*8000 // 6000, n-1) + 1]
        |  + CAST(floor((
        |      (ss[least(k*8000 // 6000 + 1, n-1) + 1]
        |        - ss[least(k*8000 // 6000, n-1) + 1])
        |      * ((k*8000 % 6000) * 32768 // 6000)) / 32768.0) AS BIGINT))
        |  AS os FROM rs)
        |SELECT media_id, CAST(6000 AS INT) AS sample_rate,
        | CAST(1 AS INT) AS n_channels, CAST(16 AS INT) AS bits,
        | CAST(outn AS BIGINT) AS n_samples,
        | CAST(outn AS DOUBLE) / 6000 AS duration_s,
        | CAST(list_sum(list_transform(os, v -> CAST(abs(v) AS BIGINT)))
        |   AS DOUBLE) / outn AS mean_abs,
        | sqrt(CAST(list_sum(list_transform(os, v -> CAST(v AS BIGINT) * v))
        |   AS DOUBLE) / outn) AS rms,
        | CAST(list_max(list_transform(os, v -> abs(v))) AS INT) AS peak,
        | CAST(coalesce(list_sum(list_transform(range(1, outn), k ->
        |   CASE WHEN (os[k] < 0) != (os[k+1] < 0) THEN 1 ELSE 0 END)), 0)
        |   AS BIGINT) AS zero_crossings,
        | true AS is_valid
        |FROM ro ORDER BY media_id""".stripMargin
      }),

    // ---- Voice-activity segmentation (round 19): the speech-ingest step
    //      between decode and features — windows of 64 samples (partial
    //      tail kept), voiced iff window mean |s| > clip mean |s| by exact
    //      integer cross-multiplication (division-free, gain-invariant),
    //      maximal voiced runs become segments. The oracle replays the
    //      window sums and threshold from the raw bytes and rebuilds the
    //      runs with the gaps-and-islands window (w − row_number), so any
    //      drift in window boxing, tail handling, threshold strictness,
    //      or run assembly hash-fails. (The oracle's 4096-window replay
    //      bound covers 256 KB clips — 450× the synthetic corpus max; the
    //      OPERATOR is uncapped.)
    "q_multimodal_wav_vad" -> Q(
      (s, d) => Multimodal.wavVadSegments(Multimodal.encodeWav(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text",
            "source")), window = 64)
        .orderBy("media_id", "seg_no"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, len // 2) AS n FROM m),
        |sm AS (SELECT media_id, n, list_transform(range(0, n), k -> CAST(
        |  CASE WHEN (CASE WHEN 2*k+2 <= len THEN ${byteAt("2*k+2")} ELSE 0 END) * 256
        |      + (CASE WHEN 2*k+1 <= len THEN ${byteAt("2*k+1")} ELSE 0 END) >= 32768
        |  THEN (CASE WHEN 2*k+2 <= len THEN ${byteAt("2*k+2")} ELSE 0 END) * 256
        |      + (CASE WHEN 2*k+1 <= len THEN ${byteAt("2*k+1")} ELSE 0 END) - 65536
        |  ELSE (CASE WHEN 2*k+2 <= len THEN ${byteAt("2*k+2")} ELSE 0 END) * 256
        |      + (CASE WHEN 2*k+1 <= len THEN ${byteAt("2*k+1")} ELSE 0 END) END
        |  AS BIGINT)) AS ss FROM d),
        |ta AS (SELECT media_id, n, ss,
        |  list_sum(list_transform(ss, v -> abs(v))) AS total_abs,
        |  (n + 63) // 64 AS nw FROM sm),
        |wd AS (SELECT media_id, n, gw.w, least(64, n - gw.w*64) AS wl,
        |  total_abs,
        |  list_sum(list_transform(range(gw.w*64, gw.w*64 +
        |    least(64, n - gw.w*64)), k -> abs(ss[k+1]))) AS ws
        |  FROM ta CROSS JOIN (SELECT unnest(range(0, 4096)) AS w) gw
        |  WHERE gw.w < nw),
        |vw AS (SELECT media_id, n, w, ws FROM wd
        |  WHERE ws * n > total_abs * wl),
        |isl AS (SELECT media_id, n, w, ws,
        |  w - row_number() OVER (PARTITION BY media_id ORDER BY w) AS grp
        |  FROM vw),
        |seg AS (SELECT media_id, min(n) AS n, min(w) AS w0, max(w) AS w1,
        |  sum(ws) AS sum_abs, count(*) AS nwin
        |  FROM isl GROUP BY media_id, grp)
        |SELECT media_id,
        |  CAST(row_number() OVER (PARTITION BY media_id ORDER BY w0)
        |    AS INT) AS seg_no,
        |  CAST(w0 * 64 AS BIGINT) AS start_sample,
        |  CAST(least((w1+1) * 64, n) - w0 * 64 AS BIGINT) AS n_samples,
        |  CAST(sum_abs AS BIGINT) AS sum_abs,
        |  CAST(nwin AS INT) AS n_windows
        |FROM seg ORDER BY media_id, seg_no""".stripMargin
      }),

    // ---- Silence trim (round 19): the VAD test applied as the classic
    //      clip-normalization edit — keep first-voiced-window start to
    //      last-voiced-window end, re-encode through the canonical
    //      header; clips with no voiced anchor pass through unchanged.
    //      The gate decodes the TRIMMED stream through the feature
    //      mirror, so header re-encode or span-arithmetic bugs fail the
    //      same hash (the wav_resample gate pattern).
    "q_multimodal_wav_trim" -> Q(
      (s, d) => Multimodal.decodeWavFeatures(Multimodal.trimWavSilence(
          Multimodal.encodeWav(Multimodal.fromText(
            Tables.documents(s, d), "doc_id", "text", "source")),
          window = 64))
        .orderBy("media_id"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, len // 2) AS n FROM m),
        |sm AS (SELECT media_id, n, list_transform(range(0, n), k -> CAST(
        |  CASE WHEN (CASE WHEN 2*k+2 <= len THEN ${byteAt("2*k+2")} ELSE 0 END) * 256
        |      + (CASE WHEN 2*k+1 <= len THEN ${byteAt("2*k+1")} ELSE 0 END) >= 32768
        |  THEN (CASE WHEN 2*k+2 <= len THEN ${byteAt("2*k+2")} ELSE 0 END) * 256
        |      + (CASE WHEN 2*k+1 <= len THEN ${byteAt("2*k+1")} ELSE 0 END) - 65536
        |  ELSE (CASE WHEN 2*k+2 <= len THEN ${byteAt("2*k+2")} ELSE 0 END) * 256
        |      + (CASE WHEN 2*k+1 <= len THEN ${byteAt("2*k+1")} ELSE 0 END) END
        |  AS BIGINT)) AS ss FROM d),
        |ta AS (SELECT media_id, n, ss,
        |  list_sum(list_transform(ss, v -> abs(v))) AS total_abs,
        |  (n + 63) // 64 AS nw FROM sm),
        |wd AS (SELECT media_id, n, gw.w, least(64, n - gw.w*64) AS wl,
        |  total_abs,
        |  list_sum(list_transform(range(gw.w*64, gw.w*64 +
        |    least(64, n - gw.w*64)), k -> abs(ss[k+1]))) AS ws
        |  FROM ta CROSS JOIN (SELECT unnest(range(0, 4096)) AS w) gw
        |  WHERE gw.w < nw),
        |fv AS (SELECT media_id, min(w) AS fw, max(w) AS lw FROM wd
        |  WHERE ws * n > total_abs * wl GROUP BY 1),
        |tr AS (SELECT ta.media_id,
        |  coalesce(fv.fw * 64, 0) AS s0,
        |  coalesce(least((fv.lw + 1) * 64, n), n)
        |    - coalesce(fv.fw * 64, 0) AS outn,
        |  ss FROM ta LEFT JOIN fv ON fv.media_id = ta.media_id),
        |ro AS (SELECT media_id, outn,
        |  list_slice(ss, s0 + 1, s0 + outn) AS os FROM tr)
        |SELECT media_id, CAST(8000 AS INT) AS sample_rate,
        | CAST(1 AS INT) AS n_channels, CAST(16 AS INT) AS bits,
        | CAST(outn AS BIGINT) AS n_samples,
        | CAST(outn AS DOUBLE) / 8000 AS duration_s,
        | CAST(list_sum(list_transform(os, v -> CAST(abs(v) AS BIGINT)))
        |   AS DOUBLE) / outn AS mean_abs,
        | sqrt(CAST(list_sum(list_transform(os, v -> CAST(v AS BIGINT) * v))
        |   AS DOUBLE) / outn) AS rms,
        | CAST(list_max(list_transform(os, v -> abs(v))) AS INT) AS peak,
        | CAST(coalesce(list_sum(list_transform(range(1, outn), k ->
        |   CASE WHEN (os[k] < 0) != (os[k+1] < 0) THEN 1 ELSE 0 END)), 0)
        |   AS BIGINT) AS zero_crossings,
        | true AS is_valid
        |FROM ro ORDER BY media_id""".stripMargin
      }),

    // ---- Fixed-point STFT spectrogram (round 18): the frequency-domain
    //      audio kernel. The transform is fixed point BY DESIGN — Q15
    //      integer Hann window and twiddle tables make every windowed DFT
    //      sum exact 64-bit integer arithmetic (max |Σ| ≈ 2^51 < 2^53, so
    //      its double image is exact too) and re²+im² one deterministic
    //      IEEE expression — which is the only reason a Fourier transform
    //      can face a bit-exact hash oracle at all. The oracle replays the
    //      DFT from the raw text bytes in DuckDB; the three integer tables
    //      interpolate into the SQL as literal lists (shared mathematical
    //      CONSTANTS, the fp60Sql convention — the oracle's sample
    //      extraction, windowing, sums, and squaring are all independent).
    //      maxFrames = 8 caps BOTH engines' per-clip cost (8 frames × 33
    //      bins × 64 taps), so the gate is corpus-length-insensitive.
    "q_multimodal_wav_spectrogram" -> Q(
      (s, d) => Multimodal.wavSpectrogram(Multimodal.encodeWav(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text",
            "source")), maxFrames = 8)
        .orderBy("media_id", "frame", "bin"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        val hannL = Multimodal.hannQ15.mkString("[", ", ", "]")
        val cosL = Multimodal.cosQ15.mkString("[", ", ", "]")
        val sinL = Multimodal.sinQ15.mkString("[", ", ", "]")
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len // 2 AS n FROM m WHERE len // 2 >= 64),
        |sm AS (SELECT media_id, least(n // 64, 8) AS nf,
        |  list_transform(range(0, least(n, 512)), k -> CAST(
        |    CASE WHEN ${byteAt("2*k+2")} * 256 + ${byteAt("2*k+1")} >= 32768
        |    THEN ${byteAt("2*k+2")} * 256 + ${byteAt("2*k+1")} - 65536
        |    ELSE ${byteAt("2*k+2")} * 256 + ${byteAt("2*k+1")} END
        |    AS BIGINT)) AS ss
        |  FROM d),
        |g AS (SELECT media_id, ss, gf.f, gb.bn
        |  FROM sm
        |  CROSS JOIN (SELECT unnest(range(0, 8)) AS f) gf
        |  CROSS JOIN (SELECT unnest(range(0, 33)) AS bn) gb
        |  WHERE gf.f < nf),
        |p AS (SELECT media_id, f, bn,
        |  CAST(list_sum(list_transform(range(0, 64), i ->
        |    ss[f*64+i+1] * ($hannL)[i+1] * ($cosL)[((i*bn)%64)+1]))
        |    AS DOUBLE) AS re,
        |  CAST(-list_sum(list_transform(range(0, 64), i ->
        |    ss[f*64+i+1] * ($hannL)[i+1] * ($sinL)[((i*bn)%64)+1]))
        |    AS DOUBLE) AS im
        |  FROM g)
        |SELECT media_id, CAST(f AS INT) AS frame, CAST(bn AS INT) AS bin,
        |  re*re + im*im AS power
        |FROM p ORDER BY media_id, frame, bin""".stripMargin
      }),

    // ---- Per-band spectral energy (round 18; surface re-shaped round 19):
    //      the STFT consumed as an EXACT aggregate — four contiguous bin
    //      bands, each band's Σ(re²+im²) accumulated in arbitrary-precision
    //      integers inside the kernel (the double-valued spectrogram cells
    //      cannot be re-aggregated exactly by a SQL engine: double→decimal
    //      casts are engine-defined below the 17th digit and float sums
    //      are order-dependent). The r18 DECIMAL(38,0) surface was red on
    //      the driver's checker — 28–31-digit integers through a HUGEINT
    //      sum + decimal canonicalization are engine-VERSION-sensitive
    //      above 2^53 — so the surface is now the per-cell 21-bit limb
    //      split (Multimodal.energyFromLimbs): each exact cell (< 2^103,
    //      computed per-row in 128-bit space) splits into five 21-bit
    //      limbs BEFORE aggregation, and the row carries the five limb
    //      SUMS as plain BIGINTs, each < 2^30 — below float64's 2^53, so
    //      NO checker canonicalization can lose a bit on any engine. The
    //      oracle replays split-then-sum identically (per-cell HUGEINT
    //      ops are pure integer arithmetic — the version-sensitive parts,
    //      128-bit aggregation and decimal surfacing, never occur).
    "q_multimodal_wav_band_energy" -> Q(
      (s, d) => Multimodal.wavBandEnergy(Multimodal.encodeWav(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text",
            "source")), maxFrames = 8, bands = 4)
        .orderBy("media_id", "band"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        val hannL = Multimodal.hannQ15.mkString("[", ", ", "]")
        val cosL = Multimodal.cosQ15.mkString("[", ", ", "]")
        val sinL = Multimodal.sinQ15.mkString("[", ", ", "]")
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len // 2 AS n FROM m WHERE len // 2 >= 64),
        |sm AS (SELECT media_id, least(n // 64, 8) AS nf,
        |  list_transform(range(0, least(n, 512)), k -> CAST(
        |    CASE WHEN ${byteAt("2*k+2")} * 256 + ${byteAt("2*k+1")} >= 32768
        |    THEN ${byteAt("2*k+2")} * 256 + ${byteAt("2*k+1")} - 65536
        |    ELSE ${byteAt("2*k+2")} * 256 + ${byteAt("2*k+1")} END
        |    AS BIGINT)) AS ss
        |  FROM d),
        |g AS (SELECT media_id, ss, gf.f, gb.bn
        |  FROM sm
        |  CROSS JOIN (SELECT unnest(range(0, 8)) AS f) gf
        |  CROSS JOIN (SELECT unnest(range(0, 33)) AS bn) gb
        |  WHERE gf.f < nf),
        |p AS (SELECT media_id, f, bn,
        |  CAST(list_sum(list_transform(range(0, 64), i ->
        |    ss[f*64+i+1] * ($hannL)[i+1] * ($cosL)[((i*bn)%64)+1]))
        |    AS HUGEINT) AS re,
        |  CAST(-list_sum(list_transform(range(0, 64), i ->
        |    ss[f*64+i+1] * ($hannL)[i+1] * ($sinL)[((i*bn)%64)+1]))
        |    AS HUGEINT) AS im
        |  FROM g),
        |c AS (SELECT media_id, bn, re*re + im*im AS cell FROM p),
        |l AS (SELECT media_id, CAST(bn // 9 AS INT) AS band,
        |  CAST(cell % 2097152 AS BIGINT) AS l0,
        |  CAST((cell // 2097152) % 2097152 AS BIGINT) AS l1,
        |  CAST((cell // 2097152 // 2097152) % 2097152 AS BIGINT) AS l2,
        |  CAST((cell // 2097152 // 2097152 // 2097152) % 2097152
        |    AS BIGINT) AS l3,
        |  CAST(cell // 2097152 // 2097152 // 2097152 // 2097152
        |    AS BIGINT) AS l4
        |  FROM c)
        |SELECT media_id, band,
        |  CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(sum(l0) AS BIGINT) AS energy_l0,
        |  CAST(sum(l1) AS BIGINT) AS energy_l1,
        |  CAST(sum(l2) AS BIGINT) AS energy_l2,
        |  CAST(sum(l3) AS BIGINT) AS energy_l3,
        |  CAST(sum(l4) AS BIGINT) AS energy_l4
        |FROM l GROUP BY 1, 2 ORDER BY media_id, band""".stripMargin
      }),

    // ---- Log-mel filterbank (round 19): the feature speech/audio-dedup
    //      pipelines actually consume — Q15 triangular mel weights
    //      (HTK construction, driver-computed integer CONSTANTS shared
    //      with the oracle, the hannQ15/fp60Sql convention) over the
    //      exact STFT cells, every step integer arithmetic. Surface: the
    //      weighted per-cell 21-bit limb split (w·lⱼ sums, each < 2^45 —
    //      canonicalization-proof on any checker) plus the exact integer
    //      log — log10_floor = decimal digit count − 1, which any engine
    //      derives bit-identically from the HUGEINT's decimal string.
    //      The oracle joins the literal weight table against the limb
    //      CTE and replays split-weight-sum; the kernel's BigInt truth is
    //      asserted separately in SimilaritySpec.
    "q_multimodal_wav_logmel" -> Q(
      (s, d) => Multimodal.wavLogMel(Multimodal.encodeWav(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text",
            "source")), sampleRate = 8000, nMel = 8, maxFrames = 8)
        .orderBy("media_id", "mel"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        val hannL = Multimodal.hannQ15.mkString("[", ", ", "]")
        val cosL = Multimodal.cosQ15.mkString("[", ", ", "]")
        val sinL = Multimodal.sinQ15.mkString("[", ", ", "]")
        val melW = Multimodal.melWeightsQ15(8000, 8)
        val wRows = (for {
          m <- melW.indices
          bn <- melW(m).indices if melW(m)(bn) > 0
        } yield s"($m, $bn, ${melW(m)(bn)})").mkString(", ")
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len // 2 AS n FROM m WHERE len // 2 >= 64),
        |sm AS (SELECT media_id, least(n // 64, 8) AS nf,
        |  list_transform(range(0, least(n, 512)), k -> CAST(
        |    CASE WHEN ${byteAt("2*k+2")} * 256 + ${byteAt("2*k+1")} >= 32768
        |    THEN ${byteAt("2*k+2")} * 256 + ${byteAt("2*k+1")} - 65536
        |    ELSE ${byteAt("2*k+2")} * 256 + ${byteAt("2*k+1")} END
        |    AS BIGINT)) AS ss
        |  FROM d),
        |g AS (SELECT media_id, ss, gf.f, gb.bn
        |  FROM sm
        |  CROSS JOIN (SELECT unnest(range(0, 8)) AS f) gf
        |  CROSS JOIN (SELECT unnest(range(0, 33)) AS bn) gb
        |  WHERE gf.f < nf),
        |p AS (SELECT media_id, f, bn,
        |  CAST(list_sum(list_transform(range(0, 64), i ->
        |    ss[f*64+i+1] * ($hannL)[i+1] * ($cosL)[((i*bn)%64)+1]))
        |    AS HUGEINT) AS re,
        |  CAST(-list_sum(list_transform(range(0, 64), i ->
        |    ss[f*64+i+1] * ($hannL)[i+1] * ($sinL)[((i*bn)%64)+1]))
        |    AS HUGEINT) AS im
        |  FROM g),
        |c AS (SELECT media_id, bn, re*re + im*im AS cell FROM p),
        |l AS (SELECT media_id, bn,
        |  CAST(cell % 2097152 AS BIGINT) AS l0,
        |  CAST((cell // 2097152) % 2097152 AS BIGINT) AS l1,
        |  CAST((cell // 2097152 // 2097152) % 2097152 AS BIGINT) AS l2,
        |  CAST((cell // 2097152 // 2097152 // 2097152) % 2097152
        |    AS BIGINT) AS l3,
        |  CAST(cell // 2097152 // 2097152 // 2097152 // 2097152
        |    AS BIGINT) AS l4
        |  FROM c),
        |a AS (SELECT media_id, w.mel,
        |  CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(sum(w.wq * l0) AS BIGINT) AS logmel_l0,
        |  CAST(sum(w.wq * l1) AS BIGINT) AS logmel_l1,
        |  CAST(sum(w.wq * l2) AS BIGINT) AS logmel_l2,
        |  CAST(sum(w.wq * l3) AS BIGINT) AS logmel_l3,
        |  CAST(sum(w.wq * l4) AS BIGINT) AS logmel_l4
        |  FROM l JOIN (VALUES $wRows) AS w(mel, bn, wq) ON l.bn = w.bn
        |  GROUP BY 1, 2),
        |t AS (SELECT *,
        |  (((CAST(logmel_l4 AS HUGEINT) * 2097152 + logmel_l3) * 2097152
        |    + logmel_l2) * 2097152 + logmel_l1) * 2097152 + logmel_l0
        |    AS total FROM a)
        |SELECT media_id, CAST(mel AS INT) AS mel, n_cells,
        |  logmel_l0, logmel_l1, logmel_l2, logmel_l3, logmel_l4,
        |  CASE WHEN total = 0 THEN -1
        |    ELSE CAST(length(CAST(total AS VARCHAR)) AS INT) - 1
        |  END AS log10_floor
        |FROM t ORDER BY media_id, mel""".stripMargin
      }),

    // ---- Clip-level MFCCs (round 19): the last step of the classic
    //      audio feature chain (STFT → mel → log → DCT) over the
    //      aggregated mel profile — exact integer mel energies, then
    //      round(ln(E+1), 9) (integer→double is IEEE nearest on both
    //      engines; JVM and DuckDB ln agree to the bit — the perplexity
    //      gates' round-9 discipline) and an order-FIXED cepstral dot
    //      product (an expression, not an aggregation, so float addition
    //      order never varies), rounded to 6. Cosine constants
    //      interpolate via their round-trip decimal form, CAST AS DOUBLE.
    "q_multimodal_wav_mfcc" -> Q(
      (s, d) => Multimodal.wavMfcc(Multimodal.encodeWav(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text",
            "source")), sampleRate = 8000, nMel = 8, nCoeff = 8,
          maxFrames = 8)
        .orderBy("media_id", "k"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        val hannL = Multimodal.hannQ15.mkString("[", ", ", "]")
        val cosL = Multimodal.cosQ15.mkString("[", ", ", "]")
        val sinL = Multimodal.sinQ15.mkString("[", ", ", "]")
        val melW = Multimodal.melWeightsQ15(8000, 8)
        val wRows = (for {
          m <- melW.indices
          bn <- melW(m).indices if melW(m)(bn) > 0
        } yield s"($m, $bn, ${melW(m)(bn)})").mkString(", ")
        val ks = (0 until 8).map { k =>
          val expr = (0 until 8).map { m =>
            val c = math.cos(math.Pi * (2 * m + 1) * k / 16.0)
            s"l$m * CAST($c AS DOUBLE)"
          }.mkString(" + ")
          s"SELECT media_id, CAST($k AS INT) AS k, round($expr, 6) AS mfcc FROM pv"
        }.mkString("\n|", "\n|UNION ALL\n|", "")
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len // 2 AS n FROM m WHERE len // 2 >= 64),
        |sm AS (SELECT media_id, least(n // 64, 8) AS nf,
        |  list_transform(range(0, least(n, 512)), k -> CAST(
        |    CASE WHEN ${byteAt("2*k+2")} * 256 + ${byteAt("2*k+1")} >= 32768
        |    THEN ${byteAt("2*k+2")} * 256 + ${byteAt("2*k+1")} - 65536
        |    ELSE ${byteAt("2*k+2")} * 256 + ${byteAt("2*k+1")} END
        |    AS BIGINT)) AS ss
        |  FROM d),
        |g AS (SELECT media_id, ss, gf.f, gb.bn
        |  FROM sm
        |  CROSS JOIN (SELECT unnest(range(0, 8)) AS f) gf
        |  CROSS JOIN (SELECT unnest(range(0, 33)) AS bn) gb
        |  WHERE gf.f < nf),
        |p AS (SELECT media_id, f, bn,
        |  CAST(list_sum(list_transform(range(0, 64), i ->
        |    ss[f*64+i+1] * ($hannL)[i+1] * ($cosL)[((i*bn)%64)+1]))
        |    AS HUGEINT) AS re,
        |  CAST(-list_sum(list_transform(range(0, 64), i ->
        |    ss[f*64+i+1] * ($hannL)[i+1] * ($sinL)[((i*bn)%64)+1]))
        |    AS HUGEINT) AS im
        |  FROM g),
        |c AS (SELECT media_id, bn, re*re + im*im AS cell FROM p),
        |a AS (SELECT media_id, w.mel, sum(cell * w.wq) AS total
        |  FROM c JOIN (VALUES $wRows) AS w(mel, bn, wq) ON c.bn = w.bn
        |  GROUP BY 1, 2),
        |lg AS (SELECT media_id, mel,
        |  round(ln(CAST(total + 1 AS DOUBLE)), 9) AS l FROM a),
        |pv AS (SELECT media_id,
        |  max(CASE WHEN mel = 0 THEN l END) AS l0,
        |  max(CASE WHEN mel = 1 THEN l END) AS l1,
        |  max(CASE WHEN mel = 2 THEN l END) AS l2,
        |  max(CASE WHEN mel = 3 THEN l END) AS l3,
        |  max(CASE WHEN mel = 4 THEN l END) AS l4,
        |  max(CASE WHEN mel = 5 THEN l END) AS l5,
        |  max(CASE WHEN mel = 6 THEN l END) AS l6,
        |  max(CASE WHEN mel = 7 THEN l END) AS l7
        |  FROM lg GROUP BY 1)
        |SELECT media_id, k, mfcc FROM ($ks
        |) ORDER BY media_id, k""".stripMargin
      }),

    // ---- Spectral fingerprint (round 18): the frequency-domain member of
    //      the perceptual-hash family — dominant non-DC bin per STFT frame
    //      (ties to the LOWEST bin), 6 bits per frame MSB-first. The
    //      envelope hash matches copies by loudness contour; this one
    //      matches by pitch trajectory. Oracle: the spectrogram CTE above,
    //      then an exact-double argmax (max-power window + min(bin) at the
    //      max — both engines' powers are bit-identical, so the equality
    //      is sound) and a power-of-two pack; clips with no full frame
    //      fingerprint as (0, 0 frames, valid) via the LEFT JOIN.
    "q_multimodal_wav_fingerprint" -> Q(
      (s, d) => Multimodal.wavFingerprintHash(Multimodal.encodeWav(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text",
            "source")), maxFrames = 8)
        .orderBy("media_id"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        val hannL = Multimodal.hannQ15.mkString("[", ", ", "]")
        val cosL = Multimodal.cosQ15.mkString("[", ", ", "]")
        val sinL = Multimodal.sinQ15.mkString("[", ", ", "]")
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len // 2 AS n FROM m WHERE len // 2 >= 64),
        |sm AS (SELECT media_id, least(n // 64, 8) AS nf,
        |  list_transform(range(0, least(n, 512)), k -> CAST(
        |    CASE WHEN ${byteAt("2*k+2")} * 256 + ${byteAt("2*k+1")} >= 32768
        |    THEN ${byteAt("2*k+2")} * 256 + ${byteAt("2*k+1")} - 65536
        |    ELSE ${byteAt("2*k+2")} * 256 + ${byteAt("2*k+1")} END
        |    AS BIGINT)) AS ss
        |  FROM d),
        |g AS (SELECT media_id, ss, gf.f, gb.bn
        |  FROM sm
        |  CROSS JOIN (SELECT unnest(range(0, 8)) AS f) gf
        |  CROSS JOIN (SELECT unnest(range(1, 33)) AS bn) gb
        |  WHERE gf.f < nf),
        |p AS (SELECT media_id, f, bn,
        |  CAST(list_sum(list_transform(range(0, 64), i ->
        |    ss[f*64+i+1] * ($hannL)[i+1] * ($cosL)[((i*bn)%64)+1]))
        |    AS DOUBLE) AS re,
        |  CAST(-list_sum(list_transform(range(0, 64), i ->
        |    ss[f*64+i+1] * ($hannL)[i+1] * ($sinL)[((i*bn)%64)+1]))
        |    AS DOUBLE) AS im
        |  FROM g),
        |pw AS (SELECT media_id, f, bn, re*re + im*im AS power,
        |  max(re*re + im*im) OVER (PARTITION BY media_id, f) AS mx
        |  FROM p),
        |dom AS (SELECT media_id, f, min(bn) AS dom FROM pw
        |  WHERE power = mx GROUP BY 1, 2),
        |dom2 AS (SELECT media_id, f, dom,
        |  count(*) OVER (PARTITION BY media_id) AS nf FROM dom),
        |h AS (SELECT media_id, CAST(max(nf) AS INT) AS n_frames,
        |  CAST(sum(dom * (CAST(1 AS BIGINT) <<
        |    CAST(6 * (nf - 1 - f) AS INT))) AS BIGINT) AS fphash
        |  FROM dom2 GROUP BY media_id)
        |SELECT m.media_id, coalesce(h.fphash, 0) AS fphash,
        |  CAST(coalesce(h.n_frames, 0) AS INT) AS n_frames,
        |  true AS is_valid
        |FROM m LEFT JOIN h USING (media_id) ORDER BY media_id""".stripMargin
      }),

    // ---- Video temporal fingerprint (round 15): completes the image /
    //      audio / video perceptual-hash triple — per-window half-up means
    //      over the frames' Y-plane bytes (floor-division frame spans, one
    //      fold per span), all-integer mean threshold. Oracle derives the
    //      hash analytically from the text bytes; the span inverse for
    //      floor-division boxes is w = ((f+1)*w2 - 1) // nf (validated
    //      across nf shapes — the naive f*w2 // nf is the CEILING-span
    //      inverse and misassigns boundary frames). The 64-frame oracle
    //      bound comfortably covers the ~36-frame synthetic streams.
    "q_multimodal_y4m_thash" -> Q(
      (s, d) => Multimodal.y4mTemporalHash(Multimodal.encodeY4m(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text",
            "source")), windows = 16)
        .orderBy("media_id"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, len // 16) AS nf FROM m),
        |fs AS (SELECT media_id, nf, least(16, nf) AS w2, g.f,
        |    CAST(list_sum(list_transform(range(0, 16), p ->
        |      CASE WHEN f*16 + p + 1 <= len THEN ${byteAt("f*16 + p + 1")}
        |      ELSE 0 END)) AS BIGINT) AS s
        |  FROM d CROSS JOIN (SELECT unnest(range(0, 64)) AS f) g
        |  WHERE g.f < nf),
        |env AS (SELECT media_id, nf, w2, ((f + 1) * w2 - 1) // nf AS w,
        |    CAST(sum(s) AS BIGINT) AS ssum,
        |    CAST(count(*) * 16 AS BIGINT) AS cnt
        |  FROM fs GROUP BY 1, 2, 3, 4),
        |mw AS (SELECT media_id, nf, w2, w,
        |    (2 * ssum + cnt) // (2 * cnt) AS mv FROM env),
        |hsh AS (SELECT media_id, CAST(max(w2) AS INT) AS n_bits,
        |    CAST(max(nf) AS BIGINT) AS n_frames,
        |    CAST(coalesce(sum(CASE WHEN w2 * mv > (SELECT sum(m2.mv)
        |        FROM mw m2 WHERE m2.media_id = mw.media_id)
        |      THEN (CAST(1 AS BIGINT) << CAST(w2 - 1 - w AS INT))
        |      ELSE 0 END), 0) AS BIGINT) AS thash
        |  FROM mw GROUP BY media_id)
        |SELECT media_id, thash, n_bits, n_frames, true AS is_valid
        |FROM hsh ORDER BY media_id""".stripMargin
      }),

    // Frame sampling: the generator shape (rows out >> rows in, no shuffle)
    // hash-checked — DuckDB mirrors the deterministic payload slices with
    // blob substrings.
    "q_multimodal_frames" -> Q(
      (s, d) => Multimodal.frameSample(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text", "source"),
          nFrames = 3)
        .select(col("media_id"), col("frame_no").cast("bigint").as("frame_no"),
          // hex instead of raw bytes: DuckDB 1.0 can't substring a BLOB, so
          // the oracle slices the payload's hex string (2 chars/byte)
          hex(col("frame_payload")).as("frame_hex"),
          length(col("frame_payload")).cast("bigint").as("frame_len"))
        .orderBy("media_id", "frame_no"),
      Some("""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx FROM documents),
        |f AS (SELECT media_id, unnest(range(0, 3)) AS frame_no, hx FROM m)
        |SELECT media_id, frame_no,
        | substr(hx, CAST(frame_no*16+1 AS INT), 16) AS frame_hex,
        | CAST(length(substr(hx, CAST(frame_no*16+1 AS INT), 16)) // 2 AS BIGINT) AS frame_len
        |FROM f ORDER BY media_id, frame_no""".stripMargin)),

    // REAL video decode (third honest media kernel — the triple is now
    // image/audio/video): documents become genuine YUV4MPEG2 streams
    // (ASCII stream header + FRAME markers + raw 4×4 mono luma planes) and
    // the flatMap kernel WALKS the container, emitting every 2nd frame's
    // integer-exact luma stats. As with the PPM/WAV gates the oracle never
    // sees the decoder: every feature derives analytically from the text
    // bytes (16-byte frame slices, zero-padded singleton for short docs),
    // so a header-tag, frame-offset, or sampling-stride bug hash-fails.
    "q_multimodal_y4m_decode" -> Q(
      (s, d) => Multimodal.decodeY4mFrames(Multimodal.encodeY4m(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text", "source")),
          every = 2)
        .orderBy("media_id", "frame_no"),
      Some {
        def byteAt(p: String) =
          s"((instr('0123456789ABCDEF', substr(hx, 2*($p)-1, 1)) - 1) * 16 + " +
            s"(instr('0123456789ABCDEF', substr(hx, 2*($p), 1)) - 1))"
        s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS len FROM documents),
        |d AS (SELECT media_id, hx, len, greatest(1, len // 16) AS nf FROM m),
        |f AS (SELECT media_id, hx, len, unnest(range(0, nf)) AS k FROM d),
        |s AS (SELECT media_id, CAST(k AS INT) AS frame_no,
        |  list_transform(range(0, 16), j ->
        |    CASE WHEN k*16 + j + 1 <= len THEN ${byteAt("k*16 + j + 1")}
        |         ELSE 0 END) AS ys
        |  FROM f WHERE k % 2 = 0)
        |SELECT media_id, frame_no, 4 AS width, 4 AS height,
        | 'mono' AS colorspace,
        | CAST(list_sum(ys) AS DOUBLE) / 16 AS mean_y,
        | CAST(list_min(ys) AS INT) AS min_y,
        | CAST(list_max(ys) AS INT) AS max_y,
        | true AS is_valid
        |FROM s ORDER BY media_id, frame_no""".stripMargin
      }),

    // ---- leakage-free splits over the near-dup GRAPH: components of the
    //      jaccard pair frame become the split-hash key, so transitively-
    //      connected near-duplicates always share a split — the closure a
    //      pairwise content-hash split cannot give. The gate also AUDITS the
    //      guarantee: the cross-split near-dup pair count is computed from
    //      the same pair frame and must be 0 by construction.
    "q_sample_split_leakfree" -> Q(
      (s, d) => {
        import graft.operators.Sampling
        val docs = Tables.documents(s, d)
        // the pair frame feeds two branches (component labeling + the leak
        // audit); materialize it once or the jaccard pipeline runs twice
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
            threshold = 0.3, maxTokenDf = 100L, tokens = shingleSet)
          .select("id_a", "id_b")
          .gatePersist()
        pairs.count()
        val sp = Sampling.splitByComponents(docs, "doc_id", pairs,
            80, 10, salt = ":lf1")
          .select(col("doc_id"), col("comp"), col("split"))
        val leak = pairs
          .join(sp.select(col("doc_id").as("id_a"), col("split").as("sa")), Seq("id_a"))
          .join(sp.select(col("doc_id").as("id_b"), col("split").as("sb")), Seq("id_b"))
          .filter(col("sa") =!= col("sb"))
          .agg(count(lit(1)).as("n_leak_pairs"))
        sp.groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("comp")).as("n_comps"))
          .crossJoin(broadcast(leak))
          .orderBy("split")
      },
      Some(s"""WITH RECURSIVE ${compCtes()},
        |lab AS (SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS comp
        |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
        |sp AS (SELECT doc_id, comp,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
        | FROM (SELECT doc_id, comp,
        |   ${fp60Sql("CAST(comp AS VARCHAR) || ':lf1'")} % 100 AS b FROM lab)),
        |leak AS (SELECT count(*) AS n_leak_pairs FROM pairs p
        |  JOIN sp a ON a.doc_id = p.id_a
        |  JOIN sp b ON b.doc_id = p.id_b
        |  WHERE a.split != b.split)
        |SELECT split, count(*) AS n_docs, count(DISTINCT comp) AS n_comps,
        |  (SELECT n_leak_pairs FROM leak) AS n_leak_pairs
        |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- SOFT dedup: downweight duplicates instead of dropping them —
    //      every document carries weight 1/|near-dup cluster| and a
    //      deterministic integer-arithmetic Bernoulli keep at that rate
    //      (b * size < 2^20), so a cluster of n contributes ~1 expected
    //      exemplar while keeping surface diversity available. Per-source
    //      report: effective corpus size (decimal-exact weight sum) vs kept
    //      counts.
    "q_dedup_soft" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
            threshold = 0.3, maxTokenDf = 100L, tokens = shingleSet)
          .select("id_a", "id_b")
        Dedup.softDedupSample(docs, "doc_id", pairs, salt = ":sd1")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("kept"), lit(1))).as("n_kept"),
            sum(when(col("cluster_size") > 1, lit(1L)).otherwise(lit(0L)))
              .as("n_clustered"),
            round(sum(round(col("weight"), 9).cast("decimal(28,9)"))
              .cast("double"), 6).as("eff_docs"))
          .orderBy("source")
      },
      Some(s"""WITH RECURSIVE ${compCtes()},
        |lab AS (SELECT d.doc_id, d.source, COALESCE(c.comp, d.doc_id) AS comp
        |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
        |sz AS (SELECT comp, count(*) AS cluster_size FROM lab GROUP BY 1),
        |w AS (SELECT lab.doc_id, lab.source, lab.comp, sz.cluster_size,
        |  CAST(1 AS DOUBLE) / sz.cluster_size AS weight,
        |  ${fp60Sql("CAST(lab.doc_id AS VARCHAR) || ':sd1'")} AS b
        | FROM lab JOIN sz ON sz.comp = lab.comp)
        |SELECT source, count(*) AS n_docs,
        |  count(CASE WHEN b < ${1L << 60} // cluster_size THEN 1 END) AS n_kept,
        |  CAST(sum(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clustered,
        |  round(CAST(sum(CAST(round(weight, 9) AS DECIMAL(28,9))) AS DOUBLE), 6)
        |    AS eff_docs
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- blocklist screening: token hits against a broadcast term frame,
    //      reported per source under both standard policies (drop-on-any —
    //      the C4 rule — and fraction-threshold). The blocked-fraction mass
    //      is decimal-summed for order independence.
    "q_curate_blocklist" -> Q(
      (s, d) => {
        import s.implicits._
        val terms = Seq("slow", "dup", "noise").toDF("term")
        graft.operators.Curation.blocklistFlags(
            Tables.documents(s, d), "doc_id", "text", terms)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("has_blocked"), lit(1))).as("n_any"),
            count(when(col("blocked_frac") > 0.05, lit(1))).as("n_over_frac"),
            sum(col("n_blocked")).as("blocked_tokens"),
            round(sum(round(col("blocked_frac"), 9).cast("decimal(28,9)"))
              .cast("double"), 6).as("frac_mass"))
          .orderBy("source")
      },
      Some(s"""WITH bl AS (SELECT unnest(['slow', 'dup', 'noise']) AS tok),
        |t AS (SELECT doc_id, source, $ToksSql AS toks FROM documents),
        |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |h AS (SELECT e.doc_id, count(*) AS n_blocked
        |  FROM e JOIN bl ON bl.tok = e.tok GROUP BY 1),
        |f AS (SELECT t.doc_id, t.source, len(toks) AS n_tokens,
        |  COALESCE(h.n_blocked, 0) AS n_blocked,
        |  CASE WHEN len(toks) > 0
        |    THEN CAST(COALESCE(h.n_blocked, 0) AS DOUBLE) / len(toks)
        |    ELSE CAST(0 AS DOUBLE) END AS blocked_frac
        | FROM t LEFT JOIN h ON h.doc_id = t.doc_id)
        |SELECT source, count(*) AS n_docs,
        |  count(CASE WHEN n_blocked > 0 THEN 1 END) AS n_any,
        |  count(CASE WHEN blocked_frac > 0.05 THEN 1 END) AS n_over_frac,
        |  CAST(sum(n_blocked) AS BIGINT) AS blocked_tokens,
        |  round(CAST(sum(CAST(round(blocked_frac, 9) AS DECIMAL(28,9)))
        |    AS DOUBLE), 6) AS frac_mass
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- model-output contamination screen (the self-consuming-loop
    //      guard): chat-template control tokens + assistant boilerplate,
    //      both scan-stage contains chains. Two corpus-present phrases
    //      ride along so the hit path is exercised; the real markers
    //      screen zero docs here (organic corpus), which the gate pins.
    "q_curate_synthetic_screen" -> Q(
      (s, d) => {
        import graft.operators.Curation
        Curation.syntheticScreen(Tables.documents(s, d), "text",
            phrases = Curation.DefaultAiPhrases ++
              Seq("slow filter value", "batch window spark"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("has_template"), lit(1))).as("n_template"),
            count(when(col("has_ai_phrase"), lit(1))).as("n_phrase"),
            count(when(col("is_synthetic"), lit(1))).as("n_flagged"))
          .withColumn("rate",
            round(col("n_flagged").cast("double") / col("n_docs"), 6))
          .orderBy("source")
      },
      Some {
        val tmpl = graft.operators.Curation.DefaultTemplateMarkers
          .map(m => s"contains(text, '${m.replace("'", "''")}')")
          .mkString(" OR ")
        val phr = (graft.operators.Curation.DefaultAiPhrases ++
            Seq("slow filter value", "batch window spark"))
          .map(p => s"contains(lower(text), '${p.toLowerCase.replace("'", "''")}')")
          .mkString(" OR ")
        s"""WITH f AS (SELECT source,
          |  COALESCE($tmpl, false) AS has_t,
          |  COALESCE($phr, false) AS has_p
          |  FROM documents)
          |SELECT source, count(*) AS n_docs,
          |  count(CASE WHEN has_t THEN 1 END) AS n_template,
          |  count(CASE WHEN has_p THEN 1 END) AS n_phrase,
          |  count(CASE WHEN has_t OR has_p THEN 1 END) AS n_flagged,
          |  round(CAST(count(CASE WHEN has_t OR has_p THEN 1 END) AS DOUBLE)
          |    / count(*), 6) AS rate
          |FROM f GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ---- crawl-URL canonicalization + URL-keyed dedup: fragment / tracking
    //      params / userinfo / default port / trailing slash all fold away,
    //      then one keeper per canonical key (min doc_id) with dup_count —
    //      the pre-content-hash dedup a web pipeline runs first. Synthetic
    //      urls exercise every rule; the oracle mirrors each regex verbatim
    //      (Spark $1 = DuckDB \\1 backrefs).
    "q_curate_url_canonical" -> Q(
      (s, d) => {
        val url = concat(
          when(col("doc_id") % 2 === 0, lit("HTTP://User@WWW.Example.COM:80"))
            .otherwise(lit("https://cdn.example.net:443")),
          lit("/page/"), (col("doc_id") % 17).cast("string"),
          when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 3 === 0,
            concat(lit("?utm_source=feed&q="), (col("doc_id") % 7).cast("string"),
              lit("&gclid=zz"))).otherwise(lit("")),
          when(col("doc_id") % 4 === 0, lit("#frag")).otherwise(lit("")))
        graft.operators.Curation.dedupByUrl(
            docsP(s, d).select(col("doc_id"), url.as("url")),
            "doc_id", "url")
          .select(col("doc_id"), col("canonical_url"), col("dup_count"),
            col("is_keeper"))
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://User@WWW.Example.COM:80'
        |        ELSE 'https://cdn.example.net:443' END)
        |  || '/page/' || CAST(doc_id % 17 AS VARCHAR)
        |  || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
        |  || (CASE WHEN doc_id % 3 = 0
        |        THEN '?utm_source=feed&q=' || CAST(doc_id % 7 AS VARCHAR) || '&gclid=zz'
        |        ELSE '' END)
        |  || (CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END) AS url
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  regexp_replace(url, '#.*$$', '') AS nf FROM u),
        |b AS (SELECT doc_id, nf,
        |  CASE WHEN instr(nf, '?') > 0 THEN substr(nf, 1, instr(nf, '?') - 1)
        |       ELSE nf END AS base,
        |  regexp_extract(nf, '\\?(.*)$$', 1) AS q FROM c),
        |p AS (SELECT doc_id, base,
        |  coalesce(array_to_string(list_filter(string_split(q, '&'), x ->
        |    len(x) > 0 AND NOT regexp_matches(x,
        |      '^(utm_[^=]*|gclid|fbclid|ref)(=|$$)')), '&'), '') AS q2
        |  FROM b),
        |n AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(
        |    regexp_replace(lower(regexp_extract(base, '(?i)^(https?://[^/]+)', 1)),
        |      '^(https?://)[^@/]*@', '\\1'),
        |    '^(http://[^/]*?):80$$', '\\1'), '^(https://[^/]*?):443$$', '\\1')
        |  || regexp_replace(regexp_replace(base, '(?i)^https?://[^/]+', ''), '/$$', '')
        |  || CASE WHEN q2 <> '' THEN '?' || q2 ELSE '' END AS canonical_url
        |  FROM p),
        |a AS (SELECT canonical_url, min(doc_id) AS keep_id,
        |  count(*) AS dup_count FROM n GROUP BY 1)
        |SELECT n.doc_id, n.canonical_url, a.dup_count,
        |  n.doc_id = a.keep_id AS is_keeper
        |FROM n JOIN a USING (canonical_url) ORDER BY doc_id""".stripMargin)),

    // ---- HTML -> text extraction (step ZERO of the web chain): synthetic
    //      pages with script/style bodies, comments, block tags, attributes
    //      and the common entities, built from the word soup; the oracle
    //      replays the identical RE2-safe regex chain ('g' flags — Spark
    //      regexp_replace is global by default). Block tags must become
    //      line breaks: the line-based cleaners downstream key on that.
    "q_curate_html_extract" -> Q(
      (s, d) => {
        val words = split(col("text"), " ")
        def seg(st: Int, ln: Int) = array_join(slice(words, st, ln), " ")
        val html = concat(
          lit("<html><head><title>"), seg(1, 2),
          lit("</title><style>p{c:red}</style>"),
          lit("<script>var a=\"<p>\";</script></head><body><h1>"), seg(3, 3),
          lit("</h1><p>"), seg(6, 4), lit(" &amp; "), seg(10, 2),
          lit("</p><!-- "), seg(12, 2), lit(" --><div class=\"x\">"), seg(14, 3),
          lit("&nbsp;[&#39;q&#39;]</div><ul><li>"), seg(17, 2),
          lit("</li></ul></body></html>"))
        docsP(s, d).select(col("doc_id"), html.as("html"))
          .select(col("doc_id"),
            graft.operators.Curation.htmlToText(col("html")).as("text"))
          .select(col("doc_id"), md5(col("text")).as("text_md5"),
            (size(split(col("text"), "\n"))).cast("bigint").as("n_lines"),
            length(col("text")).cast("bigint").as("n_chars"))
          .orderBy("doc_id")
      },
      Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |h AS (SELECT doc_id,
        |  '<html><head><title>'
        |  || coalesce(array_to_string(list_slice(ws, 1, 2), ' '), '')
        |  || '</title><style>p{c:red}</style>'
        |  || '<script>var a="<p>";</script></head><body><h1>'
        |  || coalesce(array_to_string(list_slice(ws, 3, 5), ' '), '')
        |  || '</h1><p>'
        |  || coalesce(array_to_string(list_slice(ws, 6, 9), ' '), '')
        |  || ' &amp; '
        |  || coalesce(array_to_string(list_slice(ws, 10, 11), ' '), '')
        |  || '</p><!-- '
        |  || coalesce(array_to_string(list_slice(ws, 12, 13), ' '), '')
        |  || ' --><div class="x">'
        |  || coalesce(array_to_string(list_slice(ws, 14, 16), ' '), '')
        |  || '&nbsp;[&#39;q&#39;]</div><ul><li>'
        |  || coalesce(array_to_string(list_slice(ws, 17, 18), ' '), '')
        |  || '</li></ul></body></html>' AS html
        |  FROM w),
        |s1 AS (SELECT doc_id, regexp_replace(html,
        |  '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(t,
        |  '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(t,
        |  '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2),
        |s4 AS (SELECT doc_id, regexp_replace(t,
        |  '(?i)</?(p|div|br|li|ul|ol|tr|table|h[1-6])\\b[^>]*>', chr(10), 'g')
        |  AS t FROM s3),
        |s5 AS (SELECT doc_id, regexp_replace(t, '<[^>]+>', ' ', 'g') AS t FROM s4),
        |s6 AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(t,
        |      '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
        |      '&quot;', '"', 'g'), '&#39;', chr(39), 'g'), '&amp;', '&', 'g')
        |  AS t FROM s5),
        |s7 AS (SELECT doc_id, regexp_replace(t, '[ \\t\\f\\r]+', ' ', 'g') AS t FROM s6),
        |s8 AS (SELECT doc_id, regexp_replace(t, ' ?\\n ?', chr(10), 'g') AS t FROM s7),
        |s9 AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(t, '\\n{2,}', chr(10), 'g'),
        |    '^\\n+|\\n+$$', '', 'g')) AS t FROM s8)
        |SELECT doc_id, md5(t) AS text_md5,
        |  CAST(len(string_split(t, chr(10))) AS BIGINT) AS n_lines,
        |  CAST(length(t) AS BIGINT) AS n_chars
        |FROM s9 ORDER BY doc_id""".stripMargin)),

    // ---- robots-style URL-prefix screening: the path-level blocklist
    //      (whole site sections excluded). BOTH sides canonicalize — the
    //      gate's prefixes arrive uppercase/userinfo'd/with default ports
    //      and still match — and the verdict is a scan-stage
    //      exists(startsWith) over one broadcast array row.
    "q_curate_url_prefix_screen" -> Q(
      (s, d) => {
        import s.implicits._
        val url = concat(
          when(col("doc_id") % 2 === 0, lit("HTTP://User@WWW.Example.COM:80"))
            .otherwise(lit("https://cdn.example.net:443")),
          lit("/page/"), (col("doc_id") % 17).cast("string"),
          when(col("doc_id") % 3 === 0, lit("?utm_source=feed&q=1")).otherwise(lit("")))
        val prefixes = Seq("HTTPS://CDN.example.net:443/page/1",
          "http://User@WWW.Example.COM/page/3").toDF("prefix")
        graft.operators.Curation.screenUrlPrefixes(
            docsP(s, d).select(col("doc_id"), url.as("url")), "url", prefixes)
          .select(col("doc_id"), col("canonical_url"), col("url_blocked"))
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://User@WWW.Example.COM:80'
        |        ELSE 'https://cdn.example.net:443' END)
        |  || '/page/' || CAST(doc_id % 17 AS VARCHAR)
        |  || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&q=1'
        |        ELSE '' END) AS url
        |  FROM documents),
        |cn AS (SELECT doc_id, regexp_replace(url, '#.*$$', '') AS nf FROM u),
        |b AS (SELECT doc_id, nf,
        |  CASE WHEN instr(nf, '?') > 0 THEN substr(nf, 1, instr(nf, '?') - 1)
        |       ELSE nf END AS base,
        |  regexp_extract(nf, '\\?(.*)$$', 1) AS q FROM cn),
        |p AS (SELECT doc_id, base,
        |  coalesce(array_to_string(list_filter(string_split(q, '&'), x ->
        |    len(x) > 0 AND NOT regexp_matches(x,
        |      '^(utm_[^=]*|gclid|fbclid|ref)(=|$$)')), '&'), '') AS q2
        |  FROM b),
        |n AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(
        |    regexp_replace(lower(regexp_extract(base, '(?i)^(https?://[^/]+)', 1)),
        |      '^(https?://)[^@/]*@', '\\1'),
        |    '^(http://[^/]*?):80$$', '\\1'), '^(https://[^/]*?):443$$', '\\1')
        |  || regexp_replace(regexp_replace(base, '(?i)^https?://[^/]+', ''), '/$$', '')
        |  || CASE WHEN q2 <> '' THEN '?' || q2 ELSE '' END AS canonical_url
        |  FROM p)
        |SELECT doc_id, canonical_url,
        |  (starts_with(canonical_url, 'https://cdn.example.net/page/1')
        |   OR starts_with(canonical_url, 'http://www.example.com/page/3'))
        |    AS url_blocked
        |FROM n ORDER BY doc_id""".stripMargin)),

    // ---- domain-level screening (RefinedWeb-style: curate the SITE): per-
    //      domain doc counts + exact-decimal mean quality, domains over the
    //      doc cap or under the quality floor flagged, every doc handed its
    //      domain verdict through one AQE-splittable shuffle_hash join.
    "q_curate_domain_screen" -> Q(
      (s, d) => {
        val docs = docsP(s, d).select(col("doc_id"), col("source"),
          concat(lit("site"), (col("doc_id") % 37).cast("string"), lit(".example"))
            .as("domain"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        graft.operators.Curation.screenDomains(docs, "doc_id", "domain",
            col("quality"), maxDocsPerDomain = 15L, minAvgQuality = 0.55)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("domain_flagged"), lit(1))).as("n_flagged"),
            countDistinct(when(col("domain_flagged"), col("domain")))
              .as("n_flagged_domains"))
          .orderBy("source")
      },
      Some(s"""WITH t AS (SELECT doc_id, source, text, $ToksSql AS toks FROM documents),
        |q AS (SELECT doc_id, source,
        |  'site' || CAST(doc_id % 37 AS VARCHAR) || '.example' AS domain,
        | ((((CASE WHEN length(text) BETWEEN 50 AND 10000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
        |  + (CASE WHEN $StopRatioSql > 0.01 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
        |  + (CASE WHEN $PunctRatioSql < 0.2 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
        |  + (CASE WHEN $AvgTokLenSql BETWEEN 2.0 AND 12.0 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)) AS quality
        | FROM t),
        |st AS (SELECT domain, count(*) AS domain_docs,
        |  ${ExactAgg.avgSql("quality", 6)} AS domain_avg_quality
        |  FROM q GROUP BY 1),
        |v AS (SELECT q.doc_id, q.source, q.domain,
        |  (st.domain_docs > 15 OR st.domain_avg_quality < 0.55) AS domain_flagged
        |  FROM q JOIN st USING (domain))
        |SELECT source, count(*) AS n_docs,
        |  count(CASE WHEN domain_flagged THEN 1 END) AS n_flagged,
        |  count(DISTINCT CASE WHEN domain_flagged THEN domain END)
        |    AS n_flagged_domains
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- INCREMENTAL domain-stats maintenance: the Spark side folds a new
    //      crawl batch (doc_id % 4 == 0) into the stored stats of the rest
    //      via mergeDomainStats and derives verdicts from the MERGED frame;
    //      the oracle recomputes flat over the full corpus — equality IS
    //      the increment-correctness proof (decimal sums make the merge
    //      exact and order-free).
    "q_curate_domain_screen_increment" -> Q(
      (s, d) => {
        import graft.operators.Curation
        val all = docsP(s, d).select(col("doc_id"),
          concat(lit("site"), (col("doc_id") % 37).cast("string"), lit(".example"))
            .as("domain"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        val base = all.filter(col("doc_id") % 4 =!= 0)
        val inc = all.filter(col("doc_id") % 4 === 0)
        val merged = Curation.mergeDomainStats(
          Curation.domainStats(base, "domain", col("quality")),
          Curation.domainStats(inc, "domain", col("quality")))
        Curation.domainVerdicts(merged, maxDocsPerDomain = 15L,
            minAvgQuality = 0.55)
          .orderBy("domain")
      },
      Some(s"""WITH t AS (SELECT doc_id, text, $ToksSql AS toks FROM documents),
        |q AS (SELECT doc_id,
        |  'site' || CAST(doc_id % 37 AS VARCHAR) || '.example' AS domain,
        | ((((CASE WHEN length(text) BETWEEN 50 AND 10000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
        |  + (CASE WHEN $StopRatioSql > 0.01 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
        |  + (CASE WHEN $PunctRatioSql < 0.2 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END))
        |  + (CASE WHEN $AvgTokLenSql BETWEEN 2.0 AND 12.0 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)) AS quality
        | FROM t)
        |SELECT domain, count(*) AS domain_docs,
        |  ${ExactAgg.avgSql("quality", 6)} AS domain_avg_quality,
        |  (count(*) > 15 OR ${ExactAgg.avgSql("quality", 6)} < 0.55)
        |    AS domain_flagged
        |FROM q GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- distinct-n corpus diversity: per-source positional-bigram totals
    //      vs distinct counts — low ratios expose mutually-templated sources
    //      that per-document repetition stats cannot see.
    "q_text_distinct_ngrams" -> Q(
      (s, d) => graft.operators.Diagnostics.distinctNgramRatio(
          Tables.documents(s, d), "source", "text", n = 2)
        .orderBy("source"),
      Some(s"""WITH t AS (SELECT source, $ToksSql AS toks FROM documents),
        |s0 AS (SELECT source, unnest(${spanShinglesSql(2)}) AS tok FROM t),
        |f AS (SELECT source, $TokenFp60Sql AS fp FROM s0),
        |g AS (SELECT source, fp, count(*) AS c FROM f GROUP BY 1, 2)
        |SELECT source, CAST(sum(c) AS BIGINT) AS n_ngrams,
        |  count(*) AS n_distinct,
        |  round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS distinct_ratio
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Matryoshka truncation recall: how much of the full-dim top-10
    //      survives at 8/16/32 of the 64 dims (cosine renormalizes
    //      implicitly) — the curve that picks an MRL serving dimension.
    "q_sim_matryoshka_recall" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.matryoshkaRecall(emb, emb.filter(col("vec_id") < 8),
            k = 10, dims = Seq(8, 16, 32))
          .orderBy("m", "query_id")
      },
      Some(MatryoshkaOracleSql)),

    // The same recall curve over PER-DIM truncated IVF indexes (round 15 —
    // the searchIvf swap matryoshkaRecall's doc promised): the deployment
    // persists one index per candidate serving dim at ingest, so each dim's
    // ranking is cell-local instead of corpus-linear. Full-dim baseline
    // probes the session's shared 64-dim index. Every cell probed on every
    // index (nProbe = nLists), so rankings — and the recall rows — are
    // bit-identical to the brute twin, which donates its oracle.
    "q_sim_matryoshka_recall_ivf" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val dimIndexes = Seq(8, 16, 32).map { m =>
          m -> Similarity.sharedIvf(
            emb.select(col("vec_id"), slice(col("embedding"), 1, m).as("embedding")),
            corpusKey = d + s"#mat$m", nLists = 8)
        }
        Similarity.matryoshkaRecallIvf(
            Similarity.sharedIvf(emb, corpusKey = d, nLists = 16), dimIndexes,
            emb.filter(col("vec_id") < 8), k = 10, nProbe = 8, nProbeFull = 16)
          .orderBy("m", "query_id")
      },
      Some(MatryoshkaOracleSql), prewarm = Some(PrewarmMatryoshkaIvf)),

    // ---- margin-criterion bitext mining (LASER/CCMatrix alignment rule):
    //      the even-id half of the embedding corpus mined against the odd
    //      half — forward/backward k-NN (k=4), ratio margin normalizing the
    //      pair cosine by both endpoints' neighborhood means, MUTUAL-best
    //      filter, margin >= 1.05. At gate scale both directions are brute
    //      crossTopK; the corpus-scale path is bitextMineIvf (each side
    //      probing the other's persisted index — SimilaritySpec pins
    //      equality at nProbe = nLists).
    "q_sim_bitext_mine" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bitextMine(
            emb.filter(col("vec_id") % 2 === 0),
            emb.filter(col("vec_id") % 2 === 1),
            k = 4, minMargin = 1.05)
          .orderBy("src_id")
      },
      Some(BitextMineOracleSql)),

    // The same mining routed through TWO persisted IVF indexes (round 15 —
    // the corpus-scale path promised in r14, now gated): each direction
    // probes the OTHER side's index, so neither side is broadcast and the
    // pair space is cell-pruned. At nProbe = nLists (this gate) every cell
    // is probed, so the result is bit-identical to the brute twin and
    // shares its oracle; the nProbe < nLists equality/recall contract
    // lives in SimilaritySpec.
    "q_sim_bitext_mine_ivf" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val xs = emb.filter(col("vec_id") % 2 === 0)
        val ys = emb.filter(col("vec_id") % 2 === 1)
        Similarity.bitextMineIvf(
            Similarity.sharedIvf(xs, corpusKey = d + "#bitext_x", nLists = 8),
            Similarity.sharedIvf(ys, corpusKey = d + "#bitext_y", nLists = 8),
            xs, ys, k = 4, minMargin = 1.05, nProbe = 8)
          .orderBy("src_id")
      },
      Some(BitextMineOracleSql), prewarm = Some(PrewarmBitextIvf)),

    // ---- hybrid retrieval: BM25 lexical top-20 and embedding-cosine
    //      top-20 fused by reciprocal rank (c = 60). Queries are the first 8
    //      documents (text + their embedding under the shared id space);
    //      the corpus is the id >= 8 remainder on BOTH retrievers so the
    //      two candidate sets are drawn from the same pool and self-matches
    //      are excluded symmetrically. The oracle recomputes both rankings
    //      and the fusion arithmetic end to end.
    "q_sim_hybrid_rrf" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val emb = Tables.embeddings(s, d)
        val corpus = docs.filter(col("doc_id") >= 8)
        val queries = docs.filter(col("doc_id") < 8)
          .select(col("doc_id").as("query_id"), col("text").as("qtext"))
        val lex = graft.operators.TermWeights.bm25TopK(
            corpus, "doc_id", "text", queries, "query_id", "qtext", k = 20)
          .select(col("query_id"), col("doc_id").as("nbr_id"), col("rank"))
        val vec = Similarity.bruteForceTopK(
            emb.filter(col("vec_id") >= 8), emb.filter(col("vec_id") < 8), k = 20)
          .select(col("query_id"), col("nbr_id"), col("rank"))
        Similarity.rrfFuse(Seq(lex, vec), k = 10, c = 60)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents
        |  WHERE doc_id >= 8),
        |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM e GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        |st AS (SELECT (SELECT count(*) FROM documents WHERE doc_id >= 8) AS n_docs,
        |  CAST((SELECT COALESCE(sum(tf), 0) FROM tf) AS DOUBLE)
        |    / (SELECT count(*) FROM documents WHERE doc_id >= 8) AS avgdl),
        |q AS (SELECT doc_id AS query_id, $ToksSql AS toks FROM documents
        |  WHERE doc_id < 8),
        |qt AS (SELECT DISTINCT query_id, unnest(toks) AS tok FROM q),
        |m AS (SELECT qt.query_id, tf.doc_id, CAST(round(
        |    ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
        |    * ((CAST(tf AS DOUBLE) * ${1.2 + 1.0}) / (CAST(tf AS DOUBLE)
        |       + ${1.2} * (${1.0 - 0.75} + ${0.75} * (CAST(dl AS DOUBLE) / avgdl)))),
        |    9) AS DECIMAL(28,9)) AS contrib
        |  FROM tf JOIN qt ON qt.tok = tf.tok JOIN df ON df.tok = tf.tok
        |    JOIN dl ON dl.doc_id = tf.doc_id, st),
        |bs AS (SELECT query_id, doc_id,
        |  CAST(sum(contrib) AS DECIMAL(28,9)) AS score_d FROM m GROUP BY 1, 2),
        |lex AS (SELECT query_id, doc_id AS nbr_id,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY score_d DESC, doc_id) AS rank FROM bs
        |  QUALIFY rank <= 20),
        |ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |qv AS (SELECT vec_id AS query_id, v AS qv FROM ev WHERE vec_id < 8),
        |sv AS (SELECT query_id, ev.vec_id AS nbr_id, ${cosSql("qv", "ev.v")} AS cosine
        |  FROM ev CROSS JOIN qv WHERE ev.vec_id >= 8),
        |vr AS (SELECT query_id, nbr_id,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, nbr_id) AS rank FROM sv
        |  QUALIFY rank <= 20),
        |u AS (SELECT query_id, nbr_id, rank FROM lex
        |  UNION ALL SELECT query_id, nbr_id, rank FROM vr),
        |f AS (SELECT query_id, nbr_id, count(*) AS n_lists,
        |  sum(CAST(round(CAST(1 AS DOUBLE) / (60 + rank), 9)
        |    AS DECIMAL(28,9))) AS score_d
        | FROM u GROUP BY 1, 2),
        |rr AS (SELECT query_id, nbr_id, n_lists,
        |  CAST(round(score_d, 6) AS DOUBLE) AS rrf_score,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY score_d DESC, nbr_id) AS rank FROM f)
        |SELECT query_id, nbr_id, n_lists, rrf_score, rank
        |FROM rr WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // ---- full-corpus Lloyd k-means refinement: 2 assign+mean rounds from
    //      a deterministic seed (the first 8 vectors), per-dimension means
    //      decimal-summed so every centroid value is bit-reproducible. The
    //      oracle unrolls both rounds with the same sequential-fold
    //      distance and argmin tie-break.
    "q_v_kmeans_refine" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id").as("nbr_id"), col("embedding").as("nbr_v"))
        val init = emb.filter(col("nbr_id") < 8)
          .select(col("nbr_id").cast("int").as("cell"),
            col("nbr_v").cast("array<double>").as("centroid"))
        Similarity.refineCentroids(emb, init, iters = 2)
          .select(col("cell"), col("n_vecs"),
            round(element_at(col("centroid"), 1), 6).as("c_first"),
            round(element_at(col("centroid"), 32), 6).as("c_mid"),
            round(element_at(col("centroid"), 64), 6).as("c_last"),
            round(aggregate(col("centroid"), lit(0.0),
              (a, x) => a + x * x), 6).as("norm2"))
          .orderBy("cell")
      },
      Some {
        def iter(i: Int): String = {
          val prev = s"c${i - 1}"
          s"""a$i AS (SELECT nbr_id, v, cell FROM (
             |  SELECT e.nbr_id, e.v, c.cell,
             |    row_number() OVER (PARTITION BY e.nbr_id
             |      ORDER BY ${d2Sql("e.v", "c.centroid")}, c.cell) AS rn
             |  FROM ev e CROSS JOIN $prev c) WHERE rn = 1),
             |m$i AS (SELECT cell, pos,
             |  CAST(sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE)
             |    / count(*) AS m, count(*) AS n
             | FROM (SELECT cell, unnest(v) AS x,
             |   unnest(range(1, len(v) + 1)) AS pos FROM a$i)
             | GROUP BY 1, 2),
             |c$i AS (SELECT cell, list(m ORDER BY pos) AS centroid,
             |  max(n) AS n_vecs FROM m$i GROUP BY 1)""".stripMargin
        }
        s"""WITH ev AS (SELECT vec_id AS nbr_id,
           |  CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |c0 AS (SELECT CAST(nbr_id AS INT) AS cell, v AS centroid
           |  FROM ev WHERE nbr_id < 8),
           |${iter(1)},
           |${iter(2)}
           |SELECT cell, CAST(n_vecs AS BIGINT) AS n_vecs,
           |  round(centroid[1], 6) AS c_first,
           |  round(centroid[32], 6) AS c_mid,
           |  round(centroid[64], 6) AS c_last,
           |  round(list_dot_product(centroid, centroid), 6) AS norm2
           |FROM c2 ORDER BY cell""".stripMargin
      }),

    // ---- Z-order layout key: 8-bit fixed-range buckets of (l_partkey,
    //      l_suppkey) bit-interleaved into the Morton z-value that
    //      repartitionByRange clusters files by. The gate pins the VALUE
    //      arithmetic (bounds pass, bucketization, interleave) — the
    //      physical re-layout's file-range tightness is spec-pinned, since
    //      range-partition split points are sampled, not deterministic.
    "q_o_zorder" -> Q(
      (s, d) => graft.operators.Layout.withZValue(
          Tables.lineitem(s, d), Seq("l_partkey", "l_suppkey"), bits = 8)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"), col("z"))
        .orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))
        .limit(50),
      Some {
        def bucket(c: String, lo: String, hi: String): String =
          s"""CASE WHEN (CAST($hi AS DOUBLE) - CAST($lo AS DOUBLE)) > 0
             | THEN least(greatest(CAST(floor(
             |   (CAST($c AS DOUBLE) - CAST($lo AS DOUBLE))
             |   / (CAST($hi AS DOUBLE) - CAST($lo AS DOUBLE)) * 256) AS BIGINT),
             |  0), 255) ELSE 0 END""".stripMargin
        val z = (for (b <- 0 until 8; j <- 0 to 1)
          yield s"(((b$j >> $b) & 1) << ${b * 2 + j})").mkString(" | ")
        s"""WITH st AS (SELECT min(l_partkey) AS lo0, max(l_partkey) AS hi0,
           |  min(l_suppkey) AS lo1, max(l_suppkey) AS hi1 FROM lineitem),
           |b AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           |  ${bucket("l_partkey", "lo0", "hi0")} AS b0,
           |  ${bucket("l_suppkey", "lo1", "hi1")} AS b1
           | FROM lineitem, st)
           |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, ($z) AS z
           |FROM b ORDER BY z, l_orderkey, l_linenumber LIMIT 50""".stripMargin
      }),

    // ---- capstone v7: this round's additions composed into the pipeline a
    //      policy-screened, softly-deduped, leakage-free-split corpus runs —
    //      blocklist fraction screen -> near-dup soft-dedup sample ->
    //      component-hash split -> per-(split, source) doc/token accounting.
    //      One components closure feeds both the soft-dedup weights and the
    //      split key (the sample's comp column IS the split group).
    "q_pipeline_curate_v7" -> Q(
      (s, d) => {
        import s.implicits._
        import graft.operators.{Curation, Sampling}
        val docs = Tables.documents(s, d)
        val terms = Seq("slow", "dup", "noise").toDF("term")
        val screened = Curation.blocklistFlags(docs, "doc_id", "text", terms)
          .filter(col("blocked_frac") <= 0.05)
          .select("doc_id", "source", "text")
        val pairs = Dedup.jaccardPairs(screened, "doc_id", "text",
            threshold = 0.3, maxTokenDf = 100L, tokens = shingleSet)
          .select("id_a", "id_b")
          .gatePersist()
        pairs.count()
        val soft = Dedup.softDedupSample(screened, "doc_id", pairs, salt = ":v7")
          .filter(col("kept"))
        Sampling.splitByGroup(soft, col("comp"), 80, 10, salt = ":v7s")
          .groupBy("split", "source")
          .agg(count(lit(1)).as("n_docs"),
            sum(TextFunctions.tokenCount(col("text")).cast("long")).as("n_tokens"))
          .orderBy("split", "source")
      },
      Some(s"""WITH RECURSIVE bl AS (SELECT unnest(['slow', 'dup', 'noise']) AS tok),
        |t0 AS (SELECT doc_id, source, text, $ToksSql AS toks FROM documents),
        |e0 AS (SELECT doc_id, unnest(toks) AS tok FROM t0),
        |h AS (SELECT e0.doc_id, count(*) AS n_blocked
        |  FROM e0 JOIN bl ON bl.tok = e0.tok GROUP BY 1),
        |scr AS (SELECT t0.doc_id, t0.source, t0.text
        | FROM t0 LEFT JOIN h ON h.doc_id = t0.doc_id
        | WHERE (CASE WHEN len(toks) > 0
        |   THEN CAST(COALESCE(h.n_blocked, 0) AS DOUBLE) / len(toks)
        |   ELSE CAST(0 AS DOUBLE) END) <= 0.05),
        |${compCtes("scr")},
        |lab AS (SELECT s.doc_id, s.source, s.text,
        |  COALESCE(c.comp, s.doc_id) AS comp
        | FROM scr s LEFT JOIN comp c ON c.id = s.doc_id),
        |sz AS (SELECT comp, count(*) AS cluster_size FROM lab GROUP BY 1),
        |kept AS (SELECT lab.doc_id, lab.source, lab.text, lab.comp
        | FROM lab JOIN sz ON sz.comp = lab.comp
        | WHERE ${fp60Sql("CAST(lab.doc_id AS VARCHAR) || ':v7'")}
        |   < ${1L << 60} // sz.cluster_size),
        |sp AS (SELECT doc_id, source, text,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid'
        |    ELSE 'test' END AS split
        | FROM (SELECT kept.*,
        |   ${fp60Sql("CAST(comp AS VARCHAR) || ':v7s'")} % 100 AS b FROM kept))
        |SELECT split, source, count(*) AS n_docs,
        |  CAST(sum(len($ToksSql)) AS BIGINT) AS n_tokens
        |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Lang-routed curation capstone (round 17, v8): the CCNet-shaped
    //      front half — the TRAINED lang-id (labels only on the 80% split,
    //      the annotated-slice production shape) routes EVERY document,
    //      the quality screen cuts per route, and the summary reports each
    //      (source, route)'s surviving mass plus how much of it the router
    //      agreed with ground truth on (the routing-precision number an
    //      operator reads before trusting per-language budgets). Every
    //      stage is an already-gated operator; deliberately ONE scan past
    //      the langid pipeline, not a fifth heavy capstone. NOTE on the
    //      synthetic corpus: the documents table's lang labels are drawn
    //      INDEPENDENTLY of its shared-vocabulary text, so the Bayes
    //      optimum here IS the majority-class posterior — every doc routes
    //      'en' and n_lang_match reads the per-source 'en' share. The
    //      gate pins the full model arithmetic regardless;
    //      LangClassifierSpec pins real separation on hand corpora.
    "q_pipeline_curate_v8" -> Q(
      (s, d) => {
        import graft.operators.{LangClassifier, QualityClassifier, Sampling}
        val docs = Tables.documents(s, d)
        val fold = QualityClassifier.tokenFold(docs, "doc_id", "text",
            buckets = 4096, salt = ":li1")
          .gatePersist()
        val labels = docs.filter(Sampling.split(
            col("doc_id"), 80, 10, salt = ":li1s") === "train")
          .select("doc_id", "lang")
        val m = LangClassifier.trainLangNb(fold, labels, buckets = 4096,
          salt = ":li1")
        LangClassifier.scoreLang(docs.select("doc_id"), "doc_id", fold, m)
          .join(docs.select(col("doc_id"), col("lang"), col("source"),
            col("text")), Seq("doc_id"))
          .filter(TextFunctions.qualityScore(col("text")) >= 0.4)
          .groupBy("source", "lang_pred")
          .agg(count(lit(1)).as("n_docs"),
            sum(TextFunctions.tokenCount(col("text")).cast("long"))
              .as("n_tokens"),
            sum(when(col("lang") === col("lang_pred"), lit(1L))
              .otherwise(lit(0L))).as("n_lang_match"))
          .orderBy("source", "lang_pred")
      },
      Some(s"""WITH ${langNbCtes(scoreAll = true)},
        |pred AS (SELECT doc_id, lang_true, lang AS lang_pred FROM rk
        |  WHERE rn = 1),
        |qv AS (SELECT doc_id, source, $qualityExprSql AS quality,
        |    CAST(len(toks) AS BIGINT) AS ntk
        |  FROM li0)
        |SELECT qv.source, p.lang_pred, count(*) AS n_docs,
        | CAST(sum(qv.ntk) AS BIGINT) AS n_tokens,
        | CAST(sum(CASE WHEN p.lang_true = p.lang_pred THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_lang_match
        |FROM pred p JOIN qv USING (doc_id)
        |WHERE qv.quality >= CAST(0.4 AS DOUBLE)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Web capstone v3 (round 14) — the POLITE-crawl chain: robots
    //      screening (parsed rules, exact-agent precedence) leads the
    //      pipeline, then URL dedup → C4 page cleaning → domain screen →
    //      blocklist → per-source summary. Same synthesized crawl as the
    //      v1 capstone; the robots stage's rule set is hand-derived in the
    //      oracle from the same literal robots.txt payloads.
    "q_pipeline_web_curate_v3" -> Q(
      (s, d) => {
        import s.implicits._
        import graft.operators.{Curation, Lines}
        val words = split(col("text"), " ")
        def line(st: Int, ln: Int, tail: String) =
          concat(array_join(slice(words, st, ln), " "), lit(tail))
        val url = concat(
          when(col("doc_id") % 2 === 0, lit("HTTP://User@WWW.Example.COM:80"))
            .otherwise(lit("https://cdn.example.net:443")),
          lit("/page/"), (col("doc_id") % 211).cast("string"),
          when(col("doc_id") % 3 === 0, lit("?utm_source=feed&q=7&gclid=zz"))
            .otherwise(lit("")))
        val page = concat(
          concat_ws("\n",
            line(1, 6, "."),
            line(7, 3, "."),
            lit("please enable javascript to view this page."),
            line(10, 7, ""),
            line(4, 8, " done!"),
            line(12, 7, " right?")),
          when(col("doc_id") % 7 === 0,
            lit("\nlorem ipsum dolor sit amet consectetur elite prose."))
            .otherwise(lit("")))
        val robots = Seq(
          ("www.example.com", "User-agent: graftbot\nDisallow: /page/1\n\n" +
            "User-agent: *\nDisallow: /"),
          ("cdn.example.net", "User-agent: *\nDisallow: /page/20"))
          .toDF("domain", "txt")
        val crawl = docsP(s, d).select(col("doc_id"), col("source"),
          url.as("url"), page.as("page"))
        val polite = Curation.robotsVerdicts(crawl, "url",
            Curation.parseRobots(robots, "domain", "txt"), agent = "graftbot")
          .filter(!col("robots_blocked"))
          .select("doc_id", "source", "url", "page")
        val fetched = Curation.dedupByUrl(polite, "doc_id", "url")
          .filter(col("is_keeper")).select("doc_id", "source", "page")
        val c4 = Lines.c4Clean(fetched, "doc_id", "page").filter(col("keep_doc"))
          .select(col("doc_id"), col("text"))
          .join(fetched.select("doc_id", "source"), Seq("doc_id"))
        val dom = Curation.screenDomains(
            c4.withColumn("domain",
              concat(lit("site"), (col("doc_id") % 37).cast("string"),
                lit(".example"))),
            "doc_id", "domain",
            (col("doc_id") % 100).cast("double") / 100.0,
            maxDocsPerDomain = 1000000L, minAvgQuality = 0.5)
          .filter(!col("domain_flagged"))
        val terms = Seq("slow", "dup", "noise").toDF("term")
        Curation.blocklistFlags(dom, "doc_id", "text", terms)
          .filter(!col("has_blocked"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(TextFunctions.tokenCount(col("text")).cast("long")).as("n_tokens"))
          .orderBy("source")
      },
      Some {
        val ctToks = ToksSql.replace("lower(text)", "lower(ct)")
        s"""WITH u AS (SELECT doc_id, source, text,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://User@WWW.Example.COM:80'
        |        ELSE 'https://cdn.example.net:443' END)
        |  || '/page/' || CAST(doc_id % 211 AS VARCHAR)
        |  || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&q=7&gclid=zz'
        |        ELSE '' END) AS url
        |  FROM documents),
        |cn AS (SELECT doc_id, source, text,
        |  CASE WHEN instr(regexp_replace(url, '#.*$$', ''), '?') > 0
        |    THEN substr(regexp_replace(url, '#.*$$', ''), 1,
        |      instr(regexp_replace(url, '#.*$$', ''), '?') - 1)
        |    ELSE regexp_replace(url, '#.*$$', '') END AS base,
        |  regexp_extract(regexp_replace(url, '#.*$$', ''), '\\?(.*)$$', 1) AS q
        |  FROM u),
        |cu AS (SELECT doc_id, source, text,
        |  regexp_replace(regexp_replace(
        |    regexp_replace(lower(regexp_extract(base, '(?i)^(https?://[^/]+)', 1)),
        |      '^(https?://)[^@/]*@', '\\1'),
        |    '^(http://[^/]*?):80$$', '\\1'), '^(https://[^/]*?):443$$', '\\1')
        |  || regexp_replace(regexp_replace(base, '(?i)^https?://[^/]+', ''), '/$$', '')
        |  || CASE WHEN coalesce(array_to_string(list_filter(string_split(q, '&'),
        |       x -> len(x) > 0 AND NOT regexp_matches(x,
        |         '^(utm_[^=]*|gclid|fbclid|ref)(=|$$)')), '&'), '') <> ''
        |     THEN '?' || coalesce(array_to_string(list_filter(string_split(q, '&'),
        |       x -> len(x) > 0 AND NOT regexp_matches(x,
        |         '^(utm_[^=]*|gclid|fbclid|ref)(=|$$)')), '&'), '')
        |     ELSE '' END AS canonical_url
        |  FROM cn),
        |rb AS (SELECT doc_id, source, text, canonical_url FROM (
        |  SELECT *, regexp_extract(canonical_url, '^https?://([^/:]+)', 1) AS h,
        |    CASE WHEN regexp_replace(canonical_url, '^https?://[^/]+', '') = ''
        |      THEN '/'
        |      ELSE regexp_replace(canonical_url, '^https?://[^/]+', '') END AS pth
        |  FROM cu)
        |  WHERE NOT ((h = 'www.example.com' AND pth LIKE '/page/1%')
        |    OR (h = 'cdn.example.net' AND pth LIKE '/page/20%'))),
        |fk AS (SELECT doc_id, source, text FROM rb
        |  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY canonical_url)),
        |pg AS (SELECT doc_id, source,
        |  concat(
        |    concat_ws(chr(10),
        |      coalesce(array_to_string(list_slice(string_split(text,' '),1,6),' '),'') || '.',
        |      coalesce(array_to_string(list_slice(string_split(text,' '),7,9),' '),'') || '.',
        |      'please enable javascript to view this page.',
        |      coalesce(array_to_string(list_slice(string_split(text,' '),10,16),' '),''),
        |      coalesce(array_to_string(list_slice(string_split(text,' '),4,11),' '),'') || ' done!',
        |      coalesce(array_to_string(list_slice(string_split(text,' '),12,18),' '),'') || ' right?'),
        |    CASE WHEN doc_id % 7 = 0
        |      THEN chr(10) || 'lorem ipsum dolor sit amet consectetur elite prose.'
        |      ELSE '' END) AS t0
        |  FROM fk),
        |c4 AS (SELECT doc_id, source, t0,
        |  list_transform(list_filter(string_split(t0, chr(10)), s2 ->
        |    regexp_matches(trim(s2), '[.!?"]$$')
        |    AND len(string_split_regex(trim(s2), '\\s+')) >= 5
        |    AND NOT contains(lower(trim(s2)), 'javascript')
        |    AND NOT contains(lower(trim(s2)), 'terms of use')
        |    AND NOT contains(lower(trim(s2)), 'privacy policy')
        |    AND NOT contains(lower(trim(s2)), 'cookie policy')
        |    AND NOT contains(lower(trim(s2)), 'uses cookies')
        |    AND NOT contains(lower(trim(s2)), 'use of cookies')
        |    AND NOT contains(lower(trim(s2)), 'use cookies')
        |  ), s2 -> trim(s2)) AS kept FROM pg),
        |cc AS (SELECT doc_id, source, t0,
        |  coalesce(array_to_string(kept, chr(10)), '') AS ct FROM c4),
        |cv AS (SELECT doc_id, source, ct FROM cc
        |  WHERE NOT contains(t0, '{') AND NOT contains(lower(t0), 'lorem ipsum')
        |    AND length(regexp_replace(ct, '[^.!?]', '', 'g')) >= 3),
        |dm AS (SELECT doc_id, source, ct,
        |  'site' || CAST(doc_id % 37 AS VARCHAR) || '.example' AS domain,
        |  CAST(doc_id % 100 AS DOUBLE) / CAST(100 AS DOUBLE) AS quality FROM cv),
        |ds AS (SELECT domain, count(*) AS domain_docs,
        |  ${ExactAgg.avgSql("quality", 6)} AS domain_avg_quality
        |  FROM dm GROUP BY 1),
        |dv AS (SELECT dm.doc_id, dm.source, dm.ct
        |  FROM dm JOIN ds USING (domain)
        |  WHERE NOT (ds.domain_docs > 1000000 OR ds.domain_avg_quality < 0.5)),
        |bl AS (SELECT unnest(['slow', 'dup', 'noise']) AS tok),
        |e0 AS (SELECT doc_id, unnest($ctToks) AS tok FROM dv),
        |hb AS (SELECT e0.doc_id, count(*) AS n_blocked
        |  FROM e0 JOIN bl ON bl.tok = e0.tok GROUP BY 1),
        |fin AS (SELECT dv.doc_id, dv.source, dv.ct
        |  FROM dv LEFT JOIN hb ON hb.doc_id = dv.doc_id
        |  WHERE COALESCE(hb.n_blocked, 0) = 0)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(len($ctToks)) AS BIGINT) AS n_tokens
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ---- Web capstone v2 — the PARSE-and-clean chain, starting from raw
    //      HTML: htmlToText (script/style chrome dies, <p>/<div> blocks
    //      become the lines C4 keys on) -> C4 rule cleaning -> blocklist
    //      any-hit drop -> per-source 200-token budget (first-come cut).
    //      Complements q_pipeline_web_curate (which starts at crawl
    //      metadata); every stage's mirror is already gate-proven solo.
    "q_pipeline_web_curate_v2" -> Q(
      (s, d) => {
        import s.implicits._
        import graft.operators.{Curation, Lines}
        val words = split(col("text"), " ")
        def line(st: Int, ln: Int, tail: String) =
          concat(array_join(slice(words, st, ln), " "), lit(tail))
        def pTag(c: Column) = concat(lit("<p>"), c, lit("</p>"))
        val html = concat(
          lit("<html><head><script>nav();</script><style>.m{}</style></head><body>"),
          pTag(line(1, 6, ".")),
          pTag(line(7, 3, ".")),
          pTag(lit("please enable javascript to view this page.")),
          concat(lit("<div>"), line(10, 7, ""), lit("</div>")),
          pTag(line(4, 8, " done!")),
          pTag(line(12, 7, " right?")),
          when(col("doc_id") % 7 === 0,
            pTag(lit("lorem ipsum dolor sit amet consectetur elite prose.")))
            .otherwise(lit("")),
          lit("</body></html>"))
        val parsed = docsP(s, d).select(col("doc_id"), col("source"),
          Curation.htmlToText(html).as("page"))
        val c4 = Lines.c4Clean(parsed, "doc_id", "page").filter(col("keep_doc"))
          .select(col("doc_id"), col("text"))
          .join(parsed.select("doc_id", "source"), Seq("doc_id"))
        val terms = Seq("slow", "dup", "noise").toDF("term")
        val screened = Curation.blocklistFlags(c4, "doc_id", "text", terms)
          .filter(!col("has_blocked"))
          .select(col("doc_id"), col("source"), col("n_tokens").cast("bigint")
            .as("n_tokens"))
        Curation.capTokensPerKey(screened, col("source"), col("n_tokens"),
            budget = 200L, order = Seq(col("doc_id")), idCol = col("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").cast("bigint").as("n_tokens"))
          .orderBy("source")
      },
      Some {
        val seg = (a: Int, b: Int) =>
          s"coalesce(array_to_string(list_slice(ws, $a, $b), ' '), '')"
        val ctToks = ToksSql.replace("lower(text)", "lower(ct)")
        s"""WITH w0 AS (SELECT doc_id, source, string_split(text, ' ') AS ws
        |  FROM documents),
        |h AS (SELECT doc_id, source,
        |  '<html><head><script>nav();</script><style>.m{}</style></head><body>'
        |  || '<p>' || ${seg(1, 6)} || '.' || '</p>'
        |  || '<p>' || ${seg(7, 9)} || '.' || '</p>'
        |  || '<p>please enable javascript to view this page.</p>'
        |  || '<div>' || ${seg(10, 16)} || '</div>'
        |  || '<p>' || ${seg(4, 11)} || ' done!' || '</p>'
        |  || '<p>' || ${seg(12, 18)} || ' right?' || '</p>'
        |  || (CASE WHEN doc_id % 7 = 0
        |      THEN '<p>lorem ipsum dolor sit amet consectetur elite prose.</p>'
        |      ELSE '' END)
        |  || '</body></html>' AS html FROM w0),
        |x1 AS (SELECT doc_id, source, regexp_replace(html,
        |  '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
        |x2 AS (SELECT doc_id, source, regexp_replace(t,
        |  '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM x1),
        |x3 AS (SELECT doc_id, source, regexp_replace(t,
        |  '(?s)<!--.*?-->', ' ', 'g') AS t FROM x2),
        |x4 AS (SELECT doc_id, source, regexp_replace(t,
        |  '(?i)</?(p|div|br|li|ul|ol|tr|table|h[1-6])\\b[^>]*>', chr(10), 'g')
        |  AS t FROM x3),
        |x5 AS (SELECT doc_id, source, regexp_replace(t, '<[^>]+>', ' ', 'g')
        |  AS t FROM x4),
        |x6 AS (SELECT doc_id, source,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(t,
        |      '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
        |      '&quot;', '"', 'g'), '&#39;', chr(39), 'g'), '&amp;', '&', 'g')
        |  AS t FROM x5),
        |x7 AS (SELECT doc_id, source,
        |  regexp_replace(t, '[ \\t\\f\\r]+', ' ', 'g') AS t FROM x6),
        |x8 AS (SELECT doc_id, source,
        |  regexp_replace(t, ' ?\\n ?', chr(10), 'g') AS t FROM x7),
        |pgv AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(t, '\\n{2,}', chr(10), 'g'),
        |    '^\\n+|\\n+$$', '', 'g')) AS t0 FROM x8),
        |c4 AS (SELECT doc_id, source, t0,
        |  list_transform(list_filter(string_split(t0, chr(10)), s2 ->
        |    regexp_matches(trim(s2), '[.!?"]$$')
        |    AND len(string_split_regex(trim(s2), '\\s+')) >= 5
        |    AND NOT contains(lower(trim(s2)), 'javascript')
        |    AND NOT contains(lower(trim(s2)), 'terms of use')
        |    AND NOT contains(lower(trim(s2)), 'privacy policy')
        |    AND NOT contains(lower(trim(s2)), 'cookie policy')
        |    AND NOT contains(lower(trim(s2)), 'uses cookies')
        |    AND NOT contains(lower(trim(s2)), 'use of cookies')
        |    AND NOT contains(lower(trim(s2)), 'use cookies')
        |  ), s2 -> trim(s2)) AS kept FROM pgv),
        |cc AS (SELECT doc_id, source, t0,
        |  coalesce(array_to_string(kept, chr(10)), '') AS ct FROM c4),
        |cv AS (SELECT doc_id, source, ct FROM cc
        |  WHERE NOT contains(t0, '{') AND NOT contains(lower(t0), 'lorem ipsum')
        |    AND length(regexp_replace(ct, '[^.!?]', '', 'g')) >= 3),
        |bl AS (SELECT unnest(['slow', 'dup', 'noise']) AS tok),
        |e0 AS (SELECT doc_id, unnest($ctToks) AS tok FROM cv),
        |hb AS (SELECT e0.doc_id, count(*) AS n_blocked
        |  FROM e0 JOIN bl ON bl.tok = e0.tok GROUP BY 1),
        |scr AS (SELECT cv.doc_id, cv.source,
        |  CAST(len($ctToks) AS BIGINT) AS n_tokens
        |  FROM cv LEFT JOIN hb ON hb.doc_id = cv.doc_id
        |  WHERE COALESCE(hb.n_blocked, 0) = 0),
        |cw AS (SELECT doc_id, source, n_tokens, sum(n_tokens) OVER (
        |  PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM scr)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM cw WHERE cum - n_tokens < 200
        |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ---- cross-corpus near-dup linkage: jaccard pairs BETWEEN two id
    //      spaces (the doc_id % 3 split plays "fresh crawl" vs "held
    //      corpus"), df-cut over the union of both token streams.
    "q_dedup_link_across" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.jaccardJoinAcross(
            docs.filter(pmod(col("doc_id"), lit(3)) =!= 0),
            docs.filter(pmod(col("doc_id"), lit(3)) === 0),
            "doc_id", "text", threshold = 0.3, maxTokenDf = 100L,
            tokens = shingleSet)
          .withColumn("jaccard", round(col("jaccard"), 6))
          .orderBy("id_left", "id_right")
      },
      Some(s"""WITH tA AS (SELECT doc_id, $ToksSql AS toks FROM documents
        |  WHERE doc_id % 3 != 0),
        |a0 AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM tA),
        |a1 AS (SELECT doc_id, $TokenFp60Sql AS tok FROM a0),
        |tB AS (SELECT doc_id, $ToksSql AS toks FROM documents
        |  WHERE doc_id % 3 = 0),
        |b0 AS (SELECT doc_id, unnest($ShinglesSql) AS tok FROM tB),
        |b1 AS (SELECT doc_id, $TokenFp60Sql AS tok FROM b0),
        |u AS (SELECT tok FROM a1 UNION ALL SELECT tok FROM b1),
        |keep AS (SELECT tok FROM (
        |  SELECT tok, count(*) AS df FROM u GROUP BY 1) WHERE df <= 100),
        |sA AS (SELECT a1.doc_id, a1.tok FROM a1 JOIN keep ON keep.tok = a1.tok),
        |sB AS (SELECT b1.doc_id, b1.tok FROM b1 JOIN keep ON keep.tok = b1.tok),
        |szA AS (SELECT doc_id, count(*) AS n_l FROM sA GROUP BY 1),
        |szB AS (SELECT doc_id, count(*) AS n_r FROM sB GROUP BY 1),
        |c AS (SELECT sA.doc_id AS id_left, sB.doc_id AS id_right,
        |  count(*) AS common
        | FROM sA JOIN sB ON sA.tok = sB.tok GROUP BY 1, 2),
        |j AS (SELECT c.id_left, c.id_right,
        |  CAST(common AS DOUBLE) / (szA.n_l + szB.n_r - common) AS jaccard
        | FROM c JOIN szA ON szA.doc_id = c.id_left
        |  JOIN szB ON szB.doc_id = c.id_right)
        |SELECT id_left, id_right, round(jaccard, 6) AS jaccard
        |FROM j WHERE jaccard >= 0.3 ORDER BY id_left, id_right""".stripMargin)),

    // ---- corpus snapshot diff: the dump-refresh audit — a synthetic "old"
    //      version drops the % 10 = 1 ids (added in new), rewrites the
    //      % 10 = 2 texts (modified), and carries shifted extra ids
    //      (removed); the diff classifies every id by content hash.
    "q_text_corpus_diff" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val old = docs.filter(pmod(col("doc_id"), lit(10)) =!= 1)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(10)) === 2,
              concat(col("text"), lit(" v1"))).otherwise(col("text")))
          .unionByName(docs.filter(pmod(col("doc_id"), lit(10)) === 3)
            .withColumn("doc_id", col("doc_id") + 1000000L))
        graft.operators.Diagnostics.corpusDiff(old, docs,
            "doc_id", "text", "source")
          .groupBy("status", "source").agg(count(lit(1)).as("n_docs"))
          .orderBy("status", "source")
      },
      Some("""WITH old0 AS (
        |  SELECT doc_id, CASE WHEN doc_id % 10 = 2 THEN text || ' v1'
        |    ELSE text END AS text, source
        |  FROM documents WHERE doc_id % 10 != 1
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, source FROM documents
        |  WHERE doc_id % 10 = 3),
        |a AS (SELECT doc_id AS id, md5(text) AS h_old, source AS src_old
        |  FROM old0),
        |b AS (SELECT doc_id AS id, md5(text) AS h_new, source AS src_new
        |  FROM documents),
        |v AS (SELECT
        |  CASE WHEN h_old IS NULL THEN 'added'
        |    WHEN h_new IS NULL THEN 'removed'
        |    WHEN h_old != h_new THEN 'modified'
        |    ELSE 'retained' END AS status,
        |  COALESCE(src_new, src_old) AS source
        | FROM a FULL OUTER JOIN b ON a.id = b.id)
        |SELECT status, source, count(*) AS n_docs
        |FROM v GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- per-source rank normalization: exact percentile ranks of the
    //      quality score within each source via the two-phase quantile-
    //      sharded rank — one global pct_rank threshold then cuts every
    //      source at the same quantile. Oracle = a plain per-source
    //      (row_number - 1) / (n - 1) window, which the sharded
    //      reassembly must reproduce bit for bit.
    // ---- Rank-averaged score ensemble: heuristic quality, token count,
    //      and char entropy — three incomparable scales — combined as the
    //      mean of their per-source percentile ranks (robust to any
    //      monotone rescaling of any member). The oracle replays three
    //      one-window rank chains and the same fixed-order mean.
    "q_curate_ensemble_rank" -> Q(
      (s, d) => {
        graft.GraftExtensions.register(s)
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.tokenCount(col("text")).cast("double").as("len_score"),
          graft.functions.Entropy.charEntropy(col("text")).as("ent"))
        graft.operators.Curation.ensembleRank(docs, "source", col("doc_id"),
            Seq("quality" -> col("quality"), "length" -> col("len_score"),
              "entropy" -> col("ent")))
          .select(col("doc_id"), col("source"),
            round(col("pct_quality"), 6).as("pct_quality"),
            round(col("pct_length"), 6).as("pct_length"),
            round(col("pct_entropy"), 6).as("pct_entropy"),
            round(col("ensemble_score"), 6).as("ensemble_score"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${qualityLangCtes("documents")},
        |ch AS (SELECT doc_id,
        |  unnest(regexp_extract_all(text, '[\\s\\S]')) AS c FROM documents),
        |g AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(sum(n) AS DOUBLE) AS L FROM g GROUP BY 1),
        |e AS (SELECT g.doc_id,
        |  CAST(sum(CAST(round(-((n / L) * ln(n / L) / ln(2)), 12)
        |    AS DECIMAL(28,12))) AS DOUBLE) AS ent
        |  FROM g JOIN tot USING (doc_id) GROUP BY 1),
        |base AS (SELECT s0.doc_id, s0.source, s0.quality,
        |  CAST(s0.n_toks AS DOUBLE) AS len_score,
        |  coalesce(e.ent, CAST(0 AS DOUBLE)) AS ent
        |  FROM scored s0 LEFT JOIN e USING (doc_id)),
        |r AS (SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY source ORDER BY quality, doc_id) - 1
        |    AS rq,
        |  row_number() OVER (PARTITION BY source ORDER BY len_score, doc_id) - 1
        |    AS rl,
        |  row_number() OVER (PARTITION BY source ORDER BY ent, doc_id) - 1
        |    AS re,
        |  count(*) OVER (PARTITION BY source) AS n FROM base),
        |pp AS (SELECT doc_id, source,
        |  CASE WHEN n > 1 THEN CAST(rq AS DOUBLE) / (n - 1)
        |    ELSE CAST(0 AS DOUBLE) END AS pq,
        |  CASE WHEN n > 1 THEN CAST(rl AS DOUBLE) / (n - 1)
        |    ELSE CAST(0 AS DOUBLE) END AS pl,
        |  CASE WHEN n > 1 THEN CAST(re AS DOUBLE) / (n - 1)
        |    ELSE CAST(0 AS DOUBLE) END AS pe FROM r)
        |SELECT doc_id, source, round(pq, 6) AS pct_quality,
        |  round(pl, 6) AS pct_length, round(pe, 6) AS pct_entropy,
        |  round(((pq + pl) + pe) / CAST(3 AS DOUBLE), 6) AS ensemble_score
        |FROM pp ORDER BY doc_id""".stripMargin)),

    "q_curate_rank_normalize" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d).select(
          col("doc_id"), col("source"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        graft.operators.Curation.rankNormalizeBySource(
            docs, "source", col("quality"), col("doc_id"), shards = 8)
          .select(col("doc_id"), col("source"), col("quality"),
            col("src_rank"), col("src_n"),
            round(col("pct_rank"), 6).as("pct_rank"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${qualityLangCtes("documents")},
        |r AS (SELECT doc_id, source, quality,
        |  row_number() OVER (PARTITION BY source ORDER BY quality, doc_id) - 1
        |    AS src_rank,
        |  count(*) OVER (PARTITION BY source) AS src_n
        | FROM scored)
        |SELECT doc_id, source, quality, src_rank,
        |  CAST(src_n AS BIGINT) AS src_n,
        |  round(CASE WHEN src_n > 1
        |    THEN CAST(src_rank AS DOUBLE) / (src_n - 1)
        |    ELSE CAST(0 AS DOUBLE) END, 6) AS pct_rank
        |FROM r ORDER BY doc_id""".stripMargin)),

    // ---- link-graph authority (LinkGraph.pageRank): a deterministic
    //      synthetic domain graph from doc_id arithmetic — 20 domains, two
    //      modular outlinks plus a hub link concentrating inlinks on d0..d3.
    //      3 unrolled iterations, round9 per iteration, fold inflow ordered
    //      by src (the oracle-exact mode; the production decimal-sum mode is
    //      pinned equal in LinkGraphSpec).
    "q_web_pagerank" -> Q(
      (s, d) => graft.operators.LinkGraph.pageRank(
          synthDomainEdges(docsP(s, d)), iters = 3,
          damping = 0.85, orderIndependent = false)
        .orderBy("domain"),
      Some(s"""WITH $SynthEdgesSql,
        |${pageRankCtes(3)}
        |SELECT node AS domain, rank FROM r3 ORDER BY domain""".stripMargin)),

    // ---- PERSONALIZED PageRank (focused crawling): teleport concentrates
    //      on two seed domains, so rank is authority as seen from the seed
    //      topic; non-seeds rank only through inlink mass. Same unrolled
    //      fold-mode oracle with the seeded r0/base chain.
    "q_web_pagerank_personalized" -> Q(
      (s, d) => {
        import s.implicits._
        val seeds = Seq(("d0", 0.6), ("d1", 0.4)).toDF("node", "weight")
        graft.operators.LinkGraph.personalizedPageRank(
            synthDomainEdges(docsP(s, d)), seeds, iters = 3,
            damping = 0.85, orderIndependent = false)
          .orderBy("domain")
      },
      Some(s"""WITH $SynthEdgesSql,
        |sd(node, w) AS (VALUES ('d0', CAST(0.6 AS DOUBLE)),
        |  ('d1', CAST(0.4 AS DOUBLE))),
        |${pageRankCtes(3, personalized = true)}
        |SELECT node AS domain, rank FROM r3 ORDER BY domain""".stripMargin)),

    // ---- INCREMENTAL PageRank (round 15): the crawl-frontier maintenance
    //      path — the weighted-edge state is built from the first crawl
    //      wave (doc_id % 7 != 0), a later wave's raw edges fold in via
    //      mergeWeightedEdges (counts add), and re-ranking runs from the
    //      merged state WITHOUT re-reading the first wave's documents.
    //      Because the merged state equals the full edge aggregation
    //      value-for-value and the iteration arithmetic is shared, the
    //      result is hash-equal to a full recompute on the merged edge set
    //      — which is exactly what the oracle computes (the full unrolled
    //      chain over ALL documents' edges, 4 iterations). The
    //      increment≡recompute DataFrame identity is additionally pinned
    //      in LinkGraphSpec.
    "q_web_pagerank_increment" -> Q(
      (s, d) => {
        import graft.operators.LinkGraph
        val docs = docsP(s, d)
        val state = LinkGraph.weightedEdges(
          synthDomainEdges(docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)))
        val merged = LinkGraph.mergeWeightedEdges(state,
          synthDomainEdges(docs.filter(pmod(col("doc_id"), lit(7)) === 0)))
        LinkGraph.pageRankWeighted(merged, iters = 4,
            damping = 0.85, orderIndependent = false)
          .orderBy("domain")
      },
      Some(s"""WITH $SynthEdgesSql,
        |${pageRankCtes(4)}
        |SELECT node AS domain, rank FROM r4 ORDER BY domain""".stripMargin)),

    // ---- HITS hubs & authorities over the same synthetic graph: the
    //      complementary link metric to PageRank for frontier scheduling
    //      (fetch FROM hubs, keep documents FROM authorities). Order-free
    //      decimal contribution sums mean the oracle needs no fold mode —
    //      the unrolled half-step chain is mirrored arithmetic-exactly.
    "q_web_hits" -> Q(
      (s, d) => graft.operators.LinkGraph.hits(
          synthDomainEdges(docsP(s, d)), iters = 2)
        .orderBy("domain"),
      Some(s"""WITH $SynthEdgesSql,
        |${hitsCtes(2)}
        |SELECT a2.node AS domain, a2.score AS authority, h2.score AS hub
        |FROM a2 JOIN h2 ON h2.node = a2.node ORDER BY 1""".stripMargin)),

    // ---- Incremental HITS from the maintained link state (round 15):
    //      the hubs/authorities twin of q_web_pagerank_increment — a crawl
    //      wave appends edges into the weighted state and HITS re-ranks
    //      from the merged fold, bit-equal to a full recompute (counts
    //      add), skipping the full-corpus edge extraction. Same oracle as
    //      q_web_hits by construction.
    "q_web_hits_increment" -> Q(
      (s, d) => {
        import graft.operators.LinkGraph
        val docs = docsP(s, d)
        val state = LinkGraph.weightedEdges(
          synthDomainEdges(docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)))
        val merged = LinkGraph.mergeWeightedEdges(state,
          synthDomainEdges(docs.filter(pmod(col("doc_id"), lit(7)) === 0)))
        LinkGraph.hitsWeighted(merged, iters = 2).orderBy("domain")
      },
      Some(s"""WITH $SynthEdgesSql,
        |${hitsCtes(2)}
        |SELECT a2.node AS domain, a2.score AS authority, h2.score AS hub
        |FROM a2 JOIN h2 ON h2.node = a2.node ORDER BY 1""".stripMargin)),

    // ---- semi-supervised LABEL PROPAGATION (taxonomy bootstrap): three
    //      seed domains vote their topics outward along the symmetrized
    //      weighted graph; integer vote weights + (weight desc, label asc)
    //      tie order make every unrolled round hash-exact. Seeds clamp;
    //      unreached domains stay null.
    "q_web_label_prop" -> Q(
      (s, d) => {
        import s.implicits._
        val seeds = Seq(("d0", "news"), ("d7", "forum"), ("d13", "spam"))
          .toDF("node", "label")
        graft.operators.LinkGraph.labelPropagation(
            synthDomainEdges(docsP(s, d)), seeds, iters = 2)
          .orderBy("domain")
      },
      Some(s"""WITH $SynthEdgesSql,
        |sym AS (SELECT src AS a, dst AS b FROM e0
        |  UNION ALL SELECT dst, src FROM e0),
        |wu AS (SELECT a, b, count(*) AS weight FROM sym GROUP BY 1, 2),
        |nodes2 AS (SELECT DISTINCT a AS node FROM wu),
        |sd(node, label) AS (VALUES ('d0', 'news'), ('d7', 'forum'),
        |  ('d13', 'spam')),
        |l0 AS (SELECT n.node, sd.label FROM nodes2 n
        |  LEFT JOIN sd ON sd.node = n.node),
        |${(1 to 2).map { i =>
             s"""v$i AS (SELECT wu.b, l.label, sum(weight) AS vw
             |  FROM wu JOIN l${i - 1} l ON l.node = wu.a
             |  WHERE l.label IS NOT NULL GROUP BY 1, 2),
             |m$i AS (SELECT b, max(vw) AS mw FROM v$i GROUP BY 1),
             |wn$i AS (SELECT v.b, min(v.label) AS win FROM v$i v
             |  JOIN m$i m ON m.b = v.b AND v.vw = m.mw GROUP BY 1),
             |l$i AS (SELECT n.node, coalesce(sd.label, wn.win) AS label
             |  FROM nodes2 n LEFT JOIN sd ON sd.node = n.node
             |  LEFT JOIN wn$i wn ON wn.b = n.node)""".stripMargin
           }.mkString(",\n")}
        |SELECT node AS domain, label FROM l2 ORDER BY domain""".stripMargin)),

    // ---- frontier degree profile (LinkGraph.degreeProfile) over the same
    //      synthetic graph: distinct-neighbor degrees + occurrence weights.
    // ---- per-node triangle count + local clustering coefficient: the
    //      community-vs-link-farm signal beside degree (a spam hub has huge
    //      degree and near-zero clustering). Engine side runs the
    //      degree-ordered node-iterator (wedges only at each triangle's
    //      lowest-degree apex — O(sqrt|E|)-bounded out-degrees); the oracle
    //      enumerates ordered triangles directly, which is equivalent on
    //      the simple undirected graph.
    "q_web_triangles" -> Q(
      (s, d) => graft.operators.LinkGraph.triangles(
          synthDomainEdges(docsP(s, d))).orderBy("domain"),
      Some(s"""WITH $SynthEdgesSql,
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM w WHERE src <> dst),
        |dg AS (SELECT n, CAST(count(*) AS BIGINT) AS degree FROM
        |  (SELECT a AS n FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM und e1
        |  JOIN und e2 ON e2.a = e1.b
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pn AS (SELECT n, CAST(count(*) AS BIGINT) AS t FROM
        |  (SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
        |   UNION ALL SELECT z FROM tri) GROUP BY 1)
        |SELECT dg.n AS domain, degree, coalesce(t, 0) AS n_triangles,
        |  CASE WHEN degree > 1
        |    THEN (CAST(2.0 AS DOUBLE) * coalesce(t, 0))
        |      / CAST(degree * (degree - 1) AS DOUBLE)
        |    ELSE CAST(0.0 AS DOUBLE) END AS clustering
        |FROM dg LEFT JOIN pn ON pn.n = dg.n ORDER BY domain""".stripMargin)),

    "q_web_degree_profile" -> Q(
      (s, d) => graft.operators.LinkGraph.degreeProfile(
          synthDomainEdges(docsP(s, d))).orderBy("domain"),
      Some(s"""WITH $SynthEdgesSql,
        |o AS (SELECT src AS domain, sum(weight) AS out_weight,
        |  count(*) AS out_degree FROM w GROUP BY 1),
        |i AS (SELECT dst AS domain, sum(weight) AS in_weight,
        |  count(*) AS in_degree FROM w GROUP BY 1)
        |SELECT coalesce(o.domain, i.domain) AS domain,
        |  CAST(coalesce(out_degree, 0) AS BIGINT) AS out_degree,
        |  CAST(coalesce(out_weight, 0) AS BIGINT) AS out_weight,
        |  CAST(coalesce(in_degree, 0) AS BIGINT) AS in_degree,
        |  CAST(coalesce(in_weight, 0) AS BIGINT) AS in_weight
        |FROM o FULL OUTER JOIN i ON o.domain = i.domain
        |ORDER BY domain""".stripMargin)),

    // ---- big-big fuzzy join (FuzzyJoin.join): typo-tolerant key matching
    //      of a probe subset against the whole corpus on the first-word key.
    //      The Spark side runs the length-band blocked equi-join; the oracle
    //      is the UNBLOCKED all-pairs semantics — hash equality proves the
    //      blocking sound (a lost pair would change the result set).
    "q_text_fuzzy_pairs" -> Q(
      (s, d) => {
        val fkey = substring(regexp_replace(
          lower(substring_index(col("text"), " ", 1)), "[^a-z0-9]", ""), 1, 10)
        val keyed = docsP(s, d).select(col("doc_id"), fkey.as("fkey"))
        val probes = keyed.filter(col("doc_id") < 30)
        graft.operators.FuzzyJoin.join(probes, keyed, "doc_id", "fkey", 2)
          .filter(col("id_l") =!= col("id_r"))
          .orderBy("id_l", "id_r")
      },
      Some("""WITH k AS (SELECT doc_id,
        |  substr(regexp_replace(lower(split_part(text, ' ', 1)),
        |    '[^a-z0-9]', '', 'g'), 1, 10) AS fkey FROM documents),
        |p AS (SELECT * FROM k WHERE doc_id < 30)
        |SELECT p.doc_id AS id_l, k.doc_id AS id_r,
        |  p.fkey AS key_l, k.fkey AS key_r,
        |  CAST(levenshtein(p.fkey, k.fkey) AS BIGINT) AS dist
        |FROM p JOIN k ON p.doc_id != k.doc_id
        |  AND levenshtein(p.fkey, k.fkey) <= 2
        |ORDER BY id_l, id_r""".stripMargin)),

    // ---- RECORD LINKAGE on top of the fuzzy candidates: mutual-best-match
    //      1:1 assignment — each probe linked to its nearest corpus key and
    //      vice versa, ties broken (dist, partner id)-lexicographically.
    //      The oracle re-derives both argmins with min-over-the-min-dist
    //      joins, so the struct-min tie-break is hash-checked exactly.
    "q_text_fuzzy_link" -> Q(
      (s, d) => {
        val fkey = substring(regexp_replace(
          lower(substring_index(col("text"), " ", 1)), "[^a-z0-9]", ""), 1, 10)
        val keyed = docsP(s, d).select(col("doc_id"), fkey.as("fkey"))
        val probes = keyed.filter(col("doc_id") < 30)
        val pairs = graft.operators.FuzzyJoin.join(probes, keyed,
            "doc_id", "fkey", 2)
          .filter(col("id_l") =!= col("id_r"))
        graft.operators.FuzzyJoin.bestMatch(pairs)
          .select("id_l", "id_r", "dist")
          .orderBy("id_l", "id_r")
      },
      Some("""WITH k AS (SELECT doc_id,
        |  substr(regexp_replace(lower(split_part(text, ' ', 1)),
        |    '[^a-z0-9]', '', 'g'), 1, 10) AS fkey FROM documents),
        |p AS (SELECT * FROM k WHERE doc_id < 30),
        |pr AS (SELECT p.doc_id AS id_l, k.doc_id AS id_r,
        |  CAST(levenshtein(p.fkey, k.fkey) AS BIGINT) AS dist
        |  FROM p JOIN k ON p.doc_id != k.doc_id
        |    AND levenshtein(p.fkey, k.fkey) <= 2),
        |blm AS (SELECT id_l, min(dist) AS md FROM pr GROUP BY 1),
        |bl AS (SELECT pr.id_l, min(pr.id_r) AS id_r, min(pr.dist) AS dist
        |  FROM pr JOIN blm ON pr.id_l = blm.id_l AND pr.dist = blm.md
        |  GROUP BY 1),
        |brm AS (SELECT id_r, min(dist) AS md FROM pr GROUP BY 1),
        |br AS (SELECT min(pr.id_l) AS id_l, pr.id_r
        |  FROM pr JOIN brm ON pr.id_r = brm.id_r AND pr.dist = brm.md
        |  GROUP BY pr.id_r)
        |SELECT bl.id_l, bl.id_r, bl.dist
        |FROM bl JOIN br ON bl.id_l = br.id_l AND bl.id_r = br.id_r
        |ORDER BY 1, 2""".stripMargin)),

    // ---- the same fuzzy-pair semantics through SEGMENT (pigeonhole)
    //      blocking — the PassJoin-family scheme that subdivides dense
    //      length bands by content. SAME unblocked oracle: hash equality is
    //      the recall proof that no pair is lost by the ±t segment windows.
    "q_text_fuzzy_pairs_seg" -> Q(
      (s, d) => {
        val fkey = substring(regexp_replace(
          lower(substring_index(col("text"), " ", 1)), "[^a-z0-9]", ""), 1, 10)
        val keyed = docsP(s, d).select(col("doc_id"), fkey.as("fkey"))
        val probes = keyed.filter(col("doc_id") < 30)
        graft.operators.FuzzyJoin.joinSegments(probes, keyed,
            "doc_id", "fkey", 2)
          .filter(col("id_l") =!= col("id_r"))
          .orderBy("id_l", "id_r")
      },
      Some("""WITH k AS (SELECT doc_id,
        |  substr(regexp_replace(lower(split_part(text, ' ', 1)),
        |    '[^a-z0-9]', '', 'g'), 1, 10) AS fkey FROM documents),
        |p AS (SELECT * FROM k WHERE doc_id < 30)
        |SELECT p.doc_id AS id_l, k.doc_id AS id_r,
        |  p.fkey AS key_l, k.fkey AS key_r,
        |  CAST(levenshtein(p.fkey, k.fkey) AS BIGINT) AS dist
        |FROM p JOIN k ON p.doc_id != k.doc_id
        |  AND levenshtein(p.fkey, k.fkey) <= 2
        |ORDER BY id_l, id_r""".stripMargin)),

    // ---- readability scoring (Flesch / Flesch–Kincaid): the corpus text
    //      has no punctuation, so the gate synthesizes sentence boundaries
    //      deterministically (a period every 8 words) in BOTH engines, then
    //      scores the sentenced text — integer-exact counts, two ratios,
    //      literal-order affine combination, round6 insurance.
    "q_text_readability" -> Q(
      (s, d) => {
        val toks = split(col("text"), " ")
        val nc = greatest(lit(1),
          ceil(size(toks).cast("double") / 8).cast("int"))
        val sentenced = concat(array_join(
          transform(sequence(lit(1), nc),
            c => array_join(slice(toks, (c - 1) * 8 + 1, lit(8)), " ")), ". "),
          lit("."))
        docsP(s, d).select(col("doc_id"), sentenced.as("sent"))
          .select(col("doc_id"),
            TextFunctions.sentenceCount(col("sent")).as("n_sentences"),
            TextFunctions.tokenCount(col("sent")).as("n_words"),
            TextFunctions.syllableCount(col("sent")).as("n_syllables"),
            round(TextFunctions.fleschReadingEase(col("sent")), 6).as("flesch"),
            round(TextFunctions.fkGradeLevel(col("sent")), 6).as("fk_grade"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, toks,
        |  greatest(1, CAST(ceil(len(toks) / CAST(8 AS DOUBLE)) AS INT)) AS nc
        |  FROM t),
        |sen AS (SELECT doc_id, array_to_string(list_transform(range(1, nc + 1),
        |    c2 -> array_to_string(toks[(c2-1)*8+1 : (c2-1)*8+8], ' ')), '. ')
        |    || '.' AS sent FROM c),
        |k AS (SELECT doc_id,
        |  greatest(1, len(list_filter(string_split_regex(sent, '[.!?]+'),
        |    x -> len(trim(x)) > 0))) AS n_sent,
        |  list_filter(string_split_regex(lower(sent), '\\s+'),
        |    x -> len(x) > 0) AS wtoks FROM sen),
        |f AS (SELECT doc_id, n_sent, len(wtoks) AS n_words,
        |  list_sum(list_transform(wtoks, w ->
        |    CAST(greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))) AS BIGINT)))
        |    AS n_syll FROM k)
        |SELECT doc_id, CAST(n_sent AS INT) AS n_sentences,
        |  CAST(n_words AS INT) AS n_words,
        |  CAST(n_syll AS BIGINT) AS n_syllables,
        |  round(CAST(206.835 AS DOUBLE)
        |    - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
        |    - CAST(84.6 AS DOUBLE) * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)),
        |    6) AS flesch,
        |  round(CAST(0.39 AS DOUBLE) * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
        |    + CAST(11.8 AS DOUBLE) * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE))
        |    - CAST(15.59 AS DOUBLE), 6) AS fk_grade
        |FROM f ORDER BY doc_id""".stripMargin)),

    // ---- web capstone v4: link AUTHORITY in front of the quality screen —
    //      the crawl-curation step the earlier capstones lacked (rank the
    //      domain graph, floor on authority, then quality-screen survivors;
    //      per-domain scoreboard). PageRank runs the oracle-exact fold mode;
    //      authority and quality thresholds are literal doubles.
    "q_pipeline_web_curate_v4" -> Q(
      (s, d) => {
        def dom(e: Column) = concat(lit("d"), e.cast("string"))
        val docs = docsP(s, d)
        val pr = graft.operators.LinkGraph.pageRank(
          synthDomainEdges(docs), iters = 3,
          damping = 0.85, orderIndependent = false)
        val scored = docs.select(col("doc_id"),
          dom(col("doc_id") % 20).as("domain"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_toks"))
        scored.join(broadcast(pr.withColumnRenamed("domain", "pr_domain")),
            col("domain") === col("pr_domain"))
          .groupBy("domain")
          .agg(
            max(col("rank")).as("domain_rank"),
            count(lit(1)).as("n_docs"),
            count(when(col("rank") >= 0.05 && col("quality") >= 0.6, lit(1)))
              .as("n_kept"),
            sum(when(col("rank") >= 0.05 && col("quality") >= 0.6,
              col("n_toks")).otherwise(lit(0L))).as("kept_tokens"))
          .orderBy("domain")
      },
      Some(s"""WITH ${qualityLangCtes("documents")},
        |$SynthEdgesSql,
        |${pageRankCtes(3)},
        |lab AS (SELECT doc_id, 'd' || CAST(doc_id % 20 AS VARCHAR) AS domain,
        |  quality, n_toks FROM scored),
        |j AS (SELECT lab.*, r3.rank FROM lab JOIN r3 ON r3.node = lab.domain)
        |SELECT domain, max(rank) AS domain_rank, count(*) AS n_docs,
        |  count(CASE WHEN rank >= CAST(0.05 AS DOUBLE)
        |    AND quality >= CAST(0.6 AS DOUBLE) THEN 1 END) AS n_kept,
        |  CAST(sum(CASE WHEN rank >= CAST(0.05 AS DOUBLE)
        |    AND quality >= CAST(0.6 AS DOUBLE) THEN n_toks ELSE 0 END)
        |    AS BIGINT) AS kept_tokens
        |FROM j GROUP BY 1 ORDER BY domain""".stripMargin)),

    // (weather-transform fixture parity gates live in WeatherQueries so the
    // whole weather family shares one suite position — they sat here at the
    // suite tail through r12, which is exactly where the bench-contamination
    // diagnosis kept finding them)
  )

  /** The reference's minimal fixtures (tests/fixtures/weather_min.json:1-7,
    * air_min.json:1-7): 3 hours across 2 days. */
  val FixtureWeatherJson: String =
    """{"hourly": {"time": ["2025-01-01T00:00", "2025-01-01T01:00", "2025-01-02T00:00"],
      | "temperature_2m": [25.0, 26.5, 24.0],
      | "precipitation": [0.0, 0.1, 2.4]}}""".stripMargin

  val FixtureAirJson: String =
    """{"hourly": {"time": ["2025-01-01T00:00", "2025-01-01T01:00", "2025-01-02T00:00"],
      | "pm2_5": [10.0, 20.0, 40.0],
      | "pm10": [25.0, 30.0, 60.0]}}""".stripMargin

  /** [[FixtureWeatherJson]] plus the OPTIONAL Open-Meteo `daily` block the
    * reference frontend consumes but its backend never requests
    * (app.js:323-324,788-792 vs web.py:478-485) — exercises the non-null
    * sunrise/sunset path end to end. */
  val FixtureWeatherSunJson: String =
    """{"hourly": {"time": ["2025-01-01T00:00", "2025-01-01T01:00", "2025-01-02T00:00"],
      | "temperature_2m": [25.0, 26.5, 24.0],
      | "precipitation": [0.0, 0.1, 2.4]},
      | "daily": {"time": ["2025-01-01", "2025-01-02"],
      | "sunrise": ["2025-01-01T05:58", "2025-01-02T05:59"],
      | "sunset": ["2025-01-01T18:05", "2025-01-02T18:06"]}}""".stripMargin
}
