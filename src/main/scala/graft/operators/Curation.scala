package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-corpus curation primitives: URL/domain signals and per-key caps.
  *
  * A crawled training corpus is curated per DOMAIN as much as per document —
  * blocklists, per-domain document caps (no single site dominating the
  * mixture), and domain-level stats all need the domain as a first-class
  * column. Extraction is scan-stage regex (RE2-safe, oracle-mirrorable);
  * the cap is one window shuffle on the key.
  */
object Curation {

  /** RE2-safe URL pattern (no lookaround): scheme + non-space run. */
  val UrlPattern = "https?://[^ \\t\\n\\r]+"
  /** Group 1 = host (up to the first slash / whitespace). */
  val DomainPattern = "https?://([^/ \\t\\n\\r]+)"

  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlPattern), lit(0))

  def extractDomains(text: Column): Column =
    regexp_extract_all(text, lit(DomainPattern), lit(1))

  /** (doc_id, domain) edge list — one row per URL occurrence (NOT distinct:
    * occurrence counts are the ranking signal). */
  def domainEdges(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.core.Parallelism.fanOut(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), explode(extractDomains(col(textCol))).as("domain"))

  /** Keep at most `n` rows per key, in `order` order (deterministic — ties
    * must be broken by a unique column; the first order column is also used
    * as the shard hash source). The standard "no single domain dominates the
    * corpus" cap.
    *
    * Two-phase EXACT top-N: a single `Window.partitionBy(key)` would put a
    * hot key's entire row set into one window partition (with a handful of
    * sources or one mega-domain, that is the whole corpus through one task).
    * Phase 1 ranks within (key, hash-shard) — every window partition is
    * bounded by its shard; phase 2 re-ranks the <= n*shards survivors per
    * key. The result is identical to the single global window: any row in
    * the global top-n is necessarily in the top-n of its own shard. */
  def capPerKey(df: DataFrame, key: Column, n: Int, order: Seq[Column],
                shards: Int = 64): DataFrame = {
    val shard = Sampling.hashBucket(order.head.cast("string"), shards, "capshard")
    val w1 = Window.partitionBy(key, shard).orderBy(order: _*)
    val w2 = Window.partitionBy(key).orderBy(order: _*)
    df.withColumn("__rank", row_number().over(w1))
      .filter(col("__rank") <= n)
      .withColumn("__rank", row_number().over(w2))
      .filter(col("__rank") <= n)
      .drop("__rank")
  }
}
