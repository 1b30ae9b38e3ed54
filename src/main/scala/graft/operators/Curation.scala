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
    * must be broken by a unique column). The standard "no single domain
    * dominates the corpus" cap: one shuffle on the key; a pathologically hot
    * key is still one window partition, which is exactly the bound the cap
    * itself then enforces (only its first `n` rows are ever emitted). */
  def capPerKey(df: DataFrame, key: Column, n: Int, order: Seq[Column]): DataFrame =
    df.withColumn("__rank", row_number().over(Window.partitionBy(key).orderBy(order: _*)))
      .filter(col("__rank") <= n)
      .drop("__rank")
}
