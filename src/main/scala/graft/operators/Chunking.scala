package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Parallelism
import graft.functions.TextFunctions

/** Document chunking: split each document into fixed-token context windows
  * with configurable overlap — the step between cleaning and sequence
  * packing in a pretraining pipeline (a 100k-token document does not fit a
  * context window; it becomes ~25 overlapping 4k windows).
  *
  * Scale shape: entirely scan-stage — tokenize, compute the chunk count,
  * build the per-chunk token slices with a `transform` over the chunk-index
  * sequence, explode the pre-sliced structs. Zero shuffles; output rows
  * scale with total corpus tokens / step, and every expression is a pure
  * function of the row, so the operator parallelizes with the scan.
  * Slicing BEFORE the explode matters on mega-documents: exploding the
  * index sequence first would duplicate the full token array once per chunk
  * row (a 100k-token document amplified ~25× in the intermediate), while
  * the pre-sliced structs together hold only chunk/step ≈ 1–1.3× the
  * document's tokens.
  */
object Chunking {

  /** One row per (doc, chunk): `chunk_id` (0-based), `chunk_text` (the
    * chunk's tokens re-joined with single spaces), `n_tokens`. Chunks start
    * every `chunkTokens - overlapTokens` tokens, so consecutive chunks share
    * `overlapTokens` tokens; the last chunk may be shorter. Documents at or
    * under `chunkTokens` tokens (including empty ones) yield one chunk. */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlapTokens: Int = 0,
                    tokens: Column => Column = TextFunctions.tokens): DataFrame = {
    require(overlapTokens >= 0 && chunkTokens > overlapTokens,
      "need chunkTokens > overlapTokens >= 0")
    val step = chunkTokens - overlapTokens
    // integer-exact ceil((n - chunk) / step) + 1: stays in BIGINT arithmetic
    // so any engine mirrors it bit-for-bit (no double ceil at the boundary)
    val nChunks = when(col("n") <= chunkTokens, lit(1L))
      .otherwise(expr(s"(n - $chunkTokens + ${step - 1}) div $step") + lit(1L))
    Parallelism.fanOut(docs.select(col(idCol).as("doc_id"), col(textCol)))
      // null text tokenizes to null; an empty token set keeps the "every
      // document yields at least one chunk" contract for null-text rows too
      .select(col("doc_id"),
        coalesce(tokens(col(textCol)), typedLit(Seq.empty[String])).as("toks"))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0L), nChunks - 1L), i =>
          struct(i.as("chunk_id"),
            slice(col("toks"), (i * step + 1).cast("int"), lit(chunkTokens))
              .as("ctoks")))).as("c"))
      .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
        array_join(col("c.ctoks"), " ").as("chunk_text"),
        size(col("c.ctoks")).cast("bigint").as("n_tokens"))
  }
}
