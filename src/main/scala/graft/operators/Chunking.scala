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
  * explode a chunk-index sequence, slice. Zero shuffles; output rows scale
  * with total corpus tokens / step, and every expression is a pure function
  * of the row, so the operator parallelizes with the scan and never holds
  * more than one document's tokens at a time.
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
    val start = (col("chunk_id") * step + 1).cast("int")
    Parallelism.fanOut(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        array_join(slice(col("toks"), start, lit(chunkTokens)), " ").as("chunk_text"),
        size(slice(col("toks"), start, lit(chunkTokens))).cast("bigint").as("n_tokens"))
  }
}
