package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation (SFT / chat) data preparation — the instruction-tuning half
  * of a training-data pipeline. Everything operates on a TURNS frame:
  *
  *   (conv_id: bigint, turn_idx: int, role: string, content: string)
  *
  * with roles in {system, user, assistant}. The reference engine is
  * document-shaped (etl-weather has no chat surface); this family covers
  * what a user curating instruction data on the same engine needs next:
  * structural validation, template rendering, loss-mask span computation,
  * prompt-level dedup, and transcript-level dedup.
  *
  * Scale shape: every operator here is one hash-shuffle on `conv_id` (the
  * window/groupBy key) — conversations are small (tens of turns), so
  * per-key state is bounded and skew is impossible by construction. No
  * driver-side state, no collects.
  *
  * Rendering contract (fixed so mask offsets are portable):
  *   segment(turn)  = "<|" + role + "|>" + "\n" + content
  *   rendered(conv) = segments joined by "\n" in turn_idx order
  * so a segment contributes `len(role) + 5 + len(content)` characters and
  * each join adds one. [[lossMaskSpans]] emits 0-based [start, end) char
  * offsets of assistant CONTENT inside the rendered text — the spans a
  * trainer unmasks for loss; [[ChatSpec]] pins `substring(rendered, span)
  * == content` exactly.
  */
object Chat {

  private def segLen(role: org.apache.spark.sql.Column,
                     content: org.apache.spark.sql.Column) =
    (length(role) + lit(5) + length(content)).cast("long")

  /** Structural validation, one row per conversation:
    *   n_turns, has_system (system turn at idx 0), n_adjacent_same
    *   (same-role adjacency violations among non-system turns),
    *   n_empty (blank-content turns), ends_assistant, is_valid.
    * Count-valued flags rather than engine-specific boolean aggregates so
    * any SQL engine mirrors them bit-for-bit. */
  def validate(turns: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    // lag over the non-system subsequence: system prompts do not break the
    // user/assistant alternation contract
    val adj = turns.filter(col("role") =!= "system")
      .withColumn("__prev", lag(col("role"), 1).over(w))
      .groupBy("conv_id")
      .agg(sum(when(col("role") === col("__prev"), 1).otherwise(0))
        .cast("long").as("n_adjacent_same"))
    turns.groupBy("conv_id")
      .agg(
        count(lit(1)).cast("int").as("n_turns"),
        (sum(when(col("turn_idx") === 0 && col("role") === "system", 1)
          .otherwise(0)) > 0).as("has_system"),
        max_by(col("role"), col("turn_idx")).as("__last_role"),
        sum(when(length(trim(col("content"))) === 0, 1).otherwise(0))
          .cast("long").as("n_empty"))
      .join(adj, Seq("conv_id"), "left")
      .select(col("conv_id"), col("n_turns"), col("has_system"),
        coalesce(col("n_adjacent_same"), lit(0L)).as("n_adjacent_same"),
        col("n_empty"),
        (col("__last_role") === "assistant").as("ends_assistant"),
        (coalesce(col("n_adjacent_same"), lit(0L)) === 0 &&
          col("__last_role") === "assistant" &&
          col("n_empty") === 0).as("is_valid"))
  }

  /** Render each conversation to one training text under the fixed template
    * (scaladoc above). Output: (conv_id, text, n_turns, n_chars). */
  def render(turns: DataFrame): DataFrame =
    turns.groupBy("conv_id")
      .agg(
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("turn_idx"),
            concat(lit("<|"), col("role"), lit("|>\n"), col("content"))
              .as("seg")))),
          x => x.getField("seg"))).as("text"),
        count(lit(1)).cast("int").as("n_turns"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  /** 0-based [start_char, end_char) spans of assistant CONTENT inside the
    * [[render]]ed text — the unmasked (loss-bearing) regions. One window
    * sum over the conversation; no join against the rendered frame. */
  def lossMaskSpans(turns: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    turns
      .withColumn("__start",
        coalesce(sum(segLen(col("role"), col("content"))).over(w), lit(0L))
          + col("turn_idx"))
      .filter(col("role") === "assistant")
      .select(col("conv_id"), col("turn_idx"),
        (col("__start") + length(col("role")) + lit(5)).cast("long")
          .as("start_char"),
        (col("__start") + length(col("role")) + lit(5) + length(col("content")))
          .cast("long").as("end_char"))
  }

  /** Normalized first-user-turn key per conversation — the "same prompt,
    * different completion" signal prompt-level dedup and contamination
    * checks key on. Normalization: trim, lower, collapse whitespace runs. */
  def promptKeys(turns: DataFrame): DataFrame =
    turns.filter(col("role") === "user")
      .groupBy("conv_id")
      .agg(min_by(col("content"), col("turn_idx")).as("__first_user"))
      .select(col("conv_id"),
        md5(regexp_replace(lower(trim(col("__first_user"))), "\\s+", " "))
          .as("prompt_h"))

  /** Prompt-duplicate groups: conversations sharing a normalized first user
    * turn, with the min-conv_id keeper. Output one row per distinct prompt:
    * (prompt_h, n_convs, keeper_conv). */
  def promptGroups(turns: DataFrame): DataFrame =
    promptKeys(turns).groupBy("prompt_h")
      .agg(count(lit(1)).cast("long").as("n_convs"),
        min("conv_id").as("keeper_conv"))

  /** Transcript-exact dedup over rendered conversations: key is the md5 of
    * the whitespace-normalized rendered text, keeper is min conv_id. Output:
    * rendered columns + (transcript_h, is_keeper). */
  def dedupTranscripts(rendered: DataFrame): DataFrame = {
    val grp = Window.partitionBy(col("transcript_h"))
    rendered
      .withColumn("transcript_h",
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .withColumn("is_keeper",
        col("conv_id") === min("conv_id").over(grp))
  }
}
