package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Parallelism, Tables}
import graft.functions.TextFunctions
import graft.operators.Chat

/** Conversation (SFT) data-prep gates over [[graft.operators.Chat]].
  *
  * The corpus is document-shaped, so conversations are SYNTHESIZED
  * deterministically from `documents` (the [[linePages]] pattern): each
  * document's token stream becomes up to [[MaxTurns]] turns of [[TurnTok]]
  * tokens, roles alternating user/assistant, every fifth conversation led
  * by a system turn. Two violation classes are injected so validation has
  * real work: every 17th conversation forces turn 1 to `user` (same-role
  * adjacency) and every 23rd blanks its final turn (empty content). Both
  * engines build the same turns frame from the same parquet, so every gate
  * below hashes bit-exact.
  */
object ChatQueries {

  private val TurnTok = 12
  private val MaxTurns = 6

  private def docsP(s: SparkSession, d: String): DataFrame =
    Parallelism.fanOut(Tables.documents(s, d))

  /** Deterministic turns frame: (conv_id, turn_idx, role, content). The
    * last turn's slice start is always <= the token count (n_turns =
    * min(ceil(len/12), 6), and the clamp only binds when len >= 61), so no
    * accidental empty contents arise beyond the injected ones. */
  private[graft] def chatTurns(s: SparkSession, d: String): DataFrame = {
    val sys = col("conv_id") % 5 === 0
    docsP(s, d)
      .select(col("doc_id").as("conv_id"),
        TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("n_turns",
        least(lit(MaxTurns), greatest(lit(1),
          floor((size(col("toks")) + lit(TurnTok - 1)) / lit(TurnTok))
            .cast("int"))))
      .select(col("conv_id"), col("n_turns"), col("toks"),
        explode(sequence(lit(0), col("n_turns") - 1)).as("turn_idx"))
      .withColumn("role",
        when(col("conv_id") % 17 === 0 && col("turn_idx") === 1, lit("user"))
          .when(sys && col("turn_idx") === 0, lit("system"))
          .when(((col("turn_idx") - when(sys, 1).otherwise(0)) % 2) === 0,
            lit("user"))
          .otherwise(lit("assistant")))
      .withColumn("content",
        when(col("conv_id") % 23 === 0 && col("turn_idx") === col("n_turns") - 1,
          lit(""))
          .otherwise(array_join(
            slice(col("toks"), col("turn_idx") * TurnTok + 1, lit(TurnTok)),
            " ")))
      .select("conv_id", "turn_idx", "role", "content")
  }

  /** DuckDB mirror of [[chatTurns]] (ends in a `turns` CTE). */
  private val TurnsSql =
    s"""tk AS (SELECT doc_id AS conv_id, ${DocQueries.ToksSql} AS toks
       |  FROM documents),
       |tn AS (SELECT conv_id, toks,
       |  least($MaxTurns, greatest(1, CAST((len(toks) + ${TurnTok - 1}) // $TurnTok AS INT))) AS n_turns
       |  FROM tk),
       |tr AS (SELECT conv_id, toks, n_turns,
       |  unnest(range(0, n_turns)) AS ti FROM tn),
       |turns AS (SELECT conv_id, CAST(ti AS INT) AS turn_idx,
       |  CASE WHEN conv_id % 17 = 0 AND ti = 1 THEN 'user'
       |       WHEN conv_id % 5 = 0 AND ti = 0 THEN 'system'
       |       WHEN ((ti - (CASE WHEN conv_id % 5 = 0 THEN 1 ELSE 0 END)) % 2) = 0 THEN 'user'
       |       ELSE 'assistant' END AS role,
       |  CASE WHEN conv_id % 23 = 0 AND ti = n_turns - 1 THEN ''
       |       ELSE array_to_string(list_slice(toks, ti * $TurnTok + 1, ti * $TurnTok + $TurnTok), ' ')
       |       END AS content
       |  FROM tr)""".stripMargin

  /** Rendered-conversation CTE (`r`), mirroring [[Chat.render]]. */
  private val RenderSql =
    s"""$TurnsSql,
       |r AS (SELECT conv_id,
       |  string_agg('<|' || role || '|>' || chr(10) || content, chr(10)
       |    ORDER BY turn_idx) AS text,
       |  CAST(count(*) AS INT) AS n_turns
       |  FROM turns GROUP BY 1)""".stripMargin

  val all: Seq[(String, Q)] = Seq(

    // ---- structural validation: count-valued flags so both engines hash
    //      identically (no engine-specific boolean aggregates)
    "q_chat_validate" -> Q(
      (s, d) => Chat.validate(chatTurns(s, d)).orderBy("conv_id"),
      Some(s"""WITH $TurnsSql,
        |nsys AS (SELECT conv_id, turn_idx, role,
        |  lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
        |  FROM turns WHERE role <> 'system'),
        |adj AS (SELECT conv_id,
        |  CAST(sum(CASE WHEN role = prev THEN 1 ELSE 0 END) AS BIGINT) AS n_adjacent_same
        |  FROM nsys GROUP BY 1),
        |conv AS (SELECT conv_id, CAST(count(*) AS INT) AS n_turns,
        |  sum(CASE WHEN turn_idx = 0 AND role = 'system' THEN 1 ELSE 0 END) > 0 AS has_system,
        |  max_by(role, turn_idx) AS last_role,
        |  CAST(sum(CASE WHEN length(trim(content)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
        |  FROM turns GROUP BY 1)
        |SELECT conv.conv_id, n_turns, has_system,
        |  coalesce(n_adjacent_same, 0) AS n_adjacent_same, n_empty,
        |  last_role = 'assistant' AS ends_assistant,
        |  (coalesce(n_adjacent_same, 0) = 0 AND last_role = 'assistant'
        |    AND n_empty = 0) AS is_valid
        |FROM conv LEFT JOIN adj USING (conv_id) ORDER BY conv_id""".stripMargin)),

    // ---- template rendering: one training text per conversation
    "q_chat_render" -> Q(
      (s, d) => Chat.render(chatTurns(s, d)).orderBy("conv_id"),
      Some(s"""WITH $RenderSql
        |SELECT conv_id, text, n_turns, CAST(length(text) AS BIGINT) AS n_chars
        |FROM r ORDER BY conv_id""".stripMargin)),

    // ---- loss-mask char spans of assistant content in the rendered text;
    //      ChatSpec pins substring(rendered, start, end) == content
    "q_chat_loss_mask" -> Q(
      (s, d) => Chat.lossMaskSpans(chatTurns(s, d))
        .orderBy("conv_id", "turn_idx"),
      Some(s"""WITH $TurnsSql,
        |seg AS (SELECT conv_id, turn_idx, role, content,
        |  CAST(length(role) + 5 + length(content) AS BIGINT) AS seg_len
        |  FROM turns),
        |cum AS (SELECT *, coalesce(sum(seg_len) OVER (PARTITION BY conv_id
        |    ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |  0) + turn_idx AS st FROM seg)
        |SELECT conv_id, turn_idx,
        |  CAST(st + length(role) + 5 AS BIGINT) AS start_char,
        |  CAST(st + length(role) + 5 + length(content) AS BIGINT) AS end_char
        |FROM cum WHERE role = 'assistant' ORDER BY conv_id, turn_idx""".stripMargin)),

    // ---- prompt-level dedup: conversations sharing a normalized first
    //      user turn (the "same prompt, different completion" signal)
    "q_chat_prompt_dedup" -> Q(
      (s, d) => Chat.promptGroups(chatTurns(s, d)).orderBy("prompt_h"),
      Some(s"""WITH $TurnsSql,
        |fu AS (SELECT conv_id, min_by(content, turn_idx) AS first_user
        |  FROM turns WHERE role = 'user' GROUP BY 1),
        |pk AS (SELECT conv_id,
        |  md5(regexp_replace(lower(trim(first_user)), '\\s+', ' ', 'g')) AS prompt_h
        |  FROM fu)
        |SELECT prompt_h, CAST(count(*) AS BIGINT) AS n_convs,
        |  min(conv_id) AS keeper_conv
        |FROM pk GROUP BY 1 ORDER BY prompt_h""".stripMargin)),

    // ---- the SFT training layout end-to-end: validate -> render -> pack
    //      valid conversations into token-budget bins (packBins layout,
    //      8 shards, budget 256) -> re-offset every loss-mask span into its
    //      PACKED sequence (bin text = renders joined by one newline, conv
    //      order). What a masked-LM loader actually consumes: one row per
    //      assistant turn with global [g_start, g_end) char offsets.
    "q_chat_sft_pack" -> Q(
      (s, d) => {
        import graft.operators.Packing
        import org.apache.spark.sql.expressions.Window
        val turns = chatTurns(s, d)
        val valid = Chat.validate(turns)
          .filter(col("is_valid")).select("conv_id")
        val rendered = Chat.render(turns).join(valid, Seq("conv_id"))
        val packed = Packing.packBins(rendered, "conv_id",
          TextFunctions.tokenCount(col("text")), budgetTokens = 256L,
          shards = 8)
        val wb = Window.partitionBy("shard", "bin").orderBy("conv_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = packed.withColumn("chars_before",
          coalesce(sum(col("n_chars") + lit(1L)).over(wb), lit(0L)))
        offsets.join(Chat.lossMaskSpans(turns), Seq("conv_id"))
          .select(col("shard"), col("bin"), col("conv_id"), col("turn_idx"),
            (col("chars_before") + col("start_char")).as("g_start"),
            (col("chars_before") + col("end_char")).as("g_end"))
          .orderBy("conv_id", "turn_idx")
      },
      Some(s"""WITH $RenderSql,
        |nsys AS (SELECT conv_id, turn_idx, role,
        |  lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
        |  FROM turns WHERE role <> 'system'),
        |adj AS (SELECT conv_id,
        |  sum(CASE WHEN role = prev THEN 1 ELSE 0 END) AS n_adjacent_same
        |  FROM nsys GROUP BY 1),
        |conv AS (SELECT conv_id, max_by(role, turn_idx) AS last_role,
        |  sum(CASE WHEN length(trim(content)) = 0 THEN 1 ELSE 0 END) AS n_empty
        |  FROM turns GROUP BY 1),
        |valid AS (SELECT conv.conv_id FROM conv LEFT JOIN adj USING (conv_id)
        |  WHERE coalesce(n_adjacent_same, 0) = 0 AND last_role = 'assistant'
        |    AND n_empty = 0),
        |rv AS (SELECT r.conv_id, r.text,
        |  CAST(length(r.text) AS BIGINT) AS n_chars,
        |  CAST(len(list_filter(string_split_regex(lower(r.text), '\\s+'),
        |    x -> len(x) > 0)) AS BIGINT) AS n_tokens,
        |  ${DocQueries.fp60Sql("CAST(r.conv_id AS VARCHAR)")} % 8 AS shard
        |  FROM r JOIN valid USING (conv_id)),
        |pk AS (SELECT conv_id, n_chars, shard,
        |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY conv_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |  FROM rv),
        |po AS (SELECT conv_id, shard,
        |  CAST(floor(tokens_before / 256.0) AS BIGINT) AS bin, n_chars FROM pk),
        |off AS (SELECT conv_id, shard, bin,
        |  CAST(coalesce(sum(n_chars + 1) OVER (PARTITION BY shard, bin
        |    ORDER BY conv_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |  0) AS BIGINT) AS chars_before FROM po),
        |seg AS (SELECT conv_id, turn_idx, role, content,
        |  CAST(length(role) + 5 + length(content) AS BIGINT) AS seg_len
        |  FROM turns),
        |cum AS (SELECT *, coalesce(sum(seg_len) OVER (PARTITION BY conv_id
        |    ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |  0) + turn_idx AS st FROM seg),
        |sp AS (SELECT conv_id, turn_idx,
        |  CAST(st + length(role) + 5 AS BIGINT) AS start_char,
        |  CAST(st + length(role) + 5 + length(content) AS BIGINT) AS end_char
        |  FROM cum WHERE role = 'assistant')
        |SELECT off.shard, off.bin, off.conv_id, sp.turn_idx,
        |  chars_before + start_char AS g_start,
        |  chars_before + end_char AS g_end
        |FROM off JOIN sp USING (conv_id)
        |ORDER BY conv_id, turn_idx""".stripMargin)),

    // ---- chat curation capstone: structural validation -> per-turn PII
    //      redaction (emails/IPs/phones, engine contract order) ->
    //      assistant-substance floor (>= 20 redacted assistant chars) ->
    //      render, with per-conversation PII hit counts for the audit
    //      trail. PII is seeded into every 7th conversation's assistant
    //      turns so the redaction path has real work, mirrored in the
    //      oracle.
    "q_chat_curate" -> Q(
      (s, d) => {
        import graft.functions.Redact
        val seeded = chatTurns(s, d).withColumn("content",
          when(col("role") === "assistant" && col("conv_id") % 7 === 0,
            concat(col("content"), lit(" contact user"), col("conv_id"),
              lit("@example.com")))
            .otherwise(col("content")))
        val valid = Chat.validate(seeded)
          .filter(col("is_valid")).select("conv_id")
        val (ne, ni, np) = Redact.piiCounts(col("content"))
        val red = seeded
          .withColumn("__n_pii", (ne + ni + np).cast("long"))
          .withColumn("content", Redact.redactPii(col("content")))
        val audit = red.groupBy("conv_id").agg(
          sum(when(col("role") === "assistant", length(col("content")))
            .otherwise(0)).cast("long").as("__a_chars"),
          sum(col("__n_pii")).as("n_pii"))
        Chat.render(red.drop("__n_pii"))
          .join(valid, Seq("conv_id"))
          .join(audit.filter(col("__a_chars") >= 20).drop("__a_chars"),
            Seq("conv_id"))
          .select("conv_id", "n_turns", "n_pii", "text")
          .orderBy("conv_id")
      },
      Some {
        import graft.functions.Redact
        val E = Redact.EmailPattern
        val I = Redact.Ipv4Pattern
        val P = Redact.PhonePattern
        s"""WITH $TurnsSql,
        |seeded AS (SELECT conv_id, turn_idx, role,
        |  CASE WHEN role = 'assistant' AND conv_id % 7 = 0
        |    THEN content || ' contact user' || conv_id || '@example.com'
        |    ELSE content END AS content FROM turns),
        |nsys AS (SELECT conv_id, turn_idx, role,
        |  lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
        |  FROM seeded WHERE role <> 'system'),
        |adj AS (SELECT conv_id,
        |  sum(CASE WHEN role = prev THEN 1 ELSE 0 END) AS n_adjacent_same
        |  FROM nsys GROUP BY 1),
        |conv AS (SELECT conv_id, max_by(role, turn_idx) AS last_role,
        |  sum(CASE WHEN length(trim(content)) = 0 THEN 1 ELSE 0 END) AS n_empty
        |  FROM seeded GROUP BY 1),
        |valid AS (SELECT conv.conv_id FROM conv LEFT JOIN adj USING (conv_id)
        |  WHERE coalesce(n_adjacent_same, 0) = 0 AND last_role = 'assistant'
        |    AND n_empty = 0),
        |red AS (SELECT conv_id, turn_idx, role,
        |  regexp_replace(regexp_replace(regexp_replace(content,
        |    '$E', '[EMAIL]', 'g'), '$I', '[IP]', 'g'), '$P', '[PHONE]', 'g')
        |    AS content,
        |  len(regexp_extract_all(content, '$E'))
        |   + len(regexp_extract_all(
        |       regexp_replace(content, '$E', '[EMAIL]', 'g'), '$I'))
        |   + len(regexp_extract_all(regexp_replace(regexp_replace(content,
        |       '$E', '[EMAIL]', 'g'), '$I', '[IP]', 'g'), '$P')) AS n_pii
        |  FROM seeded),
        |audit AS (SELECT conv_id,
        |  CAST(sum(CASE WHEN role = 'assistant' THEN length(content)
        |    ELSE 0 END) AS BIGINT) AS a_chars,
        |  CAST(sum(n_pii) AS BIGINT) AS n_pii FROM red GROUP BY 1),
        |rr AS (SELECT conv_id,
        |  string_agg('<|' || role || '|>' || chr(10) || content, chr(10)
        |    ORDER BY turn_idx) AS text,
        |  CAST(count(*) AS INT) AS n_turns FROM red GROUP BY 1)
        |SELECT rr.conv_id, n_turns, n_pii, text
        |FROM rr JOIN valid USING (conv_id) JOIN audit USING (conv_id)
        |WHERE a_chars >= 20 ORDER BY rr.conv_id""".stripMargin
      }),

    // ---- transcript-exact dedup over the rendered corpus
    "q_chat_dedup_transcripts" -> Q(
      (s, d) => Chat.dedupTranscripts(Chat.render(chatTurns(s, d)))
        .select("conv_id", "transcript_h", "is_keeper")
        .orderBy("conv_id"),
      Some(s"""WITH $RenderSql,
        |t2 AS (SELECT conv_id,
        |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS transcript_h
        |  FROM r)
        |SELECT conv_id, transcript_h,
        |  conv_id = min(conv_id) OVER (PARTITION BY transcript_h) AS is_keeper
        |FROM t2 ORDER BY conv_id""".stripMargin))
  )
}
