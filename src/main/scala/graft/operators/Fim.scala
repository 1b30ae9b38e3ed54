package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) training-data transform — the public recipe
  * behind infilling-capable code/text models (Bavarian et al. 2022,
  * arXiv:2207.14255; the StarCoder-style sentinel convention): a fraction
  * of documents are rearranged so the model learns to generate a MIDDLE
  * span conditioned on its surrounding prefix and suffix,
  *
  *  - PSM: `<|fim_prefix|>` prefix `<|fim_suffix|>` suffix
  *    `<|fim_middle|>` middle
  *  - SPM (the joint variant): `<|fim_prefix|><|fim_suffix|>` suffix
  *    `<|fim_middle|>` prefix middle
  *
  * with CHARACTER-level cut points (the paper's context-level random
  * splits, made reproducible): both cuts and the apply/passthrough
  * selection are pure functions of (id, salt) through the engine's shared
  * 60-bit md5 fingerprint — the same determinism contract as
  * [[Sampling.hashBucket]] membership, so a re-run, a different cluster
  * size, or the DuckDB oracle all produce byte-identical output.
  *
  * Scale shape: a pure Column tree (two fingerprints, three substrings,
  * one concat) — scan-stage, whole-stage codegen, zero shuffle. */
object Fim {

  val Prefix = "<|fim_prefix|>"
  val Suffix = "<|fim_suffix|>"
  val Middle = "<|fim_middle|>"

  private def fp60(key: Column, tag: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(tag))), 1, 15), 16, 10)
      .cast("long")

  /** Apply FIM to `ratePct`% of documents (hash-selected); the rest pass
    * through unchanged. Adds `fim_applied`; rewrites `textCol` in place.
    * Cut points c1 <= c2 are two independent draws in [0, len], so empty
    * prefix/middle/suffix spans all occur — the degenerate splits the
    * paper keeps (an empty middle teaches "nothing to fill"). */
  def fim(docs: DataFrame, idCol: String, textCol: String,
          ratePct: Int = 50, spm: Boolean = false,
          salt: String = ""): DataFrame = {
    require(ratePct >= 0 && ratePct <= 100, s"ratePct $ratePct out of range")
    val id = col(idCol)
    val text = col(textCol)
    val len = length(text)
    val a = pmod(fp60(id, s":fimA$salt"), (len + 1).cast("long"))
    val b = pmod(fp60(id, s":fimB$salt"), (len + 1).cast("long"))
    val c1 = least(a, b)
    val c2 = greatest(a, b)
    val pre = text.substr(lit(1), c1.cast("int"))
    val mid = text.substr((c1 + 1).cast("int"), (c2 - c1).cast("int"))
    val suf = text.substr((c2 + 1).cast("int"), (len - c2).cast("int"))
    val applied = pmod(fp60(id, s":fimS$salt"), lit(100L)) < ratePct
    val rearranged =
      if (spm) concat(lit(Prefix), lit(Suffix), suf, lit(Middle), pre, mid)
      else concat(lit(Prefix), pre, lit(Suffix), suf, lit(Middle), mid)
    docs
      .withColumn(textCol, when(applied, rearranged).otherwise(text))
      .withColumn("fim_applied", applied)
  }
}
