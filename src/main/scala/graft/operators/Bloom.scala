package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter membership: build a bit-array filter over a
  * corpus key column with one aggregation, then probe an increment against
  * the BROADCAST filter with zero shuffles on the probe side.
  *
  * This is the classic "probe before you shuffle" accelerator for
  * incremental ingest at scale (reference behavior: the dedup-on-ingest
  * path of `/root/reference` re-checks every snapshot write; see
  * `src/etl_weather/storage.py:60` dual-write): a 100 TB corpus has
  * billions of content hashes, and an exact anti-join probe
  * ([[Dedup.exactIncrement]]) must shuffle the increment against that index.
  * A Bloom filter answers "definitely new" from a broadcast-sized bit array
  * — only the (typically small) might-contain fraction needs the exact
  * join. False positives send a few extra rows to the exact check; false
  * negatives are impossible, so no duplicate ever slips through when the
  * filter gates the EXACT path rather than replacing it.
  *
  * Layout: the filter is a (word: long, bits: long) frame — bit `p` of the
  * filter lives at word `p / 32`, mask `1 << (p % 32)` (32 bits per word
  * keeps every mask positive in both engines' signed 64-bit arithmetic).
  * Words with no set bits are absent; probes coalesce them to 0. Bit
  * positions are the same salted md5 fingerprint family as
  * [[Sampling.hashBucket]] (`fp60(key || ":bloom" || seed) % numBits`), so
  * a single-threaded SQL engine reproduces the filter bit-for-bit.
  *
  * Scale shape: the build is one partial-aggregated `bit_or` groupBy — at
  * most `numBits / 32` output rows regardless of corpus size. The probe is
  * `k` broadcast hash joins (one per hash seed) and stays entirely in the
  * scan stage — the increment is never shuffled. Sizing: the broadcast is
  * ≤ 16 bytes × numBits/32 ≈ numBits/2 bytes; a 1-in-100-FP filter for 10
  * billion keys needs ~10 bits/key ≈ 6 GB, past broadcast range — at that
  * scale shard the corpus by [[Sampling.hashBucket]] into ~64 sub-filters
  * built per shard, and probe each increment row against its own shard's
  * broadcast (the per-shard build/probe is this same operator).
  */
object Bloom {

  /** Bits per filter word. 32 (not 64) so `1L << bit` never touches the
    * sign bit — DuckDB raises on signed `<<` overflow and Spark wraps, so
    * the portable mirror keeps masks in the positive range. */
  val WordBits = 32

  /** Bit position of `key` for hash seed `s`: the same salted-md5 bucket
    * family as [[Sampling.hashBucket]] (exact-mirrorable in SQL). */
  def position(key: Column, numBits: Int, seed: Int): Column =
    Sampling.hashBucket(key, numBits, s":bloom$seed")

  private def wordOf(p: Column): Column =
    floor(p / lit(WordBits)).cast("long")

  private def maskOf(p: Column): Column =
    // shiftleft(Column, Column) has no Scala binding; 2^bit is exact in a
    // double up to bit 31, which WordBits = 32 guarantees
    pow(lit(2.0), pmod(p, lit(WordBits.toLong))).cast("long")

  /** Build the filter: one exploded projection (k rows per key) into one
    * partial-aggregated bit_or groupBy. Output is (word, bits), at most
    * `numBits / 32` rows — broadcast-sized by construction. */
  def build(df: DataFrame, key: Column, numBits: Int, k: Int): DataFrame =
    df.select(explode(array((0 until k).map(position(key, numBits, _)): _*)).as("p"))
      .select(wordOf(col("p")).as("word"), maskOf(col("p")).as("mask"))
      .groupBy("word")
      .agg(expr("bit_or(mask)").as("bits"))

  /** Probe: adds `outCol` (boolean) to `df` — true iff every one of the k
    * hashed bits of `key` is set in `filter`. The filter is broadcast and
    * joined once per seed; the probe frame itself is never shuffled, so the
    * whole check rides the increment's scan stage. */
  def mightContain(df: DataFrame, key: Column, filter: DataFrame,
                   numBits: Int, k: Int, outCol: String): DataFrame = {
    val withPos = (0 until k).foldLeft(df) { (acc, s) =>
      val p = position(key, numBits, s)
      acc.withColumn(s"__bloom_w$s", wordOf(p))
        .withColumn(s"__bloom_m$s", maskOf(p))
    }
    val joined = (0 until k).foldLeft(withPos) { (acc, s) =>
      acc.join(
        broadcast(filter.select(col("word").as(s"__bloom_fw$s"),
          col("bits").as(s"__bloom_fb$s"))),
        col(s"__bloom_w$s") === col(s"__bloom_fw$s"), "left")
    }
    val hit = (0 until k).map { s =>
      (coalesce(col(s"__bloom_fb$s"), lit(0L))
        .bitwiseAND(col(s"__bloom_m$s")) === col(s"__bloom_m$s"))
    }.reduce(_ && _)
    joined.withColumn(outCol, hit)
      .drop((0 until k).flatMap(s => Seq(s"__bloom_w$s", s"__bloom_m$s",
        s"__bloom_fw$s", s"__bloom_fb$s")): _*)
  }
}
