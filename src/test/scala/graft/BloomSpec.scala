package graft

import org.apache.spark.sql.functions._

import graft.operators.Bloom

/** Bloom-filter membership: the no-false-negative guarantee (what makes the
  * filter safe as an exact-path gate), a bounded false-positive rate at the
  * documented sizing, absent-word semantics, and build determinism. */
class BloomSpec extends SparkSpec {

  private val NumBits = 1 << 12
  private val K = 5

  private def keysDf(keys: Seq[String]) = {
    val s = spark
    import s.implicits._
    keys.toDF("key")
  }

  test("no false negatives: every built key probes true") {
    val keys = (0 until 500).map(i => s"member-$i")
    val filter = Bloom.build(keysDf(keys), col("key"), NumBits, K)
    val probed = Bloom.mightContain(keysDf(keys), col("key"), filter,
      NumBits, K, "hit")
    assert(probed.filter(!col("hit")).count() === 0)
  }

  test("false-positive rate stays near the sizing formula") {
    val members = (0 until 500).map(i => s"member-$i")
    val filter = Bloom.build(keysDf(members), col("key"), NumBits, K)
    val strangers = (0 until 2000).map(i => s"stranger-$i")
    val fp = Bloom.mightContain(keysDf(strangers), col("key"), filter,
      NumBits, K, "hit").filter(col("hit")).count()
    // (1 - e^(-kn/m))^k at n=500, m=4096, k=5 ≈ 2.2 %; allow 3x headroom
    // (the positions are deterministic md5 buckets, so this never flakes)
    assert(fp.toDouble / strangers.size < 0.07,
      s"FP rate ${fp.toDouble / strangers.size} out of bound")
  }

  test("an empty filter rejects everything (absent words coalesce to 0)") {
    val empty = Bloom.build(keysDf(Nil), col("key"), NumBits, K)
    val probed = Bloom.mightContain(keysDf(Seq("a", "b")), col("key"), empty,
      NumBits, K, "hit")
    assert(probed.filter(col("hit")).count() === 0)
    // and the probe frame keeps its original columns plus the verdict
    assert(probed.columns.toSeq === Seq("key", "hit"))
  }

  test("build is deterministic and word-bounded") {
    val keys = (0 until 300).map(i => s"k$i")
    val a = Bloom.build(keysDf(keys), col("key"), NumBits, K)
    val b = Bloom.build(keysDf(keys), col("key"), NumBits, K)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    assert(a.count() <= NumBits / Bloom.WordBits)
    // every mask is a positive long: bit 31 is the highest bit ever set
    // per 32-bit word, so bits fits in [1, 2^32)
    assert(a.filter(col("bits") <= 0 || col("bits") >= (1L << 32)).count() === 0)
  }
}
