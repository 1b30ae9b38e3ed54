package graft

import graft.operators.Bpe

/** BPE training against the classic hand example and round-trip laws. */
class BpeSpec extends SparkSpec {

  // Sennrich et al.'s worked vocabulary (no end-of-word marker):
  // low x5, lower x2, newest x6, widest x3
  private val counts = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("merge loop reproduces the hand-computed order with total tie-break") {
    val merges = Bpe.mergesFromCounts(counts, numMerges = 5)
    // es/st tie at 9 -> left-asc picks (e,s); lo/ow tie at 7 -> (l,o);
    // the we:8 pair DROPS to 2 after (es,t) rewrites newest/widest
    assert(merges == Seq(
      (0L, "e", "s", 9L), (1L, "es", "t", 9L),
      (2L, "l", "o", 7L), (3L, "lo", "w", 7L), (4L, "e", "w", 6L)))
  }

  test("encodeWord applies merges by rank priority") {
    val ranks = Bpe.mergesFromCounts(counts, 5)
      .map { case (r, l, rr, _) => (l, rr) -> r.toInt }.toMap
    assert(Bpe.encodeWord("lowest", ranks).toSeq == Seq("low", "est"))
    assert(Bpe.encodeWord("newest", ranks).toSeq == Seq("n", "ew", "est"))
    assert(Bpe.encodeWord("x", ranks).toSeq == Seq("x"))
    assert(Bpe.encodeWord("", ranks).toSeq == Seq())
  }

  test("trainBpe + applyBpe round-trips documents losslessly") {
    import spark.implicits._
    val docs = Seq(
      (1L, ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).trim),
      (2L, "the lowest newest low"),
      (3L, null.asInstanceOf[String]),
      (4L, "")
    ).toDF("doc_id", "text")
    val merges = Bpe.trainBpe(docs, "doc_id", "text", numMerges = 5)
    val mseq = merges.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // doc 2 bumps low -> 6, newest -> 7; es/st still tie at the top (11)
    assert(mseq.head == ((0L, "e", "s", 11L)), s"got $mseq")
    assert(mseq.size == 5)
    val enc = Bpe.applyBpe(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[org.apache.spark.sql.Row](1))).toMap
    // every word of every doc reconstructs from its subtokens (lossless)
    enc.values.flatten.flatten.foreach { w =>
      assert(w.getSeq[String](1).mkString == w.getString(0))
    }
    assert(enc(2L).get.map(_.getString(0)) == Seq("the", "lowest", "newest", "low"))
    // "lowest" (unseen in the hand example) segments with the learned merges
    assert(enc(2L).get(1).getSeq[String](1) == Seq("low", "est"))
    assert(enc(3L).isEmpty || enc(3L).get == null) // null text
    assert(enc(4L).get.isEmpty)                    // empty text
    val n = Bpe.subtokenCount(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n(4L) == 0L)
    assert(n(2L) == enc(2L).get.map(_.getSeq[String](1).size).sum)
  }
}
