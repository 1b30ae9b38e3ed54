package graft

import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.operators.{Decontaminate, Dedup, TermWeights}

/** The cache-release contract: operators that persist internal
  * intermediates pin them into the caller's [[CacheScope.Handle]], and
  * after the output is materialized `release()` leaves NOTHING in
  * `sc.getPersistentRDDs` — a loop calling these operators holds no
  * residue between iterations (the r12 verdict's leak: one corpus-scaled
  * cache entry pinned per call for the life of the session). */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def sweep(): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  private def persistentCount: Int = spark.sparkContext.getPersistentRDDs.size

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "pack my box with five dozen liquor jugs"),
    (4L, "the quick brown fox jumps over the lazy dog"),
    (5L, "sphinx of black quartz judge my vow")
  ).toDF("doc_id", "text")

  /** Run `op` with a fresh handle, materialize its output, release, and
    * assert zero persistent RDDs remain. Returns the materialized count so
    * callers can sanity-check the operator actually did work. */
  private def assertReleased(name: String)(
      op: CacheScope.Handle => org.apache.spark.sql.DataFrame): Long = {
    sweep()
    assert(persistentCount == 0, s"$name: dirty session before the call")
    val scope = CacheScope.handle()
    val out = op(scope)
    val n = out.count() // the caller's action — intermediates must survive it
    assert(scope.pinnedCount > 0, s"$name pinned nothing — wrong scope threading?")
    scope.release()
    // unpersist(blocking=false) above is asynchronous only for the block
    // drop; the registry entry is removed synchronously
    assert(persistentCount == 0,
      s"$name left $persistentCount persistent RDD(s) after release")
    n
  }

  test("jaccardPairs releases its token index") {
    val n = assertReleased("jaccardPairs") { scope =>
      Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.8, scope = scope)
    }
    assert(n >= 1) // the identical pair (1, 4); doc 2 sits at 7/9 < 0.8
  }

  test("jaccardPairs with a df cut releases both index stages") {
    assertReleased("jaccardPairs(maxTokenDf)") { scope =>
      Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5,
        maxTokenDf = 4, scope = scope)
    }
  }

  test("minhashLshPairs releases band frame and verify sets") {
    val n = assertReleased("minhashLshPairs") { scope =>
      Dedup.minhashLshPairs(docs, "doc_id", "text", k = 16, rowsPerBand = 2,
        threshold = 0.8, scope = scope)
    }
    assert(n >= 1)
  }

  test("simhashPairs releases its signature band frame") {
    assertReleased("simhashPairs") { scope =>
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3, scope = scope)
    }
  }

  test("embeddingNearDup releases its bucket frame") {
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f, 0.5f)),
      (2L, Seq(1.1f, 2.1f, 0.4f)),
      (3L, Seq(-1.0f, 2.0f, 0.5f))).toDF("id", "embedding")
    val n = assertReleased("embeddingNearDup") { scope =>
      Dedup.embeddingNearDup(emb, "id", "embedding", threshold = 0.9,
        bucketBits = 3, dim = 3, scope = scope)
    }
    assert(n == 1)
  }

  test("semanticDedup releases assignment and component-loop rounds") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.0)), (3L, Seq(0.0, 2.0))
    ).toDF("vec_id", "v")
    val cents = Seq((0L, Seq(0.0, 0.0))).toDF("cell", "centroid")
    val n = assertReleased("semanticDedup") { scope =>
      Dedup.semanticDedup(vecs, "vec_id", "v", cents, threshold = 0.9,
        scope = scope)
    }
    assert(n == 3)
  }

  test("connectedComponents (both variants) release their final round") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    assertReleased("connectedComponents")(scope =>
      // maxLocalEdges = 0: the pin-hygiene contract under test belongs to
      // the distributed loop (the bounded-local path persists nothing)
      Dedup.connectedComponents(pairs, scope = scope, maxLocalEdges = 0))
    assertReleased("connectedComponentsPropagation")(scope =>
      Dedup.connectedComponentsPropagation(pairs, scope = scope))
  }

  test("decontamination fractions releases its corpus edge frame") {
    val bench = Seq((100L, "five dozen liquor jugs")).toDF("doc_id", "text")
    assertReleased("Decontaminate.fractions") { scope =>
      Decontaminate.fractions(docs, bench, "doc_id", "text",
        threshold = 0.5, scope = scope)
    }
  }

  test("tfIdfTopK releases its term-frequency frame") {
    assertReleased("tfIdfTopK") { scope =>
      TermWeights.tfIdfTopK(docs, "doc_id", "text", k = 3, scope = scope)
    }
  }

  test("crossEntropyCut releases its scored frame") {
    import graft.operators.LanguageModel
    val n = assertReleased("crossEntropyCut") { scope =>
      LanguageModel.crossEntropyCut(docs, "doc_id", "text",
        targetRef = docs.filter(col("doc_id") <= 2),
        generalRef = docs.filter(col("doc_id") >= 3),
        vocabCap = 64, bigramCap = 256, keepFrac = 0.5, scope = scope)
    }
    assert(n > 0)
  }

  test("release degrades to recompute, never to data loss") {
    sweep()
    val scope = CacheScope.handle()
    val out = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.8,
      scope = scope)
    val before = out.collect().toSet
    scope.release() // released BEFORE a second action: plan must recompute
    assert(out.collect().toSet == before)
    assert(scope.pinnedCount == 0) // release() also empties the handle
    sweep()
  }

  test("detached handle tracks nothing (no driver-side leak)") {
    val d = CacheScope.detached
    val before = d.pinnedCount
    sweep()
    Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.8).count()
    assert(d.pinnedCount == before)
    sweep() // historical contract: external sweep clears the persists
    assert(persistentCount == 0)
  }

  test("gate scope: gatePersist pins to the current gate and endGate leaves zero residue") {
    sweep()
    assert(persistentCount == 0)
    // outside a harness: gatePersist is a plain persist (detached pin),
    // released only by an external sweep — the historical contract
    val loose = CacheScope.gatePersist(docs.select("doc_id"))
    loose.count()
    assert(persistentCount == 1)
    assert(CacheScope.endGate() == 0) // no gate open: nothing to release
    sweep()
    // inside a harness: begin -> persist -> materialize -> end releases
    CacheScope.beginGate()
    val pinned = CacheScope.gatePersist(docs.select("doc_id", "text"))
    assert(pinned.count() == 5)
    assert(persistentCount == 1, "gate persist must be live mid-gate")
    assert(CacheScope.endGate() == 1)
    assert(persistentCount == 0,
      "endGate must leave zero persistent RDDs — the Verify/Bench residue assertion")
    // endGate is idempotent and falls back to detached
    assert(CacheScope.endGate() == 0)
  }
}
