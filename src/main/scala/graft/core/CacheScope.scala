package graft.core

import org.apache.spark.sql.DataFrame

/** Release path for operator-internal DataFrame persists.
  *
  * Several dedup/similarity operators persist an intermediate (a token
  * index, an LSH band frame, a centroid assignment) because their plan
  * consumes it from two or three branches — without the cache each branch
  * recomputes the full upstream pipeline, and without an up-front
  * materialization the branches race to populate it (the observed
  * bimodal-timing failure mode). The returned DataFrame is lazy, so the
  * operator itself can never unpersist: the cache must outlive the CALLER's
  * action. That is fine under a harness that sweeps `spark.catalog
  * .clearCache()` between gates, but a long-running job calling such an
  * operator in a loop would pin one corpus-scaled cache entry per call for
  * the life of the session.
  *
  * A [[CacheScope.Handle]] closes the loop: operators pin every internal
  * persist into the handle the caller passes, and the caller releases the
  * handle once the operator's output has been materialized (written,
  * counted, or re-persisted). Release degrades to recompute, never to data
  * loss — an unpersisted intermediate rebuilds through its captured plan if
  * the output is re-executed later.
  *
  * The default [[CacheScope.detached]] handle preserves the historical
  * contract (persists stay until an external cache sweep) and deliberately
  * does NOT track frames: a session-lived buffer of plan references would
  * itself be a driver-side leak.
  */
object CacheScope {

  final class Handle private[CacheScope] (track: Boolean) {
    private val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    /** Record an already-persisted intermediate for later release. */
    private[graft] def pin(df: DataFrame): DataFrame = synchronized {
      if (track) pinned += df
      df
    }

    /** Unpersist every intermediate pinned since the last release. Safe at
      * any time (early release = recompute on next use); idempotent. */
    def release(): Unit = synchronized {
      pinned.foreach(_.unpersist(blocking = false))
      pinned.clear()
    }

    /** Number of currently pinned intermediates (spec introspection). */
    def pinnedCount: Int = synchronized(pinned.length)
  }

  /** A fresh tracking handle: pass to an operator, materialize its output,
    * then `release()`. */
  def handle(): Handle = new Handle(track = true)

  /** No-op handle for callers that rely on an external cache sweep. */
  val detached: Handle = new Handle(track = false)

  // ------------------------- per-gate handle -------------------------
  //
  // The correctness/bench harnesses run ~300 gate closures in one session;
  // a gate that persists an internal frame (a shared token fold, an LSH
  // band index) owns no release point — the closure returns a LAZY frame,
  // so the persist must outlive the closure. Routing those persists
  // through a harness-owned CURRENT handle closes the loop: the harness
  // begins a gate, materializes its output, then releases — and can then
  // ASSERT zero residue instead of sweeping blind. Outside a harness the
  // current handle is [[detached]], preserving the historical
  // persist-until-swept contract for ad-hoc callers.

  private val gate =
    new java.util.concurrent.atomic.AtomicReference[Handle](detached)

  /** Install a fresh tracking handle as the current gate scope. */
  def beginGate(): Unit = gate.set(handle())

  /** Release everything the current gate pinned and fall back to
    * [[detached]]. Returns how many frames were released (harness
    * accounting). */
  def endGate(): Int = {
    val h = gate.getAndSet(detached)
    val n = h.pinnedCount
    h.release()
    n
  }

  /** Persist `df` at MEMORY_AND_DISK and pin it to the current gate scope
    * (no-op pin outside a harness). The single call every gate-internal
    * persist routes through. */
  def gatePersist(df: DataFrame): DataFrame =
    gate.get.pin(df.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
}
