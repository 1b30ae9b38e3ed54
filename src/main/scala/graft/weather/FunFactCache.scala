package graft.weather

import java.nio.file.{Files, Paths}

import scala.util.Try

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** S13 — the fun-fact KV cache layer (utils.py:52-306), minus the external
  * LLM call (network-bound; injected as a `supplier`, the same stub seam the
  * reference's tests use for HTTP).
  *
  * Semantics mirrored: JSON file keyed by `city.trim.toLowerCase`; each
  * entry holds up to the LAST 7 distinct fact variants (`facts[-7:]`,
  * utils.py:187) plus a timestamp; the legacy single-`fact` entry shape is
  * read tolerantly (utils.py:88-92); corrupt or missing cache files fail
  * soft to empty (utils.py:67-73); a fresh generation appends-if-new and
  * persists, any supplier/IO failure falls back to a cached variant.
  * Driver-side by design — a per-city fact list is serving state, not a
  * relational dataset.
  */
object FunFactCache {

  private val mapper = new ObjectMapper()

  /** Tolerant read: city-key -> fact variants (newest last). */
  def load(path: String): Map[String, List[String]] =
    Try {
      val root = mapper.readTree(Files.readString(Paths.get(path)))
      val fields = root.properties().iterator()
      var out = Map.empty[String, List[String]]
      while (fields.hasNext) {
        val e = fields.next()
        val entry = e.getValue
        val facts =
          if (entry.has("facts") && entry.get("facts").isArray) {
            val it = entry.get("facts").elements()
            Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
              .filter(_.isTextual).map(_.asText()).toList
          } else if (entry.has("fact") && entry.get("fact").isTextual)
            List(entry.get("fact").asText()) // legacy single-fact shape
          else Nil
        if (facts.nonEmpty) out += (e.getKey -> facts)
      }
      out
    }.getOrElse(Map.empty)

  private def save(path: String, cache: Map[String, List[String]],
                   nowMs: Long): Unit =
    Try {
      val root = mapper.createObjectNode()
      cache.foreach { case (k, facts) =>
        val entry: ObjectNode = root.putObject(k)
        val arr = entry.putArray("facts")
        facts.foreach(arr.add)
        entry.put("ts", nowMs / 1000.0)
      }
      val p = Paths.get(path)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      Files.writeString(p, mapper.writerWithDefaultPrettyPrinter()
        .writeValueAsString(root))
    } // fail-soft: a cache write must never break the serving path

  /** Cached read (get_cached_city_fun_fact, utils.py:308-345): a cached
    * variant or None — `pick` defaults to newest (tests inject). */
  def cached(path: String, city: String,
             pick: List[String] => String = _.last): Option[String] = {
    val facts = load(path).getOrElse(city.trim.toLowerCase, Nil)
    if (facts.isEmpty) None else Some(pick(facts))
  }

  /** T3 — fast mode with async background refresh (web.py:234-239): when a
    * cached variant exists, answer from it IMMEDIATELY and schedule a
    * `fresh = true` regeneration on `executor` (FastAPI's
    * `background_tasks.add_task` seam); with a cold cache, fall through to
    * the synchronous path. Returns (fact, source) where source mirrors the
    * reference's response tag: "cache-fast" for the fast path, "generated"
    * otherwise. The executor is injected so servers choose their pool and
    * tests run single-threaded-deterministic; background failures are
    * swallowed exactly like the sync path (the cache file never breaks
    * serving). */
  def fastGet(path: String, city: String, supplier: () => Option[String],
              executor: java.util.concurrent.Executor,
              nowMs: Long = System.currentTimeMillis(),
              pick: List[String] => String = _.last): (Option[String], String) =
    cached(path, city, pick) match {
      case some @ Some(_) =>
        executor.execute(() =>
          Try(get(path, city, supplier, fresh = true, nowMs, pick)): Unit)
        (some, "cache-fast")
      case None =>
        (get(path, city, supplier, fresh = false, nowMs, pick), "generated")
    }

  /** Cache-or-generate (get_city_fun_fact): serve cached unless `fresh`;
    * on generation, append-if-new, keep the last 7, persist. Supplier or IO
    * failure falls back to cache. */
  def get(path: String, city: String, supplier: () => Option[String],
          fresh: Boolean = false, nowMs: Long = System.currentTimeMillis(),
          pick: List[String] => String = _.last): Option[String] = {
    val key = city.trim.toLowerCase
    val cache = load(path)
    val have = cache.getOrElse(key, Nil)
    if (!fresh && have.nonEmpty) Some(pick(have))
    else Try(supplier()).toOption.flatten match {
      case Some(fact) =>
        val updated = (if (have.contains(fact)) have
                       else (have :+ fact).takeRight(7))
        save(path, cache + (key -> updated), nowMs)
        Some(fact)
      case None => if (have.isEmpty) None else Some(pick(have))
    }
  }
}
