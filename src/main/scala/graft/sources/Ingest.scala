package graft.sources

/** S3 — ingest retry/backoff behind the client interface, mirroring the
  * reference's `_request_json` loop (fetch.py:21-37): `retries` attempts,
  * 0.8 s initial delay growing ×1.6 after every failure (including the
  * last, as the reference does), then a `NetworkError` wrapping the final
  * cause. Driver-side by design: ingest talks to one endpoint per city, the
  * distributed engine starts at the raw zone.
  */
object Ingest {

  class NetworkError(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)

  /** Run `f` (given the 1-based attempt number) with retry/backoff. `sleep`
    * is injectable so specs assert the delay schedule without waiting. */
  def retry[T](retries: Int = 3, delay0Ms: Long = 800, factor: Double = 1.6,
               sleep: Long => Unit = Thread.sleep)(f: Int => T): T = {
    require(retries >= 1, s"retries must be >= 1, got $retries")
    var delay = delay0Ms
    var last: Throwable = null
    var attempt = 1
    while (attempt <= retries) {
      try return f(attempt)
      catch {
        // NonFatal only: the reference catches httpx.HTTPError, not
        // interrupts/OOM — fatal errors and InterruptedException propagate
        case scala.util.control.NonFatal(e) =>
          last = e
          sleep(delay)
          delay = (delay * factor).toLong
      }
      attempt += 1
    }
    throw new NetworkError(s"Gagal setelah $retries percobaan: ${last.getMessage}", last)
  }
}
