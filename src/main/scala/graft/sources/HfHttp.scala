package graft.sources

import java.io.{IOException, InputStream}
import java.net.HttpURLConnection

/** Auth + retry/backoff policy for the Hugging-Face HTTP legs
  * (reference: token auth on every hub call,
  * huggingface_source.rs:536-685; endpoint constants src/constants.rs:282-306).
  * [[HfManifest.fetchManifest]]/[[HfManifest.download]] route through
  * [[openStream]], which:
  *
  *   - attaches `Authorization: Bearer <token>` when a token is
  *     configured (explicitly, or from `HF_TOKEN` /
  *     `HUGGING_FACE_HUB_TOKEN` — the hub's published env vars);
  *   - FAILS FAST on 401/403 ([[AuthException]]) — retrying an
  *     unauthorized call inside the leg would only hammer the hub; the
  *     caller's coarser retry (e.g. [[ShardExpander]]'s per-shard
  *     attempts) decides whether to try again, so a transient
  *     401-then-authorized sequence still lands while a persistent one
  *     surfaces as the expander's terminal [[ShardExpander.failure]];
  *   - backs off and retries 429 (honoring a numeric `Retry-After`
  *     header, capped at [[Policy.maxBackoffMs]]) and transient 5xx /
  *     connection errors, with bounded exponential delays
  *     (base·2^attempt, capped) — deterministic, no jitter;
  *   - treats other 4xx as terminal ([[HttpStatusException]]).
  *
  * Non-HTTP URLs (file:, the specs' fixtures) pass through untouched.
  * The backoff sleeper is injectable so the spec pins the schedule
  * without wall-clock waits.
  */
object HfHttp {

  /** Terminal non-2xx response. */
  class HttpStatusException(val code: Int, val url: String)
    extends IOException(s"HTTP $code for $url")

  /** 401/403 — credentials missing, invalid, or not entitled (gated
    * dataset). Never retried inside the leg. */
  final class AuthException(code: Int, url: String)
    extends HttpStatusException(code, url)

  /** @param token    bearer token; None = anonymous
    * @param maxRetries retry budget for RETRIABLE failures (429/5xx/IO)
    * @param baseBackoffMs first delay; doubles per attempt
    * @param maxBackoffMs  delay cap (also caps honored Retry-After)
    * @param sleep    injectable for specs */
  case class Policy(
      token: Option[String] = None,
      maxRetries: Int = 3,
      baseBackoffMs: Long = 250L,
      maxBackoffMs: Long = 4000L,
      sleep: Long => Unit = Thread.sleep) {
    def backoffMs(attempt: Int): Long =
      math.min(maxBackoffMs, baseBackoffMs << math.min(attempt, 20))
  }

  /** The default policy: token from the hub's published env vars. */
  def fromEnv: Policy = Policy(
    token = sys.env.get("HF_TOKEN").orElse(sys.env.get("HUGGING_FACE_HUB_TOKEN"))
      .map(_.trim).filter(_.nonEmpty))

  private def isRetriable(code: Int): Boolean = code == 429 || code >= 500

  /** Open `url` under the policy and return the response body stream.
    * Throws [[AuthException]] on 401/403 (immediately),
    * [[HttpStatusException]] on other terminal 4xx, and the last error
    * once the retry budget is exhausted on 429/5xx/IO failures. */
  def openStream(url: String, p: Policy): InputStream = {
    var attempt = 0
    while (true) {
      val conn = new java.net.URL(url).openConnection()
      p.token.foreach(t => conn.setRequestProperty("Authorization", s"Bearer $t"))
      try {
        conn match {
          case h: HttpURLConnection =>
            h.setInstanceFollowRedirects(true)
            val code = h.getResponseCode
            if (code / 100 == 2) return h.getInputStream
            // drain+close the error body so the connection can be reused
            Option(h.getErrorStream).foreach { es =>
              try { es.readAllBytes(); es.close() } catch { case _: IOException => }
            }
            if (code == 401 || code == 403) throw new AuthException(code, url)
            if (!isRetriable(code)) throw new HttpStatusException(code, url)
            if (attempt >= p.maxRetries) throw new HttpStatusException(code, url)
            val retryAfterMs = Option(h.getHeaderField("Retry-After"))
              .flatMap(v => scala.util.Try(v.trim.toLong * 1000L).toOption)
              .map(ms => math.min(ms, p.maxBackoffMs))
            p.sleep(retryAfterMs.getOrElse(p.backoffMs(attempt)))
            attempt += 1
          case _ => return conn.getInputStream // file: etc — no status line
        }
      } catch {
        case e: HttpStatusException => throw e
        case e: IOException => // connect/read failures are transient
          if (attempt >= p.maxRetries) throw e
          p.sleep(p.backoffMs(attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
