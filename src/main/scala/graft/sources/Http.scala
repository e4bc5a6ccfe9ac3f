package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** S1 — HTTP fetch with retry/backoff, semantics matching the reference
  * `fetchWithRetry` (task.ts:382-407): `retries + 1` total attempts,
  * per-attempt timeout, non-2xx throws `HTTP <status>`, linear backoff
  * `1000 * (attempt + 1)` ms between attempts (none after the last).
  * Used on the driver for feed planning and inside DSv2 partition
  * readers/writers for the per-alert fan-out — which turns the
  * reference's SERIAL per-alert loop (task.ts:626) into
  * partition-parallel I/O.
  */
object Http {

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  def fetchWithRetry(url: String, headers: Map[String, String],
      timeoutMs: Long, retries: Int,
      method: String = "GET", body: Option[String] = None,
      sleep: Long => Unit = Thread.sleep): String = {
    val maxRetries = math.max(0, retries) // negative would loop forever
    var attempt = 0
    while (true) {
      try {
        return fetchOnce(url, headers, timeoutMs, method, body)
      } catch {
        // NonFatal only: an interrupt (task kill) or VM error must
        // propagate immediately, not sleep through the backoff
        case scala.util.control.NonFatal(e) =>
          if (attempt >= maxRetries) throw e
          sleep(1000L * (attempt + 1))
          attempt += 1
      }
    }
    throw new IllegalStateException("fetchWithRetry: unreachable")
  }

  private def fetchOnce(url: String, headers: Map[String, String],
      timeoutMs: Long, method: String, body: Option[String]): String = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs))
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = (method match {
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body.getOrElse("")))
      case _ => b.GET()
    }).build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (res.statusCode() < 200 || res.statusCode() >= 300)
      throw new RuntimeException(s"HTTP ${res.statusCode()}")
    res.body()
  }

  /** Parse the `headers` option ("K1=V1;K2=V2") of the connectors. */
  def parseHeaders(opt: String): Map[String, String] =
    opt.split(";").iterator.map(_.trim).filter(_.nonEmpty).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k.trim -> v.trim)
        case _ => None
      }
    }.toMap
}

/** P1-P3 link extraction (reference task.ts:555-581). The pattern
  * strings and predicate here are THE canonical definitions — the
  * declarative `CapPipeline.parseFeedLinks` references these same vals,
  * so connector planning and the pipeline cannot desynchronize.
  * `extract` is the pure driver-side form with order-preserving
  * distinct like JS `[...new Set(links)]` (task.ts:580).
  */
object FeedLinks {
  /** RSS `<link>text</link>` with the reference's {1,1000} ReDoS cap. */
  val RssLinkPattern = "<link>([^<]{1,1000})</link>"
  /** Atom `<link ... href="...">`, same length cap. */
  val AtomLinkPattern = "<link[^>]+href=[\"']([^\"']{1,1000})[\"'][^>]*>"

  /** P2 predicate: keep links containing `/cap/` or `alert`. */
  def isCapAlertLink(l: String): Boolean = l.contains("/cap/") || l.contains("alert")

  private val RssLink = RssLinkPattern.r
  private val AtomLink = AtomLinkPattern.r

  def extract(feedText: String): Seq[String] = {
    val all =
      RssLink.findAllMatchIn(feedText).map(_.group(1).trim) ++
      AtomLink.findAllMatchIn(feedText).map(_.group(1).trim)
    all.filter(isCapAlertLink).distinct.toSeq
  }
}
