package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Production [[Fetcher.PageClient]] over java.net.http — the concrete
  * form of the reference's requests.get (main.py:66). Synchronous GET,
  * charset-honest string body, redirects followed. Transport failures
  * (connect/read timeouts, DNS) propagate as exceptions, which
  * Fetcher.fetchAll maps to its transport_error stop — identical to the
  * reference's except RequestException path (main.py:97-99).
  *
  * CI never constructs one (zero-egress environment); FetcherSpec drives
  * the loop through stubs. HttpPageClientSpec asserts the request
  * construction (URL, headers, timeout) against a local recording
  * server-less check of the built HttpRequest.
  */
final class HttpPageClient(
    connectTimeout: Duration = Duration.ofSeconds(10),
    requestTimeout: Duration = Duration.ofSeconds(30)) extends Fetcher.PageClient {

  private val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(connectTimeout)
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  override def get(url: String, headers: Map[String, String]): Fetcher.Response = {
    // no-arg ofString honors the response's declared charset
    // (Content-Type; UTF-8 only as the fallback) — forcing UTF-8 would
    // mojibake a correctly-labelled non-UTF-8 body before it ever
    // reached the raw layer
    val resp = client.send(HttpPageClient.buildRequest(url, headers, requestTimeout),
      HttpResponse.BodyHandlers.ofString())
    Fetcher.Response(resp.statusCode(), resp.body())
  }
}

object HttpPageClient {
  /** Request construction, separated so the spec can assert URL/header/
    * timeout shape without any network. */
  private[ingest] def buildRequest(url: String, headers: Map[String, String],
      timeout: Duration): HttpRequest = {
    val b = HttpRequest.newBuilder(URI.create(url)).timeout(timeout).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    b.build()
  }
}
