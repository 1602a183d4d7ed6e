package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import java.time.Duration

/** Request-construction contract of the production client — no network:
  * the built java.net.http.HttpRequest is inspected directly. */
class HttpPageClientSpec extends AnyFunSuite {

  test("builds a GET with the exact url, auth header and timeout") {
    val req = HttpPageClient.buildRequest(
      "http://api.test/data/?page=2",
      Map("Authorization" -> "Token tok", "Accept" -> "application/json"),
      Duration.ofSeconds(30))
    assert(req.method == "GET")
    assert(req.uri.toString == "http://api.test/data/?page=2")
    assert(req.headers.firstValue("Authorization").get == "Token tok")
    assert(req.headers.firstValue("Accept").get == "application/json")
    assert(req.timeout.get == Duration.ofSeconds(30))
    assert(req.bodyPublisher.isEmpty) // GET carries no body
  }

  test("query strings with existing params survive URI construction") {
    val req = HttpPageClient.buildRequest(
      "https://api.test/api/v1/dataset/slug/tbl/data/?format=json&page=7",
      Map.empty, Duration.ofSeconds(5))
    assert(req.uri.getQuery == "format=json&page=7")
  }
}
