package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import scala.collection.mutable

/** S1–S3 against a stub client: pagination, 429 backoff, resume ledger,
  * empty-results termination, abort-on-error. No network, no Spark. */
class FetcherSpec extends AnyFunSuite {

  private def page(n: Int, total: Int, records: Int = 2): String = {
    val next = if (n < total) s""""http://api.test/data/?page=${n + 1}"""" else "null"
    val results = (0 until records)
      .map(i => s"""{"ano": 2011, "mes": 1, "valor": "$n.$i"}""").mkString(",")
    s"""{"count": ${total * records}, "next": $next, "previous": null, "results": [$results]}"""
  }

  private class StubClient(pages: Map[String, Fetcher.Response]) extends Fetcher.PageClient {
    val calls = mutable.ArrayBuffer.empty[String]
    def get(url: String, headers: Map[String, String]): Fetcher.Response = {
      assert(headers("Authorization") == "Token tok")
      calls += url
      pages.getOrElse(url, Fetcher.Response(404, ""))
    }
  }

  private def newDir(): Path = Files.createTempDirectory("fetcher")

  test("follows next cursor, writes one verbatim file per page, stops when exhausted") {
    val base = "http://api.test/data/"
    val client = new StubClient(Map(
      base -> Fetcher.Response(200, page(1, 3)),
      s"$base?page=2" -> Fetcher.Response(200, page(2, 3)),
      s"$base?page=3" -> Fetcher.Response(200, page(3, 3))))
    val out = newDir()
    val rep = Fetcher.fetchAll(client, base, "tok", out, "gastos-diretos", "gastos",
      sleep = _ => ())
    assert(rep == Fetcher.Report(3, 0, 6, "exhausted"))
    assert(Files.readString(out.resolve("gastos-diretos_gastos_page_2.json")) == page(2, 3))
  }

  test("429 backs off and retries the SAME url") {
    val base = "http://api.test/data/"
    var first = true
    val slept = mutable.ArrayBuffer.empty[Long]
    val client = new Fetcher.PageClient {
      def get(url: String, headers: Map[String, String]): Fetcher.Response =
        if (first) { first = false; Fetcher.Response(429, "") }
        else Fetcher.Response(200, page(1, 1))
    }
    val rep = Fetcher.fetchAll(client, base, "tok", newDir(), "s", "t",
      sleep = slept += _, backoffMs = 15000, pageSleepMs = 1000)
    assert(rep.pagesFetched == 1)
    assert(slept.toSeq == Seq(15000L, 1000L)) // backoff then inter-page sleep
  }

  test("resume ledger skips pages already on disk without a network call") {
    val base = "http://api.test/data/"
    val out = newDir()
    Files.writeString(out.resolve("s_t_page_1.json"), page(1, 2))
    val client = new StubClient(Map(
      s"$base?page=2" -> Fetcher.Response(200, page(2, 2))))
    val rep = Fetcher.fetchAll(client, base, "tok", out, "s", "t", sleep = _ => ())
    assert(rep.pagesSkipped == 1 && rep.pagesFetched == 1)
    assert(client.calls.toSeq == Seq(s"$base?page=2")) // page 1 never re-fetched
  }

  test("empty results terminates cleanly; http error aborts with reason") {
    val base = "http://api.test/data/"
    val emptyClient = new StubClient(Map(
      base -> Fetcher.Response(200, """{"count":0,"next":null,"previous":null,"results":[]}""")))
    assert(Fetcher.fetchAll(emptyClient, base, "tok", newDir(), "s", "t",
      sleep = _ => ()).stoppedBecause == "exhausted")
    val errClient = new StubClient(Map(base -> Fetcher.Response(500, "boom")))
    val rep = Fetcher.fetchAll(errClient, base, "tok", newDir(), "s", "t", sleep = _ => ())
    assert(rep.stoppedBecause == "http_500" && rep.pagesFetched == 0)
  }

  test("a 200 with a malformed JSON body stops gracefully, keeping fetched pages") {
    val base = "http://api.test/data/"
    val out = newDir()
    val client = new StubClient(Map(
      base -> Fetcher.Response(200, page(1, 2)),
      s"$base?page=2" -> Fetcher.Response(200, """{"count": 4, "next": nope}""")))
    val rep = Fetcher.fetchAll(client, base, "tok", out, "s", "t", sleep = _ => ())
    assert(rep.stoppedBecause == "bad_json")
    assert(rep.pagesFetched == 1) // page 1 survived
    assert(Files.exists(out.resolve("s_t_page_1.json")))
  }

  test("maxPages caps the crawl") {
    val base = "http://api.test/data/"
    val client = new StubClient((1 to 5).map { n =>
      val url = if (n == 1) base else s"$base?page=$n"
      url -> Fetcher.Response(200, page(n, 5))
    }.toMap)
    val rep = Fetcher.fetchAll(client, base, "tok", newDir(), "s", "t",
      maxPages = 2, sleep = _ => ())
    assert(rep.pagesFetched == 2 && rep.stoppedBecause == "max_pages")
  }
}
