package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper

/** S1–S3 — the reference's paginated REST ingest (main.py:42-101),
  * driver-side by design: a bounded cursor API with a 1 req/s ceiling is
  * not a distributed-scan problem, and the raw layer must be byte-exact
  * API output (S4), not Spark-normalized rows.
  *
  * Pluggable `PageClient` so tests run against a stub (zero egress);
  * pluggable `sleep` so retry/backoff logic is testable without wall
  * clock. Semantics per the reference:
  *   - HTTP 429 → back off `backoffMs` (15 s) and retry the SAME url
  *     (main.py:67-71);
  *   - other non-200 → abort the loop, keep what we have (main.py:97-99);
  *   - empty `results` → clean stop (main.py:77-79);
  *   - 1 s sleep between successful pages (main.py:94-95);
  *   - resume ledger: pages already on disk are skipped by re-listing
  *     `*_page_N.json` filenames (main.py:51-63).
  */
object Fetcher {

  final case class Response(status: Int, body: String)

  /** The single network seam. Production impl wraps java.net.http. */
  trait PageClient { def get(url: String, headers: Map[String, String]): Response }

  final case class Report(pagesFetched: Int, pagesSkipped: Int,
      records: Long, stoppedBecause: String)

  private val mapper = new ObjectMapper

  /** Resume ledger: page numbers already present as files (S3). */
  def existingPages(outDir: Path, slug: String, table: String): Set[Int] = {
    val re = s"^${java.util.regex.Pattern.quote(s"${slug}_${table}_page_")}(\\d+)\\.json$$".r
    if (!Files.isDirectory(outDir)) Set.empty
    else {
      val stream = Files.list(outDir) // must be closed: holds a DirectoryStream fd
      try stream.iterator.asScala
        .flatMap(p => re.findFirstMatchIn(p.getFileName.toString).map(_.group(1).toInt))
        .toSet
      finally stream.close()
    }
  }

  def fetchAll(
      client: PageClient,
      baseUrl: String,
      token: String,
      outDir: Path,
      slug: String,
      table: String,
      maxPages: Int = 1000,
      sleep: Long => Unit = Thread.sleep,
      pageSleepMs: Long = 1000,
      backoffMs: Long = 15000,
      maxConsecutive429: Int = 10): Report = {

    Files.createDirectories(outDir)
    val headers = Map("Authorization" -> s"Token $token")
    val done = existingPages(outDir, slug, table)
    var page = 1
    var url: String = baseUrl
    var fetched = 0
    var skipped = 0
    var records = 0L
    var why = "max_pages"
    var consecutive429 = 0

    while (url != null && page <= maxPages) {
      if (done.contains(page)) {
        // resume: already on disk; advance the cursor without a network
        // round-trip (the reference rebuilds ?page=N the same way).
        skipped += 1
        page += 1
        url = pageUrl(baseUrl, page)
      } else {
        // transport failures (the only way PageClient can signal a
        // network error is to throw) abort like the reference's
        // except RequestException (main.py:97-99): keep partial progress
        val resp = try client.get(url, headers) catch {
          case e: Exception => Response(-1, e.toString)
        }
        if (resp.status == -1) {
          why = s"transport_error: ${resp.body}"
          url = null
        } else if (resp.status == 429) {
          // retry same url, but bounded: a permanently rate-limited (or
          // revoked) token must not loop forever — page never advances
          // on this path, so maxPages alone cannot terminate it
          consecutive429 += 1
          if (consecutive429 >= maxConsecutive429) {
            why = "rate_limited"
            url = null
          } else sleep(backoffMs)
        } else if (resp.status != 200) {
          why = s"http_${resp.status}"
          url = null
        } else {
          consecutive429 = 0
          // a 200 with an unparseable body stops the loop gracefully,
          // keeping the Report and the pages already on disk — the
          // reference gets this for free (JSONDecodeError is a
          // RequestException, main.py:97-99)
          val root = try mapper.readTree(resp.body) catch {
            case _: com.fasterxml.jackson.core.JsonProcessingException => null
          }
          val results = if (root == null) null else root.path("results")
          if (root == null) {
            why = "bad_json"
            url = null
          } else if (!results.isArray || results.size == 0) {
            why = "exhausted"
            url = null
          } else {
            // S4: raw layer is the verbatim API body — byte fidelity.
            Files.write(outDir.resolve(s"${slug}_${table}_page_$page.json"),
              resp.body.getBytes(StandardCharsets.UTF_8))
            fetched += 1
            records += results.size
            page += 1
            val next = root.path("next")
            url = if (next.isTextual) next.asText else null
            if (url == null && why == "max_pages") why = "exhausted"
            sleep(pageSleepMs)
          }
        }
      }
    }
    Report(fetched, skipped, records, why)
  }

  private def pageUrl(base: String, page: Int): String = {
    val sep = if (base.contains("?")) "&" else "?"
    s"$base${sep}page=$page"
  }
}
