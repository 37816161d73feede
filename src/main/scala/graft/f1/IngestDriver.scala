package graft.f1

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.DurationInt
import scala.util.matching.Regex

/** Ingest driver — the ADF pipeline graph (`00 - Master` → `01/02/03/04`,
  * SURVEY.md §2.1 S1-S5/S11 and §2.10 C1-C10) as plain Scala control flow.
  * HTTP sits behind [[PageFetcher]] so tests run on canned pages
  * (zero-egress environment) and production swaps in [[HttpPageFetcher]].
  *
  * Reference operating parameters preserved (BASELINE.md): page size 1000,
  * 10 ms request spacing, 100 s request timeout, 1 retry / 30 s, laps only
  * for seasons ≥ 1996, pitstops ≥ 2012, sequential endpoint fan-out but
  * parallel per-season reliant staging.
  */
trait PageFetcher {
  def fetch(url: String): String
}

/** Production fetcher: 100 s timeout, 1 retry after 30 s (C10). */
final class HttpPageFetcher(
    requestTimeout: Duration = Duration.ofSeconds(100),
    retries: Int = 1,
    retryIntervalMs: Long = 30000L) extends PageFetcher {
  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(requestTimeout).build()

  override def fetch(url: String): String = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= retries) {
      try {
        val req = HttpRequest.newBuilder(URI.create(url))
          .timeout(requestTimeout).GET().build()
        return client.send(req, HttpResponse.BodyHandlers.ofString()).body()
      } catch {
        case t: Throwable =>
          last = t; attempt += 1
          if (attempt <= retries) Thread.sleep(retryIntervalMs)
      }
    }
    throw last
  }
}

/** Page sink (S5): raw JSON passthrough to the bronze layer. */
trait PageSink {
  def write(relativePath: String, content: String): Unit
}

final class LocalPageSink(rootDir: String) extends PageSink {
  override def write(relativePath: String, content: String): Unit = {
    val p = Paths.get(rootDir, relativePath)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
  }
}

final class ErgastIngest(
    fetcher: PageFetcher,
    sink: PageSink,
    baseUrl: String = "https://ergast.com/api/f1",
    limit: Int = 1000,           // 01 - Stage Full Datasets.json:356-358
    requestIntervalMs: Long = 10 // RestSource requestInterval, :92
) {
  private val totalRe: Regex = """"total"\s*:\s*"?(\d+)"?""".r

  /** S2: first-page probe for MRData.total (sizes the pagination loop). */
  def totalRecords(endpoint: String): Long = {
    val body = fetcher.fetch(s"$baseUrl/$endpoint.json?limit=$limit&offset=0")
    totalRe.findFirstMatchIn(body).map(_.group(1).toLong)
      .getOrElse(sys.error(s"no MRData.total in response for $endpoint"))
  }

  /** S1+S3: page through one endpoint, landing `<name>_<pageNo>.json`
    * under `<datasetDir>/` (naming per `01 - Stage Full Datasets.json:139`).
    * Returns the number of pages written.
    */
  def stageEndpoint(endpoint: String, datasetDir: String): Int = {
    val total = totalRecords(endpoint)
    val fileBase = endpoint.replace("/", "_")
    var offset = 0L
    var page = 1
    while (offset < total || page == 1) { // always land page 1, even empty
      val body = fetcher.fetch(s"$baseUrl/$endpoint.json?limit=$limit&offset=$offset")
      sink.write(s"$datasetDir/${fileBase}_$page.json", body)
      offset += limit
      page += 1
      if (offset < total) Thread.sleep(requestIntervalMs)
    }
    page - 1
  }

  /** The `00 - Master` + `02/03/04` graph:
    *   - sequential per-endpoint staging (C3, isSequential=true);
    *   - schedule per season, then laps (seasons ≥ 1996) and pitstops
    *     (seasons ≥ 2012) per race round (C5 guards), parallel per season
    *     (C3, isSequential=false on `02`).
    * `races(year)` supplies the round numbers (the reference re-reads its
    * staged schedule files for this; injected here for testability).
    */
  def run(runStamp: String, endpoints: Seq[String], seasons: Seq[Int],
      races: Int => Seq[Int])(implicit ec: ExecutionContext): Unit = {
    endpoints.foreach { ep => // C3 sequential
      stageEndpoint(ep, s"$runStamp/$ep")
    }
    val perSeason = seasons.map { yr => Future { // C3 parallel (02:22)
      stageEndpoint(yr.toString, s"$runStamp/schedule")
      if (yr >= 1996) races(yr).foreach { round => // C5 laps guard
        stageEndpoint(s"$yr/$round/laps", s"$runStamp/laps")
      }
      if (yr >= 2012) races(yr).foreach { round => // C5 pitstops guard
        stageEndpoint(s"$yr/$round/pitstops", s"$runStamp/pitstops")
      }
    }}
    Await.result(Future.sequence(perSeason), 12.hours) // 12 h activity timeout
  }
}

object IngestConfig {
  /** S11: endpoint list from a JSON config file (the reference's
    * `config/ergast_FullDatasets.json` Lookup, `00 - Master.json:88-127`).
    */
  def endpoints(configPath: String): Seq[String] = {
    val body = new String(Files.readAllBytes(Paths.get(configPath)), StandardCharsets.UTF_8)
    """"endPoint"\s*:\s*"([^"]+)"""".r
      .findAllMatchIn(body).map(_.group(1)).toSeq
  }
}
