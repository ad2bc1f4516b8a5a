package graft.sources

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import graft.rdf.Turtle

/** Default HTTP clients for the pipeline's three fetch seams —
  * previously injection-only, which left a user pointing the engine
  * at a live Omeka S endpoint to write their own client. Built on
  * JDK `java.net.http` (no extra dependency), mirroring the
  * reference's operational parameters:
  *
  *  - O1 page fetch: `{base}api/items?format=turtle&page=N&per_page=100`
  *    with a 200 s timeout (export_from_omeka_s.py:38–40);
  *  - O8 namespace catalog: `{base}api-context`, same timeout
  *    (export_from_omeka_s.py:74);
  *  - O14 enrichment: one GET per distinct key with a 200 s timeout
  *    (transform_datamodel.py:94–98), response parsed as a Turtle
  *    document.
  *
  * Error semantics follow the engine contract (OmekaSource Scaladoc):
  * non-2xx and transport failures THROW — for the page loop that
  * fails the job (a silent half-export is worse), while the
  * enrichment seam sits behind `Enrichment.fetchAll`'s best-effort
  * catch, reproducing the reference's warn-and-skip
  * (transform_datamodel.py:100–101).
  *
  * The driver-side loop uses [[OmekaHttp]] directly; the
  * executor-side enrichment fetcher is [[HttpMonumentFetcher]], a
  * `Serializable` function whose `HttpClient` is rebuilt lazily per
  * executor (the client itself is not serializable).
  */
final class OmekaHttp(baseUri: String, timeoutSeconds: Long = 200L) {
  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSeconds))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  def get(url: String): String = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSeconds)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new IOException(s"GET $url returned ${resp.statusCode()}")
    resp.body()
  }

  /** O1 — one export page (export_from_omeka_s.py:38–39). Plug into
    * `OmekaSource.fetchPages` / `Pipeline.run(fetchPage = ...)`. */
  def fetchPage(page: Int): String =
    get(s"${baseUri}api/items?format=turtle&page=$page" +
      s"&per_page=${OmekaSource.PerPage}")

  /** O8 — the `api-context` JSON (export_from_omeka_s.py:74); parse
    * with `OmekaSource.parseApiContext`. */
  def fetchApiContext(): String = get(baseUri + "api-context")
}

/** O14 executor-side enrichment fetch: GET `urlPrefix` + URL-encoded
  * key, parse the body as one Turtle document (the reference appends
  * each response to `enrichments.ttl` and re-parses,
  * transform_datamodel.py:94–102). Blank-node labels are
  * document-scoped: each response is an independent serialization.
  *
  * The reference's endpoint shape (public, transform_datamodel.py:94)
  * is `...rest-api-rijksmonumenten/run?rijksmonumentnummer=` + key.
  */
final case class HttpMonumentFetcher(urlPrefix: String,
    timeoutSeconds: Long = 200L)
    extends (String => Seq[Turtle.FlatTriple]) with Serializable {

  @transient private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSeconds))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  override def apply(key: String): Seq[Turtle.FlatTriple] = {
    val url = urlPrefix +
      java.net.URLEncoder.encode(key, java.nio.charset.StandardCharsets.UTF_8)
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSeconds)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new IOException(s"GET $url returned ${resp.statusCode()}")
    Turtle.parseDocument(resp.body(), scopeBnodeLabels = true)
  }
}
