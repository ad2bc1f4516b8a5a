package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.rdf.Turtle

/** Paginated Omeka S export source (SURVEY.md O1/O2/O8; reference:
  * src/export_from_omeka_s.py:37–47,74–80).
  *
  * The reference GETs `api/items?format=turtle&page=N&per_page=100`
  * for N = 1..99 and stops at the first page whose body is ≤ 2 bytes.
  * Early-termination pagination is inherently sequential, so the page
  * loop stays on the driver (SURVEY §4) — but each fetched page is a
  * self-contained Turtle document, so *parsing* is distributed: pages
  * become a Dataset and [[Turtle.parse]] runs per-page on executors.
  * At real scale the fetch itself would be a snapshot already in
  * object storage; the fetch function is injectable precisely so the
  * HTTP loop is a swappable (and testable) seam.
  *
  * Error semantics: the reference aborts silently only on SSL errors
  * (export:86–89). The engine propagates fetch failures — a silent
  * half-export is worse than a failed job — but keeps the ≤2-byte
  * stop condition exactly.
  */
object OmekaSource {

  val MaxPages = 99 // range(1, 100), export_from_omeka_s.py:38
  val PerPage = 100 // export_from_omeka_s.py:39
  val StopBodySize = 2 // export_from_omeka_s.py:43

  /** O1 — fetch pages 1..99, stopping at the first body ≤ 2 bytes.
    * `fetch` maps a page number to the response body. */
  def fetchPages(fetch: Int => String): Seq[String] = {
    val pages = Seq.newBuilder[String]
    var page = 1
    var done = false
    while (!done && page <= MaxPages) {
      val body = fetch(page)
      if (body.length <= StopBodySize) done = true
      else { pages += body; page += 1 }
    }
    pages.result()
  }

  /** O1+O2+O3 — fetch, union pages, parse into a triple table with
    * set semantics. The page-concatenation union (O2) is the
    * Dataset-of-documents union; distinctness comes from
    * [[Turtle.parse]]'s dropDuplicates. */
  def load(spark: SparkSession, fetch: Int => String,
      graphId: String = "default"): DataFrame = {
    import spark.implicits._
    // pages are independent rdflib serializations: the same `_:N`
    // label on two pages is two different nodes, so blank-node labels
    // are scoped per page (identical re-fetched page text still dedups
    // — the scope prefix is a content hash)
    Turtle.parse(spark.createDataset(fetchPages(fetch)), graphId,
      scopeBnodeLabels = true)
  }

  /** O8 — namespace catalog fetch + bind: parse the `api-context`
    * JSON response (`{"@context": {prefix: iri, ...}}`), strip stray
    * backslashes from IRIs (reference: export_from_omeka_s.py:78),
    * keep only string-valued bindings. Uses Jackson (already on the
    * Spark classpath) rather than a hand-rolled JSON parser. */
  def parseApiContext(json: String): Map[String, String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val ctx = root.get("@context")
    if (ctx == null || !ctx.isObject) Map.empty
    else {
      val it = ctx.fields()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isTextual)
          b += (e.getKey -> e.getValue.asText.replace("\\", ""))
      }
      b.result()
    }
  }
}
