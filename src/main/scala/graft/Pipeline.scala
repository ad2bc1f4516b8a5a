package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.EtlConf
import graft.rdf.{Enrichment, RdfOps, Turtle}
import graft.sources.OmekaSource

/** O19 — the whole reference ETL as ONE Spark application (reference:
  * the 3-job GitHub Actions DAG with file-artifact hand-offs,
  * muurschilderingendatabase-etl.yml:16–91, and EP1/EP2 of SURVEY §3).
  *
  * Where the reference crosses process/machine boundaries (HTTP fetch
  * → file → parse → file → artifact upload → download → transform →
  * file → publish), the engine is a single lazy dataflow:
  *
  *   pages → parse → clean(O4–O7) → enrich(O14–O16) → rename(O17)
  *         → delete(O18) → sink (Turtle or parquet)
  *
  * Actions happen only at the sink (plus optional count() metrics).
  * Both fetch functions are injectable seams (driver-side page loop,
  * executor-side key lookups).
  */
object Pipeline {

  final case class Result(triples: DataFrame, conf: EtlConf,
      prefixes: Map[String, String])

  /** Run export (EP1) + transform (EP2) end-to-end, returning the
    * final triple table plus the namespace bindings to publish it
    * under. `fetchApiContext` is the O8 seam (the reference GETs
    * `api-context` and binds every prefix before serializing,
    * export_from_omeka_s.py:74–80): fetched bindings override the
    * static catalog and flow into [[publish]]'s Turtle headers. */
  def run(spark: SparkSession,
      fetchPage: Int => String,
      fetchMonument: String => Seq[Turtle.FlatTriple],
      env: Map[String, String],
      graphId: String = "default",
      fetchApiContext: Option[() => String] = None): Result = {
    val conf = EtlConf.fromEnv(env)
    val prefixes = rdf.Vocab.namespaces ++                  // O8 bind
      fetchApiContext.map(f => OmekaSource.parseApiContext(f()))
        .getOrElse(Map.empty)
    val raw = OmekaSource.load(spark, fetchPage, graphId)   // O1–O3
    // materialized once: consumed by the key scan AND the enrichment
    // union (the reference's own EP1→EP2 file hand-off, yml:33–54)
    val clean = RdfOps.cleanExport(raw).localCheckpoint()   // O4–O7
    val keys = RdfOps.enrichmentKeys(clean)                 // O14 keys
    val fetched = Enrichment.fetchAll(keys, fetchMonument)  // O14 fetch
    val enriched = RdfOps.enrich(clean, fetched)            // O15+O16
    val mapped = RdfOps.applyMapping(enriched, conf.mapping) // O17
    val ttl = RdfOps.applyFilter(mapped, conf.filterList)   // O18
    Result(ttl, conf, prefixes)
  }

  /** [[run]] wired to the default HTTP clients
    * ([[sources.OmekaHttp]] / [[sources.HttpMonumentFetcher]]) — the
    * turn-key form for a live Omeka S deployment, matching the
    * reference's endpoints and 200 s timeouts. `enrichmentUrlPrefix`
    * is the per-key GET prefix (the reference's is the public
    * rest-api-rijksmonumenten `run?rijksmonumentnummer=` URL,
    * transform_datamodel.py:94). */
  def runHttp(spark: SparkSession, baseUri: String,
      enrichmentUrlPrefix: String, env: Map[String, String],
      graphId: String = "default"): Result = {
    val http = new sources.OmekaHttp(baseUri)
    run(spark, http.fetchPage, sources.HttpMonumentFetcher(
      enrichmentUrlPrefix), env, graphId,
      fetchApiContext = Some(() => http.fetchApiContext()))
  }

  /** O19's closing sink — the reference ends in an overwrite-publish
    * into a named graph (muurschilderingendatabase-etl.yml:87); here
    * that is `mode("overwrite")` into a store path:
    *  - `format = "parquet"`: the cluster-scale triple-table publish
    *    (what a downstream Spark/DuckDB consumer reads);
    *  - `format = "turtle"`: the reference's wire-format parity via
    *    the `turtle` DSv2 writer, one self-contained document per
    *    partition with the fetched O8 prefixes in the `@prefix`
    *    headers; `singleFile = true` coalesces to the reference's
    *    one-file export shape (driver-volume bound — leave false at
    *    scale).
    *
    * Turtle cannot encode the graph column: a turtle publish is
    * per-graph — the reference's own model, one export = one named
    * graph — and a re-read attaches the reader's `graph` option
    * (default "default"). Multi-graph results publish with
    * `format = "trig"` (Turtle's graph-aware superset: non-default
    * graphs emit in `GRAPH <id> { … }` blocks, and the same `turtle`
    * reader parses them back with the graph column intact) or to
    * parquet. `format = "nt"` publishes line-splittable N-Triples
    * (absolute IRIs, no prefix header; like turtle it drops the
    * graph column) — the interchange form downstream line-oriented
    * consumers can split arbitrarily.
    */
  def publish(result: Result, path: String, format: String = "parquet",
      singleFile: Boolean = false): Unit = {
    val df =
      if (singleFile) result.triples.coalesce(1) else result.triples
    format match {
      case "parquet" => df.write.mode("overwrite").parquet(path)
      case "turtle" | "trig" | "nt" => df.write.format("turtle")
        .option("prefixes",
          sources.TurtleDataSource.prefixesOption(result.prefixes))
        .option("syntax", format)
        .mode("overwrite").save(path)
      case other =>
        throw new IllegalArgumentException(s"unknown publish format $other")
    }
  }
}
