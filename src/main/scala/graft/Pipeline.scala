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

  final case class Result(triples: DataFrame, conf: EtlConf)

  /** Run export (EP1) + transform (EP2) end-to-end, returning the
    * final triple table (call `.write` / [[Turtle.serialize]] on it —
    * the sink's `overwrite` mode mirrors the reference's
    * overwrite-into-named-graph publish, yml:87). */
  def run(spark: SparkSession,
      fetchPage: Int => String,
      fetchMonument: String => Seq[Turtle.FlatTriple],
      env: Map[String, String],
      graphId: String = "default"): Result = {
    val conf = EtlConf.fromEnv(env)
    val raw = OmekaSource.load(spark, fetchPage, graphId)   // O1–O3
    // materialized once: consumed by the key scan AND the enrichment
    // union (the reference's own EP1→EP2 file hand-off, yml:33–54)
    val clean = RdfOps.cleanExport(raw).localCheckpoint()   // O4–O7
    val keys = RdfOps.enrichmentKeys(clean)                 // O14 keys
    val fetched = Enrichment.fetchAll(keys, fetchMonument)  // O14 fetch
    val enriched = RdfOps.enrich(clean, fetched)            // O15+O16
    val mapped = RdfOps.applyMapping(enriched, conf.mapping) // O17
    val ttl = RdfOps.applyFilter(mapped, conf.filterList)   // O18
    Result(ttl, conf)
  }
}
