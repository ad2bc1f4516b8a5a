package graft.rdf

import org.apache.spark.sql.types._

/** Core RDF data model (SURVEY.md §1.3).
  *
  * The reference's single data structure is an in-memory rdflib
  * `Graph` — a mutable set of (subject, predicate, object) triples
  * (reference: src/export_from_omeka_s.py:30, src/transform_datamodel.py:83).
  * Here a graph is a columnar `DataFrame` with this flat schema
  * (struct-free so the DuckDB oracle can query the same parquet
  * relationally; a typed `Dataset[Triple]` view is available for the
  * Scala API). Set semantics = `dropDuplicates` after unions.
  */
case class RdfTerm(
    value: String,
    kind: String, // "iri" | "literal" | "bnode"
    lang: Option[String],
    datatype: Option[String])

case class Triple(
    graph: String,
    subject: String,
    subjectKind: String, // "iri" | "bnode"
    predicate: String,
    objValue: String,
    objKind: String,
    objLang: Option[String],
    objDatatype: Option[String])

object Model {
  /** Canonical flat column order for triple DataFrames. */
  val columns: Seq[String] = Seq(
    "graph", "subject", "subject_kind", "predicate",
    "obj_value", "obj_kind", "obj_lang", "obj_datatype")

  val schema: StructType = StructType(Seq(
    StructField("graph", StringType, nullable = false),
    StructField("subject", StringType, nullable = false),
    StructField("subject_kind", StringType, nullable = false),
    StructField("predicate", StringType, nullable = false),
    StructField("obj_value", StringType, nullable = false),
    StructField("obj_kind", StringType, nullable = false),
    StructField("obj_lang", StringType, nullable = true),
    StructField("obj_datatype", StringType, nullable = true)))
}

/** Well-known vocabulary IRIs used by the reference pipeline
  * (reference: src/transform_datamodel.py:41–49 resolves namespaces
  * dynamically from rdflib; a static catalog is all the engine needs).
  */
object Vocab {
  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val RdfFirst = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
  val RdfRest = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
  val RdfNil = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
  val DctermsTitle = "http://purl.org/dc/terms/title"
  val DctermsIdentifier = "http://purl.org/dc/terms/identifier"
  val DctermsRelation = "http://purl.org/dc/terms/relation"
  val SdoName = "https://schema.org/name"
  val SdoIdentifier = "https://schema.org/identifier"
  val SdoSameAs = "https://schema.org/sameAs"
  val CeoRijksmonumentnummer =
    "https://linkeddata.cultureelerfgoed.nl/def/ceo#rijksmonumentnummer"
  val CeoRijksmonument =
    "https://linkeddata.cultureelerfgoed.nl/def/ceo#Rijksmonument"
  val RdfsSubClassOf = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
  /** Synthetic class-chain namespace for the RDFS entailment query
    * (classes `C1..C51` derived from `part` sizes — FIXTURES.md
    * discipline: both engines derive the ontology by identical
    * string+int arithmetic). */
  val OntoClassNs = "http://ex.org/onto#C"
  /** Synthetic property-chain namespace (`P1..P51`), the
    * subPropertyOf analog of [[OntoClassNs]]. */
  val OntoPropNs = "http://ex.org/onto#P"
  val OmekaIsPublic = "http://omeka.org/s/vocabs/o#is_public"
  val OmekaResourceClass = "http://omeka.org/s/vocabs/o#resource_class"
  val OmekaResourceTemplate = "http://omeka.org/s/vocabs/o#resource_template"
  val XsdInteger = "http://www.w3.org/2001/XMLSchema#integer"
  val XsdBoolean = "http://www.w3.org/2001/XMLSchema#boolean"
  val XsdString = "http://www.w3.org/2001/XMLSchema#string"
  val RdfLangString =
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

  /** O12 — namespace resolution. The reference resolves namespace
    * modules dynamically by reflection on rdflib
    * (src/transform_datamodel.py:41–49); a static catalog of the
    * well-known vocabularies is the engine equivalent. Keys are the
    * names the env-config grammar uses (`SDO.name` etc.); values are
    * the namespace base IRIs. */
  val namespaces: Map[String, String] = Map(
    "rdf" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs" -> "http://www.w3.org/2000/01/rdf-schema#",
    "dcterms" -> "http://purl.org/dc/terms/",
    "sdo" -> "https://schema.org/",
    "xsd" -> "http://www.w3.org/2001/XMLSchema#",
    "o" -> "http://omeka.org/s/vocabs/o#",
    "ceo" -> "https://linkeddata.cultureelerfgoed.nl/def/ceo#",
    "owl" -> "http://www.w3.org/2002/07/owl#",
    "foaf" -> "http://xmlns.com/foaf/0.1/",
    "skos" -> "http://www.w3.org/2004/02/skos/core#")

  /** Resolve a namespace by the (case-insensitive) name used in env
    * config values, e.g. "SDO" → https://schema.org/. */
  def resolveNamespace(name: String): Option[String] =
    namespaces.get(name.toLowerCase)
}
