package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The rdflib-`Graph` API surface over a columnar triple table —
  * what lets a user of the reference switch call-for-call
  * (SURVEY.md §1.3 mapping table; reference usages:
  * src/export_from_omeka_s.py:30,53; src/transform_datamodel.py:83–125).
  *
  * | rdflib                          | here                         |
  * |---------------------------------|------------------------------|
  * | `for s,p,o in graph`            | [[df]] / typed [[ds]]        |
  * | `graph.triples((s, p, o))`      | [[triples]] pattern filter   |
  * | `(s, p, o) in graph`            | [[contains]]                 |
  * | `graph.add(t)`                  | [[add]] (set semantics)      |
  * | `graph.remove((s, p, o))`       | [[remove]] pattern anti-filter |
  * | `len(graph)`                    | [[size]]                     |
  * | `g1 + g2` (set union)           | [[union]]                    |
  *
  * Immutable: every mutation returns a new graph (Spark DataFrames
  * are immutable — which also retires the reference's
  * mutation-during-iteration hazard, bug B3).
  *
  * Scale notes: [[add]]/[[union]] defer the set-semantics dedup to
  * one `dropDuplicates` per call — batch additions before calling;
  * [[contains]] is an action (use joins, not per-triple membership
  * loops, in dataflow code — the per-triple loop is exactly the
  * reference pattern this engine replaces).
  */
final class TripleGraph private (val df: DataFrame) {

  /** Pattern-matched triple scan: `None` = wildcard, like rdflib's
    * `graph.triples((None, URIRef(p), None))`. */
  def triples(s: Option[String] = None, p: Option[String] = None,
      o: Option[String] = None): DataFrame = {
    val preds = Seq(
      s.map(col("subject") === _),
      p.map(col("predicate") === _),
      o.map(col("obj_value") === _)).flatten
    preds.foldLeft(df)((d, c) => d.filter(c))
  }

  /** Membership test (rdflib `(s, RDF.type, x) in graph`). Action. */
  def contains(s: String, p: String, o: String): Boolean =
    !triples(Some(s), Some(p), Some(o)).isEmpty

  /** Add triples with set semantics. */
  def add(other: DataFrame): TripleGraph =
    new TripleGraph(RdfOps.unionDedup(df, other.select(
      Model.columns.map(col): _*)))

  /** Set union of two graphs. */
  def union(other: TripleGraph): TripleGraph = add(other.df)

  /** Remove all triples matching the pattern (rdflib
    * `graph.remove((None, f, None))`, the O18 shape). */
  def remove(s: Option[String] = None, p: Option[String] = None,
      o: Option[String] = None): TripleGraph = {
    val preds = Seq(
      s.map(col("subject") === _),
      p.map(col("predicate") === _),
      o.map(col("obj_value") === _)).flatten
    if (preds.isEmpty) new TripleGraph(df.limit(0))
    else new TripleGraph(df.filter(!preds.reduce(_ && _)))
  }

  /** `len(graph)`. Action. */
  def size: Long = df.count()

  /** Typed view for Scala-API consumers. */
  def ds: Dataset[Triple] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("graph"), col("subject"),
        col("subject_kind").as("subjectKind"), col("predicate"),
        col("obj_value").as("objValue"), col("obj_kind").as("objKind"),
        col("obj_lang").as("objLang"),
        col("obj_datatype").as("objDatatype"))
      .as[Triple]
  }

  /** Serialize to Turtle documents (O9). */
  def toTurtle(prefixes: Map[String, String] = Vocab.namespaces)
      : Dataset[String] = Turtle.serializeDocuments(df, prefixes)
}

object TripleGraph {
  /** Wrap an existing triple table (validated column set). */
  def apply(df: DataFrame): TripleGraph = {
    require(Model.columns.forall(df.columns.contains),
      s"triple table needs columns ${Model.columns.mkString(", ")}")
    new TripleGraph(df.select(Model.columns.map(col): _*))
  }

  /** Parse Turtle documents into a graph (O3). */
  def fromTurtle(docs: Dataset[String],
      graphId: String = "default"): TripleGraph =
    new TripleGraph(Turtle.parse(docs, graphId))

  /** Read a parquet triple table. */
  def read(spark: org.apache.spark.sql.SparkSession,
      path: String): TripleGraph = apply(spark.read.parquet(path))
}
