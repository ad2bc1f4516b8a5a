package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Vocab._

/** Deterministic RDF triple fixture, derived from the driver's `part`
  * table so Spark and the DuckDB oracle see identical input
  * (FIXTURES.md §A). Every derivation below uses only int arithmetic
  * and string concatenation — operations whose results are
  * byte-identical across both engines.
  *
  * The dirty-data injections mirror what the reference's cleaning
  * pass handles (reference: src/export_from_omeka_s.py:53–71):
  *   - k % 37 == 0 → subject contains "@context"   (JSON-LD leak, O4)
  *   - k % 41 == 0 → subject is not a valid IRI     (O5)
  *   - k % 43 == 0 → object IRI with a space        (O7)
  *   - k % 47 == 0 → object IRI contains "@context" (O4, object side)
  *   - k % 5  == 0 → object references a customvocab item whose
  *                   rdf:type contains "customvocab" (O6 intent, bug B1)
  *   - k % 3  == 0 → carries a rijksmonumentnummer literal, with the
  *                   "RM"-prefix variant on even k (O14 key normalize,
  *                   reference: src/transform_datamodel.py:93–96)
  *   - k % 6  == 0 → typed ceo#Rijksmonument         (O16 semi-join)
  *   - is_public / resource_class / resource_template predicates →
  *     the CI filter list (O18, reference workflow yml:58–60)
  */
object TripleFixture {
  private val ItemNs = "http://ex.org/item/"
  private val CvNs = "http://ex.org/customvocab#"
  val MonNs = "https://monumenten.example.org/monument/"

  /** The "source graph": what the paginated Turtle export would have
    * produced, dirty rows included.
    *
    * Materialized ONCE per (session, dir): the fixture models the
    * pipeline's INPUT — in production a stored parquet triple table —
    * so every consumer reads the same materialization instead of
    * re-running the 10-way derivation union per query (it dominated
    * the rdf_* bench numbers while telling nothing about the
    * operators). */
  def triples(spark: SparkSession, dir: String): DataFrame =
    graft.SnapshotMemo.getOrCompute(spark, s"fixture-triples:$dir")(
      deriveTriples(spark, dir).localCheckpoint())

  private def deriveTriples(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
      .select(col("p_partkey").as("k"), col("p_name"), col("p_brand"),
        col("p_size"))

    val k = col("k")
    val cleanSubj = concat(lit(ItemNs), k)
    val dirtySubj = when(k % 37 === 0, concat(lit("@context-leak/"), k))
      .when(k % 41 === 0, concat(lit("not a uri "), k))
      .otherwise(cleanSubj)

    def row(subj: Column, pred: String, value: Column, kind: String,
        lang: Column, dt: Column): Column = struct(
      lit("default").as("graph"),
      subj.as("subject"),
      lit("iri").as("subject_kind"),
      lit(pred).as("predicate"),
      value.as("obj_value"),
      lit(kind).as("obj_kind"),
      lang.cast("string").as("obj_lang"),
      dt.cast("string").as("obj_datatype"))

    val nul = lit(null).cast("string")

    val title = p.select(row(dirtySubj, DctermsTitle, col("p_name"),
      "literal", lit("nl"), nul).as("t"))
    val brand = p.select(row(cleanSubj, "http://ex.org/def#brand",
      col("p_brand"), "literal", nul, nul).as("t"))
    val size = p.select(row(cleanSubj, "http://ex.org/def#size",
      col("p_size").cast("string"), "literal", nul, lit(XsdInteger)).as("t"))
    val relObj = when(k % 43 === 0, concat(lit("http://bad uri/"), k))
      .when(k % 47 === 0, concat(lit("http://ex.org/@context/"), k))
      .otherwise(concat(lit(ItemNs), k + 1))
    val relation = p.select(row(cleanSubj, DctermsRelation, relObj,
      "iri", nul, nul).as("t"))
    val resourceClass = p.filter(k % 5 === 0)
      .select(row(cleanSubj, OmekaResourceClass,
        concat(lit(CvNs), k % 13), "iri", nul, nul).as("t"))
    val cvTypes = p.filter(k < 13)
      .select(row(concat(lit(CvNs), k), RdfType,
        lit("http://omeka.org/s/vocabs/o#customvocab"), "iri", nul, nul)
        .as("t"))
    val rmnr = p.filter(k % 3 === 0)
      .select(row(cleanSubj, CeoRijksmonumentnummer,
        when(k % 2 === 0, concat(lit("RM"), k + 100000))
          .otherwise((k + 100000).cast("string")),
        "literal", nul, nul).as("t"))
    val rmType = p.filter(k % 6 === 0)
      .select(row(cleanSubj, RdfType, lit(CeoRijksmonument), "iri",
        nul, nul).as("t"))
    val isPublic = p.select(row(cleanSubj, OmekaIsPublic,
      when(k % 2 === 0, lit("true")).otherwise(lit("false")),
      "literal", nul, lit(XsdBoolean)).as("t"))
    val resourceTemplate = p.filter(k % 7 === 0)
      .select(row(cleanSubj, OmekaResourceTemplate,
        concat(lit("http://ex.org/template/"), k % 4), "iri", nul, nul)
        .as("t"))

    Seq(title, brand, size, relation, resourceClass, cvTypes, rmnr,
      rmType, isPublic, resourceTemplate)
      .reduce(_ union _)
      .select(col("t.*"))
  }

  /** The "fetched enrichment" dimension: what the per-key REST lookups
    * would have returned (reference: src/transform_datamodel.py:88–101).
    * Keys with k % 4 == 0 are omitted, modeling the reference's
    * best-effort skip of failed fetches (transform:100–101).
    */
  def enrichment(spark: SparkSession, dir: String): DataFrame =
    graft.SnapshotMemo.getOrCompute(spark, s"fixture-enrichment:$dir")(
      deriveEnrichment(spark, dir).localCheckpoint())

  private def deriveEnrichment(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
      .select(col("p_partkey").as("k"))
      .filter(col("k") % 3 === 0 && col("k") % 4 =!= 0)
    val k = col("k")
    val n = k + 100000
    val mon = concat(lit(MonNs), n)
    val nul = lit(null).cast("string")

    def row(subj: Column, pred: String, value: Column, kind: String,
        dt: Column): Column = struct(
      lit("default").as("graph"), subj.as("subject"),
      lit("iri").as("subject_kind"), lit(pred).as("predicate"),
      value.as("obj_value"), lit(kind).as("obj_kind"),
      nul.as("obj_lang"), dt.cast("string").as("obj_datatype"))

    val monType = p.select(row(mon, RdfType, lit(CeoRijksmonument),
      "iri", nul).as("t"))
    val monId = p.select(row(mon, DctermsIdentifier, n.cast("string"),
      "literal", nul).as("t"))
    // the fetched Turtle also types the *item* (lets O16's semi-join
    // match more subjects after enrichment than before)
    val itemType = p.select(row(concat(lit(ItemNs), k), RdfType,
      lit(CeoRijksmonument), "iri", nul).as("t"))

    Seq(monType, monId, itemType).reduce(_ union _).select(col("t.*"))
  }

  /** The fetch LEDGER of the stored enrichment snapshot: per stored
    * key, how many days ago it was last fetched. Integer days (not a
    * timestamp) keep the derivation byte-identical across engines; a
    * production ledger stores a `fetched_at` timestamp column next to
    * the snapshot and the TTL compare is a `date_diff`. `k % 14`
    * spreads ages 0–13 over the stored keys, so the 7-day TTL
    * (the reference's weekly cadence, transform_datamodel.py:88–101)
    * marks about half the stored keys stale. */
  def enrichmentLedger(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .select(col("p_partkey").as("k"))
      .filter(col("k") % 3 === 0 && col("k") % 4 =!= 0)
      .select((col("k") + 100000).cast("string").as("monument_key"),
        (col("k") % 14).cast("int").as("age_days"))

  // ---- oracle-side equivalents (DuckDB SQL CTEs) ----

  /** CTE named `triples`: byte-identical to [[triples]]. */
  val triplesCte: String =
    s"""triples AS (
       |  WITH pk AS (SELECT p_partkey AS k, p_name, p_brand, p_size FROM part),
       |  ds AS (SELECT k, CASE WHEN k % 37 = 0 THEN '@context-leak/' || k
       |                        WHEN k % 41 = 0 THEN 'not a uri ' || k
       |                        ELSE 'http://ex.org/item/' || k END AS s,
       |                'http://ex.org/item/' || k AS cs, p_name, p_brand, p_size
       |         FROM pk)
       |  SELECT 'default' AS graph, s AS subject, 'iri' AS subject_kind,
       |         '$DctermsTitle' AS predicate, p_name AS obj_value,
       |         'literal' AS obj_kind, 'nl' AS obj_lang,
       |         CAST(NULL AS VARCHAR) AS obj_datatype FROM ds
       |  UNION ALL SELECT 'default', cs, 'iri', 'http://ex.org/def#brand',
       |         p_brand, 'literal', NULL, NULL FROM ds
       |  UNION ALL SELECT 'default', cs, 'iri', 'http://ex.org/def#size',
       |         CAST(p_size AS VARCHAR), 'literal', NULL, '$XsdInteger' FROM ds
       |  UNION ALL SELECT 'default', cs, 'iri', '$DctermsRelation',
       |         CASE WHEN k % 43 = 0 THEN 'http://bad uri/' || k
       |              WHEN k % 47 = 0 THEN 'http://ex.org/@context/' || k
       |              ELSE 'http://ex.org/item/' || (k + 1) END,
       |         'iri', NULL, NULL FROM ds
       |  UNION ALL SELECT 'default', cs, 'iri', '$OmekaResourceClass',
       |         'http://ex.org/customvocab#' || (k % 13), 'iri', NULL, NULL
       |         FROM ds WHERE k % 5 = 0
       |  UNION ALL SELECT 'default', 'http://ex.org/customvocab#' || k, 'iri',
       |         '$RdfType', 'http://omeka.org/s/vocabs/o#customvocab',
       |         'iri', NULL, NULL FROM ds WHERE k < 13
       |  UNION ALL SELECT 'default', cs, 'iri', '$CeoRijksmonumentnummer',
       |         CASE WHEN k % 2 = 0 THEN 'RM' || (k + 100000)
       |              ELSE CAST(k + 100000 AS VARCHAR) END,
       |         'literal', NULL, NULL FROM ds WHERE k % 3 = 0
       |  UNION ALL SELECT 'default', cs, 'iri', '$RdfType',
       |         '$CeoRijksmonument', 'iri', NULL, NULL FROM ds WHERE k % 6 = 0
       |  UNION ALL SELECT 'default', cs, 'iri', '$OmekaIsPublic',
       |         CASE WHEN k % 2 = 0 THEN 'true' ELSE 'false' END,
       |         'literal', NULL, '$XsdBoolean' FROM ds
       |  UNION ALL SELECT 'default', cs, 'iri', '$OmekaResourceTemplate',
       |         'http://ex.org/template/' || (k % 4), 'iri', NULL, NULL
       |         FROM ds WHERE k % 7 = 0
       |)""".stripMargin

  /** CTE named `ledger`: byte-identical to [[enrichmentLedger]]. */
  val enrichmentLedgerCte: String =
    s"""ledger AS (
       |  SELECT CAST(p_partkey + 100000 AS VARCHAR) AS monument_key,
       |         CAST(p_partkey % 14 AS INTEGER) AS age_days
       |  FROM part WHERE p_partkey % 3 = 0 AND p_partkey % 4 <> 0
       |)""".stripMargin

  /** CTE named `enrichment`: byte-identical to [[enrichment]]. */
  val enrichmentCte: String =
    s"""enrichment AS (
       |  WITH ek AS (SELECT p_partkey AS k FROM part
       |              WHERE p_partkey % 3 = 0 AND p_partkey % 4 <> 0)
       |  SELECT 'default' AS graph,
       |         '$MonNs' || (k + 100000) AS subject,
       |         'iri' AS subject_kind, '$RdfType' AS predicate,
       |         '$CeoRijksmonument' AS obj_value, 'iri' AS obj_kind,
       |         CAST(NULL AS VARCHAR) AS obj_lang,
       |         CAST(NULL AS VARCHAR) AS obj_datatype FROM ek
       |  UNION ALL SELECT 'default', '$MonNs' || (k + 100000), 'iri',
       |         '$DctermsIdentifier', CAST(k + 100000 AS VARCHAR),
       |         'literal', NULL, NULL FROM ek
       |  UNION ALL SELECT 'default', 'http://ex.org/item/' || k, 'iri',
       |         '$RdfType', '$CeoRijksmonument', 'iri', NULL, NULL FROM ek
       |)""".stripMargin
}
