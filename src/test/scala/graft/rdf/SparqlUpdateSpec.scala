package graft.rdf

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import Vocab._

/** SPARQL UPDATE semantics: set behavior, full-term-identity
  * deletes, and the O17/O18 equivalences the scaladoc claims. */
class SparqlUpdateSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  import s.implicits._

  private def t = TripleFixture.triples(s, d)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("DELETE/INSERT WHERE rename == the O17 applyMapping projection") {
    val updated = SparqlSelect.update(t, RdfQueries.sparqlUpdateRenameQuery)
    val hand = RdfOps.applyMapping(t, Map(DctermsTitle -> SdoName))
    assert(asSet(updated) === asSet(hand.dropDuplicates()))
    assert(updated.filter(col("predicate") === DctermsTitle).count() === 0)
    assert(updated.filter(col("predicate") === SdoName).count() > 0)
  }

  test("DELETE WHERE == the O18 applyFilter anti-filter") {
    val updated = SparqlSelect.update(t,
      RdfQueries.sparqlUpdateDeleteQuery)
    val hand = RdfOps.applyFilter(t, Seq(OmekaResourceClass))
    assert(asSet(updated) === asSet(hand))
  }

  test("INSERT DATA then DELETE DATA round-trips to the original set") {
    val ins = """INSERT DATA {
                |  <http://ex.org/x> dcterms:identifier "tmp-1" .
                |}""".stripMargin
    val del = """DELETE DATA {
                |  <http://ex.org/x> dcterms:identifier "tmp-1" .
                |}""".stripMargin
    val inserted = SparqlSelect.update(t, ins)
    assert(inserted.count() === t.count() + 1)
    // set semantics: re-inserting is a no-op
    assert(SparqlSelect.update(inserted, ins).count() === inserted.count())
    val back = SparqlSelect.update(inserted, del)
    assert(asSet(back) === asSet(t))
  }

  test("DELETE DATA matches the FULL term identity — a literal " +
      "delete never removes a same-spelled IRI") {
    val twin = Seq(
      ("default", "http://ex.org/s", "iri", "http://ex.org/p",
        "http://ex.org/v", "literal", null.asInstanceOf[String],
        null.asInstanceOf[String]),
      ("default", "http://ex.org/s", "iri", "http://ex.org/p",
        "http://ex.org/v", "iri", null.asInstanceOf[String],
        null.asInstanceOf[String]))
      .toDF("graph", "subject", "subject_kind", "predicate",
        "obj_value", "obj_kind", "obj_lang", "obj_datatype")
    val out = SparqlSelect.update(twin,
      """DELETE DATA { <http://ex.org/s> <http://ex.org/p>
        |  "http://ex.org/v" . }""".stripMargin)
    val rows = out.collect()
    assert(rows.length === 1 &&
      rows.head.getAs[String]("obj_kind") === "iri")
  }

  test("update parser rejects malformed requests") {
    // variable in a DATA block
    assertThrows[IllegalArgumentException](SparqlSelect.update(t,
      "INSERT DATA { <http://ex.org/x> dcterms:identifier ?v . }"))
    // template var unbound in WHERE
    assertThrows[IllegalArgumentException](SparqlSelect.update(t,
      """DELETE { ?s dcterms:title ?nope . }
        |WHERE { ?s dcterms:title ?t . }""".stripMargin))
    // path in a DELETE WHERE pattern
    assertThrows[IllegalArgumentException](SparqlSelect.update(t,
      "DELETE WHERE { ?s dcterms:relation+ ?o . }"))
    // template object var object-bound by MULTIPLE body patterns:
    // metadata threading would be ambiguous — rejected loudly
    assertThrows[IllegalArgumentException](SparqlSelect.update(t,
      """DELETE { ?s dcterms:title ?v . }
        |WHERE { ?s dcterms:title ?v . ?x dcterms:identifier ?v . }"""
        .stripMargin))
  }
}
