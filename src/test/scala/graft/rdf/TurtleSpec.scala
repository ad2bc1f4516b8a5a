package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import Vocab._

/** Turtle codec round-trip: graph (triple-set) equality, not byte
  * equality — SURVEY §7 "what's hard" #1/#5. */
class TurtleSpec extends AnyFunSuite {

  private val n: String = null

  test("parses prefixed names, 'a', object/predicate lists, comments") {
    val doc =
      """# a comment
        |@prefix dcterms: <http://purl.org/dc/terms/> .
        |@prefix ceo: <https://linkeddata.cultureelerfgoed.nl/def/ceo#> .
        |<http://x/1> a ceo:Rijksmonument ;
        |  dcterms:title "Fresco"@nl , "Fresco EN"@en ;
        |  dcterms:relation <http://x/2> .
        |<http://x/2> dcterms:identifier "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
        |""".stripMargin
    val ts = Turtle.parseDocument(doc).toSet
    assert(ts == Set(
      ("default", "http://x/1", "iri", RdfType, CeoRijksmonument, "iri", n, n),
      ("default", "http://x/1", "iri", DctermsTitle, "Fresco", "literal", "nl", n),
      ("default", "http://x/1", "iri", DctermsTitle, "Fresco EN", "literal", "en", n),
      ("default", "http://x/1", "iri", DctermsRelation, "http://x/2", "iri", n, n),
      ("default", "http://x/2", "iri", DctermsIdentifier, "42", "literal", n, XsdInteger)))
  }

  test("parses numbers, booleans, bnodes, escapes") {
    val doc =
      """@prefix ex: <http://ex.org/> .
        |_:b0 ex:size 42 .
        |_:b0 ex:public true .
        |<http://x/3> ex:note "line\nbreak \"quoted\" tab\t\\" .
        |""".stripMargin
    val ts = Turtle.parseDocument(doc).toSet
    assert(ts.contains(
      ("default", "_:b0", "bnode", "http://ex.org/size", "42", "literal", n, XsdInteger)))
    assert(ts.contains(
      ("default", "_:b0", "bnode", "http://ex.org/public", "true", "literal", n, XsdBoolean)))
    assert(ts.contains(
      ("default", "http://x/3", "iri", "http://ex.org/note",
        "line\nbreak \"quoted\" tab\t\\", "literal", n, n)))
  }

  test("serialize → parse round-trips the triple set (graph equality)") {
    val rows: Seq[Turtle.FlatTriple] = Seq(
      ("default", "http://x/1", "iri", DctermsTitle, "Fresco \"A\"\n", "literal", "nl", n),
      ("default", "http://x/1", "iri", RdfType, CeoRijksmonument, "iri", n, n),
      ("default", "http://x/1", "iri", OmekaIsPublic, "true", "literal", n, XsdBoolean),
      ("default", "_:b7", "bnode", DctermsRelation, "http://x/2", "iri", n, n),
      ("default", "http://x/2", "iri", DctermsIdentifier, "RM12", "literal", n, n),
      // IRI that no prefix compacts (falls back to <...>)
      ("default", "http://other.org/deep/path#frag", "iri",
        "http://other.org/p", "x y", "literal", n, n))
    val df = TestSpark.triples(rows)
    val spark = TestSpark.spark
    import spark.implicits._
    val doc = Turtle.serialize(df).collect().mkString("\n")
    val back = Turtle.parse(spark.createDataset(Seq(doc)))
      .as[Turtle.FlatTriple].collect().toSet
    assert(back == rows.toSet)
  }

  test("N-Triples serialization is line-splittable and parses back") {
    val rows: Seq[Turtle.FlatTriple] = Seq(
      ("default", "http://x/1", "iri", DctermsTitle, "Fresco \"A\"\nline2",
        "literal", "nl", n),
      ("default", "http://x/1", "iri", RdfType, CeoRijksmonument, "iri",
        n, n),
      ("default", "_:b7", "bnode", DctermsRelation, "http://x/2", "iri",
        n, n),
      ("default", "http://x/2", "iri", DctermsIdentifier, "RM12",
        "literal", n, XsdBoolean))
    val df = TestSpark.triples(rows)
    val spark = TestSpark.spark
    import spark.implicits._
    val lines = Turtle.serializeNTriples(df).collect()
    // one line per triple, no prefix machinery, no raw newlines:
    // EVERY line is independently a complete Turtle document
    assert(lines.length == rows.size)
    assert(lines.forall(l => !l.contains("@prefix") && !l.contains("\n")))
    val perLine = lines.flatMap(l =>
      Turtle.parseDocument(l, "default")).toSet
    assert(perLine == rows.toSet)
  }

  test("concatenated documents parse with set semantics (O2+O3)") {
    val page = "@prefix ex: <http://ex.org/> .\n<http://x/1> ex:p \"v\" .\n"
    val spark = TestSpark.spark
    import spark.implicits._
    val parsed = Turtle.parse(spark.createDataset(Seq(page, page)))
    assert(parsed.count() == 1) // duplicate across pages collapses
  }

  test("fails on undeclared prefix") {
    intercept[IllegalArgumentException] {
      Turtle.parseDocument("<http://x/1> nope:p \"v\" .")
    }
  }
}
