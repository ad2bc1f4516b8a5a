package graft.rdf

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property: serialize → parse is the identity on the triple set,
  * for generated triples spanning IRIs, bnodes, lang/datatype/plain
  * literals with escape-needing content. */
class TurtleRoundTripPropertySpec extends AnyFunSuite {

  private val genIri: Gen[String] = for {
    host <- Gen.oneOf("ex.org", "muurschilderingendatabase.nl")
    path <- Gen.listOfN(2, Gen.alphaNumStr.map(_.take(6))).map(_.mkString("/"))
    frag <- Gen.oneOf("", "#a", "#b_c-d")
  } yield s"http://$host/$path$frag"

  private val genLiteral: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr.map(_.take(30)),
    Gen.oneOf("", "with \"quotes\"", "line\nbreak", "tab\there",
      "back\\slash", "unicode é ü 文", "RM12345",
      // multi-line values serialize long-quoted ("""…""") — exercise
      // quote runs, a trailing quote before the closing delimiter,
      // and \r\n endings through the long-string lane
      "multi\nline with \"\" run", "ends with quote\n\"",
      "crlf\r\nline", "\n", "a\nb\nc\n\"d\" e\\f"))

  private val genTriple: Gen[Turtle.FlatTriple] = for {
    s <- Gen.oneOf(genIri, Gen.choose(0, 9).map(i => s"_:b$i"))
    p <- Gen.oneOf(genIri, Gen.const(Vocab.DctermsTitle),
      Gen.const(Vocab.OmekaIsPublic))
    objIsIri <- Gen.oneOf(true, false)
    o <- if (objIsIri) genIri else genLiteral
    lang <- Gen.oneOf(null, "nl", "en")
    dt <- Gen.oneOf(null, Vocab.XsdInteger, Vocab.XsdBoolean)
  } yield {
    val sKind = if (s.startsWith("_:")) "bnode" else "iri"
    if (objIsIri) ("default", s, sKind, p, o, "iri", null, null)
    // a literal carries lang OR datatype, never both (RDF rule)
    else if (lang != null) ("default", s, sKind, p, o, "literal", lang, null)
    else ("default", s, sKind, p, o, "literal", null, dt)
  }

  test("serialize → parse round-trips 10 generated graphs exactly") {
    var seed = rng.Seed(7L)
    val spark = TestSpark.spark
    import spark.implicits._
    (1 to 10).foreach { _ =>
      val rows = (1 to 25).flatMap { _ =>
        val v = genTriple.apply(Gen.Parameters.default, seed)
        seed = seed.next
        v
      }.distinct
      val df = TestSpark.triples(rows)
      val docs = Turtle.serializeDocuments(df)
      val back = Turtle.parse(docs).as[Turtle.FlatTriple].collect().toSet
      assert(back == rows.toSet,
        s"round-trip lost/changed triples (seed state $seed)")
    }
  }
}
