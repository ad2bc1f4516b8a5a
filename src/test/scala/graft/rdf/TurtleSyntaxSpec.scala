package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import Vocab._

/** Parser coverage for the Turtle constructs real rdflib/Omeka S
  * exports contain beyond the serializer's own output: anonymous
  * blank-node property lists, collections, long (triple-quoted)
  * literals, both quote styles, and the keyword/boolean delimiter
  * rules of the grammar. */
class TurtleSyntaxSpec extends AnyFunSuite {

  private val n: String = null

  test("anonymous bnode property list as object") {
    val doc =
      """@prefix ex: <http://ex.org/> .
        |<http://x/1> ex:loc [ ex:lat 52 ; ex:lon 4 ] .
        |""".stripMargin
    val ts = Turtle.parseDocument(doc)
    val anon = ts.collectFirst {
      case (_, "http://x/1", _, "http://ex.org/loc", o, "bnode", _, _) => o
    }.getOrElse(fail("no bnode object emitted"))
    assert(ts.contains(
      ("default", anon, "bnode", "http://ex.org/lat", "52", "literal", n,
        XsdInteger)))
    assert(ts.contains(
      ("default", anon, "bnode", "http://ex.org/lon", "4", "literal", n,
        XsdInteger)))
  }

  test("anonymous bnode property list as standalone subject, and empty []") {
    val doc =
      """@prefix ex: <http://ex.org/> .
        |[ ex:p "v" ] .
        |<http://x/1> ex:empty [] .
        |""".stripMargin
    val ts = Turtle.parseDocument(doc)
    assert(ts.exists { case (_, s, sk, p, o, _, _, _) =>
      sk == "bnode" && p == "http://ex.org/p" && o == "v" && s.startsWith("_:")
    })
    assert(ts.exists { case (_, s, _, p, o, ok, _, _) =>
      s == "http://x/1" && p == "http://ex.org/empty" && ok == "bnode"
    })
  }

  test("nested bnode property lists") {
    val doc =
      """@prefix ex: <http://ex.org/> .
        |<http://x/1> ex:a [ ex:b [ ex:c "deep" ] ] .
        |""".stripMargin
    val ts = Turtle.parseDocument(doc)
    val outer = ts.collectFirst {
      case (_, "http://x/1", _, "http://ex.org/a", o, "bnode", _, _) => o
    }.get
    val inner = ts.collectFirst {
      case (_, s, _, "http://ex.org/b", o, "bnode", _, _) if s == outer => o
    }.getOrElse(fail("no inner bnode"))
    assert(ts.contains(
      ("default", inner, "bnode", "http://ex.org/c", "deep", "literal", n, n)))
  }

  test("collections expand to rdf:first/rdf:rest chains; () is rdf:nil") {
    val doc =
      """@prefix ex: <http://ex.org/> .
        |<http://x/1> ex:items ( "a" "b" ) .
        |<http://x/2> ex:items () .
        |""".stripMargin
    val ts = Turtle.parseDocument(doc)
    val head = ts.collectFirst {
      case (_, "http://x/1", _, "http://ex.org/items", o, "bnode", _, _) => o
    }.getOrElse(fail("no collection head"))
    assert(ts.contains(
      ("default", head, "bnode", RdfFirst, "a", "literal", n, n)))
    val next = ts.collectFirst {
      case (_, s, _, RdfRest, o, "bnode", _, _) if s == head => o
    }.getOrElse(fail("no rest link"))
    assert(ts.contains(
      ("default", next, "bnode", RdfFirst, "b", "literal", n, n)))
    assert(ts.contains(
      ("default", next, "bnode", RdfRest, RdfNil, "iri", n, n)))
    assert(ts.contains(
      ("default", "http://x/2", "iri", "http://ex.org/items", RdfNil,
        "iri", n, n)))
  }

  test("long literals: raw newlines, embedded quotes, both quote styles") {
    val doc =
      "@prefix ex: <http://ex.org/> .\n" +
        "<http://x/1> ex:a \"\"\"line1\nline2 \"quoted\" end\"\"\" .\n" +
        "<http://x/2> ex:b '''single\nstyle''' .\n" +
        "<http://x/3> ex:c \"\"\"ends with escaped \\\"\"\"\" .\n"
    val ts = Turtle.parseDocument(doc).toSet
    assert(ts.contains(("default", "http://x/1", "iri", "http://ex.org/a",
      "line1\nline2 \"quoted\" end", "literal", n, n)))
    assert(ts.contains(("default", "http://x/2", "iri", "http://ex.org/b",
      "single\nstyle", "literal", n, n)))
    assert(ts.contains(("default", "http://x/3", "iri", "http://ex.org/c",
      "ends with escaped \"", "literal", n, n)))
  }

  test("single-quoted short literals and \\' escape") {
    val doc = "@prefix ex: <http://ex.org/> .\n" +
      "<http://x/1> ex:p 'it\\'s'@en .\n"
    val ts = Turtle.parseDocument(doc).toSet
    assert(ts.contains(("default", "http://x/1", "iri", "http://ex.org/p",
      "it's", "literal", "en", n)))
  }

  test("boolean requires a delimiter; truefoo:x is a prefixed name") {
    val doc =
      """@prefix truefoo: <http://ex.org/tf#> .
        |@prefix ex: <http://ex.org/> .
        |<http://x/1> ex:v truefoo:x .
        |<http://x/1> ex:w true .
        |""".stripMargin
    val ts = Turtle.parseDocument(doc).toSet
    assert(ts.contains(("default", "http://x/1", "iri", "http://ex.org/v",
      "http://ex.org/tf#x", "iri", n, n)))
    assert(ts.contains(("default", "http://x/1", "iri", "http://ex.org/w",
      "true", "literal", n, XsdBoolean)))
  }

  test("'a' keyword before non-whitespace; 'a:x' stays a prefixed name") {
    val doc =
      """@prefix a: <http://ex.org/a#> .
        |@prefix ex: <http://ex.org/> .
        |<http://x/1> a<http://ex.org/T> .
        |<http://x/2> ex:p a:x .
        |""".stripMargin
    val ts = Turtle.parseDocument(doc).toSet
    assert(ts.contains(("default", "http://x/1", "iri", RdfType,
      "http://ex.org/T", "iri", n, n)))
    assert(ts.contains(("default", "http://x/2", "iri", "http://ex.org/p",
      "http://ex.org/a#x", "iri", n, n)))
  }

  test("TriG graph blocks: GRAPH keyword, bare label form, nesting scope") {
    val doc =
      """@prefix ex: <http://ex.org/> .
        |<http://x/0> ex:p "top" .
        |GRAPH <http://g/1> { <http://x/1> ex:p "one" ;
        |  ex:q "uno" . }
        |<http://g/2> { <http://x/2> ex:p "two" . }
        |<http://x/3> ex:p "top-after" .
        |""".stripMargin
    val ts = Turtle.parseDocument(doc, graphId = "dflt").toSet
    assert(ts.map(t => (t._1, t._2, t._5)) == Set(
      ("dflt", "http://x/0", "top"),
      ("http://g/1", "http://x/1", "one"),
      ("http://g/1", "http://x/1", "uno"),
      ("http://g/2", "http://x/2", "two"),
      ("dflt", "http://x/3", "top-after")))
  }

  test("TriG: optional final dot, unlabeled default block, tight braces") {
    // the W3C spec's own example shapes: no '.' before '}', bare
    // default-graph block, prefixed object right against '.}'
    val doc =
      """@prefix ex: <http://ex.org/> .
        |GRAPH <http://g/1> { <http://x/1> ex:p ex:o.}
        |GRAPH <http://g/2> { <http://x/2> ex:p "nodot" }
        |{ <http://x/3> ex:p "bare" . }
        |""".stripMargin
    val ts = Turtle.parseDocument(doc).toSet
    assert(ts.map(t => (t._1, t._2, t._5)) == Set(
      ("http://g/1", "http://x/1", "http://ex.org/o"),
      ("http://g/2", "http://x/2", "nodot"),
      ("default", "http://x/3", "bare")))
  }

  test("@base resolves the empty reference <> to the base itself") {
    val doc =
      """@base <http://ex.org/doc> .
        |@prefix dcterms: <http://purl.org/dc/terms/> .
        |<> dcterms:title "Self" .
        |""".stripMargin
    assert(Turtle.parseDocument(doc).head._2 == "http://ex.org/doc")
  }

  test("dotted prefixes (PN_PREFIX interior dots) declare and resolve") {
    val doc =
      """@prefix ex.v2: <http://ex.org/v2#> .
        |<http://x/1> ex.v2:p "v" .
        |""".stripMargin
    assert(Turtle.parseDocument(doc).head._4 == "http://ex.org/v2#p")
  }

  test("TriG round-trip keeps the graph column") {
    val rows: Seq[Turtle.FlatTriple] = Seq(
      ("default", "http://x/1", "iri", "http://ex.org/p", "v1",
        "literal", n, n),
      ("http://g/a", "http://x/2", "iri", "http://ex.org/p", "v2",
        "literal", "nl", n),
      ("http://g/b", "http://x/3", "iri", "http://ex.org/p",
        "http://y/3", "iri", n, n))
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val doc = Turtle.serializeTrig(graft.TestSpark.triples(rows))
      .collect().mkString("\n")
    assert(doc.contains("GRAPH <http://g/a> {"))
    val back = Turtle.parse(spark.createDataset(Seq(doc)))
      .as[Turtle.FlatTriple].collect().toSet
    assert(back == rows.toSet)
  }

  test("PN_LOCAL escapes in prefixed names unescape (rdflib parity)") {
    val doc =
      """@prefix ex: <http://ex.org/> .
        |<http://x/1> ex:p ex:a\.b\/c .
        |<http://x/2> ex:p ex:plain.mid .
        |""".stripMargin
    val ts = Turtle.parseDocument(doc).toSet
    assert(ts.contains(("default", "http://x/1", "iri", "http://ex.org/p",
      "http://ex.org/a.b/c", "iri", n, n)))
    // unescaped mid-name dots are legal PN_LOCAL chars and stay put
    assert(ts.contains(("default", "http://x/2", "iri", "http://ex.org/p",
      "http://ex.org/plain.mid", "iri", n, n)))
  }

  test("@base resolves relative IRIs; absolute IRIs pass through") {
    val doc =
      """@base <http://ex.org/items/> .
        |@prefix ex: <http://ex.org/def#> .
        |<1> ex:rel <../other/2> .
        |<1> ex:abs <http://elsewhere.org/x> .
        |""".stripMargin
    val ts = Turtle.parseDocument(doc).toSet
    assert(ts.contains(("default", "http://ex.org/items/1", "iri",
      "http://ex.org/def#rel", "http://ex.org/other/2", "iri", n, n)))
    assert(ts.contains(("default", "http://ex.org/items/1", "iri",
      "http://ex.org/def#abs", "http://elsewhere.org/x", "iri", n, n)))
    // without a base, relative IRIs pass through raw
    val noBase = Turtle.parseDocument(
      "@prefix ex: <http://ex.org/> .\n<rel/1> ex:p \"v\" .\n")
    assert(noBase.head._2 == "rel/1")
  }

  test("numeric literals: exponent doubles and leading-dot decimals") {
    val doc =
      """@prefix ex: <http://ex.org/> .
        |<http://x/1> ex:a 1.2e3 ; ex:b 4E-5 ; ex:c .5 ; ex:d -7 ; ex:e 2.5 .
        |""".stripMargin
    val ts = Turtle.parseDocument(doc).toSet
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    def dtOf(p: String) = ts.collectFirst {
      case (_, _, _, pred, v, _, _, dt) if pred == s"http://ex.org/$p" =>
        (v, dt)
    }.get
    assert(dtOf("a") == ("1.2e3", s"${xsd}double"))
    assert(dtOf("b") == ("4E-5", s"${xsd}double"))
    assert(dtOf("c") == (".5", s"${xsd}decimal"))
    assert(dtOf("d") == ("-7", s"${xsd}integer"))
    assert(dtOf("e") == ("2.5", s"${xsd}decimal"))
  }

  test("bnode label scoping: same label on distinct docs stays distinct") {
    val d1 = "@prefix ex: <http://ex.org/> .\n_:b0 ex:p \"one\" .\n"
    val d2 = "@prefix ex: <http://ex.org/> .\n_:b0 ex:p \"two\" .\n"
    val scoped = Turtle.parseDocument(d1, scopeBnodeLabels = true) ++
      Turtle.parseDocument(d2, scopeBnodeLabels = true)
    assert(scoped.map(_._2).distinct.size == 2,
      "same-label bnodes from different documents must not conflate")
    // identical text re-parses to identical labels (dedup still works)
    val again = Turtle.parseDocument(d1, scopeBnodeLabels = true)
    assert(scoped.take(1) == again)
    // default (unscoped) keeps raw labels for byte-stable round-trips
    assert(Turtle.parseDocument(d1).head._2 == "_:b0")
  }

  test("multi-line literal serializes long-quoted and round-trips") {
    val rows: Seq[Turtle.FlatTriple] = Seq(
      ("default", "http://x/1", "iri", "http://ex.org/p",
        "line1\nline2 with \"quotes\" and \\back", "literal", n, n))
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val doc = Turtle.serialize(graft.TestSpark.triples(rows))
      .collect().mkString("\n")
    assert(doc.contains("\"\"\""), "expected long-quoted serialization")
    val back = Turtle.parse(spark.createDataset(Seq(doc)))
      .as[Turtle.FlatTriple].collect().toSet
    assert(back == rows.toSet)
  }
}
