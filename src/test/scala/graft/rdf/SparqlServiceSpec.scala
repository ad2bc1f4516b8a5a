package graft.rdf

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** §13.3 SERVICE against loopback endpoints (the OmekaHttp
  * discipline): the serialized remote query, the JSON-results
  * parse, the shared-variable join with local patterns, SILENT's
  * unit-solution degradation, and the loud non-SILENT failure. */
class SparqlServiceSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private def t: DataFrame = TripleFixture.triples(s, d)

  private def withServer(handler: HttpExchange => (Int, String))
      (body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/sparql", { (ex: HttpExchange) =>
      val (code, resp) = handler(ex)
      val bytes = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/sparql")
    finally server.stop(0)
  }

  private def resultsJson(rows: Seq[Map[String, String]]): String = {
    val bindings = rows.map(m => m.map { case (k, v) =>
      s""""$k": {"type": "literal", "value": "$v"}"""
    }.mkString("{", ", ", "}")).mkString("[", ", ", "]")
    s"""{"head": {"vars": []}, "results": {"bindings": $bindings}}"""
  }

  /** A subject IRI that really exists in the fixture, plus its
    * title — the local side of the federated join. */
  private def anyItem: (String, String) = {
    import org.apache.spark.sql.functions.col
    val r = t.filter(col("predicate") ===
        "http://purl.org/dc/terms/title" &&
        col("subject").startsWith("http"))
      .select("subject", "obj_value").head()
    (r.getString(0), r.getString(1))
  }

  test("SERVICE results join local bindings on the shared variable; " +
    "the sent query is the serialized block") {
    val (item, title) = anyItem
    var sent: String = null
    var accept: String = null
    withServer { ex =>
      accept = ex.getRequestHeaders.getFirst("Accept")
      sent = java.net.URLDecoder.decode(
        ex.getRequestURI.getQuery.stripPrefix("query="), "UTF-8")
      (200, resultsJson(Seq(
        Map("item" -> item, "stars" -> "5"),
        Map("item" -> "http://nowhere/else", "stars" -> "1"))))
    } { ep =>
      // budget 0: this test pins the UNPUSHED serialization + join
      // (the loopback ignores VALUES, so a pushed chunk would echo
      // its fixed rows once per chunk — a non-conformant endpoint)
      s.conf.set(SparqlSelect.serviceBindingBudgetConf, "0")
      val df = try SparqlSelect(t,
        s"""PREFIX dcterms: <http://purl.org/dc/terms/>
           |SELECT ?item ?title ?stars WHERE {
           |  ?item dcterms:title ?title .
           |  SERVICE <$ep> { ?item <http://ex.org/stars> ?stars . }
           |}""".stripMargin,
        SparqlSelect.HttpServiceClient)
      finally s.conf.unset(SparqlSelect.serviceBindingBudgetConf)
      val rows = df.collect()
      // only the remote row whose ?item exists locally survives
      assert(rows.length == 1)
      assert(rows.head.getString(0) == item)
      assert(rows.head.getString(1) == title)
      assert(rows.head.getString(2) == "5")
      assert(accept == "application/sparql-results+json")
      assert(sent == "SELECT * WHERE { ?item " +
        "<http://ex.org/stars> ?stars . }")
    }
  }

  test("BOUND JOIN: a small local frame pushes its shared-variable " +
    "bindings into the remote query as a VALUES block (IRIs in " +
    "angle brackets, literals quoted), and the result equals the " +
    "unpushed join") {
    val (item, title) = anyItem
    var sent: String = null
    def run(ep: String) = SparqlSelect(t,
      s"""PREFIX dcterms: <http://purl.org/dc/terms/>
         |SELECT ?item ?title ?stars WHERE {
         |  VALUES ?item { <$item> }
         |  ?item dcterms:title ?title .
         |  SERVICE <$ep> { ?item <http://ex.org/stars> ?stars . }
         |}""".stripMargin,
      SparqlSelect.HttpServiceClient).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .toSet
    withServer { ex =>
      sent = java.net.URLDecoder.decode(
        ex.getRequestURI.getQuery.stripPrefix("query="), "UTF-8")
      (200, resultsJson(Seq(
        Map("item" -> item, "stars" -> "5"),
        Map("item" -> "http://nowhere/else", "stars" -> "1"))))
    } { ep =>
      val pushed = run(ep)
      assert(pushed.nonEmpty && pushed.forall(_._1 == item))
      // the sent query leads with the local bindings — the title
      // pattern pins the frame to one item, well under the budget
      assert(sent.startsWith("SELECT * WHERE { VALUES (?item) { "),
        s"no VALUES block pushed:\n$sent")
      assert(sent.contains(s"(<$item>)"),
        s"IRI binding not angle-bracketed:\n$sent")
      assert(sent.endsWith(
        "} ?item <http://ex.org/stars> ?stars . }"))
      // unpushed reference: budget 0 disables pushdown
      s.conf.set(SparqlSelect.serviceBindingBudgetConf, "0")
      try {
        val unpushed = run(ep)
        assert(sent == "SELECT * WHERE { ?item " +
          "<http://ex.org/stars> ?stars . }")
        assert(pushed == unpushed, "bound join changed the result")
      } finally s.conf.unset(SparqlSelect.serviceBindingBudgetConf)
    }
  }

  test("BOUND JOIN CHUNKING: past one budget the bindings split " +
    "into budget-sized VALUES blocks, one remote request each, " +
    "results unioned; past budget x maxChunks it falls back to " +
    "the unpushed SELECT *") {
    val docs = t.filter(org.apache.spark.sql.functions.col(
        "predicate") === "http://purl.org/dc/terms/title")
      .filter(org.apache.spark.sql.functions.col("subject")
        .startsWith("http"))
      .select("subject").distinct().limit(3)
      .collect().map(_.getString(0)).toSeq.sorted
    assert(docs.size == 3)
    val sent = scala.collection.mutable.ArrayBuffer[String]()
    withServer { ex =>
      sent += java.net.URLDecoder.decode(
        ex.getRequestURI.getQuery.stripPrefix("query="), "UTF-8")
      // remote knows one fact per item
      (200, resultsJson(docs.map(d => Map("item" -> d, "s" -> "v"))))
    } { ep =>
      val q =
        s"""PREFIX dcterms: <http://purl.org/dc/terms/>
           |SELECT ?item ?s WHERE {
           |  VALUES ?item { ${docs.map(d => s"<$d>").mkString(" ")} }
           |  ?item dcterms:title ?any .
           |  SERVICE <$ep> { ?item <http://ex.org/p> ?s . }
           |}""".stripMargin
      s.conf.set(SparqlSelect.serviceBindingBudgetConf, "2")
      try {
        val rows = SparqlSelect(t, q, SparqlSelect.HttpServiceClient)
          .select("item").collect().map(_.getString(0)).toSet
        assert(rows == docs.toSet, s"chunked union lost rows: $rows")
        // 3 bindings at budget 2 → exactly 2 requests, both VALUES
        assert(sent.size == 2, s"expected 2 chunked requests: $sent")
        assert(sent.forall(_.startsWith(
          "SELECT * WHERE { VALUES (?item) { ")))
        // every binding appears in exactly one chunk
        val mentions = docs.map(d => sent.count(_.contains(s"(<$d>)")))
        assert(mentions == Seq(1, 1, 1), s"chunks not disjoint: $sent")
        // past the chunk cap: maxChunks 1 → 3 bindings > 2×1 → unpushed
        sent.clear()
        s.conf.set(SparqlSelect.serviceMaxChunksConf, "1")
        SparqlSelect(t, q, SparqlSelect.HttpServiceClient).collect()
        assert(sent.size == 1 && sent.head ==
          "SELECT * WHERE { ?item <http://ex.org/p> ?s . }",
          s"chunk-cap overflow must be one unpushed request: $sent")
      } finally {
        s.conf.unset(SparqlSelect.serviceBindingBudgetConf)
        s.conf.unset(SparqlSelect.serviceMaxChunksConf)
      }
    }
  }

  test("BOUND JOIN: a literal-shaped binding DISABLES pushdown (the " +
    "lexical column cannot reproduce a typed literal's remote " +
    "serialization, so pushing could drop rows); past the budget " +
    "the clause falls back to the unpushed SELECT *") {
    val (item, title) = anyItem
    var sent: String = null
    withServer { ex =>
      sent = java.net.URLDecoder.decode(
        ex.getRequestURI.getQuery.stripPrefix("query="), "UTF-8")
      (200, resultsJson(Seq(Map("t" -> title, "lang" -> "nl"))))
    } { ep =>
      // literal-valued shared var: ?t binds titles locally — the
      // clause must go out UNPUSHED and the local lexical join
      // still keeps only the matching row
      val rows = SparqlSelect(t,
        s"""PREFIX dcterms: <http://purl.org/dc/terms/>
           |SELECT ?t ?lang WHERE {
           |  <$item> dcterms:title ?t .
           |  SERVICE <$ep> { ?t <http://ex.org/lang> ?lang . }
           |}""".stripMargin,
        SparqlSelect.HttpServiceClient).collect()
      assert(sent == "SELECT * WHERE { ?t " +
        "<http://ex.org/lang> ?lang . }",
        s"literal binding must fall back to unpushed:\n$sent")
      assert(rows.length == 1 && rows.head.getString(0) == title &&
        rows.head.getString(1) == "nl")
      // overflow: budget 1 with a many-binding local frame
      s.conf.set(SparqlSelect.serviceBindingBudgetConf, "1")
      try {
        SparqlSelect(t,
          s"""PREFIX dcterms: <http://purl.org/dc/terms/>
             |SELECT ?item ?stars WHERE {
             |  ?item dcterms:title ?any .
             |  SERVICE <$ep> { ?item <http://ex.org/stars> ?stars . }
             |}""".stripMargin,
          SparqlSelect.HttpServiceClient).collect()
        assert(sent == "SELECT * WHERE { ?item " +
          "<http://ex.org/stars> ?stars . }",
          s"budget overflow must fall back to unpushed:\n$sent")
      } finally s.conf.unset(SparqlSelect.serviceBindingBudgetConf)
    }
  }

  test("FILTER inside SERVICE rides the remote query text AND is " +
    "re-applied locally, so a non-conformant endpoint cannot widen " +
    "the result") {
    val (item, title) = anyItem
    var sent: String = null
    withServer { ex =>
      sent = java.net.URLDecoder.decode(
        ex.getRequestURI.getQuery.stripPrefix("query="), "UTF-8")
      // a NON-CONFORMANT endpoint: ignores the pushed FILTER and
      // returns rows that do not satisfy it
      (200, resultsJson(Seq(
        Map("item" -> item, "stars" -> "5"),
        Map("item" -> item, "stars" -> "2"))))
    } { ep =>
      s.conf.set(SparqlSelect.serviceBindingBudgetConf, "0")
      val rows = try SparqlSelect(t,
        s"""PREFIX dcterms: <http://purl.org/dc/terms/>
           |SELECT ?item ?title ?stars WHERE {
           |  ?item dcterms:title ?title .
           |  SERVICE <$ep> {
           |    ?item <http://ex.org/stars> ?stars .
           |    FILTER(?stars > 3)
           |  }
           |}""".stripMargin,
        SparqlSelect.HttpServiceClient).collect()
      finally s.conf.unset(SparqlSelect.serviceBindingBudgetConf)
      assert(sent == "SELECT * WHERE { ?item " +
        "<http://ex.org/stars> ?stars . FILTER(?stars > 3) }",
        s"the FILTER must ride the remote query:\n$sent")
      // local re-application pruned the non-matching remote row
      assert(rows.length == 1 && rows.head.getString(0) == item &&
        rows.head.getString(1) == title &&
        rows.head.getString(2) == "5")
    }
  }

  test("FILTER text serialization covers the condition forms; " +
    "binding-site conditions inside SERVICE reject at parse") {
    var sent: String = null
    withServer { ex =>
      sent = java.net.URLDecoder.decode(
        ex.getRequestURI.getQuery.stripPrefix("query="), "UTF-8")
      (200, resultsJson(Nil))
    } { ep =>
      SparqlSelect(t,
        s"""SELECT ?s ?v WHERE {
           |  SERVICE <$ep> {
           |    ?s <http://ex.org/p> ?v .
           |    FILTER(CONTAINS(?v, "a\\"b"))
           |    FILTER(?v = "x" || ?v > 7)
           |    FILTER(?v NOT IN ("p", "q"))
           |  }
           |}""".stripMargin,
        SparqlSelect.HttpServiceClient).collect()
      assert(sent == "SELECT * WHERE { ?s <http://ex.org/p> ?v . " +
        "FILTER(CONTAINS(?v, \"a\\\"b\")) " +
        "FILTER(?v = \"x\" || ?v > 7) " +
        "FILTER(?v NOT IN (\"p\", \"q\")) }",
        s"serialized filter text diverged:\n$sent")
      val err = intercept[IllegalArgumentException] {
        SparqlSelect(t,
          s"""SELECT ?s ?v WHERE {
             |  SERVICE <$ep> {
             |    ?s <http://ex.org/p> ?v .
             |    FILTER(ISIRI(?v))
             |  }
             |}""".stripMargin,
          SparqlSelect.HttpServiceClient)
      }
      assert(err.getMessage.contains("inside SERVICE"))
    }
  }

  test("SERVICE SILENT degrades a failing endpoint to the unit " +
    "solution; without SILENT the failure is loud and names the " +
    "endpoint") {
    withServer(_ => (500, "boom")) { ep =>
      val silent = SparqlSelect(t,
        s"""PREFIX dcterms: <http://purl.org/dc/terms/>
           |SELECT ?item ?title WHERE {
           |  ?item dcterms:title ?title .
           |  SERVICE SILENT <$ep> { ?item <http://ex.org/x> ?y . }
           |}""".stripMargin,
        SparqlSelect.HttpServiceClient)
      // unit solution: the local pattern's rows pass through intact
      val localOnly = SparqlSelect(t,
        """PREFIX dcterms: <http://purl.org/dc/terms/>
          |SELECT ?item ?title WHERE {
          |  ?item dcterms:title ?title . }""".stripMargin)
      assert(silent.count() == localOnly.count() && silent.count() > 0)
      val e = intercept[IllegalArgumentException] {
        SparqlSelect(t,
          s"""SELECT ?x ?y WHERE {
             |  SERVICE <$ep> { ?x <http://ex.org/p> ?y . }
             |}""".stripMargin,
          SparqlSelect.HttpServiceClient).collect()
      }
      assert(e.getMessage.contains(ep))
    }
  }

  test("a NON-HTTP endpoint scheme (mailto:) degrades like any other " +
    "failure: SILENT yields the unit solution, non-SILENT raises the " +
    "named SERVICE error — no ClassCastException escapes fetch") {
    val ep = "mailto:nobody@example.org"
    val silent = SparqlSelect(t,
      s"""PREFIX dcterms: <http://purl.org/dc/terms/>
         |SELECT ?item ?title WHERE {
         |  ?item dcterms:title ?title .
         |  SERVICE SILENT <$ep> { ?item <http://ex.org/x> ?y . }
         |}""".stripMargin,
      SparqlSelect.HttpServiceClient)
    val localOnly = SparqlSelect(t,
      """PREFIX dcterms: <http://purl.org/dc/terms/>
        |SELECT ?item ?title WHERE {
        |  ?item dcterms:title ?title . }""".stripMargin)
    assert(silent.count() == localOnly.count() && silent.count() > 0)
    val e = intercept[IllegalArgumentException] {
      SparqlSelect(t,
        s"""SELECT ?x ?y WHERE {
           |  SERVICE <$ep> { ?x <http://ex.org/p> ?y . }
           |}""".stripMargin,
        SparqlSelect.HttpServiceClient).collect()
    }
    assert(e.getMessage.contains(ep))
  }

  test("a service-only group projects the remote bindings; empty " +
    "remote results yield an empty frame") {
    withServer { _ =>
      (200, resultsJson(Seq(Map("a" -> "x1", "b" -> "y1"),
        Map("a" -> "x2", "b" -> "y2"))))
    } { ep =>
      val df = SparqlSelect(t,
        s"""SELECT ?a ?b WHERE {
           |  SERVICE <$ep> { ?a <http://ex.org/p> ?b . }
           |}""".stripMargin,
        SparqlSelect.HttpServiceClient)
      assert(df.collect().map(r => (r.getString(0), r.getString(1)))
        .toSet == Set(("x1", "y1"), ("x2", "y2")))
    }
    withServer(_ => (200, resultsJson(Nil))) { ep =>
      val df = SparqlSelect(t,
        s"""SELECT ?a WHERE {
           |  SERVICE <$ep> { ?a <http://ex.org/p> "v" . }
           |}""".stripMargin,
        SparqlSelect.HttpServiceClient)
      assert(df.count() == 0)
    }
  }

  test("parser guards: variable endpoints and path patterns inside " +
    "SERVICE reject with named messages; injected clients see " +
    "constants and literals serialized") {
    val e1 = intercept[IllegalArgumentException] {
      SparqlSelect.parse(
        "SELECT ?x WHERE { SERVICE ?ep { ?x <http://p> ?y . } }")
    }
    assert(e1.getMessage.contains("constant endpoint"))
    val e2 = intercept[IllegalArgumentException] {
      SparqlSelect.parse(
        "SELECT ?x WHERE { SERVICE <http://e> { ?x <http://p>+ ?y . } }")
    }
    assert(e2.getMessage.contains("plain triple patterns"))
    // serialization: literal objects escape quotes/backslashes
    val lit = "va\"l" + "\\" + "ue"
    val q = SparqlSelect.serviceQueryText(Seq(SparqlSelect.Pattern(
      SparqlSelect.V("x"), Seq("http://p"), SparqlSelect.L(lit))))
    assert(q == "SELECT * WHERE { ?x <http://p> " +
      "\"va\\\"l\\\\ue\" . }")
  }

  test("malformed JSON results fail closed (None), well-formed " +
    "parse to rows") {
    assert(SparqlSelect.parseSparqlResults("not json").isEmpty)
    assert(SparqlSelect.parseSparqlResults("""{"results": 7}""").isEmpty)
    assert(SparqlSelect.parseSparqlResults(
      """{"results": {"bindings": [{"v": {"novalue": true}}]}}""").isEmpty)
    val ok = SparqlSelect.parseSparqlResults(
      """{"head":{"vars":["v"]},
        |"results":{"bindings":[
        |  {"v":{"type":"uri","value":"http://a"}},
        |  {"v":{"type":"literal","value":"x","xml:lang":"en"}}]}}"""
        .stripMargin)
    assert(ok.contains(Seq(Map("v" -> "http://a"), Map("v" -> "x"))))
  }
}
