package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.{Pipeline, TestSpark}
import graft.rdf.Vocab._

/** Default HTTP clients (O1/O8/O14) against a loopback server: the
  * reference's endpoint shapes, pagination stop, error propagation,
  * and the full runHttp end-to-end. */
class OmekaHttpSpec extends AnyFunSuite {

  private def withServer(routes: Map[String, HttpExchange => (Int, String)])
      (body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, handler) =>
      server.createContext(path, { (ex: HttpExchange) =>
        val (code, resp) = handler(ex)
        val bytes = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
        ex.close()
      })
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/")
    finally server.stop(0)
  }

  private def page(i: Int): String =
    s"""@prefix dcterms: <http://purl.org/dc/terms/> .
       |@prefix ceo: <https://linkeddata.cultureelerfgoed.nl/def/ceo#> .
       |<http://x/$i> dcterms:title "Item $i"@nl .
       |<http://x/$i> ceo:rijksmonumentnummer "RM1$i" .
       |""".stripMargin

  private def queryParam(ex: HttpExchange, key: String): Option[String] =
    Option(ex.getRequestURI.getQuery).flatMap(_.split("&")
      .map(_.split("=", 2)).collectFirst {
        case Array(k, v) if k == key => v
      })

  test("fetchPage follows the reference URL shape and the ≤2-byte stop") {
    val seen = collection.mutable.ArrayBuffer[String]()
    withServer(Map("/api/items" -> { ex =>
      seen += ex.getRequestURI.toString
      val p = queryParam(ex, "page").get.toInt
      assert(queryParam(ex, "per_page").contains("100"))
      assert(queryParam(ex, "format").contains("turtle"))
      (200, if (p <= 2) page(p) else "\n")
    })) { base =>
      val http = new OmekaHttp(base)
      val pages = OmekaSource.fetchPages(http.fetchPage)
      assert(pages.size == 2)
      assert(seen.size == 3) // stopped after the first ≤2-byte body
    }
  }

  test("non-2xx fails the page loop (no silent half-export)") {
    withServer(Map("/api/items" -> { _ => (503, "unavailable") })) { base =>
      val http = new OmekaHttp(base)
      intercept[java.io.IOException] {
        OmekaSource.fetchPages(http.fetchPage)
      }
    }
  }

  test("monument fetcher URL-encodes keys and parses Turtle; " +
    "best-effort under Enrichment.fetchAll") {
    withServer(Map("/run" -> { ex =>
      queryParam(ex, "rijksmonumentnummer") match {
        case Some("12") => (200,
          """@prefix ceo: <https://linkeddata.cultureelerfgoed.nl/def/ceo#> .
            |<http://mon/12> a ceo:Rijksmonument .
            |""".stripMargin)
        case _ => (500, "boom")
      }
    })) { base =>
      val fetch = HttpMonumentFetcher(s"${base}run?rijksmonumentnummer=")
      assert(fetch("12").map(t => (t._2, t._5)) ==
        Seq(("http://mon/12", CeoRijksmonument)))
      // executor-side usability: the function must survive serialization
      val out = new java.io.ObjectOutputStream(
        new java.io.ByteArrayOutputStream())
      out.writeObject(fetch) // throws NotSerializableException on regression
      intercept[java.io.IOException] { fetch("99") }
    }
  }

  test("runHttp end-to-end: pages + api-context + enrichment over HTTP") {
    withServer(Map(
      "/api/items" -> { ex =>
        val p = queryParam(ex, "page").get.toInt
        (200, if (p == 1) page(1) else "")
      },
      "/api-context" -> { _ =>
        (200, """{"@context": {"fetched": "http://fetched.example/ns#"}}""")
      },
      "/run" -> { ex =>
        queryParam(ex, "rijksmonumentnummer") match {
          case Some("11") => (200,
            """@prefix ceo: <https://linkeddata.cultureelerfgoed.nl/def/ceo#> .
              |<http://x/1> a ceo:Rijksmonument .
              |""".stripMargin)
          case _ => (404, "")
        }
      })) { base =>
      val result = Pipeline.runHttp(TestSpark.spark, base,
        s"${base}run?rijksmonumentnummer=", env = Map.empty)
      assert(result.prefixes("fetched") == "http://fetched.example/ns#")
      val got = result.triples.collect()
        .map(r => (r.getString(1), r.getString(3))).toSet
      // title + rmnr survive cleaning; enrichment typed x/1 → sameAs derived
      assert(got == Set(
        ("http://x/1", DctermsTitle),
        ("http://x/1", CeoRijksmonumentnummer),
        ("http://x/1", RdfType),
        ("http://x/1", SdoSameAs)))
    }
  }
}
