package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Paginated source (O1/O2/O8) with an injected fetch. */
class OmekaSourceSpec extends AnyFunSuite {

  private def page(i: Int): String =
    s"""@prefix ex: <http://ex.org/> .
       |<http://x/$i> ex:p "v$i" .
       |<http://x/shared> ex:p "same" .
       |""".stripMargin

  test("stops at the first ≤2-byte page (reference stop condition)") {
    val calls = collection.mutable.ArrayBuffer[Int]()
    val pages = OmekaSource.fetchPages { p =>
      calls += p
      if (p <= 3) page(p) else "\n"
    }
    assert(pages.size == 3 && calls.toSeq == Seq(1, 2, 3, 4))
  }

  test("caps at 99 pages when no empty page appears") {
    val pages = OmekaSource.fetchPages(p => page(p))
    assert(pages.size == OmekaSource.MaxPages)
  }

  test("load parses pages distributedly with set semantics") {
    val df = OmekaSource.load(TestSpark.spark,
      p => if (p <= 3) page(p) else "")
    // 3 distinct per-page triples + 1 shared triple (deduped)
    assert(df.count() == 4)
    assert(df.filter("subject = 'http://x/shared'").count() == 1)
  }

  test("api-context parse strips backslashes and non-string bindings") {
    val json =
      """{"@context": {
        |  "dcterms": "http:\\/\\/purl.org\\/dc\\/terms\\/",
        |  "o": "http://omeka.org/s/vocabs/o#",
        |  "ignored": {"@id": "http://x/"},
        |  "alsoIgnored": 7}}""".stripMargin
    val ctx = OmekaSource.parseApiContext(json)
    assert(ctx == Map(
      "dcterms" -> "http://purl.org/dc/terms/",
      "o" -> "http://omeka.org/s/vocabs/o#"))
  }

  test("empty or missing @context yields an empty map") {
    assert(OmekaSource.parseApiContext("{}").isEmpty)
    assert(OmekaSource.parseApiContext("""{"@context": []}""").isEmpty)
  }
}
