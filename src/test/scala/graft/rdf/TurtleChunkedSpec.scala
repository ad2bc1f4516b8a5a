package graft.rdf

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Chunked single-file Turtle parse: byte-range chunks with DFA
  * state composition and statement-boundary resync must reproduce
  * the whole-document parse EXACTLY — on the real fixture corpus
  * serialized to one file, and on adversarial content where naive
  * resync would misfire (dots inside IRIs/names/numbers/comments,
  * statement-shaped text inside long literals straddling chunk
  * edges). */
class TurtleChunkedSpec extends AnyFunSuite {

  private val s = TestSpark.spark
  import s.implicits._

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def writeFile(text: String): String = {
    val f = Files.createTempFile("ttl-chunk", ".ttl")
    Files.writeString(f, text)
    f.toAbsolutePath.toString
  }

  test("fixture corpus as ONE file: chunked parse == whole parse, " +
      "across many small chunks") {
    val tri = TripleFixture.triples(s, "/root/testdata/sf0.001")
    val doc = Turtle.serializeDocuments(tri.coalesce(1))
      .collect().mkString("\n")
    assert(doc.length > 64 * 1024, "fixture doc too small to chunk")
    val path = writeFile(doc)
    val whole = Turtle.parse(Seq(doc).toDS())
    val chunked = TurtleChunked.parse(s, path, chunkBytes = 8192)
    assert(rows(chunked) === rows(whole))
    assert(chunked.count() > 0)
  }

  test("adversarial content: statement-shaped text inside long " +
      "literals straddling chunk edges, dots in names/IRIs/comments") {
    val nastyLong = (1 to 300).map(i =>
      s"""<http://ex.org/fake/$i> <http://ex.org/p> "v$i" .""")
      .mkString("\n") // looks like 300 statements, is ONE literal
    val doc =
      s"""@prefix ex: <http://ex.org/> .
         |@prefix dcterms: <http://purl.org/dc/terms/> .
         |# comment with a dot . and <brackets> and "quotes"
         |ex:a.b ex:p.q "plain" .
         |ex:num ex:val "1.5" .
         |<http://ex.org/iri.with.dots/x> ex:p "dots" .
         |ex:long ex:text \"\"\"$nastyLong\"\"\" .
         |ex:after ex:p "post-long" .
         |ex:multi ex:p "a" ; ex:q "b" , "c" .
         |ex:esc ex:p "quote \\" dot . inside" .
         |ex:last ex:p '''single 'quotes' and . dots
         |across lines''' .
         |""".stripMargin
    val path = writeFile(doc)
    val whole = Turtle.parse(Seq(doc).toDS())
    // 1 KiB chunks: the 300-line literal spans ~10 chunks, every one
    // of which must classify itself as inside-long-string via the
    // composed DFA state, not by looking at its own first bytes
    val chunked = TurtleChunked.parse(s, path, chunkBytes = 1024)
    assert(rows(chunked) === rows(whole))
    assert(rows(chunked).nonEmpty)
  }

  test("single-chunk and chunk-boundary-on-statement-edge cases") {
    val small =
      """@prefix ex: <http://ex.org/> .
        |ex:a ex:p "one" .
        |ex:b ex:p "two" .
        |""".stripMargin
    val smallPath = writeFile(small)
    val smallWhole = Turtle.parse(Seq(small).toDS())
    // chunk size larger than the file: degenerate single chunk
    assert(rows(TurtleChunked.parse(s, smallPath, chunkBytes = 1 << 20))
      === rows(smallWhole))

    // ALIGNED corpus: 64-byte header + 200 statements of exactly 64
    // bytes each, then a chunk-size sweep around the alignment — at
    // cb = 1024 every chunk edge lands exactly on a statement start
    // (the ownership off-by-one a fixed size can miss: a statement
    // starting exactly at a chunk edge must have exactly one owner);
    // nearby sizes land edges mid-name, mid-IRI and mid-literal
    val header = "@prefix ex: <http://ex.org/> .\n" +
      "# pad-pad-pad-pad-pad-pad-pad-pp\n"
    assert(header.getBytes.length == 64)
    val stmts = (0 until 200).map { i =>
      val line = f"ex:s$i%04d ex:p ${"\""}v$i%04d${"x" * 40}${"\""} .\n"
      assert(line.getBytes.length == 64, s"line ${line.length}")
      line
    }.mkString
    val doc = header + stmts
    val path = writeFile(doc)
    val whole = Turtle.parse(Seq(doc).toDS())
    for (cb <- 1024 to 1040) {
      assert(rows(TurtleChunked.parse(s, path, chunkBytes = cb))
        === rows(whole), s"chunkBytes=$cb")
    }
  }

  test("SPARQL-style PREFIX head lines are honored") {
    val doc =
      """PREFIX ex: <http://ex.org/>
        |ex:a ex:p "one" .
        |ex:b ex:q "two" .
        |""".stripMargin
    val path = writeFile(doc)
    val whole = Turtle.parse(Seq(doc).toDS())
    assert(rows(TurtleChunked.parse(s, path, chunkBytes = 1024))
      === rows(whole))
  }

  test("empty short literals immediately followed by the statement " +
      "dot tile consistently across chunk edges") {
    // `'' .` minus the space: the DFA sits in the opened-quote-pair
    // state (16/18) when the dot arrives, and the boundary predicate
    // tests BEFORE stepping — a chunk edge near these dots must not
    // extend region ownership past the edge
    val header = "@prefix ex: <http://ex.org/> .\n"
    val stmts = (0 until 400).map { i =>
      if (i % 2 == 0) f"ex:s$i%04d ex:p ''.%n".replace("\r", "")
      else f"""ex:s$i%04d ex:p "".%n""".replace("\r", "")
    }.mkString
    val doc = header + stmts +
      """ex:mix ex:p '' . ex:mix2 ex:q "" .""" + "\n"
    val path = writeFile(doc)
    val whole = Turtle.parse(Seq(doc).toDS())
    assert(rows(whole).size >= 400, "whole parse must accept ''.")
    // sweep chunk sizes so edges land at every offset within the
    // fixed-width statement lines, incl. between the quotes and dot
    for (cb <- 1024 to 1024 + 20) {
      assert(rows(TurtleChunked.parse(s, path, chunkBytes = cb))
        === rows(whole), s"chunkBytes=$cb")
    }
  }

  test("a body directive in CHUNK 0 fails loudly too") {
    val doc =
      """@prefix ex: <http://ex.org/> .
        |ex:a ex:p "x" .
        |@prefix late: <http://ex.org/late/> .
        |late:y ex:p "z" .
        |""".stripMargin
    // one chunk: the whole body is chunk 0's region — the directive
    // check must not be gated on idx > 0
    val e = intercept[Exception] {
      TurtleChunked.parse(s, writeFile(doc), chunkBytes = 1 << 20).count()
    }
    assert(e.getMessage.contains("directive") ||
      String.valueOf(e.getCause).contains("directive"))
  }

  test("a directive head longer than the probe cap fails loudly " +
      "instead of mis-computing headLen") {
    val line = "# " + "x" * 62 + "\n" // 65 bytes
    val sb = new StringBuilder
    (0 until 17000).foreach(_ => sb.append(line)) // ~1.08 MiB of head
    sb.append("@prefix ex: <http://ex.org/> .\n")
    sb.append("""ex:a ex:p "v" .""").append("\n")
    val e = intercept[IllegalArgumentException] {
      TurtleChunked.parse(s, writeFile(sb.toString), chunkBytes = 1 << 20)
    }
    assert(e.getMessage.contains("probe"))
  }

  test("TriG blocks and out-of-head directives fail loudly") {
    val trig =
      """@prefix ex: <http://ex.org/> .
        |GRAPH <http://ex.org/g> { ex:a ex:p "x" . }
        |""".stripMargin
    val e1 = intercept[Exception] {
      TurtleChunked.parse(s, writeFile(trig), chunkBytes = 1024).count()
    }
    assert(e1.getMessage.contains("TriG") ||
      String.valueOf(e1.getCause).contains("TriG"))

    val bodyDirective =
      "@prefix ex: <http://ex.org/> .\n" +
        (1 to 200).map(i => s"""ex:s$i ex:p "v$i" .""").mkString("\n") +
        "\n@prefix late: <http://ex.org/late/> .\n" +
        """late:x ex:p "y" ."""
    val e2 = intercept[Exception] {
      TurtleChunked.parse(s, writeFile(bodyDirective), chunkBytes = 1024)
        .count()
    }
    assert(e2.getMessage.contains("directive") ||
      String.valueOf(e2.getCause).contains("directive"))
  }
}
