package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.LlmQueries

/** The streaming crawl ingest: raw `.warc` files on disk, consumed
  * by the binaryFile source one file per micro-batch, must produce
  * exactly the batch chain's rows — gates included. */
class WarcStreamSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def rec(typ: String, uri: String, body: String): String = {
    val u = if (uri == null) "" else s"WARC-Target-URI: $uri\r\n"
    s"WARC/1.0\r\nWARC-Type: $typ\r\n$u" +
      s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n"
  }

  private def http(status: String, ctype: String, page: String) =
    s"HTTP/1.1 $status\r\nContent-Type: $ctype\r\n\r\n$page"

  test("file-per-batch streaming ingest == batch chain, gates " +
    "applied, appends accumulate") {
    val dir = tmp("warc-in")
    Files.write(Paths.get(dir, "a.warc"),
      (rec("warcinfo", null, "software: graft") +
        rec("response", "http://ex.com/1",
          http("200 OK", "text/html",
            "<html><p>alpha beta</p></html>")) +
        rec("response", "http://ex.com/2",
          http("404 Not Found", "text/html", "<html>gone</html>")))
        .getBytes("US-ASCII"))
    Files.write(Paths.get(dir, "b.warc"),
      (rec("response", "http://ex.com/3",
        http("200 OK", "application/pdf", "%PDF junk")) +
        rec("response", "http://ex.com/4",
          http("200 OK", "text/html",
            "<html><h1>T</h1><p>gamma  delta epsilon</p></html>")))
        .getBytes("US-ASCII"))
    // a gzipped archive, one member per record (Common Crawl's
    // actual shipping layout) — must flow through the same chain
    def gz(s: String): Array[Byte] =
      graft.functions.GzipMember.compress(s.getBytes("US-ASCII"))
    Files.write(Paths.get(dir, "c.warc.gz"),
      gz(rec("warcinfo", null, "software: graft")) ++
        gz(rec("response", "http://ex.com/5",
          http("200 OK", "text/html",
            "<html><p>zeta eta</p></html>"))))
    // a non-warc file the glob must ignore
    Files.write(Paths.get(dir, "notes.txt"), "junk".getBytes)

    val out = tmp("warc-out") + "/pages"
    DocsStream.startWarcIngest(
      DocsStream.archives(spark, dir, maxFilesPerTrigger = Some(1)),
      out, tmp("warc-ckpt")).awaitTermination()

    val got = spark.read.parquet(out)
    val truth = LlmQueries.ingestArchives(
      spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{warc,warc.gz}")
        .load(dir).select(col("content").as("payload")),
      Seq.empty)
    assert(got.collect().map(_.toSeq).toSet ==
      truth.collect().map(_.toSeq).toSet)
    // only the three 200/text-html pages survive; text cleaned
    val byUri = got.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byUri.keySet == Set("http://ex.com/1", "http://ex.com/4",
      "http://ex.com/5"))
    assert(byUri("http://ex.com/1") == ((2L, 10L))) // "alpha beta"
    assert(byUri("http://ex.com/4") == ((4L, 21L))) // "T gamma delta epsilon"
    assert(byUri("http://ex.com/5") == ((2L, 8L))) // "zeta eta"
  }
}
