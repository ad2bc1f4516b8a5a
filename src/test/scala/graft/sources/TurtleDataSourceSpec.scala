package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.rdf.Turtle

/** `spark.read.format("turtle")` — one file = one partition = one
  * parsed document. */
class TurtleDataSourceSpec extends AnyFunSuite {

  private def doc(i: Int): String =
    s"""@prefix ex: <http://ex.org/> .
       |<http://x/$i> ex:p "v$i"@nl .
       |<http://x/$i> ex:q <http://y/$i> .
       |_:b$i ex:r ${i}4 .
       |""".stripMargin

  test("reads a directory of Turtle documents into the triple schema") {
    val dir = Files.createTempDirectory("ttl").toFile
    (1 to 3).foreach { i =>
      Files.writeString(new java.io.File(dir, s"page$i.ttl").toPath, doc(i))
    }
    val df = TestSpark.spark.read.format("turtle")
      .load(dir.getAbsolutePath)
    assert(df.columns.toSeq == graft.rdf.Model.columns)
    assert(df.count() == 9)
    assert(df.rdd.getNumPartitions == 3) // one partition per document
    val expected = (1 to 3).flatMap(i => Turtle.parseDocument(doc(i))).toSet
    val got = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getString(6), r.getString(7)))
      .toSet
    assert(got == expected)
  }

  test("graph option sets the graph column") {
    val dir = Files.createTempDirectory("ttl2").toFile
    Files.writeString(new java.io.File(dir, "a.ttl").toPath, doc(1))
    val df = TestSpark.spark.read.format("turtle")
      .option("graph", "g1").load(dir.getAbsolutePath)
    assert(df.select("graph").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("g1"))
  }

  test("hidden, temp, and staging files are never read as data") {
    val dir = Files.createTempDirectory("ttlhidden").toFile
    Files.writeString(new java.io.File(dir, "a.ttl").toPath, doc(1))
    Files.writeString(new java.io.File(dir, "_SUCCESS").toPath, "")
    Files.writeString(new java.io.File(dir, ".tmp-0-1.ttl").toPath,
      "@prefix ex: <http://ex.org/> .\n<http://crash/1> ex:p \"partial")
    val staging = new java.io.File(dir, "_staging-dead")
    staging.mkdir()
    Files.writeString(new java.io.File(staging, "part-00000.ttl").toPath,
      doc(9))
    val df = TestSpark.spark.read.format("turtle")
      .load(dir.getAbsolutePath)
    assert(df.count() == 3) // only a.ttl; no parse error from leftovers
    assert(df.filter("subject LIKE 'http://crash%'").isEmpty)
  }

  test("a glob matching nothing is an error, not an empty corpus") {
    val dir = Files.createTempDirectory("ttlnone").toFile
    Files.writeString(new java.io.File(dir, "a.ttl").toPath, doc(1))
    val e = intercept[Exception] {
      TestSpark.spark.read.format("turtle")
        .load(s"${dir.getAbsolutePath}/*.tttl").count()
    }
    assert(e.getMessage.contains("does not exist"))
  }

  test("overwrite is job-atomic: committed corpus replaced wholesale") {
    val spark = TestSpark.spark
    val src = Files.createTempDirectory("ttlsrc2").toFile
    (1 to 2).foreach { i =>
      Files.writeString(new java.io.File(src, s"p$i.ttl").toPath, doc(i))
    }
    val df = spark.read.format("turtle").load(src.getAbsolutePath)
    val out = Files.createTempDirectory("ttlow").toFile.getAbsolutePath
    df.write.format("turtle").mode("overwrite").save(out)
    val first = spark.read.format("turtle").load(out).collect().toSet
    df.limit(1).coalesce(1).write.format("turtle")
      .mode("overwrite").save(out)
    val second = spark.read.format("turtle").load(out).collect().toSet
    assert(first.size == 6 && second.size == 1)
    // no staging/temp leftovers after the commits (dot-files are
    // Hadoop checksum metadata, hidden from the reader)
    assert(new java.io.File(out).listFiles
      .forall(f => f.getName.matches("part-\\d+\\.ttl") ||
        f.getName.startsWith(".")))
  }

  test("syntax=trig write round-trips the graph column through DSv2") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows: Seq[Turtle.FlatTriple] = Seq(
      ("default", "http://x/1", "iri", "http://ex.org/p", "v1",
        "literal", null, null),
      ("http://g/a", "http://x/2", "iri", "http://ex.org/p", "v2",
        "literal", "nl", null))
    val df = graft.TestSpark.triples(rows)
    val out = Files.createTempDirectory("trigw").toFile.getAbsolutePath
    df.write.format("turtle").option("syntax", "trig")
      .mode("overwrite").save(out)
    assert(new java.io.File(out).listFiles
      .exists(_.getName.endsWith(".trig")))
    val back = spark.read.format("turtle").load(out)
      .as[Turtle.FlatTriple].collect().toSet
    assert(back == rows.toSet)
  }

  test("syntax=nt write emits prefix-free N-Triples that read back") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows: Seq[Turtle.FlatTriple] = Seq(
      ("default", "http://x/1", "iri", "http://ex.org/p", "multi\nline",
        "literal", null, null),
      ("default", "http://x/2", "iri", "http://ex.org/q", "http://x/1",
        "iri", null, null))
    val df = graft.TestSpark.triples(rows)
    val out = Files.createTempDirectory("ntw").toFile.getAbsolutePath
    df.write.format("turtle").option("syntax", "nt")
      .mode("overwrite").save(out)
    val files = new java.io.File(out).listFiles.filter(
      _.getName.endsWith(".nt"))
    assert(files.nonEmpty)
    val text = files.map(f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath))).mkString
    assert(!text.contains("@prefix"))
    val back = spark.read.format("turtle").load(s"$out/*.nt")
      .as[Turtle.FlatTriple].collect().toSet
    assert(back == rows.toSet)
  }

  test("glob patterns select matching files only") {
    val dir = Files.createTempDirectory("ttlglob").toFile
    Files.writeString(new java.io.File(dir, "a.ttl").toPath, doc(1))
    Files.writeString(new java.io.File(dir, "b.ttl").toPath, doc(2))
    Files.writeString(new java.io.File(dir, "ignore.txt").toPath,
      "not turtle at all")
    val df = TestSpark.spark.read.format("turtle")
      .load(s"${dir.getAbsolutePath}/*.ttl")
    assert(df.count() == 6) // two documents, the .txt never parsed
  }

  test("scope_bnodes keeps same-labeled bnodes from different files apart") {
    val dir = Files.createTempDirectory("ttl3").toFile
    Files.writeString(new java.io.File(dir, "a.ttl").toPath,
      "@prefix ex: <http://ex.org/> .\n_:b0 ex:p \"one\" .\n")
    Files.writeString(new java.io.File(dir, "b.ttl").toPath,
      "@prefix ex: <http://ex.org/> .\n_:b0 ex:p \"two\" .\n")
    val plain = TestSpark.spark.read.format("turtle")
      .load(dir.getAbsolutePath)
    assert(plain.select("subject").distinct().count() == 1) // conflated
    val scoped = TestSpark.spark.read.format("turtle")
      .option("scope_bnodes", "true").load(dir.getAbsolutePath)
    assert(scoped.select("subject").distinct().count() == 2)
  }

  test("executor-side reads use the session Hadoop conf (custom scheme)") {
    val spark = TestSpark.spark
    val dir = Files.createTempDirectory("ttl4").toFile
    Files.writeString(new java.io.File(dir, "a.ttl").toPath, doc(7))
    // a filesystem scheme that ONLY exists in the session Hadoop conf:
    // if the partition reader built its own `new Configuration()` (the
    // old bug), executor-side opens would fail with "No FileSystem for
    // scheme graftest". The FS cache is disabled for the scheme so the
    // reader can't ride on a driver-side cached instance.
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graftest.impl", classOf[GraftTestFs].getName)
    hc.set("fs.graftest.impl.disable.cache", "true")
    try {
      val df = spark.read.format("turtle")
        .load(s"graftest://${dir.getAbsolutePath}")
      assert(df.count() == 3)
    } finally {
      hc.unset("fs.graftest.impl")
      hc.unset("fs.graftest.impl.disable.cache")
    }
  }

  test("write → read round-trips; overwrite truncates; prefixes emitted") {
    val spark = TestSpark.spark
    val dir = Files.createTempDirectory("ttlw").toFile.getAbsolutePath
    val df1 = spark.read.format("turtle").load {
      val d = Files.createTempDirectory("ttlsrc").toFile
      (1 to 2).foreach { i =>
        Files.writeString(new java.io.File(d, s"p$i.ttl").toPath, doc(i))
      }
      d.getAbsolutePath
    }
    df1.write.format("turtle")
      .option("prefixes", """{"ex": "http://ex.org/"}""")
      .mode("overwrite").save(dir)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".ttl"))
    assert(files.nonEmpty)
    assert(Files.readString(files.head.toPath)
      .contains("@prefix ex: <http://ex.org/> ."))
    val back = spark.read.format("turtle").load(dir)
    assert(back.collect().toSet == df1.collect().toSet)
    // overwrite clears previous contents (named-graph publish semantic)
    val smaller = df1.limit(1).coalesce(1)
    smaller.write.format("turtle").mode("overwrite").save(dir)
    assert(spark.read.format("turtle").load(dir).count() == 1)
  }
}

/** Local filesystem under a custom scheme, resolvable only through the
  * session Hadoop conf — proves executor readers see driver settings. */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftest:///")
}
