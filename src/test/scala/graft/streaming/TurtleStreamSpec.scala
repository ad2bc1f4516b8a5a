package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.rdf.Turtle

/** Streaming Turtle ingest: set-equality with the batch parser over
  * the same documents, and incremental discovery of late file drops
  * through the checkpoint. */
class TurtleStreamSpec extends AnyFunSuite {

  private def doc(i: Int): String =
    s"""@prefix ex: <http://ex.org/> .
       |<http://x/$i> ex:p "v$i"@nl .
       |_:b0 ex:q <http://x/$i> .
       |""".stripMargin

  test("stream parse == batch parse over the same document directory, " +
    "and a late file drop is picked up incrementally") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("ttl-stream").toFile
    val ckpt = Files.createTempDirectory("ttl-ckpt").toFile.getAbsolutePath
    val out = Files.createTempDirectory("ttl-out").toFile.getAbsolutePath
    (1 to 3).foreach { i =>
      Files.writeString(new java.io.File(dir, s"p$i.ttl").toPath, doc(i))
    }

    def runOnce(): Unit = {
      val q = TurtleStream.triples(spark, dir.getAbsolutePath)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce()
    val streamed = spark.read.parquet(out)
      .as[Turtle.FlatTriple].collect().toSet
    val batch = Turtle.parse(
      spark.createDataset((1 to 3).map(doc)), scopeBnodeLabels = true)
      .as[Turtle.FlatTriple].collect().toSet
    assert(streamed == batch)
    // bnode scoping held per document (3 distinct _:b0 nodes)
    assert(streamed.count(_._2.startsWith("_:")) == 3)

    // late drop: only the new file is processed on the next run
    Files.writeString(new java.io.File(dir, "p4.ttl").toPath, doc(4))
    runOnce()
    val after = spark.read.parquet(out)
      .as[Turtle.FlatTriple].collect().toSet
    assert((after -- streamed) ==
      Turtle.parseDocument(doc(4), scopeBnodeLabels = true).toSet)
  }

  test("dedup-append sink applies set semantics across batches " +
    "with zero streaming state") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("ttl-dd").toFile
    val ckpt = Files.createTempDirectory("ttl-dd-ckpt").toFile.getAbsolutePath
    val out = Files.createTempDirectory("ttl-dd-out").toFile.getAbsolutePath

    // batch 1: two files, one shared triple between them
    val shared = "@prefix ex: <http://ex.org/> .\n<http://x/s> ex:p \"v\" .\n"
    Files.writeString(new java.io.File(dir, "a.ttl").toPath, doc(1))
    Files.writeString(new java.io.File(dir, "b.ttl").toPath, shared)
    def runOnce(): Unit = {
      val q = TurtleStream.startDedupAppend(
        TurtleStream.triples(spark, dir.getAbsolutePath), out, ckpt)
      q.awaitTermination()
    }
    runOnce()
    // batch 2: a byte-identical re-drop of the shared page (re-fetch)
    // plus one new document
    Files.writeString(new java.io.File(dir, "c.ttl").toPath, shared)
    Files.writeString(new java.io.File(dir, "d.ttl").toPath, doc(2))
    runOnce()

    val got = spark.read.parquet(out).as[Turtle.FlatTriple].collect().toSeq
    assert(got.size == got.distinct.size, "duplicates reached the sink")
    val want = (Turtle.parseDocument(doc(1), scopeBnodeLabels = true) ++
      Turtle.parseDocument(shared, scopeBnodeLabels = true) ++
      Turtle.parseDocument(doc(2), scopeBnodeLabels = true)).toSet
    assert(got.toSet == want)
  }

  private def monDoc(keys: String*): String =
    ("@prefix ceo: <https://linkeddata.cultureelerfgoed.nl/def/ceo#> .\n" +
      keys.zipWithIndex.map { case (k, i) =>
        s"""<http://x/$k-$i> ceo:rijksmonumentnummer "$k" ."""
      }.mkString("\n") + "\n")

  test("enrichment gate: stream emits exactly the batch TTL fetch " +
    "list, dedups keys across micro-batches, zero streaming state") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("ttl-gate").toFile
    val ckpt = Files.createTempDirectory("gate-ckpt").toFile.getAbsolutePath
    val out = Files.createTempDirectory("gate-out").toFile.getAbsolutePath
    // ledger: 11 stale (age 9), 22 fresh (age 2); 33/44 never fetched
    val ledger = Seq(("11", 9), ("22", 2)).toDF("monument_key", "age_days")
    Files.writeString(new java.io.File(dir, "a.ttl").toPath,
      monDoc("RM11", "22"))
    Files.writeString(new java.io.File(dir, "b.ttl").toPath, monDoc("33"))
    def runOnce(): Unit = TurtleStream.startEnrichmentGate(
      TurtleStream.triples(spark, dir.getAbsolutePath), ledger, out,
      ckpt, ttlDays = 7).awaitTermination()
    runOnce()
    def emitted(): Set[(String, String)] = spark.read.parquet(out)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // == the batch fetch list over the same triples (stream==batch)
    val batchTriples = Turtle.parse(
      spark.createDataset(Seq(monDoc("RM11", "22"), monDoc("33"))))
    val batchList = graft.rdf.RdfOps.enrichmentFetchList(
      graft.rdf.RdfOps.enrichmentKeys(batchTriples), ledger, 7)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(emitted() == batchList &&
      batchList == Set(("11", "stale"), ("33", "missing")))
    // late drop: a re-mention of 11 (already emitted — suppressed)
    // and a new never-fetched key 44
    Files.writeString(new java.io.File(dir, "c.ttl").toPath,
      monDoc("11", "44"))
    runOnce()
    assert(emitted() == batchList + (("44", "missing")))
  }
}
