package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Stream == batch for the entailment maintainer: any shard split of
  * the instance set, streamed one file per micro-batch, yields (after
  * merge-on-read dedup) exactly the batch closure of all instances —
  * plus the at-least-once replay guard. */
class RdfStreamSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("3-shard stream == batch entailment; replayed batch appends " +
      "nothing") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("rdfstream").toFile.getAbsolutePath
    val src = s"$base/src"
    val out = s"$base/out"
    // the full instance frame, split into three disjoint shards
    val inst = Tables(s, dir, "part")
      .select(col("p_partkey").as("k"), col("p_size").as("v"))
    (0 until 3).foreach { i =>
      inst.filter(col("k") % 3 === i).coalesce(1)
        .write.mode("append").parquet(src)
    }
    val q = RdfStream.startEntailMaintenance(
      RdfStream.instances(s, src, maxFilesPerTrigger = Some(1)),
      dir, out, s"$base/chk")
    q.awaitTermination()
    val streamed = RdfStream.readEntailed(s, out)
      .as[(String, String, String)].collect().toSet
    val batch = graft.rdf.RdfQueries.queries("rdf_rdfs_entail")(s, dir)
      .as[(String, String, String)].collect().toSet
    assert(streamed === batch)
    // at-least-once: replay every shard through a FRESH checkpoint —
    // the src_k anti-join must append zero rows
    val nFiles = new java.io.File(out).listFiles()
      .count(_.getName.startsWith("part-"))
    val q2 = RdfStream.startEntailMaintenance(
      RdfStream.instances(s, src, maxFilesPerTrigger = Some(1)),
      dir, out, s"$base/chk2")
    q2.awaitTermination()
    assert(RdfStream.readEntailed(s, out)
      .as[(String, String, String)].collect().toSet === batch)
    val rows = spark.read.parquet(out).count()
    val distinctRows = spark.read.parquet(out)
      .select("src_k", "subject", "predicate", "obj").distinct().count()
    assert(rows === distinctRows,
      s"replay appended duplicate rows ($nFiles files before)")
  }
}
