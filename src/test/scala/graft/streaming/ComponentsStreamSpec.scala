package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming CC maintainer: the maintained rollup must equal a
  * from-scratch converged CC over everything delivered — including
  * batches that MERGE components created by earlier batches (the
  * remap-fold case) and chains through re-pointed representatives —
  * and full redelivery must be a fixed point. */
class ComponentsStreamSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def writeShard(rows: Seq[(Long, Long)], dir: String,
      name: String, ageMs: Long = 0L): Unit = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("a", "b")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage-$name")
    val part = new java.io.File(s"$dir/_stage-$name").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val dst = new java.io.File(s"$dir/$name.parquet")
    assert(part.renameTo(dst))
    assert(dst.setLastModified(System.currentTimeMillis() - ageMs))
  }

  private def truth(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    graft.llm.LlmQueries.ccFromPairs(edges.toDF("doc_a", "doc_b"))
      .groupBy("cluster_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def got(labels: String, remap: String): Map[Long, Long] =
    ComponentsStream.readComponents(spark, labels, remap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cross-batch merges, representative chains, redelivery " +
    "fixed point") {
    // batch 0: {1,2} and {5,6}; batch 1: {3,4}; batch 2 merges all
    // four via 2-5 and 4-6, and chains a new node 9 onto 1
    val s0 = Seq((1L, 2L), (5L, 6L))
    val s1 = Seq((3L, 4L))
    val s2 = Seq((2L, 5L), (4L, 6L), (1L, 9L))
    val dir = tmp("cc-in")
    writeShard(s0, dir, "shard0", ageMs = 90000L)
    writeShard(s1, dir, "shard1", ageMs = 60000L)
    writeShard(s2, dir, "shard2", ageMs = 30000L)
    val labels = tmp("cc-labels") + "/labels"
    val remap = tmp("cc-remap") + "/remap"
    val ckpt = tmp("cc-ckpt")
    ComponentsStream.startComponentMaintenance(
      ComponentsStream.edges(spark, dir, maxFilesPerTrigger = Some(1)),
      labels, remap, ckpt).awaitTermination()
    val want = truth(s0 ++ s1 ++ s2)
    assert(want == Map(1L -> 7L)) // all eight? 1,2,5,6,3,4,9 = 7 nodes
    assert(got(labels, remap) == want)

    // full redelivery through a fresh checkpoint: algebraic fixed
    // point — contracted self-loops merge nothing
    ComponentsStream.startComponentMaintenance(
      ComponentsStream.edges(spark, dir, maxFilesPerTrigger = Some(1)),
      labels, remap, tmp("cc-ckpt2")).awaitTermination()
    assert(got(labels, remap) == want)

    // a later batch adds a disjoint pair and merges NOTHING
    writeShard(Seq((100L, 101L)), dir, "shard3")
    ComponentsStream.startComponentMaintenance(
      ComponentsStream.edges(spark, dir, maxFilesPerTrigger = Some(1)),
      labels, remap, ckpt).awaitTermination()
    assert(got(labels, remap) == want + (100L -> 2L))
  }
}
