package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming triangle maintainer: micro-batched maintenance must
  * equal a from-scratch count over all lines even when one ORDER's
  * lines straddle batches (the cross-batch-pair case), redelivery
  * must be a no-op, and a crash between the edge-WAL swap and the
  * census swap must be recovered from the stored delta on the next
  * entry. */
class TriangleStreamSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def writeShard(rows: Seq[(Long, Long)], dir: String,
      name: String, ageMs: Long = 0L): Unit = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("ok", "pk")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage-$name")
    val part = new java.io.File(s"$dir/_stage-$name").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val dst = new java.io.File(s"$dir/$name.parquet")
    assert(part.renameTo(dst))
    assert(dst.setLastModified(System.currentTimeMillis() - ageMs))
  }

  private def batchCount(rows: Seq[(Long, Long)]): Long = {
    val s = spark
    import s.implicits._
    val m = graft.queries.RelationalQueries.getClass
      .getDeclaredMethods.find(_.getName == "triangleCountOf").get
    m.setAccessible(true)
    m.invoke(graft.queries.RelationalQueries, rows.toDF("ok", "pk"))
      .asInstanceOf[org.apache.spark.sql.DataFrame]
      .collect().head.getLong(2)
  }

  test("cross-batch order pairs, redelivery no-op, crash recovery " +
    "from the edge WAL") {
    val s = spark
    import s.implicits._
    // order 1 straddles shards: lines 1,2 then 3 — the (1,3)/(2,3)
    // pairs exist in no single batch; order 2 adds a disjoint pair
    val shard0 = Seq((1L, 1L), (1L, 2L), (2L, 10L))
    val shard1 = Seq((1L, 3L), (2L, 11L))
    val dir = tmp("tri-in")
    writeShard(shard0, dir, "shard0", ageMs = 90000L)
    writeShard(shard1, dir, "shard1", ageMs = 60000L)
    val mirror = tmp("tri-mirror") + "/lines"
    val edges = tmp("tri-edges") + "/edges"
    val count = tmp("tri-count") + "/census"
    val ckpt = tmp("tri-ckpt")
    TriangleStream.startTriangleMaintenance(
      TriangleStream.lines(spark, dir, maxFilesPerTrigger = Some(1)),
      mirror, edges, count, ckpt).awaitTermination()
    val truth = batchCount(shard0 ++ shard1)
    assert(truth == 1L) // order 1's {1,2,3}
    assert(TriangleStream.readCensus(spark, count)
      .head().getLong(0) == truth)

    // full redelivery through a fresh checkpoint: guard skips all
    TriangleStream.startTriangleMaintenance(
      TriangleStream.lines(spark, dir, maxFilesPerTrigger = Some(1)),
      mirror, edges, count, tmp("tri-ckpt2")).awaitTermination()
    assert(TriangleStream.readCensus(spark, count)
      .head().getLong(0) == truth)

    // simulate a crash between the two swaps: an edge-WAL batch
    // (bid beyond the census) whose rows close two triangles with
    // stored edges — the census is stale until the next entry
    val staleBid = spark.read.parquet(count).head().getLong(0) + 1
    Seq((1L, 4L, staleBid), (2L, 4L, staleBid), (3L, 4L, staleBid))
      .toDF("a", "b", "bid")
      .write.mode("append").parquet(edges)
    // ALSO mirror the lines the WAL rows came from, as the crashed
    // batch would have (order 3 bought parts 1..4 minus the pairs
    // already present is immaterial — recovery reads the WAL only)
    writeShard(Seq((3L, 99L)), dir, "shard2")
    TriangleStream.startTriangleMaintenance(
      TriangleStream.lines(spark, dir, maxFilesPerTrigger = Some(1)),
      mirror, edges, count, ckpt).awaitTermination()
    // node 4 now closes {1,2,4}, {1,3,4}, {2,3,4} with the stored
    // {1,2},{1,3},{2,3} edges → +3; shard2's lone line adds none
    assert(TriangleStream.readCensus(spark, count)
      .head().getLong(0) == truth + 3)
  }
}
