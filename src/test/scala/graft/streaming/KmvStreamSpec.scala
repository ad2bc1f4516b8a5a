package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.LlmQueries

/** Streaming KMV sketch maintenance must converge to the SAME sketch
  * as one monolithic batch build, for ANY shard-to-micro-batch split
  * (bottom-k merge is order- and split-invariant), and survive a
  * replayed merge (idempotence).
  */
class KmvStreamSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def writeShard(dir: String, name: String,
      lo: Long, hi: Long): Unit = {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_stage-$name")
    val part = new java.io.File(s"$dir/_stage-$name").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    assert(part.renameTo(new java.io.File(s"$dir/$name.parquet")))
  }

  private def sketchSet(path: String): Set[(String, Long)] =
    spark.read.parquet(path).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  test("streamed sketch equals the monolithic batch sketch; a late " +
    "shard only refines it; estimates come from the sketch alone") {
    val dir = Files.createTempDirectory("kmv-docs").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("kmv-ckpt").toFile.getAbsolutePath
    val sk = Files.createTempDirectory("kmv-sketch").toFile.getAbsolutePath +
      "/sketch"
    writeShard(dir, "shard0", 0L, 40L)
    writeShard(dir, "shard1", 40L, 95L)

    def runOnce(): Unit = {
      // one file per micro-batch: exercises a multi-batch merge chain
      val q = DocsStream.startKmvMaintenance(
        DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
        sk, ckpt)
      q.awaitTermination()
    }

    runOnce()
    val batchSketch = LlmQueries.kmvPartialOf(spark.read.parquet(dir))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(sketchSet(sk) == batchSketch && batchSketch.nonEmpty)

    // estimate from the stored sketch == estimate inside the full
    // incremental query (est_merged of llm_kmv_incremental's shape)
    val est = LlmQueries.kmvEstimateOf(spark.read.parquet(sk))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val full = LlmQueries.kmvDistinctOf(spark.read.parquet(dir))
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(est == full)

    // late shard: merged sketch re-converges to the batch build
    writeShard(dir, "shard2", 95L, 150L)
    runOnce()
    val after = LlmQueries.kmvPartialOf(spark.read.parquet(dir))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(sketchSet(sk) == after)
  }

  test("merge is idempotent: re-merging a partial leaves the sketch unchanged") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 50L)
    val p = LlmQueries.kmvPartialOf(docs).localCheckpoint()
    val once = LlmQueries.kmvMergeRows(p, p)
    assert(once.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      p.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
  }
}
