package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.LlmQueries

/** Streaming HLL maintenance must equal the monolithic batch sketch
  * for ANY shard-to-micro-batch split — register max is HLL's exact
  * merge, so split-invariance is algebraic, not approximate — and
  * refine under late shards. */
class HllStreamSpec extends AnyFunSuite {

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

  private def streamedEst(path: String): Map[String, Long] =
    LlmQueries.hllEstimateOf(DocsStream.readHllRegs(spark, path))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

  private def batchEst(dir: String): Map[String, Long] =
    LlmQueries.hllDistinctOf(spark.read.parquet(dir))
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap

  test("streamed registers fold to the batch estimate; late shards " +
    "refine to the new batch truth") {
    val dir = Files.createTempDirectory("hll-docs").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("hll-ckpt").toFile.getAbsolutePath
    val regs = Files.createTempDirectory("hll-regs").toFile
      .getAbsolutePath + "/regs"
    writeShard(dir, "shard0", 0L, 40L)
    writeShard(dir, "shard1", 40L, 95L)

    def runOnce(): Unit = {
      val q = DocsStream.startHllMaintenance(
        DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
        regs, ckpt)
      q.awaitTermination()
    }

    runOnce()
    val est1 = streamedEst(regs)
    assert(est1 === batchEst(dir) && est1.nonEmpty)

    writeShard(dir, "shard2", 95L, 150L)
    runOnce()
    assert(streamedEst(regs) === batchEst(dir))
    // the register store stays bounded: <= sources x 64 per batch
    val stored = spark.read.parquet(regs)
    assert(stored.groupBy(col("batch_id"), col("source")).count()
      .collect().forall(_.getLong(2) <= 64))
  }
}
