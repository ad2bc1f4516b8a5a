package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.DocsStream

/** Incremental CDC dedup: the stored-digest probe must land on
  * EXACTLY the full-corpus duplicate-chunk occurrences restricted to
  * the arriving shard (per-document boundaries make the restriction
  * exact), and the streaming twin must be bit-equal to the batch
  * probe for any micro-batch split. */
class CdcIncrementalSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("incremental == full: stored-digest probe + local dups equal " +
      "the from-scratch corpus rule on the arriving shard") {
    val inc = CdcChunks.dedupIncremental(spark, sf)
    val full = CdcChunks.chunks(spark, sf)
    val counts = full.groupBy(col("chunk_sha"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .select("chunk_sha")
    val want = full.join(counts, Seq("chunk_sha"), "left_semi")
      .filter(expr(LlmQueries.arrivingShardPred))
      .select("doc_id", "chunk_start", "chunk_len", "chunk_sha")
    assert(rows(inc) === rows(want))
    assert(inc.count() > 0, "fixture shard has no duplicated chunks — " +
      "the equivalence test is vacuous")
  }

  private def writeShard(df: org.apache.spark.sql.DataFrame,
      dir: String, name: String, ageMs: Long = 0L): Unit = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage-$name")
    val part = new java.io.File(s"$dir/_stage-$name").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val dst = new java.io.File(s"$dir/$name.parquet")
    assert(part.renameTo(dst))
    assert(dst.setLastModified(System.currentTimeMillis() - ageMs))
  }

  test("streaming twin: two micro-batches of probe output == one " +
      "batch probe, and a replay is a no-op") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val arriving = docs.filter(expr(LlmQueries.arrivingShardPred))
    val idxPath = CdcChunks.storedDigestsPath(spark, sf)

    val dir = tmp("cdcprobe-in")
    val mid = 500L
    writeShard(arriving.filter(col("doc_id") < mid), dir, "shard0",
      ageMs = 60000L)
    writeShard(arriving.filter(col("doc_id") >= mid), dir, "shard1")

    val out = tmp("cdcprobe-out")
    DocsStream.startCdcProbe(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      idxPath, out, tmp("cdcprobe-ckpt")).awaitTermination()

    val batch = CdcChunks.probe(arriving, spark.read.parquet(idxPath))
    assert(rows(spark.read.parquet(out).drop("batch_id")) === rows(batch))
    assert(batch.count() > 0)

    DocsStream.startCdcProbe(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      idxPath, out, tmp("cdcprobe-ckpt2")).awaitTermination()
    assert(rows(spark.read.parquet(out).drop("batch_id")) === rows(batch))
  }
}
