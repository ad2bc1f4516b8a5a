package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.DocsStream

/** Incremental span-level dedup: the stored base-gram index + shard
  * probe must land on EXACTLY the rows of the from-scratch
  * full-corpus span chain restricted to the arriving shard (the same
  * incremental == full contract rdf_reachable_incr pins), and the
  * streaming twin must be bit-equal to the batch probe regardless of
  * micro-batch splits. */
class SpanIncrementalSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("incremental == full: stored-index probe reproduces the " +
      "full-corpus span table on the arriving shard") {
    val inc = LlmQueries.spanIncremental(spark, sf)
    val full = LlmQueries.dupSpans(spark, sf)
      .filter(expr(LlmQueries.arrivingShardPred))
    assert(rows(inc) === rows(full))
    assert(inc.count() > 0, "fixture shard has no duplicated spans — " +
      "the equivalence test is vacuous")
  }

  /** Single-file shard with controlled mtime (the
    * IncrementalDedupStreamSpec harness). */
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
      "batch spanProbe, and a replay is a no-op") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val arriving = docs.filter(expr(LlmQueries.arrivingShardPred))
    val idxPath = LlmQueries.storedSpanGramsPath(spark, sf)

    val dir = tmp("spanprobe-in")
    val mid = 500L
    writeShard(arriving.filter(col("doc_id") < mid), dir, "shard0",
      ageMs = 60000L)
    writeShard(arriving.filter(col("doc_id") >= mid), dir, "shard1")

    val out = tmp("spanprobe-out")
    DocsStream.startSpanProbe(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      idxPath, out, tmp("spanprobe-ckpt")).awaitTermination()

    val batch = LlmQueries.spanProbe(arriving,
      spark.read.parquet(idxPath))
    assert(rows(spark.read.parquet(out).drop("batch_id")) === rows(batch))
    assert(batch.count() > 0)

    // at-least-once replay through a fresh checkpoint: the out-table
    // anti-join must keep the append idempotent
    DocsStream.startSpanProbe(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      idxPath, out, tmp("spanprobe-ckpt2")).awaitTermination()
    assert(rows(spark.read.parquet(out).drop("batch_id")) === rows(batch))
  }
}
